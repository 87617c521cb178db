"""Pallas TPU kernel: fused manifold scoring.

BENCHMARK-ONLY — not on the product path. Measured SLOWER than the XLA
one-hot scorer on this runtime (per-invocation dispatch overhead ~50 us,
NOTES r3/r4); kept as a measured A/B reference and exercised by
tools/pallas_ab.py + tests. Do not switch the product scorer to this
kernel without re-measuring on the target runtime (see
ops/tracking.py replica-strategy calibration for the pattern).

Scores G grid candidates against per-channel score windows in one pass:
per grid tile, the kernel computes each channel's fractional window index
(LOS projection + quadratic range correction + clock offset), builds the
interpolation weights in VMEM, and contracts them against the window
magnitudes on the MXU — the [TILE, W] weight tensor never touches HBM.

The XLA path (ops.dpe._interp_scores) materializes those weights per chunk
in HBM; at the reference's dense-grid cap (2 * 75^4 ~ 63M points,
batchcorrmanifold.h:17) that is ~16 GB of traffic per manifold, while this
kernel streams only the [8, G] candidate coordinates.

Inputs are packed lane-friendly:
  cand:   [8, G] float32 — rows 0-2 ENU offset (m), row 3 clock offset (m),
          rows 4-7 zero padding.
  win:    [C, 128] float32 — window magnitudes (W = 64 data + zero pad).
  params: [8, C] float32 — rows: los_e, los_n, los_u, r0, center, coef,
          pad, pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048
WPAD = 128   # padded window width (lane dimension)


def _score_kernel(cand_ref, win_ref, par_ref, out_ref, *, n_chan: int,
                  quad_range: bool):
    cand = cand_ref[:]                      # [8, TILE]
    win = win_ref[:]                        # [C, WPAD]
    par = par_ref[:]                        # [8, C]

    d2 = (cand[0] * cand[0] + cand[1] * cand[1]
          + cand[2] * cand[2])              # [TILE]
    dt = cand[3]

    acc = jnp.zeros((TILE,), jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (TILE, WPAD), 1).astype(jnp.float32)
    for c in range(n_chan):
        u = (par[0, c] * cand[0] + par[1, c] * cand[1]
             + par[2, c] * cand[2])         # [TILE]
        if quad_range:
            drange = -u + (d2 - u * u) * (0.5 / par[3, c])
        else:
            drange = -u
        idx = par[4, c] + par[5, c] * (drange + dt)    # [TILE]

        # 3-point Lagrange weights about k0 = round(idx)
        k0 = jnp.clip(jnp.round(idx), 1.0, WPAD - 2.0)
        d = (idx - k0)[:, None]             # [TILE, 1]
        srel = k - k0[:, None]              # [TILE, WPAD]
        w_m1 = 0.5 * (d * d - d)
        w_0 = 1.0 - d * d
        w_p1 = 0.5 * (d * d + d)
        wgt = (jnp.where(srel == -1.0, w_m1, 0.0)
               + jnp.where(srel == 0.0, w_0, 0.0)
               + jnp.where(srel == 1.0, w_p1, 0.0))    # [TILE, WPAD]

        vals = jax.lax.dot_general(
            wgt, win[c][:, None],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [TILE, 1]
        acc = acc + vals[:, 0]

    out_ref[:] = acc[None, :]


@functools.partial(jax.jit, static_argnames=("n_chan", "quad_range",
                                             "interpret"))
def score_manifold_pallas(cand: jax.Array, win: jax.Array,
                          params: jax.Array, n_chan: int = 8,
                          quad_range: bool = True,
                          interpret: bool = False) -> jax.Array:
    """Scores [G] for packed candidates/windows/params (see module doc)."""
    g = cand.shape[1]
    n_tiles = -(-g // TILE)
    pad = n_tiles * TILE - g
    cand_p = jnp.pad(cand, ((0, 0), (0, pad)))

    out = pl.pallas_call(
        functools.partial(_score_kernel, n_chan=n_chan,
                          quad_range=quad_range),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win.shape[0], WPAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, params.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * TILE), jnp.float32),
        interpret=interpret,
    )(cand_p, win, params)
    return out[0, :g]


def pack_pos_inputs(d_enu, dt_m, win_mag, los_enu, r0, center, coef):
    """Pack position-manifold arrays for score_manifold_pallas (numpy ok)."""
    g = d_enu.shape[0]
    c = win_mag.shape[0]
    cand = np.zeros((8, g), np.float32)
    cand[0:3] = np.asarray(d_enu, np.float32).T
    cand[3] = np.asarray(dt_m, np.float32)
    win = np.zeros((c, WPAD), np.float32)
    win[:, :win_mag.shape[1]] = np.asarray(win_mag, np.float32)
    par = np.zeros((8, c), np.float32)
    par[0:3] = np.asarray(los_enu, np.float32).T
    par[3] = np.asarray(r0, np.float32)
    par[4] = np.asarray(center, np.float32)
    par[5] = np.asarray(coef, np.float32)
    return cand, win, par


def pack_vel_inputs(dv_enu, dtdot, win_mag, los_enu, center, coef):
    """Velocity manifold: index = center + coef * (-los.dv + dtdot) — the
    same kernel with the quadratic range term disabled (quad_range=False):
    drange = -u = -los.dv."""
    g = dv_enu.shape[0]
    c = win_mag.shape[0]
    cand = np.zeros((8, g), np.float32)
    cand[0:3] = np.asarray(dv_enu, np.float32).T
    cand[3] = np.asarray(dtdot, np.float32)
    win = np.zeros((c, WPAD), np.float32)
    win[:, :win_mag.shape[1]] = np.asarray(win_mag, np.float32)
    par = np.zeros((8, c), np.float32)
    par[0:3] = np.asarray(los_enu, np.float32).T
    par[3] = 1.0
    par[4] = np.asarray(center, np.float32)
    par[5] = np.asarray(coef, np.float32)
    return cand, win, par


# ---------------------------------------------------------------------------
# Batched chunk scorer: the product hot path's _score_chunk as a pallas
# kernel. Sublane window layout: the W interpolation taps live on the
# SUBLANE axis ([Wp, TILE] weight tiles, Wp = 8/24/32...), not padded out
# to 128 lanes — 16x less VPU work than the lane-major kernel above at the
# product's code window (W=8), and the weight tensor never touches HBM
# (the XLA one-hot path streams [N, C, chunk, W] per chunk).
# ---------------------------------------------------------------------------

import os as _os

CHUNK_TILE = int(_os.environ.get("NAVLAB_PALLAS_TILE", "2048"))


def _chunk_kernel(cand_ref, win_ref, par_ref, out_ref, *, n_chan: int,
                  w_real: int, quad_range: bool, l_power: int,
                  tap_bf16: bool):
    # Mosaic wants >=2-D vectors throughout: every intermediate here is
    # [1, TILE] or [Wp, TILE]; nothing is ever rank-1 (a rank-1 iota /
    # vector fails TPU lowering — see round-2 advisor finding).
    #
    # v2 shape: the per-channel weight band is ONE one-hot compare
    # [Wp, TILE] contracted on the MXU against 3 pre-shifted window rows
    # ([3, Wp] @ [Wp, TILE]) — the same algorithm as the XLA hot path
    # (ops.dpe_real._score_chunk) minus its HBM round-trip of the
    # [N, C, chunk, W] one-hot (v1 built banded weights with 3 selects
    # per element on the VPU and measured 2.8x slower than XLA).
    cand = cand_ref[:]                      # [8, TILE]
    win3 = win_ref[0]                       # [3, Wp, C] (k-1 / k / k+1)
    par = par_ref[0]                        # [8, C]
    wp = win3.shape[1]
    tile = cand.shape[1]

    c0, c1, c2 = cand[0:1], cand[1:2], cand[2:3]         # [1, TILE]
    d2 = c0 * c0 + c1 * c1 + c2 * c2
    dt = cand[3:4]

    acc = jnp.zeros((1, tile), jnp.float32)
    # integer iota + cast: Mosaic's tpu.iota only produces integer vectors
    kk = jax.lax.broadcasted_iota(jnp.int32, (wp, tile), 0).astype(
        jnp.float32)
    tap_dt = jnp.bfloat16 if tap_bf16 else jnp.float32
    for c in range(n_chan):
        u = par[0, c] * c0 + par[1, c] * c1 + par[2, c] * c2  # [1, TILE]
        if quad_range:
            drange = -u + (d2 - u * u) * (0.5 / par[3, c])
        else:
            drange = -u
        idx = par[4, c] + par[5, c] * (drange + dt)      # [1, TILE]

        k0 = jnp.clip(jnp.round(idx), 1.0, w_real - 2.0)
        d = idx - k0
        oh = (kk == k0).astype(tap_dt)                   # [Wp, TILE]
        taps = jax.lax.dot_general(
            win3[:, :, c].astype(tap_dt), oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [3, TILE]
        d2_ = d * d
        vals = (0.5 * (d2_ - d) * taps[0:1]
                + (1.0 - d2_) * taps[1:2]
                + 0.5 * (d2_ + d) * taps[2:3])           # [1, TILE]
        if l_power == 1:
            acc = acc + vals
        else:
            acc = acc + vals ** l_power
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("quad_range", "l_power",
                                             "interpret", "tap_bf16"))
def score_chunk_pallas(win_mag: jax.Array, los_enu: jax.Array,
                       centers: jax.Array, coefs: jax.Array,
                       r0: jax.Array | None, o3: jax.Array, o1: jax.Array,
                       quad_range: bool = True, l_power: int = 1,
                       interpret: bool = False,
                       tap_bf16: bool = False) -> jax.Array:
    """Batched-block chunk scores [N, G] (ops.dpe_real._score_chunk parity).

    win_mag: [N, C, W] f32; los_enu: [N, C, 3]; centers/coefs (and r0 for
    the position manifold): [N, C]; o3: [G, 3]; o1: [G]. Grid dims
    (N, G/CHUNK_TILE); the one-hot and tap contraction never leave VMEM.
    tap_bf16 runs the one-hot/tap MXU contraction with bf16 operands
    (exact one-hot; window values round at bf16 — the trade the XLA path
    makes on TPU by default).
    """
    n, c, w = win_mag.shape
    g = o3.shape[0]
    n_tiles = -(-g // CHUNK_TILE)
    pad = n_tiles * CHUNK_TILE - g
    wp = -(-w // 8) * 8                     # sublane-align the tap axis

    cand = jnp.concatenate(
        [o3.T.astype(jnp.float32), o1[None].astype(jnp.float32),
         jnp.zeros((4, g), jnp.float32)], axis=0)
    cand = jnp.pad(cand, ((0, 0), (0, pad)))               # [8, Gp]
    # pre-shifted window rows (win[k-1], win[k], win[k+1]) so the kernel's
    # MXU contraction of the one-hot reads all 3 taps in one dot
    win_w = jnp.transpose(win_mag, (0, 2, 1))               # [N, W, C]
    zrow = jnp.zeros_like(win_w[:, :1])
    win3 = jnp.stack([
        jnp.concatenate([zrow, win_w[:, :-1]], axis=1),     # win[k-1]
        win_w,                                              # win[k]
        jnp.concatenate([win_w[:, 1:], zrow], axis=1),      # win[k+1]
    ], axis=1)                                              # [N, 3, W, C]
    win_t = jnp.pad(win3, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
    r0_row = (jnp.ones_like(centers) if r0 is None else r0)
    par = jnp.stack([los_enu[..., 0].T, los_enu[..., 1].T,
                     los_enu[..., 2].T, r0_row.T, centers.T, coefs.T,
                     jnp.zeros((c, n), jnp.float32),
                     jnp.zeros((c, n), jnp.float32)], axis=0)
    par = jnp.transpose(par, (2, 0, 1))                     # [N, 8, C]

    # Output is [n, 1, Gp] with (1, 1, CHUNK_TILE) blocks: Mosaic requires
    # the trailing two block dims to be (8k, 128k) or equal to the array
    # dims — the middle dim of size 1 satisfies "equal", the lane dim is
    # 128-divisible. (A 2-D [n, Gp] output with (1, CHUNK_TILE) blocks is
    # rejected for n not in {1, 8k} — round-2 advisor finding.)
    out = pl.pallas_call(
        functools.partial(_chunk_kernel, n_chan=c, w_real=w,
                          quad_range=quad_range, l_power=l_power,
                          tap_bf16=tap_bf16),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((8, CHUNK_TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, wp, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CHUNK_TILE), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, n_tiles * CHUNK_TILE),
                                       jnp.float32),
        interpret=interpret,
    )(cand, win_t, par)
    return out[:, 0, :g]
