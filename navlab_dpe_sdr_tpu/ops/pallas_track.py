"""Pallas TPU kernel: fused scalar-tracking E/P/L correlation.

BENCHMARK-ONLY — not on the product path. Measured SLOWER than the
factored one-hot XLA scan on this runtime (0.0615 vs 0.0442 ms/step,
NOTES r4 — per-invocation pallas dispatch overhead dominates); kept as a
measured A/B reference. Do not switch the product tracker to this kernel
without re-measuring on the target runtime (see ops/tracking.py
replica-strategy calibration for the pattern).

One 1 ms window, all channels: carrier wipeoff, constant-table half-chip
replica lookup (the `_epl_const_fold` algebra), code-period segmentation,
and the 18 segment sums — entirely in VMEM. The XLA scan body materializes
~16 MB of intermediates per step (one-hots, lookup stages, segment
weights) and measures HBM/overhead-bound at ~44 us on the target chip
(tools/scalar_timing.py, r4); this kernel's HBM traffic is the raw window
(20 KB) + constant tables (~1 MB, VMEM-resident per call) + an 18-float
output per channel.

Layout: everything [.., k] with the sample axis k in lanes. Per grid step
(one channel):
  1. roll the doubled half-chip sequence by s2 = floor(2*rc_mid) (dynamic
     in-VMEM slice) -> 4 shifted reads,
  2. two constant-table contractions (e_hi [93, P0], digit combine with
     e_lo [22, P0]) on the MXU -> y[4, P0],
  3. carry-combine -> E/P/L replicas [3, P0],
  4. wipeoff (cos/sin on the VPU), segment step masks, and one
     [18, P0] x [P0] reduction per re/im.

Parity: ops.tracking._correlate_step (segment-sum contract; tested in
interpret mode on CPU and against the XLA paths). Reference anchor:
correlator.py:135-283 (segmented E/P/L).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import F_CA, L_CA
from .tracking import _half_chip_consts

L2 = 2 * int(L_CA)          # 2046 half-chip bins


def _kernel(scal_ref, raw_ref, shifts_ref, ehi_ref, elo_ref, frac2_ref,
            out_ref, *, period: int, fs: float):
    """One channel per grid step.

    scal_ref (SMEM): [C, 8] f32 rows: rc_mid, fr (frac half-chips),
      fi, ri, rc, dfc, s2 (as float), pad.
    raw_ref: [2, P0] f32 (re, im). shifts_ref: [C, 88, 93] rolled
    half-chip sequences at offsets {-1, 0, 1, 2}, digit-regrouped to
    rows e*22+l over the 93-wide hi digit (the per-channel roll + the
    lane reshape run in XLA — Mosaic forbids unaligned lane-dim dynamic
    slices and 2046->(93,22) lane shape casts; it is a ~65 KB op). ehi_ref: [93, P0]; elo_ref: [22, P0]; frac2_ref:
    [1, P0]. out_ref: [C, 24] — row c gets 18 segment sums (tap-major:
    [tap(EPL), seg, re/im]) + 6 pad.
    """
    c = pl.program_id(0)
    fr = scal_ref[c, 1]
    fi = scal_ref[c, 2]
    ri = scal_ref[c, 3]
    rc = scal_ref[c, 4]
    dfc = scal_ref[c, 5]

    rsh_flat = shifts_ref[c]                                # [88, 93]

    # 2. constant-table lookup, k in lanes: A = rsh_flat @ ehi
    a = jax.lax.dot_general(
        rsh_flat, ehi_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [88, P0]
    a4 = a.reshape(4, 22, period)
    y = jnp.sum(a4 * elo_ref[:, :][None], axis=1)           # [4, P0]

    # 3. carry combine -> E/P/L replicas [3, P0]
    carry = (frac2_ref[0, :] + fr >= 1.0).astype(jnp.float32)
    ym1, y0, y1, y2 = y[0], y[1], y[2], y[3]
    e_tap = y1 + carry * (y2 - y1)
    p_tap = y0 + carry * (y1 - y0)
    l_tap = ym1 + carry * (y0 - ym1)
    repl = jnp.stack([e_tap, p_tap, l_tap])                 # [3, P0]

    # 4. wipeoff + segments + sums
    k = jax.lax.broadcasted_iota(jnp.int32, (1, period),
                                 1)[0].astype(jnp.float32)
    t = k * np.float32(1.0 / fs)
    ang = np.float32(2.0 * np.pi) * (fi * t + ri)
    wc, ws = jnp.cos(ang), jnp.sin(ang)
    raw_re = raw_ref[0, :]
    raw_im = raw_ref[1, :]
    bb_re = raw_re * wc + raw_im * ws
    bb_im = raw_im * wc - raw_re * ws

    fc = np.float32(F_CA) + dfc
    b1 = (np.float32(L_CA) - rc) * (np.float32(fs) / fc)
    b2 = (np.float32(2 * L_CA) - rc) * (np.float32(fs) / fc)
    in1 = (k >= b1).astype(jnp.float32)
    in2 = (k >= b2).astype(jnp.float32)
    seg0 = 1.0 - in1
    seg1 = in1 - in2
    segm = jnp.stack([seg0, seg1, in2])                     # [3, P0]

    w18 = (repl[:, None, :] * segm[None, :, :]).reshape(9, period)
    bb2 = jnp.stack([bb_re, bb_im])                         # [2, P0]
    sums_t = jax.lax.dot_general(
        bb2, w18, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                # [2, 9]
    out = jnp.pad(sums_t, ((0, 0), (0, 7)))                 # [2, 16]
    out_ref[pl.dslice(c, 1), :, :] = out[None]


@functools.partial(jax.jit, static_argnames=("period", "fs", "interpret"))
def correlate_window_pallas(raw2, r2d_all, scal, ehi_t, elo_t, frac2,
                            period: int, fs: float,
                            interpret: bool = False):
    """Fused E/P/L correlate of one 1 ms window.

    raw2: [2, P0] f32; r2d_all: [C, 2*L2+4]; scal: [C, 8] (see _kernel);
    ehi_t/elo_t: [93, P0]/[22, P0] constant tables (k-last); frac2:
    [1, P0]. Returns sums [C, 3, 3, 2] (tap, seg, re/im).
    """
    c = scal.shape[0]
    # per-channel roll in XLA (Mosaic can't lane-slice at dynamic starts):
    # ext[c, j] = r2d[c, s2_c + j] covers logical offsets s2-1 .. s2+2047
    s2 = scal[:, 6].astype(jnp.int32)

    def sl(row, st):
        return jax.lax.dynamic_slice(row, (st,), (L2 + 3,))

    ext = jax.vmap(sl)(r2d_all, s2)                         # [C, L2+3]
    shifts = jnp.stack([ext[:, e + 1:e + 1 + L2]
                        for e in (-1, 0, 1, 2)], axis=1)    # [C, 4, L2]
    shifts = shifts.reshape(c, 4, 93, 22).transpose(0, 1, 3, 2) \
                   .reshape(c, 88, 93)                      # rows e*22+l
    out = pl.pallas_call(
        functools.partial(_kernel, period=period, fs=fs),
        grid=(c,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((2, period), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 88, 93), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((93, period), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((22, period), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, period), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 2, 16), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 2, 16), jnp.float32),
        interpret=interpret,
    )(scal, raw2, shifts, ehi_t, elo_t, frac2)
    # [C, 2, 9] -> [C, 3(tap), 3(seg), 2(re/im)]
    return jnp.transpose(out[:, :, :9], (0, 2, 1)).reshape(c, 3, 3, 2)


def prep_constants(code_table: np.ndarray, period: int):
    """Host-side constants for the kernel: (r2d_all [C, 2*L2+4] with a
    one-slot lead so a dslice at s2 starts at logical s2-1, ehi_t
    [93, P0], elo_t [22, P0], frac2 [1, P0])."""
    e_hi, e_lo, frac2 = _half_chip_consts(period)
    r2 = np.repeat(np.asarray(code_table, np.float32), 2, axis=1)
    r2d = np.concatenate([r2[:, -1:], r2, r2, r2[:, :3]], axis=1)
    return (jnp.asarray(r2d), jnp.asarray(e_hi.T.copy()),
            jnp.asarray(e_lo.T.copy()),
            jnp.asarray(frac2[None].copy()))


@functools.partial(jax.jit,
                   static_argnames=("fs", "fcaid", "loops", "unroll",
                                    "interpret"))
def track_chunk_pallas(state, raw_chunk, code_table, fs: float,
                       fcaid: float, loops=None, unroll: int | None = None,
                       interpret: bool = False):
    """ops.tracking.track_chunk (1 ms cadence) with the correlation fused
    into the pallas kernel. Same carry/log contract; the closed-loop tail
    (polarity, lock/SNR, DLL/PLL) stays in XLA (measured ~free)."""
    from . import tracking as trk

    if loops is None:
        loops = trk.LoopConfig()
    if jnp.iscomplexobj(raw_chunk):
        raw_chunk = jnp.stack([jnp.real(raw_chunk), jnp.imag(raw_chunk)],
                              axis=-1).astype(jnp.float32)
    s = raw_chunk.shape[1]
    period = s
    t_up = np.float32(trk.T_MS)
    # constants from the traced code_table (chips are call constants; the
    # e_hi/e_lo tables are numpy compile-time constants of the period)
    e_hi, e_lo, frac2_np = _half_chip_consts(period)
    ehi_t = jnp.asarray(e_hi.T.copy())
    elo_t = jnp.asarray(e_lo.T.copy())
    frac2 = jnp.asarray(frac2_np[None].copy())
    r2 = jnp.repeat(code_table, 2, axis=1)
    r2d = jnp.concatenate([r2[:, -1:], r2, r2, r2[:, :3]], axis=1)
    raw_t = jnp.swapaxes(raw_chunk, 1, 2)                   # [steps, 2, S]

    def body(st, raw2):
        scal = scal_pack(st.rc, st.dfc, st.ri, st.fi)
        sums = correlate_window_pallas(raw2, r2d, scal, ehi_t, elo_t,
                                       frac2, period=period, fs=fs,
                                       interpret=interpret)
        e_s, p_s, l_s = sums[:, 0], sums[:, 1], sums[:, 2]
        fc = np.float32(F_CA) + st.dfc
        ncp = jnp.floor((np.float32(s / fs) * fc + st.rc)
                        * np.float32(1.0 / L_CA)).astype(jnp.int32)
        (e_r, p_r, l_r, signs, p_a_re_new,
         p_a_im_new) = trk._polarity_combine(st, e_s, p_s, l_s, ncp, 1)
        st1, lock, lockval, snr = trk._lock_snr_update(
            st._replace(p_a_re=p_a_re_new, p_a_im=p_a_im_new), p_r, 1)
        log = trk.TrackLog(
            iE=e_r[:, 0], qE=e_r[:, 1], iP=p_r[:, 0], qP=p_r[:, 1],
            iL=l_r[:, 0], qL=l_r[:, 1],
            rc=st.rc, ri=st.ri, fc=fc, fi=st.fi,
            cp=st.cp, ncp=ncp, signs=signs, lock=lock, lockval=lockval,
            snr=snr, dpc=jnp.zeros_like(st.rc), dpi=jnp.zeros_like(st.rc))
        rc_new = jnp.mod(st.rc + st.dfc * t_up, np.float32(L_CA))
        ri_new = jnp.mod(st.ri + st.fi * t_up, 1.0)
        st2 = st1._replace(rc=rc_new, ri=ri_new, cp=st.cp + ncp)
        st3, dpc, dpi = trk._loops_update(st2, e_r, p_r, l_r, fcaid,
                                          loops, 1)
        return st3, log._replace(dpc=dpc, dpi=dpi)

    if unroll is None:
        unroll = 8 if jax.default_backend() == "tpu" else 1
    return jax.lax.scan(body, state, raw_t, unroll=int(unroll))


def scal_pack(rc, dfc, ri, fi):
    """[C, 8] scalar rows for the kernel from the tracking carry
    (rc_mid evaluated by the caller; here rc IS rc_mid's base — pass
    rc_mid directly as `rc` plus dfc for the segment boundaries)."""
    rc = jnp.asarray(rc)
    c = rc.shape[0]
    rc_mid = rc + dfc * np.float32(0.5e-3)
    ph = jnp.mod(rc_mid, np.float32(L_CA))
    s2 = jnp.floor(2.0 * ph)
    fr = 2.0 * ph - s2
    return jnp.stack([rc_mid, fr, fi, ri, rc, dfc,
                      s2, jnp.zeros_like(rc)], axis=1)
