"""Settle the Pallas-vs-XLA scorer question (VERDICT r2 item #1).

Times the product manifold-scoring hot path (pos + vel argmax over the
25^4 spread grid, product window widths) as ONE chained lax.scan of K
iterations over pre-uploaded varying windows, ending in a single scalar
fetch — the only timing protocol that is trustworthy on this runtime
(block_until_ready returns early on axon; see NOTES.md).

Variants:
  xla     — ops.dpe_real._score_axis_argmax (the shipping one-hot path)
  pallas  — ops.pallas_score.score_chunk_pallas full-grid + argmax

Writes one JSON line per variant to stdout; run to completion, NEVER
abort mid-warmup (an aborted first execution can wedge the tunnel).
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from navlab_dpe_sdr_tpu.models.grid import spread_grid
from navlab_dpe_sdr_tpu.ops import dpe_real
from navlab_dpe_sdr_tpu.ops import pallas_score as pk

import os

K = int(os.environ.get("PT_K", 50))   # chained iterations per timed call
N = int(os.environ.get("PT_N", 50))   # blocks per dispatch (product lookahead)
C = 8
CODE_W = 8      # auto_windows widths for the 25^4 spread grid
CARR_W = 24
REPEATS = int(os.environ.get("PT_REPEATS", 3))


def main():
    variants = sys.argv[1:] or ["xla", "pallas"]
    rng = np.random.default_rng(5)
    g = spread_grid()
    o3p = jnp.asarray(g.d_enu.astype(np.float32))
    o1p = jnp.asarray(g.dt_m.astype(np.float32))
    o3v = jnp.asarray(g.dv_enu.astype(np.float32))
    o1v = jnp.asarray(g.dtdot.astype(np.float32))
    gpts = g.d_enu.shape[0]

    los = rng.standard_normal((N, C, 3)).astype(np.float32)
    los /= np.linalg.norm(los, axis=2, keepdims=True)
    los = jnp.asarray(los)
    r0 = jnp.full((N, C), 2.2e7, jnp.float32)
    pcen = jnp.full((N, C), CODE_W / 2.0, jnp.float32)
    pcoef = jnp.full((N, C), 1.0 / 293.0, jnp.float32)   # samples per meter
    vcen = jnp.full((N, C), CARR_W / 2.0, jnp.float32)
    vcoef = jnp.full((N, C), 0.25, jnp.float32)

    def wins():
        cw = rng.standard_normal((K, N, C, CODE_W)).astype(np.float32) ** 2
        xw = rng.standard_normal((K, N, C, CARR_W)).astype(np.float32) ** 2
        return (jax.device_put(jnp.asarray(cw)),
                jax.device_put(jnp.asarray(xw)))

    def step_xla(carry, ws):
        cw, xw = ws
        pb, pa = dpe_real._score_axis_argmax(cw, los, pcen, pcoef, r0,
                                             o3p, o1p, "quadratic", 1)
        vb, va = dpe_real._score_axis_argmax(xw, los, vcen, vcoef, None,
                                             o3v, o1v, "quadratic", 1)
        upd = (jnp.sum(pb) + jnp.sum(vb)
               + jnp.sum(pa).astype(jnp.float32)
               + jnp.sum(va).astype(jnp.float32))
        return carry + upd, None

    interp_mode = bool(int(os.environ.get("PT_INTERPRET", "0")))

    def step_pallas(carry, ws, bf16=False):
        cw, xw = ws
        ps = pk.score_chunk_pallas(cw, los, pcen, pcoef, r0, o3p, o1p,
                                   interpret=interp_mode, tap_bf16=bf16)
        vs = pk.score_chunk_pallas(xw, los, vcen, vcoef, None, o3v, o1v,
                                   quad_range=False, interpret=interp_mode,
                                   tap_bf16=bf16)
        upd = (jnp.sum(jnp.max(ps, axis=1)) + jnp.sum(jnp.max(vs, axis=1))
               + jnp.sum(jnp.argmax(ps, axis=1)).astype(jnp.float32)
               + jnp.sum(jnp.argmax(vs, axis=1)).astype(jnp.float32))
        return carry + upd, None

    steps = {"xla": step_xla, "pallas": step_pallas,
             "xla_int8": step_xla,   # selected via SCORE_TAP_DTYPE below
             "pallas_bf16": functools.partial(step_pallas, bf16=True)}
    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    for name in variants:
        dpe_real.SCORE_TAP_DTYPE = (jnp.int8 if name == "xla_int8"
                                    else dpe_real._TAPS_ENV)
        fn = jax.jit(lambda ws, _s=steps[name]:
                     jax.lax.scan(_s, jnp.float32(0.0), ws)[0])
        data = wins()
        t0 = time.time()
        v = float(fn(data))          # first execution: pays signature warmup
        warm_s = time.time() - t0
        times = []
        for _ in range(REPEATS):
            data = wins()
            t0 = time.time()
            v = float(fn(data))      # scalar fetch serializes the chain
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        rec = {"variant": name, "warmup_s": round(warm_s, 2),
               "times_s": [round(t, 4) for t in times],
               "ms_per_iter": round(med * 1000 / K, 4),
               "ms_per_manifold_block": round(med * 1000 / K / N / 2, 6),
               "grid_points": gpts, "n_blocks": N, "k": K,
               "check": v}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
