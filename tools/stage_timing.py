"""Per-stage TPU timing of the product 50-block dispatch (chained scan).

Where do the ~24 ms of a 50-block dpe_batch_blocks dispatch go?
  full     — spread 25^4 grid (correlation + pos/vel scoring)
  corr     — 256-point grid (scoring ~free: correlation + fixed overhead)
  full_g5  — spread grid with group_k=5 coherent grouping (correlation +
             1/5 the scoring passes) — the grouped bench mode's device cost
The full-corr difference is the manifold-scoring cost at product shape;
full_g5 vs corr shows how close grouping gets to the correlation floor.

Same trust rules as tools/pallas_timing.py: chained lax.scan over
pre-uploaded varying inputs, single scalar fetch, never abort a warmup.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge
from navlab_dpe_sdr_tpu.models.grid import spread_grid, uniform_grid
from navlab_dpe_sdr_tpu.ops import dpe_real as dr
from navlab_dpe_sdr_tpu.ops.dpe import auto_windows

K = int(os.environ.get("ST_K", 20))    # chained iterations
N = int(os.environ.get("ST_N", 50))    # blocks per dispatch
C, S = 8, 50000


def main():
    variants = sys.argv[1:] or ["full", "corr"]
    rng = np.random.default_rng(11)
    args, meta = ge._example_args(c=C, s=S)
    (_, _, chips, base0, rc_mid, idx_next, fi, ri, time_idc,
     pos_start, vel_start, params) = args[:12]

    raw_all = jnp.asarray(rng.integers(-2048, 2048,
                                       (N + K, S, 2)).astype(np.int16))
    fpk = np.zeros((K, N, dr.FPK_ROWS, C), np.float32)
    ipk = np.zeros((K, N, dr.IPK_ROWS, C), np.int32)
    fpk[..., 0, :] = np.asarray(rc_mid)
    fpk[..., 1, :] = np.asarray(fi)
    fpk[..., 2, :] = np.asarray(ri)
    fpk[..., 3:6, :] = np.asarray(params.los_enu).T
    fpk[..., 6, :] = np.asarray(params.r0)
    fpk[..., 8, :] = np.asarray(params.pos_coef)
    fpk[..., 10, :] = np.asarray(params.vel_coef)
    ipk[..., 0, :] = np.asarray(idx_next)

    print(f"# backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    for name in variants:
        group_k = 5 if name.endswith("_g5") else 1
        g = (spread_grid() if name.startswith("full") else uniform_grid(
            n=4, pos_spacing=5.0, vel_spacing=0.5))
        cw, vw = auto_windows(g.d_enu, g.dt_m, g.dv_enu, g.dtdot, 2.5e6,
                              meta["carr_fftpts"])
        f2, i2 = fpk.copy(), ipk.copy()
        f2[..., 7, :] = cw / 2.0
        f2[..., 9, :] = vw / 2.0
        i2[..., 1, :] = S // 2 - cw // 2
        i2[..., 2, :] = meta["carr_fftpts"] // 2 - vw // 2
        d_enu = jnp.asarray(g.d_enu.astype(np.float32))
        dt_m = jnp.asarray(g.dt_m.astype(np.float32))
        dv_enu = jnp.asarray(g.dv_enu.astype(np.float32))
        dtdot = jnp.asarray(g.dtdot.astype(np.float32))

        def step(carry, xs, _cw=int(cw), _vw=int(vw), _d=d_enu, _t=dt_m,
                 _v=dv_enu, _td=dtdot, _gk=group_k):
            pk_k, start_k = xs
            rows = dr.dpe_batch_blocks(
                raw_all, pk_k, chips, base0, time_idc, _d, _t, _v, _td,
                meta["carr_fftpts"], meta["period"], meta["n_periods"], N,
                return_windows=False, code_win=_cw, carr_win=_vw,
                group_k=_gk)
            return carry + jnp.sum(rows), None

        fn = jax.jit(lambda xs, _s=step:
                     jax.lax.scan(_s, jnp.float32(0.0), xs)[0])

        def data():
            f3 = f2 + rng.standard_normal(f2.shape).astype(np.float32) * 1e-4
            pk = np.stack([dr.pack_params(f3[k], i2[k], k)
                           for k in range(K)])
            return (jax.device_put(jnp.asarray(pk)),
                    jnp.arange(K, dtype=jnp.int32))

        t0 = time.time()
        v = float(fn(data()))
        warm_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            v = float(fn(data()))
            times.append(time.time() - t0)
        med = sorted(times)[1]
        print(json.dumps({
            "variant": name, "warmup_s": round(warm_s, 2),
            "times_s": [round(t, 4) for t in times],
            "ms_per_dispatch": round(med * 1000 / K, 3),
            "ms_per_block": round(med * 1000 / K / N, 4),
            "grid_points": int(g.d_enu.shape[0]),
            "code_win": int(cw), "carr_win": int(vw),
            "n_blocks": N, "k": K, "check": v}), flush=True)


if __name__ == "__main__":
    main()
