"""Dense-grid DPE bench: reference-cap-scale manifolds on the default
backend (TPU when present). Writes DENSE_r{round}.json.

The reference guards but never demonstrates 2*75^4 ~ 63.3M grid points
(batchcorrmanifold.h:17) — a TX2 at its measured throughput would need
many seconds per 20 ms block. The streaming-argmax scorer keeps peak
memory independent of grid size, so the only cost is HBM traffic over
the interpolation weight tensors.

    python tools/dense_bench.py [--n 75] [--blocks 2] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=75, help="points per grid axis")
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--integrate", type=int, default=0, metavar="K",
                   help="coherent K-block integration: one scoring pass "
                        "per K blocks (the dense-grid real-time mode)")
    p.add_argument("--out", default="DENSE_r02.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from navlab_dpe_sdr_tpu.models.grid import check_grid_size, dense_grid
    from navlab_dpe_sdr_tpu.ops import dpe_real as dr

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev.device_kind})", flush=True)

    # --integrate K replaces the per-block batch with one K-block
    # coherent-integration dispatch (K == the block count)
    c, s = 8, 50000
    n_blocks = args.integrate if args.integrate else args.blocks
    a, meta = ge._example_args(c=c, s=s)
    (raw_re, raw_im, chips, base0, rc_mid, idx_next, fi, ri, time_idc,
     pos_start, vel_start, params) = a[:12]

    rng = np.random.default_rng(7)
    raw_all = rng.integers(-2048, 2048, (n_blocks, s, 2)).astype(np.int16)
    fpk = np.zeros((n_blocks, dr.FPK_ROWS, c), np.float32)
    ipk = np.zeros((n_blocks, dr.IPK_ROWS, c), np.int32)
    fpk[:, 0] = np.asarray(rc_mid)
    fpk[:, 1] = np.asarray(fi)
    fpk[:, 2] = np.asarray(ri)
    fpk[:, 3:6] = np.asarray(params.los_enu).T
    fpk[:, 6] = np.asarray(params.r0)
    fpk[:, 7] = np.asarray(params.pos_center)
    fpk[:, 8] = np.asarray(params.pos_coef)
    fpk[:, 9] = np.asarray(params.vel_center)
    fpk[:, 10] = np.asarray(params.vel_coef)
    ipk[:, 0] = np.asarray(idx_next)
    ipk[:, 1] = np.asarray(pos_start)
    ipk[:, 2] = np.asarray(vel_start)

    g = check_grid_size(dense_grid(n=args.n))
    n_pts = g.n_pos + g.n_vel
    print(f"grid: {args.n}^4 pos + {args.n}^4 vel = {n_pts:,} points",
          flush=True)

    # grid-adaptive score windows (exact; weight-tensor traffic ~ width)
    from navlab_dpe_sdr_tpu.ops.dpe import auto_windows
    cw, vw = auto_windows(g.d_enu, g.dt_m, g.dv_enu, g.dtdot, 2.5e6,
                          meta["carr_fftpts"])
    print(f"score windows: code {cw}, carr {vw}", flush=True)
    fpk[:, 7] = cw / 2.0
    fpk[:, 9] = vw / 2.0
    ipk[:, 1] = s // 2 - cw // 2
    ipk[:, 2] = meta["carr_fftpts"] // 2 - vw // 2
    pk = dr.pack_params(fpk, ipk, 0)
    t0 = time.perf_counter()
    d_enu = jnp.asarray(g.d_enu.astype(np.float32))
    dt_m = jnp.asarray(g.dt_m.astype(np.float32))
    dv_enu = jnp.asarray(g.dv_enu.astype(np.float32))
    dtdot = jnp.asarray(g.dtdot.astype(np.float32))
    jax.block_until_ready((d_enu, dv_enu))
    print(f"grid upload: {time.perf_counter() - t0:.1f} s "
          f"({(d_enu.nbytes + dv_enu.nbytes) / 1e6:.0f} MB)", flush=True)

    if args.integrate:
        # coherent K-block integration: correlation every block, ONE
        # manifold scoring pass per K blocks — the dense-grid real-time
        # enabler (scoring amortizes K x; see ops/dpe_real.py docstring)
        def call(raw):
            return dr.dpe_scan_integrate(
                raw, jnp.asarray(pk),
                chips, base0, time_idc, d_enu, dt_m, dv_enu, dtdot,
                carr_fftpts=meta["carr_fftpts"], period=meta["period"],
                n_periods=meta["n_periods"], n_blocks=n_blocks,
                code_win=cw, carr_win=vw, coherent=True)
    else:
        def call(raw):
            return dr.dpe_batch_blocks(
                raw, jnp.asarray(pk),
                chips, base0, time_idc, d_enu, dt_m, dv_enu, dtdot,
                carr_fftpts=meta["carr_fftpts"], period=meta["period"],
                n_periods=meta["n_periods"], n_blocks=n_blocks,
                return_windows=False, code_win=cw, carr_win=vw)

    t0 = time.perf_counter()
    out = call(jnp.asarray(raw_all))
    jax.block_until_ready(out)
    print(f"warmup (compile + first exec): {time.perf_counter() - t0:.1f} s",
          flush=True)

    times = []
    for i in range(args.iters):
        raw = jnp.asarray(np.roll(raw_all, i + 1, axis=1))  # vary inputs
        jax.block_until_ready(raw)
        t0 = time.perf_counter()
        out = call(raw)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n_blocks)
        print(f"iter {i}: {times[-1] * 1e3:.1f} ms/block", flush=True)

    sec = float(np.median(times))
    try:
        mem = dev.memory_stats()
        mem_info = {"bytes_in_use": mem.get("bytes_in_use"),
                    "peak_bytes_in_use": mem.get("peak_bytes_in_use"),
                    "bytes_limit": mem.get("bytes_limit")}
    except Exception:
        mem_info = None

    result = {
        "grid_points": n_pts,
        "grid_axis_n": args.n,
        "sec_per_block": sec,
        "grid_points_per_s": n_pts / sec,
        "grid_point_channel_evals_per_s": n_pts * c / sec,
        "realtime_factor": 0.02 / sec,
        "backend": dev.platform,
        "device": str(dev.device_kind),
        "blocks_per_dispatch": n_blocks,
        "coherent_integration_k": args.integrate or None,
        "memory": mem_info,
        "note": "reference cap 2*75^4 (batchcorrmanifold.h:17) never "
                "demonstrated on the TX2; streaming-argmax scorer, peak "
                "memory independent of grid size",
    }
    out = args.out
    if args.integrate and out == "DENSE_r02.json":
        out = "DENSE_INT_r02.json"      # don't clobber the per-block row
    print(json.dumps(result), flush=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
