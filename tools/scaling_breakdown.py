"""Collective-vs-compute breakdown of the sharded batched DPE dispatch.

Measures, on an N-virtual-device CPU mesh (one core per device via
taskset, as scaling_table.py), the per-block cost of:
  - corr:  the block-sharded correlation stage alone (jitted standalone)
  - full:  the full dpe_batch_blocks dispatch (correlation + sharded
           scoring + argmax combine)
  - score: full - corr (scoring incl. the window re-gather collective)

This is the measured decomposition VERDICT r3 asked for: it attributes
the efficiency lost at each device count to a stage instead of guessing.

Usage:
    python tools/scaling_breakdown.py --devices 4 [--chan 1]
    python tools/scaling_breakdown.py --all      # 1,2,4 devices via taskset
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def measure(n_devices: int, n_chan: int, iters: int, grid_scale: int) -> dict:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import time

    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from navlab_dpe_sdr_tpu.models.grid import spread_grid
    from navlab_dpe_sdr_tpu.ops import dpe_real as dr
    from navlab_dpe_sdr_tpu.ops.dpe import auto_windows
    from navlab_dpe_sdr_tpu.parallel.mesh import make_mesh

    mesh = (make_mesh(n_grid=n_devices // n_chan, n_chan=n_chan)
            if n_devices > 1 else None)

    c, s, n_blocks = 8, 50000, 8
    args, meta = ge._example_args(c=c, s=s)
    (raw_re, raw_im, chips, base0, rc_mid, idx_next, fi, ri, time_idc,
     pos_start, vel_start, params) = args[:12]
    rng = np.random.default_rng(7)
    raw_all = rng.integers(-2048, 2048, (n_blocks, s, 2)).astype(np.int16)
    fpk = np.zeros((n_blocks, dr.FPK_ROWS, c), np.float32)
    ipk = np.zeros((n_blocks, dr.IPK_ROWS, c), np.int32)
    fpk[:, 0] = np.asarray(rc_mid)
    fpk[:, 1] = np.asarray(fi)
    fpk[:, 2] = np.asarray(ri)
    fpk[:, 3:6] = np.asarray(params.los_enu).T
    fpk[:, 6] = np.asarray(params.r0)
    ipk[:, 0] = np.asarray(idx_next)
    g = spread_grid()
    d_enu = jnp.asarray(np.tile(g.d_enu, (grid_scale, 1)).astype(np.float32))
    dt_m = jnp.asarray(np.tile(g.dt_m, grid_scale).astype(np.float32))
    dv_enu = jnp.asarray(np.tile(g.dv_enu, (grid_scale, 1)).astype(np.float32))
    dtdot = jnp.asarray(np.tile(g.dtdot, grid_scale).astype(np.float32))
    cw, vw = auto_windows(np.asarray(d_enu), np.asarray(dt_m),
                          np.asarray(dv_enu), np.asarray(dtdot), 2.5e6,
                          meta["carr_fftpts"])
    fpk[:, 7] = cw / 2.0
    fpk[:, 9] = vw / 2.0
    ipk[:, 1] = s // 2 - cw // 2
    ipk[:, 2] = meta["carr_fftpts"] // 2 - vw // 2
    pk = jnp.asarray(dr.pack_params(fpk, ipk, 0))
    raw_dev = jnp.asarray(raw_all)

    def _corr(rawi, pki):
        fpk_d, ipk_d, start = dr._unpack_params(pki)
        return dr._batch_correlate(
            rawi, start, fpk_d, ipk_d, chips, base0, time_idc,
            meta["carr_fftpts"], meta["period"], meta["n_periods"],
            n_blocks, cw, vw, mesh=mesh)

    corr_fn = jax.jit(_corr)

    def corr_call():
        return corr_fn(raw_dev, pk)

    def full_call():
        return dr.dpe_batch_blocks(
            raw_dev, pk, chips, base0, time_idc, d_enu, dt_m, dv_enu, dtdot,
            carr_fftpts=meta["carr_fftpts"], period=meta["period"],
            n_periods=meta["n_periods"], n_blocks=n_blocks,
            return_windows=False, mesh=mesh, code_win=cw, carr_win=vw)

    out = {}
    for name, fn in (("corr", corr_call), ("full", full_call)):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        jax.block_until_ready(r)
        out[name] = (time.perf_counter() - t0) / iters / n_blocks
    out["score"] = out["full"] - out["corr"]
    return {"devices": n_devices, "mesh": {"chan": n_chan,
                                           "grid": n_devices // n_chan},
            "grid_scale": grid_scale,
            **{k: round(v * 1e3, 2) for k, v in out.items()}}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int)
    p.add_argument("--chan", type=int, default=1)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--grid-scale", type=int, default=1)
    p.add_argument("--all", action="store_true")
    args = p.parse_args(argv)
    if args.all:
        rows = []
        for n in (1, 2, 4):
            cores = ",".join(str(c) for c in range(n))
            r = subprocess.run(
                ["taskset", "-c", cores, sys.executable,
                 os.path.abspath(__file__), "--devices", str(n),
                 "--grid-scale", str(args.grid_scale),
                 "--iters", str(args.iters)],
                capture_output=True, text=True, timeout=1800)
            if r.returncode != 0:
                print(r.stderr, file=sys.stderr)
                raise SystemExit(1)
            row = json.loads(r.stdout.strip().splitlines()[-1])
            rows.append(row)
            print(row, flush=True)
        base = rows[0]
        for row in rows[1:]:
            for k in ("corr", "full", "score"):
                row[f"eff_{k}"] = round(
                    base[k] / (row["devices"] * row[k]), 3)
        print(json.dumps(rows, indent=1))
    else:
        print(json.dumps(measure(args.devices, args.chan, args.iters,
                                 args.grid_scale)))


if __name__ == "__main__":
    main()
