"""Scaling-efficiency table for the sharded DPE step (SURVEY §2.3 P7).

One measurement per process (the virtual device count must be fixed before
JAX backend init), orchestrated by --all which re-invokes this script under
`taskset` so each virtual CPU device gets one physical core — real parallel
scaling, not N devices time-slicing the same cores.

Single measurement:
    python tools/scaling_table.py --devices 2 [--grid-scale 2] [--iters 10]
Full table (writes SCALING_r05.json):
    python tools/scaling_table.py --all

The BASELINE north-star metric is grid-points/s scaling efficiency >= 80%
at N >= 2 devices; the reference has no distributed backend at all
(architecture.txt:92-101).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def measure(n_devices: int, grid_scale: int, iters: int,
            n_chan: int = 1, n_chan_sig: int = 8) -> dict:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from navlab_dpe_sdr_tpu.parallel.launch import scaling_bench
    from navlab_dpe_sdr_tpu.parallel.mesh import make_mesh

    mesh = (make_mesh(n_grid=n_devices // n_chan, n_chan=n_chan)
            if n_devices > 1 else None)
    stats = scaling_bench(mesh, n_iters=iters, grid_scale=grid_scale,
                          n_chan_sig=n_chan_sig)
    stats["mesh"] = {"chan": n_chan, "grid": n_devices // n_chan}
    stats["n_chan_sig"] = n_chan_sig
    stats["cores"] = len(os.sched_getaffinity(0))
    return stats


def run_all(grid_scales, iters: int, out: str) -> None:
    ncores = len(os.sched_getaffinity(0))
    counts = [n for n in (1, 2, 4, 8, 16) if n <= ncores]
    regimes = []
    for gs in grid_scales:
        rows = []
        for n in counts:
            chans = [c for c in (1, 2, 4, 8) if c <= n and n % c == 0]
            for nc in chans:
                cores = ",".join(str(c) for c in range(n))
                cmd = ["taskset", "-c", cores, sys.executable,
                       os.path.abspath(__file__),
                       "--devices", str(n), "--chan", str(nc),
                       "--grid-scale", str(gs), "--iters", str(iters)]
                r = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=1800)
                if r.returncode != 0:
                    print(r.stderr, file=sys.stderr)
                    raise SystemExit(f"measurement at {n} devices failed")
                row = json.loads(r.stdout.strip().splitlines()[-1])
                rows.append(row)
                print(f"grid x{gs} devices={n:2d} mesh={row['mesh']} "
                      f"{row['grid_points_per_s']:.3e} pts/s "
                      f"({row['sec_per_block'] * 1e3:.1f} ms/block)",
                      flush=True)
        base = rows[0]["grid_points_per_s"]
        for row in rows:
            row["efficiency_vs_1dev"] = (row["grid_points_per_s"] /
                                         (base * row["devices"]))
        n_pts = 2 * 390625 * gs
        best = {}
        for row in rows:
            d = row["devices"]
            if d not in best or row["grid_points_per_s"] >                     best[d]["grid_points_per_s"]:
                best[d] = row
        regimes.append({"grid_points_per_block": n_pts,
                        "grid_scale": gs, "rows": rows,
                        "best_efficiency_per_devices": {
                            str(d): round(r["efficiency_vs_1dev"], 3)
                            for d, r in sorted(best.items())}})
        effs = {f"{r['devices']}dev mesh{r['mesh']}":
                round(r["efficiency_vs_1dev"], 3) for r in rows}
        print(f"grid x{gs} efficiency vs 1 device: {effs}")

    table = {
        "metric": "grid_points_per_s on the product hot path "
                  "(dpe_batch_blocks: windowed correlation + shard_map "
                  "streaming-argmax manifold scoring), S=50000, C=8, "
                  "N=5 blocks/dispatch, spread grid replicated "
                  "grid_scale times",
        "methodology": "virtual CPU devices, one physical core per device "
                       "via taskset (strong scaling: fixed total grid per "
                       "regime). Multi-chip TPU hardware is not available "
                       "in this environment; the driver validates the same "
                       "sharded step via dryrun_multichip. The "
                       "non-sharded correlation stage (fixed ~175 ms "
                       "single-core cost/block) bounds efficiency at "
                       "small grids; the dense-grid regime is the "
                       "BASELINE metric's regime. The all-cores row "
                       "shares its cores with the host process and OS.",
        "baseline_target": ">=80% scaling efficiency on grid-points/s "
                           "at N>=2 devices (BASELINE.md)",
        "regimes": regimes,
    }
    with open(out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int)
    p.add_argument("--chan", type=int, default=1)
    p.add_argument("--c", type=int, default=8, help="signal channels")
    p.add_argument("--grid-scale", type=int, default=1)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--all", action="store_true")
    p.add_argument("--out", default="SCALING_r05.json")
    args = p.parse_args(argv)
    if args.all:
        run_all((1, 4, 8), args.iters, args.out)
    else:
        print(json.dumps(measure(args.devices, args.grid_scale, args.iters,
                                  n_chan=args.chan, n_chan_sig=args.c)))


if __name__ == "__main__":
    main()
