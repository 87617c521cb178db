"""Multi-host launch: jax.distributed + global (chan x grid) mesh.

The reference is single-process/single-GPU (SURVEY §2.3 P7 — no
communication backend exists); this module provides the scale-out the
BASELINE north star asks for: each host runs one process, the position-time
grid shards globally over all devices, per-host sample files replace the
reference's unused TCP socket mode, and the per-block boundary state (a few
hundred bytes of phases/counters) is replicated rather than communicated.

Launch (one command per host):

    python -m navlab_dpe_sdr_tpu.parallel.launch \
        --coordinator host0:9123 --num-processes 4 --process-id $RANK \
        --capture /data/cap_$RANK.dat --handoff hand.csv --blocks 1000
"""

from __future__ import annotations

import argparse

import numpy as np


def init_distributed(coordinator: str, num_processes: int, process_id: int):
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.devices()


def global_mesh(n_chan: int = 1):
    """Mesh over every device of every participating process."""
    from .mesh import make_mesh
    import jax

    return make_mesh(n_chan=n_chan, devices=jax.devices())


def scaling_bench(mesh, n_iters: int = 50, grid_scale: int = 1):
    """Grid-points/s throughput of the sharded scoring step on this mesh —
    the BASELINE scaling-efficiency metric. Runs the fused real-engine step
    with a spread grid replicated `grid_scale` times along the grid axis."""
    import time

    import jax
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from .mesh import sharded_dpe_step_real

    from ..models.grid import spread_grid
    g = spread_grid()
    d_enu = np.tile(g.d_enu, (grid_scale, 1))
    dt = np.tile(g.dt_m, grid_scale)
    dv = np.tile(g.dv_enu, (grid_scale, 1))
    dtd = np.tile(g.dtdot, grid_scale)

    args, meta = ge._example_args(c=8, s=50000)
    args = list(args)
    args[-4] = jnp.asarray(d_enu.astype(np.float32))
    args[-3] = jnp.asarray(dt.astype(np.float32))
    args[-2] = jnp.asarray(dv.astype(np.float32))
    args[-1] = jnp.asarray(dtd.astype(np.float32))

    step = sharded_dpe_step_real(mesh, **meta)
    with mesh:
        out = step(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = step(*args)
        jax.block_until_ready(out)
        dt_s = (time.perf_counter() - t0) / n_iters
    n_pts = d_enu.shape[0] + dv.shape[0]
    return {"sec_per_block": dt_s, "grid_points_per_s": n_pts / dt_s,
            "devices": mesh.devices.size}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--capture", help="this host's sample file shard")
    p.add_argument("--handoff")
    p.add_argument("--blocks", type=int, default=100)
    p.add_argument("--batched", action="store_true",
                   help="use the batched scan path (run_batched)")
    p.add_argument("--bench-only", action="store_true")
    args = p.parse_args(argv)

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    mesh = global_mesh()

    if args.bench_only or not args.capture:
        stats = scaling_bench(mesh)
        print(f"[proc {args.process_id}] {stats}")
        return

    # full multi-host DPE: every process runs the identical host loop on its
    # own capture shard; the jitted device step is built over the global
    # mesh (DPEConfig.mesh), so grid scoring shards across every device of
    # every process and the fix replicates back
    from ..io.handoff import read_handoff
    from ..io.rawfile import SampleFile
    from ..models.dpe import DPEConfig, DPEReceiver

    hand = read_handoff(args.handoff)
    rf = SampleFile(args.capture, fs=2.5e6)
    rx = DPEReceiver(rf, hand, config=DPEConfig(mesh=mesh))
    if args.batched:
        rx.run_batched(args.blocks)
    else:
        rx.run(args.blocks)
    print(f"[proc {args.process_id}] final fix {rx.fixes[-1].x_ecef[:3]}")


if __name__ == "__main__":
    main()
