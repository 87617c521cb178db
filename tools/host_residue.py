"""Host-side residue breakdown of the grouped batched DPE segment.

The device cost of a 50-block group_k=5 dispatch is 8.78 ms
(tools/stage_timing.py full_g5), yet the end-to-end grouped bench
segment runs at ~12.2 ms per dispatch: the host thread is binding.
This probe wraps DPEReceiver._dispatch_batch (f64 channel propagation,
packed-param build, upload initiation) and _drain_batch (result fetch,
fix parsing, smoother + steering update) with wall timers over the
exact bench segment (device-resident capture, pipeline depth 2) and
prints the per-dispatch split, so the next rtf lever is chosen from
data rather than guesses.

Caveat: under pipeline depth >= 2, _drain_batch blocks on device
completion of the oldest in-flight dispatch, so drain_ms mixes
device-compute wait with true host fetch/parse work — subtract the
device-only per-dispatch cost from tools/stage_timing.py (full_g5) to
isolate the host share.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/host_residue.py [n_blocks]
Reuses the bench capture cache and the warm (lookahead=50, group_k=5)
jit signature — run after bench.py so no new-signature warmup is paid.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lookahead, group_k = 50, 5

    from navlab_dpe_sdr_tpu.cli import force_cpu_if_axon_dead
    force_cpu_if_axon_dead()
    import jax
    import jax.numpy as jnp

    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
    from navlab_dpe_sdr_tpu.models.grid import spread_grid

    warmup = 2 * lookahead
    sim, hand, arr = make_scenario(nav_data=True, cn0_dbhz=47.0)
    n = 50000 * (n_blocks + warmup)
    cache = f"/tmp/navlab_tpu_fixtures/bench_capture_v2_{50000 * 2350}.dat"
    if os.path.exists(cache) and \
            os.path.getsize(cache) >= DTYPE_IQ16.itemsize * n:
        samples = np.fromfile(cache, DTYPE_IQ16, count=n)
    else:
        if os.path.exists(cache):
            print(f"# cache holds < {n_blocks + warmup} blocks "
                  f"({os.path.getsize(cache) // (DTYPE_IQ16.itemsize * 50000)}"
                  " cached); synthesizing fresh")
        iq = sim.generate(n)
        samples = np.empty(n, DTYPE_IQ16)
        samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
        samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
        del iq
        from navlab_dpe_sdr_tpu.io.synth import release_workspace
        release_workspace()

    rf = SampleFile(samples=samples, fs=2.5e6)
    rx = DPEReceiver(rf, hand, grid=spread_grid(), eph=arr,
                     config=DPEConfig(ekf_mode="alpha", ekf_alpha=0.3))
    all_blocks = samples.view(np.int16).reshape(-1, rx.S, 2)
    raw_dev = jnp.asarray(all_blocks)
    jax.block_until_ready(raw_dev)

    acc = {"dispatch_s": 0.0, "drain_s": 0.0, "n_dispatch": 0, "n_drain": 0}
    orig_dispatch, orig_drain = rx._dispatch_batch, rx._drain_batch

    def timed_dispatch(*a, **kw):
        t0 = time.perf_counter()
        out = orig_dispatch(*a, **kw)
        acc["dispatch_s"] += time.perf_counter() - t0
        acc["n_dispatch"] += 1
        return out

    def timed_drain(*a, **kw):
        t0 = time.perf_counter()
        out = orig_drain(*a, **kw)
        acc["drain_s"] += time.perf_counter() - t0
        acc["n_drain"] += 1
        return out

    # warm both signatures outside the timed run
    rx.run_batched(lookahead, lookahead=lookahead, raw_blocks_dev=raw_dev,
                   start_block=0, group_k=group_k)
    rx._dispatch_batch, rx._drain_batch = timed_dispatch, timed_drain

    t0 = time.perf_counter()
    rx.run_batched(n_blocks, lookahead=lookahead, raw_blocks_dev=raw_dev,
                   start_block=warmup, pipeline=True, group_k=group_k,
                   pipeline_depth=depth)
    wall = time.perf_counter() - t0

    nd = acc["n_dispatch"]
    print({
        "n_blocks": n_blocks, "dispatches": nd,
        "wall_ms_per_dispatch": round(1e3 * wall / nd, 3),
        "dispatch_host_ms": round(1e3 * acc["dispatch_s"] / nd, 3),
        "drain_ms": round(1e3 * acc["drain_s"] / max(1, acc["n_drain"]), 3),
        "other_ms": round(1e3 * (wall - acc["dispatch_s"] - acc["drain_s"])
                          / nd, 3),
        "rtf_segment": round(n_blocks * 0.02 / wall, 2),
    })


if __name__ == "__main__":
    main()
