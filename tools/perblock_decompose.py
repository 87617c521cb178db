"""PERBLOCK artifact: stage decomposition of the per-block (50 Hz) mode.

The grouped mode got a measured floor decomposition in r3/r4; per-block
mode's end-to-end-vs-dispatch gap was only asserted ("device-side
scoring traffic, already at floor"). This tool produces the same class
of artifact for per-block mode (r4 verdict item #4):

  e2e_depth{1,2,4}  — run_batched over the bench capture, per-block
                      fixes, pipeline at that depth: ms/block wall.
  dispatch          — chained-scan device cost of the identical 50-block
                      dpe_batch_blocks program (no host, no RPC).
  corr              — same with a 256-point grid (scoring ~free):
                      correlation + fixed dispatch overhead.
  scoring           = dispatch - corr.
  host_prep         — _prepare_batch(50) alone (satcache + packing).
  drain             — _drain_batch host cost on a fetched result.
  residual          = e2e_depth4 - dispatch - host_prep - drain: the
                      un-hidden RPC / scheduling term.

Reference anchor: flow.cu:122-137 — per-block is the reference's only
mode; its 20 ms budget is the baseline these ms/block figures divide.

Usage: python tools/perblock_decompose.py [--blocks 200] [--out PB.json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FS = 2.5e6
LOOKAHEAD = 50


def _bench_capture(n_blocks: int):
    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario

    sim, hand, arr = make_scenario(nav_data=True, cn0_dbhz=47.0)
    n = 50000 * n_blocks
    for cand in sorted(
            __import__("glob").glob(
                "/tmp/navlab_tpu_fixtures/bench_capture_v2_*.dat")):
        sz = os.path.getsize(cand)
        if sz >= 4 * n:
            samples = np.fromfile(cand, DTYPE_IQ16, count=n)
            return samples, hand, arr
    iq = sim.generate(n)
    samples = np.empty(n, DTYPE_IQ16)
    samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
    samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
    from navlab_dpe_sdr_tpu.io.synth import release_workspace
    release_workspace()
    return samples, hand, arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from navlab_dpe_sdr_tpu.cli import force_cpu_if_axon_dead
    force_cpu_if_axon_dead()
    import jax
    import jax.numpy as jnp
    from navlab_dpe_sdr_tpu.io.rawfile import SampleFile
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
    from navlab_dpe_sdr_tpu.models.grid import spread_grid

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    warm = 2 * LOOKAHEAD
    samples, hand, arr = _bench_capture(args.blocks + warm)
    grid = spread_grid()
    raw_dev = jnp.asarray(samples.view(np.int16).reshape(-1, 50000, 2))
    jax.block_until_ready(raw_dev)

    def fresh_rx():
        return DPEReceiver(SampleFile(samples=samples, fs=FS),
                           copy.deepcopy(hand), grid=grid,
                           eph=copy.deepcopy(arr),
                           config=DPEConfig(ekf_mode="alpha",
                                            ekf_alpha=0.3))

    out = {"n_blocks": args.blocks, "repeats": args.repeats,
           "stat": "median_ms_per_block"}

    # --- end-to-end per-block at each pipeline depth -----------------------
    rx = fresh_rx()
    rx.run_batched(LOOKAHEAD, lookahead=LOOKAHEAD, raw_blocks_dev=raw_dev,
                   start_block=0)                       # warm signature
    for depth in (1, 2, 4):
        ts = []
        for _ in range(args.repeats):
            r = fresh_rx()
            t0 = time.perf_counter()
            r.run_batched(args.blocks, lookahead=LOOKAHEAD,
                          raw_blocks_dev=raw_dev, start_block=warm,
                          pipeline=True, pipeline_depth=depth)
            ts.append((time.perf_counter() - t0) / args.blocks * 1e3)
        out[f"e2e_depth{depth}"] = round(float(np.median(ts)), 4)
        out[f"e2e_depth{depth}_minmax"] = [round(min(ts), 4),
                                           round(max(ts), 4)]
        print(f"# e2e depth {depth}: {out[f'e2e_depth{depth}']} ms/block "
              f"{out[f'e2e_depth{depth}_minmax']}", file=sys.stderr)

    # --- host-side terms ---------------------------------------------------
    r = fresh_rx()
    r.run_batched(LOOKAHEAD, lookahead=LOOKAHEAD, raw_blocks_dev=raw_dev,
                  start_block=0)
    ts = []
    for _ in range(max(3, args.repeats)):
        t0 = time.perf_counter()
        preps = r._prepare_batch(LOOKAHEAD)
        ts.append((time.perf_counter() - t0) / LOOKAHEAD * 1e3)
    out["host_prep"] = round(float(np.median(ts)), 4)

    dev_out, preps = r._dispatch_batch(LOOKAHEAD, raw_dev, warm, 0)
    jax.block_until_ready(dev_out)
    fetched = np.asarray(dev_out)
    ts = []
    for _ in range(max(3, args.repeats)):
        rr = fresh_rx()
        rr.run_batched(LOOKAHEAD, lookahead=LOOKAHEAD,
                       raw_blocks_dev=raw_dev, start_block=0)
        _, p2 = rr._dispatch_batch(LOOKAHEAD, raw_dev, warm, 0)
        t0 = time.perf_counter()
        rr._drain_batch(dev_out, p2, fetched=fetched)
        ts.append((time.perf_counter() - t0) / LOOKAHEAD * 1e3)
    out["drain_host"] = round(float(np.median(ts)), 4)
    print(f"# host prep {out['host_prep']} + drain {out['drain_host']} "
          f"ms/block", file=sys.stderr)

    # --- device dispatch floor (chained scan, no host) ---------------------
    env = dict(os.environ, ST_K="20", ST_N=str(LOOKAHEAD),
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__)))]
                   + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    import subprocess
    res = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "stage_timing.py"), "full", "corr"],
        capture_output=True, text=True, env=env, timeout=3600)
    dispatch = corr = None
    for line in res.stdout.splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            if d["variant"] == "full":
                dispatch = d["ms_per_block"]
            elif d["variant"] == "corr":
                corr = d["ms_per_block"]
    if dispatch is None:
        print(res.stdout[-2000:], res.stderr[-2000:], file=sys.stderr)
        raise SystemExit("stage_timing failed")
    out["dispatch"] = dispatch
    out["corr"] = corr
    out["scoring"] = round(dispatch - corr, 4)
    out["residual_depth4"] = round(
        out["e2e_depth4"] - dispatch - out["host_prep"] - out["drain_host"],
        4)
    out["rtf_e2e_depth4"] = round(20.0 / out["e2e_depth4"], 2)
    out["rtf_dispatch_floor"] = round(20.0 / dispatch, 2)
    print(f"# dispatch {dispatch} (corr {corr} + scoring {out['scoring']}) "
          f"| e2e d4 {out['e2e_depth4']} -> residual "
          f"{out['residual_depth4']} ms/block; rtf e2e "
          f"{out['rtf_e2e_depth4']}x vs floor {out['rtf_dispatch_floor']}x",
          file=sys.stderr)

    js = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")
    print(js)


if __name__ == "__main__":
    main()
