"""DYN artifact: dynamics envelope of the pipelined/grouped DPE defaults.

The bench's default config (pipeline depth 4 x lookahead 50 x group_k 5)
coasts 4 s between measurement feedbacks — chosen for the static
benchmark. This tool measures where that trade breaks (r4 verdict item
#3): three receiver-dynamics profiles (walking ~1.5 m/s, vehicle ~15 m/s,
oscillator drift 5e-8 s/s) are driven through run_batched over every cell
of depth in {1, 2, 4} x group_k in {1, 5}, and each cell reports
median/p95 trajectory error after settling, last-5-seconds error, and a
hold/lost verdict.

Reference anchor: the sequential feedback contract (SURVEY §7.3,
cuchanmgr.cu:338-608 — the reference feeds back every 20 ms and supports
nothing else; this framework exposes the feedback cadence as a measured
throughput/dynamics trade).

Usage:  python tools/dynamics_envelope.py [--seconds 30] [--out DYN.json]
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
C_LIGHT = 299792458.0
HOLD_MEDIAN_M = 30.0     # last-5-s median above this = feedback loop lost

PROFILES = {
    # ~1.5 m/s pedestrian (ECEF components chosen non-axis-aligned)
    "walk": {"vel": [1.0, -0.9, 0.6], "clock_drift": 0.0},
    # ~14 m/s vehicle — the test_dynamics moving-receiver profile
    "vehicle": {"vel": [10.0, -8.0, 5.0], "clock_drift": 0.0},
    # static position, 5e-8 s/s oscillator (15 m/s of clock ramp)
    "clock": {"vel": [0.0, 0.0, 0.0], "clock_drift": 5e-8},
}

CELLS = [(d, k) for d in (1, 2, 4) for k in (1, 5)]


def _capture(profile: str, seconds: float):
    """Deterministic moving-receiver capture (cached on disk)."""
    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.io.synth import CaptureSimulator

    sim, hand, arr = make_scenario(nav_data=True, cn0_dbhz=47.0)
    p = PROFILES[profile]
    rx_state = hand.x_ecef.copy()
    rx_state[4:7] = p["vel"]
    hand2 = copy.deepcopy(hand)
    hand2.x_ecef = rx_state.copy()
    if p["clock_drift"]:
        # a real handoff carries the scalar loops' drift estimate; the
        # DPE dtdot axis tracks residuals (test_dpe_tracks_clock_drift)
        hand2.x_ecef[7] = -p["clock_drift"] * C_LIGHT

    n = int(round(seconds * FS))
    cache = f"/tmp/navlab_tpu_fixtures/dyn_{profile}_v1_{n}.dat"
    if os.path.exists(cache) and os.path.getsize(cache) == 4 * n:
        samples = np.fromfile(cache, DTYPE_IQ16)
    else:
        print(f"# synthesizing {profile}: {seconds:.0f}s ...",
              file=sys.stderr)
        sim2 = CaptureSimulator(arr, rx_state, tow0=hand.rx_time, fs=FS,
                                cn0_dbhz=47.0, nav_data=True, seed=23,
                                clock_drift=p["clock_drift"])
        iq = sim2.generate(n)
        samples = np.empty(n, DTYPE_IQ16)
        samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
        samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            samples.tofile(cache + ".tmp")
            os.replace(cache + ".tmp", cache)
        except OSError:
            pass
        from navlab_dpe_sdr_tpu.io.synth import release_workspace
        release_workspace()
    return samples, hand2, arr, np.asarray(p["vel"], np.float64)


def run_cell(samples, hand, arr, vel, depth: int, group_k: int,
             lookahead: int = 50, raw_dev=None):
    """One envelope cell; returns metrics dict."""
    from navlab_dpe_sdr_tpu.io.rawfile import SampleFile
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
    from navlab_dpe_sdr_tpu.models.grid import spread_grid

    n_blocks = samples.shape[0] // 50000
    n_blocks -= n_blocks % (group_k * lookahead) if group_k > 1 else 0
    rx = DPEReceiver(SampleFile(samples=samples, fs=FS),
                     copy.deepcopy(hand), grid=spread_grid(),
                     eph=copy.deepcopy(arr),
                     config=DPEConfig(ekf_mode="alpha", ekf_alpha=0.3))
    t0 = time.perf_counter()
    rx.run_batched(n_blocks, lookahead=lookahead, raw_blocks_dev=raw_dev,
                   start_block=0, pipeline=True, group_k=group_k,
                   pipeline_depth=depth)
    wall = time.perf_counter() - t0

    # fix i references block (i+1)*group_k - 1; truth moves at vel
    errs = []
    for i, f in enumerate(rx.fixes):
        t_el = (i + 1) * group_k * 0.02
        truth = hand.x_ecef[0:3] + vel * t_el
        errs.append(float(np.linalg.norm(np.asarray(f.x_ecef[0:3]) - truth)))
    errs = np.asarray(errs)
    settle = max(1, int(round(2.0 / (group_k * 0.02))))   # 2 s
    last5 = max(1, int(round(5.0 / (group_k * 0.02))))    # last 5 s
    med = float(np.median(errs[settle:]))
    p95 = float(np.percentile(errs[settle:], 95))
    med_last5 = float(np.median(errs[-last5:]))
    return {"depth": depth, "group_k": group_k,
            "median_m": round(med, 2), "p95_m": round(p95, 2),
            "median_last5s_m": round(med_last5, 2),
            "held": bool(med_last5 < HOLD_MEDIAN_M),
            "rtf": round(n_blocks * 0.02 / wall, 1),
            "n_fixes": int(errs.size)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--profiles", default="walk,vehicle,clock")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from navlab_dpe_sdr_tpu.cli import force_cpu_if_axon_dead
    force_cpu_if_axon_dead()
    import jax
    import jax.numpy as jnp
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    out = {"seconds": args.seconds, "lookahead": 50,
           "hold_threshold_median_last5s_m": HOLD_MEDIAN_M,
           "profiles": {}}
    for prof in args.profiles.split(","):
        samples, hand, arr, vel = _capture(prof, args.seconds)
        raw_dev = jnp.asarray(samples.view(np.int16).reshape(-1, 50000, 2))
        jax.block_until_ready(raw_dev)
        cells = []
        for depth, gk in CELLS:
            r = run_cell(samples, hand, arr, vel, depth, gk,
                         raw_dev=raw_dev)
            cells.append(r)
            print(f"# {prof:8s} depth={depth} K={gk}: median "
                  f"{r['median_m']:7.2f} m  p95 {r['p95_m']:8.2f}  last5s "
                  f"{r['median_last5s_m']:8.2f}  held={r['held']} "
                  f"({r['rtf']}x)", file=sys.stderr)
        out["profiles"][prof] = {
            "speed_mps": round(float(np.linalg.norm(vel)), 2),
            "clock_drift": PROFILES[prof]["clock_drift"],
            "cells": cells}
        del raw_dev

    js = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")
    print(js)


if __name__ == "__main__":
    main()
