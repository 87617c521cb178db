"""Full-pass survey artifact: multi-epoch joint DPE over the 45 s bench
capture. Writes SURVEY_r{round}.json.

Runs DPEReceiver.run_survey over the same deterministic 8-PRN static
scenario bench.py uses (truth known exactly), reporting the joint
estimate's ENU error, the per-batch fix statistics it beats, and the
joint covariance. The reference has no comparable estimator — its
per-block architecture discards each block's score surface
(batchcorrmanifold.cu:2502-2635).

    python tools/survey_bench.py [--blocks 2250] [--batch 50] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", type=int, default=2250)
    p.add_argument("--batch", type=int, default=50)
    p.add_argument("--fine-n", type=int, default=33)
    p.add_argument("--fine-spacing", type=float, default=0.25)
    p.add_argument("--zoom-interp", default=None,
                   choices=[None, "quadratic", "linear", "sinc"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default="SURVEY_r02.json")
    args = p.parse_args(argv)

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from navlab_dpe_sdr_tpu.cli import _axon_tunnel_alive

    if args.cpu or (os.environ.get("PALLAS_AXON_POOL_IPS")
                    and not _axon_tunnel_alive()):
        print("# CPU backend", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.libgnss import frames
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
    from navlab_dpe_sdr_tpu.models.grid import spread_grid

    sim, hand, arr = make_scenario(nav_data=True, cn0_dbhz=47.0)
    n_batches = args.blocks // args.batch
    n_blocks = n_batches * args.batch
    n = 50000 * n_blocks

    cache_dir = "/tmp/navlab_tpu_fixtures"
    # reuse bench.py's cached capture when it covers the span (it carries
    # `lookahead` warmup blocks beyond n_blocks; extra tail is harmless)
    samples = None
    if os.path.isdir(cache_dir):
        for f in sorted(os.listdir(cache_dir)):
            if f.startswith("bench_capture_v2_") and f.endswith(".dat"):
                m = int(f[len("bench_capture_v2_"):-4])
                if m >= n:
                    print(f"# cached capture: {f}", file=sys.stderr)
                    samples = np.fromfile(os.path.join(cache_dir, f),
                                          DTYPE_IQ16, count=n)
                    break
    if samples is None:
        print(f"# synthesizing {n / 2.5e6:.1f}s of capture...",
              file=sys.stderr)
        iq = sim.generate(n)
        samples = np.empty(n, DTYPE_IQ16)
        samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
        samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)

    rf = SampleFile(samples=samples, fs=2.5e6)
    rx = DPEReceiver(rf, hand, grid=spread_grid(), eph=arr,
                     config=DPEConfig(ekf_mode="alpha", ekf_alpha=0.3))
    t0 = time.time()
    res = rx.run_survey(n_batches, blocks_per_fix=args.batch,
                        fine_spacing=args.fine_spacing, fine_n=args.fine_n,
                        zoom_interp=args.zoom_interp)
    wall = time.time() - t0

    truth = hand.x_ecef
    r = frames.ecef_to_enu_matrix(truth[0:3])
    enu = r @ (res.x_ecef[0:3] - truth[0:3])
    errs = [float(np.linalg.norm(f.x_ecef[0:3] - truth[0:3]))
            for f in rx.fixes]
    payload = {
        "backend": jax.default_backend(),
        "n_blocks": res.n_blocks, "n_batches": res.n_batches,
        "signal_seconds": res.n_blocks * 0.02, "wall_s": round(wall, 2),
        "survey_err_m": round(float(np.linalg.norm(enu)), 3),
        "survey_err_enu_m": [round(float(e), 3) for e in enu],
        "survey_clk_err_m": round(float(res.x_ecef[3] - truth[3]), 3),
        "survey_vel_err_ms": round(
            float(np.linalg.norm(res.x_ecef[4:7] - truth[4:7])), 4),
        "per_batch_median_err_m": round(float(np.median(errs)), 3),
        "per_batch_p95_err_m": round(float(np.percentile(errs, 95)), 3),
        "sigma_pos_enu_clk_m": [round(float(s), 3) for s in res.sigma_pos],
        "sigma_vel": [round(float(s), 4) for s in res.sigma_vel],
        "zoom_interp": args.zoom_interp or "config-default(quadratic)",
        "fine_spacing_m": args.fine_spacing, "fine_n": args.fine_n,
    }
    print(json.dumps(payload, indent=1))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"# written: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
