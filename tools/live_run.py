"""LIVE_r03 artifact driver: real-time paced run on the bench capture.

Prepares the bench scenario's handoff CSV, then execs the product `live`
subcommand against the cached 45 s capture: a paced TCP server delivers
samples at true 2.5 MHz wall-clock and the receiver must hold real time
under the 1.5 s watchdog (RunLive, sampleblock.cu:421-426).

    python tools/live_run.py [--seconds 45] [--lookahead 50]
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=45.0)
    p.add_argument("--lookahead", type=int, default=50)
    p.add_argument("--capture", default=None,
                   help="int16-I/Q capture; default: the largest cached "
                        "bench_capture_v2_*.dat (bench.py caches one)")
    p.add_argument("--json", default="LIVE_r03.json")
    args = p.parse_args(argv)

    from navlab_dpe_sdr_tpu.io.handoff import write_handoff
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario

    if args.capture is None:
        # bench.py's cache name encodes its sample count, which tracks its
        # warmup setting — glob rather than hardcode a stale size
        import glob
        caps = sorted(glob.glob(
            "/tmp/navlab_tpu_fixtures/bench_capture_v2_*.dat"),
            key=os.path.getsize)
        if not caps:
            raise SystemExit("no cached bench capture under "
                             "/tmp/navlab_tpu_fixtures (run bench.py once "
                             "to generate one), and no --capture given")
        args.capture = caps[-1]
        print(f"# capture: {args.capture}")
    if not os.path.exists(args.capture):
        raise SystemExit(f"capture missing: {args.capture} (run bench.py "
                         "once to generate/cache it)")
    _, hand, _ = make_scenario(nav_data=True, cn0_dbhz=47.0)
    hand_path = "/tmp/navlab_tpu_fixtures/live_handoff.csv"
    write_handoff(hand_path, hand)

    cmd = [sys.executable, "-m", "navlab_dpe_sdr_tpu.cli", "live",
           args.capture, "--handoff", hand_path,
           "--seconds", str(args.seconds),
           "--lookahead", str(args.lookahead),
           "--set", "ekf_mode=alpha", "--set", "ekf_alpha=0.3",
           "--json", args.json]
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd)
    raise SystemExit(r.returncode)


if __name__ == "__main__":
    main()
