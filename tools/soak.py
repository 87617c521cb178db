"""SOAK artifact: long-run phase-bookkeeping drift + memory flatness.

The f32 residual-phase design argues ~1e-3 chip of error over 36 s
(ops/tracking.py header); the reference caps runs at 60 s
(dpinit.cpp:231). This tool drives MINUTES-to-HOURS of signal through
both product loops (r4 verdict item #8) with the capture synthesized in
streaming chunks (no multi-GB file):

  scalar: closed-loop track of all 8 channels; every chunk, a nav
          solution from the tracked (cp, rc, fi) — secular bookkeeping
          drift (cp slips, rc accumulation error) shows up as a fix /
          clock ramp.
  dpe:    grouped run_batched (bench default K) fed per-batch uploads;
          per-minute median fix error.
  rss:    resident set size per minute — flat memory proves no leak in
          the chunked pipelines (reference EOF/long-run handling,
          sampleblock.cu:367-372).

Usage: python tools/soak.py [--minutes 10] [--out SOAK.json]
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
CHUNK_S = 2.0                      # synthesis + tracking chunk
GROUP_K = 5
LOOKAHEAD = 50


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from navlab_dpe_sdr_tpu.cli import force_cpu_if_axon_dead
    force_cpu_if_axon_dead()
    import jax
    import jax.numpy as jnp
    from navlab_dpe_sdr_tpu.io.rawfile import SampleFile
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.io.synth import release_workspace
    from navlab_dpe_sdr_tpu.libgnss import naveng
    from navlab_dpe_sdr_tpu.libgnss.cacode import ca_table
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
    from navlab_dpe_sdr_tpu.models.grid import spread_grid
    from navlab_dpe_sdr_tpu.ops import tracking as trk

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    sim, hand, arr = make_scenario(nav_data=True, cn0_dbhz=47.0)
    eph = arr

    n_chunk = int(CHUNK_S * FS)
    n_chunks = int(round(args.minutes * 60 / CHUNK_S))
    chunk_ms = int(CHUNK_S * 1e3)

    # scalar loop state (device) + cp bookkeeping (host, from logs)
    tab = jnp.asarray(ca_table(hand.prn_list).astype(np.float32))
    st = trk.init_state(rc=hand.rc, ri=hand.ri, fc=hand.fc, fi=hand.fi,
                        cp=hand.cp)
    fcaid = SampleFile(samples=np.zeros(0, np.dtype([("i", np.int16),
                                                     ("q", np.int16)])),
                       fs=FS).fcaid

    # DPE receiver in streaming-batched mode: donor rawfile, per-batch
    # device uploads of freshly synthesized blocks
    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16
    donor = SampleFile(samples=np.zeros(0, DTYPE_IQ16), fs=FS)
    drx = DPEReceiver(donor, copy.deepcopy(hand), grid=spread_grid(),
                      eph=copy.deepcopy(eph),
                      config=DPEConfig(ekf_mode="alpha", ekf_alpha=0.3))

    scalar_fix = []          # (t, fix_err_m, clk_m, cp_frac_spread)
    dpe_fix = []             # (t, err_m)
    rss = []
    t_wall0 = time.perf_counter()

    cp0 = None
    for ci in range(n_chunks):
        t_sig = ci * CHUNK_S
        iq = sim.generate(n_chunk, start_sample=ci * n_chunk)
        blk = np.empty((chunk_ms, 2500, 2), np.float32)
        blk[..., 0] = np.clip(np.round(iq.real), -32768, 32767
                              ).reshape(chunk_ms, 2500)
        blk[..., 1] = np.clip(np.round(iq.imag), -32768, 32767
                              ).reshape(chunk_ms, 2500)

        # ---- scalar tracking ----
        st, log = trk.track_chunk(st, jnp.asarray(blk), tab, FS, fcaid)
        rc = np.asarray(log.rc)[-1]                     # start of last ms
        fi_t = np.asarray(log.fi)[-1]
        ncp = np.asarray(log.ncp)
        cp = np.asarray(log.cp)[-1] + ncp[-1]           # end of chunk
        if cp0 is None:
            cp0 = cp.copy()
        # propagate rc across the final window for the epoch at chunk end
        fc_t = np.asarray(log.fc)[-1]
        rc_end = np.mod(rc + fc_t * 1e-3, 1023.0)
        try:
            _, rx_time, x, *_ = naveng.calculate_nav_soln(
                cp.astype(np.float64), rc_end, fi_t, eph,
                rx_time0=hand.rx_time + t_sig + CHUNK_S)
            err = float(np.linalg.norm(np.asarray(x).ravel()[:3]
                                       - hand.x_ecef[:3]))
            clk = float(np.asarray(x).ravel()[3])
        except Exception as e:
            err, clk = float("nan"), float("nan")
            print(f"# nav solve failed at {t_sig}: {e}", file=sys.stderr)
        scalar_fix.append((round(t_sig + CHUNK_S, 1), round(err, 3),
                           round(clk, 3)))

        # ---- grouped DPE ----
        i16 = blk.reshape(chunk_ms // 20, 50000, 2).astype(np.int16)
        raw_dev = jnp.asarray(i16)
        n_blocks = i16.shape[0]
        drx.run_batched(n_blocks, lookahead=LOOKAHEAD,
                        raw_blocks_dev=raw_dev, start_block=0,
                        pipeline=True, group_k=GROUP_K, pipeline_depth=1)
        derr = [float(np.linalg.norm(f.x_ecef[:3] - hand.x_ecef[:3]))
                for f in drx.fixes[-(n_blocks // GROUP_K):]]
        dpe_fix.append((round(t_sig + CHUNK_S, 1),
                        round(float(np.median(derr)), 3)))

        if ci % max(1, int(60 / CHUNK_S)) == 0:
            rss.append((round(t_sig, 1), round(_rss_mb(), 1)))
            print(f"# t={t_sig:6.0f}s scalar {err:7.2f} m clk {clk:9.2f} | "
                  f"dpe {dpe_fix[-1][1]:6.2f} m | rss {rss[-1][1]:.0f} MB",
                  file=sys.stderr, flush=True)
        del raw_dev
    release_workspace()

    t = np.array([r[0] for r in scalar_fix])
    e = np.array([r[1] for r in scalar_fix])
    clk = np.array([r[2] for r in scalar_fix])
    ok = np.isfinite(e)
    drift_m_per_min = float(np.polyfit(t[ok] / 60.0, e[ok], 1)[0])
    clk_slope = float(np.polyfit(t[ok] / 60.0, clk[ok], 1)[0])
    de = np.array([r[1] for r in dpe_fix])
    dpe_drift = float(np.polyfit(t / 60.0, de, 1)[0])
    rss_mb = [r[1] for r in rss]

    out = {
        "signal_minutes": args.minutes,
        "wall_s": round(time.perf_counter() - t_wall0, 1),
        "scalar_fix_first_last_m": [e[ok][0], e[ok][-1]],
        "scalar_fix_median_m": round(float(np.median(e[ok])), 3),
        "scalar_err_drift_m_per_min": round(drift_m_per_min, 4),
        "scalar_clk_drift_m_per_min": round(clk_slope, 4),
        "dpe_fix_median_m": round(float(np.median(de)), 3),
        "dpe_err_drift_m_per_min": round(dpe_drift, 4),
        "rss_first_last_mb": [rss_mb[0], rss_mb[-1]],
        "rss_growth_mb_per_min": round(
            (rss_mb[-1] - rss_mb[0]) / max(args.minutes, 1e-9), 2),
        "scalar_series": scalar_fix[:: max(1, len(scalar_fix) // 100)],
        "dpe_series": dpe_fix[:: max(1, len(dpe_fix) // 100)],
        "rss_series": rss,
    }
    js = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(js + "\n")
    print(js)


if __name__ == "__main__":
    main()
