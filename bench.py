"""Benchmark: end-to-end DPE real-time factor on the demo-equivalent scenario.

Runs the full DPE receiver (host f64 bookkeeping + fused TPU device step)
over an in-memory synthetic 2.5 MHz / 8-PRN capture with the reference's
default 25^4 + 25^4 spread grid, and reports the real-time factor
(processed-signal seconds per wall second).

Variance protocol (r4 verdict item #2 — the device in this environment
drifts 10-20 % across hours, so single-shot numbers are lottery tickets):
after one warm pass per jit signature, the full two-segment run is
repeated NAVLAB_BENCH_REPEATS (default 3) times with a fresh receiver
over the identical blocks; the headline value is the MEDIAN per-pass rtf
and the JSON carries min/max spread for it, the first-200 segment, and
the per-chunk scalar-tracking rtf. Docs must quote these artifact
numbers (with spread), never a best-observed session number.

Also reports cold-start time-to-first-fix (r4 verdict item #7): acquire
8 PRNs -> closed-loop track -> LNAV ephemeris decode -> handoff -> first
DPE fix, wall-clock with warm jits (compile/program-load is a cached
one-time deployment cost) plus the signal seconds consumed — the
reference's actual usage sequence (1_Data_reduct_scalar.py:35-108 +
3_Data_reduct_dp.py:76-195).

Baseline: the reference CUDARecv targets 1.0x real time on a Jetson TX2
(20 ms budget per block, BASELINE.md); vs_baseline is therefore the factor
itself.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    # the relay listener can survive a dead remote orchestrator, in which
    # case jax.devices() hangs forever — probe from a killable subprocess
    # and fall back to CPU rather than hang the whole bench
    from navlab_dpe_sdr_tpu.cli import force_cpu_if_axon_dead
    force_cpu_if_axon_dead()

    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.models.dpe import DPEReceiver
    from navlab_dpe_sdr_tpu.models.grid import spread_grid

    # default: the full demo-equivalent pass (45 s of signal = 2250 blocks,
    # BASELINE.md demo-dataset row); pass a block count for a quick run
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 2250
    lookahead = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    # fixes come at 50 Hz (per-block argmax) for the first 200 blocks —
    # the round-over-round comparison segment — then at 10 Hz via
    # coherent K-block grouping (complex windows summed on device before
    # manifold scoring: same correlation work per sample, 1/K the
    # manifold-scoring traffic, equal-or-better fix accuracy; see
    # ops/dpe_real.dpe_batch_blocks group_k)
    group_k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    # dispatched batches kept in flight (run_batched pipeline_depth):
    # with the background-fetch drain (r4), depth 4 keeps the device
    # saturated through the upload/fetch RPC round-trips — measured
    # 69.5x (depth 2) -> 108.2x (4) -> 110.6x (6) on the same warm
    # device at identical accuracy, so 4 is the knee (staleness
    # depth*lookahead*T = 4 s; dynamics-sensitive runs use per-block
    # mode or smaller depth)
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    # run_batched requires group_k | lookahead and group_k | segment-2
    # length; repair odd argv combinations up front (before sizing the
    # capture) instead of crashing after the timed work
    import math
    if group_k > 1 and lookahead % group_k:
        gk = math.gcd(group_k, lookahead)
        print(f"# group_k {group_k} does not divide lookahead {lookahead}; "
              f"using group_k={gk}", file=sys.stderr)
        group_k = max(1, gk)
    n_short = min(200, n_blocks)
    rem = (n_blocks - n_short) % group_k if group_k > 1 else 0
    if rem:
        print(f"# trimming {rem} blocks so the grouped segment is a "
              f"multiple of group_k={group_k}", file=sys.stderr)
        n_blocks -= rem

    warmup = 2 * lookahead   # one warm batch per jit signature (per-block
                             # + grouped) precedes the timed segments

    print(f"# devices: {jax.devices()}", file=sys.stderr)

    sim, hand, arr = make_scenario(nav_data=True, cn0_dbhz=47.0)
    n = 50000 * (n_blocks + warmup)

    # the 45 s synthetic capture is deterministic (fixed scenario + seed)
    # and takes a couple of minutes of host CPU to generate — cache it on disk
    import os
    cache_dir = "/tmp/navlab_tpu_fixtures"
    # v2: the synth generator changed output (complex64 / f32 noise stream)
    cache = f"{cache_dir}/bench_capture_v2_{n}.dat"
    if os.path.exists(cache) and os.path.getsize(cache) == 4 * n:
        print(f"# cached capture: {cache}", file=sys.stderr)
        samples = np.fromfile(cache, DTYPE_IQ16)
    else:
        print(f"# synthesizing {n / 2.5e6:.1f}s of 8-PRN capture...",
              file=sys.stderr)
        iq = sim.generate(n)
        samples = np.empty(n, DTYPE_IQ16)
        samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
        samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            samples.tofile(cache + ".tmp")
            os.replace(cache + ".tmp", cache)
        except OSError:
            pass
        from navlab_dpe_sdr_tpu.io.synth import release_workspace
        release_workspace()     # ~8 GB of one-shot synthesis buffers

    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig
    rf = SampleFile(samples=samples, fs=2.5e6)
    grid = spread_grid()

    def fresh_rx():
        import copy
        # alpha smoother: ~3x lower fix scatter than the reference's
        # passthrough at identical throughput
        return DPEReceiver(SampleFile(samples=samples, fs=2.5e6),
                           copy.deepcopy(hand), grid=grid,
                           eph=copy.deepcopy(arr),
                           config=DPEConfig(ekf_mode="alpha", ekf_alpha=0.3))

    rx = fresh_rx()

    # device-resident capture: a production deployment feeds blocks over
    # PCIe/DMA; this remote-tunnel environment pays ~5-25 ms per host->device
    # transfer, so the capture is staged once and the receiver runs in
    # batched mode (2 parameter uploads + 1 fused dispatch per 25 blocks)
    import jax.numpy as jnp
    all_blocks = samples.view(np.int16).reshape(-1, rx.S, 2)
    raw_dev = jnp.asarray(all_blocks)
    jax.block_until_ready(raw_dev)

    # warm both jit signatures (per-block + grouped) before the clock
    rx.run_batched(lookahead, lookahead=lookahead, raw_blocks_dev=raw_dev,
                   start_block=0)
    rx.run_batched(lookahead, lookahead=lookahead, raw_blocks_dev=raw_dev,
                   start_block=lookahead, group_k=group_k)

    def timed_pass():
        """One full two-segment pass with a fresh receiver; returns
        (rtf_full, rtf_short, errs, n_short_fixes)."""
        r = fresh_rx()
        # untimed state advance over the warmup blocks: the handoff
        # describes capture sample 0, the timed segment starts at block
        # `warmup` — processing those blocks first brings the receiver's
        # clock/state to the segment start (a fresh receiver jumping in
        # 2 s late fixes ~400 m off from satellite motion alone)
        r.run_batched(warmup, lookahead=lookahead, raw_blocks_dev=raw_dev,
                      start_block=0, pipeline=True, pipeline_depth=depth)
        n_warm = len(r.fixes)
        t0 = time.perf_counter()
        r.run_batched(n_short, lookahead=lookahead, raw_blocks_dev=raw_dev,
                      start_block=warmup, pipeline=True, pipeline_depth=depth)
        w_short = time.perf_counter() - t0
        n_sf = len(r.fixes) - n_warm
        t1 = time.perf_counter()
        if n_blocks > n_short:
            r.run_batched(n_blocks - n_short, lookahead=lookahead,
                          raw_blocks_dev=raw_dev,
                          start_block=warmup + n_short,
                          pipeline=True, group_k=group_k,
                          pipeline_depth=depth)
        w = w_short + (time.perf_counter() - t1)
        e = [float(np.linalg.norm(f.x_ecef[0:3] - hand.x_ecef[0:3]))
             for f in r.fixes[n_warm:]]
        return n_blocks * 0.02 / w, n_short * 0.02 / w_short, e, n_sf

    repeats = max(1, int(os.environ.get("NAVLAB_BENCH_REPEATS", "3")))
    passes = [timed_pass() for _ in range(repeats)]
    rtfs = sorted(p[0] for p in passes)
    rtfs_short = sorted(p[1] for p in passes)
    rtf = float(np.median(rtfs))
    rtf_short = float(np.median(rtfs_short))
    _, _, errs, n_short_fixes = passes[0]    # fixes identical across passes
    errs_grouped = errs[n_short_fixes:]
    signal_s = n_blocks * 0.02
    wall = signal_s / rtf
    n_scored = n_short + (n_blocks - n_short) / group_k
    gridpts_s = n_scored * (grid.n_pos + grid.n_vel) * len(hand.prn_list) / wall

    print(f"# {n_blocks} blocks ({signal_s:.0f}s signal): "
          f"rtf median {rtf:.2f}x of {repeats} passes "
          f"[{rtfs[0]:.2f}, {rtfs[-1]:.2f}]; "
          f"median fix error {np.median(errs):.1f} m "
          f"(p95 {np.percentile(errs, 95):.1f}); "
          f"grouped-K{group_k} segment median "
          f"{np.median(errs_grouped) if errs_grouped else float('nan'):.1f} m; "
          f"first-{n_short}-block rtf {rtf_short:.2f}x "
          f"[{rtfs_short[0]:.2f}, {rtfs_short[-1]:.2f}] (per-block fixes); "
          f"grid-point-channel evals/s {gridpts_s:.3e}", file=sys.stderr)

    # scalar-tracking real-time factor on the same capture (8 channels,
    # 1 ms closed-loop DLL/PLL scan on the device). Honest axon timing:
    # varying input chunks + a value fetch per chunk; per-chunk rtf list
    # -> median + spread. The first track_chunk call resolves the replica
    # strategy via the one-shot runtime calibration (ops.tracking,
    # cached in /tmp) — outside the timed region.
    scalar_rtf = None
    scalar_rtfs = []
    ms_blocks = samples.view(np.int16).reshape(-1, 2500, 2)
    chunk = 2000
    n_chunks = min(ms_blocks.shape[0] // chunk, 5)
    if n_chunks >= 2:
        from navlab_dpe_sdr_tpu.libgnss.cacode import ca_table
        from navlab_dpe_sdr_tpu.ops import tracking as trk
        tab = jnp.asarray(ca_table(hand.prn_list).astype(np.float32))
        st = trk.init_state(rc=hand.rc, ri=hand.ri, fc=hand.fc, fi=hand.fi)
        # int16 uploads (track_chunk casts on-device): the upload is the
        # dominant remote-runtime term of this segment (r5)
        chunks = [jnp.asarray(ms_blocks[i * chunk:(i + 1) * chunk])
                  for i in range(n_chunks)]
        st, log = trk.track_chunk(st, chunks[0], tab, rf.fs, rf.fcaid)
        float(jnp.sum(log.iP))                      # compile + warm
        for ch in chunks[1:]:
            t0 = time.perf_counter()
            st, log = trk.track_chunk(st, ch, tab, rf.fs, rf.fcaid)
            float(jnp.sum(log.iP))
            scalar_rtfs.append(chunk * 1e-3 / (time.perf_counter() - t0))
        scalar_rtfs.sort()
        scalar_rtf = float(np.median(scalar_rtfs))
        print(f"# scalar tracking: median {scalar_rtf:.1f}x of "
              f"{len(scalar_rtfs)} chunks [{scalar_rtfs[0]:.1f}, "
              f"{scalar_rtfs[-1]:.1f}] ({len(hand.prn_list)} channels)",
              file=sys.stderr)

    # cold-start time-to-first-fix (see module docstring). Skippable for
    # quick runs: NAVLAB_BENCH_SKIP_TTFF=1.
    ttff = None
    if samples.shape[0] < int(36.0 * 2.5e6):
        ttff = {"skipped": "capture shorter than the ~31 s LNAV "
                           "subframe-1-3 wait; run the full-length bench"}
    elif not os.environ.get("NAVLAB_BENCH_SKIP_TTFF"):
        try:
            ttff = _ttff(samples, hand, grid)
        except Exception as e:      # ttff must never kill the artifact
            ttff = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# ttff: {ttff}", file=sys.stderr)

    # on-device oracle parity runback (SURVEY §4: golden-model
    # cross-validation is the reference's test strategy; r3 verdict asked
    # for it ON the actual bench backend each round, since the CI
    # equivalence tests run CPU-only): factorized windowed correlator vs
    # its direct form, and the pallas chunk scorer vs the XLA one-hot
    # scorer, on one real capture block. Set NAVLAB_BENCH_SKIP_PARITY=1
    # to skip (three small extra jit signatures).
    parity = None
    if not os.environ.get("NAVLAB_BENCH_SKIP_PARITY"):
        try:
            parity = _parity_block(samples, hand, arr, grid)
        except Exception as e:   # parity must never kill the bench artifact
            parity = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# parity: {parity}", file=sys.stderr)

    print(json.dumps({
        "metric": "dpe_real_time_factor",
        "value": round(rtf, 2),
        "unit": "x_realtime_2.5MHz_8prn_25^4grid",
        "vs_baseline": round(rtf / 1.0, 2),
        "protocol": {"passes": repeats, "stat": "median",
                     "warmup": "one warm batch per jit signature"},
        "value_minmax": [round(rtfs[0], 2), round(rtfs[-1], 2)],
        "signal_seconds": signal_s,
        "fix_median_m": round(float(np.median(errs)), 2),
        "fix_p95_m": round(float(np.percentile(errs, 95)), 2),
        "rtf_first_200": round(rtf_short, 2),
        "rtf_first_200_minmax": [round(rtfs_short[0], 2),
                                 round(rtfs_short[-1], 2)],
        "coherent_group_k": group_k,
        "pipeline_depth": depth,
        "grouped_fix_rate_hz": round(1.0 / (group_k * 0.02), 1),
        "fix_median_m_grouped": (None if not errs_grouped else
                                 round(float(np.median(errs_grouped)), 2)),
        "scalar_track_rtf": (None if scalar_rtf is None
                             else round(scalar_rtf, 2)),
        "scalar_track_rtf_minmax": (None if not scalar_rtfs else
                                    [round(scalar_rtfs[0], 2),
                                     round(scalar_rtfs[-1], 2)]),
        "ttff": ttff,
        "parity": parity,
    }))


def _ttff(samples, hand, grid):
    """Cold-start time-to-first-fix on the cached capture (r4 verdict #7).

    The reference's product sequence: acquisition (best-of-two 10 ms
    blocks, 8 PRN), closed-loop scalar tracking, LNAV ephemeris decode
    (needs subframes 1-3 => >= ~30 s of signal), handoff, first DPE fix
    (1_Data_reduct_scalar.py:35-108, 3_Data_reduct_dp.py:76-195). Run
    twice: pass 1 warms every jit signature (compile + axon program load
    are cached one-time deployment costs, excluded from the product
    number), pass 2 is the timed cold-START (cold receiver STATE) run.
    Returns wall seconds, signal seconds consumed, and the first-fix
    error — in offline replay wall << signal shows the receiver clears
    the pipeline far faster than the eph wait that dominates real TTFF.
    """
    import copy
    import time

    from navlab_dpe_sdr_tpu.io.rawfile import SampleFile
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
    from navlab_dpe_sdr_tpu.models.scalar import ScalarReceiver

    prns = list(hand.prn_list)

    def pipeline():
        rf = SampleFile(samples=samples, fs=2.5e6)
        rx = ScalarReceiver(rf, prns)
        rx.acquire(verbose=False)
        # track to the first point ephemerides CAN be complete, then in
        # 2 s steps until EVERY channel decodes (save_handoff/eph_array
        # export all channels, so a partial decode cannot hand off; the
        # subframe phase differs per PRN, so the tail takes 0-6 s more)
        rx.track(30_000)
        signal_ms = 30_000
        good = rx.decode_ephemerides(verbose=False)
        while len(good) < len(prns) and signal_ms < 44_000:
            rx.track(2_000)
            signal_ms += 2_000
            good = rx.decode_ephemerides(verbose=False)
        if len(good) < len(prns):
            raise RuntimeError(f"only {len(good)}/{len(prns)} "
                               f"ephemerides decoded")
        h = rx.save_handoff("")
        drx = DPEReceiver(SampleFile(samples=samples, fs=2.5e6), h,
                          grid=grid, eph=rx.eph_array(), config=DPEConfig())
        fix = drx.run(1)[0]
        signal_s = h.bytes_read / 4 / 2.5e6 + 0.02
        return signal_s, float(np.linalg.norm(
            np.asarray(fix.x_ecef[0:3]) - hand.x_ecef[0:3])), len(good)

    pipeline()                                   # warm all signatures
    t0 = time.perf_counter()
    signal_s, fix_m, n_eph = pipeline()
    wall = time.perf_counter() - t0
    return {"ttff_s": round(wall, 2), "signal_s": round(signal_s, 2),
            "first_fix_m": round(fix_m, 2), "eph_decoded": n_eph}


def _parity_block(samples, hand, arr, grid):
    """Max relative differences of the hot-path numerics vs their oracles
    on the active backend, using one real capture block + real channel
    geometry (a throwaway receiver provides the prep)."""
    import copy
    import os

    import jax
    import jax.numpy as jnp

    from navlab_dpe_sdr_tpu.io.rawfile import SampleFile
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
    from navlab_dpe_sdr_tpu.ops import dpe_real as dr

    rx = DPEReceiver(SampleFile(samples=samples[:50000 * 2].copy(),
                                fs=2.5e6),
                     copy.deepcopy(hand), grid=grid,
                     eph=copy.deepcopy(arr), config=DPEConfig())
    fpk, ipk, _, _, _, _ = rx._prepare_block()
    raw = samples[:50000]
    raw_re = jnp.asarray(raw["i"].astype(np.float32))
    raw_im = jnp.asarray(raw["q"].astype(np.float32))
    kw = dict(carr_fftpts=rx.carr_fftpts, period=rx.period,
              n_periods=rx.S // rx.period, code_win=rx.code_win,
              carr_win=rx.carr_win)
    args = (raw_re, raw_im, rx._chips_f32, rx._base0,
            jnp.asarray(fpk[0]), jnp.asarray(ipk[0]),
            jnp.asarray(fpk[1]), jnp.asarray(fpk[2]), rx._time_idc,
            jnp.asarray(ipk[1]), jnp.asarray(ipk[2]))
    fast = dr.windowed_correlate(*args, **kw)
    direct = dr._windowed_correlate_direct(*args, **kw)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b) / (np.abs(b).max() + 1e-30)))

    out = {
        "backend": jax.default_backend(),
        "corr_code_max_rel": rel(fast.code_mag, direct.code_mag),
        "corr_carr_max_rel": rel(fast.carr_mag, direct.carr_mag),
        "corr_flip_equal": bool(np.array_equal(np.asarray(fast.flip_used),
                                               np.asarray(direct.flip_used))),
        "corr_argmax_equal": bool(
            np.array_equal(np.argmax(np.asarray(fast.code_mag), 1),
                           np.argmax(np.asarray(direct.code_mag), 1))),
    }

    # pallas chunk scorer vs the XLA one-hot scorer (f32 taps both sides
    # so the comparison isolates the kernel, not the bf16 rounding the
    # XLA TPU default trades)
    from navlab_dpe_sdr_tpu.ops import pallas_score as pk
    win = jnp.asarray(np.asarray(fast.code_mag)[None])      # [1, C, W]
    los = jnp.asarray(fpk[3:6].T[None])                     # [1, C, 3]
    cen = jnp.asarray((fpk[7] - 0.0)[None])
    coe = jnp.asarray(fpk[8][None])
    r0 = jnp.asarray(fpk[6][None])
    gsl = slice(0, 4096)
    o3 = jnp.asarray(grid.d_enu[gsl].astype(np.float32))
    o1 = jnp.asarray(grid.dt_m[gsl].astype(np.float32))
    interpret = jax.default_backend() != "tpu"
    try:
        pal = pk.score_chunk_pallas(win, los, cen, coe, r0, o3, o1,
                                    interpret=interpret)
        old_taps = dr.SCORE_TAP_DTYPE
        dr.SCORE_TAP_DTYPE = jnp.float32
        try:
            xla = dr._score_chunk(win, los, cen, coe, r0, o3, o1,
                                  "quadratic", 1)
        finally:
            dr.SCORE_TAP_DTYPE = old_taps
        out["pallas_score_max_rel"] = rel(pal, xla)
    except Exception as e:
        out["pallas_score_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


if __name__ == "__main__":
    main()
