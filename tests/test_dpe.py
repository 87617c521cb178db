"""DPE tests: batch correlator peak placement + end-to-end block loop."""

import numpy as np
import jax.numpy as jnp
import pytest

from navlab_dpe_sdr_tpu.constants import C, F_CA, F_L1, L_CA
from navlab_dpe_sdr_tpu.io.handoff import read_handoff
from navlab_dpe_sdr_tpu.io.rawfile import SampleFile
from navlab_dpe_sdr_tpu.io.synth import synth_simple
from navlab_dpe_sdr_tpu.libgnss.cacode import ca_code
from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
from navlab_dpe_sdr_tpu.models.grid import make_grid, spread_grid
from navlab_dpe_sdr_tpu.ops import dpe as dpe_ops

FS = 2.5e6
S = 50000  # 20 ms


def _corr_args(prn, rc, fc, n):
    """(code_fft0, m_int, m_frac) for one channel replica."""
    chips = ca_code(prn)[None, :]
    cf = jnp.asarray(dpe_ops.nominal_code_fft(chips, FS, n))
    m_int, m_frac = dpe_ops.replica_shift_parts(
        np.array([rc]), np.array([fc - F_CA]), FS, n / FS, n)
    return cf, jnp.asarray(m_int), jnp.asarray(m_frac)


def test_batch_correlate_code_peak_position():
    """code_corr peak must land at S/2 + (fs/fc)*(rc_replica - rc_signal)."""
    prn, rc_sig, fi = 9, 400.0, 1500.0
    fc = F_CA + fi * F_CA / F_L1
    sig = synth_simple(prn, FS, S, rc=rc_sig, ri=0.2, fc=fc, fi=fi,
                       cn0_dbhz=48.0, seed=1).astype(np.complex64)
    for d_chips in (-1.5, 0.0, 2.25):
        rc_rep = rc_sig + d_chips
        cf, mi, mf = _corr_args(prn, rc_rep, fc, S)
        t = jnp.asarray((np.arange(S) / FS).astype(np.float32))
        out = dpe_ops.batch_correlate(
            jnp.asarray(sig), cf, mi, mf,
            jnp.asarray([np.int32(S)]), jnp.asarray([np.float32(fi)]),
            jnp.asarray([np.float32(0.2)]), t, 8 * (1 << 17))
        cc = np.abs(np.asarray(out.code_corr)[0])
        # the correlation is periodic per code period; the manifold only
        # samples near S/2, so test the central period's peak
        lo = S // 2 - 1250
        peak = lo + int(np.argmax(cc[lo:lo + 2500]))
        expect = S / 2 + (FS / fc) * d_chips
        assert abs(peak - expect) <= 1.6, (d_chips, peak, expect)


def test_batch_correlate_carrier_peak_position():
    """carr_fft peak at F/2 + (F/fs)*(fi_signal - fi_wipeoff)."""
    prn, rc, fi_sig = 4, 100.0, -800.0
    fc = F_CA + fi_sig * F_CA / F_L1
    sig = synth_simple(prn, FS, S, rc=rc, fc=fc, fi=fi_sig,
                       cn0_dbhz=48.0, seed=2).astype(np.complex64)
    fpts = 8 * (1 << 17)
    for d_hz in (-30.0, 0.0, 55.0):
        fi_rep = fi_sig - d_hz
        cf, mi, mf = _corr_args(prn, rc, fc, S)
        t = jnp.asarray((np.arange(S) / FS).astype(np.float32))
        out = dpe_ops.batch_correlate(
            jnp.asarray(sig), cf, mi, mf,
            jnp.asarray([np.int32(S)]), jnp.asarray([np.float32(fi_rep)]),
            jnp.asarray([np.float32(0.0)]), t, fpts)
        peak = int(np.argmax(np.abs(np.asarray(out.carr_fft)[0])))
        expect = fpts / 2 + (fpts / FS) * d_hz
        assert abs(peak - expect) <= 1.5, (d_hz, peak, expect)


def test_batch_correlate_flip_selection():
    """A nav-bit flip mid-block must select the flipped replica."""
    prn, rc, fi = 6, 250.0, 300.0
    fc = F_CA + fi * F_CA / F_L1
    bits = np.ones(60)
    bits[1:] = -1.0  # bit boundary at code period 20 -> flips in-block
    sig = synth_simple(prn, FS, S, rc=rc, fc=fc, fi=fi, cn0_dbhz=50.0,
                       bits=bits, seed=3).astype(np.complex64)
    cf, mi, mf = _corr_args(prn, rc, fc, S)
    # boundary sample: code period 20 completes at (20*L_CA - rc)/fc secs
    idx_next = int(np.floor((20 * L_CA - rc) * FS / fc)) + 1
    t = jnp.asarray((np.arange(S) / FS).astype(np.float32))
    out = dpe_ops.batch_correlate(
        jnp.asarray(sig), cf, mi, mf,
        jnp.asarray([np.int32(idx_next)]), jnp.asarray([np.float32(fi)]),
        jnp.asarray([np.float32(0.0)]), t, 8 * (1 << 17))
    assert bool(np.asarray(out.flip_used)[0])
    cc = np.abs(np.asarray(out.code_corr)[0])
    lo = S // 2 - 1250
    peak = lo + int(np.argmax(cc[lo:lo + 2500]))
    assert abs(peak - S / 2) <= 1.5


@pytest.fixture(scope="module")
def dpe_setup(capture_40s):
    dat, _meta, hand = capture_40s
    return dat, hand


@pytest.mark.slow
def test_dpe_end_to_end_tracks_truth(dpe_setup):
    """DPE from the reference handoff over the synthetic capture: fixes must
    stay near the true (static) receiver state."""
    dat, hand = dpe_setup
    rf = SampleFile(dat, fs=FS)
    rx = DPEReceiver(rf, hand, grid=spread_grid())
    fixes = rx.run(25)  # 0.5 s

    truth = hand.x_ecef
    errs = [np.linalg.norm(f.x_ecef[0:3] - truth[0:3]) for f in fixes[5:]]
    assert np.median(errs) < 15.0, f"median pos err {np.median(errs):.1f} m"
    vels = [np.linalg.norm(f.x_ecef[4:7]) for f in fixes[5:]]
    assert np.median(vels) < 2.0, f"median vel {np.median(vels):.2f} m/s"


@pytest.mark.slow
def test_dpe_converges_from_perturbed_init(dpe_setup):
    """Monte-Carlo-style pull-in: +/-40 m ENU init error must converge
    (reference main.cu:140-219 perturbation harness)."""
    from navlab_dpe_sdr_tpu.libgnss import frames
    dat, hand = dpe_setup
    rf = SampleFile(dat, fs=FS)
    import copy
    h2 = copy.deepcopy(hand)
    offset = np.array([40.0, -35.0, 20.0])
    h2.x_ecef = hand.x_ecef.copy()
    h2.x_ecef[0:3] = frames.enu_to_ecef(hand.x_ecef[0:3], offset)
    rx = DPEReceiver(rf, h2, grid=spread_grid())
    fixes = rx.run(20)
    errs = [np.linalg.norm(f.x_ecef[0:3] - hand.x_ecef[0:3]) for f in fixes]
    assert np.median(errs[-5:]) < 15.0, \
        f"did not converge: {[round(e,1) for e in errs]}"


@pytest.mark.slow
def test_montecarlo_harness(dpe_setup, tmp_path):
    """Perturbation campaign API: indexed XECEF logs, shift file, and a
    convergence summary (reference main.cu:105-224 harness)."""
    from navlab_dpe_sdr_tpu.models import montecarlo as mc

    dat, hand = dpe_setup
    out = tmp_path / "mc"
    results = mc.perturbation_sweep(dat, hand, runs=2, blocks=10,
                                    bottom=30.0, span=10.0, seed=3,
                                    out_dir=str(out), fs=FS, verbose=False)
    assert len(results) == 2
    assert all(30.0 <= abs(np.linalg.norm(r.shift_enu[:2])) for r in results)
    assert all(r.converged for r in results), \
        [(r.radius_m, r.median_err_m) for r in results]

    summary = mc.convergence_summary(results)
    assert summary["rate"] == 1.0
    assert mc.format_summary(summary)

    shifts = (out / "shifts.csv").read_text().splitlines()
    assert shifts[0].split(",")[0] == "idx"
    assert len(shifts) == 3
    xrows = (out / "run000_XFile.csv").read_text().splitlines()
    assert len(xrows) == 10
    mc.save_summary(str(out / "summary.json"), summary, results)
    assert (out / "summary.json").exists()


@pytest.mark.slow
def test_cn0_sensitivity_sweep(tmp_path):
    """C/N0 ladder: the per-block argmax breaks at 30 dB-Hz while K=8
    on-device integration holds the fix (3-seed behavior: per-block 54-73 m
    vs integrated 22-38 m); at 45 dB-Hz both hold."""
    from navlab_dpe_sdr_tpu.models import montecarlo as mc

    out = tmp_path / "sens.csv"
    pts = mc.cn0_sweep([45.0, 30.0], blocks=16, blocks_per_fix=8,
                       out_path=str(out), verbose=False)
    by = {pt.cn0_dbhz: pt for pt in pts}
    assert by[45.0].per_block_med_m < 25.0
    assert by[45.0].held
    assert by[30.0].per_block_med_m > 30.0
    assert by[30.0].integrated_med_m < by[30.0].per_block_med_m
    rows = out.read_text().splitlines()
    assert rows[0].split(",")[0] == "cn0_dbhz" and len(rows) == 3
