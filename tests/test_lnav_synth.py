"""LNAV encode->decode round trip and synthetic-capture sanity tests."""

import numpy as np
import pytest

from navlab_dpe_sdr_tpu.constants import C, F_CA, F_L1, L_CA
from navlab_dpe_sdr_tpu.libgnss import dataparser, lnav, rinex
from navlab_dpe_sdr_tpu.libgnss.cacode import ca_code
from navlab_dpe_sdr_tpu.libgnss.ephemeris import EphArray
from navlab_dpe_sdr_tpu.io.handoff import read_handoff
from navlab_dpe_sdr_tpu.io.synth import CaptureSimulator, synth_simple

PRNS = [2, 3, 6, 12, 17, 19, 24, 28]


@pytest.fixture(scope="module")
def eph8(rinex_path, handoff_path):
    hand = read_handoff(handoff_path)
    return hand, hand.eph_array()


def test_lnav_roundtrip(eph8):
    """Encoded subframes must decode back to the same ephemeris fields."""
    hand, arr = eph8
    eph = arr.ephs[0]
    tow0 = 413994.0  # multiple of 6
    stream = lnav.encode_stream(eph, tow0, 15)  # 90 s -> ids cycle, incl 1,2,3
    cp_sign = np.kron(1 - 2 * stream, np.ones(20))  # bit -> 20 cps, 0/1 -> +/-1

    decoded, parity_ok = dataparser.parse_ephemerides(
        cp_sign[40 * 20:], cp_offset=0.0, prn=eph.prn)
    assert parity_ok == 50  # all 5x10 words pass parity

    # the decoded anchor maps a subframe boundary
    assert decoded.tow_timestamp % 6 == 0

    for name in ("sqrt_A", "M_0", "e", "t_oe", "OMEGA_0", "i_0", "omega",
                 "delta_n", "OMEGADOT", "IDOT", "C_rs", "C_rc", "C_uc",
                 "C_us", "C_ic", "C_is", "a_f0", "a_f1", "a_f2", "T_GD",
                 "t_oc"):
        ref_val = getattr(eph, name)
        dec_val = getattr(decoded, name)
        scale = max(abs(ref_val), 1e-30)
        assert abs(dec_val - ref_val) / scale < 1e-6 or \
            abs(dec_val - ref_val) < 1e-11, f"{name}: {ref_val} vs {dec_val}"
    assert decoded.IODE == eph.IODE
    assert decoded.weeknumber == eph.weeknumber
    assert decoded.complete


def test_synth_simple_correlates():
    """The simple synth signal must peak at the configured code phase."""
    fs = 2.5e6
    n = 2500
    rc, fi = 123.4, 1800.0
    sig = synth_simple(2, fs, n, rc=rc, ri=0.3, fi=fi, cn0_dbhz=50.0)
    t = np.arange(n) / fs
    # replica with the right phase wins
    repl_good = ca_code(2)[np.mod(np.floor(t * F_CA + rc), L_CA).astype(int)]
    repl_bad = ca_code(2)[np.mod(np.floor(t * F_CA + rc + 3.0), L_CA).astype(int)]
    bb = sig * np.exp(-2j * np.pi * (fi * t + 0.3))
    good = abs(np.inner(bb, repl_good))
    bad = abs(np.inner(bb, repl_bad))
    assert good > 4 * bad


def test_capture_simulator_signal_structure(eph8):
    """Full-geometry capture: wiping off with truth parameters must yield a
    coherent correlation peak for every satellite."""
    hand, arr = eph8
    sim = CaptureSimulator(arr, hand.x_ecef, tow0=hand.rx_time_a, fs=2.5e6,
                           cn0_dbhz=47.0, nav_data=False)
    n = 2500
    sig, truth = sim.generate(n, return_truth=True)
    t = np.arange(n) / sim.fs

    for ch in truth.channels:
        # code replica from truth code phase; carrier from truth doppler
        fc = F_CA * (1.0 + ch.doppler0 / F_L1)
        code_idx = np.mod(np.floor(t * fc + ch.code_phase0), L_CA).astype(int)
        repl = ca_code(ch.prn)[code_idx]
        bb = sig * np.exp(-2j * np.pi * ch.doppler0 * t)
        peak = abs(np.inner(bb, repl))
        # expected coherent sum ~ amp * n
        assert peak > 0.5 * ch.amplitude * n, f"PRN {ch.prn}"
        # a 5-chip-offset replica must not correlate
        repl_off = ca_code(ch.prn)[np.mod(code_idx + 5, 1023)]
        assert abs(np.inner(bb, repl_off)) < 0.45 * peak


def test_capture_dopplers_match_handoff(eph8):
    """Simulated at the handoff state, per-satellite Dopplers must come out
    near the handoff's tracked fi values (same geometry)."""
    hand, arr = eph8
    sim = CaptureSimulator(arr, hand.x_ecef, tow0=hand.rx_time_a, fs=2.5e6)
    _, truth = sim.generate(100, return_truth=True)
    for i, ch in enumerate(truth.channels):
        assert abs(ch.doppler0 - hand.fi[i]) < 15.0, \
            f"PRN {ch.prn}: {ch.doppler0:.1f} vs {hand.fi[i]:.1f}"


def test_capture_code_phases_match_handoff(eph8):
    """Code phases of the simulated capture at the handoff epoch must align
    with the handoff rc values (sub-chip)."""
    hand, arr = eph8
    sim = CaptureSimulator(arr, hand.x_ecef, tow0=hand.rx_time_a, fs=2.5e6)
    _, truth = sim.generate(100, return_truth=True)
    for i, ch in enumerate(truth.channels):
        # receiver counts cp relative to its own anchor; compare fractional
        # code phase only, modulo the code period
        d = (ch.code_phase0 - hand.rc[i]) % L_CA
        d = min(d, L_CA - d)
        assert d < 1.0, f"PRN {ch.prn}: code phase {ch.code_phase0:.2f} vs rc {hand.rc[i]:.2f} (d={d:.3f})"
