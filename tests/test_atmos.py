"""Atmospheric corrections (Klobuchar iono + standard tropo) end to end.

The reference carries both models as dead code (pygnss satpos.py:199-277)
and parses ION ALPHA/BETA without consuming them (rinexparse.cpp:88-110);
here they are live in the LS nav engine and the DPE channel back-calc.
"""

import copy

import numpy as np

from navlab_dpe_sdr_tpu.constants import F_CA, L_CA
from navlab_dpe_sdr_tpu.io.handoff import read_handoff
from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
from navlab_dpe_sdr_tpu.io.scenario import make_scenario
from navlab_dpe_sdr_tpu.io.synth import CaptureSimulator
from navlab_dpe_sdr_tpu.libgnss import naveng, satpos
from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver
from navlab_dpe_sdr_tpu.models.grid import spread_grid

FS = 2.5e6
ALPHA = (0.1118e-7, 0.2235e-7, -0.5960e-7, -0.1192e-6)
BETA = (0.1167e6, 0.1802e6, -0.1311e6, -0.4588e6)


def _injected_delays(arr, truth, rx_time, alpha):
    t_guess = np.full(len(arr), rx_time - 0.075)
    sats = satpos.sat_state(arr, t_guess)
    return naveng.atmospheric_delays_m(truth[0:3], sats[0:3], rx_time,
                                       alpha, BETA, tropo=True)


def test_nav_soln_atmospheric_correction(handoff_path):
    """Observables with injected Klobuchar + tropo delays: the corrected
    LS solve recovers the truth to centimeters while the uncorrected one
    is biased by the delay projection (~13 m at this geometry)."""
    hand = read_handoff(handoff_path)
    arr = hand.eph_array()
    truth = hand.x_ecef.copy()
    truth[3] = truth[7] = 0.0
    truth[4:7] = 0.0
    rx_time = hand.rx_time
    delays = _injected_delays(arr, truth, rx_time, ALPHA)
    assert np.all(delays > 5.0)          # meaningful injection

    # exact observables for the delayed signal (same Sagnac convention as
    # the nav engine, via the capture simulator's transmit-time solver)
    sim = CaptureSimulator(arr, truth, tow0=rx_time,
                           extra_delay_m=delays)
    d = sim._solve_t_sv(np.array([rx_time]))[:, 0]
    phi = (rx_time + d - arr.tow_timestamp) * F_CA
    cp = arr.cp_timestamp + np.floor(phi / L_CA)
    rc = phi - L_CA * (cp - arr.cp_timestamp)
    fi = np.zeros(len(arr))

    _, _, xu, _, _ = naveng.calculate_nav_soln(cp, rc, fi, arr,
                                               rx_time0=rx_time)
    _, _, xc, _, _ = naveng.calculate_nav_soln(
        cp, rc, fi, arr, rx_time0=rx_time,
        ion_alpha=ALPHA, ion_beta=BETA, tropo=True)
    err_u = np.linalg.norm(xu[0:3] - truth[0:3])
    err_c = np.linalg.norm(xc[0:3] - truth[0:3])
    assert err_u > 5.0, err_u
    assert err_c < 0.1, err_c
    assert abs(xc[3]) < 0.1              # clock bias recovered too


def test_dpe_atmospheric_correction():
    """DPE with severe iono (8x alpha, ~25-45 m slant delays) injected in
    the capture: DPEConfig.ion_alpha/ion_beta/tropo removes the fix bias
    (uncorrected ~35 m median vs the ~11 m per-block noise floor)."""
    sim, hand, arr = make_scenario(nav_data=True)
    alpha = tuple(8 * a for a in ALPHA)
    truth = hand.x_ecef.copy()
    delays = _injected_delays(arr, truth, hand.rx_time, alpha)
    sim2 = CaptureSimulator(arr, truth, tow0=hand.rx_time, fs=FS,
                            cn0_dbhz=50.0, nav_data=True,
                            extra_delay_m=delays, seed=21)
    n = 30
    iq = sim2.generate(50000 * n)
    samples = np.empty(iq.shape[0], DTYPE_IQ16)
    samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
    samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)

    med = {}
    for label, cfg in [
            ("uncorr", DPEConfig()),
            ("corr", DPEConfig(ion_alpha=alpha, ion_beta=BETA, tropo=True))]:
        rx = DPEReceiver(SampleFile(samples=samples.copy(), fs=FS),
                         copy.deepcopy(hand), grid=spread_grid(),
                         eph=copy.deepcopy(arr), config=cfg)
        rx.run(n)
        errs = [np.linalg.norm(f.x_ecef[0:3] - truth[0:3])
                for f in rx.fixes]
        med[label] = float(np.median(errs[5:]))
    assert med["uncorr"] > 25.0, med
    assert med["corr"] < 0.6 * med["uncorr"], med
    assert med["corr"] < 15.0, med
