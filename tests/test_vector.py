"""Vector-tracking receiver tests on the synthetic scenario."""

import copy

import numpy as np
import pytest

from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
from navlab_dpe_sdr_tpu.io.scenario import make_scenario
from navlab_dpe_sdr_tpu.libgnss import frames
from navlab_dpe_sdr_tpu.models.vector import VectorReceiver

FS = 2.5e6


@pytest.fixture(scope="module")
def capture():
    sim, hand, arr = make_scenario(nav_data=True)
    n = 50000 * 26
    iq = sim.generate(n)
    samples = np.empty(n, DTYPE_IQ16)
    samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
    samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
    return samples, hand, arr


def _make_rx(samples, hand, arr, x0):
    rf = SampleFile(samples=samples.copy(), fs=FS)
    return VectorReceiver(rf, hand.prn_list, copy.deepcopy(arr), x0,
                          hand.rx_time,
                          cp=hand.cp, rc=hand.rc, fc=hand.fc, fi=hand.fi,
                          ri=hand.ri)


def test_vector_holds_truth(capture):
    samples, hand, arr = capture
    rx = _make_rx(samples, hand, arr, hand.x_ecef)
    fixes = rx.run(25)
    errs = [np.linalg.norm(f.x_ecef[:3] - hand.x_ecef[:3]) for f in fixes]
    # VT wander floor ~ discriminator noise (no grid constraint): ~10-20 m
    assert np.median(errs[5:]) < 20.0, [round(e, 1) for e in errs]
    vels = [np.linalg.norm(f.x_ecef[4:7]) for f in fixes[5:]]
    assert np.median(vels) < 3.0


def test_vector_converges_from_offset(capture):
    samples, hand, arr = capture
    x0 = hand.x_ecef.copy()
    x0[0:3] = frames.enu_to_ecef(hand.x_ecef[0:3],
                                 np.array([25.0, -20.0, 10.0]))
    rx = _make_rx(samples, hand, arr, x0)
    fixes = rx.run(25)
    errs = [np.linalg.norm(f.x_ecef[:3] - hand.x_ecef[:3]) for f in fixes]
    assert np.median(errs[-5:]) < 20.0, [round(e, 1) for e in errs]
    assert np.median(errs[-5:]) < errs[0]
