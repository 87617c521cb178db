"""Aux subsystem tests: satellite-state cache, profiling, console."""

import io

import numpy as np
import pytest

from navlab_dpe_sdr_tpu.libgnss import satpos
from navlab_dpe_sdr_tpu.libgnss.satcache import SatStateCache
from navlab_dpe_sdr_tpu.io.handoff import read_handoff
from navlab_dpe_sdr_tpu.runtime.profiling import Counters, TmUsage


def test_satcache_interpolation_accuracy(handoff_path):
    hand = read_handoff(handoff_path)
    arr = hand.eph_array()
    t0 = hand.rx_time - 0.1
    cache = SatStateCache(arr, t0, horizon_s=10.0, spacing_s=2.0)

    rng = np.random.default_rng(0)
    for _ in range(5):
        t = t0 + rng.random(len(arr)) * 8.0
        interp = cache.state_at(t)
        clkb, clkd = satpos.sat_clock_correction(arr, t)
        exact = satpos.sat_state(arr, t - clkb, clkb, clkd)
        np.testing.assert_allclose(interp[0:3], exact[0:3], atol=1e-3)  # mm
        np.testing.assert_allclose(interp[4:7], exact[4:7], atol=2e-3)
        np.testing.assert_allclose(interp[3], exact[3], atol=1e-12)


def test_satcache_extends_horizon(handoff_path):
    hand = read_handoff(handoff_path)
    arr = hand.eph_array()
    cache = SatStateCache(arr, hand.rx_time, horizon_s=4.0, spacing_s=2.0)
    t = np.full(len(arr), hand.rx_time + 20.0)   # beyond horizon
    out = cache.state_at(t)
    assert np.all(np.isfinite(out))


def test_profiling_counters():
    tm = TmUsage()
    c = Counters()
    x = sum(i * i for i in range(200000))
    c.add_block(50000, 781250)
    c.add_block(50000, 781250)
    r = c.rates()
    assert r["samples_per_s"] > 0 and r["grid_points_per_s"] > 0
    e = tm.elapsed()
    assert e["user_s"] >= 0 and e["max_rss_kb"] > 1000


def test_console_flow_commands(tmp_path, capsys):
    from navlab_dpe_sdr_tpu.console import Console

    con = Console(stdout=io.StringIO())
    con.onecmd("newflow f1 cap.dat hand.csv")
    con.onecmd("setparam f1 l_power 2")
    con.onecmd("setparam f1 interp linear")
    con.onecmd("status")
    out = con.stdout.getvalue()
    assert "flow f1 created" in out
    assert "l_power = 2" in out
    assert "'interp': 'linear'" in out

    script = tmp_path / "s.dofile"
    script.write_text("newflow f2 c2.dat h2.csv\nstatus f2\n")
    con.onecmd(f"dofile {script}")
    assert "f2" in con.stdout.getvalue()


# -- generic filters (reference libgnss/filters.py) ------------------------

def test_running_average_filter():
    from navlab_dpe_sdr_tpu.libgnss.filters import RunningAverageFilter

    f = RunningAverageFilter(4, average=1.0)
    # push 4 samples; average slides over [1,1,1,1] -> [2,3,4,5]
    for x, want in [(2, 1.25), (3, 1.75), (4, 2.5), (5, 3.5)]:
        assert abs(f.update(x) - want) < 1e-12
    assert abs(f.update(6) - np.mean([3, 4, 5, 6])) < 1e-12


def test_integrators_and_lowpass():
    from navlab_dpe_sdr_tpu.libgnss.filters import (BilinearIntegrator,
                                                    BoxcarIntegrator,
                                                    LowPassFilter)

    k = 0.5
    box = BoxcarIntegrator(k)
    bil = BilinearIntegrator(k)
    xs = [1.0, -2.0, 3.0]
    h = 0.0
    for x in xs:
        h_new = h + k * x
        assert abs(box.update(x) - h_new) < 1e-12
        assert abs(bil.update(x) - (h + h_new) / 2) < 1e-12
        h = h_new

    lp = LowPassFilter(0.25)
    y = 0.0
    for x in xs:
        y = 0.25 * x + 0.75 * y
        assert abs(lp.update(x) - y) < 1e-12


def test_fir_streaming_matches_batch():
    from navlab_dpe_sdr_tpu.libgnss.filters import (FIRfilter,
                                                    design_lowpass_fir)

    b = design_lowpass_fir(11, fs=10.0, f_cut=2.0)
    assert abs(np.sum(b) - 1.0) < 1e-12      # unity DC gain
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(100)
    # block-streaming output == one-shot 'valid' convolution on the
    # zero-padded prefix
    f = FIRfilter(b)
    out = np.concatenate([f.update(sig[:30]), f.update(sig[30:55]),
                          f.update(sig[55:])])
    want = np.convolve(b, np.concatenate([np.zeros(10), sig]), "valid")
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_running_average_vectorized():
    from navlab_dpe_sdr_tpu.libgnss import filters as flt

    st = flt.running_average_init(3, average=0.0, shape=(2,))
    xs = np.array([[1.0, 10.0], [2.0, 20.0], [3.0, 30.0], [4.0, 40.0]])
    for x in xs:
        st, y = flt.running_average_update(st, x)
    np.testing.assert_allclose(y, [np.mean([2, 3, 4]), np.mean([20, 30, 40])])
