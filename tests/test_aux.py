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
