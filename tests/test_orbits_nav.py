"""Satellite-state + navigation-solution tests against the reference demo
fixtures (RINEX nav + handoff CSV carry exact expected values)."""

import csv

import numpy as np
import pytest

from navlab_dpe_sdr_tpu.libgnss import naveng, rinex, satpos
from navlab_dpe_sdr_tpu.libgnss.ephemeris import EphArray
from navlab_dpe_sdr_tpu.io.handoff import read_handoff

PRNS = [2, 3, 6, 12, 17, 19, 24, 28]


def test_rinex_fields_match_handoff(rinex_path, handoff_path):
    """The handoff CSV stores the exact ephemeris values the reference used;
    our RINEX parser must reproduce them."""
    hand = read_handoff(handoff_path)
    ephs = rinex.load_ephemerides(rinex_path, PRNS, tow=414006.0)
    for i, prn in enumerate(PRNS):
        e = ephs[prn]
        assert e.t_oe == 417600
        np.testing.assert_allclose(e.sqrt_A, hand.eph_fields["sqrt_A"][i], rtol=0, atol=1e-8)
        np.testing.assert_allclose(e.M_0, hand.eph_fields["M_0"][i], rtol=0, atol=1e-10)
        np.testing.assert_allclose(e.a_f0, hand.eph_fields["a_f0"][i], rtol=0, atol=1e-15)
        np.testing.assert_allclose(e.OMEGA_0, hand.eph_fields["OMEGA_0"][i], rtol=0, atol=1e-10)
        np.testing.assert_allclose(e.T_GD, hand.eph_fields["T_GD"][i], rtol=0, atol=1e-15)
        assert e.IODE == int(hand.eph_fields["IODE"][i])


def test_sat_state_sanity(rinex_path):
    ephs = rinex.load_ephemerides(rinex_path, PRNS, tow=414006.0)
    arr = EphArray([ephs[p] for p in PRNS])
    state = satpos.sat_state(arr, np.full(len(PRNS), 414006.0))
    r = np.linalg.norm(state[0:3], axis=0)
    v = np.linalg.norm(state[4:7], axis=0)
    assert np.all((r > 2.5e7) & (r < 2.8e7))       # GPS orbit radius ~26,560 km
    assert np.all((v > 2.5e3) & (v < 4.5e3))       # orbital speed ~3.9 km/s


def test_sat_velocity_consistent_with_finite_difference(rinex_path):
    ephs = rinex.load_ephemerides(rinex_path, [2], tow=414006.0)
    arr = EphArray([ephs[2]])
    dt = 0.5
    s0 = satpos.sat_state(arr, np.array([414006.0 - dt]))
    s1 = satpos.sat_state(arr, np.array([414006.0 + dt]))
    v_fd = (s1[0:3, 0] - s0[0:3, 0]) / (2 * dt)
    s = satpos.sat_state(arr, np.array([414006.0]))
    np.testing.assert_allclose(s[4:7, 0], v_fd, atol=1e-3)


def test_clock_correction_magnitude(rinex_path, handoff_path):
    hand = read_handoff(handoff_path)
    ephs = rinex.load_ephemerides(rinex_path, PRNS, tow=414006.0)
    arr = EphArray([ephs[p] for p in PRNS])
    clkb, clkd = satpos.sat_clock_correction(arr, np.full(len(PRNS), 414006.0))
    # clock biases are sub-millisecond and near a_f0
    assert np.all(np.abs(clkb) < 1e-3)
    np.testing.assert_allclose(clkb, hand.eph_fields["a_f0"]
                               - hand.eph_fields["T_GD"], atol=5e-6)


def test_nav_solution_reproduces_handoff_fix(rinex_path, handoff_path):
    """Feed the handoff observables through our LS PVT: the resulting fix must
    match the X_ECEF the reference computed from the same data."""
    hand = read_handoff(handoff_path)
    ephs = rinex.load_ephemerides(rinex_path, PRNS, tow=414006.0)
    arr = EphArray([ephs[p] for p in PRNS])
    # the handoff anchors (TOW, cp) come from live decode, not from RINEX
    arr.tow_timestamp = hand.tow.astype(np.float64)
    arr.cp_timestamp = hand.cp_timestamp.astype(np.float64)

    rx_time_a, rx_time, x_ecef, x_eci, sats_eci = naveng.calculate_nav_soln(
        hand.cp, hand.rc, hand.fi, arr, doppler_sign=1.0,
        rx_time0=hand.rx_time)

    np.testing.assert_allclose(x_ecef[0:3], hand.x_ecef[0:3], atol=1.0)
    np.testing.assert_allclose(x_ecef[3], hand.x_ecef[3], atol=1.0)
    np.testing.assert_allclose(x_ecef[4:7], hand.x_ecef[4:7], atol=0.05)
    assert abs(rx_time_a - hand.rx_time_a) < 1e-8


def test_gdop_reasonable(rinex_path, handoff_path):
    hand = read_handoff(handoff_path)
    ephs = rinex.load_ephemerides(rinex_path, PRNS, tow=414006.0)
    arr = EphArray([ephs[p] for p in PRNS])
    arr.tow_timestamp = hand.tow.astype(np.float64)
    arr.cp_timestamp = hand.cp_timestamp.astype(np.float64)
    _, _, _, x_eci, sats_eci = naveng.calculate_nav_soln(
        hand.cp, hand.rc, hand.fi, arr, rx_time0=hand.rx_time)
    g = naveng.gdop(x_eci, sats_eci)
    assert 1.0 < g < 10.0


# -- RINEX header + Klobuchar iono (reference rinexparse.cpp:88-133,
#    satpos.py:199-277 dead code made live) ---------------------------------

def test_rinex_header_fields(tmp_path):
    from navlab_dpe_sdr_tpu.libgnss import rinex as rx

    p = tmp_path / "hdr.18n"
    p.write_text(
        "     2.10           NAVIGATION DATA                        "
        " RINEX VERSION / TYPE\n"
        "    0.1118D-07  0.2235D-07 -0.5960D-07 -0.1192D-06         "
        " ION ALPHA           \n"
        "    0.1167D+06  0.1802D+06 -0.1311D+06 -0.4588D+06         "
        " ION BETA            \n"
        "    0.133226763247D-14 0.107469588780D-12   233472     1860"
        " DELTA-UTC: A0,A1,T,W\n"
        "    18                                                     "
        " LEAP SECONDS        \n"
        "                                                           "
        " END OF HEADER       \n")
    hdr = rx.read_header(str(p))
    np.testing.assert_allclose(hdr.ion_alpha,
                               [0.1118e-7, 0.2235e-7, -0.5960e-7, -0.1192e-6])
    np.testing.assert_allclose(hdr.ion_beta,
                               [0.1167e6, 0.1802e6, -0.1311e6, -0.4588e6])
    assert hdr.leap_seconds == 18
    a0, a1, t_ref, week = hdr.delta_utc
    assert (t_ref, week) == (233472, 1860)
    assert abs(a0 - 0.133226763247e-14) < 1e-25

    # the demo fixture has a bare header: every field None, no crash
    hdr2 = rx.read_header("/root/reference/demofiles/nist1860.18n")
    assert hdr2.ion_alpha is None and hdr2.leap_seconds is None


def test_klobuchar_properties():
    from navlab_dpe_sdr_tpu.constants import C
    from navlab_dpe_sdr_tpu.libgnss.iono import (klobuchar_delay,
                                                 klobuchar_delay_m)

    alpha = [0.1118e-7, 0.2235e-7, -0.5960e-7, -0.1192e-6]
    beta = [0.1167e6, 0.1802e6, -0.1311e6, -0.4588e6]
    lat, lon = 40.0, -105.0

    # local 14:00 (peak) vs local 02:00 (night floor): lon -105 deg -> 7 h
    # behind UTC; pick tow so that t_local = tow + 4.32e4 * lam_i
    day = klobuchar_delay(alpha, beta, lat, lon, np.deg2rad(40.0),
                          np.deg2rad(180.0), 21 * 3600.0)   # ~14:00 local
    night = klobuchar_delay(alpha, beta, lat, lon, np.deg2rad(40.0),
                            np.deg2rad(180.0), 9 * 3600.0)  # ~02:00 local
    assert night == klobuchar_delay(alpha, beta, lat, lon,
                                    np.deg2rad(40.0), np.deg2rad(180.0),
                                    9.5 * 3600.0)           # flat floor
    assert day > night > 0.0
    # night floor is F * 5 ns; at 40 deg elevation F ~ 1.1-1.4
    assert 5e-9 < night < 8e-9
    # daytime zenith-ish delay is 5-30 ns at these (real 2018) coefficients
    assert 8e-9 < day < 60e-9

    # low elevation inflates by the obliquity factor
    low = klobuchar_delay(alpha, beta, lat, lon, np.deg2rad(5.0),
                          np.deg2rad(180.0), 21 * 3600.0)
    assert low > 2.0 * day
    assert abs(klobuchar_delay_m(alpha, beta, lat, lon, np.deg2rad(40.0),
                                 np.deg2rad(180.0), 21 * 3600.0)
               - C * day) < 1e-9
