"""Frame-transform tests: round trips + known reference values."""

import numpy as np

from navlab_dpe_sdr_tpu.libgnss import frames

# Reference docstring fixture (pygnss utils.py:23-26): ECE building & Everest.
ECE = np.array([151055.3983, -4882530.31559, 4087649.46970])


def test_ecef_lla_roundtrip():
    lla = frames.ecef_to_lla(ECE)
    # exact geodetic solution for this point (verified against the iterative
    # Bowring method to 1e-12 deg; the reference docstring value is stale)
    assert abs(lla[0] - 40.11206094) < 1e-6
    assert abs(lla[1] + 88.22795221) < 1e-6
    assert abs(lla[2] - 217.3154) < 1e-3
    back = frames.lla_to_ecef(lla[0], lla[1], lla[2])
    np.testing.assert_allclose(back, ECE, atol=1e-6)


def test_ecef_lla_batch():
    pts = np.stack([ECE, ECE * 1.001], axis=1)
    lla = frames.ecef_to_lla(pts)
    assert lla.shape == (3, 2)


def test_eci_roundtrip():
    pv = np.array([ECE[0], ECE[1], ECE[2], 1234.5, 10.0, -20.0, 5.0, 0.1])
    eci = frames.ecef_to_eci(pv, t_gps=1000.0, t_c=990.0)
    back = frames.eci_to_ecef(eci, t_gps=1000.0, t_c=990.0)
    np.testing.assert_allclose(back, pv, atol=1e-8)


def test_eci_zero_tau_velocity_term():
    # With t_gps == t_c the position is unchanged but velocity gains the
    # earth-rotation term omega x r (reference utils.py:206-215).
    pv = np.array([ECE[0], ECE[1], ECE[2], 0.0, 0.0, 0.0, 0.0, 0.0])
    eci = frames.ecef_to_eci(pv, t_gps=500.0, t_c=500.0)
    np.testing.assert_allclose(eci[0:3], pv[0:3])
    expected_v = np.array([-frames.OEDot * ECE[1], frames.OEDot * ECE[0], 0.0])
    np.testing.assert_allclose(eci[4:7], expected_v, rtol=1e-12)


def test_enu_roundtrip():
    d_enu = np.array([[10.0, -5.0], [20.0, 15.0], [-3.0, 8.0]])
    ecef = frames.enu_to_ecef(ECE, d_enu)
    enu, r = frames.ecef_to_enu(ECE, ecef)
    np.testing.assert_allclose(enu, d_enu, atol=1e-8)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)


def test_enu_up_is_radial():
    up = frames.enu_to_ecef(ECE, np.array([0.0, 0.0, 100.0])) - ECE
    lla0 = frames.ecef_to_lla(ECE)
    lla1 = frames.ecef_to_lla(ECE + up)
    assert abs(lla1[2] - lla0[2] - 100.0) < 0.01
    assert abs(lla1[0] - lla0[0]) < 1e-6


def test_elaz():
    elaz = frames.enu_to_elaz(np.array([0.0, 100.0, 100.0]))
    assert abs(elaz[0] - np.pi / 4) < 1e-12  # elevation 45 deg
    assert abs(elaz[1]) < 1e-12              # azimuth north
