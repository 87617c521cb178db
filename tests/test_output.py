"""Output writers (printer CSV, map HTML) and EKF unit tests."""

import numpy as np
import pytest

from navlab_dpe_sdr_tpu.io import mapplot, printer
from navlab_dpe_sdr_tpu.models.ekf import NavEKF


def test_printer_row_format(tmp_path):
    x = np.array([151158.465, -4885422.339, 4090087.054, 175068.556,
                  0.061, 0.117, -0.119, -0.115])
    p = tmp_path / "fix.csv"
    with open(p, "w") as fo:
        printer.header(fo)
        printer.write_fix(fo, mc=42, weekno=2008, rx_time_a=414006.0674, x_ecef=x)
    lines = p.read_text().splitlines()
    assert lines[0].startswith(" Count#")
    row = lines[1]
    assert row.startswith("     42, ")
    # GPS week 2008 TOW 414006.0674 - 18 leap s => 2018-07-05 18:59:48 UTC
    # (same formula as reference printer.py:100)
    assert " 20180705, " in row and " 185948" in row
    assert "+151158.465" in row
    # LLA at the end
    parts = row.split(",")
    assert abs(float(parts[-3]) - 40.112) < 0.01
    assert abs(float(parts[-2]) + 88.228) < 0.01


def test_gps_to_utc_epoch():
    # GPS epoch itself (+18 s leap offset)
    utc = printer.gps_to_utc(0, 18.0)
    assert utc.strftime("%Y%m%d %H%M%S") == "19800106 000000"


def test_map_html(tmp_path):
    p = tmp_path / "track.html"
    mapplot.write_track_html(str(p), lla_points=[(40.1, -88.2), (40.2, -88.3)])
    html = p.read_text()
    assert "leaflet" in html and "[40.1, -88.2]" in html


def test_ekf_passthrough_replaces_state():
    ekf = NavEKF(np.zeros(8), mode="passthrough")
    ekf.time_update()
    z = np.arange(8.0)
    out = ekf.measurement_update(z)
    np.testing.assert_array_equal(out, z)


def test_ekf_full_converges_and_contracts():
    rng = np.random.default_rng(0)
    truth = np.array([10.0, -5.0, 3.0, 100.0, 0.5, -0.2, 0.1, 0.0])
    ekf = NavEKF(np.zeros(8), T=0.02, mode="full")
    for _ in range(50):
        ekf.time_update()
        z = truth + rng.standard_normal(8) * 1.0
        ekf.measurement_update(z)
    assert np.linalg.norm(ekf.x[:3] - truth[:3]) < 1.5
    # contracted >20x from the diagonal prior (trace 712); the tuned filter
    # floors position variance so the gain never collapses, so P does not
    # shrink to zero
    assert np.trace(ekf.P) < 30.0


def test_ekf_full_f_couples_velocity():
    ekf = NavEKF(np.array([0, 0, 0, 0, 10.0, 0, 0, 0]), T=0.02, mode="full")
    ekf.time_update()
    assert abs(ekf.x[0] - 0.2) < 1e-12   # x += vx * T
