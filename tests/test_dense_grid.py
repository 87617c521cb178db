"""Dense-grid mode: reference-cap guard (batchcorrmanifold.h:17) and
streaming-scorer convergence on a ~2.4M-point uniform grid."""

import os
import pathlib

import numpy as np
import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

from navlab_dpe_sdr_tpu.models.grid import (Grid, MAX_GRID_POINTS,
                                            check_grid_size, dense_grid,
                                            make_grid)


def _fake_grid(n_pos, n_vel):
    # broadcast views: arbitrary logical sizes without allocating
    return Grid(d_enu=np.broadcast_to(np.zeros(3), (n_pos, 3)),
                dt_m=np.broadcast_to(np.zeros(()), (n_pos,)),
                dv_enu=np.broadcast_to(np.zeros(3), (n_vel, 3)),
                dtdot=np.broadcast_to(np.zeros(()), (n_vel,)))


def test_grid_cap_guard():
    assert MAX_GRID_POINTS == 2 * 75 ** 4
    check_grid_size(_fake_grid(75 ** 4, 75 ** 4))      # at cap: OK
    with pytest.raises(ValueError, match="BCM_MAX_GRID_SIZE"):
        check_grid_size(_fake_grid(75 ** 4 + 1, 75 ** 4))
    with pytest.raises(ValueError):
        make_grid("uniform", n=76)                      # 2*76^4 > cap


def test_dense_grid_shapes():
    g = dense_grid(n=9, pos_spacing=2.0, vel_spacing=0.2)
    assert g.n_pos == g.n_vel == 9 ** 4
    # uniform spacing, centered
    e = np.unique(g.d_enu[:, 0])
    assert np.allclose(np.diff(e), 2.0) and np.isclose(e.mean(), 0.0)


def test_dense_grid_dpe_converges():
    """~2.4M-point dense uniform grid through the batched streaming scorer:
    fixes must land within one lattice step of the spread-grid result."""
    import copy

    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.libgnss import frames
    from navlab_dpe_sdr_tpu.models.dpe import DPEConfig, DPEReceiver

    sim, hand, arr = make_scenario(nav_data=True)
    n = 50000 * 4
    iq = sim.generate(n)
    samples = np.empty(n, DTYPE_IQ16)
    samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
    samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
    truth = hand.x_ecef.copy()
    hand.x_ecef[0:3] = frames.enu_to_ecef(truth[0:3],
                                          np.array([15.0, -20.0, 8.0]))

    grid = dense_grid(n=31, pos_spacing=2.0, vel_spacing=0.25)
    rf = SampleFile(samples=samples, fs=2.5e6)
    rx = DPEReceiver(rf, copy.deepcopy(hand), grid=grid,
                     eph=copy.deepcopy(arr))
    rx.run_batched(4, lookahead=2)
    errs = [float(np.linalg.norm(f.x_ecef[:3] - truth[:3]))
            for f in rx.fixes]
    assert np.median(errs[-2:]) < 15.0, errs


def test_exponential_axis_properties():
    from navlab_dpe_sdr_tpu.models.grid import exponential_axis, make_grid

    ax = exponential_axis(25, 1.0, growth=1.35)
    assert ax.shape == (25,)
    assert ax[12] == 0.0
    np.testing.assert_allclose(ax, -ax[::-1])           # symmetric
    steps = np.diff(ax[12:])
    assert abs(steps[0] - 1.0) < 1e-12                  # center step = spacing
    np.testing.assert_allclose(steps[1:] / steps[:-1], 1.35)  # geometric
    assert np.all(np.diff(ax) > 0)                      # strictly monotone

    g = make_grid("exponential", n=9, pos_spacing=2.0, vel_spacing=0.2)
    assert g.n_pos == 9 ** 4 and g.n_vel == 9 ** 4
    # center-out growth: the grid spans far beyond n*spacing
    assert np.abs(g.d_enu).max() > 2.0 * 4

    # even n must yield exactly n points (no silent (n-1)-point axis):
    # symmetric about 0 with the innermost pair at +/- spacing/2
    ax4 = exponential_axis(4, 1.0, growth=2.0)
    np.testing.assert_allclose(ax4, [-1.5, -0.5, 0.5, 1.5])
    ax8 = exponential_axis(8, 1.0, growth=1.35)
    assert ax8.shape == (8,)
    np.testing.assert_allclose(ax8, -ax8[::-1])
    assert np.all(np.diff(ax8) > 0)
    g = make_grid("exponential", n=8, pos_spacing=1.0, vel_spacing=0.1)
    assert g.n_pos == 8 ** 4 and g.n_vel == 8 ** 4


def test_exponential_spacing_sweep_row(tmp_path):
    """One exponential-style row through the MC spacing-sweep harness
    (gridhelper.h:24-28 Exponential, closing the last enumerated grid
    type; r2 verdict item #8)."""
    import subprocess
    import sys

    d = tmp_path
    cap, hand = d / "cap.dat", d / "hand.csv"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, "-m", "navlab_dpe_sdr_tpu.cli", "--device", "cpu",
         "synth", "--out", str(cap), "--handoff", str(hand),
         "--seconds", "0.7", "--cn0", "50"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    r = subprocess.run(
        [sys.executable, "-m", "navlab_dpe_sdr_tpu.cli", "--device", "cpu",
         "mc", str(cap), "--handoff", str(hand), "--spacings", "5.0",
         "--grid-style", "exponential", "--grid-n", "9", "--blocks", "12"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-800:]
    assert "spacing" in r.stdout and "ok" in r.stdout, r.stdout
