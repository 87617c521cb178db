"""Dense-grid mode: reference-cap guard (batchcorrmanifold.h:17) and
streaming-scorer convergence on a ~2.4M-point uniform grid."""

import numpy as np
import pytest

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
