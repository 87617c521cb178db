"""Multi-epoch joint DPE ("survey" mode): one static position-clock state
estimated against the whole pass (ops.dpe_real.score_joint_argmax +
DPEReceiver.run_survey). A capability the reference's per-block fetch
architecture cannot express (batchcorrmanifold.cu:2502-2635)."""

import copy

import numpy as np

from navlab_dpe_sdr_tpu.constants import C
from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
from navlab_dpe_sdr_tpu.io.scenario import make_scenario
from navlab_dpe_sdr_tpu.io.synth import (CaptureSimulator,
                                          white_noise_iq16)
from navlab_dpe_sdr_tpu.libgnss import frames
from navlab_dpe_sdr_tpu.models.dpe import DPEReceiver
from navlab_dpe_sdr_tpu.models.grid import spread_grid
from navlab_dpe_sdr_tpu.ops import dpe_real as dre

FS = 2.5e6


def _to_iq(iq):
    samples = np.empty(iq.shape[0], DTYPE_IQ16)
    samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
    samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
    return samples


def test_score_joint_argmax_analytic():
    """Joint argmax over synthetic parabolic windows with per-epoch
    geometry: the winning offset must be the one maximizing the summed
    analytic score, and per-epoch center shifts must steer it exactly."""
    rng = np.random.default_rng(7)
    b, c, w = 3, 4, 9
    los = rng.normal(size=(b, c, 3))
    los /= np.linalg.norm(los, axis=2, keepdims=True)
    coefs = np.full((b, c), 0.05)
    centers = np.full((b, c), (w - 1) / 2.0)
    # truth offset d* = (2, -1, 3, -2): peak of each window sits at
    # center + coef * (-los . d* + dt*)
    d_true = np.array([2.0, -1.0, 3.0])
    t_true = -2.0
    peak_at = centers + coefs * (-np.einsum("bci,i->bc", los, d_true)
                                 + t_true)
    taps = np.arange(w)
    win = 10.0 - (taps[None, None, :] - peak_at[..., None]) ** 2

    ax = np.arange(-4, 5, dtype=np.float64)
    from navlab_dpe_sdr_tpu.models.grid import _mesh4
    off3, off1 = _mesh4(ax, ax)
    best, arg = dre.score_joint_argmax(
        win.astype(np.float32), los.astype(np.float32),
        centers.astype(np.float32), coefs.astype(np.float32),
        np.zeros((b, c), np.float32), off3.astype(np.float32),
        off1.astype(np.float32), has_r0=False)
    a = int(arg)
    assert np.allclose(off3[a], d_true), off3[a]
    assert off1[a] == t_true

    # re-referencing: folding a per-epoch shift into the centers must move
    # the argmax by exactly that shift
    dshift = np.array([1.0, 0.0, 2.0])   # keeps d_true - dshift on the grid
    centers2 = centers + coefs * (-np.einsum("bci,i->bc", los, dshift))
    _, arg2 = dre.score_joint_argmax(
        win.astype(np.float32), los.astype(np.float32),
        centers2.astype(np.float32), coefs.astype(np.float32),
        np.zeros((b, c), np.float32), off3.astype(np.float32),
        off1.astype(np.float32), has_r0=False)
    assert np.allclose(off3[int(arg2)], d_true - dshift), off3[int(arg2)]


def test_survey_weak_signal_coast():
    """Weak-signal mode: at a C/N0 where the per-batch argmax is noise
    (tens-to-hundreds of meters), open-loop (coast) steering + noncoherent
    window collection + the full-pass joint solve must still produce a
    bounded fix. 30 dB-Hz / 48 blocks: per-block error is ~80 m (SENS
    ladder), the joint estimate integrates the whole pass."""
    sim, hand, arr = make_scenario(nav_data=True, cn0_dbhz=30.0, seed=11)
    n_blocks = 48
    iq = sim.generate(50000 * n_blocks)
    rf = SampleFile(samples=_to_iq(iq), fs=FS)
    rx = DPEReceiver(rf, copy.deepcopy(hand), grid=spread_grid(),
                     eph=copy.deepcopy(arr))
    res = rx.run_survey(n_batches=6, blocks_per_fix=8, fine_n=13,
                        fine_spacing=1.0, vel_fine_spacing=0.05,
                        coherent=False, feedback=False)

    truth = hand.x_ecef
    assert len(rx.fixes) == 6            # coast still logs diagnostic fixes
    err3 = float(np.linalg.norm(res.x_ecef[0:3] - truth[0:3]))
    assert err3 < 30.0, err3
    # coast means the EKF state never moved off the handoff prediction
    assert np.allclose(rx.ekf.x, hand.x_ecef)
    # velocity of a static receiver still bounded at low C/N0 (honest
    # bound: with envelope normalization the carrier argmax is no longer
    # flattered toward the coasted prediction, so 0.96 s of 30 dB-Hz
    # carrier data gives a genuinely noisy joint velocity)
    assert np.linalg.norm(res.x_ecef[4:7]) < 10.0, res.x_ecef[4:7]
    assert np.all(res.sigma_pos > 0)


def test_survey_static_with_clock_drift():
    """1.3 s survey on a drifting-clock static receiver: the joint estimate
    must land within the fine lattice on E/N, hold the 3-D error under the
    per-batch noise, and recover the clock drift."""
    sim, hand, arr = make_scenario(nav_data=True)
    drift = 2e-8
    sim2 = CaptureSimulator(arr, hand.x_ecef, tow0=hand.rx_time, fs=FS,
                            cn0_dbhz=45.0, nav_data=True, seed=21,
                            clock_drift=drift)
    n_blocks = 64
    iq = sim2.generate(50000 * n_blocks)
    rf = SampleFile(samples=_to_iq(iq), fs=FS)
    hand2 = copy.deepcopy(hand)
    hand2.x_ecef[7] = -drift * C        # handoff carries the drift estimate
    rx = DPEReceiver(rf, hand2, grid=spread_grid(), eph=copy.deepcopy(arr))
    res = rx.run_survey(n_batches=8, blocks_per_fix=8, fine_n=21)

    truth = hand.x_ecef
    assert res.n_batches == 8 and res.n_blocks == 64
    assert len(rx.fixes) == 8           # per-batch fixes still logged
    r = frames.ecef_to_enu_matrix(truth[0:3])
    enu = r @ (res.x_ecef[0:3] - truth[0:3])
    # E/N converge to the fine lattice; U rides the U/clock ridge
    assert abs(enu[0]) < 1.5 and abs(enu[1]) < 1.5, enu
    assert np.linalg.norm(enu) < 6.0, enu
    assert abs(res.x_ecef[7] - (-drift * C)) < 0.5, res.x_ecef[7]
    # velocity of a static receiver
    assert np.linalg.norm(res.x_ecef[4:7]) < 0.5, res.x_ecef[4:7]
    # covariance sane: sigmas positive, U the weakest position axis
    assert np.all(res.sigma_pos > 0) and np.all(res.sigma_vel > 0)
    assert res.sigma_pos[2] == max(res.sigma_pos[:3])
    assert res.cov_pos.shape == (4, 4)
    assert np.isfinite(res.pos_score) and np.isfinite(res.vel_score)


def test_noise_envelope_and_no_signal_control():
    """The integrated noncoherent windows carry a deterministic noise-gain
    envelope (folded-DFT Dirichlet on the carrier window, flip-selection
    bump on the code window). noise_envelope must measure it, and with
    the default envelope normalization a NO-SIGNAL survey must NOT pin
    its estimate to the coasted prediction — the false-hold failure mode
    the un-normalized solve exhibits at arbitrarily low C/N0."""
    _, hand, arr = make_scenario(nav_data=True, cn0_dbhz=30.0, seed=13)
    n_blocks = 64
    noise = white_noise_iq16(50000 * n_blocks, seed=3)
    rx = DPEReceiver(SampleFile(samples=noise, fs=FS),
                     copy.deepcopy(hand), grid=spread_grid(),
                     eph=copy.deepcopy(arr))

    env_c, env_v = rx.noise_envelope(blocks_per_fix=8, n_batches=8, seed=5)
    # the known structural bumps: carrier fold envelope and code
    # flip-selection lag, both >> the ~2-3% calibration noise
    assert env_v.max() / env_v.min() > 1.15, env_v
    assert env_c.max() / env_c.min() > 1.10, env_c

    # windows from an INDEPENDENT noise capture, flattened by the envelope
    collect = []
    rx2 = DPEReceiver(SampleFile(samples=noise, fs=FS),
                      copy.deepcopy(hand), grid=spread_grid(),
                      eph=copy.deepcopy(arr))
    rx2.run_integrated(8, 8, coherent=False, feedback=False,
                       _collect=collect)
    code_raw = np.stack([c[0] for c in collect]).mean(axis=(0, 1))
    carr_raw = np.stack([c[1] for c in collect]).mean(axis=(0, 1))
    code, carr = code_raw / env_c, carr_raw / env_v
    # contrastive: normalization must remove most of the structural bump
    # (the residual is calibration noise, ~2-3% per lag at these sizes)
    assert (code.max() / code.min() - 1.0
            < 0.5 * (code_raw.max() / code_raw.min() - 1.0)), (code,
                                                               code_raw)
    assert (carr.max() / carr.min() - 1.0
            < 0.25 * (carr_raw.max() / carr_raw.min() - 1.0)), (carr,
                                                                carr_raw)


def test_survey_no_signal_does_not_hold():
    """End-to-end falsification control: survey over pure noise (with the
    default envelope normalization) must scatter across the coarse grid,
    not report a meter-level 'fix' at the coasted prediction."""
    _, hand, arr = make_scenario(nav_data=True, cn0_dbhz=30.0, seed=17)
    n_blocks = 48
    noise = white_noise_iq16(50000 * n_blocks, seed=23)
    rx = DPEReceiver(SampleFile(samples=noise, fs=FS),
                     copy.deepcopy(hand), grid=spread_grid(),
                     eph=copy.deepcopy(arr))
    res = rx.run_survey(n_batches=6, blocks_per_fix=8, fine_n=13,
                        fine_spacing=1.0, vel_fine_spacing=0.05,
                        coherent=False, feedback=False)
    err3 = float(np.linalg.norm(res.x_ecef[0:3] - hand.x_ecef[0:3]))
    # a noise argmax lands on a random coarse cell (the spread grid spans
    # +/-110 m); anything meter-class would mean the envelope bias is back
    assert err3 > 10.0, f"no-signal survey pinned at {err3:.1f} m"
