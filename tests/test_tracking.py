"""Scalar tracking loop tests on constant-rate synthetic signals."""

import numpy as np
import jax.numpy as jnp
import pytest

from navlab_dpe_sdr_tpu.constants import F_CA, F_L1, L_CA
from navlab_dpe_sdr_tpu.io.synth import synth_simple
from navlab_dpe_sdr_tpu.libgnss.cacode import ca_table
from navlab_dpe_sdr_tpu.ops import tracking

FS = 2.5e6
S = 2500
FCAID = F_CA / F_L1


def _make_blocks(prn, n_ms, rc, ri, fi, cn0=48.0, bits=None, seed=0):
    fc = F_CA + FCAID * fi
    sig = synth_simple(prn, FS, n_ms * S, rc=rc, ri=ri, fc=fc, fi=fi,
                       cn0_dbhz=cn0, bits=bits, seed=seed)
    return sig.reshape(n_ms, S).astype(np.complex64)


def test_tracking_converges_from_offset():
    """Start 0.3 chips / 25 Hz off; loops must pull in and stay locked."""
    prn, rc0, ri0, fi0 = 7, 500.0, 0.1, 1234.0
    raw = _make_blocks(prn, 1000, rc0, ri0, fi0)
    code_tab = jnp.asarray(ca_table([prn]).astype(np.float32))

    st = tracking.init_state(rc=[rc0 + 0.3], ri=[ri0], fc=[F_CA + FCAID * (fi0 + 25)],
                             fi=[fi0 + 25.0])
    st, log = tracking.track_chunk(st, jnp.asarray(raw), code_tab, FS, FCAID)

    fi_track = np.asarray(log.fi)[:, 0]
    rc_track = np.asarray(log.rc)[:, 0]
    # converged Doppler within 2 Hz over the last 200 ms
    assert abs(np.mean(fi_track[-200:]) - fi0) < 2.0, np.mean(fi_track[-200:])
    # code phase error: true rc at step k is (rc0 + fc0*T*k) mod L_CA
    k = np.arange(1000)
    fc0 = F_CA + FCAID * fi0
    rc_true = np.mod(rc0 + (fc0 - F_CA) * 1e-3 * k, L_CA)
    err = np.abs(((rc_track - rc_true) + L_CA / 2) % L_CA - L_CA / 2)
    assert np.mean(err[-200:]) < 0.05, np.mean(err[-200:])
    # lock achieved by the end
    assert int(np.asarray(log.lock)[-1, 0]) == 1
    # SNR estimate in a plausible C/N0 band
    assert 38.0 < float(np.asarray(log.snr)[-1, 0]) < 55.0


def test_tracking_recovers_nav_bits():
    """Completed-code-period signs must reproduce the transmitted bit stream."""
    prn, rc0, fi0 = 3, 100.0, -800.0
    rng = np.random.default_rng(11)
    bits = np.where(rng.standard_normal(80) > 0, 1.0, -1.0)
    raw = _make_blocks(prn, 1000, rc0, 0.0, fi0, cn0=50.0, bits=bits, seed=2)
    code_tab = jnp.asarray(ca_table([prn]).astype(np.float32))

    st = tracking.init_state(rc=[rc0], ri=[0.0], fc=[F_CA + FCAID * fi0], fi=[fi0])
    st, log = tracking.track_chunk(st, jnp.asarray(raw), code_tab, FS, FCAID)

    ncp = np.asarray(log.ncp)[:, 0]
    signs = np.asarray(log.signs)[:, 0, :]
    cp_sign = []
    for t in range(1000):
        for j in range(ncp[t]):
            cp_sign.append(signs[t, j])
    cp_sign = np.array(cp_sign)

    # skip the pull-in transient, compare the folded bits
    # signal bit for code period c is bits[(c + bit_phase) // 20]
    # (synth_simple bit_phase_cp=0); cp_sign is -sign(prompt) with the sign
    # convention of the reference (data bit 1 <-> prompt negative)
    n_cp = len(cp_sign)
    assert n_cp in (999, 1000, 1001)
    cps = np.arange(n_cp)
    true_bits = bits[np.clip(cps // 20, 0, len(bits) - 1)]
    agree = np.mean(cp_sign[200:900] == -true_bits[200:900])
    disagree = np.mean(cp_sign[200:900] == true_bits[200:900])
    assert max(agree, disagree) > 0.995, (agree, disagree)


def test_tracking_two_channels_independent():
    """Two PRNs tracked in one batch must match tracking them separately."""
    p1, p2 = 5, 9
    raw1 = _make_blocks(p1, 300, 200.0, 0.0, 1000.0, seed=3)
    raw2 = _make_blocks(p2, 300, 700.0, 0.5, -2000.0, seed=4)
    raw = raw1 + raw2  # both PRNs in the same samples
    tab = jnp.asarray(ca_table([p1, p2]).astype(np.float32))

    st = tracking.init_state(rc=[200.0, 700.0], ri=[0.0, 0.5],
                             fc=[F_CA + FCAID * 1000.0, F_CA - FCAID * 2000.0],
                             fi=[1000.0, -2000.0])
    st, log = tracking.track_chunk(st, jnp.asarray(raw), tab, FS, FCAID)
    fi_end = np.asarray(log.fi)[-50:, :].mean(axis=0)
    assert abs(fi_end[0] - 1000.0) < 3.0
    assert abs(fi_end[1] + 2000.0) < 3.0
