"""Pallas fused tracking-correlation kernel: parity vs the XLA scan
(interpret mode on CPU; the TPU timing lives in tools/scalar_timing.py
variant 'pallastep')."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from navlab_dpe_sdr_tpu.constants import F_CA
from navlab_dpe_sdr_tpu.libgnss.cacode import ca_table
from navlab_dpe_sdr_tpu.ops import pallas_track as ptk
from navlab_dpe_sdr_tpu.ops import tracking as trk

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_tracking import FCAID, FS, S, _make_blocks  # noqa: E402


def test_kernel_matches_correlate_step():
    """Segment sums from the kernel == _correlate_step with the
    const-fold replica algebra (same half-chip decisions; wipeoff time
    vector differs at the f32-rounding class only)."""
    rng = np.random.default_rng(3)
    c = 8
    tab = jnp.asarray(ca_table(range(1, c + 1)).astype(np.float32))
    st = trk.init_state(rc=rng.random(c) * 1023.0, ri=rng.random(c),
                        fc=np.full(c, F_CA) + rng.standard_normal(c),
                        fi=rng.standard_normal(c) * 1000.0)
    raw = rng.standard_normal((S, 2)).astype(np.float32) * 64.0
    time_idc = jnp.asarray((np.arange(S) / FS).astype(np.float32))

    orig = trk._epl_replicas
    trk._epl_replicas = (lambda t, b, p, period=None, n_periods=1, **kw:
                         trk._epl_const_fold(t, p, period or S, n_periods))
    try:
        e_s, p_s, l_s, _ = trk._correlate_step(
            st, jnp.asarray(raw[:, 0]), jnp.asarray(raw[:, 1]), tab,
            time_idc, FS)
    finally:
        trk._epl_replicas = orig

    r2d, ehi_t, elo_t, frac2 = ptk.prep_constants(np.asarray(tab), S)
    scal = ptk.scal_pack(st.rc, st.dfc, st.ri, st.fi)
    sums = np.asarray(ptk.correlate_window_pallas(
        jnp.asarray(raw.T.copy()), r2d, scal, ehi_t, elo_t, frac2,
        period=S, fs=FS, interpret=True))
    for ref, got in ((e_s, sums[:, 0]), (p_s, sums[:, 1]),
                     (l_s, sums[:, 2])):
        ref = np.asarray(ref)
        rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
        assert rel < 1e-5, rel


def test_track_chunk_pallas_closed_loop():
    """Full closed-loop scan with the kernel converges with the same
    trajectory class as track_chunk (f32-accumulation differences only)."""
    prn, rc0, ri0, fi0 = 5, 250.0, 0.4, 900.0
    raw = jnp.asarray(_make_blocks(prn, 30, rc0, ri0, fi0))
    tab = jnp.asarray(ca_table([prn]).astype(np.float32))
    st0 = trk.init_state(rc=[rc0 + 0.2], ri=[ri0],
                         fc=[F_CA + FCAID * fi0], fi=[fi0 + 10.0])
    st1, log1 = trk.track_chunk(st0, raw, tab, FS, FCAID)
    stp, logp = ptk.track_chunk_pallas(st0, raw, tab, FS, FCAID,
                                       interpret=True)
    assert abs(float(stp.fi[0]) - float(st1.fi[0])) < 0.1
    assert abs(float(stp.rc[0]) - float(st1.rc[0])) < 1e-3
    assert int(stp.cp[0]) == int(st1.cp[0])
    iP1 = np.asarray(log1.iP)[:, 0]
    iPp = np.asarray(logp.iP)[:, 0]
    np.testing.assert_allclose(iPp[-5:], iP1[-5:], rtol=0.02)
    np.testing.assert_array_equal(np.asarray(log1.signs)[5:],
                                  np.asarray(logp.signs)[5:])
