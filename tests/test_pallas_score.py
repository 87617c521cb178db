"""Pallas scoring kernel vs the XLA reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from navlab_dpe_sdr_tpu.models.grid import spread_grid
from navlab_dpe_sdr_tpu.ops import dpe as dpe_ops
from navlab_dpe_sdr_tpu.ops import pallas_score as pk


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(3)
    c = 8
    g = spread_grid()
    win = np.abs(rng.standard_normal((c, 64))).astype(np.float32) + 0.1
    # put a peak near the center of each window
    for i in range(c):
        win[i, 30:35] += [3, 8, 12, 8, 3]
    los = rng.standard_normal((c, 3))
    los /= np.linalg.norm(los, axis=1, keepdims=True)
    r0 = np.full(c, 2.2e7)
    center = np.full(c, 32.0) + rng.standard_normal(c) * 0.3
    coef = np.full(c, 0.00834)
    return g, win, los, r0, center, coef


def _xla_reference(g, win, los, r0, center, coef):
    params = dpe_ops.ManifoldParams(
        los_enu=jnp.asarray(los.astype(np.float32)),
        r0=jnp.asarray(r0.astype(np.float32)),
        pos_center=jnp.asarray(center.astype(np.float32)),
        pos_coef=jnp.asarray(coef.astype(np.float32)),
        vel_center=jnp.asarray(center.astype(np.float32)),
        vel_coef=jnp.asarray(coef.astype(np.float32)))
    u = jnp.einsum("gj,cj->cg", jnp.asarray(g.d_enu.astype(np.float32)),
                   params.los_enu)
    d2 = jnp.sum(jnp.asarray(g.d_enu.astype(np.float32)) ** 2, axis=1)[None]
    drange = -u + (d2 - u * u) / (2.0 * params.r0[:, None])
    idx = params.pos_center[:, None] + params.pos_coef[:, None] * (
        drange + jnp.asarray(g.dt_m.astype(np.float32))[None, :])
    pad = np.zeros((win.shape[0], 128), np.float32)
    pad[:, :64] = win
    return np.asarray(dpe_ops._interp_scores(jnp.asarray(pad), idx,
                                             "quadratic", 1))


def test_pallas_matches_xla_interpret(inputs):
    g, win, los, r0, center, coef = inputs
    ref = _xla_reference(g, win, los, r0, center, coef)
    cand, winp, par = pk.pack_pos_inputs(g.d_enu, g.dt_m, win, los, r0,
                                         center, coef)
    out = np.asarray(pk.score_manifold_pallas(
        jnp.asarray(cand), jnp.asarray(winp), jnp.asarray(par),
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-3)
    assert int(np.argmax(out)) == int(np.argmax(ref))


def test_vel_packing_sign(inputs):
    """Velocity packing must realize idx = center + coef*(-los.dv + dtdot)."""
    g, win, los, r0, center, coef = inputs
    dv = g.dv_enu[:100]
    dtd = g.dtdot[:100]
    cand, winp, par = pk.pack_vel_inputs(dv, dtd, win, los, center, coef)
    out = np.asarray(pk.score_manifold_pallas(
        jnp.asarray(cand), jnp.asarray(winp), jnp.asarray(par),
        quad_range=False, interpret=True))
    # manual expected for candidate 0, summed over channels
    idx = center + coef * (-(los @ dv[0]) + dtd[0])
    k0 = np.clip(np.round(idx), 1, 126).astype(int)
    d = idx - k0
    winp = np.asarray(winp)
    expect = 0.0
    for c in range(8):
        y0, y1, y2 = winp[c, k0[c] - 1], winp[c, k0[c]], winp[c, k0[c] + 1]
        expect += y1 + 0.5 * (y2 - y0) * d[c] + 0.5 * (y2 - 2 * y1 + y0) * d[c] ** 2
    np.testing.assert_allclose(out[0], expect, rtol=1e-4)


# ---------------------------------------------------------------------------
# Batched chunk scorer (score_chunk_pallas) vs ops.dpe_real._score_chunk
# ---------------------------------------------------------------------------

def _chunk_inputs(rng_seed=7, n=3, c=8, w=24, g=5000, with_r0=True):
    rng = np.random.default_rng(rng_seed)
    win = np.abs(rng.standard_normal((n, c, w))).astype(np.float32) + 0.1
    win[:, :, w // 2 - 1:w // 2 + 2] += [4.0, 10.0, 4.0]
    los = rng.standard_normal((n, c, 3)).astype(np.float32)
    los /= np.linalg.norm(los, axis=2, keepdims=True)
    centers = (np.full((n, c), w / 2.0)
               + rng.standard_normal((n, c)) * 0.4).astype(np.float32)
    coefs = np.full((n, c), 0.00834, np.float32)
    r0 = np.full((n, c), 2.2e7, np.float32) if with_r0 else None
    o3 = (rng.standard_normal((g, 3)) * 60).astype(np.float32)
    o1 = (rng.standard_normal(g) * 40).astype(np.float32)
    return win, los, centers, coefs, r0, o3, o1


@pytest.mark.parametrize("with_r0", [True, False])
@pytest.mark.parametrize("l_power", [1, 2])
def test_chunk_pallas_matches_score_chunk(with_r0, l_power):
    """Interpret-mode parity with the XLA product hot path (_score_chunk),
    position (quad range) and velocity (linear) manifolds, L-powers 1/2."""
    from navlab_dpe_sdr_tpu.ops import dpe_real

    win, los, centers, coefs, r0, o3, o1 = _chunk_inputs(with_r0=with_r0)
    old = dpe_real.SCORE_TAP_DTYPE
    dpe_real.SCORE_TAP_DTYPE = jnp.float32  # bitwise-comparable taps
    try:
        ref = np.asarray(dpe_real._score_chunk(
            jnp.asarray(win), jnp.asarray(los), jnp.asarray(centers),
            jnp.asarray(coefs), None if r0 is None else jnp.asarray(r0),
            jnp.asarray(o3), jnp.asarray(o1), "quadratic", l_power))
    finally:
        dpe_real.SCORE_TAP_DTYPE = old
    out = np.asarray(pk.score_chunk_pallas(
        jnp.asarray(win), jnp.asarray(los), jnp.asarray(centers),
        jnp.asarray(coefs), None if r0 is None else jnp.asarray(r0),
        jnp.asarray(o3), jnp.asarray(o1),
        quad_range=with_r0, l_power=l_power, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.argmax(out, axis=1),
                                  np.argmax(ref, axis=1))


def test_chunk_pallas_odd_sizes():
    """Non-multiple-of-8 window width and non-tile-aligned grid sizes."""
    from navlab_dpe_sdr_tpu.ops import dpe_real

    win, los, centers, coefs, r0, o3, o1 = _chunk_inputs(
        rng_seed=11, n=1, c=5, w=9, g=777)
    old = dpe_real.SCORE_TAP_DTYPE
    dpe_real.SCORE_TAP_DTYPE = jnp.float32
    try:
        ref = np.asarray(dpe_real._score_chunk(
            jnp.asarray(win), jnp.asarray(los), jnp.asarray(centers),
            jnp.asarray(coefs), jnp.asarray(r0),
            jnp.asarray(o3), jnp.asarray(o1), "quadratic", 1))
    finally:
        dpe_real.SCORE_TAP_DTYPE = old
    out = np.asarray(pk.score_chunk_pallas(
        jnp.asarray(win), jnp.asarray(los), jnp.asarray(centers),
        jnp.asarray(coefs), jnp.asarray(r0), jnp.asarray(o3),
        jnp.asarray(o1), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-TPU smoke test needs a TPU backend")
def test_chunk_pallas_compiles_on_tpu():
    win, los, centers, coefs, r0, o3, o1 = _chunk_inputs(n=3)
    out = np.asarray(pk.score_chunk_pallas(
        jnp.asarray(win), jnp.asarray(los), jnp.asarray(centers),
        jnp.asarray(coefs), jnp.asarray(r0), jnp.asarray(o3),
        jnp.asarray(o1)))
    assert out.shape == (3, o3.shape[0])
    assert np.all(np.isfinite(out))
