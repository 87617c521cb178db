"""TPU timing of the scalar-tracking scan: merged vs legacy chip lookup.

Variants (replica construction inside ops.tracking._correlate_step):
  merged  — ONE 2046-bin half-chip one-hot -> [C, S, 3] E/P/L (current
            default on TPU; see tracking._epl_onehot)
  legacy3 — three independent 1023-bin one-hot lookups (the r2 design)

Protocol (NOTES.md trust rules): per variant, one warm track_chunk call
on its own chunk (pays the one-time first-execution warmup), then K
timed calls on pre-uploaded varying chunks, each ending in a scalar
fetch. Never abort a warmup.

Usage: python tools/scalar_timing.py [variants...]   (default: both)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from navlab_dpe_sdr_tpu.constants import F_CA, F_L1
from navlab_dpe_sdr_tpu.libgnss.cacode import ca_table
from navlab_dpe_sdr_tpu.ops import tracking as trk

C, S = 8, 2500
N_STEPS = int(os.environ.get("SCT_STEPS", 1000))   # 1 s of signal per call
K = int(os.environ.get("SCT_K", 3))                # timed calls
FS = 2.5e6
FCAID = F_CA / F_L1


def _legacy3(code_table, base, phase):
    return jnp.stack([trk._chips_onehot(code_table, base, phase + 0.5),
                      trk._chips_onehot(code_table, base, phase),
                      trk._chips_onehot(code_table, base, phase - 0.5)],
                     axis=-1)


def _merged_bf16(code_table, base, phase):
    """Merged lookup with bf16 one-hot/table operands (exact for 0/+-1
    values; halves the contraction operand bytes), f32 accumulate."""
    from navlab_dpe_sdr_tpu.constants import L_CA
    r = jnp.repeat(code_table, 2, axis=1)
    tab3 = jnp.stack([jnp.roll(r, -1, axis=1), r,
                      jnp.roll(r, 1, axis=1)], axis=-1).astype(jnp.bfloat16)
    x = base[None, :] + phase[:, None]
    j = jnp.mod(jnp.floor(2.0 * x), np.float32(2 * L_CA))
    k = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * int(L_CA)),
                                 2).astype(jnp.float32)
    onehot = (j[:, :, None] == k).astype(jnp.bfloat16)
    return jnp.einsum("csk,ckt->cst", onehot, tab3,
                      preferred_element_type=jnp.float32)


def _factored_bf16(code_table, base, phase):
    """_epl_onehot_factored with bf16 one-hot/table operands (0/+-1 values
    are exact in bf16; halves the materialized operand traffic), f32
    accumulate — bit-identical result."""
    from navlab_dpe_sdr_tpu.constants import L_CA
    trk_ = trk
    r = jnp.repeat(code_table, 2, axis=1)
    tab3 = jnp.stack([jnp.roll(r, -1, axis=1), r,
                      jnp.roll(r, 1, axis=1)], axis=-1)
    tab_hi = tab3.reshape(-1, trk_._FACT_HI,
                          trk_._FACT_LO * 3).astype(jnp.bfloat16)
    x = base[None, :] + phase[:, None]
    j = jnp.mod(jnp.floor(2.0 * x), np.float32(2 * int(L_CA)))
    h = jnp.floor((j + 0.5) * np.float32(1.0 / trk_._FACT_LO))
    l = j - np.float32(trk_._FACT_LO) * h
    kh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, trk_._FACT_HI),
                                  2).astype(jnp.float32)
    kl = jax.lax.broadcasted_iota(jnp.int32, (1, 1, trk_._FACT_LO),
                                  2).astype(jnp.float32)
    oh_h = (h[:, :, None] == kh).astype(jnp.bfloat16)
    oh_l = (l[:, :, None] == kl).astype(jnp.bfloat16)
    u = jnp.einsum("csh,chx->csx", oh_h, tab_hi,
                   preferred_element_type=jnp.float32)
    u = u.reshape(u.shape[0], u.shape[1], trk_._FACT_LO, 3)
    return jnp.einsum("csl,cslt->cst", oh_l.astype(jnp.float32), u,
                      preferred_element_type=jnp.float32)


def _constfold2(code_table, base, phase, period=None, n_periods=1, **kw):
    """_epl_const_fold with lane-conscious einsum layouts: the sample axis
    k (2500) rides the MXU lane dimension instead of the 22-wide digit
    (which utilizes 22/128 lanes)."""
    from navlab_dpe_sdr_tpu.constants import L_CA
    if period is None:
        period = base.shape[0]
    c = code_table.shape[0]
    e_hi_np, e_lo_np, frac2_np = trk._half_chip_consts(period)
    e_hi = jnp.asarray(e_hi_np)
    e_lo = jnp.asarray(e_lo_np)
    frac2 = jnp.asarray(frac2_np)
    l2 = 2 * int(L_CA)
    r2 = jnp.repeat(code_table, 2, axis=1)
    r2d = jnp.concatenate([r2, r2, r2[:, :4]], axis=1)
    ph = jnp.mod(phase, np.float32(L_CA))
    s2 = jnp.floor(2.0 * ph).astype(jnp.int32)
    fr = 2.0 * ph - jnp.floor(2.0 * ph)

    def sl(row, st):
        return jax.lax.dynamic_slice(row, (st,), (l2 + 3,))

    ext = jax.vmap(sl)(r2d, jnp.mod(s2 - 1, np.int32(l2)))
    shifts = jnp.stack([ext[:, e + 1:e + 1 + l2]
                        for e in (-1, 0, 1, 2)], axis=1)
    rsh = shifts.reshape(c, 4, trk._FACT_HI, trk._FACT_LO)
    # k last: [C, 4, 22, P0] — P0=2500 in lanes
    a = jnp.einsum("kh,cehl->celk", e_hi, rsh,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("kl,celk->cek", e_lo, a,
                   preferred_element_type=jnp.float32)
    carry = ((frac2[None, :] + fr[:, None]) >= np.float32(1.0)
             ).astype(jnp.float32)
    ym1, y0, y1, y2 = y[:, 0], y[:, 1], y[:, 2], y[:, 3]
    e_tap = y1 + carry * (y2 - y1)
    p_tap = y0 + carry * (y1 - y0)
    l_tap = ym1 + carry * (y0 - ym1)
    repl = jnp.stack([e_tap, p_tap, l_tap], axis=-1)
    if n_periods > 1:
        repl = jnp.tile(repl, (1, n_periods, 1))
    return repl


def main():
    variants = sys.argv[1:] or ["merged", "legacy3"]
    rng = np.random.default_rng(3)
    tab = jnp.asarray(ca_table(range(1, C + 1)).astype(np.float32))
    prns = list(range(1, C + 1))
    st0 = trk.init_state(rc=rng.random(C) * 1023.0,
                         ri=rng.random(C),
                         fc=np.full(C, F_CA) + rng.standard_normal(C),
                         fi=rng.standard_normal(C) * 1000.0)
    # K+1 independent noise chunks, uploaded once
    chunks = [jnp.asarray(rng.standard_normal(
        (N_STEPS, S, 2)).astype(np.float32) * 64.0) for _ in range(K + 1)]
    for ch in chunks:
        jax.block_until_ready(ch)
    print(f"# backend={jax.default_backend()} C={C} S={S} steps={N_STEPS} "
          f"K={K} prns={prns}", flush=True)

    if "scanfloor" in variants:
        # pure lax.scan iteration overhead: trivial body (one reduce of the
        # [S, 2] step slice + scalar carry). If this is within ~2x of the
        # full correlation step, per-iteration overhead is the floor and
        # the lever is fewer, fatter iterations — not cheaper math.
        variants = [v for v in variants if v != "scanfloor"]

        @jax.jit
        def floor_scan(c0, chunk):
            def body(c, raw):
                s = jnp.sum(raw)
                return c + s, s
            return jax.lax.scan(body, c0, chunk)

        c0 = jnp.float32(0.0)
        t0 = time.time()
        c, out = floor_scan(c0, chunks[0])
        float(c)
        warm_s = time.time() - t0
        t0 = time.time()
        for ch in chunks[1:]:
            c, out = floor_scan(c0, ch)
            float(c)
        dt = (time.time() - t0) / K
        print(f"scanfloor: {dt * 1e3 / N_STEPS:.4f} ms/step "
              f"(trivial body; warmup {warm_s:.0f} s)", flush=True)

    if "openloop" in variants:
        # floor probe: correlation-only scan (track_open_loop) — no
        # discriminators/loop filters/lock/SNR. If this is much faster,
        # the closed-loop tail of ~50 tiny [C]-shaped ops bounds the scan;
        # if similar, correlation dominates and the tail is free.
        variants = [v for v in variants if v != "openloop"]
        rc = jnp.asarray(np.asarray(st0.rc))
        dfc = jnp.asarray(np.asarray(st0.dfc))
        ri = jnp.asarray(np.asarray(st0.ri))
        fi = jnp.asarray(np.asarray(st0.fi))
        t0 = time.time()
        e, p, l = trk.track_open_loop(rc, dfc, ri, fi, chunks[0], tab, FS)
        float(jnp.sum(p))
        warm_s = time.time() - t0
        t0 = time.time()
        for ch in chunks[1:]:
            e, p, l = trk.track_open_loop(rc, dfc, ri, fi, ch, tab, FS)
            float(jnp.sum(p))
        dt = (time.time() - t0) / K
        print(f"openloop: {dt * 1e3 / N_STEPS:.4f} ms/step "
              f"({N_STEPS * 1e-3 / dt:.1f}x real time; warmup {warm_s:.0f} s)",
              flush=True)

    for name in [v for v in variants if v.startswith("pallastep")]:
        # fused pallas correlation kernel (ops.pallas_track): usage
        # pallastep, pallastep_u4 ...
        variants = [v for v in variants if v != name]
        from navlab_dpe_sdr_tpu.ops import pallas_track as ptk
        _, _, usuf = name.partition("_u")
        unroll = int(usuf) if usuf else None
        t0 = time.time()
        st, log = ptk.track_chunk_pallas(st0, chunks[0], tab, FS, FCAID,
                                         unroll=unroll)
        float(jnp.sum(log.iP))
        warm_s = time.time() - t0
        t0 = time.time()
        for ch in chunks[1:]:
            st, log = ptk.track_chunk_pallas(st, ch, tab, FS, FCAID,
                                             unroll=unroll)
            float(jnp.sum(log.iP))
        dt = (time.time() - t0) / K
        rtf = N_STEPS * 1e-3 / dt
        print(f"{name}: {dt * 1e3 / N_STEPS:.4f} ms/step "
              f"({rtf:.1f}x real time, {C} channels; warmup {warm_s:.0f} s)",
              flush=True)

    for name in [v for v in variants if v.startswith("batchk")]:
        # k-window predictor-corrector batching (track_chunk_batched):
        # one big correlation op per k windows + k tiny sequential
        # measurement updates. Usage: batchk4, batchk8, batchk4_u4...
        variants = [v for v in variants if v != name]
        spec, _, usuf = name.partition("_u")
        kwin = int(spec[6:])
        unroll = int(usuf) if usuf else None
        t0 = time.time()
        st, log = trk.track_chunk_batched(st0, chunks[0], tab, FS, FCAID,
                                          batch_k=kwin, unroll=unroll)
        float(jnp.sum(log.iP))
        warm_s = time.time() - t0
        t0 = time.time()
        for ch in chunks[1:]:
            st, log = trk.track_chunk_batched(st, ch, tab, FS, FCAID,
                                              batch_k=kwin, unroll=unroll)
            float(jnp.sum(log.iP))
        dt = (time.time() - t0) / K
        rtf = N_STEPS * 1e-3 / dt
        print(f"{name}: {dt * 1e3 / N_STEPS:.4f} ms/step "
              f"({rtf:.1f}x real time, {C} channels; warmup {warm_s:.0f} s)",
              flush=True)

    for name in [v for v in variants if v.startswith("coh")]:
        # coherent predetection integration (track_chunk coh_ms=m): same
        # signal seconds, N_STEPS/m windows of m ms — the fewer-fatter-
        # iterations lever for a latency-bound scan. Usage: coh2 coh4 coh8.
        variants = [v for v in variants if v != name]
        m = int(name[3:])
        if N_STEPS % m:
            print(f"{name}: skipped (SCT_STEPS={N_STEPS} not divisible "
                  f"by {m})", flush=True)
            continue
        loops = trk.LoopConfig(order=2, bn_code=2.0, bn_carr=48.0 / m,
                               bn_carr_freq=12.0 / m)
        mchunks = [ch.reshape(N_STEPS // m, m * S, 2) for ch in chunks]
        t0 = time.time()
        st, log = trk.track_chunk(st0, mchunks[0], tab, FS, FCAID,
                                  loops, coh_ms=m)
        float(jnp.sum(log.iP))
        warm_s = time.time() - t0
        t0 = time.time()
        for ch in mchunks[1:]:
            st, log = trk.track_chunk(st, ch, tab, FS, FCAID,
                                      loops, coh_ms=m)
            float(jnp.sum(log.iP))
        dt = (time.time() - t0) / K
        rtf = N_STEPS * 1e-3 / dt
        print(f"{name}: {dt * 1e3 / (N_STEPS // m):.4f} ms/update "
              f"({rtf:.1f}x real time, {C} channels; warmup {warm_s:.0f} s)",
              flush=True)

    def _wrap(fn):
        return lambda t, b, p, **kw: fn(t, b, p)

    impls = {"merged": _wrap(trk._epl_onehot), "legacy3": _wrap(_legacy3),
             "merged_bf16": _wrap(_merged_bf16),
             "factored": _wrap(trk._epl_onehot_factored),
             "factored_bf16": _wrap(_factored_bf16),
             # constant-table period fold (r4 TPU default)
             "constfold": lambda t, b, p, period=None, n_periods=1, **kw:
             trk._epl_const_fold(t, p, period, n_periods),
             "constfold2": _constfold2}
    orig = trk._epl_replicas
    for name in variants:
        # "<impl>_uK" suffix: run the scan with lax.scan unroll=K
        # (amortizes per-iteration loop overhead; identical math)
        base_name, _, usuf = name.partition("_u")
        unroll = int(usuf) if usuf else 1
        trk._epl_replicas = impls[base_name]
        trk.track_chunk.clear_cache()
        t0 = time.time()
        st, log = trk.track_chunk(st0, chunks[0], tab, FS, FCAID,
                                  unroll=unroll)
        float(jnp.sum(log.iP))
        warm_s = time.time() - t0
        t0 = time.time()
        for ch in chunks[1:]:
            st, log = trk.track_chunk(st, ch, tab, FS, FCAID,
                                      unroll=unroll)
            float(jnp.sum(log.iP))
        dt = (time.time() - t0) / K
        rtf = N_STEPS * 1e-3 / dt
        print(f"{name}: {dt * 1e3 / N_STEPS:.4f} ms/step "
              f"({rtf:.1f}x real time, {C} channels; warmup {warm_s:.0f} s)",
              flush=True)
    trk._epl_replicas = orig


if __name__ == "__main__":
    main()
