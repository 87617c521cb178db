"""All-real TPU acquisition: circulant-matmul code search + windowed DFT
fine frequency.

The FFT formulation (ops.acquisition) needs complex FFTs; this engine
reaches the same result with MXU matmuls in float32:

- the C/A code period is exactly `T_CA*fs` samples, so the Doppler-wiped
  signal folds per period and the circular correlation over all code lags is
  `folded @ Circulant(code)^T` — a [D, P0] x [P0, P0] matmul per PRN. The
  circulant is built on device from the doubled one-period replica with
  vmapped dynamic slices (no gather, no host upload).
- coherent mode folds all periods into one row per Doppler; noncoherent
  mode folds per millisecond and sums magnitudes after the matmul.
- fine frequency evaluates only the needed band of the zero-padded carrier
  spectrum via the two-stage windowed DFT from ops.dpe_real.

Parity: reference correlator.coarse_acquisition / fine_frequency_acquisition
(correlator.py:53-133) and BCS acquisition behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import F_CA, L_CA
from .acquisition import DOPPLER_COHERENT, AcqResult
from .dpe_real import _dft_twiddles


def _circulant(period_code: jax.Array) -> jax.Array:
    """[P0, P0] matrix M[m, q] = code[(q - m) mod P0] (rows = lags)."""
    p0 = period_code.shape[0]
    doubled = jnp.concatenate([period_code, period_code])
    starts = jnp.mod(p0 - jnp.arange(p0), p0)

    def row(st):
        return jax.lax.dynamic_slice(doubled, (st,), (p0,))

    return jax.vmap(row)(starts)


@functools.partial(jax.jit, static_argnames=("period", "coherent"))
def coarse_search_real(raw_re, raw_im, period_codes, dopplers, time_idc,
                       period: int, coherent: bool = True):
    """Coarse Doppler x code search, all-real.

    raw_re/raw_im: [S]; period_codes: [P, period] one-period +/-1 replicas;
    dopplers: [D]. Returns result [P, D, period] magnitudes.
    """
    s = raw_re.shape[0]
    n_per = s // period

    ang = 2.0 * jnp.pi * dopplers[:, None] * time_idc[None, :]
    wc, ws = jnp.cos(ang), jnp.sin(ang)
    bb_re = raw_re[None, :] * wc + raw_im[None, :] * ws       # [D, S]
    bb_im = raw_im[None, :] * wc - raw_re[None, :] * ws

    if coherent:
        f_re = jnp.sum(bb_re.reshape(-1, n_per, period), axis=1)  # [D, P0]
        f_im = jnp.sum(bb_im.reshape(-1, n_per, period), axis=1)
    else:
        f_re = bb_re.reshape(-1, period)                # [D*n_per, P0]
        f_im = bb_im.reshape(-1, period)

    def per_prn(code):
        m = _circulant(code)                            # [P0, P0]
        c_re = jnp.dot(f_re, m.T, preferred_element_type=jnp.float32)
        c_im = jnp.dot(f_im, m.T, preferred_element_type=jnp.float32)
        mag = jnp.sqrt(c_re * c_re + c_im * c_im)
        if not coherent:
            mag = jnp.sum(mag.reshape(-1, n_per, period), axis=1)
        return mag                                      # [D, P0]

    return jax.vmap(per_prn)(period_codes)              # [P, D, P0]


@functools.partial(jax.jit, static_argnames=("carr_fftpts", "n_bins"))
def fine_freq_real(raw_re, raw_im, repl, time_idc, f_lo_bin,
                   carr_fftpts: int, n_bins: int):
    """Windowed-DFT carrier search after code wipeoff, all-real.

    repl: [S] +/-1 replica at the coarse code phase; evaluates n_bins bins of
    the fftshifted zero-padded spectrum starting at f_lo_bin.
    Returns (mag [n_bins], re [n_bins], im [n_bins]).
    """
    s = raw_re.shape[0]
    mean_re = jnp.mean(raw_re)
    mean_im = jnp.mean(raw_im)
    y_re = (raw_re - mean_re) * repl
    y_im = (raw_im - mean_im) * repl

    s0_n = 256
    s1_n = -(-s // s0_n)
    pad = s1_n * s0_n - s
    y_re_p = jnp.pad(y_re, (0, pad)).reshape(1, s1_n, s0_n)
    y_im_p = jnp.pad(y_im, (0, pad)).reshape(1, s1_n, s0_n)

    # reuse the dpe_real twiddle builder with a [1] channel and a custom
    # window width via chunking over CARR_WIN-sized pieces
    from .dpe_real import CARR_WIN
    n_chunks = -(-n_bins // CARR_WIN)
    mags, res, ims = [], [], []
    for k in range(n_chunks):
        start = f_lo_bin + k * CARR_WIN
        a_cos, a_sin, b_cos, b_sin = _dft_twiddles(
            jnp.asarray([start]), carr_fftpts, s1_n, s0_n, CARR_WIN)
        z_re = (jnp.einsum("cws,cst->cwt", a_cos, y_re_p)
                + jnp.einsum("cws,cst->cwt", a_sin, y_im_p))
        z_im = (jnp.einsum("cws,cst->cwt", a_cos, y_im_p)
                - jnp.einsum("cws,cst->cwt", a_sin, y_re_p))
        x_re = jnp.sum(z_re * b_cos + z_im * b_sin, axis=2)[0]
        x_im = jnp.sum(z_im * b_cos - z_re * b_sin, axis=2)[0]
        mags.append(jnp.sqrt(x_re * x_re + x_im * x_im))
        res.append(x_re)
        ims.append(x_im)
    mag = jnp.concatenate(mags)[:n_bins]
    return mag, jnp.concatenate(res)[:n_bins], jnp.concatenate(ims)[:n_bins]


def acquire_real(samples: np.ndarray, prns, fs: float, fcaid: float,
                 dopplers: np.ndarray | None = None, coherent: bool = True,
                 threshold: float = 2.0) -> list[AcqResult]:
    """Full acquisition via the real-arithmetic engine (TPU-safe)."""
    from ..libgnss.cacode import ca_table

    samples = np.asarray(samples)
    s = samples.shape[0]
    period = int(round(fs * 1e-3))
    if dopplers is None:
        dopplers = DOPPLER_COHERENT
    t = np.arange(s) / fs

    tab = ca_table(prns)
    pidx = np.mod(np.floor(np.arange(period) / fs * F_CA), L_CA).astype(int)
    period_codes = tab[:, pidx].astype(np.float32)          # [P, P0]

    raw_re = jnp.asarray(np.ascontiguousarray(samples.real.astype(np.float32)))
    raw_im = jnp.asarray(np.ascontiguousarray(samples.imag.astype(np.float32)))
    t32 = jnp.asarray(t.astype(np.float32))

    result = coarse_search_real(raw_re, raw_im, jnp.asarray(period_codes),
                                jnp.asarray(dopplers.astype(np.float32)),
                                t32, period, coherent)
    result = np.asarray(result)                             # [P, D, P0]

    carr_fftpts = 8 * (1 << s.bit_length())
    bin_hz = fs / carr_fftpts
    f_lo = int(np.floor(np.min(dopplers) / bin_hz)) + carr_fftpts // 2
    n_bins = int(np.ceil((np.max(dopplers) - np.min(dopplers)) / bin_hz)) + 2

    out = []
    mask_hw = int(np.ceil(fs / F_CA))
    code_idc_period = np.arange(period) / fs * F_CA
    for i, prn in enumerate(prns):
        r = result[i]
        max_percode = r.max(axis=0)
        code_idx = int(np.argmax(max_percode))
        dopp_idx = int(np.argmax(r[:, code_idx]))
        peak = max_percode[code_idx]
        pos = np.arange(period)
        dist = np.minimum(np.abs(pos - code_idx),
                          period - np.abs(pos - code_idx))
        masked = np.where(dist <= mask_hw, 0.0, max_percode)
        cppr = peak / masked.max()
        srt = np.sort(masked)
        lo_i, hi_i = int(period * 0.05), int(period * 0.95)
        cppm = peak / srt[lo_i:hi_i].mean()

        rc = L_CA - code_idc_period[code_idx]
        fi = float(dopplers[dopp_idx])
        fc = F_CA + fcaid * fi

        repl_idx = np.mod(np.floor(t * fc + rc), L_CA).astype(int)
        repl = jnp.asarray(tab[i][repl_idx].astype(np.float32))
        mag, x_re, x_im = fine_freq_real(raw_re, raw_im, repl, t32,
                                         f_lo, carr_fftpts, n_bins)
        mag = np.asarray(mag)
        j = int(np.argmax(mag))
        fi = (f_lo + j - carr_fftpts // 2) * bin_hz
        fc = F_CA + fcaid * fi
        ri = float(np.arctan2(np.asarray(x_im)[j], np.asarray(x_re)[j])
                   / (2.0 * np.pi))
        out.append(AcqResult(prn=int(prn), found=bool(cppm > threshold),
                             rc=float(rc), ri=ri, fc=float(fc), fi=float(fi),
                             cppr=float(cppr), cppm=float(cppm)))
    return out
