"""FFT acquisition: coarse Doppler x code-phase search + fine frequency.

Device-side JAX (float32 / complex64). The whole search is one batched
computation over [num_prn, num_doppler, S] — circular correlation via FFT on
the sample axis, batched over PRNs and Doppler bins — instead of the
reference's per-PRN Python loop over Doppler rows (correlator.py:53-103).

Peak metrics (cppr / cppm) and the found-threshold follow the reference so
acquisition decisions are comparable.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import F_CA, L_CA

# Doppler search grids (reference correlator.py:13-14)
DOPPLER_COHERENT = np.arange(-62, 63) * 100.0      # 125 bins x 100 Hz
DOPPLER_NONCOHERENT = np.arange(-12, 13) * 500.0   # 25 bins x 500 Hz


@dataclass
class AcqResult:
    prn: int
    found: bool
    rc: float     # code phase [chips]
    ri: float     # carrier phase [cycles]
    fc: float     # code frequency [chips/s]
    fi: float     # carrier Doppler [Hz]
    cppr: float   # peak-to-second-peak ratio
    cppm: float   # peak-to-mean ratio (found iff > 2.0)


@functools.partial(jax.jit, static_argnames=("n_blocks", "coherent"))
def _coarse_kernel(samples, code_table_s, dopplers, time_idc, n_blocks,
                   coherent):
    """Batched coarse search.

    samples: [S] complex64; code_table_s: [P, S] sampled +/-1 code replicas;
    dopplers: [D]; time_idc: [S].
    Returns (powers [P, D, S/n_blocks], corr0 [P, D, S]) reduced per config.
    """
    wipeoff = jnp.exp(-2j * jnp.pi * dopplers[:, None].astype(jnp.float32)
                      * time_idc[None, :].astype(jnp.float32))
    bb = samples[None, :] * wipeoff                       # [D, S]
    s = bb.shape[-1]
    if coherent or n_blocks == 1:
        # full-window coherent correlation; the C/A replica is periodic in
        # exactly S/n_blocks samples, so folding the lag axis and summing
        # reproduces the reference's reshape-sum (correlator.py:77-82).
        bb_fft = jnp.fft.fft(bb, axis=-1)                 # [D, S]
        code_fft_c = jnp.conj(jnp.fft.fft(code_table_s.astype(jnp.complex64),
                                          axis=-1))      # [P, S]
        corr = jnp.fft.ifft(bb_fft[None] * code_fft_c[:, None], axis=-1)
        if n_blocks > 1:
            sub = s // n_blocks
            corr = corr.reshape(corr.shape[0], corr.shape[1], n_blocks, sub)
            return jnp.abs(jnp.sum(corr, axis=2))
        return jnp.abs(corr)
    # true noncoherent: 1 ms coherent blocks, |.| summed across blocks —
    # tolerant of Doppler residual up to ~1/(2*1ms) per bin
    sub = s // n_blocks
    bb_blk = bb.reshape(bb.shape[0], n_blocks, sub)       # [D, N, sub]
    bb_fft = jnp.fft.fft(bb_blk, axis=-1)
    code_1ms = code_table_s[:, :sub].astype(jnp.complex64)
    code_fft_c = jnp.conj(jnp.fft.fft(code_1ms, axis=-1))  # [P, sub]
    corr = jnp.fft.ifft(bb_fft[None] * code_fft_c[:, None, None], axis=-1)
    return jnp.sum(jnp.abs(corr), axis=2)                 # [P, D, sub]


@functools.partial(jax.jit, static_argnames=("mask_halfwidth",))
def _peak_metrics(result, mask_halfwidth):
    """Per-PRN peak location + quality metrics.

    result: [P, D, S']. Returns (code_idx, dopp_idx, peak, cppr, cppm) each [P].
    cppm uses a 10%-trimmed mean of the per-code maxima with the peak
    neighborhood masked (reference correlator.py:94-103, 550-564).
    """
    max_percode = jnp.max(result, axis=1)                 # [P, S']
    code_idx = jnp.argmax(max_percode, axis=1)            # [P]
    dopp_idx = jnp.argmax(
        jnp.take_along_axis(result, code_idx[:, None, None], axis=2)[..., 0],
        axis=1)                                           # [P]
    peak = jnp.max(max_percode, axis=1)

    sp = max_percode.shape[1]
    pos = jnp.arange(sp)[None, :]
    dist = jnp.abs(pos - code_idx[:, None])
    dist = jnp.minimum(dist, sp - dist)                   # circular distance
    masked = jnp.where(dist <= mask_halfwidth, 0.0, max_percode)
    cppr = peak / jnp.max(masked, axis=1)

    # trimmed mean over the masked array (zeros at the peak excluded by rank
    # trimming: drop bottom 5% and top 5% of the full distribution)
    srt = jnp.sort(masked, axis=1)
    lo = int(np.ceil(sp * 0.05))
    hi = int(np.floor(sp * 0.95))
    tmean = jnp.mean(srt[:, lo:hi], axis=1)
    cppm = peak / tmean
    return code_idx, dopp_idx, peak, cppr, cppm


@functools.partial(jax.jit, static_argnames=("carr_fftpts",))
def _fine_freq_kernel(samples, code_repl, time_idc, carr_fftpts, f_lo, f_hi):
    """Zero-padded carrier FFT after code wipeoff (correlator.py:105-133).

    Returns (fi_est, phase_cycles): frequency of the strongest bin inside
    [f_lo, f_hi] and its phase.
    """
    bb = (samples - jnp.mean(samples)) * code_repl
    spec = jnp.fft.fftshift(jnp.fft.fft(bb, n=carr_fftpts))
    # fftshifted frequency axis
    n = carr_fftpts
    freqs = (jnp.arange(n) - n // 2).astype(jnp.float32)
    keep = (freqs >= f_lo) & (freqs <= f_hi)
    mag = jnp.where(keep, jnp.abs(spec), 0.0)
    idx = jnp.argmax(mag)
    val = spec[idx]
    return freqs[idx], jnp.angle(val) / (2.0 * jnp.pi)


def acquire(samples: np.ndarray, prns, fs: float, fcaid: float,
            dopplers: np.ndarray | None = None, coherent: bool = True,
            code_table: np.ndarray | None = None,
            threshold: float = 2.0) -> list[AcqResult]:
    """Full acquisition for a PRN list over one sample window.

    samples: complex window of n x 1 ms (typically 10 ms). The Doppler grid
    frequency scale is Hz; fine frequency search refines to the FFT bin
    spacing fs / carr_fftpts.
    """
    from ..libgnss.cacode import ca_table

    samples = np.asarray(samples)
    s = samples.shape[0]
    n_blocks = int(round(s / fs / 1e-3))
    if dopplers is None:
        dopplers = DOPPLER_COHERENT if coherent else DOPPLER_NONCOHERENT
    time_idc = np.arange(s) / fs
    code_idc = time_idc * F_CA

    table = ca_table(prns) if code_table is None else code_table
    chip_idx = np.mod(np.floor(code_idc), L_CA).astype(np.int64)
    code_s = table[:, chip_idx]                           # [P, S]

    sx = jnp.asarray(samples.astype(np.complex64))
    result = _coarse_kernel(sx, jnp.asarray(code_s), jnp.asarray(dopplers),
                            jnp.asarray(time_idc), n_blocks, coherent)
    mask_hw = int(np.ceil(fs / F_CA))
    code_idx, dopp_idx, peak, cppr, cppm = _peak_metrics(result, mask_hw)
    code_idx = np.asarray(code_idx)
    dopp_idx = np.asarray(dopp_idx)
    cppr = np.asarray(cppr)
    cppm = np.asarray(cppm)

    # fine frequency per PRN (bin spacing fs / carr_fftpts)
    carr_fftpts = 8 * (1 << s.bit_length())
    bin_hz = fs / carr_fftpts

    out = []
    for i, prn in enumerate(prns):
        rc = L_CA - code_idc[code_idx[i]]
        fi = float(dopplers[dopp_idx[i]])
        fc = F_CA + fcaid * fi

        repl_idx = np.mod(np.floor(time_idc * fc + rc), L_CA).astype(np.int64)
        repl = jnp.asarray(table[i, repl_idx].astype(np.float32))
        f_lo = float(np.min(dopplers)) / bin_hz
        f_hi = float(np.max(dopplers)) / bin_hz
        fbin, ri = _fine_freq_kernel(sx, repl, jnp.asarray(time_idc),
                                     carr_fftpts, f_lo, f_hi)
        fi = float(fbin) * bin_hz
        fc = F_CA + fcaid * fi
        out.append(AcqResult(prn=int(prn), found=bool(cppm[i] > threshold),
                             rc=float(rc), ri=float(ri), fc=float(fc),
                             fi=float(fi), cppr=float(cppr[i]),
                             cppm=float(cppm[i])))
    return out
