"""C/A code generator unit tests against IS-GPS-200 Table 3-I."""

import numpy as np

from navlab_dpe_sdr_tpu.libgnss import cacode

# IS-GPS-200 Table 3-I: first 10 chips (octal) for a spread of PRNs.
FIRST10_OCTAL = {
    1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133, 6: 1455, 7: 1131, 8: 1454,
    9: 1626, 10: 1504, 11: 1642, 12: 1750, 13: 1764, 14: 1772, 15: 1775,
    16: 1776, 17: 1156, 18: 1467, 19: 1633, 20: 1715, 21: 1746, 22: 1763,
    23: 1063, 24: 1706, 25: 1743, 26: 1761, 27: 1770, 28: 1774, 29: 1127,
    30: 1453, 31: 1625, 32: 1712,
}


def test_first_chips_octal():
    for prn, octal in FIRST10_OCTAL.items():
        assert cacode.first_chips_octal(prn) == octal, f"PRN {prn}"


def test_code_properties():
    for prn in (1, 7, 19, 28, 37):
        code = cacode.ca_code(prn)
        assert code.shape == (1023,)
        assert set(np.unique(code)) == {-1, 1}
        # balanced code: 512 ones, 511 minus-ones or vice versa
        assert abs(int(np.sum(code))) == 1


def test_cross_correlation_bounded():
    # Gold code cross-correlation takes values in {-65, -1, 63} for 1023 chips
    a = cacode.ca_code(2).astype(np.float64)
    b = cacode.ca_code(3).astype(np.float64)
    xc = np.fft.ifft(np.fft.fft(a) * np.conj(np.fft.fft(b))).real
    assert np.max(np.abs(xc)) <= 65.5
    ac = np.fft.ifft(np.abs(np.fft.fft(a)) ** 2).real
    assert abs(ac[0] - 1023.0) < 1e-6


def test_table_stacks():
    prns = [2, 3, 6, 12, 17, 19, 24, 28]
    tab = cacode.ca_table(prns)
    assert tab.shape == (8, 1023)
    for i, prn in enumerate(prns):
        assert np.array_equal(tab[i], cacode.ca_code(prn))


def test_sampled_code_wraps():
    s = cacode.sampled_code(1, fs=2.5e6, n_samples=5000, code_phase=0.0)
    chips = cacode.ca_code(1)
    # at 2.5 MHz a code period is ~2444.9 samples; sample 0 = chip 0
    assert s[0] == chips[0]
    idx = int(np.floor(4999 * 1.023e6 / 2.5e6)) % 1023
    assert s[4999] == chips[idx]
