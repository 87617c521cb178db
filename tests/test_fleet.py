"""Multi-receiver fleet: parallel tracking + millisecond time alignment."""

import numpy as np
import pytest

from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
from navlab_dpe_sdr_tpu.io.scenario import make_scenario
from navlab_dpe_sdr_tpu.models.fleet import ReceiverFleet

FS = 2.5e6


def test_fleet_tracks_and_aligns():
    sim, hand, arr = make_scenario(nav_data=True)
    n = 50000 * 40  # 0.8 s
    iq = sim.generate(n)
    samples = np.empty(n, DTYPE_IQ16)
    samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
    samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)

    # two "USRPs": the same scene, the second starts 7 ms later
    rf_a = SampleFile(samples=samples.copy(), fs=FS)
    rf_b = SampleFile(samples=samples[int(0.007 * FS):].copy(), fs=FS)
    fleet = ReceiverFleet([rf_a, rf_b], hand.prn_list)

    fleet.acquire()
    fleet.track(400, parallel=True)

    # seed ephemerides (too short a capture to decode live). Each receiver's
    # cp counting starts at its own first sample, so the anchor cp shifts by
    # the capture offset (live decode would produce exactly this).
    import copy
    for rx, cp_shift in zip(fleet.receivers, (0.0, -7.0)):
        ephs = {}
        for e in arr.ephs:
            e2 = copy.deepcopy(e)
            e2.cp_timestamp += cp_shift
            ephs[e2.prn] = e2
        rx.set_ephemerides(ephs)

    offsets = fleet.align()
    # rx_a leads by ~7 ms -> it must be advanced ~7 blocks
    assert abs(int(offsets[0]) - 7) <= 1, offsets
    assert offsets[1] <= 1

    t_after = [s[0] for s in fleet.nav_solutions()]
    assert abs(t_after[0] - t_after[1]) < 1.5e-3
