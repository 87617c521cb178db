"""Per-block ephemeris-set selection (EphManager): selection rules and a
mid-run set cutover that must not glitch the fix stream
(reference cuchanmgr.cu:240-306)."""

import copy
import dataclasses

import numpy as np

from navlab_dpe_sdr_tpu.constants import MU, OEDot
from navlab_dpe_sdr_tpu.libgnss.ephemeris import Ephemeris, EphManager


def _rec(prn, toe, health=0):
    e = Ephemeris(prn=prn, health=health, sqrt_A=np.sqrt(26560e3))
    e.t_oe = toe
    e.t_oc = toe
    e.complete = True
    return e


def test_selection_rules():
    tow = 100000.0
    table = {5: [_rec(5, 93000.0), _rec(5, 100200.0), _rec(5, 107400.0)]}
    m = EphManager(table, [5])
    arr, changed = m.select(tow)
    assert changed and arr.t_oe[0] == 100200.0
    # advancing time past the midpoint switches sets exactly once
    arr, changed = m.select(103000.0)
    assert not changed
    arr, changed = m.select(104500.0)
    assert changed and arr.t_oe[0] == 107400.0
    # unhealthy closest record is skipped in favor of a valid one
    table2 = {5: [_rec(5, 100200.0, health=1), _rec(5, 101000.0)]}
    arr, _ = EphManager(table2, [5]).select(tow)
    assert arr.t_oe[0] == 101000.0
    # week crossover: toe near week end vs tow near week start
    table3 = {5: [_rec(5, 604000.0), _rec(5, 300000.0)]}
    arr, _ = EphManager(table3, [5]).select(500.0)
    assert arr.t_oe[0] == 604000.0


def test_anchor_preservation():
    table = {5: [_rec(5, 1000.0), _rec(5, 9000.0)]}
    m = EphManager(table, [5])
    m.set_anchors([123456.0], [789.0])
    arr, _ = m.select(2000.0)
    assert arr.tow_timestamp[0] == 123456.0 and arr.cp_timestamp[0] == 789.0
    arr, changed = m.select(8000.0)
    assert changed
    assert arr.tow_timestamp[0] == 123456.0 and arr.cp_timestamp[0] == 789.0
    # the source records are untouched
    assert table[5][0].tow_timestamp == 0.0


def _rereference(e: Ephemeris, dt: float) -> Ephemeris:
    """Exactly re-reference a Kepler set to toe+dt: same orbit, new issue.
    (Inverse of the satpos propagation formulas, used to synthesize a
    consistent ephemeris cutover with known-zero orbit discontinuity.)"""
    a = e.sqrt_A ** 2
    n = np.sqrt(MU / a ** 3) + e.delta_n
    e2 = dataclasses.replace(e)
    e2.t_oe = e.t_oe + dt
    e2.M_0 = e.M_0 + n * dt
    e2.OMEGA_0 = e.OMEGA_0 + e.OMEGADOT * dt
    e2.i_0 = e.i_0 + e.IDOT * dt
    e2.IODE = (e.IODE + 1) % 256
    return e2


def test_rereference_is_exact():
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.libgnss import satpos
    from navlab_dpe_sdr_tpu.libgnss.ephemeris import EphArray
    _, _, arr = make_scenario(nav_data=False)
    arr2 = EphArray([_rereference(e, 240.16) for e in arr.ephs])
    t = np.full(len(arr.ephs), arr.ephs[0].t_oe + 150.0)
    s1 = satpos.sat_state(arr, t, np.zeros_like(t), np.zeros_like(t))
    s2 = satpos.sat_state(arr2, t, np.zeros_like(t), np.zeros_like(t))
    assert np.max(np.abs(s1[:, :3] - s2[:, :3])) < 1e-4   # < 0.1 mm


def test_midrun_set_switch_no_glitch():
    """A closest-toe cutover mid-run (block 4 of 8) must produce the same
    fixes as running on a single fixed set of the same orbit."""
    from navlab_dpe_sdr_tpu.io.rawfile import DTYPE_IQ16, SampleFile
    from navlab_dpe_sdr_tpu.io.scenario import make_scenario
    from navlab_dpe_sdr_tpu.libgnss import frames
    from navlab_dpe_sdr_tpu.models.dpe import DPEReceiver
    from navlab_dpe_sdr_tpu.models.grid import spread_grid

    sim, hand, arr = make_scenario(nav_data=True)
    n = 50000 * 8
    iq = sim.generate(n)
    samples = np.empty(n, DTYPE_IQ16)
    samples["i"] = np.clip(np.round(iq.real), -32768, 32767)
    samples["q"] = np.clip(np.round(iq.imag), -32768, 32767)
    truth = hand.x_ecef.copy()
    hand.x_ecef[0:3] = frames.enu_to_ecef(truth[0:3],
                                          np.array([30.0, -40.0, 15.0]))

    # sets: A at toe = tow0-120 (scenario default), B re-referenced so the
    # closest-toe midpoint falls at rx_time + 4 blocks (0.08 s into the run)
    dt_re = 2.0 * 120.0 + 0.16
    table = {e.prn: [e, _rereference(e, dt_re)] for e in arr.ephs}
    mgr = EphManager(table, hand.prn_list, fit_interval_s=7200.0)

    rx_ref = DPEReceiver(SampleFile(samples=samples.copy(), fs=2.5e6),
                         copy.deepcopy(hand), grid=spread_grid(),
                         eph=copy.deepcopy(arr))
    rx_ref.run(8)
    rx = DPEReceiver(SampleFile(samples=samples.copy(), fs=2.5e6),
                     copy.deepcopy(hand), grid=spread_grid(),
                     eph_manager=mgr)
    rx.run(8)

    assert mgr.current_idx == [1] * len(hand.prn_list)   # switched to set B
    for f1, f2 in zip(rx_ref.fixes, rx.fixes):
        assert np.linalg.norm(f1.x_ecef[:3] - f2.x_ecef[:3]) < 1e-3
