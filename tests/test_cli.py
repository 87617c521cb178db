"""CLI smoke tests through real subprocesses (guards the wiring)."""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def _run(*args, timeout=600):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "navlab_dpe_sdr_tpu.cli", "--device", "cpu",
         *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout)


@pytest.fixture(scope="module")
def tiny_capture(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    cap = d / "cap.dat"
    hand = d / "hand.csv"
    r = _run("synth", "--out", str(cap), "--handoff", str(hand),
             "--seconds", "1.2", "--cn0", "47")
    assert r.returncode == 0, r.stderr[-800:]
    return cap, hand


def test_cli_acquire(tiny_capture):
    cap, hand = tiny_capture
    r = _run("acquire", str(cap), "--prns", "2,7,6,12")
    assert r.returncode == 0, r.stderr[-800:]
    assert "True" in r.stdout


def test_cli_dpe_with_native_io(tiny_capture, tmp_path):
    cap, hand = tiny_capture
    fixes = tmp_path / "fixes.csv"
    xlog = tmp_path / "x.csv"
    r = _run("dpe", str(cap), "--handoff", str(hand), "--blocks", "20",
             "--out", str(fixes), "--native-io", "--xecef-log", str(xlog),
             "--watchdog", "600")
    assert r.returncode == 0, r.stderr[-800:]
    assert "final fix" in r.stdout
    rows = fixes.read_text().splitlines()
    assert len(rows) == 21  # header + 20 fixes
    xrows = np.loadtxt(xlog, delimiter=",")
    assert xrows.shape == (20, 9)


def test_cli_survey(tiny_capture, tmp_path):
    cap, hand = tiny_capture
    out = tmp_path / "survey.json"
    r = _run("survey", str(cap), "--handoff", str(hand), "--blocks", "48",
             "--batch", "8", "--fine-n", "15", "--json", str(out))
    assert r.returncode == 0, r.stderr[-800:]
    assert "sigma ENU+clk" in r.stdout
    payload = json.loads(out.read_text())
    assert len(payload["x_ecef"]) == 8
    assert payload["n_batches"] == 6
    assert all(s > 0 for s in payload["sigma_pos"])


def test_cli_dpe_config_overrides(tiny_capture, tmp_path):
    cap, hand = tiny_capture
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"interp": "linear", "l_power": 2}))
    r = _run("dpe", str(cap), "--handoff", str(hand), "--blocks", "3",
             "--config", str(cfg), "--set", "engine=real",
             "--watchdog", "600")
    assert r.returncode == 0, r.stderr[-800:]


def test_cli_console_dofile(tiny_capture, tmp_path):
    cap, hand = tiny_capture
    script = tmp_path / "s.dofile"
    script.write_text(
        f"newflow f {cap} {hand}\nsetparam f interp linear\n"
        f"startflow f 3\nstatus\nquit\n")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from navlab_dpe_sdr_tpu.console import Console;"
         f"c = Console(); c.onecmd('dofile {script}')"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    assert "final fix" in r.stdout


def _console():
    import io

    from navlab_dpe_sdr_tpu.console import Console
    out = io.StringIO()
    return Console(stdout=out), out


def test_console_prefix_abbrev_alias_history(tiny_capture):
    cap, hand = tiny_capture
    c, out = _console()
    # unique prefixes resolve (reference cmdParser minimal abbreviations)
    c.onecmd(f"newf f1 {cap} {hand}")
    c.onecmd("setp f1 interp linear")
    c.onecmd("addal f1 primary")
    c.onecmd("setp primary l_power 2")       # via alias
    c.onecmd("lsf")
    c.onecmd("s")                            # ambiguous
    c.precmd("lsf")                          # history records via precmd
    c.onecmd("hist")
    text = out.getvalue()
    assert "flow f1 created" in text
    assert "f1.interp = linear" in text
    assert "primary -> f1" in text
    assert "f1.l_power = 2" in text          # alias resolved to f1
    assert "aliases=primary" in text
    assert "ambiguous command 's'" in text
    assert "lsf" in text.splitlines()[-1] or "lsf" in text


def test_console_active_flow_and_delflow(tiny_capture):
    cap, hand = tiny_capture
    c, out = _console()
    c.onecmd(f"newflow a {cap} {hand}")
    c.onecmd(f"newflow b {cap} {hand}")
    c.onecmd("actflow b")
    c.onecmd("setparam interp linear")       # 2-arg form -> active flow
    assert c.flows["b"].overrides["interp"] == "linear"
    assert "interp" not in c.flows["a"].overrides
    c.onecmd("delflow b")
    assert "b" not in c.flows
    assert c.active == "a"


def test_console_stopflow_midrun(tiny_capture):
    """Background startflow + stopflow stops before the block budget
    (reference Flow::Stop join semantics, flow.cu:89-103)."""
    cap, hand = tiny_capture
    c, out = _console()
    c.onecmd(f"newflow f {cap} {hand}")
    c.onecmd("setparam f interp linear")
    c.onecmd("startflow f 55 &")
    assert "flow f started" in out.getvalue()
    fl = c.flows["f"]
    c.onecmd("status f")
    c.onecmd("stopflow f")
    assert not fl.running
    assert fl.runner.stats.n < 55
    assert "stopped after" in out.getvalue()
    # idempotent: stopping again reports not running
    c.onecmd("stopflow f")
    assert "wasn't running" in out.getvalue()
    c.onecmd("quit")


def test_console_startflow_watchdog_default_and_fires(monkeypatch):
    """startflow enforces the reference's 1.5 s per-block watchdog by
    default (README.md:108, sampleblock.cu:432-447) with `setparam
    watchdog` as the escape hatch; the first iteration (jit compile) gets
    grace, a later stall kills the flow."""
    import time

    import navlab_dpe_sdr_tpu.console as console_mod

    class _SlowRx:
        def __init__(self):
            self.n = 0
            self.fixes = []

        def step(self):
            self.n += 1
            if self.n >= 2:
                time.sleep(0.06)

    monkeypatch.setattr(console_mod._Flow, "build",
                        lambda self: _SlowRx())
    c, out = _console()
    c.onecmd("newflow f cap.dat hand.csv")
    c.onecmd("setparam f watchdog 0.02")
    c.onecmd("startflow f 10")
    assert "failed" in out.getvalue() and "watchdog" in out.getvalue()
    # iteration 1 was exempt (compile grace); iteration 2 tripped it
    assert c.flows["f"].runner.stats.n == 2

    # default (no setparam) is the reference's 1.5 s, not disabled
    c.onecmd("newflow g cap.dat hand.csv")
    c.onecmd("startflow g 2")
    assert c.flows["g"].runner.watchdog_s == 1.5

    # watchdog <= 0 disables
    c.onecmd("newflow h cap.dat hand.csv")
    c.onecmd("setparam h watchdog 0")
    c.onecmd("startflow h 2")
    assert c.flows["h"].runner.watchdog_s is None


def test_console_tab_completion():
    """complete_* hooks (the reference scaffolds completion in
    cmdReader.cpp): command names, flow names/aliases, setparam keys."""
    c, _ = _console()
    c.flows = {"alpha": None, "beta": None}
    c.aliases = {"primary": "alpha"}
    assert "startflow " in c.completenames("start")
    assert c.complete_startflow("al", "", 0, 0) == ["alpha "]
    assert set(c.complete_stopflow("", "", 0, 0)) == {
        "alpha ", "beta ", "primary "}
    keys = c.complete_setparam("eng", "", 0, 0)
    assert "engine " in keys
    assert "watchdog " in c.complete_setparam("watch", "", 0, 0)


class TestAxonProbe:
    """The axon-health probe + CPU-fallback policy (no device needed)."""

    def test_cache_path_keyed_on_pool(self, monkeypatch):
        from navlab_dpe_sdr_tpu import cli
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
        p1 = cli._axon_probe_cache_path()
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.2")
        p2 = cli._axon_probe_cache_path()
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS")
        p3 = cli._axon_probe_cache_path()
        assert len({p1, p2, p3}) == 3

    def test_cached_verdict_respected_and_dead_rechecked_sooner(
            self, monkeypatch, tmp_path):
        import time

        from navlab_dpe_sdr_tpu import cli
        cache = tmp_path / "probe.json"
        monkeypatch.setattr(cli, "_axon_probe_cache_path",
                            lambda: str(cache))
        calls = []

        def fake_run(*a, **kw):
            calls.append(a)
            raise AssertionError("probe subprocess must not run on a "
                                 "fresh cached verdict")

        import subprocess as sp
        monkeypatch.setattr(sp, "run", fake_run)
        cache.write_text(json.dumps({"ts": time.time(), "ok": True}))
        assert cli._axon_device_answers() is True
        cache.write_text(json.dumps({"ts": time.time(), "ok": False}))
        assert cli._axon_device_answers() is False
        # an ok verdict is trusted ~6x longer than a dead one
        cache.write_text(json.dumps({"ts": time.time() - 1200, "ok": True}))
        assert cli._axon_device_answers(cache_s=600) is True
        assert not calls

    def test_probe_timeout_records_dead(self, monkeypatch, tmp_path):
        import subprocess as sp

        from navlab_dpe_sdr_tpu import cli
        cache = tmp_path / "probe.json"
        monkeypatch.setattr(cli, "_axon_probe_cache_path",
                            lambda: str(cache))

        def fake_run(*a, **kw):
            raise sp.TimeoutExpired(cmd=a[0], timeout=kw.get("timeout"))

        monkeypatch.setattr(sp, "run", fake_run)
        assert cli._axon_device_answers(timeout_s=1) is False
        rec = json.loads(cache.read_text())
        assert rec["ok"] is False

    def test_fast_failure_not_cached(self, monkeypatch, tmp_path):
        """A near-instant CalledProcessError is an import/plugin error in
        the probing process's environment (e.g. a PYTHONPATH without the
        axon site dir), not evidence the device is dead: the caller still
        gets False, but the verdict must NOT be cached — one broken
        environment would otherwise pin every later healthy process to
        CPU for the cache TTL."""
        import subprocess as sp

        from navlab_dpe_sdr_tpu import cli
        cache = tmp_path / "probe.json"
        monkeypatch.setattr(cli, "_axon_probe_cache_path",
                            lambda: str(cache))

        def fake_run(*a, **kw):
            raise sp.CalledProcessError(returncode=1, cmd=a[0])

        monkeypatch.setattr(sp, "run", fake_run)
        assert cli._axon_device_answers() is False
        assert not cache.exists()

    def test_slow_failure_is_cached(self, monkeypatch, tmp_path):
        """A failure that took real time (device wedged mid-dispatch and
        the subprocess died late) IS a device verdict and is cached."""
        import subprocess as sp
        import time

        from navlab_dpe_sdr_tpu import cli
        cache = tmp_path / "probe.json"
        monkeypatch.setattr(cli, "_axon_probe_cache_path",
                            lambda: str(cache))
        t0 = time.time()
        clock = {"now": t0}
        monkeypatch.setattr(time, "time", lambda: clock["now"])

        def fake_run(*a, **kw):
            clock["now"] += 15.0      # the probe "took" 15 s before dying
            raise sp.CalledProcessError(returncode=1, cmd=a[0])

        monkeypatch.setattr(sp, "run", fake_run)
        assert cli._axon_device_answers() is False
        rec = json.loads(cache.read_text())
        assert rec["ok"] is False

    def test_force_cpu_noop_without_axon_env(self, monkeypatch):
        from navlab_dpe_sdr_tpu import cli
        monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
        assert cli.force_cpu_if_axon_dead() is False

    def test_force_cpu_on_dead_tunnel(self, monkeypatch, capsys):
        from navlab_dpe_sdr_tpu import cli
        monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "203.0.113.7")
        monkeypatch.setattr(cli, "_axon_tunnel_alive", lambda: False)
        calls = {"cpu": 0}
        import jax
        orig = jax.config.update

        def spy(name, value):
            if name == "jax_platforms":
                calls["cpu"] += 1
                return  # don't actually repoint the test process backend
            return orig(name, value)

        monkeypatch.setattr(jax.config, "update", spy)
        assert cli.force_cpu_if_axon_dead() is True
        assert calls["cpu"] == 1
        assert "CPU fallback" in capsys.readouterr().err
