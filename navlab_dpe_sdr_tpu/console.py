"""Interactive console: flow management shell.

The reference drives CUDARecv through a readline console with
prefix-abbreviated commands (NEWFlow/LOADFlow/SETParam/STARTFlow/...,
cmdParser.cpp:28-40, cmdFlow.h:36-47) plus nested `dofile` scripts. Same
surface here over the DPE receiver:

  newflow <name> <capture> <handoff>     create a flow
  setparam <name> <key> <value>          DPEConfig override (pre-start)
  startflow <name> [blocks]              run it
  status [<name>]                        fixes/stats so far
  printport <name> <attr>                peek receiver state (rc/fi/x/...)
  dofile <script>                        run commands from a file
  quit
"""

from __future__ import annotations

import cmd
import shlex

import numpy as np


class _Flow:
    def __init__(self, capture, handoff_path):
        self.capture = capture
        self.handoff_path = handoff_path
        self.overrides = {}
        self.rx = None
        self.stats = None

    def build(self):
        from .io.handoff import read_handoff
        from .io.rawfile import SampleFile
        from .models.dpe import DPEConfig, DPEReceiver

        hand = read_handoff(self.handoff_path)
        rf = SampleFile(self.capture, fs=float(self.overrides.get("fs", 2.5e6)))
        cfg_fields = {k: v for k, v in self.overrides.items()
                      if k in DPEConfig.__dataclass_fields__}
        self.rx = DPEReceiver(rf, hand, config=DPEConfig(**cfg_fields))
        return self.rx


class Console(cmd.Cmd):
    intro = ("navlab_dpe_sdr_tpu console. Commands: newflow setparam "
             "startflow stopflow status printport dofile quit")
    prompt = "dpe> "

    def __init__(self, **kw):
        super().__init__(**kw)
        self.flows: dict[str, _Flow] = {}

    def _say(self, *args):
        print(*args, file=self.stdout)

    # -- commands ----------------------------------------------------------

    def do_newflow(self, line):
        """newflow <name> <capture.dat> <handoff.csv>"""
        try:
            name, capture, handoff = shlex.split(line)
        except ValueError:
            self._say("usage: newflow <name> <capture> <handoff>")
            return
        self.flows[name] = _Flow(capture, handoff)
        self._say(f"flow {name} created")

    def do_setparam(self, line):
        """setparam <flow> <key> <value>  (DPEConfig fields, pre-start)"""
        try:
            name, key, value = shlex.split(line)
        except ValueError:
            self._say("usage: setparam <flow> <key> <value>")
            return
        fl = self.flows.get(name)
        if not fl:
            self._say(f"no flow {name}")
            return
        for cast in (int, float):
            try:
                value = cast(value)
                break
            except ValueError:
                continue
        fl.overrides[key] = value
        self._say(f"{name}.{key} = {value}")

    def do_startflow(self, line):
        """startflow <flow> [n_blocks]"""
        parts = shlex.split(line)
        if not parts:
            self._say("usage: startflow <flow> [blocks]")
            return
        name = parts[0]
        n = int(parts[1]) if len(parts) > 1 else 100
        fl = self.flows.get(name)
        if not fl:
            self._say(f"no flow {name}")
            return
        from .runtime.flow import FlowRunner
        rx = fl.build()
        runner = FlowRunner(rx.step, watchdog_s=None, max_iterations=n)
        fl.stats = runner.run(n)
        self._say(fl.stats.summary())
        if rx.fixes:
            self._say(f"final fix {rx.fixes[-1].x_ecef[:3]}")

    def do_status(self, line):
        """status [<flow>]"""
        names = [line.strip()] if line.strip() else list(self.flows)
        for name in names:
            fl = self.flows.get(name)
            if not fl:
                self._say(f"no flow {name}")
                continue
            n = len(fl.rx.fixes) if fl.rx else 0
            self._say(f"{name}: capture={fl.capture} fixes={n} "
                  f"overrides={fl.overrides}")

    def do_printport(self, line):
        """printport <flow> <attr>  — peek receiver state (rc, fi, cp, x...)"""
        try:
            name, attr = shlex.split(line)
        except ValueError:
            self._say("usage: printport <flow> <attr>")
            return
        fl = self.flows.get(name)
        if not fl or fl.rx is None:
            self._say("flow not started")
            return
        target = fl.rx.ekf.x if attr == "x" else getattr(fl.rx, attr, None)
        if target is None:
            self._say(f"no attribute {attr}")
        else:
            self._say(np.asarray(target))

    def do_dofile(self, line):
        """dofile <script> — execute console commands from a file"""
        try:
            with open(line.strip()) as fo:
                for cmdline in fo:
                    cmdline = cmdline.strip()
                    if cmdline and not cmdline.startswith("#"):
                        self._say(f"{self.prompt}{cmdline}")
                        if self.onecmd(cmdline):
                            return True
        except OSError as e:
            self._say(e)

    def do_quit(self, line):
        """quit"""
        return True

    do_q = do_quit
    do_EOF = do_quit


def main():
    Console().cmdloop()


if __name__ == "__main__":
    main()
