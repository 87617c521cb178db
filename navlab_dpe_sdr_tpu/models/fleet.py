"""Multi-receiver data-parallel processing with time alignment.

The reference processes one capture file per USRP front-end with a Python
thread per receiver, then aligns their receive clocks by tracking extra
1 ms blocks on the laggards before DPE (0_Data_reduction.py:32-133,
1_Data_reduct_scalar.py:35-108). Same structure here: a fleet of
ScalarReceivers (threaded), millisecond-quantized alignment via each
receiver's navigation solution, then per-receiver DPE loops with periodic
checkpoints.
"""

from __future__ import annotations

import threading

import numpy as np


class ReceiverFleet:
    """Run N receivers over N capture files in parallel threads."""

    def __init__(self, rawfiles, prn_list, labels=None):
        from .scalar import ScalarReceiver

        self.receivers = [ScalarReceiver(rf, prn_list) for rf in rawfiles]
        self.labels = labels or [f"rx{i}" for i in range(len(rawfiles))]

    def _parallel(self, fn):
        """Run fn(rx) on every receiver concurrently; re-raise the first
        failure after all threads join."""
        errors = []

        def wrap(rx):
            try:
                fn(rx)
            except Exception as e:   # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=wrap, args=(rx,))
                   for rx in self.receivers]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]

    def acquire(self, verbose: bool = False):
        self._parallel(lambda rx: rx.acquire(verbose=verbose))

    def track(self, n_ms: int, parallel: bool = True):
        if parallel:
            self._parallel(lambda rx: rx.track(n_ms))
        else:
            for rx in self.receivers:
                rx.track(n_ms)

    def decode_ephemerides(self, verbose: bool = False):
        return [rx.decode_ephemerides(verbose=verbose)
                for rx in self.receivers]

    def align(self) -> np.ndarray:
        """Track extra 1 ms blocks on laggards so all receivers' estimated
        receive times agree to the millisecond (0_Data_reduction.py:124-133).

        Returns the per-receiver offsets applied (ms).
        """
        times = []
        for rx in self.receivers:
            rx_time_a, *_ = rx.nav_solution()
            times.append(rx_time_a)
        times = np.array(times)
        offsets = np.round((times.max() - times) * 1000.0).astype(int)
        for rx, off in zip(self.receivers, offsets):
            if off > 0:
                rx.track(int(off))
        return offsets

    def nav_solutions(self):
        return [rx.nav_solution() for rx in self.receivers]

    def run_dpe(self, n_blocks: int, grid=None, config=None,
                checkpoint_every: int = 100, checkpoint_dir=None,
                parallel: bool = True):
        """Per-receiver DPE loops (handoff taken from each receiver's own
        state), with periodic fix-array checkpoints
        (0_Data_reduction.py:175-179)."""
        from .dpe import DPEReceiver
        from .grid import spread_grid

        dpe_rxs = []
        for i, rx in enumerate(self.receivers):
            hand = rx.save_handoff(path=None)
            rx.rawfile.seek_bytes(hand.bytes_read)
            dpe_rxs.append(DPEReceiver(rx.rawfile, hand,
                                       grid=grid or spread_grid(),
                                       config=config))

        def run_one(idx_rx):
            idx, drx = idx_rx
            for b in range(n_blocks):
                drx.step()
                if checkpoint_dir and (b + 1) % checkpoint_every == 0:
                    np.save(f"{checkpoint_dir}/{self.labels[idx]}_X.npy",
                            np.stack([f.x_ecef for f in drx.fixes]))

        if parallel:
            threads = [threading.Thread(target=run_one, args=((i, d),))
                       for i, d in enumerate(dpe_rxs)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        else:
            for i, d in enumerate(dpe_rxs):
                run_one((i, d))
        return dpe_rxs
