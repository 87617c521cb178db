"""RF front-end subsystem: unified sample sources, rotating capture
recorder, and radio drivers.

Reference: cudarecv/guhd — multi-USRP clock/sync/tuning config
(guhd.cpp:27-60), timestamped 10-minute rotating capture files
(buffer.cpp:47-78: ``YYYYMMDD_HHMMSS_usrpN_rateKHz.dat``), and the
module-ified live source (streamblock.cu:27-79). No RF hardware exists on
TPU hosts, so the subsystem is interface-first:

- ``SampleSource``: the protocol every source implements — file, TCP,
  simulated radio, SoapySDR/UHD hardware. ``next_block() -> [S, 2] int16``
  (None on clean end), ``fs``, context-manager close.
- ``FileSource``: capture-file blocks (offline replay).
- ``SimulatedRadio``: wall-clock-paced in-process source over a backing
  sample array or capture file — the CI-testable driver that proves the
  interface under the live flow (the role guhd's streamblock plays on
  hardware).
- ``RotatingRecorder``: guhd's capture contract — timestamped filenames,
  10-minute rotation (buffer.cpp:47-78).
- ``SoapyRadio``: import-guarded SoapySDR binding (L1 front-end defaults
  from guhd.cpp: 1575.42 MHz, 50 dB gain). Exercised only where the
  library + hardware exist; everything above it is hardware-independent.
- ``open_source``/``record``: URL-style constructor + source->recorder
  pump (the ``cli record`` subcommand).
"""

from __future__ import annotations

import os
import time

import numpy as np

F_L1_HZ = 1575.42e6      # GPS L1 center (guhd.cpp L1 tuning)
DEFAULT_GAIN_DB = 50.0   # guhd.cpp gain default


class SampleSource:
    """Protocol base for block sample sources.

    Concrete sources deliver interleaved int16 I/Q as [block_samples, 2]
    arrays. ``next_block`` returns None on clean end-of-stream and raises
    TimeoutError when a live source stalls past its watchdog (the
    reference's 1.5 s fail-fast, sampleblock.cu:432-447).
    """

    fs: float
    block_samples: int

    def next_block(self) -> np.ndarray | None:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FileSource(SampleSource):
    """Capture-file block source (offline replay / recorder input)."""

    def __init__(self, path: str, fs: float, block_samples: int,
                 start_byte: int = 0):
        self.fs = float(fs)
        self.block_samples = int(block_samples)
        self._fo = open(path, "rb")
        if start_byte:
            self._fo.seek(start_byte)

    def next_block(self):
        want = self.block_samples * 4
        buf = self._fo.read(want)
        if len(buf) < want:
            return None
        return np.frombuffer(buf, np.int16).reshape(self.block_samples, 2)

    def close(self):
        self._fo.close()


class SimulatedRadio(SampleSource):
    """Wall-clock-paced radio driver over a backing sample array.

    Delivers each block no earlier than its air time (block end at
    ``start + (delivered_samples / fs)`` on the host clock), exactly the
    delivery contract of a streaming front-end (streamblock.cu:27-79 /
    RunLive, sampleblock.cu:421-426) — but in-process and CI-testable.
    ``behind_max_s`` records how far the consumer let delivery slip past
    air time (a consumer that keeps up shows ~0; the socket-backpressure
    analogue of PacedReplayServer.behind_max_s).

    samples: int16 structured/plain array or a capture path; loop=True
    wraps around (an antenna never stops); realtime=False removes the
    pacing (as-fast-as-possible, for recorder tests).
    """

    def __init__(self, samples, fs: float, block_samples: int,
                 loop: bool = False, realtime: bool = True,
                 start_byte: int = 0):
        if isinstance(samples, (str, os.PathLike)):
            samples = np.fromfile(samples, np.int16)
        samples = np.asarray(samples)
        if samples.dtype != np.int16:     # structured DTYPE_IQ16 etc.
            samples = samples.view(np.int16)
        self._iq = samples.reshape(-1, 2)[start_byte // 4:]
        self.fs = float(fs)
        self.block_samples = int(block_samples)
        self.loop = loop
        self.realtime = realtime
        self.behind_max_s = 0.0
        self.blocks_delivered = 0
        self._pos = 0
        self._t0 = None

    def next_block(self):
        n, s = self._iq.shape[0], self.block_samples
        if self._pos + s > n:
            if not self.loop or s > n:
                return None
            self._pos = 0        # wrap: restart the capture (tail dropped)
        blk = self._iq[self._pos:self._pos + s]
        self._pos += s
        self.blocks_delivered += 1
        if self.realtime:
            if self._t0 is None:
                self._t0 = time.perf_counter()
            air = self._t0 + self.blocks_delivered * s / self.fs
            now = time.perf_counter()
            if now < air:
                time.sleep(air - now)
            else:
                self.behind_max_s = max(self.behind_max_s, now - air)
        return blk


class RotatingRecorder:
    """Timestamped rotating capture writer (guhd buffer.cpp:47-78).

    Files are named ``YYYYMMDD_HHMMSS_usrpN_rateKHz.dat`` from the local
    time at file open, and a new file starts every ``rotate_s`` seconds of
    SIGNAL time (sample count / fs — the reference rotates on its sample
    clock too, so gaps in wall time never split a file). Default rotation
    10 minutes, as the reference.
    """

    def __init__(self, out_dir: str, fs: float, usrp_index: int = 0,
                 rotate_s: float = 600.0, clock=time.localtime):
        self.out_dir = out_dir
        self.fs = float(fs)
        self.usrp_index = int(usrp_index)
        self.rotate_s = float(rotate_s)
        self._clock = clock
        self.files: list[str] = []
        self._fo = None
        self._samples_in_file = 0
        os.makedirs(out_dir, exist_ok=True)

    def _open_new(self):
        if self._fo is not None:
            self._fo.close()
        stamp = time.strftime("%Y%m%d_%H%M%S", self._clock())
        rate_khz = int(round(self.fs / 1e3))
        name = f"{stamp}_usrp{self.usrp_index}_{rate_khz}KHz.dat"
        path = os.path.join(self.out_dir, name)
        # the reference rotates at 10 min so its 1 s timestamp resolution
        # never collides; sub-second rotations (tests, bursty captures)
        # get a dedup suffix rather than silently overwriting
        k = 1
        while path in self.files or os.path.exists(path):
            path = os.path.join(self.out_dir,
                                name.replace(".dat", f"_{k}.dat"))
            k += 1
        self._fo = open(path, "wb")
        self.files.append(path)
        self._samples_in_file = 0

    def write(self, block: np.ndarray):
        """Append one [S, 2] (or flat interleaved) int16 block."""
        if self._fo is None or \
                self._samples_in_file / self.fs >= self.rotate_s:
            self._open_new()
        arr = np.ascontiguousarray(block, dtype=np.int16)
        self._fo.write(arr.tobytes())
        self._samples_in_file += arr.size // 2

    def close(self):
        if self._fo is not None:
            self._fo.close()
            self._fo = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SoapyRadio(SampleSource):
    """SoapySDR hardware front-end (import-guarded; L1 defaults per
    guhd.cpp:27-60: center 1575.42 MHz, 50 dB gain, external clock
    optional). Streams CS16 into [S, 2] int16 blocks.

    Untestable in CI (no RF hardware / SoapySDR on TPU hosts); the class
    exists so a hardware deployment only swaps the constructor — every
    consumer (record pump, live flow, DPE receiver) sees SampleSource.
    """

    def __init__(self, driver_args: str, fs: float, block_samples: int,
                 center_hz: float = F_L1_HZ, gain_db: float = DEFAULT_GAIN_DB,
                 clock_source: str | None = None, channel: int = 0,
                 timeout_s: float = 1.5):
        try:
            import SoapySDR
            from SoapySDR import SOAPY_SDR_CS16, SOAPY_SDR_RX
        except ImportError as e:                      # pragma: no cover
            raise RuntimeError(
                "SoapySDR python bindings not installed; SoapyRadio needs "
                "a radio-equipped host (CI uses SimulatedRadio)") from e
        self.fs = float(fs)
        self.block_samples = int(block_samples)
        self._timeout_us = int(timeout_s * 1e6)
        self._dev = SoapySDR.Device(driver_args)      # pragma: no cover
        if clock_source:                              # pragma: no cover
            self._dev.setClockSource(clock_source)    # guhd external 10 MHz
        self._dev.setSampleRate(SOAPY_SDR_RX, channel, self.fs)
        self._dev.setFrequency(SOAPY_SDR_RX, channel, center_hz)
        self._dev.setGain(SOAPY_SDR_RX, channel, gain_db)
        self._stream = self._dev.setupStream(SOAPY_SDR_RX, SOAPY_SDR_CS16,
                                             [channel])
        self._dev.activateStream(self._stream)
        self._buf = np.empty(self.block_samples * 2, np.int16)

    def next_block(self):                             # pragma: no cover
        got = 0
        while got < self.block_samples:
            view = self._buf[2 * got:]
            sr = self._dev.readStream(self._stream, [view],
                                      self.block_samples - got,
                                      timeoutUs=self._timeout_us)
            if sr.ret == 0 or getattr(sr, "flags", 0) < 0:
                raise TimeoutError("radio stream stalled")
            if sr.ret < 0:
                raise RuntimeError(f"readStream error {sr.ret}")
            got += sr.ret
        return self._buf.reshape(self.block_samples, 2)

    def close(self):                                  # pragma: no cover
        try:
            self._dev.deactivateStream(self._stream)
            self._dev.closeStream(self._stream)
        except Exception:
            pass


def open_source(url: str, fs: float, block_samples: int,
                start_byte: int = 0, timeout_s: float = 1.5,
                loop: bool = False) -> SampleSource:
    """URL-style source constructor unifying every front-end:

    - ``path/to/capture.dat``      -> FileSource
    - ``sim://path/to/capture.dat``-> SimulatedRadio (wall-clock paced)
    - ``tcp://host:port``          -> TCP sample stream (netsource)
    - ``soapy://driver=...``       -> SoapyRadio hardware (when present)
    """
    if url.startswith("sim://"):
        return SimulatedRadio(url[6:], fs, block_samples, loop=loop,
                              start_byte=start_byte)
    if url.startswith("tcp://"):
        from .netsource import open_tcp_source
        host, port = url[6:].rsplit(":", 1)
        return open_tcp_source(host, int(port), block_samples,
                               timeout_s=timeout_s, start_byte=start_byte)
    if url.startswith("soapy://"):
        return SoapyRadio(url[8:], fs, block_samples,
                          timeout_s=timeout_s)
    return FileSource(url, fs, block_samples, start_byte=start_byte)


def record(source: SampleSource, recorder: RotatingRecorder,
           seconds: float | None = None, on_block=None) -> int:
    """Pump a source into the rotating recorder (the guhd main loop,
    guhd.cpp + buffer.cpp). Returns blocks written. ``on_block`` is an
    optional per-block callback (progress / live fan-out)."""
    n_blocks = (int(round(seconds * source.fs / source.block_samples))
                if seconds is not None else None)
    done = 0
    while n_blocks is None or done < n_blocks:
        blk = source.next_block()
        if blk is None:
            break
        recorder.write(blk)
        done += 1
        if on_block is not None:
            on_block(done, blk)
    return done
