"""Sample sources and the host-side streaming window.

Replaces the reference's device/ingest stack — SoapySDR trait + reader
thread + SPSC ring + SPMC multicast ring (reference:
src/sdr_store/sdr_wrapper.rs:51-202, sdr_thread.rs:9-37,
src/utilities/multicast_ring_buffer.rs) — with a pull-based
``SampleSource`` protocol and one host-resident rolling window that is
shipped to the device once per block. TPUs cannot talk USB, so live-SDR
ingest is an I/O boundary (SURVEY.md section 2 note); the file and
synthetic sources implement the same protocol a SoapySDR shim would.

The absolute-sample-index time base of the reference's multicast ring
(multicast_ring_buffer.rs:103-105) is preserved as
``StreamWindow.global_start`` — a host-side Python int (unbounded), while
device offsets stay block-relative int32.
"""
from __future__ import annotations

from typing import Optional, Protocol, Sequence

import numpy as np

from ..models.signal import SatelliteScenario, synthesize


class SampleSource(Protocol):
    """Pull-based complex-sample source."""

    fs_hz: float

    def read(self, n: int) -> Optional[np.ndarray]:
        """Return up to ``n`` complex64 samples, or None at end-of-stream."""
        ...


class FileSource:
    """Reads IQ captures from disk.

    Formats (``SdrConfig.file_format``):
      * ``int8_real`` — the bundled-capture wire format: one int8 per real
        sample at IF (reference do_acquisition.rs:420-424)
      * ``int8_iq``   — interleaved int8 I,Q pairs (RTL-SDR style, after
        the reference's deinterleave at frontend.rs:34-40)
      * ``f32_iq``    — interleaved float32 I,Q pairs
    """

    def __init__(self, path: str, fs_hz: float, file_format: str = "int8_real"):
        self.fs_hz = fs_hz
        self.format = file_format
        self._f = open(path, "rb")

    def read(self, n: int) -> Optional[np.ndarray]:
        if self.format == "int8_real":
            raw = np.frombuffer(self._f.read(n), dtype=np.int8)
            if raw.size == 0:
                return None
            return raw.astype(np.float32).astype(np.complex64)
        if self.format == "int8_iq":
            raw = np.frombuffer(self._f.read(2 * n), dtype=np.int8)
            if raw.size < 2:
                return None
            raw = raw[: (raw.size // 2) * 2].astype(np.float32)
            return (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
        if self.format == "f32_iq":
            raw = np.frombuffer(self._f.read(8 * n), dtype=np.float32)
            if raw.size < 2:
                return None
            raw = raw[: (raw.size // 2) * 2]
            return (raw[0::2] + 1j * raw[1::2]).astype(np.complex64)
        raise ValueError(f"unknown file format {self.format!r}")

    def close(self):
        self._f.close()


class SyntheticSource:
    """Streams the synthetic oracle scene with exact phase continuity."""

    def __init__(
        self,
        sats: Sequence[SatelliteScenario],
        fs_hz: float,
        f_if_hz: float = 0.0,
        noise_std: float = 0.0,
        seed: int = 0,
        total_samples: Optional[int] = None,
    ):
        self.fs_hz = fs_hz
        self.sats = list(sats)
        self.f_if_hz = f_if_hz
        self.noise_std = noise_std
        self.seed = seed
        self.total = total_samples
        self._pos = 0

    def read(self, n: int) -> Optional[np.ndarray]:
        if self.total is not None:
            n = min(n, self.total - self._pos)
            if n <= 0:
                return None
        out = synthesize(
            self.sats, n, self.fs_hz,
            f_if_hz=self.f_if_hz, noise_std=self.noise_std,
            # per-chunk seed keeps noise i.i.d. across chunks yet
            # deterministic for a given stream position
            seed=self.seed + self._pos,
            start_sample=self._pos,
        )
        self._pos += n
        return out


class ArraySource:
    """Wraps an in-memory array (the mock-device role of the reference's
    MockDevice, src/sdr_mock/device_mock.rs:7-69)."""

    def __init__(self, samples: np.ndarray, fs_hz: float):
        self.fs_hz = fs_hz
        self._samples = np.asarray(samples, dtype=np.complex64)
        self._pos = 0

    def read(self, n: int) -> Optional[np.ndarray]:
        if self._pos >= self._samples.size:
            return None
        out = self._samples[self._pos:self._pos + n]
        self._pos += out.size
        return out


class DeviceArraySource:
    """In-memory source pre-staged in DEVICE memory (planar f32).

    Uploads the whole stream to the accelerator once at construction;
    ``read`` returns device-resident ``(re, im)`` slices at zero
    per-block transfer cost. Pairs with ``DeviceStreamWindow`` for a
    fully device-resident streaming path — the configuration that shows
    the receiver's compute capacity when the host<->device link is slow
    (remote transports), and the replay/simulation source for
    device-side closed-loop testing."""

    def __init__(self, samples, fs_hz: float, store: str = "f32"):
        import jax.numpy as jnp

        self.fs_hz = fs_hz
        if isinstance(samples, tuple):
            re, im = samples
        else:
            samples = np.asarray(samples)
            re = np.real(samples).astype(np.float32)
            im = np.imag(samples).astype(np.float32)
        if store == "int8":
            # 8-bit staging: 4x less upload (the RTL-SDR wire format IS
            # 8-bit I/Q, rtl_sdr.rs:126-142 — this is the authentic
            # quantization, not a benchmark shortcut); dequantized on
            # device per read. +/-4 sigma maps to full scale.
            sigma = float(max(np.std(re), np.std(im), 1e-12))
            self._scale = np.float32(4.0 * sigma / 127.0)
            q = lambda x: np.clip(  # noqa: E731
                np.round(x / self._scale), -127, 127).astype(np.int8)
            self._re = jnp.asarray(q(re))
            self._im = jnp.asarray(q(im))
        elif store == "f32":
            self._scale = None
            self._re = jnp.asarray(re)
            self._im = jnp.asarray(im)
        else:
            raise ValueError(f"unknown store {store!r}")
        self._n = int(self._re.shape[0])
        self._pos = 0

    def read(self, n: int):
        import jax.numpy as jnp

        if self._pos >= self._n:
            return None
        end = min(self._pos + n, self._n)
        re = self._re[self._pos:end]
        im = self._im[self._pos:end]
        if self._scale is not None:
            re = re.astype(jnp.float32) * self._scale
            im = im.astype(jnp.float32) * self._scale
        self._pos = end
        return (re, im)


class StreamingDeviceSource:
    """Double-buffered async host->device ingest (SURVEY section 7
    "streaming vs jit" hard part; reference analogue: the SDR reader
    thread feeding the ring, sdr_thread.rs:9-37).

    A feeder thread pulls blocks from a host ``SampleSource``, stages
    them (optionally int8-quantized — the authentic RTL-SDR wire
    precision), and issues ``jax.device_put`` ahead of the consumer,
    keeping ``depth`` blocks in flight. ``read`` then hands the
    receiver a device-resident planar pair whose upload already
    happened (or is in flight) while the device was computing the
    previous block — the device never stalls on host ingest as long as
    the producer keeps up. ``jax.device_put`` is async: enqueuing the
    transfer costs microseconds and the copy overlaps compute.

    Constraints: the consumer must call ``read`` with a consistent
    block size (the Receiver does — one block per step); the feeder
    reads ahead of the consumer by up to ``depth`` blocks, so a
    lock-step source that must not run ahead (live hardware with tight
    buffers) should choose ``depth`` accordingly.
    """

    def __init__(self, source, depth: int = 3, store: str = "int8"):
        if store not in ("int8", "f32"):
            raise ValueError(f"unknown store {store!r}")
        self.fs_hz = source.fs_hz
        self._source = source
        self._depth = depth
        self._store = store
        self._queue = None
        self._thread = None
        self._block_n = None
        self._stopping = False
        # overlap accounting (the architectural claim this class makes:
        # the feeder stays AHEAD so the consumer never blocks on
        # ingest). consumer_wait_s accumulates time read() spent
        # blocked on an empty queue AFTER the first block (cold fill is
        # pipeline latency, not a stall); depth_sum/depth_n give the
        # mean queue depth observed at read time.
        self.reads = 0
        self.consumer_wait_s = 0.0
        self.cold_wait_s = 0.0
        self.max_queue_depth = 0
        self._depth_sum = 0
        self._depth_n = 0

    def _stage(self, raw):
        import jax

        if isinstance(raw, tuple):
            re, im = raw
            re = np.asarray(re, np.float32)
            im = np.asarray(im, np.float32)
        else:
            re = np.ascontiguousarray(np.real(raw), dtype=np.float32)
            im = np.ascontiguousarray(np.imag(raw), dtype=np.float32)
        if self._store == "int8":
            # PER-CHUNK scale (shipped with the chunk): a global scale
            # frozen from the first block would lock onto a silent/
            # settling stream start and clip every later real-signal
            # sample to numeric dust
            sigma = float(max(np.std(re), np.std(im), 1e-12))
            scale = np.float32(4.0 * sigma / 127.0)
            q = lambda x: np.clip(  # noqa: E731
                np.round(x / scale), -127, 127).astype(np.int8)
            return (jax.device_put(q(re)), jax.device_put(q(im)),
                    re.shape[0], scale)
        return (jax.device_put(re), jax.device_put(im), re.shape[0],
                None)

    def _put(self, item) -> bool:
        """Bounded put that yields to close(): the consumer may stop
        reading mid-stream and the feeder must not block forever."""
        import queue as _q

        while not self._stopping:
            try:
                self._queue.put(item, timeout=0.2)
                return True
            except _q.Full:
                continue
        return False

    def _feeder(self):
        while not self._stopping:
            raw = self._source.read(self._block_n)
            if raw is None:
                self._put(None)
                return
            size = raw[0].shape[0] if isinstance(raw, tuple) else raw.size
            if size == 0:
                self._put(None)
                return
            if not self._put(self._stage(raw)):
                return
            if size < self._block_n:
                self._put(None)   # short tail = end of stream
                return

    def read(self, n: int):
        import queue as _q
        import threading

        import jax.numpy as jnp

        if self._thread is None:
            self._block_n = n
            self._queue = _q.Queue(maxsize=self._depth)
            self._thread = threading.Thread(target=self._feeder,
                                            daemon=True)
            self._thread.start()
        if n != self._block_n:
            raise ValueError(
                f"StreamingDeviceSource block size changed: "
                f"{self._block_n} -> {n}")
        import time as _time

        d = self._queue.qsize()
        self.max_queue_depth = max(self.max_queue_depth, d)
        self._depth_sum += d
        self._depth_n += 1
        t0 = _time.perf_counter()
        item = self._queue.get()
        wait = _time.perf_counter() - t0
        if self.reads == 0:
            self.cold_wait_s += wait
        else:
            self.consumer_wait_s += wait
        self.reads += 1
        if item is None:
            return None
        re, im, size, scale = item
        if scale is not None:
            re = re.astype(jnp.float32) * scale
            im = im.astype(jnp.float32) * scale
        if size < self._block_n:
            re = re[:size]
            im = im[:size]
        return (re, im)

    def stats(self) -> dict:
        """Overlap counters: did the feeder actually keep the device
        fed? consumer_wait_s ~ 0 and mean_queue_depth > 0 mean the
        upload pipeline stayed ahead of the consumer; a large
        consumer_wait_s attributes a slow streamed RTF to the ingest
        LINK, not to a stalled feeder design."""
        return {
            "reads": self.reads,
            "consumer_wait_s": round(self.consumer_wait_s, 4),
            "cold_fill_s": round(self.cold_wait_s, 4),
            "max_queue_depth": self.max_queue_depth,
            "mean_queue_depth": round(
                self._depth_sum / max(self._depth_n, 1), 2),
        }

    def close(self):
        # signal the feeder (its bounded _put observes the flag), then
        # join with a bounded wait — close() can never hang, even on
        # an unbounded live source with the consumer stopped early
        self._stopping = True
        if self._thread is not None:
            self._thread.join(timeout=5.0)


class StreamWindow:
    """Rolling history+block sample window fed to the device each step.

    Layout: ``[history | block]`` of ``h + b`` samples. ``advance()``
    rolls the block into history and appends fresh samples; short final
    blocks are zero-padded and reported so the pipeline can mask them.

    Storage is PLANAR float32 (``re``/``im``): every on-device consumer
    (conv acquisition, all tracking paths) wants planar f32, so keeping
    the window complex forced two full-window ``np.real``/``np.imag``
    copies per block. The ``buf`` property materializes the complex view
    for the (host/CPU) FFT acquisition path and diagnostics.
    """

    def __init__(self, history: int, block: int):
        self.h = history
        self.b = block
        self.re = np.zeros(history + block, dtype=np.float32)
        self.im = np.zeros(history + block, dtype=np.float32)
        self.global_start = -history  # global index of buf[0]
        self.blocks_fed = 0

    @property
    def buf(self) -> np.ndarray:
        """Complex view of the window (materialized on access)."""
        return (self.re + 1j * self.im).astype(np.complex64)

    def advance(self, fresh) -> Optional[int]:
        """Roll in one block of samples; returns the valid sample count,
        or None at end-of-stream. ``fresh``: complex array or an
        ``(re, im)`` planar float32 pair."""
        if fresh is None:
            return None
        if isinstance(fresh, tuple):
            fre, fim = fresh
        elif fresh.size == 0:
            return None
        else:
            fre = np.real(fresh).astype(np.float32)
            fim = np.imag(fresh).astype(np.float32)
        n = int(fre.size)
        if n == 0:
            return None
        h, b = self.h, self.b
        for buf, f in ((self.re, fre), (self.im, fim)):
            buf[:h] = buf[b:b + h].copy()
            buf[h:] = 0.0
            buf[h:h + n] = f
        self.global_start += self.b
        self.blocks_fed += 1
        return n

    def load(self, re: np.ndarray, im: np.ndarray) -> None:
        """Overwrite the window contents (checkpoint restore)."""
        self.re[:] = re
        self.im[:] = im

    def to_global(self, local_index: int) -> int:
        return self.global_start + local_index

    def to_local(self, global_index: int) -> int:
        return global_index - self.global_start


class DeviceStreamWindow:
    """Device-resident rolling window (same surface as StreamWindow).

    On an accelerator backend, keeping the history+block window in host
    memory forces a full-window upload every block; over a remote
    device transport (the axon tunnel) that transfer dominates the
    whole receiver. Here the window lives on the device: ``advance()``
    uploads only the FRESH block (or accepts device-resident fresh
    samples from a device source at zero transfer cost) and rolls the
    window with one jitted concatenate. ``re``/``im`` are jax arrays;
    every downstream consumer (conv acquisition, all tracking paths)
    takes them without a host round trip.
    """

    def __init__(self, history: int, block: int):
        import jax
        import jax.numpy as jnp

        self.h = history
        self.b = block
        self.re = jnp.zeros(history + block, jnp.float32)
        self.im = jnp.zeros(history + block, jnp.float32)
        self.global_start = -history
        self.blocks_fed = 0
        b = block

        @jax.jit
        def _roll(old_re, old_im, fre, fim):
            return (jnp.concatenate([old_re[b:], fre]),
                    jnp.concatenate([old_im[b:], fim]))

        self._roll = _roll

    @property
    def buf(self) -> np.ndarray:
        """Complex numpy view (downloads; diagnostics/checkpoint only)."""
        return (np.asarray(self.re) + 1j * np.asarray(self.im)).astype(
            np.complex64)

    def advance(self, fresh) -> Optional[int]:
        import jax.numpy as jnp

        if fresh is None:
            return None
        if isinstance(fresh, tuple):
            fre, fim = fresh
        elif fresh.size == 0:
            return None
        else:
            fre = np.real(fresh).astype(np.float32)
            fim = np.imag(fresh).astype(np.float32)
        n = int(fre.shape[0])
        if n == 0:
            return None
        if n < self.b:
            # short tail block: zero-pad (host-side if numpy)
            if isinstance(fre, np.ndarray):
                fre = np.pad(fre, (0, self.b - n))
                fim = np.pad(fim, (0, self.b - n))
            else:
                fre = jnp.pad(fre, (0, self.b - n))
                fim = jnp.pad(fim, (0, self.b - n))
        self.re, self.im = self._roll(
            self.re, self.im, jnp.asarray(fre), jnp.asarray(fim))
        self.global_start += self.b
        self.blocks_fed += 1
        return n

    def load(self, re, im) -> None:
        import jax.numpy as jnp

        # device arrays pass straight through (the scan path reloads
        # the window from a device-resident span every k blocks — a
        # host round trip here would defeat it)
        self.re = jnp.asarray(re, jnp.float32)
        self.im = jnp.asarray(im, jnp.float32)

    def to_global(self, local_index: int) -> int:
        return self.global_start + local_index

    def to_local(self, global_index: int) -> int:
        return global_index - self.global_start
