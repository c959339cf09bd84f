"""Multi-constellation receiver: several signal pipelines, one stream.

BASELINE.md config ladder 4 (GPS + Galileo + BeiDou + GLONASS, 32
channels) — far beyond the reference, which hardcodes GPS L1 C/A. Each
constellation runs its own Receiver (own code tables, epoch length,
Doppler grids, IF) over a shared sample stream split by ``TeeSource``;
channel counts and configs are per-signal.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import ReceiverConfig
from .pipeline import Receiver
from .stream import SampleSource


class _TeeBranch:
    def __init__(self, tee: "TeeSource", idx: int):
        self._tee = tee
        self._idx = idx
        self.fs_hz = tee.source.fs_hz

    def read(self, n: int) -> Optional[np.ndarray]:
        return self._tee._read(self._idx, n)


class TeeSource:
    """Split one SampleSource into independent consumers.

    Replaces the reference's SPMC MulticastRingBuffer role at the host
    boundary (multicast_ring_buffer.rs:36-132): one producer, many
    consumers at independent positions, bounded skew enforced by the
    per-branch buffers: a branch that falls more than ``max_skew``
    samples behind the fastest consumer raises instead of buffering
    without bound (the ring-buffer analogue of an overrun).
    """

    def __init__(self, source: SampleSource, n_branches: int,
                 max_skew: int = 64_000_000):
        self.source = source
        self._buffers: list[list[np.ndarray]] = [[] for _ in range(n_branches)]
        self._eos = False
        self.max_skew = int(max_skew)

    def branch(self, idx: int) -> _TeeBranch:
        return _TeeBranch(self, idx)

    def _read(self, idx: int, n: int) -> Optional[np.ndarray]:
        buf = self._buffers[idx]
        have = sum(b.size for b in buf)
        while have < n and not self._eos:
            fresh = self.source.read(n - have)
            if fresh is None or fresh.size == 0:
                self._eos = True
                break
            for j, b in enumerate(self._buffers):
                b.append(fresh)
                if j != idx:
                    lag = sum(a.size for a in b)
                    if lag > self.max_skew:
                        raise RuntimeError(
                            f"TeeSource branch {j} lags > {self.max_skew} "
                            "samples behind branch "
                            f"{idx} (consumers diverged; raise max_skew "
                            "or drain branches at matched rates)"
                        )
            have += fresh.size
        if not buf:
            return None
        out = np.concatenate(buf) if len(buf) > 1 else buf[0]
        take, rest = out[:n], out[n:]
        buf.clear()
        if rest.size:
            buf.append(rest)
        return take if take.size else None


class MultiConstellationReceiver:
    """Round-robin stepping of per-signal receivers over one stream."""

    def __init__(self, configs: dict[str, ReceiverConfig], source: SampleSource):
        tee = TeeSource(source, len(configs))
        self.receivers: dict[str, Receiver] = {}
        for i, (name, cfg) in enumerate(configs.items()):
            self.receivers[name] = Receiver(cfg, tee.branch(i))

    def step(self) -> bool:
        alive = False
        for rx in self.receivers.values():
            alive |= rx.step()
        return alive

    def run(self, max_blocks: Optional[int] = None) -> dict:
        blocks = 0
        while (max_blocks is None or blocks < max_blocks) and self.step():
            blocks += 1
        return self.summary()

    def summary(self) -> dict:
        return {name: rx.summary() for name, rx in self.receivers.items()}
