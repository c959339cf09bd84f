"""Telemetry accumulation and C/N0 estimation.

Observability surface matching (and exceeding) the reference's legacy
TrackingResult / NavigationView telemetry
(reference: src/tracking/tracking_bk.rs:24-43, src/view.rs:16-35): every
epoch's six correlators, loop errors, frequencies and lock state are
kept per channel, host-side, for decoding, plotting, and C/N0.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ChannelTrace:
    """Per-channel epoch-indexed history (numpy, host)."""

    prn: int
    epoch_index: list = dataclasses.field(default_factory=list)
    global_sample: list = dataclasses.field(default_factory=list)
    i_p: list = dataclasses.field(default_factory=list)
    q_p: list = dataclasses.field(default_factory=list)
    i_e: list = dataclasses.field(default_factory=list)
    q_e: list = dataclasses.field(default_factory=list)
    i_l: list = dataclasses.field(default_factory=list)
    q_l: list = dataclasses.field(default_factory=list)
    carr_freq: list = dataclasses.field(default_factory=list)
    code_rate: list = dataclasses.field(default_factory=list)
    locked: list = dataclasses.field(default_factory=list)

    def prompt(self) -> tuple[np.ndarray, np.ndarray]:
        return np.asarray(self.i_p), np.asarray(self.q_p)

    def cn0_dbhz(self, coherent_s: float = 1e-3, window: int = 50) -> Optional[float]:
        """Narrowband/wideband power-ratio C/N0 estimate over the last
        ``window`` epochs (standard M of 20-ms NWPR estimator simplified
        to prompt-power statistics)."""
        i_p, q_p = self.prompt()
        if i_p.size < window:
            return None
        i_p, q_p = i_p[-window:], q_p[-window:]
        p_tot = np.mean(i_p**2 + q_p**2)
        p_sig = np.mean(np.abs(i_p)) ** 2
        p_noise = max(p_tot - p_sig, 1e-12)
        snr = p_sig / p_noise
        return float(10.0 * np.log10(max(snr, 1e-12) / coherent_s))


class TelemetryLog:
    """Accumulates device [T, C] telemetry blocks into per-channel traces."""

    def __init__(self, n_channels: int):
        self.n_channels = n_channels
        self.traces: dict[int, ChannelTrace] = {}   # channel -> live trace
        self.closed: list[ChannelTrace] = []

    def open_channel(self, channel: int, prn: int) -> None:
        if channel in self.traces:
            self.closed.append(self.traces[channel])
        self.traces[channel] = ChannelTrace(prn=prn)

    def close_channel(self, channel: int) -> None:
        if channel in self.traces:
            self.closed.append(self.traces.pop(channel))

    def append_block(self, telem, window_global_start: int) -> None:
        """``telem``: EpochTelemetry of [T, C] arrays for one block."""
        processed = np.asarray(telem.processed)
        fields = {
            name: np.asarray(getattr(telem, name))
            for name in (
                "i_p", "q_p", "i_e", "q_e", "i_l", "q_l",
                "carr_freq", "code_rate", "locked",
                "start_offset", "epoch_index",
            )
        }
        for ch, trace in self.traces.items():
            rows = np.where(processed[:, ch])[0]
            if rows.size == 0:
                continue
            # column-wise C-level extends, not a python loop per epoch
            trace.epoch_index.extend(
                fields["epoch_index"][rows, ch].astype(int).tolist())
            trace.global_sample.extend(
                (window_global_start
                 + fields["start_offset"][rows, ch].astype(np.int64))
                .tolist())
            for name in ("i_p", "q_p", "i_e", "q_e", "i_l", "q_l",
                         "carr_freq", "code_rate"):
                getattr(trace, name).extend(
                    fields[name][rows, ch].astype(float).tolist())
            trace.locked.extend(
                fields["locked"][rows, ch].astype(bool).tolist())

    def all_traces(self) -> list[ChannelTrace]:
        return list(self.traces.values()) + self.closed
