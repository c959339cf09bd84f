"""Receiver checkpoint / resume.

The reference has no persistence at all (SURVEY.md section 5
"Checkpoint/resume: None"). Here the entire receiver state — the
device-resident tracking pytree, the rolling sample window, channel
lifecycle maps, search-scheduler pacing, front-end conditioning state,
and the per-channel nav decoding chains — serializes to one file, and a
restored receiver continues the stream deterministically (gated by
tests/test_checkpoint.py: resumed telemetry equals uninterrupted
telemetry).

The caller owns source positioning: resume the sample source at
``consumed_samples()`` input samples (the checkpoint stores the output
position; multiply by the front-end decimation for raw-stream seeks).

SECURITY: checkpoints are pickle files — loading one executes whatever
the file says. Restore only checkpoints you wrote yourself (trusted
paths); never load a checkpoint received from an untrusted source.
"""
from __future__ import annotations

import pickle
from typing import TYPE_CHECKING, Any

import numpy as np

if TYPE_CHECKING:  # deferred: utils must stay importable from receiver
    from ..receiver.pipeline import Receiver

FORMAT_VERSION = 2  # 2: planar window_re/window_im replace window_buf


def receiver_state(rx: "Receiver") -> dict[str, Any]:
    """Snapshot everything needed to resume ``rx`` (host-side pytree)."""
    return {
        "version": FORMAT_VERSION,
        "tracking": {
            name: np.asarray(leaf)
            for name, leaf in rx.state._asdict().items()
        },
        "window_re": np.array(rx.window.re, np.float32, copy=True),
        "window_im": np.array(rx.window.im, np.float32, copy=True),
        "window_global_start": rx.window.global_start,
        "blocks_fed": rx.window.blocks_fed,
        "time_ms": rx.time_ms,
        "active": dict(rx.active),
        "scheduler": {
            "mode": rx.scheduler.mode,
            "last_run_ms": rx.scheduler.last_run_ms,
        },
        "frontend": (
            np.uint32(rx._fe_phase),
            np.float32(rx._fe_bias_re),
            np.float32(rx._fe_bias_im),
        ),
        "nav": pickle.dumps(rx.nav),
        "telemetry": pickle.dumps(rx.telemetry),
        "acq_events": list(rx.acq_events),
    }


def save(rx: "Receiver", path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(receiver_state(rx), f)


def restore(rx: "Receiver", path: str) -> "Receiver":
    """Load a checkpoint into a freshly constructed Receiver (same
    config; source positioned by the caller). Returns ``rx``."""
    from ..receiver import tracking as trk

    with open(path, "rb") as f:
        snap = pickle.load(f)
    if snap["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {snap['version']}")
    rx.state = trk.ChannelState(**{
        k: np.asarray(v) for k, v in snap["tracking"].items()
    })
    rx.window.load(snap["window_re"], snap["window_im"])
    rx.window.global_start = snap["window_global_start"]
    rx.window.blocks_fed = snap["blocks_fed"]
    rx.time_ms = snap["time_ms"]
    rx.active = dict(snap["active"])
    rx.scheduler.mode = snap["scheduler"]["mode"]
    rx.scheduler.last_run_ms = snap["scheduler"]["last_run_ms"]
    rx._fe_phase, rx._fe_bias_re, rx._fe_bias_im = snap["frontend"]
    rx.nav = pickle.loads(snap["nav"])
    rx.telemetry = pickle.loads(snap["telemetry"])
    rx.acq_events = list(snap["acq_events"])
    return rx


def consumed_samples(rx: "Receiver") -> int:
    """Output-rate samples the receiver has consumed from its source
    (multiply by the decimation factor for raw input samples)."""
    return rx.window.blocks_fed * rx.window.b
