"""TRACKING strong-scaling probe (VERDICT r3 item 6): the
channel-sharded track_block at EQUAL TOTAL WORK for 1 vs 2 processes,
each taskset-pinned to a disjoint 2-core set (real added silicon),
gloo runtime across the process boundary — the same protocol as the
acquisition probe (tools/scaling_probe.py), applied to the
dominant-compute axis the reference scales with a rayon pool
(do_tracking.rs:364-371).

Usage: python tools/tracking_scaling_probe.py [--epochs 16] [--iters 5]
Prints a markdown scaling table for ROADMAP.md.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_WORKER = os.path.join(_HERE, "_tracking_scaling_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(n_procs: int, n_epochs: int, iters: int, out: str):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    coordinator = f"localhost:{_free_port()}" if n_procs > 1 else "-"
    pins = ["0,1", "2,3"]
    procs = [
        subprocess.Popen(
            ["taskset", "-c", pins[i], sys.executable, _WORKER,
             coordinator, str(n_procs), str(i), str(n_epochs),
             str(iters), out],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n_procs)
    ]
    for p in procs:
        log, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{log[-4000:]}")
        sys.stderr.write(log)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for n in (1, 2):
            out = os.path.join(td, f"track_{n}.json")
            rows.append(_launch(n, args.epochs, args.iters, out))

    base = rows[0]["median_s"]
    print("\n| processes (2 cores each) | ms/block | speedup |")
    print("|---|---|---|")
    for r in rows:
        sp = base / r["median_s"]
        print(f"| {r['n_procs']} | {r['median_s'] * 1e3:.1f} "
              f"| {sp:.2f}x |")
    print(f"\n(32 channels x {args.epochs} epochs, channel axis "
          f"sharded 2 devices/process, equal total work)")


if __name__ == "__main__":
    main()
