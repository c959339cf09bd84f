"""Multi-process strong-scaling probe (VERDICT r2 item 7).

Measures the time-sharded PCPS acquisition at EQUAL TOTAL WORK for 1
and 2 processes, each process pinned with ``taskset`` to a disjoint
2-core set so the second process adds real silicon (the previous
emulated table oversubscribed one shared core pool, which is why it
saturated at 2.09x — that was the host's limit, not the algorithm's).

  1 process : cores 0,1           (one "host" of 2 cores)
  2 processes: cores 0,1 | 2,3    (two such hosts, gloo psum between)

Usage: python tools/scaling_probe.py [--n-int 64] [--iters 5]
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
_WORKER = os.path.join(_HERE, "_scaling_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(n_procs: int, n_int: int, iters: int, out: str):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    coordinator = f"localhost:{_free_port()}" if n_procs > 1 else "-"
    pins = ["0,1", "2,3"]
    procs = [
        subprocess.Popen(
            ["taskset", "-c", pins[i], sys.executable, _WORKER,
             coordinator, str(n_procs), str(i), str(n_int), str(iters),
             out],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n_procs)
    ]
    for p in procs:
        log, _ = p.communicate(timeout=1200)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{log[-4000:]}")
        sys.stderr.write(log)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-int", type=int, default=64,
                    help="total integration ms (global work, fixed)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    rows = []
    with tempfile.TemporaryDirectory() as td:
        for n in (1, 2):
            r = _launch(n, args.n_int, args.iters,
                        os.path.join(td, f"scale{n}.json"))
            rows.append(r)
            print(f"{n} proc(s): median {r['median_s'] * 1e3:.1f} ms "
                  f"(min {r['min_s'] * 1e3:.1f}), detected "
                  f"{r['detected_prns']}")

    base = rows[0]["median_s"]
    n_samp = args.n_int * 2046
    print("\n| processes (2 cores each) | ms/search | speedup | Msamp/s |")
    print("|---|---|---|---|")
    for r in rows:
        sp = base / r["median_s"]
        print(f"| {r['n_procs']} | {r['median_s'] * 1e3:.1f} "
              f"| {sp:.2f}x | {n_samp / r['median_s'] / 1e6:.2f} |")
    print(json.dumps({
        "metric": "strong_scaling_2proc_speedup",
        "value": round(base / rows[1]["median_s"], 3),
        "unit": "x",
        "n_int_ms": args.n_int,
    }))


if __name__ == "__main__":
    main()
