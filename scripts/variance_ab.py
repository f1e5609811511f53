"""Controlled A/B for the bench's run-to-run variance attribution
(BENCH_NOTES round 5: host-side dispatch contention on the 1-core box).

Runs the headline-only bench twice at identical settings:
  A) quiet box
  B) with a CPU hog (pure-python spin loop) competing for the single core

and prints both headline numbers plus the delta. The hypothesis (from the
round-5 trace evidence): the TPU's busy time is deterministic; the spread
seen across round-4 runs (1.595/1.884/2.192 steps/s) is the host process
being starved between chunk submissions, so the hog run should reproduce
the "slow" cluster while the quiet run sits at the packing ceiling.

Run on a quiet box: python scripts/variance_ab.py
Writes /tmp/variance_ab.json and prints a summary table.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "BENCH_INT8": "0",
    "BENCH_TRAIN": "0",
    "BENCH_REFINE": "0",
    "BENCH_REPS": "3",
    "BENCH_BUDGET_S": "900",
}


def run_bench(tag: str) -> dict:
    t0 = time.time()
    out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=ENV,
                         capture_output=True, text=True, timeout=1200)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    print(f"[{tag}] {d['value']} steps/s "
          f"(reps={d['detail'].get('rep_times_s')}, "
          f"wall={time.time() - t0:.0f}s)", flush=True)
    return d


def _spin():  # pragma: no cover - hog worker
    x = 1.0
    while True:
        x = x * 1.0000001 + 1e-9


def main():
    print("A: quiet box", flush=True)
    quiet = run_bench("quiet")

    print("B: with CPU hog (1 spin proc per core)", flush=True)
    hogs = [multiprocessing.Process(target=_spin, daemon=True)
            for _ in range(max(1, os.cpu_count() or 1))]
    for h in hogs:
        h.start()
    try:
        hog = run_bench("hog")
    finally:
        for h in hogs:
            h.terminate()

    qv, hv = quiet["value"], hog["value"]
    res = {
        "quiet_steps_per_sec": qv,
        "quiet_rep_times_s": quiet["detail"].get("rep_times_s"),
        "hog_steps_per_sec": hv,
        "hog_rep_times_s": hog["detail"].get("rep_times_s"),
        "slowdown_pct": round(100.0 * (qv - hv) / qv, 1),
    }
    with open("/tmp/variance_ab.json", "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
