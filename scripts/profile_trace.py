"""Device-trace the real-scan sampler chunk and print a step-budget table.

Captures a jax.profiler trace around ONE warm chunk (PROF_CHUNK solver
steps) of the bench operating point (180k points, res 0.05, grouped
classifier-free bf16 — the exact bench.py headline path), parses the
exported Chrome-trace JSON (no tensorboard/xplane_pb2 needed), and
aggregates device-side op durations into the budget buckets tracked in
BENCH_NOTES.md ("Step budget"). This is the round-2/3 methodology made
reproducible: naive wall-clock through the axon tunnel lies, device
traces do not.

Usage (on TPU):
    python scripts/profile_trace.py            # full 180k operating point
    PROF_NUM_POINTS=60000 python scripts/profile_trace.py
Outputs the per-step budget table to stdout and the raw aggregation to
/tmp/lidiff_trace/budget.json.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")
os.environ.setdefault("LIDIFF_COMPUTE_DTYPE",
                      os.environ.get("PROF_DTYPE", "bfloat16"))

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# trace parsing (Chrome trace-event JSON as exported by jax.profiler)
# ---------------------------------------------------------------------------

def load_latest_trace(log_dir: str) -> dict:
    runs = sorted(glob.glob(os.path.join(log_dir, "plugins", "profile", "*")),
                  key=os.path.getmtime)
    if not runs:
        raise FileNotFoundError(f"no profile runs under {log_dir}")
    fns = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))
    if not fns:
        raise FileNotFoundError(f"no trace.json.gz under {runs[-1]}")
    with gzip.open(fns[0], "rb") as fp:
        return json.load(fp)


def device_op_slices(trace: dict):
    """Yield (name, dur_us, ts_us, args) for complete events on the device's
    'XLA Ops' thread(s)."""
    events = trace["traceEvents"]
    proc_name: dict[int, str] = {}
    thread_name: dict[tuple[int, int], str] = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc_name[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_name.items()
                if "TPU" in n or "/device:" in n.upper() or "Device" in n}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = thread_name.get((e["pid"], e["tid"]), "")
        if "XLA Ops" not in tname:
            continue
        yield (e.get("name", ""), float(e.get("dur", 0.0)),
               float(e.get("ts", 0.0)), e.get("args", {}) or {})


# Budget buckets, first match wins. Classify on "<name>|<long_name>" —
# pallas kernels appear as fusions whose long_name carries the wrapped
# python function (conv kernels / knn / kmap live in ops/pallas_*.py).
BUCKETS = [
    ("column conv kernels", re.compile(
        r"pallas_conv|conv_columns|conv_kernel", re.I)),
    ("1-NN match kernels", re.compile(r"pallas_knn|nn_match|knn", re.I)),
    ("kernel-map builds", re.compile(r"pallas_kmap|kmap|lower_bound", re.I)),
    ("sorts (quantize+pools)", re.compile(r"sort", re.I)),
    ("XLA GEMMs", re.compile(r"\bdot\b|convolution|cublas|gemm", re.I)),
    ("scatter/gather", re.compile(r"scatter|gather", re.I)),
    ("reshapes/copies/converts", re.compile(
        r"reshape|copy|convert|transpose|bitcast|pad\b", re.I)),
    ("dynamic slice/update", re.compile(r"dynamic.?slice|dynamic.?update",
                                        re.I)),
    ("fusions (other)", re.compile(r"fusion|loop|while|select|broadcast|"
                                   r"reduce|iota|compare|add|multiply", re.I)),
]


def classify(name: str, long_name: str) -> str:
    hay = f"{name}|{long_name}"
    for bucket, rx in BUCKETS:
        if rx.search(hay):
            return bucket
    return "other"


def aggregate(trace: dict):
    """Return (bucket_totals_us, per_name, busy_us, span_us)."""
    buckets: dict[str, float] = {}
    per_name: dict[str, dict] = {}
    intervals = []
    for name, dur, ts, args in device_op_slices(trace):
        long_name = str(args.get("long_name", "")) + "|" + \
            str(args.get("tf_op", "")) + "|" + str(args.get("source", ""))
        b = classify(name, long_name)
        buckets[b] = buckets.get(b, 0.0) + dur
        # fold %fusion.123 -> %fusion, but keep buckets apart: generic
        # names (fusion/copy/...) span buckets and would otherwise show
        # one cross-bucket total under an arbitrary bucket label
        key = re.sub(r"[.\d]+$", "", name) + "@" + b
        rec = per_name.setdefault(
            key, {"us": 0.0, "count": 0, "bucket": b,
                  "example": name, "long": long_name[:160]})
        rec["us"] += dur
        rec["count"] += 1
        intervals.append((ts, ts + dur))
    # device busy time = union of op intervals; span = last end - first start
    busy = 0.0
    span = 0.0
    if intervals:
        intervals.sort()
        cs, ce = intervals[0]
        first = intervals[0][0]
        last = max(e for _, e in intervals)
        for s, e in intervals[1:]:
            if s > ce:
                busy += ce - cs
                cs, ce = s, e
            else:
                ce = max(ce, e)
        busy += ce - cs
        span = last - first
    return buckets, per_name, busy, span


def print_report(buckets, per_name, busy_us, span_us, n_steps, top=25):
    scale = 1e3 * n_steps  # us -> ms/step
    print(f"\n=== step budget (device trace over {n_steps} steps) ===")
    total = sum(buckets.values())
    for b, us in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{b:32s} {us/scale:9.1f} ms/step  ({100*us/total:5.1f}%)")
    print(f"{'TOTAL op time':32s} {total/scale:9.1f} ms/step")
    print(f"{'device busy (union)':32s} {busy_us/scale:9.1f} ms/step")
    print(f"{'trace span':32s} {span_us/scale:9.1f} ms/step "
          f"(gaps {100*(1-busy_us/max(span_us,1e-9)):.1f}%)")
    print(f"\n--- top {top} op groups ---")
    rows = sorted(per_name.items(), key=lambda kv: -kv[1]["us"])[:top]
    for key, rec in rows:
        print(f"{rec['us']/scale:8.2f} ms/step x{rec['count']:5d} "
              f"[{rec['bucket'][:14]:14s}] {key.rsplit('@', 1)[0]}")
        if rec["long"].strip("|"):
            print(f"          {rec['long'][:120]}")


# ---------------------------------------------------------------------------
# capture
# ---------------------------------------------------------------------------

def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import load_scan
    from lidiff_tpu.config import finalize_config
    from lidiff_tpu.diffusion.dpm_solver import make_dpm_solver
    from lidiff_tpu.models.diffusion import DiffusionTask
    from lidiff_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    n_points = int(os.environ.get("PROF_NUM_POINTS", 180_000))
    s_steps = int(os.environ.get("PROF_S_STEPS", 50))
    chunk = int(os.environ.get("PROF_CHUNK", 5))
    n_part = n_points // 10

    cfg = finalize_config({
        "experiment": {"id": "trace"},
        "data": {"data_dir": "", "resolution": 0.05, "dataloader": "KITTI",
                 "split": "train", "train": [], "validation": [], "test": [],
                 "num_points": n_points, "max_range": 50.0,
                 "dataset_norm": False, "std_axis_norm": False},
        "train": {"uncond_prob": 0.1, "uncond_w": 6.0, "n_gpus": 1,
                  "num_workers": 0, "max_epoch": 1, "lr": 1e-4,
                  "batch_size": 1, "decay_lr": 1e-4, "up_factor": 6},
        "diff": {"beta_start": 3.5e-5, "beta_end": 0.007,
                 "beta_func": "linear", "t_steps": 1000, "s_steps": s_steps,
                 "reg_weight": 5.0},
        "model": {"out_dim": 96},
    })
    task = DiffusionTask(cfg)
    solver = make_dpm_solver("linear", 1000, s_steps, 3.5e-5, 0.007)
    part, scan_src = load_scan(n_part)
    x_init = np.tile(part, (1, 10, 1))
    variables = task.init(jax.random.PRNGKey(0), batch_size=1,
                          n_full=2048, n_part=256)
    prepare, run_chunk, finish, n_steps = task.make_chunked_sampler(
        solver=solver, chunk=chunk)

    xi = jnp.asarray(x_init)
    pp = jnp.asarray(part)
    k = jax.random.PRNGKey(1)

    print(f"[trace] scan={scan_src} n={n_points} chunk={chunk}; warming up",
          flush=True)
    t0 = time.time()
    ctx = prepare(variables, xi, pp, k)
    ctx = run_chunk(variables, ctx, jnp.int32(0))
    jax.block_until_ready(ctx)
    print(f"[trace] warm in {time.time()-t0:.0f}s; tracing one chunk",
          flush=True)

    log_dir = os.environ.get("PROF_LOGDIR", "/tmp/lidiff_trace")
    t0 = time.time()
    jax.profiler.start_trace(log_dir)
    ctx = run_chunk(variables, ctx, jnp.int32(chunk))
    jax.block_until_ready(ctx)
    jax.profiler.stop_trace()
    wall = time.time() - t0
    print(f"[trace] chunk wall {wall:.2f}s = {wall/chunk*1e3:.0f} ms/step "
          f"(incl. trace overhead)", flush=True)

    trace = load_latest_trace(log_dir)
    buckets, per_name, busy, span = aggregate(trace)
    if not per_name:
        print("[trace] WARNING: no device 'XLA Ops' events found; "
              "dumping track names")
        for e in trace["traceEvents"][:4000]:
            if e.get("ph") == "M":
                print("  M", e.get("pid"), e.get("tid"), e.get("name"),
                      e.get("args"))
        return
    print_report(buckets, per_name, busy, span, chunk)

    out = {
        "n_points": n_points, "chunk": chunk, "scan": scan_src,
        "compute_dtype": os.environ["LIDIFF_COMPUTE_DTYPE"],
        "wall_ms_per_step": wall / chunk * 1e3,
        "busy_ms_per_step": busy / chunk / 1e3,
        "span_ms_per_step": span / chunk / 1e3,
        "buckets_ms_per_step": {b: us / chunk / 1e3
                                for b, us in buckets.items()},
        "top": [{"name": kk, **{x: rec[x] for x in
                                ("us", "count", "bucket")}}
                for kk, rec in sorted(per_name.items(),
                                      key=lambda kv: -kv[1]["us"])[:60]],
    }
    with open(os.path.join(log_dir, "budget.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    print(f"[trace] wrote {os.path.join(log_dir, 'budget.json')}")


if __name__ == "__main__":
    main()
