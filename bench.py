"""Benchmark: denoise steps/sec/chip on the flagship completion workload.

Measures the full classifier-free denoise step on the REFERENCE DEMO SCAN
(/root/reference/lidiff/Datasets/test/000123.ply, the pipeline input of
README.md:93-99; synthetic fallback when absent) at the reference operating
point (num_points=180000, res 0.05, 50-step DPM-Solver++(2M,SDE)): per-step
re-voxelization + classifier-free conditional-UNet forwards + solver
update, jitted as chunked lax.scans. Prints ONE JSON line, including model
FLOPs/step and MFU against the chip's peak.

Timeout-proof by construction: the headline (bf16 sampler) is measured
FIRST and the result dict is kept up to date after every phase; a watchdog
thread emits the JSON just before the internal budget (BENCH_BUDGET_S,
default 520 s) expires, and SIGTERM/SIGINT handlers emit it immediately if
an external `timeout` fires — so a slow extra phase (int8 / train / refine
compile) can never forfeit the headline. Extra phases are skipped when the
remaining budget is too small and recorded in detail.skipped_phases.

Primary tracked metric: steps/s AND MFU. NOTE the nominal north star
(50 steps/s at 9.147 TFLOP/step = 457 TFLOP/s) exceeds this chip's bf16
peak (v5e, 197 TFLOP/s) by 2.3x — unreachable without cutting model
FLOPs/step; see BENCH_NOTES.md "Ceiling analysis". vs_baseline is kept at
steps_per_sec/50 for continuity across rounds.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

os.environ.setdefault("LIDIFF_MATMUL_PRECISION", "default")  # MXU fast path
# bf16 conv compute: halves gather/window HBM traffic and runs the fused
# Pallas conv's selector GEMMs at full MXU rate; parity with f32 is
# covered by tests/test_models.py::test_bf16_compute_path_close_to_f32 and
# end-to-end by QUALITY_r04.json (CD/IoU parity vs f32 on the same seeds)
os.environ.setdefault("LIDIFF_COMPUTE_DTYPE", "bfloat16")

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 520))
# minimum remaining budget required to START an extra phase (compile can
# be slow cold through the tunnel; warm-cache runs need far less)
EXTRA_MIN_S = float(os.environ.get("BENCH_EXTRA_MIN_S", 150))

_lock = threading.Lock()
_result: dict | None = None
_emitted = False
_emit_on_headline = False  # watchdog expired before the headline landed
_phase_note = "importing"  # coarse progress, for the killed-early placeholder

REF_SCAN = "/root/reference/lidiff/Datasets/test/000123.ply"


def _remaining() -> float:
    return BUDGET_S - (time.time() - _T0)


def _status(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def _emit_locked() -> bool:
    global _emitted
    if _emitted or _result is None:
        return _emitted
    _result["detail"]["elapsed_total_s"] = round(time.time() - _T0, 1)
    print(json.dumps(_result), flush=True)
    _emitted = True
    return True


def _emit_and_exit(code: int = 0) -> None:
    global _result
    with _lock:
        if _result is None:
            # killed before the headline landed (e.g. the driver's timeout
            # beat a cold compile): a diagnostic zero row parses, a silent
            # death does not (round-3 failure mode: rc=124, parsed null)
            _result = {
                "metric": "denoise_steps_per_sec_chip",
                "value": 0.0,
                "unit": "steps/s",
                "vs_baseline": 0.0,
                "detail": {"partial": True,
                           "killed_during": _phase_note,
                           "note": "killed before the headline measurement "
                                   "completed; see BENCH_NOTES.md for the "
                                   "last full-run numbers"},
            }
        ok = _emit_locked()
    os._exit(code if ok else 1)


def _on_signal(signum, frame):  # pragma: no cover - signal path
    _status(f"signal {signum}: emitting best-available result")
    _emit_and_exit(0)


_done_evt = threading.Event()


def _watchdog():  # pragma: no cover - timing path
    global _emit_on_headline
    while True:
        left = _remaining()
        if _done_evt.wait(timeout=max(0.0, left - 5.0)):
            return
        with _lock:
            if _result is not None:
                _status("budget expired: emitting current result")
                _emit_locked()
                os._exit(0)
            _emit_on_headline = True
        _status("budget expired before headline; will emit when it lands")
        if _done_evt.wait(timeout=60.0):
            return


def load_scan(n_part: int):
    """Reference demo scan, preprocessed like DiffCompletion.preprocess_scan
    (crop 3.5-50 m, FPS to n_part; diff_completion_pipeline.py:92-105).
    Falls back to a synthetic ring scan when the reference tree is absent."""
    if os.path.exists(REF_SCAN):
        from lidiff_tpu.ops.fps import fps
        from lidiff_tpu.utils.ply import read_ply
        pts = read_ply(REF_SCAN)["points"].astype(np.float32)
        d = np.linalg.norm(pts, axis=1)
        pts = pts[(d > 3.5) & (d < 50.0)]
        cache = f"/tmp/bench_scan_{n_part}.npy"
        if os.path.exists(cache):
            part = np.load(cache)
        else:
            part = fps(pts, n_part).astype(np.float32)
            np.save(cache, part)
        return part[None], "000123.ply"
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, n_part)
    el = rng.choice(np.linspace(-0.4, 0.05, 64), n_part)
    r = rng.uniform(3.5, 50.0, n_part)
    part = np.stack([r * np.cos(az) * np.cos(el),
                     r * np.sin(az) * np.cos(el),
                     r * np.sin(el)], -1).astype(np.float32)
    return part[None], "synthetic-rings"


def step_flops(full_caps, part_caps, out_dim=96, cr=1.0):
    """Model FLOPs of ONE classifier-free denoise step (2 denoiser passes +
    solver; the partial encoder runs once per completion, not per step).
    Counted from the channel plan (CS, minkunet.py) and static capacities:
    conv FLOPs = 2 * V_out * taps * Cin * Cout, plus gate/head GEMMs."""
    cs = [int(cr * c) for c in
          (32, 32, 64, 128, 256, 256, 128, 96, 96)]
    V = list(full_caps)
    f = 0.0
    # stem: 3->cs0, cs0->cs0 at L0 (27 taps)
    f += 2 * V[0] * 27 * (3 * cs[0] + cs[0] * cs[0])
    for i in range(4):      # down stages
        cin, cout = cs[i], cs[i + 1]
        f += 2 * V[i + 1] * 8 * cin * cin            # down conv ks=2
        f += 2 * 2 * V[i + 1] * 27 * cout * cout     # 2 res blocks (2 convs)
        if cin != cout:
            f += 2 * V[i + 1] * cin * cout           # shortcut 1x1
    ups = [(cs[4], cs[5], 3), (cs[5], cs[6], 2), (cs[6], cs[7], 1),
           (cs[7], cs[8], 0)]
    for cin, cout, lvl in ups:
        skip = cs[lvl + 1] if lvl >= 0 else cs[0]
        f += 2 * V[lvl] * 8 * cin * cout             # transpose conv
        f += 2 * V[lvl] * 27 * (cout + skip) * cout  # res conv 1 (concat in)
        f += 2 * V[lvl] * 27 * cout * cout           # res conv 2
        f += 2 * V[lvl] * (cout + skip) * cout       # shortcut
    # gates: latent (c4->c4->c4), temp, latemp per stage (9 gates), on V[l]
    c4 = cs[4]
    gate_levels = [0, 1, 2, 3, 4, 3, 2, 1, 0]
    gate_out = [cs[0], cs[1], cs[2], cs[3], cs[4], cs[5], cs[6], cs[7],
                cs[8]]
    for lvl, go in zip(gate_levels, gate_out):
        f += 2 * V[lvl] * (c4 * c4 * 2)              # latent MLP
        f += 2 * V[lvl] * (2 * c4 * c4 + c4 * go)    # latemp MLP (approx)
    # per-point head on N points
    return 2.0 * f        # two denoiser passes per classifier-free step


def main():
    global _result, _emit_on_headline, _phase_note
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    wd = threading.Thread(target=_watchdog, daemon=True)
    wd.start()

    from lidiff_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    n_points = int(os.environ.get("BENCH_NUM_POINTS", 180_000))
    s_steps = int(os.environ.get("BENCH_STEPS", 50))
    n_part = n_points // 10

    from lidiff_tpu.config import finalize_config
    from lidiff_tpu.diffusion.dpm_solver import make_dpm_solver
    from lidiff_tpu.models.diffusion import DiffusionTask

    cfg = finalize_config({
        "experiment": {"id": "bench"},
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

    # chunked sampler: bounds single device-call duration (the tunneled
    # backend kills very long executions) at negligible dispatch cost
    chunk = int(os.environ.get("BENCH_CHUNK", 5))
    prepare, run_chunk, finish, n_steps = task.make_chunked_sampler(
        solver=solver, chunk=chunk)

    def sample(v, xi, p, k):
        ctx = prepare(v, xi, p, k)
        for i0 in range(0, n_steps, chunk):
            ctx = run_chunk(v, ctx, jnp.int32(i0))
        return finish(ctx)

    xi = jnp.asarray(x_init)
    pp = jnp.asarray(part)
    k = jax.random.PRNGKey(1)

    # ---- PHASE 1: headline bf16 sampler (always runs) ----
    _phase_note = "headline compile"
    _status("headline: compile + first run")
    t0 = time.time()
    out = sample(variables, xi, pp, k)
    out.block_until_ready()
    compile_and_first = time.time() - t0
    _phase_note = "headline measurement"
    _status(f"headline: compiled in {compile_and_first:.0f}s; measuring")

    reps = int(os.environ.get("BENCH_REPS", 2))
    rep_times = []
    for i in range(reps):
        t0 = time.time()
        out = sample(variables, xi, pp, jax.random.fold_in(k, i))
        out.block_until_ready()
        rep_times.append(time.time() - t0)
    # per-rep times go into the artifact so the ~18% run-to-run spread
    # (BENCH_NOTES round 4) is visible in the evidence of record, not just
    # across separate runs
    elapsed = float(np.mean(rep_times))
    steps_per_sec = s_steps / elapsed

    # capacity + conv-window validation on the real input: any overflow
    # means voxels (or conv taps) were dropped and capacities / window
    # sizes must be re-derived (scripts/measure_occupancy)
    key_ov = jax.random.PRNGKey(9)
    x_noisy = xi + jax.random.normal(key_ov, xi.shape)     # t ~ T regime

    @jax.jit
    def _overflows(p):
        pyr = task.pyramid_full(p)
        return pyr.overflows(), pyr.window_overflows()

    ov, wov = (np.asarray(a) for a in _overflows(x_noisy))

    flops = step_flops(cfg["tpu"]["full_capacities"],
                       cfg["tpu"]["part_capacities"])
    peak = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16
    mfu = flops * steps_per_sec / peak

    skipped: list[str] = []
    with _lock:
        _result = {
            "metric": "denoise_steps_per_sec_chip",
            "value": round(steps_per_sec, 3),
            "unit": "steps/s",
            "vs_baseline": round(steps_per_sec / 50.0, 4),
            "detail": {
                "e2e_completion_latency_s": round(elapsed, 3),
                "rep_times_s": [round(t, 3) for t in rep_times],
                "steps_per_sec_best": round(s_steps / min(rep_times), 3),
                "num_points": n_points,
                "s_steps": s_steps,
                "scan": scan_src,
                "compile_plus_first_run_s": round(compile_and_first, 1),
                "device": str(jax.devices()[0]),
                "model_tflops_per_step": round(flops / 1e12, 3),
                "mfu": round(mfu, 4),
                "chip_peak_bf16_tflops": round(peak / 1e12, 1),
                "capacity_overflow_per_level": [int(x) for x in ov],
                "window_overflow_per_level": [int(x) for x in wov],
                "compute_dtype": os.environ["LIDIFF_COMPUTE_DTYPE"],
                "steps_per_sec_int8_eval": None,
                "train_steps_per_sec": None,
                "train_compile_plus_first_s": None,
                "refine_train_steps_per_sec": None,
                "skipped_phases": skipped,
            },
        }
        if _emit_on_headline:
            _emit_locked()
            os._exit(0)
    _status(f"headline LANDED: {steps_per_sec:.3f} steps/s, "
            f"mfu={mfu:.3f} ({_remaining():.0f}s budget left)")

    def _set(key, val):
        with _lock:
            if not _emitted:
                _result["detail"][key] = val

    # ---- PHASE 2: int8 eval-conv variant (LIDIFF_CONV_QUANT=int8): the
    # one-hot gather GEMM — the dominant per-conv MXU cost — on the int8
    # MXU path at 2x the bf16 rate. SECONDARY number: the headline stays
    # on the exact bf16 path; int8 per-channel-quantizes activation-conv
    # inputs (end-quality pinned vs f32/bf16 by the QUALITY artifact and
    # tests/test_learning.py). Runs FIRST among the extras: it is the
    # headline deployment lever (+26% measured), so it must land in the
    # artifact before train/refine spend budget. Disable with
    # BENCH_INT8=0. ----
    if os.environ.get("BENCH_INT8", "1") != "1":
        skipped.append("int8(off)")
    elif _remaining() < EXTRA_MIN_S:
        skipped.append("int8(budget)")
        _status("skipping int8 phase: budget")
    else:
        from lidiff_tpu.ops import sparse_conv as _sc
        _sc.set_conv_quant(True)
        try:
            _status("int8 phase: compile + first run")
            prep_q, run_q, fin_q, _ = task.make_chunked_sampler(
                solver=solver, chunk=chunk)

            def sample_q(v, xi, p, k):
                ctx = prep_q(v, xi, p, k)
                for i0 in range(0, n_steps, chunk):
                    ctx = run_q(v, ctx, jnp.int32(i0))
                return fin_q(ctx)

            out = sample_q(variables, xi, pp, k)     # compile + first
            out.block_until_ready()
            t0 = time.time()
            for i in range(reps):
                out = sample_q(variables, xi, pp, jax.random.fold_in(k, i))
            out.block_until_ready()
            int8_sps = s_steps / ((time.time() - t0) / reps)
            _set("steps_per_sec_int8_eval", round(int8_sps, 3))
            _status(f"int8 phase LANDED: {int8_sps:.3f} steps/s")
        except Exception as e:
            skipped.append(f"int8(error:{type(e).__name__})")
            _status(f"int8 phase failed: {e}")
        finally:
            _sc.set_conv_quant(False)

    # ---- PHASE 3: training throughput (BASELINE configs #3/#4 are
    # TRAINING configs): full value_and_grad of the diffusion loss + Adam
    # update at the same operating point, with the Pallas convs on the
    # differentiated path (custom_vjp). Disable with BENCH_TRAIN=0. ----
    if os.environ.get("BENCH_TRAIN", "1") != "1":
        skipped.append("train(off)")
    elif _remaining() < EXTRA_MIN_S:
        skipped.append("train(budget)")
        _status("skipping train phase: budget")
    else:
        try:
            import optax
            _status("train phase: compile + first step")
            opt = optax.adam(1e-4)
            params = variables["params"]
            batch_stats = variables["batch_stats"]
            opt_state = opt.init(params)
            batch = {"pcd_full": xi, "pcd_part": pp}

            @jax.jit
            def train_step(params, opt_state, batch_stats, key):
                (_, (bs, m)), grads = jax.value_and_grad(
                    task.loss_fn, has_aux=True)(params, batch_stats, batch,
                                                key)
                ups, opt_state = opt.update(grads, opt_state)
                return optax.apply_updates(params, ups), opt_state, bs, m

            kt = jax.random.PRNGKey(3)
            t0 = time.time()
            params, opt_state, batch_stats, m = train_step(
                params, opt_state, batch_stats, kt)
            jax.block_until_ready(m)
            _set("train_compile_plus_first_s", round(time.time() - t0, 1))
            treps = int(os.environ.get("BENCH_TRAIN_REPS", 4))
            t0 = time.time()
            for i in range(treps):
                params, opt_state, batch_stats, m = train_step(
                    params, opt_state, batch_stats, jax.random.fold_in(kt, i))
            jax.block_until_ready(m)
            train_sps = treps / (time.time() - t0)
            _set("train_steps_per_sec", round(train_sps, 3))
            _status(f"train phase LANDED: {train_sps:.3f} steps/s")
        except Exception as e:
            skipped.append(f"train(error:{type(e).__name__})")
            _status(f"train phase failed: {e}")

    # ---- PHASE 4: refinement-net training throughput (BASELINE config
    # #3: train_refine.py on GT maps, single chip): chamfer-loss
    # value_and_grad + Adam on the MinkUNet refiner at the same point
    # count. Disable with BENCH_REFINE=0. ----
    if os.environ.get("BENCH_REFINE", "1") != "1":
        skipped.append("refine(off)")
    elif _remaining() < EXTRA_MIN_S:
        skipped.append("refine(budget)")
        _status("skipping refine phase: budget")
    else:
        try:
            import optax
            from lidiff_tpu.models.refine import RefineTask
            _status("refine phase: compile + first step")
            rtask = RefineTask(cfg)
            rvars = rtask.init(jax.random.PRNGKey(5), batch_size=1,
                               n_points=2048)
            ropt = optax.adam(1e-4)
            rparams = rvars["params"]
            rbs = rvars["batch_stats"]
            ropt_state = ropt.init(rparams)
            # reference refine operating point (SemanticKITTITemporalAggr.py:
            # 92-96): noisy input at num_points (voxelized), GT at
            # 2*num_points (chamfer target only, never voxelized)
            rbatch = {"pcd_noise": xi,
                      "pcd_full": jnp.concatenate([xi, xi], axis=1)}

            @jax.jit
            def refine_step(params, opt_state, batch_stats, key):
                (_, (bs, m)), grads = jax.value_and_grad(
                    rtask.loss_fn, has_aux=True)(params, batch_stats, rbatch,
                                                 key)
                ups, opt_state = ropt.update(grads, opt_state)
                return optax.apply_updates(params, ups), opt_state, bs, m

            kr = jax.random.PRNGKey(7)
            rparams, ropt_state, rbs, m = refine_step(rparams, ropt_state,
                                                      rbs, kr)
            jax.block_until_ready(m)
            rreps = int(os.environ.get("BENCH_REFINE_REPS", 4))
            t0 = time.time()
            for i in range(rreps):
                rparams, ropt_state, rbs, m = refine_step(
                    rparams, ropt_state, rbs, jax.random.fold_in(kr, i))
            jax.block_until_ready(m)
            refine_sps = rreps / (time.time() - t0)
            _set("refine_train_steps_per_sec", round(refine_sps, 3))
            _status(f"refine phase LANDED: {refine_sps:.3f} steps/s")
        except Exception as e:
            skipped.append(f"refine(error:{type(e).__name__})")
            _status(f"refine phase failed: {e}")

    _done_evt.set()
    with _lock:
        _emit_locked()


if __name__ == "__main__":
    main()
