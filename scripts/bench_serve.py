"""Inference-throughput benchmark for the serving path (.gm3dx artifacts).

Measures the exported PointTransformer classifier (the BASELINE.md finetune
model, `configs/pointmae/finetune_modelnet.yaml`) at the serving contract:
points (B, 1024, 3) -> logits (B, 40), weights baked into the artifact.
``--family seg`` instead measures the part-segmentation artifact
(PointMAESeg, two inputs: points (B, 2048, 3) + cls_label (B,), per-point
part logits out).

Two numbers, two questions:

- ``device_clouds_per_sec``: K calls of the DESERIALIZED exported module
  chained inside one jit, clock stopped on a forced host read of a scalar
  (CLAUDE.md: ``block_until_ready`` is not sufficient on the axon remote
  backend). This is chip throughput — what a deployment with local chips
  gets — and also proves the artifact composes under ``jax.jit``.
- ``e2e_clouds_per_sec``: ``ServingModel.predict`` round trips (numpy in /
  numpy out). In THIS environment the ~3 MB/call input upload rides the
  slow tunnel (~tens of MB/s, CLAUDE.md), so this bounds the tunnel, not
  the chip; reported for honesty, headline is the device number.

Weights are random (throughput is weight-independent); they are filled
host-side from ``jax.eval_shape`` so the benchmark never compiles an init
program. Batch must be >= 128 on this TPU (remote-compiler SIGABRT below
that, CLAUDE.md).

Usage:  python scripts/bench_serve.py [--batch 256] [--bf16] [--calls 8]
Prints one JSON line (supplementary to bench.py — the driver metric stays
pretrain throughput).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing (scripts/_bootstrap.py)



def random_variables(model, example_args, seed: int = 0):
    """Variables tree with eval_shape-derived shapes, host-side random fill.

    params ~ N(0, 0.02) (random constants so XLA cannot fold the GEMMs);
    batch_stats: mean=0, var=1 (running stats in eval BN).
    """
    import jax

    shapes = jax.eval_shape(model.init, jax.random.key(0), *example_args)
    rng = np.random.RandomState(seed)

    def fill(path, sd):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "var":
            return np.ones(sd.shape, sd.dtype)
        if name == "mean":
            return np.zeros(sd.shape, sd.dtype)
        return (rng.randn(*sd.shape) * 0.02).astype(sd.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["classifier", "seg"],
                    default="classifier",
                    help="classifier = PointTransformer (finetune_modelnet); "
                         "seg = PointMAESeg part segmentation (two-input "
                         "artifact: points + cls_label, per-point logits)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--npoints", type=int, default=None,
                    help="points per cloud (default: 1024 classifier / "
                         "2048 seg, the reference eval shapes)")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument("--calls", type=int, default=8,
                    help="chained module calls per timed dispatch")
    ap.add_argument("--windows", type=int, default=2)
    ap.add_argument("--quantize", choices=["int8"], default=None,
                    help="benchmark the dynamic-w8a8 export "
                         "(serve/quantize.py) instead of the fp one")
    ap.add_argument("--concurrent", type=int, default=0,
                    help="also measure N-thread single-cloud request "
                         "throughput, DynamicBatcher vs per-request dispatch")
    ap.add_argument("--concurrent_requests", type=int, default=64)
    ap.add_argument("--batch_wait_ms", type=float, default=3.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gm3d_tpu.config import build_model_from_cfg, cfg_from_yaml_file
    from gm3d_tpu.serve.export import (
        build_classifier_fn,
        build_seg_fn,
        export_forward,
        save_artifact,
    )
    from gm3d_tpu.serve.runner import ServingModel

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    seg = args.family == "seg"
    cfg_path = ("configs/pointmae/seg_shapenetpart.yaml" if seg
                else "configs/pointmae/finetune_modelnet.yaml")
    npoints = args.npoints or (2048 if seg else 1024)
    cfg = cfg_from_yaml_file(cfg_path)
    model = build_model_from_cfg(cfg["model"], dtype=dtype)

    pts_ex = jnp.zeros((args.batch, npoints, 3), jnp.float32)
    cls_ex = jnp.zeros((args.batch,), jnp.int32)
    example = (pts_ex, cls_ex) if seg else pts_ex
    example_args = (pts_ex, cls_ex) if seg else (pts_ex,)
    variables = random_variables(model, example_args)
    if args.quantize == "int8":
        from gm3d_tpu.serve.quantize import quantize_variables

        variables = quantize_variables(variables)
    fn = (build_seg_fn(model, variables) if seg
          else build_classifier_fn(model, variables, npoints))
    exported = export_forward(fn, example, quantize=args.quantize)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "bench.gm3dx")
        save_artifact(path, exported, {
            "mode": "segmentation" if seg else "classifier", "model": "bench"})
        artifact_mb = os.path.getsize(path) / 1e6

        # --- device throughput: K chained calls of the DESERIALIZED module
        # in one jit (same deserialization path a server uses), scalar out.
        from jax import export as jax_export
        import zipfile

        with zipfile.ZipFile(path) as zf:
            loaded = jax_export.deserialize(bytearray(zf.read("module.jaxexp")))

        cls_dev = jnp.asarray(
            (np.arange(args.batch) % model.num_classes).astype(np.int32)) \
            if seg else None

        @jax.jit
        def chained(pts):
            # each call's input depends on the previous call's output —
            # otherwise XLA CSEs K identical pure calls into ONE (observed:
            # an 8-call chain timing at exactly spec peak)
            acc = jnp.float32(0)
            for _ in range(args.calls):
                logits = (loaded.call(pts, cls_dev) if seg
                          else loaded.call(pts))
                s = jnp.sum(logits).astype(jnp.float32)
                acc = acc + s
                pts = pts + (s * jnp.float32(1e-12)).astype(pts.dtype)
            return acc

        pts = jnp.asarray(
            np.random.RandomState(1).randn(args.batch, npoints, 3)
            .astype(np.float32))
        # FLOPs per forward from XLA's cost analysis of the SAME chained
        # executable the timing uses (a separate compile would cost 20-500 s
        # through the tunnel); chain glue (sum + scaled add) is negligible
        flops_per_call = 0.0
        compiled_chained = chained.lower(pts).compile()
        try:
            cost = compiled_chained.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            if cost and cost.get("flops"):
                flops_per_call = float(cost["flops"]) / args.calls
        except Exception:
            pass
        _ = np.asarray(chained(pts))  # warm (hits the compile cache)
        device_windows = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            out = chained(pts)
            _ = np.asarray(out)  # forced host read
            dt = time.perf_counter() - t0
            device_windows.append(args.batch * args.calls / dt)
        device_cps = max(device_windows)

        # --- end-to-end through ServingModel (includes host<->device
        # transfers; tunnel-bound in this environment)
        sm = ServingModel(path)
        host_pts = np.asarray(pts)
        host_cls = np.asarray(cls_dev) if seg else None
        predict = ((lambda p: sm.predict(p, host_cls[:len(p)] if p.ndim == 3
                                         else host_cls[0]))
                   if seg else sm.predict)
        _ = predict(host_pts)  # warm
        e2e_windows = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(2):
                _ = predict(host_pts)
            dt = time.perf_counter() - t0
            e2e_windows.append(args.batch * 2 / dt)
        e2e_cps = max(e2e_windows)

        # --- concurrent single-cloud requests: the production pattern the
        # DynamicBatcher exists for. Without it every request pads to the
        # full static batch host-side and dispatches (and, through this
        # tunnel, UPLOADS) a whole batch for one cloud's worth of answer.
        conc = None
        if args.concurrent > 0:
            from concurrent.futures import ThreadPoolExecutor

            from gm3d_tpu.serve.batcher import DynamicBatcher

            n_req = args.concurrent_requests
            reqs = [host_pts[i % args.batch] for i in range(n_req)]
            req_labels = [int(i % model.num_classes) for i in range(n_req)] \
                if seg else None

            def run_concurrent(backend):
                call = ((lambda i: backend.predict(reqs[i], req_labels[i]))
                        if seg else (lambda i: backend.predict(reqs[i])))
                with ThreadPoolExecutor(max_workers=args.concurrent) as ex:
                    t0 = time.perf_counter()
                    list(ex.map(call, range(n_req)))
                    return n_req / (time.perf_counter() - t0)

            unbatched_rps = run_concurrent(sm)
            batcher = DynamicBatcher(sm, max_wait_ms=args.batch_wait_ms)
            batched_rps = run_concurrent(batcher)
            conc = {
                "threads": args.concurrent,
                "requests": n_req,
                "batched_rps": round(batched_rps, 1),
                "unbatched_rps": round(unbatched_rps, 1),
                "speedup": round(batched_rps / unbatched_rps, 2),
                "device_calls_batched": batcher.device_calls,
                "batch_wait_ms": args.batch_wait_ms,
            }
            batcher.close()

    print(json.dumps({
        "metric": "serve_device_clouds_per_sec",
        "value": round(device_cps, 1),
        "unit": "clouds/s/chip",
        "device_windows": [round(w, 1) for w in device_windows],
        "e2e_clouds_per_sec": round(e2e_cps, 1),
        "e2e_windows": [round(w, 1) for w in e2e_windows],
        "batch": args.batch,
        "npoints": npoints,
        "family": args.family,
        "dtype": "bfloat16" if args.bf16 else "float32",
        "quantization": args.quantize or "none",
        "tflops": round(device_cps / args.batch * flops_per_call / 1e12, 2)
        if flops_per_call else None,
        "flops_per_call": flops_per_call or None,
        "calls_per_dispatch": args.calls,
        "artifact_mb": round(artifact_mb, 1),
        "backend": jax.default_backend(),
        **({"concurrent": conc} if conc else {}),
    }))


if __name__ == "__main__":
    main()
