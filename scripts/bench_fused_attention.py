#!/usr/bin/env python
"""Fused-attention Pallas experiment vs the XLA baseline (round-4 verdict #5).

Measures the GM3D-shape attention block (L=64 tokens, D=384, 6 heads,
B=256) both ways INSIDE one jit — K chained iterations per dispatch so the
~36 ms tunnel dispatch overhead (CLAUDE.md) cannot dominate — ending with a
forced scalar host read. Run on the real chip:

    python scripts/bench_fused_attention.py            # TPU (default backend)
    GM3D_PLATFORM=cpu python scripts/bench_fused_attention.py --interpret

Prints one JSON line per (impl, dtype); the verdict row lands in
docs/BENCHMARKS.md "Fused attention experiment".
"""

import _bootstrap  # noqa: F401

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_trainable,
    reference_attention,
)

B, L, D, H = 256, 64, 384, 6   # GM3D hot shape (round-4 default)
BT = 8
ITERS = 64          # chained iterations inside ONE jit
DISPATCHES = 8
WINDOWS = 3


def build(impl, dtype, interpret, grad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)), dtype)
    w = dict(
        wqkv=jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05, dtype),
        bqkv=jnp.asarray(rng.standard_normal((3 * D,)) * 0.05, dtype),
        wproj=jnp.asarray(rng.standard_normal((D, D)) * 0.05, dtype),
        bproj=jnp.asarray(rng.standard_normal((D,)) * 0.05, dtype),
    )

    if impl == "fused":
        base = fused_attention_trainable if grad else fused_attention
        fn = functools.partial(base, heads=H, block_batch=BT,
                               interpret=interpret)
    else:
        fn = functools.partial(reference_attention, heads=H)

    if grad:
        # fwd + bwd per iteration: d/dx of sum(attn(x) * x) chains the state
        @jax.jit
        def many(x0):
            def body(carry, _):
                g = jax.grad(
                    lambda xx: jnp.sum((fn(xx, **w) * xx).astype(jnp.float32))
                )(carry)
                return (carry + 0.001 * g).astype(dtype), ()

            out, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))
    else:
        @jax.jit
        def many(x0):
            def body(carry, _):
                y = fn(carry, **w)
                # chain with a tiny perturbation so iterations cannot collapse
                return (carry + 0.001 * y).astype(dtype), ()

            out, _ = jax.lax.scan(body, x0, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))  # scalar for the host read

    return many, x


def measure(impl, dtype_name, interpret, grad):
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    many, x = build(impl, dtype, interpret, grad)
    s = float(np.asarray(many(x)))  # compile + warm
    windows = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(DISPATCHES):
            s = float(np.asarray(many(x)))  # forced host read each dispatch
        windows.append(time.perf_counter() - t0)
    per_call_us = min(windows) / (DISPATCHES * ITERS) * 1e6
    print(json.dumps({
        "impl": impl, "dtype": dtype_name, "mode": "fwd+bwd" if grad else "fwd",
        "us_per_attention_call": round(per_call_us, 1),
        "shape": [B, L, D, H], "iters": ITERS,
        "windows_s": [round(w, 4) for w in windows],
        "checksum": s,
    }))
    return per_call_us


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--interpret", action="store_true",
                   help="CPU interpret mode (correctness only, not perf)")
    p.add_argument("--grad", action="store_true",
                   help="measure forward+backward (custom-VJP kernel) instead "
                        "of forward only")
    p.add_argument("--shape", default=None,
                   help="B,L,D,H[,block_batch] override — e.g. the M2AE "
                        "decoder shapes 128,64,384,6,8 / 128,256,192,6,4 / "
                        "128,512,192,6,2 (round-5 per-scale A/B)")
    args = p.parse_args()
    if args.shape:
        global B, L, D, H, BT
        parts = [int(v) for v in args.shape.split(",")]
        B, L, D, H = parts[:4]
        BT = parts[4] if len(parts) > 4 else max(
            bt for bt in (8, 4, 2, 1) if B % bt == 0 and bt * L <= 1024)
    results = {}
    for dtype in ("f32", "bf16"):
        for impl in ("xla", "fused"):
            results[(impl, dtype)] = measure(impl, dtype, args.interpret,
                                             args.grad)
    for dtype in ("f32", "bf16"):
        ratio = results[("xla", dtype)] / results[("fused", dtype)]
        print(json.dumps({"dtype": dtype, "mode": "fwd+bwd" if args.grad else "fwd",
                          "fused_speedup_vs_xla": round(ratio, 3)}))


if __name__ == "__main__":
    main()
