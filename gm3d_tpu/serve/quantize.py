"""Dynamic-int8 post-training quantization for serving exports (w8a8).

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at twice the bf16 rate on
paper (393.6 TOPS vs 196.8 TFLOPS). MEASURED on this chip (docs/
BENCHMARKS.md): the dynamically quantized forward is ~12% SLOWER than bf16
— the per-token absmax/round/rescale around every matmul is not recovered
at these layer shapes, so on this toolchain int8 export is a SIZE feature
(1.7x smaller artifact, int8 kernels baked as constants, zero measured
accuracy loss on a trained classifier), not a throughput feature. The
reference has no deployment surface at all (its checkpoints need the full
torch stack, ``tools/runner_finetune.py``); gated behind ``--quantize
int8`` on ``cli/export_model.py``.

Scheme (standard dynamic PTQ, chosen for zero calibration data):

- **Weights**: symmetric per-output-channel int8. Kernels are closed-over
  constants at export time, so the rounded int8 tensors and their fp32
  scales constant-fold into the artifact; nothing is quantized at serve
  time.
- **Activations**: symmetric per-token (row-wise) int8, scales computed on
  the fly from each row's absmax. Per-token beats per-tensor on transformer
  activations (outlier tokens don't clip the rest) and the absmax reduction
  is VPU noise next to the MXU matmul it feeds.
- **Everything else** (layernorm, softmax, gelu, attention score/value
  matmuls over <=128-token sequences, BN heads) stays in the model's
  compute dtype: the G x G attention matmuls are tiny, and keeping the
  numerically delicate ops full-precision is what makes PTQ safe.

Implementation: every matmul-bearing layer in this codebase is ``nn.Dense``
(``models/blocks.py::_dense`` — the reference's Conv1d-k1 stacks were
already re-expressed as Dense), so a single flax method interceptor
(``nn.intercept_methods``) rewrites ALL of them; no model code changes, and
any future module built from nn.Dense inherits quantization for free. The
interceptor only ever runs under ``model.apply`` inside an export trace —
params already exist, so bypassing ``next_fun`` (and thus ``self.param``
registration) is safe.

Accuracy: pinned by ``tests/test_quantize.py`` (logit fidelity + argmax
agreement vs the fp forward); measured end-to-end on a trained classifier in
docs/BENCHMARKS.md.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_kernel(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: ``(q_kernel int8, scale fp32)``."""
    kernel = jnp.asarray(kernel, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-12) / 127.0
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_variables(variables: dict) -> dict:
    """Pre-quantize every Dense kernel in a variables tree.

    Replaces each 2-D ``kernel`` leaf with its int8 tensor and adds a
    sibling ``kernel_scale`` (fp32, per output channel). Doing this in
    Python — BEFORE the export closes over the weights — is what makes the
    int8 tensors serialize as baked constants (~4x smaller artifact);
    quantizing inside the traced function would leave fp32 constants in the
    module and defer the rounding to serve-time compilation. Every 2-D
    ``kernel`` in this codebase belongs to an ``nn.Dense`` (LayerNorm/BN use
    ``scale``/``bias``; embeddings are 3-D), so the structural match is
    exact. The result is only consumable under :func:`quantized_dense` —
    plain ``model.apply`` would feed int8 kernels to fp matmuls."""

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {k: walk(v) for k, v in tree.items()}
        kernel = out.get("kernel")
        if (
            kernel is not None
            and getattr(kernel, "ndim", 0) == 2
            and kernel.dtype != jnp.int8
        ):
            out["kernel"], out["kernel_scale"] = quantize_kernel(kernel)
        return out

    new = dict(variables)
    new["params"] = walk(dict(variables["params"]))
    return new


def _int8_dense(x: jax.Array, q_kernel: jax.Array, k_scale: jax.Array,
                bias: jax.Array | None, out_dtype) -> jax.Array:
    """w8a8 Dense: per-channel int8 kernel, per-token dynamic int8 input."""
    xf = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    q_x = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        q_x, q_kernel,
        (((q_x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * x_scale * k_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if not isinstance(mod, nn.Dense) or context.method_name != "__call__":
        return next_fun(*args, **kwargs)
    params = mod.variables["params"]
    kernel = params["kernel"]
    if kernel.dtype == jnp.int8:  # pre-quantized via quantize_variables
        q_kernel, k_scale = kernel, params["kernel_scale"]
    else:  # fp variables: quantize at trace time (constant-folds at compile)
        q_kernel, k_scale = quantize_kernel(kernel)
    bias = params.get("bias") if mod.use_bias else None
    # honor the module's compute dtype: nn.Dense(dtype=bf16) returns bf16
    # even for fp32 inputs — returning the INPUT dtype would leak fp32
    # activations through bf16 models' patch-embed stacks
    out_dtype = mod.dtype if mod.dtype is not None else args[0].dtype
    return _int8_dense(args[0], q_kernel, k_scale, bias, out_dtype)


@contextlib.contextmanager
def quantized_dense() -> Iterator[None]:
    """Trace-time context: every ``nn.Dense.__call__`` under ``model.apply``
    becomes a dynamic-int8 w8a8 matmul. Enter around the export trace
    (``serve.export.export_forward(..., quantize="int8")``)."""
    with nn.intercept_methods(_interceptor):
        yield
