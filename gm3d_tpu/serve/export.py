"""AOT model export to self-contained StableHLO artifacts (``jax.export``).

An artifact (``.gm3dx``) is a zip with two members:

  ``manifest.json``   input/output shapes + dtypes, lowered platforms,
                      model metadata (family, npoints, ckpt step)
  ``module.jaxexp``   the ``jax.export`` serialized module — the jitted
                      eval forward with the trained weights baked in as
                      constants

Loading needs ONLY this module (no model code, no config, no checkpoint):
``load_artifact`` deserializes and returns a jitted callable. Shapes are
static by design — the TPU rule (no dynamic shapes on the MXU path); ragged
request batches are padded/chunked by :class:`gm3d_tpu.serve.runner.
ServingModel`, never by re-tracing.

The exported classifier forward carries the reference's validation-forward
semantics exactly (``engine_finetune.py:186-218``: FPS straight to npoints,
no augmentation, running BN stats); the feature forward is the frozen
(mean+max)-pooled encoder the probes consume (``main_pretrain.py:710-717``).
The reference itself has no equivalent deployment surface.
"""

from __future__ import annotations

import json
import zipfile
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from gm3d_tpu.ops.fps import fps

FORMAT_VERSION = 1
_MANIFEST = "manifest.json"
_MODULE = "module.jaxexp"


def build_classifier_fn(model, variables, npoints: int) -> Callable:
    """Eval forward with weights baked in: points (B, N, 3) -> logits (B, C).

    Same body as ``train.finetune.make_eval_step`` (reference
    ``engine_finetune.py:186-218``), but closed over ``variables`` so the
    export is self-contained."""

    def fn(pts: jax.Array) -> jax.Array:
        x = fps(pts, npoints) if pts.shape[1] > npoints else pts
        return model.apply(variables, x, deterministic=True)

    return fn


def build_feature_fn(model, variables, npoints: int) -> Callable:
    """Frozen featurizer: points (B, N, 3) -> (mean+max)-pooled features
    (B, D) — exactly what the SVM/kNN/linprob probes consume
    (``eval/svm.py``, reference ``main_pretrain.py:710-717``)."""

    def fn(pts: jax.Array) -> jax.Array:
        x = fps(pts, npoints) if pts.shape[1] > npoints else pts
        f = model.apply(variables, x, method=model.encode_features)
        return jnp.mean(f, axis=1) + jnp.max(f, axis=1)

    return fn


def build_seg_fn(model, variables) -> Callable:
    """Part-segmentation eval forward: (points (B, N, 3), cls_label (B,)
    int32 object category) -> per-point part logits (B, N, num_parts).

    Same body as ``train.segmentation.make_seg_eval_step`` (running BN
    stats, no augmentation). No in-graph FPS: the outputs are PER-POINT, so
    subsampling would silently relabel a different cloud than the caller
    sent — the input must already be the model's point count."""

    def fn(pts: jax.Array, cls_label: jax.Array) -> jax.Array:
        return model.apply(variables, pts, cls_label.astype(jnp.int32),
                           deterministic=True)

    return fn


def export_forward(fn: Callable, example_input,
                   platforms: Tuple[str, ...] | None = None,
                   quantize: str | None = None):
    """AOT-lower ``fn`` for ``platforms`` (default: the current backend).

    Multi-platform export (e.g. ``("cpu", "tpu")``) uses jax's
    cross-platform lowering, so one artifact serves everywhere. Python-level
    backend dispatch is fixed at TRACE time — on a TPU backend
    :func:`ops.fps.fps` normally embeds the Mosaic/Pallas kernel, which
    cannot lower for other platforms — so whenever the target set is not
    exactly the current backend, tracing runs under
    :func:`ops.fps.portable_fps` and the artifact embeds the portable XLA
    formulation (identical indices, slower on TPU; export TPU-only for the
    fast kernel).

    ``quantize="int8"`` traces under :func:`serve.quantize.quantized_dense`:
    every Dense matmul becomes dynamic-int8 w8a8 and the int8 kernels
    constant-fold into the artifact (2x MXU ceiling on v5e, ~4x smaller
    weights).

    ``example_input`` is one array or a tuple of arrays (multi-input
    forwards like the segmentation model's (points, cls_label))."""
    if platforms is None:
        platforms = (jax.default_backend(),)
    platforms = tuple(platforms)
    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize mode {quantize!r} "
                         "(expected None or 'int8')")
    exp = jax_export.export(jax.jit(fn), platforms=platforms)
    examples = (example_input if isinstance(example_input, (tuple, list))
                else (example_input,))
    args = tuple(jax.ShapeDtypeStruct(e.shape, e.dtype) for e in examples)
    import contextlib

    with contextlib.ExitStack() as stack:
        if platforms != (jax.default_backend(),):
            from gm3d_tpu.ops.fps import portable_fps
            from gm3d_tpu.ops.knn import portable_knn

            stack.enter_context(portable_fps())
            stack.enter_context(portable_knn())
        # NOTE: artifacts deliberately do NOT embed the fused Pallas
        # attention kernel — the same-session serve A/B measured the fused
        # classifier forward 16% SLOWER on-device (7136 vs 8541 clouds/s;
        # docs/BENCHMARKS.md "where it does NOT pay"): outside the GM3D
        # pretrain step, XLA's scheduling of FPS/grouping around the
        # attention GEMMs beats the kernel.
        if quantize == "int8":
            from gm3d_tpu.serve.quantize import quantized_dense

            stack.enter_context(quantized_dense())
        return exp(*args)


def save_artifact(path: str, exported, manifest: Dict[str, Any]) -> str:
    """Write the ``.gm3dx`` zip. Fills in the shape/dtype/platform fields
    from the ``Exported`` itself so the manifest can't drift.

    ``input_shape``/``input_dtype`` always describe the FIRST input (the
    points) so single-input loaders keep working; any further inputs (the
    seg model's per-cloud ``cls_label``) are recorded additively under
    ``extra_inputs`` — each must share the points' leading batch dim, the
    contract :class:`ServingModel`'s pad/chunk batching relies on."""
    in_aval = exported.in_avals[0]
    out_aval = exported.out_avals[0]
    extra = [{"shape": list(a.shape), "dtype": str(a.dtype)}
             for a in exported.in_avals[1:]]
    for spec in extra:
        if not spec["shape"] or spec["shape"][0] != in_aval.shape[0]:
            raise ValueError(
                f"extra input {spec} must lead with the points batch dim "
                f"{in_aval.shape[0]} (ServingModel batches along axis 0)")
    manifest = dict(manifest)
    manifest.update(
        format_version=FORMAT_VERSION,
        input_shape=list(in_aval.shape),
        input_dtype=str(in_aval.dtype),
        output_shape=list(out_aval.shape),
        output_dtype=str(out_aval.dtype),
        platforms=list(exported.platforms),
        jax_version=jax.__version__,
    )
    if extra:
        manifest["extra_inputs"] = extra
    blob = bytes(exported.serialize())
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_MANIFEST, json.dumps(manifest, indent=1))
        zf.writestr(_MODULE, blob)
    return path


def load_artifact(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize an artifact: returns ``(jitted_fn, manifest)``.

    The callable takes one array of exactly ``manifest["input_shape"]`` /
    ``input_dtype`` (static shapes — use :class:`ServingModel` for ragged
    batches) and runs on the current default backend, which must be one of
    ``manifest["platforms"]``."""
    with zipfile.ZipFile(path, "r") as zf:
        manifest = json.loads(zf.read(_MANIFEST).decode("utf-8"))
        blob = zf.read(_MODULE)
    if manifest.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported artifact format {manifest.get('format_version')!r} "
            f"(expected {FORMAT_VERSION})")
    backend = jax.default_backend()
    if backend not in manifest["platforms"]:
        raise ValueError(
            f"artifact was lowered for {manifest['platforms']}, but the "
            f"current backend is {backend!r}; re-export with "
            f"--platforms {backend}")
    exported = jax_export.deserialize(bytearray(blob))
    call = jax.jit(exported.call)
    extra_specs = manifest.get("extra_inputs", [])

    def fn(points, *extra) -> np.ndarray:
        shape = tuple(manifest["input_shape"])
        points = np.asarray(points, dtype=manifest["input_dtype"])
        if points.shape != shape:
            raise ValueError(
                f"input shape {points.shape} != exported shape {shape}; "
                "ServingModel.predict handles ragged batches by padding")
        if len(extra) != len(extra_specs):
            raise ValueError(
                f"artifact takes {1 + len(extra_specs)} inputs, "
                f"got {1 + len(extra)}")
        args = [points]
        for x, spec in zip(extra, extra_specs):
            x = np.asarray(x, dtype=spec["dtype"])
            if x.shape != tuple(spec["shape"]):
                raise ValueError(
                    f"extra input shape {x.shape} != exported {spec['shape']}")
            args.append(x)
        return np.asarray(call(*args))

    # async device-level entry: takes a (possibly device-committed) array of
    # the exported shape and returns the jit future WITHOUT a host read —
    # ServingModel uses it to overlap chunk dispatches across local chips
    # (jit runs on the device the input is committed to)
    fn.device_call = call
    return fn, manifest
