"""Dynamic-int8 serving quantization (gm3d_tpu/serve/quantize.py).

Fidelity contract: the w8a8 forward must track the fp forward closely enough
that serving decisions are unchanged — argmax agreement on well-separated
logits, bounded relative logit error — and the int8 kernels must
constant-fold into a ~4x-smaller artifact. The reference has no deployment
surface at all (SURVEY.md §5.4); quantization is a rebuild-only capability.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_serve import export_tiny_artifact, make_tiny_classifier


def _logits(fn, pts):
    return np.asarray(fn(jnp.asarray(pts)))


class TestQuantizedDense:
    def test_logit_fidelity_and_agreement(self):
        """Quantized forward tracks fp logits; per-row top-1 mostly agrees
        even on a random-init model (trained models separate classes more)."""
        from gm3d_tpu.serve.export import build_classifier_fn
        from gm3d_tpu.serve.quantize import quantized_dense

        model, variables = make_tiny_classifier()
        fn = build_classifier_fn(model, variables, 64)
        pts = np.random.RandomState(0).randn(16, 64, 3).astype(np.float32)
        ref = _logits(jax.jit(fn), pts)
        with quantized_dense():
            q = _logits(jax.jit(fn), pts)
        # relative error against the logit RANGE (random-init logits cluster
        # near 0, so per-element relative error is ill-posed)
        scale = np.abs(ref).max()
        assert np.abs(q - ref).max() / scale < 0.15
        agree = (q.argmax(-1) == ref.argmax(-1)).mean()
        assert agree >= 0.75, f"top-1 agreement {agree}"

    def test_quantization_error_shrinks_with_more_bits_of_margin(self):
        """Sanity: on logits with a decisive margin the argmax never flips.
        Build a decisive case by scaling one class's head row."""
        from gm3d_tpu.serve.export import build_classifier_fn
        from gm3d_tpu.serve.quantize import quantized_dense

        model, variables = make_tiny_classifier()
        params = jax.tree_util.tree_map(lambda x: x, variables["params"])
        head = params["cls_head_finetune"]["fc3"]
        kernel = np.asarray(head["kernel"]).copy()
        kernel[:, 2] += 0.5  # bias class 2 upward decisively
        head["kernel"] = jnp.asarray(kernel)
        variables = {**variables, "params": params}
        fn = build_classifier_fn(model, variables, 64)
        pts = np.random.RandomState(1).randn(8, 64, 3).astype(np.float32)
        ref = _logits(jax.jit(fn), pts)
        with quantized_dense():
            q = _logits(jax.jit(fn), pts)
        assert (ref.argmax(-1) == 2).all()
        assert (q.argmax(-1) == 2).all()

    def test_non_dense_modules_untouched(self):
        """The interceptor must leave non-Dense methods alone (LayerNorm,
        BatchNorm, attention internals run exactly once, unquantized):
        quantizing with an identity-preserving kernel reproduces fp exactly
        for a pure-Dense toy."""
        from gm3d_tpu.serve.quantize import quantized_dense
        from flax import linen as nn

        class Toy(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(8, name="d", kernel_init=nn.initializers.zeros)(x)
                return nn.LayerNorm()(x + 1.0)

        m = Toy()
        x = jnp.asarray(np.random.RandomState(0).randn(4, 8), jnp.float32)
        v = m.init(jax.random.key(0), x)
        ref = np.asarray(m.apply(v, x))
        with quantized_dense():
            q = np.asarray(m.apply(v, x))
        # zero kernel -> Dense output is exactly bias (0); LayerNorm of the
        # constant is identical, so quantization introduces NO drift at all
        np.testing.assert_array_equal(ref, q)


class TestQuantizedEmaStep:
    """Opt-in int8 EMA forward inside the GM3D train step (perf lever,
    parity-breaking by design — docs/BENCHMARKS.md)."""

    def _setup(self, quantize_ema):
        from gm3d_tpu.masking import gm3d_num_mask
        from gm3d_tpu.models import GM3DStudent, PointMAE
        from gm3d_tpu.train.optim import build_gm3d_shared_optimizer
        from gm3d_tpu.train.pretrain import make_gm3d_train_step
        from gm3d_tpu.train.state import create_train_state

        small = dict(trans_dim=48, depth=2, num_heads=2, decoder_depth=1,
                     decoder_num_heads=2, group_size=8, num_group=16,
                     encoder_dims=48)
        student, teacher = GM3DStudent(**small), PointMAE(**small)
        pts = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 128, 3)) * 0.5,
            jnp.float32)
        num_mask = gm3d_num_mask(16, 0.6)
        mask0 = jnp.zeros((4, 16), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, num_mask)
        tvars = teacher.init(jax.random.key(1), pts, mask0, num_mask)
        tx = build_gm3d_shared_optimizer(svars["params"], 1e-3)
        state = create_train_state(svars, tx, with_ema=True)
        step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6,
                                    augment=False, quantize_ema=quantize_ema)
        scalars = {k: jnp.asarray(v) for k, v in
                   [("keep_ratio", 0.5), ("ema_decay", 0.999),
                    ("w_mse", 1.0), ("w_cd", 1.0)]}
        return step, state, tvars, pts, scalars

    def test_step_runs_and_tracks_base(self):
        """Same state/batch: the int8-EMA step produces a finite loss close
        to the fp step (the EMA output only feeds the mask ranking, so the
        losses differ only where near-tied rankings flip)."""
        step_q, state_q, tvars, pts, scalars = self._setup(True)
        step_f, state_f, _, _, _ = self._setup(False)
        rng = jax.random.key(7)
        _, m_f = step_f(state_f, tvars, pts, rng, scalars)
        _, m_q = step_q(state_q, tvars, pts, rng, scalars)
        lf, lq = float(m_f["loss"]), float(m_q["loss"])
        assert np.isfinite(lq)
        assert abs(lq - lf) / max(abs(lf), 1e-6) < 0.05, (lf, lq)

    def test_refused_for_ema_distill_targets(self):
        from gm3d_tpu.models import GM3DStudent
        from gm3d_tpu.train.pretrain import make_gm3d_train_step

        with pytest.raises(ValueError, match="quantize_ema"):
            make_gm3d_train_step(GM3DStudent(), None, None,
                                 distill_mode="ema", quantize_ema=True)


class TestQuantizedArtifact:
    def test_export_int8_roundtrip_and_size(self, tmp_path):
        """--quantize int8 artifacts load, run close to fp, and carry int8
        kernels as baked constants (materially smaller zip)."""
        from gm3d_tpu.serve import load_artifact
        from gm3d_tpu.serve.export import (
            build_classifier_fn,
            export_forward,
            save_artifact,
        )

        import os

        from gm3d_tpu.serve.quantize import quantize_variables

        model, variables = make_tiny_classifier()
        fn = build_classifier_fn(model, variables, 64)
        q_fn_build = build_classifier_fn(model, quantize_variables(variables), 64)
        example = jnp.zeros((4, 96, 3), jnp.float32)

        fp = export_forward(fn, example)
        q = export_forward(q_fn_build, example, quantize="int8")
        fp_path = str(tmp_path / "fp.gm3dx")
        q_path = str(tmp_path / "q.gm3dx")
        save_artifact(fp_path, fp, {"quantization": "none"})
        save_artifact(q_path, q, {"quantization": "int8"})

        pts = np.random.RandomState(0).randn(4, 96, 3).astype(np.float32)
        fp_fn, _ = load_artifact(fp_path)
        q_fn, manifest = load_artifact(q_path)
        assert manifest["quantization"] == "int8"
        ref, out = fp_fn(pts), q_fn(pts)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.15
        # int8 kernels are 4x smaller pre-compression; allow slack for the
        # non-weight module bytes
        assert os.path.getsize(q_path) < 0.6 * os.path.getsize(fp_path)

    def test_bad_quantize_mode_raises(self):
        from gm3d_tpu.serve.export import build_classifier_fn, export_forward

        model, variables = make_tiny_classifier()
        fn = build_classifier_fn(model, variables, 64)
        with pytest.raises(ValueError, match="quantize"):
            export_forward(fn, jnp.zeros((2, 64, 3), jnp.float32),
                           quantize="int4")

    def test_quantized_featurizer_tracks_fp(self):
        """The SVM/kNN/linprob probes consume (mean+max)-pooled features;
        quantized features must stay directionally faithful (cosine) so
        probe decisions survive quantization."""
        from gm3d_tpu.masking import gm3d_num_mask
        from gm3d_tpu.models import GM3DStudent
        from gm3d_tpu.serve.export import build_feature_fn
        from gm3d_tpu.serve.quantize import quantize_variables, quantized_dense

        model = GM3DStudent(trans_dim=32, depth=2, num_heads=2,
                            decoder_depth=1, decoder_num_heads=2,
                            group_size=8, num_group=16, encoder_dims=32)
        pts0 = jnp.zeros((2, 64, 3), jnp.float32)
        num_mask = gm3d_num_mask(model.num_group, 0.6)
        mask0 = jnp.zeros((2, 16), bool).at[:, :num_mask].set(True)
        variables = model.init(jax.random.key(0), pts0, mask0, num_mask)
        fn = build_feature_fn(model, variables, 64)
        q_fn = build_feature_fn(model, quantize_variables(variables), 64)
        pts = np.random.RandomState(2).randn(8, 64, 3).astype(np.float32)
        ref = _logits(jax.jit(fn), pts)
        with quantized_dense():
            q = _logits(jax.jit(q_fn), pts)
        cos = (ref * q).sum(-1) / (
            np.linalg.norm(ref, axis=-1) * np.linalg.norm(q, axis=-1))
        assert cos.min() > 0.995, f"feature cosine {cos.min()}"

    def test_export_cli_quantize_flag(self, tmp_path):
        """End-to-end through the CLI: --quantize int8 produces a loadable
        artifact whose manifest records the quantization."""
        import json
        import zipfile

        from cli_harness import run_cli
        from test_serve import tiny_cfg_yaml

        cfg = tiny_cfg_yaml(tmp_path)
        out = str(tmp_path / "cli_q.gm3dx")
        run_cli("gm3d_tpu.cli.export_model",
                ["exp", "--config", cfg, "--out", out, "--export_batch", "4",
                 "--input_points", "64", "--quantize", "int8"])
        with zipfile.ZipFile(out) as zf:
            manifest = json.loads(zf.read("manifest.json").decode())
        assert manifest["quantization"] == "int8"
        from gm3d_tpu.serve import load_artifact

        fn, _ = load_artifact(out)
        pts = np.random.RandomState(0).randn(4, 64, 3).astype(np.float32)
        out_logits = fn(pts)
        assert out_logits.shape == (4, 5)
        assert np.isfinite(out_logits).all()
