"""AOT export + serving (gm3d_tpu/serve): artifact round-trip fidelity,
ragged-batch serving, the export CLI, and the HTTP micro-server.

The reference has no deployment surface (checkpoints are only consumable by
the full training stack, ``tools/runner_finetune.py``); this subsystem is a
rebuild extension for the production-serving mandate. Fidelity contract:
the exported module must reproduce the eval forward
(``engine_finetune.py:186-218`` semantics) to fp32 rounding on the same
backend (the deserialized StableHLO recompiles with its own fusion order,
so ~1e-7 element drift vs the live jit is expected; identical inputs
through the SAME artifact are bit-exact).
"""

import json
import threading
import urllib.request
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from cli_harness import run_cli

TINY_MODEL = {
    "NAME": "PointTransformer",
    "trans_dim": 32,
    "depth": 2,
    "num_heads": 2,
    "cls_dim": 5,
    "group_size": 8,
    "num_group": 16,
    "encoder_dims": 32,
    "drop_path_rate": 0.0,
}


def tiny_cfg_yaml(tmp_path, npoints=64):
    cfg = {"model": dict(TINY_MODEL), "npoints": npoints, "total_bs": 4,
           "max_epoch": 1}
    path = tmp_path / "tiny_finetune.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def make_tiny_classifier(npoints=64):
    from gm3d_tpu.config import build_model_from_cfg

    model = build_model_from_cfg(dict(TINY_MODEL))
    pts0 = jnp.zeros((2, npoints, 3), jnp.float32)
    variables = model.init(jax.random.key(0), pts0)
    return model, variables


def export_tiny_artifact(tmp_path, batch=4, n_input=96, npoints=64):
    from gm3d_tpu.serve import build_classifier_fn, export_forward, save_artifact

    model, variables = make_tiny_classifier(npoints)
    fn = build_classifier_fn(model, variables, npoints)
    exported = export_forward(fn, jnp.zeros((batch, n_input, 3), jnp.float32))
    path = str(tmp_path / "tiny.gm3dx")
    save_artifact(path, exported, {"mode": "classifier", "model": "tiny",
                                   "npoints": npoints, "ckpt_step": -1})
    return path, fn


def test_export_roundtrip_matches_direct_apply(tmp_path):
    """Deserialized artifact == the live jitted forward, including the
    in-graph FPS (input 96 points > npoints 64)."""
    from gm3d_tpu.serve import load_artifact

    path, fn = export_tiny_artifact(tmp_path)
    loaded, manifest = load_artifact(path)
    pts = np.random.RandomState(0).randn(4, 96, 3).astype(np.float32)
    np.testing.assert_allclose(loaded(pts), np.asarray(fn(jnp.asarray(pts))),
                               rtol=1e-5, atol=1e-6)
    assert manifest["input_shape"] == [4, 96, 3]
    assert manifest["output_shape"] == [4, 5]
    assert manifest["mode"] == "classifier"
    assert jax.default_backend() in manifest["platforms"]


def test_serving_model_pads_and_chunks(tmp_path):
    """Ragged request batches map onto the static exported batch: pad for
    B < batch, chunk for B > batch, single-cloud promotion — all returning
    exactly the per-row results of a full-batch call."""
    from gm3d_tpu.serve import ServingModel

    path, fn = export_tiny_artifact(tmp_path, batch=4)
    sm = ServingModel(path)
    rng = np.random.RandomState(1)

    full = rng.randn(4, 96, 3).astype(np.float32)
    ref = np.asarray(fn(jnp.asarray(full)))

    close = lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)  # noqa: E731
    close(sm.predict(full), ref)
    # pad path: rows 0-1 must equal the same rows evaluated among zeros-pad
    pad_ref = np.asarray(fn(jnp.asarray(
        np.concatenate([full[:2], np.zeros((2, 96, 3), np.float32)]))))[:2]
    close(sm.predict(full[:2]), pad_ref)
    # chunk path: 7 rows -> two calls; first 4 must equal the full-batch ref
    seven = np.concatenate([full, full[:3]], axis=0)
    out7 = sm.predict(seven)
    assert out7.shape == (7, 5)
    close(out7[:4], ref)
    # single cloud
    single = sm.predict(full[0])
    assert single.shape == (5,)
    np.testing.assert_array_equal(single, sm.predict(full[:1])[0])
    # wrong point count is a clear error, not a silent re-trace
    with pytest.raises(ValueError, match="exported input size"):
        sm.predict(rng.randn(2, 50, 3).astype(np.float32))


def test_artifact_format_guards(tmp_path):
    """Unsupported format version and wrong-platform artifacts fail loudly."""
    from gm3d_tpu.serve import load_artifact

    path, _ = export_tiny_artifact(tmp_path)
    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.read("manifest.json"))
        blob = zf.read("module.jaxexp")

    bad_ver = str(tmp_path / "bad_ver.gm3dx")
    m = dict(manifest, format_version=99)
    with zipfile.ZipFile(bad_ver, "w") as zf:
        zf.writestr("manifest.json", json.dumps(m))
        zf.writestr("module.jaxexp", blob)
    with pytest.raises(ValueError, match="unsupported artifact format"):
        load_artifact(bad_ver)

    bad_plat = str(tmp_path / "bad_plat.gm3dx")
    m = dict(manifest, platforms=["tpu"])
    with zipfile.ZipFile(bad_plat, "w") as zf:
        zf.writestr("manifest.json", json.dumps(m))
        zf.writestr("module.jaxexp", blob)
    with pytest.raises(ValueError, match="lowered for"):
        load_artifact(bad_plat)


def test_export_cli_classifier(tmp_path):
    """cli/export_model.py end to end (random-init warn path), then load the
    artifact through ServingModel."""
    from gm3d_tpu.serve import ServingModel

    out = str(tmp_path / "cls.gm3dx")
    path = run_cli("gm3d_tpu.cli.export_model", [
        "ex", "--config", tiny_cfg_yaml(tmp_path), "--out", out,
        "--export_batch", "2", "--input_points", "96",
        "--output_dir", str(tmp_path / "exp"),
    ])
    assert path == out
    sm = ServingModel(out)
    assert sm.manifest["model"] == "PointTransformer"
    assert sm.manifest["ckpt_step"] == -1
    logits = sm.predict(np.random.RandomState(2).randn(3, 96, 3).astype(np.float32))
    assert logits.shape == (3, 5)


def test_export_cli_features_pointmae(tmp_path):
    """--mode features exports the pooled (mean+max) featurizer the probes
    consume (eval/svm.py; reference main_pretrain.py:710-717)."""
    from gm3d_tpu.serve import ServingModel

    cfg = {
        "model": {
            "NAME": "Point_MAE",
            "group_size": 8,
            "num_group": 16,
            "transformer_config": {
                "trans_dim": 32, "depth": 2, "num_heads": 2,
                "decoder_depth": 1, "decoder_num_heads": 2,
                "drop_path_rate": 0.0, "encoder_dims": 32,
                "mask_ratio": 0.6, "mask_type": "rand",
            },
        },
        "npoints": 64, "total_bs": 4, "max_epoch": 1,
    }
    cfg_path = tmp_path / "tiny_pretrain.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = str(tmp_path / "feat.gm3dx")
    run_cli("gm3d_tpu.cli.export_model", [
        "ex", "--config", str(cfg_path), "--out", out,
        "--mode", "features", "--model_family", "pointmae",
        "--export_batch", "2", "--output_dir", str(tmp_path / "exp"),
    ])
    sm = ServingModel(out)
    feats = sm.predict(np.random.RandomState(3).randn(2, 64, 3).astype(np.float32))
    assert feats.shape == (2, 32)
    assert np.isfinite(feats).all()


def test_export_cli_features_m2ae(tmp_path):
    """--model_family m2ae featurizer export (hierarchical encoder,
    multi-scale pooled features)."""
    from gm3d_tpu.serve import ServingModel

    cfg = {
        "model": {
            "NAME": "Point_M2AE",
            "num_groups": [32, 16, 8], "group_sizes": [8, 4, 4],
            "encoder_depths": [1, 1, 1], "encoder_dims": [24, 48, 96],
            "local_radius": [0.32, 0.64, 1.28],
            "decoder_dims": [96, 48], "decoder_depths": [1, 1],
            "num_heads": 2, "drop_path_rate": 0.0,
        },
        "npoints": 64, "total_bs": 4, "max_epoch": 1,
    }
    cfg_path = tmp_path / "tiny_m2ae.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = str(tmp_path / "m2ae_feat.gm3dx")
    run_cli("gm3d_tpu.cli.export_model", [
        "ex", "--config", str(cfg_path), "--out", out,
        "--mode", "features", "--model_family", "m2ae",
        "--export_batch", "2", "--output_dir", str(tmp_path / "exp"),
    ])
    sm = ServingModel(out)
    feats = sm.predict(np.random.RandomState(5).randn(2, 64, 3).astype(np.float32))
    assert feats.ndim == 2 and feats.shape[0] == 2
    assert np.isfinite(feats).all()


def test_export_cli_classifier_m2ae(tmp_path):
    """--mode classifier with an M2AE finetune config: the hierarchical
    classifier head exports and serves like the PointTransformer one (the
    serving surface covers every inference family)."""
    from gm3d_tpu.serve import ServingModel

    cfg = {
        "model": {
            "NAME": "Point_M2AE_ModelNet40", "cls_dim": 5,
            "num_groups": [32, 16, 8], "group_sizes": [8, 4, 4],
            "encoder_depths": [1, 1, 1], "encoder_dims": [24, 48, 96],
            "local_radius": [0.32, 0.64, 1.28],
            "num_heads": 2, "drop_path_rate": 0.0,
        },
        "npoints": 64, "total_bs": 4, "max_epoch": 1,
    }
    cfg_path = tmp_path / "tiny_m2ae_cls.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = str(tmp_path / "m2ae_cls.gm3dx")
    run_cli("gm3d_tpu.cli.export_model", [
        "ex", "--config", str(cfg_path), "--out", out,
        "--export_batch", "2", "--output_dir", str(tmp_path / "exp"),
    ])
    sm = ServingModel(out)
    logits = sm.predict(np.random.RandomState(8).randn(3, 64, 3).astype(np.float32))
    assert logits.shape == (3, 5)
    assert np.isfinite(logits).all()


def test_export_cli_features_gm3d(tmp_path):
    """--model_family gm3d featurizer export: the full-size GM3DStudent
    (the flagship pretrain model; its encode_features is the SVM probe's
    contract) through the random-init warn path."""
    from gm3d_tpu.serve import ServingModel

    out = str(tmp_path / "gm3d_feat.gm3dx")
    run_cli("gm3d_tpu.cli.export_model", [
        "ex", "--config", "configs/pointmae/config.yaml", "--out", out,
        "--mode", "features", "--model_family", "gm3d",
        "--export_batch", "2", "--output_dir", str(tmp_path / "exp"),
    ])
    sm = ServingModel(out)
    feats = sm.predict(np.random.RandomState(6).randn(2, 1024, 3).astype(np.float32))
    assert feats.shape == (2, 384)
    assert np.isfinite(feats).all()


def test_cross_platform_export_uses_portable_fps(tmp_path, monkeypatch):
    """Multi-platform export must NOT embed the Mosaic/Pallas FPS kernel
    (TPU-only, unlowerable elsewhere): whenever the target set differs from
    the current backend, export_forward traces under ops.fps.portable_fps.
    Simulated by making the TPU branch explode if taken."""
    import importlib

    # `import gm3d_tpu.ops.fps` would bind the re-exported fps FUNCTION
    # (package attribute shadows the submodule); go through importlib
    fps_mod = importlib.import_module("gm3d_tpu.ops.fps")
    from gm3d_tpu.serve import build_classifier_fn, export_forward

    model, variables = make_tiny_classifier(npoints=64)
    fn = build_classifier_fn(model, variables, 64)
    # > one lane tile (128): smaller clouds take the XLA loop on TPU anyway
    # (ops/fps.py::fps_indices), which would make this test vacuous
    example = jnp.zeros((2, 200, 3), jnp.float32)

    def boom(*a, **k):
        raise AssertionError("Pallas FPS kernel reached during portable export")

    monkeypatch.setattr(fps_mod, "fps_indices_pallas_batched", boom)
    # pretend we're on a TPU backend so the Pallas branch would be taken
    monkeypatch.setattr(fps_mod.jax, "default_backend", lambda: "tpu")
    with pytest.raises(AssertionError, match="Pallas FPS"):
        with jax.disable_jit():  # force eager trace through fps_indices
            fps_mod.fps_indices(example, 4)
    # multi-platform export routes through portable_fps -> no boom at trace
    exported = export_forward(fn, example, platforms=("cpu",))
    assert list(exported.platforms) == ["cpu"]
    # and the artifact still runs on the real (cpu) backend
    monkeypatch.undo()
    out = np.asarray(jax.jit(exported.call)(example))
    assert out.shape == (2, 5)


def _http(url, data=None, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_http_server_endpoints(tmp_path):
    """The stdlib micro-server: /health, /info, JSON + npy /predict, and a
    400 (not a crash) on malformed input."""
    import io

    from gm3d_tpu.serve.server import make_server

    path, fn = export_tiny_artifact(tmp_path, batch=2)
    server = make_server(path, port=0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{host}:{port}"
    try:
        assert _http(base + "/health")[1] == {"status": "ok"}
        code, info = _http(base + "/info")
        assert code == 200 and info["mode"] == "classifier"

        pts = np.random.RandomState(4).randn(2, 96, 3).astype(np.float32)
        ref = np.asarray(fn(jnp.asarray(pts)))

        body = json.dumps({"points": pts.tolist()}).encode()
        code, out = _http(base + "/predict", body,
                          {"Content-Type": "application/json"})
        assert code == 200
        np.testing.assert_allclose(np.asarray(out["outputs"], np.float32), ref,
                                   rtol=1e-5, atol=1e-6)
        assert out["label"] == np.argmax(ref, axis=-1).tolist()

        buf = io.BytesIO()
        np.save(buf, pts, allow_pickle=False)
        code, out2 = _http(base + "/predict", buf.getvalue(),
                           {"Content-Type": "application/octet-stream"})
        assert code == 200 and out2["label"] == out["label"]

        code, err = _http(base + "/predict",
                          json.dumps({"points": [[[1.0, 2.0]]]}).encode(),
                          {"Content-Type": "application/json"})
        assert code == 400 and "error" in err

        # non-object JSON body (bare list) -> 400, not a dropped connection
        code, err = _http(base + "/predict",
                          json.dumps([[[1.0, 2.0, 3.0]]]).encode(),
                          {"Content-Type": "application/json"})
        assert code == 400 and "points" in err["error"]

        # ragged nested lists raise TypeError inside np.asarray -> 400
        code, err = _http(base + "/predict",
                          json.dumps({"points": [[[1.0, 2.0, 3.0], [1.0]]]}).encode(),
                          {"Content-Type": "application/json"})
        assert code == 400 and "error" in err

        assert _http(base + "/nope")[0] == 404
    finally:
        server.shutdown()
        server.server_close()


class TestDynamicBatcher:
    """Dynamic request batching (serve/batcher.py): concurrent small
    requests must coalesce into shared device calls without changing any
    output (the artifact batch is static — uncoalesced, K concurrent
    single-cloud requests pay K full-batch dispatches)."""

    def _model(self, tmp_path, batch=4):
        from gm3d_tpu.serve import ServingModel

        path, fn = export_tiny_artifact(tmp_path, batch=batch)
        return ServingModel(path), fn

    def test_matches_direct_predict(self, tmp_path):
        from gm3d_tpu.serve import DynamicBatcher

        model, _ = self._model(tmp_path)
        b = DynamicBatcher(model, max_wait_ms=1.0)
        try:
            rng = np.random.RandomState(0)
            close = lambda a, b: np.testing.assert_allclose(  # noqa: E731
                a, b, rtol=1e-5, atol=1e-6)
            single = rng.randn(96, 3).astype(np.float32)
            close(b.predict(single), model.predict(single))
            for n in (1, 3, 4, 7):  # under, at, and over the artifact batch
                pts = rng.randn(n, 96, 3).astype(np.float32)
                close(b.predict(pts), model.predict(pts))
        finally:
            b.close()

    def test_concurrent_requests_coalesce(self, tmp_path):
        """8 threads x 1 cloud against a batch-4 artifact: results match the
        direct path and the device dispatches FEWER than 8 calls (>= 2 are
        needed; without batching it is exactly 8)."""
        from gm3d_tpu.serve import DynamicBatcher

        model, _ = self._model(tmp_path, batch=4)
        calls = {"n": 0}
        inner = model._fn

        def counting_fn(chunk):
            calls["n"] += 1
            return inner(chunk)

        model._fn = counting_fn
        b = DynamicBatcher(model, max_wait_ms=50.0)
        try:
            rng = np.random.RandomState(1)
            clouds = rng.randn(8, 96, 3).astype(np.float32)
            ref = model.predict(clouds)  # 2 chunked calls, not via batcher
            calls["n"] = 0
            results = [None] * 8
            start = threading.Barrier(8)

            def worker(i):
                start.wait()
                results[i] = b.predict(clouds[i])

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for i in range(8):
                np.testing.assert_allclose(results[i], ref[i],
                                           rtol=1e-5, atol=1e-6)
            assert 2 <= calls["n"] < 8, calls["n"]
            assert b.clouds_served == 8 and b.device_calls == calls["n"]
        finally:
            b.close()

    def test_shape_errors_raise_in_caller(self, tmp_path):
        from gm3d_tpu.serve import DynamicBatcher

        model, _ = self._model(tmp_path)
        b = DynamicBatcher(model, max_wait_ms=1.0)
        try:
            with pytest.raises(ValueError, match="expected"):
                b.predict(np.zeros((2, 96, 2), np.float32))  # wrong last dim
            with pytest.raises(ValueError, match="96"):
                b.predict(np.zeros((2, 32, 3), np.float32))  # wrong npoints
            # the batcher still works after rejected requests
            assert b.predict(np.zeros((96, 3), np.float32)).shape == (5,)
        finally:
            b.close()

    def test_device_failure_propagates_to_all_waiters(self, tmp_path):
        from gm3d_tpu.serve import DynamicBatcher

        model, _ = self._model(tmp_path)

        def boom(chunk):
            raise RuntimeError("device gone")

        model._fn = boom
        b = DynamicBatcher(model, max_wait_ms=1.0)
        try:
            with pytest.raises(RuntimeError, match="device gone"):
                b.predict(np.zeros((2, 96, 3), np.float32))
        finally:
            b.close()

    def test_close_rejects_new_requests(self, tmp_path):
        from gm3d_tpu.serve import DynamicBatcher

        model, _ = self._model(tmp_path)
        b = DynamicBatcher(model, max_wait_ms=1.0)
        b.close()
        with pytest.raises(RuntimeError, match="closed"):
            b.predict(np.zeros((96, 3), np.float32))


def test_http_server_dynamic_batching(tmp_path):
    """End-to-end through HTTP: concurrent single-cloud POSTs coalesce
    (visible in /info counters) and return the same labels as a direct
    batched predict; server_close stops the batcher thread."""
    from gm3d_tpu.serve.server import make_server

    path, fn = export_tiny_artifact(tmp_path, batch=4)
    server = make_server(path, port=0, batch_wait_ms=50.0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{host}:{port}"
    try:
        pts = np.random.RandomState(7).randn(6, 96, 3).astype(np.float32)
        ref_labels = np.argmax(np.asarray(fn(jnp.asarray(pts))), -1).tolist()
        labels = [None] * 6
        start = threading.Barrier(6)

        def post(i):
            start.wait()
            body = json.dumps({"points": pts[i].tolist()}).encode()
            code, out = _http(base + "/predict", body,
                              {"Content-Type": "application/json"})
            labels[i] = (code, out["label"])

        threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert [l for _, l in labels] == ref_labels
        assert all(c == 200 for c, _ in labels)
        code, info = _http(base + "/info")
        db = info["dynamic_batching"]
        assert db["clouds_served"] == 6 and db["device_calls"] < 6
    finally:
        server.shutdown()
        server.server_close()
    assert not server.batcher._thread.is_alive()


def test_multi_device_fanout_matches_single_device(tmp_path):
    """Chunks of a large request round-robin over the 8 virtual CPU devices
    with async dispatch (serve/runner.py fan-out); results must equal the
    single-device path (same exported program on every device)."""
    from gm3d_tpu.serve import ServingModel

    path, _ = export_tiny_artifact(tmp_path, batch=4)
    single = ServingModel(path)
    fan = ServingModel(path, devices=jax.devices())
    # 14 clouds = 3 chunks of the batch-4 artifact across >1 device, with a
    # padded tail chunk
    pts = np.random.RandomState(1).randn(14, 96, 3).astype(np.float32)
    np.testing.assert_array_equal(fan.predict(pts), single.predict(pts))
    assert fan.info["serving_devices"] == len(jax.devices())
    # single-cloud promotion still works through the fan-out path
    np.testing.assert_array_equal(fan.predict(pts[0]), single.predict(pts[0]))


def test_make_server_device_fanout(tmp_path):
    """--num_devices -1 builds a ServingModel over all local devices."""
    from gm3d_tpu.serve.server import make_server

    path, _ = export_tiny_artifact(tmp_path, batch=4)
    server = make_server(path, num_devices=-1)
    try:
        model = server.batcher.model if server.batcher else None
        assert model is not None
        assert len(model.devices) == len(jax.devices())
    finally:
        server.server_close()


def test_fanout_round_robin_persists_across_calls(tmp_path, monkeypatch):
    """The round-robin cursor must persist across predict() calls: per-call
    indexing pinned every small request (and every batcher-coalesced batch,
    which is always <= one artifact batch pre-cap) to devices[0], so the
    advertised multi-chip fan-out never engaged under the default serving
    mode."""
    from gm3d_tpu.serve import ServingModel

    path, _ = export_tiny_artifact(tmp_path, batch=4)
    devs = jax.devices()
    fan = ServingModel(path, devices=devs)
    seen = []
    orig_put = jax.device_put

    def recording_put(x, device=None, **kw):
        seen.append(device)
        return orig_put(x, device, **kw)

    monkeypatch.setattr(jax, "device_put", recording_put)
    pts = np.random.RandomState(2).randn(4, 96, 3).astype(np.float32)
    for _ in range(4):  # single-chunk requests
        fan.predict(pts)
    assert seen == [devs[0], devs[1], devs[2], devs[3]], seen


def test_batcher_collect_cap_spans_devices(tmp_path):
    """With a multi-device ServingModel the batcher's collect cap is
    batch x num_devices: one coalesced predict() then fans its chunks out
    round-robin instead of pinning the whole stream to one chip. The
    device_calls counter counts CHUNKS (device dispatches), not coalesced
    groups."""
    from gm3d_tpu.serve import ServingModel
    from gm3d_tpu.serve.batcher import DynamicBatcher

    path, _ = export_tiny_artifact(tmp_path, batch=4)
    devs = jax.devices()[:2]
    model = ServingModel(path, devices=devs)
    single = ServingModel(path)
    batcher = DynamicBatcher(model, max_wait_ms=200.0)
    try:
        assert batcher._cap == 4 * 2
        pts = np.random.RandomState(3).randn(8, 96, 3).astype(np.float32)
        out = batcher.predict(pts)  # one coalesced group of 2 chunks
        np.testing.assert_array_equal(out, single.predict(pts))
        assert batcher.clouds_served == 8
        assert batcher.device_calls == 2
    finally:
        batcher.close()


def test_make_server_rejects_bad_num_devices(tmp_path):
    """0 and <-1 are config errors, not silent topology changes (0 used to
    mean 'all' and -2 sliced devices off the END of the list)."""
    from gm3d_tpu.serve.server import make_server

    path, _ = export_tiny_artifact(tmp_path, batch=4)
    with pytest.raises(ValueError, match="num_devices"):
        make_server(path, num_devices=0)
    with pytest.raises(ValueError, match="num_devices"):
        make_server(path, num_devices=-2)


def test_batcher_close_is_idempotent_and_concurrent_safe(tmp_path):
    """close() from two threads must not deadlock or double-join, and
    predict() strictly after close() raises instead of hanging (the
    closed-check and the enqueue are serialized against close(), so no
    request can land behind the shutdown sentinel)."""
    from gm3d_tpu.serve import ServingModel
    from gm3d_tpu.serve.batcher import DynamicBatcher

    path, _ = export_tiny_artifact(tmp_path, batch=4)
    batcher = DynamicBatcher(ServingModel(path), max_wait_ms=1.0)
    threads = [threading.Thread(target=batcher.close) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert not any(t.is_alive() for t in threads)
    pts = np.zeros((1, 96, 3), np.float32)
    with pytest.raises(RuntimeError, match="closed"):
        batcher.predict(pts)
