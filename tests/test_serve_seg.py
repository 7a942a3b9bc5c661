"""Segmentation serving: two-input ``.gm3dx`` artifacts (points + per-cloud
cls_label), the ServingModel/DynamicBatcher label plumbing, and the HTTP
server's category-restricted argmax response.

The reference has no seg deployment surface at all (its seg model is an
external import, ``main_finetune_segmentation.py:298-305``); this extends the
rebuild's serving subsystem to the third model family. The fidelity contract
matches test_serve.py: exported module == live eval forward
(``train/segmentation.py::make_seg_eval_step`` semantics) to fp32 rounding.
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from cli_harness import run_cli

TINY_SEG_MODEL = {
    "NAME": "PointTransformerSeg",
    "trans_dim": 32,
    "depth": 2,
    "num_heads": 2,
    "group_size": 8,
    "num_group": 16,
    "encoder_dims": 32,
    "drop_path_rate": 0.0,
    "num_classes": 4,
    "cls_dim": 10,  # num_parts
    "feature_blocks": [0, 1],  # default (3,7,11) taps are out of range at depth 2
}
NPOINTS = 64


def make_tiny_seg():
    from gm3d_tpu.config import build_model_from_cfg

    model = build_model_from_cfg(dict(TINY_SEG_MODEL))
    pts0 = jnp.zeros((2, NPOINTS, 3), jnp.float32)
    cls0 = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.key(0), pts0, cls0)
    return model, variables


def export_tiny_seg(tmp_path, batch=4, with_tables=True):
    from gm3d_tpu.serve import build_seg_fn, export_forward, save_artifact

    model, variables = make_tiny_seg()
    fn = build_seg_fn(model, variables)
    exported = export_forward(fn, (
        jnp.zeros((batch, NPOINTS, 3), jnp.float32),
        jnp.zeros((batch,), jnp.int32)))
    manifest = {"mode": "segmentation", "model": "tiny_seg",
                "npoints": NPOINTS, "ckpt_step": -1}
    if with_tables:
        # 4 tiny categories, disjoint part ranges over the 10 parts
        manifest["seg_classes"] = {"a": [0, 1, 2], "b": [3, 4], "c": [5, 6],
                                   "d": [7, 8, 9]}
        manifest["cls_names"] = ["a", "b", "c", "d"]
    path = str(tmp_path / "tiny_seg.gm3dx")
    save_artifact(path, exported, manifest)
    return path, fn


def test_seg_export_roundtrip(tmp_path):
    """Deserialized two-input artifact == the live jitted seg forward, and
    the manifest records the extra label input additively."""
    from gm3d_tpu.serve import load_artifact

    path, fn = export_tiny_seg(tmp_path)
    loaded, manifest = load_artifact(path)
    rng = np.random.RandomState(0)
    pts = rng.randn(4, NPOINTS, 3).astype(np.float32)
    cls = np.array([0, 1, 2, 3], np.int32)
    np.testing.assert_allclose(
        loaded(pts, cls), np.asarray(fn(jnp.asarray(pts), jnp.asarray(cls))),
        rtol=1e-5, atol=1e-6)
    assert manifest["input_shape"] == [4, NPOINTS, 3]
    assert manifest["output_shape"] == [4, NPOINTS, 10]
    assert manifest["extra_inputs"] == [{"shape": [4], "dtype": "int32"}]
    # wrong arg count and wrong label shape are loud errors
    with pytest.raises(ValueError, match="takes 2 inputs"):
        loaded(pts)
    with pytest.raises(ValueError, match="extra input shape"):
        loaded(pts, np.zeros((3,), np.int32))


def test_m2ae_seg_export_roundtrip(tmp_path):
    """The M2AE-backbone seg model (Point_M2AE_SEG) exports through the same
    two-input path: deserialized artifact == live forward."""
    from gm3d_tpu.config import build_model_from_cfg
    from gm3d_tpu.serve import build_seg_fn, export_forward, load_artifact, save_artifact

    model = build_model_from_cfg({
        "NAME": "Point_M2AE_SEG",
        "num_groups": [16, 8, 4], "group_sizes": [8, 4, 4],
        "encoder_depths": [1, 1, 1], "encoder_dims": [16, 32, 48],
        "local_radius": [0.32, 0.64, 1.28], "num_heads": 2,
        "drop_path_rate": 0.0, "num_classes": 4, "cls_dim": 10,
    })
    pts0 = jnp.zeros((2, NPOINTS, 3), jnp.float32)
    cls0 = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.key(0), pts0, cls0)
    fn = build_seg_fn(model, variables)
    exported = export_forward(fn, (
        jnp.zeros((4, NPOINTS, 3), jnp.float32), jnp.zeros((4,), jnp.int32)))
    path = str(tmp_path / "m2ae_seg.gm3dx")
    save_artifact(path, exported, {"mode": "segmentation",
                                   "model": "tiny_m2ae_seg",
                                   "npoints": NPOINTS, "ckpt_step": -1})
    loaded, manifest = load_artifact(path)
    rng = np.random.RandomState(5)
    pts = rng.randn(4, NPOINTS, 3).astype(np.float32)
    cls = np.array([0, 1, 2, 3], np.int32)
    np.testing.assert_allclose(
        loaded(pts, cls), np.asarray(fn(jnp.asarray(pts), jnp.asarray(cls))),
        rtol=1e-5, atol=1e-6)
    assert manifest["output_shape"] == [4, NPOINTS, 10]


def test_seg_serving_model_pads_and_chunks(tmp_path):
    """Labels pad/chunk in lockstep with points; label-contract violations
    raise ValueError on the request thread."""
    from gm3d_tpu.serve import ServingModel

    path, fn = export_tiny_seg(tmp_path, batch=4)
    sm = ServingModel(path)
    assert sm.needs_labels
    rng = np.random.RandomState(1)
    pts = rng.randn(7, NPOINTS, 3).astype(np.float32)
    cls = (np.arange(7) % 4).astype(np.int32)

    ref4 = np.asarray(fn(jnp.asarray(pts[:4]), jnp.asarray(cls[:4])))
    out = sm.predict(pts, cls)  # chunk: 4 + padded 3
    assert out.shape == (7, NPOINTS, 10)
    np.testing.assert_allclose(out[:4], ref4, rtol=1e-5, atol=1e-6)
    # pad path: rows must equal the same rows evaluated among zero-pads
    pad_ref = np.asarray(fn(
        jnp.asarray(np.concatenate([pts[4:7], np.zeros((1, NPOINTS, 3),
                                                       np.float32)])),
        jnp.asarray(np.concatenate([cls[4:7], np.zeros(1, np.int32)]))))[:3]
    np.testing.assert_allclose(out[4:], pad_ref, rtol=1e-5, atol=1e-6)

    # single cloud + scalar label promotion
    single = sm.predict(pts[0], 2)
    assert single.shape == (NPOINTS, 10)
    np.testing.assert_array_equal(
        single, sm.predict(pts[:1], np.array([2]))[0])

    with pytest.raises(ValueError, match="requires cls_label"):
        sm.predict(pts)
    with pytest.raises(ValueError, match="cls_label"):
        sm.predict(pts, cls[:3])  # wrong label count
    with pytest.raises(ValueError, match="numeric"):
        sm.predict(pts[0], np.array("a"))
    with pytest.raises(ValueError, match="empty request"):
        sm.predict(np.zeros((0, NPOINTS, 3), np.float32), np.zeros(0))


def test_check_labels_rejects_fractional_and_nan():
    """Fractional labels would silently truncate in the int cast and NaN
    compares False against both range bounds — both must 400 like an
    out-of-range index does (advisor round-3 finding)."""
    from gm3d_tpu.serve.runner import check_labels

    ok = check_labels(np.array([0, 3]), 2, False, np.int32, num_classes=4)
    assert ok.dtype == np.int32
    with pytest.raises(ValueError, match="finite integers"):
        check_labels(np.array([0.0, 3.7]), 2, False, np.int32, num_classes=16)
    with pytest.raises(ValueError, match="finite integers"):
        check_labels(np.array([np.nan, 1.0]), 2, False, np.int32, num_classes=16)
    with pytest.raises(ValueError, match="finite integers"):
        check_labels(np.array([np.inf, 1.0]), 2, False, np.int32)


def test_classifier_artifact_rejects_labels(tmp_path):
    """A label on a single-input artifact is a client error, not a silent
    drop."""
    from test_serve import export_tiny_artifact

    from gm3d_tpu.serve import ServingModel

    path, _ = export_tiny_artifact(tmp_path)
    sm = ServingModel(path)
    assert not sm.needs_labels
    with pytest.raises(ValueError, match="takes no cls_label"):
        sm.predict(np.zeros((2, 96, 3), np.float32), np.zeros(2, np.int32))


def test_seg_batcher_carries_labels(tmp_path):
    """Coalesced seg requests keep each cloud's own category: concurrent
    single-cloud predicts with DIFFERENT labels must match the direct
    per-cloud results (a label mixup would misrestrict the parts)."""
    from gm3d_tpu.serve import DynamicBatcher, ServingModel

    path, _ = export_tiny_seg(tmp_path, batch=4)
    model = ServingModel(path)
    b = DynamicBatcher(model, max_wait_ms=50.0)
    try:
        rng = np.random.RandomState(2)
        pts = rng.randn(6, NPOINTS, 3).astype(np.float32)
        cls = (np.arange(6) % 4).astype(np.int32)
        ref = model.predict(pts, cls)
        results = [None] * 6
        start = threading.Barrier(6)

        def worker(i):
            start.wait()
            results[i] = b.predict(pts[i], int(cls[i]))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(6):
            np.testing.assert_allclose(results[i], ref[i],
                                       rtol=1e-5, atol=1e-6)
        assert b.clouds_served == 6
        # batched predict too
        np.testing.assert_allclose(b.predict(pts, cls), ref,
                                   rtol=1e-5, atol=1e-6)
        with pytest.raises(ValueError, match="requires cls_label"):
            b.predict(pts)
    finally:
        b.close()


def _http(url, data=None, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_http_seg_endpoint(tmp_path):
    """POST /predict with cls_label: response label is the CATEGORY-
    RESTRICTED per-point argmax from the manifest tables; logits only on
    request; missing label is a 400."""
    from gm3d_tpu.serve.server import make_server
    from gm3d_tpu.train.segmentation import category_restricted_argmax

    path, fn = export_tiny_seg(tmp_path, batch=2)
    server = make_server(path, port=0, batch_wait_ms=1.0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://{host}:{port}"
    try:
        code, info = _http(base + "/info")
        assert code == 200 and info["mode"] == "segmentation"
        assert info["extra_inputs"] == [{"shape": [2], "dtype": "int32"}]

        rng = np.random.RandomState(3)
        pts = rng.randn(2, NPOINTS, 3).astype(np.float32)
        cls = np.array([1, 3], np.int32)
        logits = np.asarray(fn(jnp.asarray(pts), jnp.asarray(cls)))
        seg_classes = {"a": [0, 1, 2], "b": [3, 4], "c": [5, 6],
                       "d": [7, 8, 9]}
        expect = category_restricted_argmax(
            logits, cls, seg_classes, ["a", "b", "c", "d"])

        body = json.dumps({"points": pts.tolist(),
                           "cls_label": cls.tolist()}).encode()
        code, out = _http(base + "/predict", body,
                          {"Content-Type": "application/json"})
        assert code == 200
        assert out["label"] == expect.tolist()
        # every predicted part is inside the cloud's own category
        assert set(out["label"][0]) <= {3, 4}
        assert set(out["label"][1]) <= {7, 8, 9}
        assert "outputs" not in out  # logits are opt-in for seg

        body = json.dumps({"points": pts.tolist(), "cls_label": cls.tolist(),
                           "return_logits": True}).encode()
        code, out2 = _http(base + "/predict", body,
                           {"Content-Type": "application/json"})
        assert code == 200 and out2["label"] == out["label"]
        np.testing.assert_allclose(np.asarray(out2["outputs"], np.float32),
                                   logits, rtol=1e-4, atol=1e-5)

        # missing label -> 400 with a pointed message
        body = json.dumps({"points": pts.tolist()}).encode()
        code, err = _http(base + "/predict", body,
                          {"Content-Type": "application/json"})
        assert code == 400 and "cls_label" in err["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_seg_label_range_validation(tmp_path):
    """cls_label outside [0, num_categories) is a request error (400), both
    direct and via HTTP: an out-of-range index would one-hot to all-zeros in
    the model and then crash (or, negative, silently pick the WRONG
    category's part table) in the server's restricted argmax."""
    from gm3d_tpu.serve import ServingModel
    from gm3d_tpu.serve.server import make_server

    path, _ = export_tiny_seg(tmp_path, batch=2)
    sm = ServingModel(path)
    pts = np.random.RandomState(5).randn(2, NPOINTS, 3).astype(np.float32)
    for bad in ([99, 0], [0, -1]):
        with pytest.raises(ValueError, match=r"\[0, 4\)"):
            sm.predict(pts, np.array(bad, np.int32))

    server = make_server(path, port=0, batch_wait_ms=1.0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"points": pts.tolist(),
                           "cls_label": [99, 0]}).encode()
        code, err = _http(f"http://{host}:{port}/predict", body,
                          {"Content-Type": "application/json"})
        assert code == 400 and "cls_label" in err["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_seg_export_cli(tmp_path):
    """cli/export_model.py --mode segmentation end to end (random-init warn
    path): manifest carries the ShapeNetPart category tables and ServingModel
    serves (points, labels)."""
    from gm3d_tpu.data.datasets import SEG_CLASSES
    from gm3d_tpu.serve import ServingModel

    cfg = {"model": dict(TINY_SEG_MODEL, num_classes=16),
           "npoints": NPOINTS, "total_bs": 4, "max_epoch": 1}
    cfg_path = tmp_path / "tiny_seg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = str(tmp_path / "seg.gm3dx")
    path = run_cli("gm3d_tpu.cli.export_model", [
        "ex", "--config", str(cfg_path), "--out", out,
        "--mode", "segmentation", "--export_batch", "2",
        "--output_dir", str(tmp_path / "exp"),
    ])
    assert path == out
    sm = ServingModel(out)
    assert sm.manifest["mode"] == "segmentation"
    assert sm.manifest["cls_names"] == sorted(SEG_CLASSES)
    assert sm.manifest["seg_classes"] == {k: list(v)
                                          for k, v in SEG_CLASSES.items()}
    pred = sm.predict(np.random.RandomState(4).randn(3, NPOINTS, 3)
                      .astype(np.float32), np.array([0, 5, 15]))
    assert pred.shape == (3, NPOINTS, 10)
    assert np.isfinite(pred).all()


def test_seg_export_cli_rejects_input_points_mismatch(tmp_path):
    """--input_points != npoints is a config error for seg (per-point
    outputs; in-graph FPS would relabel a different cloud)."""
    cfg = {"model": dict(TINY_SEG_MODEL),
           "npoints": NPOINTS, "total_bs": 4, "max_epoch": 1}
    cfg_path = tmp_path / "tiny_seg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="input_points"):
        run_cli("gm3d_tpu.cli.export_model", [
            "ex", "--config", str(cfg_path), "--out",
            str(tmp_path / "x.gm3dx"), "--mode", "segmentation",
            "--export_batch", "2", "--input_points", "128",
            "--output_dir", str(tmp_path / "exp"),
        ])
