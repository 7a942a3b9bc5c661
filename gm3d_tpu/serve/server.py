"""Stdlib HTTP micro-server over a :class:`ServingModel`.

Zero extra dependencies (``http.server``), threaded, one process per HOST —
``num_devices`` fans request chunks out over the host's local chips
(round-robin, async dispatch; see ``serve/runner.py``), and scale-out beyond
one host is a load balancer in front of N host replicas. The data-parallel
mesh is a TRAINING construct; serving wants independent per-chip programs,
not collectives.

Endpoints:
  GET  /health    -> {"status": "ok"}
  GET  /info      -> the artifact manifest
  POST /predict   -> body is either JSON {"points": [[[x,y,z],...],...]}
                     or a raw ``.npy`` array (Content-Type:
                     application/octet-stream); response is JSON
                     {"outputs": ..., "label": ...} (``label`` = argmax over
                     the last axis, only for classifier artifacts)

Segmentation artifacts (``--mode segmentation`` exports) additionally take
``"cls_label"`` in the JSON body — the per-cloud object category (int, or a
list matching the batch). The response's ``label`` is the per-point part id
via CATEGORY-RESTRICTED argmax (only the parts valid for each shape's
category, the reference eval protocol — ``train/segmentation.py``), using
the category→parts table baked into the manifest at export time. Per-point
logits are large (N×num_parts per cloud), so ``outputs`` is only included
when the body sets ``"return_logits": true``.
"""

from __future__ import annotations

import io
import json
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from gm3d_tpu.serve.batcher import DynamicBatcher
from gm3d_tpu.serve.runner import ServingModel


def _seg_labels(logits: np.ndarray, cls_label, manifest: dict) -> np.ndarray:
    """Per-point part ids from seg logits — category-restricted argmax when
    the manifest carries the export-time category→parts table (the
    reference eval protocol, ``train/segmentation.py::category_restricted_
    argmax``); plain argmax otherwise."""
    seg_classes = manifest.get("seg_classes")
    cls_names = manifest.get("cls_names")
    if seg_classes is None or cls_names is None or cls_label is None:
        return np.argmax(logits, axis=-1)
    from gm3d_tpu.train.segmentation import category_restricted_argmax

    single = logits.ndim == 2
    if single:
        logits = logits[None]
    labels = np.atleast_1d(np.asarray(cls_label))
    pred = category_restricted_argmax(logits, labels, seg_classes, cls_names)
    return pred[0] if single else pred


def _make_handler(model: ServingModel, backend):
    class Handler(BaseHTTPRequestHandler):
        # quiet the per-request stderr lines; the CLI logs startup/shutdown
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            elif self.path == "/info":
                info = model.info
                if isinstance(backend, DynamicBatcher):
                    info["dynamic_batching"] = {
                        "max_wait_ms": backend.max_wait * 1000.0,
                        "device_calls": backend.device_calls,
                        "clouds_served": backend.clouds_served,
                    }
                self._send(200, info)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            cls_label = None
            return_logits = True
            try:
                length = int(self.headers.get("Content-Length", 0))
                blob = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "application/json")
                if ctype.startswith("application/octet-stream"):
                    points = np.load(io.BytesIO(blob), allow_pickle=False)
                else:
                    body = json.loads(blob)
                    if not isinstance(body, dict) or "points" not in body:
                        raise ValueError(
                            'body must be a JSON object {"points": [...]}')
                    points = np.asarray(body["points"], np.float32)
                    if "cls_label" in body:
                        cls_label = np.asarray(body["cls_label"])
                    if model.manifest.get("mode") == "segmentation":
                        # per-point logits are huge; opt-in only
                        return_logits = bool(body.get("return_logits", False))
            except (ValueError, KeyError, TypeError) as e:
                # json.JSONDecodeError is a ValueError; TypeError covers
                # ragged nested lists np.asarray rejects
                self._send(400, {"error": str(e)})
                return
            try:
                out = backend.predict(points, cls_label) \
                    if model.needs_labels or cls_label is not None \
                    else backend.predict(points)
            except ValueError as e:  # shape contract violations -> client error
                self._send(400, {"error": str(e)})
                return
            except Exception as e:  # device/runtime failure -> server error
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            payload = {}
            if return_logits:
                payload["outputs"] = out.tolist()
            mode = model.manifest.get("mode")
            if mode == "classifier":
                payload["label"] = np.argmax(out, axis=-1).tolist()
            elif mode == "segmentation":
                payload["label"] = _seg_labels(
                    out, cls_label, model.manifest).tolist()
            self._send(200, payload)

    return Handler


class _Server(ThreadingHTTPServer):
    """ThreadingHTTPServer that owns an optional DynamicBatcher; closing the
    server stops the batcher thread (pending requests are served first)."""

    batcher: DynamicBatcher | None = None

    def server_close(self):
        if self.batcher is not None:
            self.batcher.close()
        super().server_close()


def make_server(artifact_path: str, host: str = "127.0.0.1", port: int = 0,
                batch_wait_ms: float = 3.0,
                dynamic_batching: bool = True,
                num_devices: int = 1) -> ThreadingHTTPServer:
    """Build (but don't start) the server; ``port=0`` picks a free port
    (``server.server_address[1]`` reports it) — used by the tests.

    ``dynamic_batching`` coalesces concurrent requests into shared device
    calls (see ``serve/batcher.py``); off = each request dispatches its own
    padded batch, the pre-batcher behavior.

    ``num_devices``: fan multi-chunk requests out over this many local
    devices (-1 = all); 1 keeps the single-device path."""
    if num_devices < -1 or num_devices == 0:
        raise ValueError(
            f"num_devices must be -1 (all local devices) or >= 1, "
            f"got {num_devices}")
    devices = None
    if num_devices != 1:
        import jax

        local = jax.local_devices()
        if num_devices > len(local):
            logging.getLogger("gm3d.serve").warning(
                "requested %d serving devices but only %d are local; "
                "using %d", num_devices, len(local), len(local))
        devices = local if num_devices == -1 else local[:num_devices]
    model = ServingModel(artifact_path, devices=devices)
    backend = DynamicBatcher(model, batch_wait_ms) if dynamic_batching else model
    server = _Server((host, port), _make_handler(model, backend))
    server.batcher = backend if isinstance(backend, DynamicBatcher) else None
    server.serving_model = model
    return server
