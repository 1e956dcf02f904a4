"""HTTP inference endpoint over a serving artifact.

stdlib-only (``http.server``): no web-framework dependency, deployable
anywhere the artifact loads. The reference ships nothing beyond raw .ckpt
links (`/root/reference/README.md:109-115`); this completes the deployment
story: train -> export (``serving.py``) -> serve (this module).

    python -m m2mixer_tpu.serving serve -d artifacts/avmnist_b --port 8000

Endpoints:
    GET  /healthz   -> {"status": "ok"}
    GET  /info      -> artifact metadata (features, dtypes, buckets, format)
    POST /predict   -> model outputs
        Content-Type: application/json  body {"image": [[...]], ...}
          (nested lists per feature; reply is JSON with "logits" and
          "branch_logits" as nested lists)
        Content-Type: application/x-npz  body = .npz bytes with one array
          per feature; reply is .npz with "logits" and "branch_logits_<i>"
          (the efficient binary path)

Any request batch size is accepted — the batch-bucketed
``ServedModel.predict`` zero-pads to the nearest compiled bucket and splits
oversize requests. Device dispatch is serialized with a lock (one
accelerator, many HTTP threads).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

import numpy as np

__all__ = ["make_server", "serve_forever"]


def _parse_json_features(body: bytes, meta: dict) -> Dict[str, np.ndarray]:
    obj = json.loads(body.decode("utf-8"))
    if not isinstance(obj, dict):
        raise ValueError("JSON body must be an object mapping feature "
                         "names to arrays")
    return {k: np.asarray(v, dtype=meta["dtypes"].get(k))
            for k, v in obj.items() if k != "label"}


def _parse_npz_features(body: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(body)) as z:
        return {k: z[k] for k in z.files if k != "label"}


def _validate(features: Dict[str, np.ndarray], meta: dict) -> None:
    want = meta["features"]
    missing = sorted(set(want) - set(features))
    extra = sorted(set(features) - set(want))
    if missing or extra:
        raise ValueError(f"feature mismatch: missing={missing} extra={extra} "
                         f"(artifact expects {sorted(want)})")
    sizes = set()
    for k, shp in want.items():
        a = features[k]
        if tuple(a.shape[1:]) != tuple(shp):
            raise ValueError(f"feature {k!r}: trailing shape {a.shape[1:]} "
                             f"!= artifact spec {tuple(shp)}")
        sizes.add(int(a.shape[0]))
    if len(sizes) != 1:
        raise ValueError(f"inconsistent batch sizes across features: {sizes}")
    if 0 in sizes:
        raise ValueError("empty batch")


def make_server(model, host: str = "127.0.0.1", port: int = 8000):
    """Build (not start) a ``ThreadingHTTPServer`` wrapping ``model``
    (a ``serving.ServedModel``). Port 0 picks a free port; the bound
    address is ``server.server_address``."""

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        # quiet per-request stderr logging; errors still surface in replies
        def log_message(self, fmt, *args):
            pass

        def _reply(self, code: int, payload: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _reply_json(self, code: int, obj) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._reply_json(200, {"status": "ok"})
            elif self.path == "/info":
                meta = model.meta
                self._reply_json(200, {
                    "features": {k: list(v) for k, v in meta["features"].items()},
                    "dtypes": meta["dtypes"],
                    "buckets": model.buckets,
                    "format": meta["format"],
                    **{k: meta[k] for k in ("ensemble_members", "quantize")
                       if meta.get(k) is not None},
                })
            else:
                self._reply_json(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply_json(404, {"error": f"unknown path {self.path!r}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if ctype == "application/x-npz":
                    features = _parse_npz_features(body)
                else:
                    features = _parse_json_features(body, model.meta)
                _validate(features, model.meta)
            except Exception as e:  # malformed request
                self._reply_json(400, {"error": str(e)})
                return
            try:
                with lock:  # one accelerator; serialize dispatch
                    out = model.predict(features)
            except Exception as e:  # model-side failure
                self._reply_json(500, {"error": str(e)})
                return
            if ctype == "application/x-npz":
                buf = io.BytesIO()
                arrays = {"logits": np.asarray(out["logits"])}
                for i, b in enumerate(out.get("branch_logits", ())):
                    arrays[f"branch_logits_{i}"] = np.asarray(b)
                np.savez(buf, **arrays)
                self._reply(200, buf.getvalue(), "application/x-npz")
            else:
                self._reply_json(200, {
                    "logits": np.asarray(out["logits"]).tolist(),
                    "branch_logits": [np.asarray(b).tolist()
                                      for b in out.get("branch_logits", ())],
                })

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(model, host: str = "127.0.0.1", port: int = 8000) -> None:
    srv = make_server(model, host, port)
    h, p = srv.server_address[:2]
    print(f"[serving] listening on http://{h}:{p} "
          f"(buckets {model.buckets}, format {model.meta['format']})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
