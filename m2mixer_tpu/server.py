"""HTTP inference endpoint over one or more serving artifacts.

stdlib-only (``http.server``): no web-framework dependency, deployable
anywhere the artifact loads. The reference ships nothing beyond raw .ckpt
links (`/root/reference/README.md:109-115`); this completes the deployment
story: train -> export (``serving.py``) -> serve (this module).

    python -m m2mixer_tpu.serving serve -d artifacts/avmnist_b --port 8000
    # multi-model: name=dir pairs share the chip, each with its own routes
    python -m m2mixer_tpu.serving serve -d b=artifacts/b -d s=artifacts/s_int8

Endpoints:
    GET  /healthz   -> {"status": "ok", "models": [names]}
    GET  /info      -> artifact metadata (features, dtypes, buckets, format)
    GET  /metrics   -> Prometheus text: request/error/sample counters,
                       device-batch count (coalescing ratio), latency
                       quantiles (p50/p90/p99), uptime; one series per
                       model (label ``model="name"``) when multi-model
    POST /predict   -> model outputs
        Content-Type: application/json  body {"image": [[...]], ...}
          (nested lists per feature; reply is JSON with "logits" and
          "branch_logits" as nested lists)
        Content-Type: application/x-npz  body = .npz bytes with one array
          per feature; reply is .npz with "logits" and "branch_logits_<i>"
          (the efficient binary path)

With multiple models, ``/predict/<name>`` and ``/info/<name>`` route per
model (the bare paths work only in single-model mode).

Any request batch size is accepted — the batch-bucketed
``ServedModel.predict`` zero-pads to the nearest compiled bucket and splits
oversize requests.

Concurrent requests are **coalesced**: one dispatcher thread owns the
accelerator and, each time it frees up, drains every request already
waiting, concatenates them into one batch, runs a single bucketed
``predict``, and splits the outputs back per request. A lone request is
dispatched immediately (no artificial wait), so coalescing adds zero
latency while concurrent clients share one device program instead of
queueing N dispatches — the serving analog of the training path's batched
GEMMs. Disable with ``serve --no-coalesce`` (falls back to a plain lock).
"""

from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

import numpy as np

__all__ = ["make_server", "serve_forever", "RequestCoalescer", "ServerStats",
           "render_metrics", "warmup_model"]


def _parse_json_features(body: bytes, meta: dict) -> Dict[str, np.ndarray]:
    obj = json.loads(body.decode("utf-8"))
    if not isinstance(obj, dict):
        raise ValueError("JSON body must be an object mapping feature "
                         "names to arrays")
    return {k: np.asarray(v, dtype=meta["dtypes"].get(k))
            for k, v in obj.items() if k != "label"}


def _parse_npz_features(body: bytes, meta: dict) -> Dict[str, np.ndarray]:
    # cast to the artifact's dtypes: a float64 body would otherwise reach
    # the model raw — the executable format's pinned input avals cannot
    # absorb it (no recompile at serve time), and under coalescing one
    # f64 request would upcast its whole shared batch
    with np.load(io.BytesIO(body)) as z:
        return {k: np.asarray(z[k], dtype=meta["dtypes"].get(k))
                for k in z.files if k != "label"}


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


class _Pending:
    __slots__ = ("features", "n", "event", "result", "error")

    def __init__(self, features: Dict[str, np.ndarray], n: int):
        self.features = features
        self.n = n
        self.event = threading.Event()
        self.result = None
        self.error = None


class RequestCoalescer:
    """Dynamic micro-batching over ``model.predict``.

    A single dispatcher thread owns the device. Each cycle it blocks for
    one request, then drains (non-blocking) everything else already queued
    up to ``max_batch`` total samples, concatenates the feature arrays on
    axis 0, runs ONE ``predict``, and slices each output leaf back to the
    per-request ranges. While a batch is on the device new requests pile
    up in the queue and ride the next cycle — so under load the effective
    batch size adapts to the arrival rate with no tuning knob and a lone
    request never waits on a timer.

    Failures of a coalesced batch propagate to every member request (the
    per-request validation in the HTTP handler runs BEFORE enqueue, so a
    malformed request can't poison its batch-mates).
    """

    def __init__(self, model, max_batch: int = 4096):
        self._model = model
        self._max_batch = int(max_batch)
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serving-coalescer")
        self._thread.start()
        self.batches_run = 0       # observability: device dispatch count
        self.requests_served = 0

    def submit(self, features: Dict[str, np.ndarray], n: int) -> dict:
        if self._stop.is_set():
            raise RuntimeError("server shutting down")
        req = _Pending(features, n)
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def close(self) -> None:
        self._stop.set()
        self._queue.put(None)  # wake the dispatcher
        self._thread.join(timeout=5)
        while True:  # fail any stranded waiters instead of hanging them
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                r.error = RuntimeError("server shutting down")
                r.event.set()

    # ------------------------------------------------------------ internals
    def _take_cycle(self):
        first = self._queue.get()
        if first is None:
            return []
        reqs, total = [first], first.n
        while total < self._max_batch:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if r is None:
                self._stop.set()
                break
            # an oversize straggler would blow past max_batch: leave it
            # for its own cycle rather than splitting a request
            if total + r.n > self._max_batch and reqs:
                self._queue.put(r)
                break
            reqs.append(r)
            total += r.n
        return reqs

    def _loop(self) -> None:
        while not self._stop.is_set():
            reqs = self._take_cycle()
            if not reqs:
                continue
            try:
                if len(reqs) == 1:
                    merged = reqs[0].features
                else:
                    merged = {
                        k: np.concatenate([np.asarray(r.features[k]) for r in reqs])
                        for k in reqs[0].features
                    }
                out = self._model.predict(merged)
                self.batches_run += 1
                off = 0
                for r in reqs:
                    lo, hi = off, off + r.n
                    r.result = {
                        k: (tuple(np.asarray(b)[lo:hi] for b in v)
                            if isinstance(v, (tuple, list))
                            else np.asarray(v)[lo:hi])
                        for k, v in out.items()
                    }
                    off = hi
                self.requests_served += len(reqs)
            except Exception as e:  # propagate to every waiter in the batch
                for r in reqs:
                    r.error = e
            finally:
                for r in reqs:
                    r.event.set()


class ServerStats:
    """Thread-safe request counters + a bounded latency reservoir, exposed
    at ``GET /metrics`` in Prometheus text exposition format."""

    def __init__(self, window: int = 1024):
        import collections
        import time as _time

        self._lock = threading.Lock()
        self._lat = collections.deque(maxlen=window)
        self._t0 = _time.monotonic()
        self.requests = 0
        self.errors = 0
        self.samples = 0

    def record(self, n_samples: int, seconds: float, error: bool = False) -> None:
        with self._lock:
            self.requests += 1
            if error:
                self.errors += 1
            else:
                self.samples += int(n_samples)
                self._lat.append(float(seconds))

    def snapshot(self):
        with self._lock:
            return self.requests, self.errors, self.samples, sorted(self._lat)


def render_metrics(entries) -> str:
    """Prometheus text for ``entries`` = [(name, stats, coalescer)]. One
    TYPE header per metric; one series per model (``model="name"`` label
    when the name is non-empty, i.e. multi-model serving)."""
    import time as _time

    def lbl(name, extra=""):
        parts = ([f'model="{name}"'] if name else []) + ([extra] if extra else [])
        return "{" + ",".join(parts) + "}" if parts else ""

    rows = []
    for name, stats, coalescer in entries:
        reqs, errs, samples, lat = stats.snapshot()

        def q(p, lat=lat):
            return lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0

        rows.append((name, reqs, errs, samples,
                     coalescer.batches_run if coalescer else reqs - errs,
                     {p: q(float(p)) for p in ("0.5", "0.9", "0.99")},
                     _time.monotonic() - stats._t0))

    lines = ["# TYPE serving_requests_total counter"]
    lines += [f"serving_requests_total{lbl(n)} {r}" for n, r, *_ in rows]
    lines += ["# TYPE serving_request_errors_total counter"]
    lines += [f"serving_request_errors_total{lbl(n)} {e}"
              for n, _, e, *_ in rows]
    lines += ["# TYPE serving_samples_total counter"]
    lines += [f"serving_samples_total{lbl(n)} {s}"
              for n, _, _, s, *_ in rows]
    lines += ["# HELP serving_device_batches_total device dispatches; under "
              "coalescing many requests share one batch",
              "# TYPE serving_device_batches_total counter"]
    lines += [f"serving_device_batches_total{lbl(n)} {b}"
              for n, _, _, _, b, *_ in rows]
    lines += ["# TYPE serving_request_latency_seconds summary"]
    for n, _, _, _, _, qs, _ in rows:
        lines += [f'serving_request_latency_seconds{lbl(n, f"quantile=\"{p}\"")} '
                  f"{v:.6f}" for p, v in qs.items()]
    lines += ["# TYPE serving_uptime_seconds gauge"]
    lines += [f"serving_uptime_seconds{lbl(n)} {up:.3f}"
              for n, *_, up in rows]
    return "\n".join(lines) + "\n"


def warmup_model(model) -> None:
    """Pre-compile every bucket with a zero batch so the first real request
    doesn't pay the compile (a fresh process's first request through a
    remote compiler was measured at 46 s; warmed, it's milliseconds)."""
    for b in model.buckets:
        feats = {k: np.zeros((b, *shp), dtype=model.meta["dtypes"][k])
                 for k, shp in model.meta["features"].items()}
        model.predict(feats)


def make_server(model, host: str = "127.0.0.1", port: int = 8000,
                coalesce: bool = True):
    """Build (not start) a ``ThreadingHTTPServer``. ``model`` is a single
    ``serving.ServedModel`` (bare ``/predict`` + ``/info`` routes) or a
    ``{name: ServedModel}`` dict (``/predict/<name>`` + ``/info/<name>``;
    every model shares the chip but gets its own coalescer and metrics
    series). Port 0 picks a free port; the bound address is
    ``server.server_address``. ``coalesce=False`` serializes requests with
    a plain lock instead of the batching dispatchers."""
    import time as _time

    if isinstance(model, dict):
        if not model:
            raise ValueError("no models to serve")
        if any(not name for name in model):
            raise ValueError("multi-model serving requires non-empty names")
        models = dict(model)
        single = None
    else:
        models = {"": model}
        single = ""
    lock = threading.Lock()  # one accelerator: shared across models
    coalescers = {name: RequestCoalescer(m) if coalesce else None
                  for name, m in models.items()}
    stats = {name: ServerStats() for name in models}

    def resolve(path: str, base: str):
        """'/predict' -> the single model; '/predict/<name>' -> that model.
        Returns (name, model) or None."""
        if path == base:
            return (single, models[single]) if single is not None else None
        if path.startswith(base + "/"):
            name = path[len(base) + 1:]
            if name in models:
                return name, models[name]
        return None

    def info_payload(m):
        meta = m.meta
        return {
            "features": {k: list(v) for k, v in meta["features"].items()},
            "dtypes": meta["dtypes"],
            "buckets": m.buckets,
            "format": meta["format"],
            **{k: meta[k] for k in ("ensemble_members", "quantize")
               if meta.get(k) is not None},
        }

    def unknown(path):
        hint = ""
        if single is None and path in ("/predict", "/info"):
            hint = f" (multi-model server: use {path}/<name>, names: " \
                   f"{sorted(models)})"
        return {"error": f"unknown path {path!r}{hint}"}

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
                self._reply_json(200, {"status": "ok",
                                       "models": sorted(n for n in models if n)})
            elif self.path == "/metrics":
                entries = [(n, stats[n], coalescers[n]) for n in sorted(models)]
                self._reply(200, render_metrics(entries).encode(),
                            "text/plain; version=0.0.4")
            elif (hit := resolve(self.path, "/info")) is not None:
                self._reply_json(200, info_payload(hit[1]))
            else:
                self._reply_json(404, unknown(self.path))

        def do_POST(self):
            # drain the body BEFORE any reply: responding while the client
            # is still streaming it closes the socket mid-send (EPIPE on
            # the client instead of our 404/400 JSON)
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
            except Exception:
                body = b""
            hit = resolve(self.path, "/predict")
            if hit is None:
                self._reply_json(404, unknown(self.path))
                return
            name, mdl = hit
            st, co = stats[name], coalescers[name]
            t_start = _time.monotonic()
            try:
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if ctype == "application/x-npz":
                    features = _parse_npz_features(body, mdl.meta)
                else:
                    features = _parse_json_features(body, mdl.meta)
                _validate(features, mdl.meta)
            except Exception as e:  # malformed request
                st.record(0, 0.0, error=True)
                self._reply_json(400, {"error": str(e)})
                return
            n_samples = int(next(iter(features.values())).shape[0])
            try:
                if co is not None:
                    # batching dispatcher: concurrent requests coalesce
                    # into one device program
                    out = co.submit(features, n_samples)
                else:
                    with lock:  # one accelerator; serialize dispatch
                        out = mdl.predict(features)
            except Exception as e:  # model-side failure
                st.record(0, 0.0, error=True)
                self._reply_json(500, {"error": str(e)})
                return
            st.record(n_samples, _time.monotonic() - t_start)
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

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.coalescers = coalescers  # for shutdown + test introspection
    srv.coalescer = coalescers.get(single)  # single-model back-compat alias
    srv.stats = stats[single] if single is not None else stats
    return srv


def serve_forever(model, host: str = "127.0.0.1", port: int = 8000,
                  coalesce: bool = True, warmup: bool = False) -> None:
    models = model if isinstance(model, dict) else {"": model}
    if warmup:
        for name, m in models.items():
            print(f"[serving] warming {name or 'model'}: "
                  f"buckets {m.buckets}")
            warmup_model(m)
    srv = make_server(model, host, port, coalesce=coalesce)
    h, p = srv.server_address[:2]
    desc = ", ".join(
        f"{name + ': ' if name else ''}buckets {m.buckets} ({m.meta['format']})"
        for name, m in models.items())
    print(f"[serving] listening on http://{h}:{p} "
          f"({desc}, coalescing {'on' if coalesce else 'off'})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        for co in srv.coalescers.values():
            if co is not None:
                co.close()
        srv.server_close()
