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
    POST /reload    -> re-load the artifact from its export directory and
                       atomically swap it in (hot reload after re-exporting
                       a better checkpoint); optional body {"warmup": true}
                       pre-compiles the new model's buckets before the swap
    POST /predict   -> model outputs
        Content-Type: application/json  body {"image": [[...]], ...}
          (nested lists per feature; reply is JSON with "logits" and
          "branch_logits" as nested lists). Artifacts exported with an
          embedded preprocess spec additionally accept RAW inputs — text
          features as lists of strings, image features as lists of
          base64-encoded image files — featurized server-side with the
          exact training pipeline (see m2mixer_tpu/preprocess.py)
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

Production guards: ``--max-queue`` caps pending samples (429 + Retry-After
beyond it), ``--request-timeout`` bounds the wait for device capacity (504),
and SIGTERM drains queued requests before exiting (the serving analog of the
trainer's preemption checkpoint).
"""

from __future__ import annotations

import io
import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

import numpy as np

from .serving import validate_features as _validate  # shared with predict CLI

__all__ = ["make_server", "serve_forever", "RequestCoalescer", "ServerStats",
           "render_metrics", "warmup_model", "ServerOverloaded",
           "RequestTimeout"]


class ServerOverloaded(RuntimeError):
    """Raised by ``RequestCoalescer.submit`` when the pending queue already
    holds ``max_queue`` samples — surfaces as HTTP 429 so clients back off
    instead of stacking unbounded memory on the host."""


class RequestTimeout(RuntimeError):
    """Raised by ``RequestCoalescer.submit`` when a request waits longer than
    the configured timeout for device capacity — surfaces as HTTP 504."""


class CoalescerClosed(RuntimeError):
    """Raised by ``RequestCoalescer.submit`` when the dispatcher is shutting
    down. During a hot reload the HTTP handler catches this and retries on
    the freshly swapped-in coalescer, so a request racing the swap is served
    instead of 500'd."""


def _parse_json_features(body: bytes, meta: dict) -> Dict[str, object]:
    """JSON body -> feature dict. Raw values (text strings, base64 image
    lists) are left as-is for the artifact's preprocessor; numeric arrays
    stay uncast too — ``ServedModel.preprocess_inputs`` casts everything to
    the artifact dtypes after featurization."""
    from .preprocess import is_raw_value

    obj = json.loads(body.decode("utf-8"))
    if not isinstance(obj, dict):
        raise ValueError("JSON body must be an object mapping feature "
                         "names to arrays (or raw text/base64-image lists "
                         "for artifacts with embedded preprocessing)")
    return {k: v if is_raw_value(v) else np.asarray(v)
            for k, v in obj.items() if k != "label"}


def _parse_npz_features(body: bytes, meta: dict) -> Dict[str, np.ndarray]:
    # arrays come out uncast; ServedModel.preprocess_inputs casts to the
    # artifact's dtypes (a float64 body must never reach the model raw —
    # the executable format's pinned input avals cannot absorb it, and
    # under coalescing one f64 request would upcast its whole shared
    # batch). String-dtype arrays are raw text for the preprocessor.
    with np.load(io.BytesIO(body)) as z:
        return {k: z[k] for k in z.files if k != "label"}


def _featurize(mdl, features: Dict[str, object]) -> Dict[str, np.ndarray]:
    """Route parsed request entries through the model's raw-input
    preprocessing and dtype casting. Model-like objects without
    ``preprocess_inputs`` (test stubs) get the plain cast-and-reject-raw
    behavior."""
    fn = getattr(mdl, "preprocess_inputs", None)
    if fn is not None:
        return fn(features)
    from .preprocess import is_raw_value

    raw = sorted(k for k, v in features.items() if is_raw_value(v))
    if raw:
        raise ValueError(f"raw inputs {raw} but this model has no "
                         "preprocessing; send numeric feature arrays")
    return {k: np.asarray(v, dtype=mdl.meta["dtypes"].get(k))
            for k, v in features.items()}




class _Pending:
    __slots__ = ("features", "n", "event", "result", "error", "abandoned")

    def __init__(self, features: Dict[str, np.ndarray], n: int):
        self.features = features
        self.n = n
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False  # timed-out waiter: skip if still queued


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

    def __init__(self, model, max_batch: int = 4096,
                 max_queue: int = 65536):
        self._model = model
        self._max_batch = int(max_batch)
        self._max_queue = int(max_queue)
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        # admission lock: makes (closed-check + pending-count + enqueue)
        # atomic against close(), so a request either fully lands BEFORE the
        # close sentinel (and is drained) or gets CoalescerClosed — never
        # enqueued behind the sentinel where it would hang forever
        self._admit = threading.Lock()
        self._closing = False
        self._pending = 0  # samples admitted but not yet taken by the loop
        self._carry = None  # oversize straggler held by the dispatcher
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serving-coalescer")
        self._thread.start()
        self.batches_run = 0       # observability: device dispatch count
        self.requests_served = 0

    @property
    def pending_samples(self) -> int:
        """Samples admitted to the queue and not yet dispatched (the
        ``serving_queue_depth`` gauge)."""
        return self._pending

    def submit(self, features: Dict[str, np.ndarray], n: int,
               timeout: float = None) -> dict:
        req = _Pending(features, n)
        with self._admit:
            if self._closing or self._stop.is_set():
                raise CoalescerClosed("server shutting down")
            # admission cap on QUEUE GROWTH only: a lone oversize request on
            # an idle queue is always admitted (predict() chunks it by
            # buckets; its payload already sits in host memory regardless)
            if self._pending and self._pending + n > self._max_queue:
                raise ServerOverloaded(
                    f"serving queue full ({self._pending} samples pending, "
                    f"limit {self._max_queue}); retry later")
            self._pending += n
            self._queue.put(req)
        if not req.event.wait(timeout):
            # mark so a still-queued request is skipped (and its samples
            # released) instead of wasting a device slot; if it already
            # boarded a batch the result is simply discarded
            req.abandoned = True
            raise RequestTimeout(
                f"request (batch {n}) not served within {timeout:.1f}s")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self, drain: bool = False) -> None:
        """Stop the dispatcher. ``drain=True`` serves everything already
        queued first (used by hot reload / graceful shutdown); ``False``
        stops after the in-flight batch and fails queued waiters."""
        with self._admit:  # no submit can slip in behind the sentinel
            self._closing = True
            if not drain:
                self._stop.set()
            self._queue.put(None)  # sentinel: dispatcher stops at it
        self._thread.join(timeout=60 if drain else 5)
        self._stop.set()
        stranded = []
        carry, self._carry = self._carry, None
        if carry is not None:  # non-drain close can leave a held straggler
            stranded.append(carry)
        while True:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if r is not None:
                self._release(r.n)
                stranded.append(r)
        for r in stranded:  # fail them instead of hanging their waiters
            r.error = CoalescerClosed("server shutting down")
            r.event.set()

    # ------------------------------------------------------------ internals
    def _release(self, n: int) -> None:
        with self._admit:
            self._pending -= n

    def _take_cycle(self):
        if self._carry is not None:
            first, self._carry = self._carry, None
        else:
            while True:
                first = self._queue.get()
                if first is None:
                    self._stop.set()  # close sentinel: ends the loop
                    return []
                self._release(first.n)
                if not first.abandoned:  # timed-out waiters got their 504
                    break
        reqs, total = [first], first.n
        while total < self._max_batch:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if r is None:
                # close sentinel seen mid-drain: re-queue it so the NEXT
                # cycle (which may start from a carried straggler) still
                # terminates the loop after serving everything before it
                self._queue.put(None)
                break
            if r.abandoned:
                self._release(r.n)
                continue
            # an oversize straggler would blow past max_batch: hold it for
            # its own next cycle rather than splitting a request (held, not
            # re-queued — re-queuing would put it BEHIND a drain sentinel
            # and fail a request that drain promised to serve)
            if total + r.n > self._max_batch and reqs:
                self._release(r.n)
                self._carry = r
                break
            self._release(r.n)
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
    lines += ["# HELP serving_queue_depth_samples samples admitted but not "
              "yet dispatched (0 without coalescing)",
              "# TYPE serving_queue_depth_samples gauge"]
    lines += [f"serving_queue_depth_samples{lbl(name)} "
              f"{coalescer.pending_samples if coalescer else 0}"
              for name, stats, coalescer in entries]
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
                coalesce: bool = True, request_timeout: float = None,
                max_queue: int = 65536):
    """Build (not start) a ``ThreadingHTTPServer``. ``model`` is a single
    ``serving.ServedModel`` (bare ``/predict`` + ``/info`` routes) or a
    ``{name: ServedModel}`` dict (``/predict/<name>`` + ``/info/<name>``;
    every model shares the chip but gets its own coalescer and metrics
    series). Port 0 picks a free port; the bound address is
    ``server.server_address``. ``coalesce=False`` serializes requests with
    a plain lock instead of the batching dispatchers.

    Production guards (both dispatch modes — coalescing and ``--no-coalesce``
    lock serialization):
      * ``max_queue`` — pending-sample cap; beyond it ``/predict`` answers
        429 with ``Retry-After`` instead of growing host memory unboundedly.
        A lone request on an idle queue is admitted whatever its size
        (``predict`` chunks it by buckets).
      * ``request_timeout`` — seconds a request may wait for device
        capacity before a 504 (None = wait forever).
      * ``POST /reload`` (or ``/reload/<name>``) — re-load the artifact
        from its export directory (picking up a re-exported checkpoint) and
        atomically swap it in; in-flight and concurrent requests keep being
        served by the old model until the swap. Body (optional JSON):
        ``{"warmup": true}`` pre-compiles every bucket of the new model
        BEFORE the swap so no request pays the compile."""
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
    # lock-mode (no-coalesce) guard state: samples waiting on the lock, so
    # --max-queue/--request-timeout hold in BOTH dispatch modes
    lock_waiting = {"n": 0}
    lock_waiting_guard = threading.Lock()
    reload_locks = {name: threading.Lock() for name in models}  # per model:
    # one model's warmup reload (minutes through a remote compiler) must not
    # block another model's reload
    coalescers = {name: RequestCoalescer(m, max_queue=max_queue)
                  if coalesce else None
                  for name, m in models.items()}
    stats = {name: ServerStats() for name in models}

    def reload_model(name: str, warmup: bool) -> dict:
        """Re-load ``models[name]`` from its artifact directory and swap."""
        from .serving import load_serving

        with reload_locks[name]:
            old = models[name]
            if getattr(old, "out_dir", None) is None:
                raise ValueError("model was not loaded from an artifact "
                                 "directory; cannot reload")
            new = load_serving(old.out_dir, mesh=getattr(old, "_mesh", None),
                               shard_params=getattr(old, "_shard_params", False),
                               model_min_dim=getattr(old, "_model_min_dim", 256))
            if warmup:
                warmup_model(new)  # compile before taking traffic
            old_co = coalescers[name]
            new_co = RequestCoalescer(new, max_queue=max_queue) \
                if old_co is not None else None
            # swap order: model first (lock-mode requests pick it up), then
            # coalescer (queued requests drain on the old model)
            models[name] = new
            coalescers[name] = new_co
            if old_co is not None:
                old_co.close(drain=True)  # queued requests finish on the old model
            return {"status": "reloaded", "model": name or None,
                    "dir": old.out_dir, "format": new.meta["format"],
                    "buckets": new.buckets, "warmed": bool(warmup)}

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
            **({"preprocess": {k: s.get("kind")
                               for k, s in meta["preprocess"].items()}}
               if meta.get("preprocess") else {}),
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

        def _reply(self, code: int, payload: bytes, ctype: str,
                   headers: Dict[str, str] = None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(payload)

        def _reply_json(self, code: int, obj, headers=None) -> None:
            self._reply(code, json.dumps(obj).encode(), "application/json",
                        headers=headers)

        def _lock_mode_predict(self, name, features, n):
            """--no-coalesce dispatch with the same production guards:
            cap the samples waiting on the device lock (429) and bound the
            wait (504) — otherwise the flags would silently do nothing in
            lock mode."""
            with lock_waiting_guard:
                if lock_waiting["n"] and lock_waiting["n"] + n > max_queue:
                    raise ServerOverloaded(
                        f"serving queue full ({lock_waiting['n']} samples "
                        f"waiting, limit {max_queue}); retry later")
                lock_waiting["n"] += n
            timeout = -1 if request_timeout is None else request_timeout
            acquired = lock.acquire(timeout=timeout)
            with lock_waiting_guard:  # off the wait queue either way (the
                lock_waiting["n"] -= n  # executing request doesn't count,
                # mirroring the coalescer's pending-excludes-in-flight)
            if not acquired:
                raise RequestTimeout(
                    f"request (batch {n}) not served within "
                    f"{request_timeout:.1f}s")
            try:  # models[name] read under the lock: reloads swap live
                return models[name].predict(features)
            finally:
                lock.release()

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
            if (rhit := resolve(self.path, "/reload")) is not None:
                try:  # client errors (bad body) are 400, not 500
                    opts = json.loads(body) if body.strip() else {}
                    if not isinstance(opts, dict):
                        raise ValueError("/reload body must be a JSON object "
                                         'like {"warmup": true}')
                    warm = bool(opts.get("warmup", False))
                except Exception as e:
                    self._reply_json(400, {"error": str(e)})
                    return
                try:
                    self._reply_json(200, reload_model(rhit[0], warm))
                except Exception as e:
                    self._reply_json(500, {"error": str(e)})
                return
            hit = resolve(self.path, "/predict")
            if hit is None:
                self._reply_json(404, unknown(self.path))
                return
            name, mdl = hit
            st = stats[name]
            t_start = _time.monotonic()
            try:
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if ctype == "application/x-npz":
                    features = _parse_npz_features(body, mdl.meta)
                else:
                    features = _parse_json_features(body, mdl.meta)
                # featurize raw entries via the artifact's embedded
                # preprocessing (raw with no spec -> a clear 400) and cast
                # everything to the artifact dtypes
                features = _featurize(mdl, features)
                _validate(features, mdl.meta)
            except Exception as e:  # malformed request
                st.record(0, 0.0, error=True)
                self._reply_json(400, {"error": str(e)})
                return
            n_samples = int(next(iter(features.values())).shape[0])
            try:
                while True:
                    # re-read per attempt: a hot reload may have swapped in
                    # a fresh coalescer while this request was parsing
                    co = coalescers[name]
                    if co is None:
                        out = self._lock_mode_predict(name, features,
                                                      n_samples)
                        break
                    try:
                        # batching dispatcher: concurrent requests coalesce
                        # into one device program
                        out = co.submit(features, n_samples,
                                        timeout=request_timeout)
                        break
                    except CoalescerClosed:
                        # raced a reload swap: retry on the new coalescer
                        # (a real shutdown keeps the closed one in place
                        # and the retry re-raises out of the loop)
                        if coalescers[name] is co:
                            raise
            except ServerOverloaded as e:
                st.record(0, 0.0, error=True)
                self._reply_json(429, {"error": str(e)},
                                 headers={"Retry-After": "1"})
                return
            except RequestTimeout as e:
                st.record(0, 0.0, error=True)
                self._reply_json(504, {"error": str(e)})
                return
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
    # the dict itself, not a snapshot: hot reloads swap entries in place
    srv.coalescers = coalescers  # for shutdown + test introspection
    srv.stats = stats[single] if single is not None else stats
    return srv


def serve_forever(model, host: str = "127.0.0.1", port: int = 8000,
                  coalesce: bool = True, warmup: bool = False,
                  request_timeout: float = None,
                  max_queue: int = 65536) -> None:
    models = model if isinstance(model, dict) else {"": model}
    if warmup:
        for name, m in models.items():
            print(f"[serving] warming {name or 'model'}: "
                  f"buckets {m.buckets}")
            warmup_model(m)
    srv = make_server(model, host, port, coalesce=coalesce,
                      request_timeout=request_timeout, max_queue=max_queue)
    h, p = srv.server_address[:2]
    desc = ", ".join(
        f"{name + ': ' if name else ''}buckets {m.buckets} ({m.meta['format']})"
        for name, m in models.items())
    print(f"[serving] listening on http://{h}:{p} "
          f"({desc}, coalescing {'on' if coalesce else 'off'})")
    # graceful SIGTERM (orchestrator shutdown): stop accepting, drain the
    # coalescer queues, exit 0 — mirrors the trainer's preemption handling
    import signal

    def _term(signum, frame):
        print("[serving] SIGTERM: draining and shutting down", flush=True)
        threading.Thread(target=srv.shutdown, daemon=True).start()

    try:
        prev_term = signal.signal(signal.SIGTERM, _term)
    except ValueError:  # not the main thread (tests): skip the handler
        prev_term = None
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)
        for co in srv.coalescers.values():
            if co is not None:
                co.close(drain=True)
        srv.server_close()
