"""HTTP inference endpoint (m2mixer_tpu/server.py): JSON + npz protocols,
metadata routes, request validation, logit parity with direct predict."""

import io
import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.models import get_model
from m2mixer_tpu.serving import export_serving, load_serving
from m2mixer_tpu.server import make_server

from test_serving import CFG, _batch  # same-directory test module (rootdir conftest adds it to sys.path)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("http")
    cfg = loads(CFG.format(tmp=tmp))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    params = task.init_params(jax.random.PRNGKey(0), _batch(8))
    art = export_serving(task, params, _batch(8), str(tmp / "art"),
                         fmt="stablehlo", buckets=(4, 8))
    model = load_serving(art)
    srv = make_server(model, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", model
    srv.shutdown()
    srv.server_close()
    thread.join(timeout=10)


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz_and_info(server):
    base, model = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["models"] == []
    with urllib.request.urlopen(base + "/info", timeout=30) as r:
        info = json.loads(r.read())
    assert set(info["features"]) == {"image", "audio"}
    assert info["buckets"] == model.buckets
    assert info["format"] == "stablehlo"


def test_json_predict_matches_direct(server):
    base, model = server
    batch = _batch(3, seed=5)
    body = json.dumps({"image": batch["image"].tolist(),
                       "audio": batch["audio"].tolist()}).encode()
    status, ctype, payload = _post(base + "/predict", body, "application/json")
    assert status == 200 and ctype == "application/json"
    out = json.loads(payload)
    direct = model.predict(batch)
    np.testing.assert_allclose(np.asarray(out["logits"], np.float32),
                               direct["logits"], rtol=1e-5, atol=1e-5)
    assert len(out["branch_logits"]) == len(direct["branch_logits"])


def test_npz_predict_matches_direct(server):
    base, model = server
    batch = _batch(6, seed=9)
    buf = io.BytesIO()
    np.savez(buf, image=batch["image"], audio=batch["audio"])
    status, ctype, payload = _post(base + "/predict", buf.getvalue(),
                                   "application/x-npz")
    assert status == 200 and ctype == "application/x-npz"
    with np.load(io.BytesIO(payload)) as z:
        logits = z["logits"]
        n_branches = sum(1 for k in z.files if k.startswith("branch_logits_"))
    direct = model.predict(batch)
    np.testing.assert_allclose(logits, direct["logits"], rtol=1e-5, atol=1e-5)
    assert n_branches == len(direct["branch_logits"])


def test_bad_requests_are_400(server):
    base, _ = server
    cases = [
        (b"not json", "application/json"),
        (json.dumps({"image": [[[[0.0]]]]}).encode(), "application/json"),  # missing audio
        (json.dumps({"image": np.zeros((1, 1, 5, 5)).tolist(),
                     "audio": np.zeros((1, 1, 112, 112)).tolist()}).encode(),
         "application/json"),  # wrong trailing shape
    ]
    for body, ctype in cases:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base + "/predict", body, ctype)
        assert exc.value.code == 400
        assert "error" in json.loads(exc.value.read())


def test_unknown_path_is_404(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert exc.value.code == 404


def test_concurrent_requests(server):
    """Many simultaneous clients; the dispatch lock serializes device work
    and every reply is correct for ITS request."""
    base, model = server
    results = {}

    def worker(seed):
        batch = _batch(2, seed=seed)
        body = json.dumps({"image": batch["image"].tolist(),
                           "audio": batch["audio"].tolist()}).encode()
        _, _, payload = _post(base + "/predict", body, "application/json")
        results[seed] = (np.asarray(json.loads(payload)["logits"], np.float32),
                         model.predict(batch)["logits"])

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 4
    for got, want in results.values():
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- coalescer

class _StubModel:
    """predict() that makes per-request slicing verifiable (logits = x+1)
    and can block its first call so later requests pile up in the queue."""

    def __init__(self, block_first=False, fail=False):
        self.calls = []          # batch size of every predict() dispatch
        self.fail = fail
        self.first_entered = threading.Event()
        self.release = threading.Event()
        self._block_first = block_first
        self._n = 0

    def predict(self, feats):
        self._n += 1
        if self._block_first and self._n == 1:
            self.first_entered.set()
            assert self.release.wait(30)
        if self.fail:
            raise ValueError("boom")
        x = np.asarray(feats["x"])
        self.calls.append(int(x.shape[0]))
        return {"logits": x + 1.0, "branch_logits": (x * 2.0,)}


def test_coalescer_batches_concurrent_requests():
    """While one request holds the device, later arrivals queue up and the
    next cycle runs them as ONE predict; every reply is that request's
    exact slice."""
    from m2mixer_tpu.server import RequestCoalescer

    model = _StubModel(block_first=True)
    co = RequestCoalescer(model)
    results = {}

    def worker(seed, n):
        x = np.full((n, 3), float(seed), np.float32)
        results[seed] = (co.submit({"x": x}, n), x)

    try:
        t0 = threading.Thread(target=worker, args=(0, 2))
        t0.start()
        assert model.first_entered.wait(30)
        rest = [threading.Thread(target=worker, args=(s, 1 + s % 3))
                for s in range(1, 5)]
        for t in rest:
            t.start()
        time.sleep(0.3)  # let the 4 stragglers enqueue behind the blocked call
        model.release.set()
        for t in [t0] + rest:
            t.join(timeout=30)
    finally:
        co.close()

    assert len(results) == 5
    # first dispatch = the lone request (2), second = all four stragglers
    assert model.calls == [2, sum(1 + s % 3 for s in range(1, 5))]
    assert co.batches_run == 2 and co.requests_served == 5
    for out, x in results.values():
        np.testing.assert_array_equal(out["logits"], x + 1.0)
        np.testing.assert_array_equal(out["branch_logits"][0], x * 2.0)


def test_coalescer_propagates_errors_to_all_waiters():
    from m2mixer_tpu.server import RequestCoalescer

    model = _StubModel(fail=True)
    co = RequestCoalescer(model)
    try:
        with pytest.raises(ValueError, match="boom"):
            co.submit({"x": np.zeros((2, 3), np.float32)}, 2)
    finally:
        co.close()


def test_coalescer_respects_max_batch():
    """A straggler that would blow past max_batch waits for its own cycle
    instead of being split."""
    from m2mixer_tpu.server import RequestCoalescer

    model = _StubModel(block_first=True)
    co = RequestCoalescer(model, max_batch=3)
    results = []

    def worker(n):
        x = np.zeros((n, 3), np.float32)
        results.append(co.submit({"x": x}, n))

    try:
        t0 = threading.Thread(target=worker, args=(1,))
        t0.start()
        assert model.first_entered.wait(30)
        rest = [threading.Thread(target=worker, args=(2,)) for _ in range(2)]
        for t in rest:
            t.start()
        time.sleep(0.3)
        model.release.set()
        for t in [t0] + rest:
            t.join(timeout=30)
    finally:
        co.close()
    assert len(results) == 3
    assert model.calls == [1, 2, 2]  # 2+2 > max_batch 3: one per cycle


def test_http_concurrency_rides_the_coalescer(server):
    """The module fixture serves with coalescing on (the default): after the
    concurrent-request tests above, the dispatcher must have actually
    served requests (and batched at least once under concurrency)."""
    base, _ = server
    # reach into the live server object via a fresh request to prove the
    # path stays correct post-coalescing
    batch = _batch(5, seed=77)
    body = json.dumps({"image": batch["image"].tolist(),
                       "audio": batch["audio"].tolist()}).encode()
    status, _, _ = _post(base + "/predict", body, "application/json")
    assert status == 200


def test_metrics_endpoint(server):
    """/metrics: Prometheus text with request/sample/batch counters and
    latency quantiles, consistent after a known request."""
    base, _ = server
    batch = _batch(4, seed=123)
    body = json.dumps({"image": batch["image"].tolist(),
                       "audio": batch["audio"].tolist()}).encode()
    _post(base + "/predict", body, "application/json")
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert r.headers.get("Content-Type", "").startswith("text/plain")
        text = r.read().decode()
    vals = {line.split(" ")[0]: float(line.split(" ")[1])
            for line in text.splitlines()
            if line and not line.startswith("#") and "{" not in line}
    assert vals["serving_requests_total"] >= 1
    assert vals["serving_samples_total"] >= 4
    assert vals["serving_device_batches_total"] >= 1
    assert vals["serving_uptime_seconds"] > 0
    q = {line.split("} ")[0].split('"')[1]: float(line.split("} ")[1])
         for line in text.splitlines()
         if line.startswith("serving_request_latency_seconds{")}
    assert set(q) == {"0.5", "0.9", "0.99"}
    assert 0 < q["0.5"] <= q["0.99"] < 60


def test_metrics_counts_errors(server):
    base, _ = server
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        before = r.read().decode()
    with pytest.raises(urllib.error.HTTPError):
        _post(base + "/predict", b"not json", "application/json")
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        after = r.read().decode()

    def errs(t):
        return int(float([l for l in t.splitlines()
                          if l.startswith("serving_request_errors_total ")][0].split()[1]))
    assert errs(after) == errs(before) + 1


# -------------------------------------------------------------- multi-model

@pytest.fixture(scope="module")
def multi_server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multi")
    cfg = loads(CFG.format(tmp=tmp))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    params = task.init_params(jax.random.PRNGKey(0), _batch(8))
    a = load_serving(export_serving(task, params, _batch(8), str(tmp / "a"),
                                    fmt="stablehlo", buckets=(4,)))
    b = load_serving(export_serving(task, params, _batch(8), str(tmp / "b"),
                                    fmt="stablehlo", buckets=(4, 8)))
    srv = make_server({"big": a, "small": b}, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", a, b
    srv.shutdown()
    for co in srv.coalescers.values():
        if co is not None:
            co.close()
    srv.server_close()
    thread.join(timeout=10)


def test_multi_model_routes(multi_server):
    base, a, b = multi_server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["models"] == ["big", "small"]
    with urllib.request.urlopen(base + "/info/small", timeout=30) as r:
        assert json.loads(r.read())["buckets"] == [4, 8]
    with urllib.request.urlopen(base + "/info/big", timeout=30) as r:
        assert json.loads(r.read())["buckets"] == [4]
    batch = _batch(3, seed=21)
    body = json.dumps({"image": batch["image"].tolist(),
                       "audio": batch["audio"].tolist()}).encode()
    _, _, payload = _post(base + "/predict/big", body, "application/json")
    got = np.asarray(json.loads(payload)["logits"], np.float32)
    np.testing.assert_allclose(got, a.predict(batch)["logits"],
                               rtol=1e-5, atol=1e-5)


def test_multi_model_bare_paths_404_with_hint(multi_server):
    base, *_ = multi_server
    batch = _batch(2, seed=4)
    body = json.dumps({"image": batch["image"].tolist(),
                       "audio": batch["audio"].tolist()}).encode()
    for path, method in (("/predict", "POST"), ("/info", "GET"),
                         ("/predict/nope", "POST")):
        with pytest.raises(urllib.error.HTTPError) as exc:
            if method == "POST":
                _post(base + path, body, "application/json")
            else:
                urllib.request.urlopen(base + path, timeout=30)
        assert exc.value.code == 404
        err = json.loads(exc.value.read())["error"]
        if path in ("/predict", "/info"):
            assert "big" in err and "small" in err  # names hinted


def test_multi_model_metrics_labeled(multi_server):
    base, *_ = multi_server
    batch = _batch(2, seed=9)
    body = json.dumps({"image": batch["image"].tolist(),
                       "audio": batch["audio"].tolist()}).encode()
    _post(base + "/predict/small", body, "application/json")
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert 'serving_requests_total{model="small"}' in text
    assert 'serving_requests_total{model="big"}' in text
    small = [l for l in text.splitlines()
             if l.startswith('serving_samples_total{model="small"}')]
    assert small and float(small[0].split()[-1]) >= 2


def test_warmup_compiles_every_bucket():
    from m2mixer_tpu.server import warmup_model

    class Counting:
        buckets = [4, 8]
        meta = {"features": {"x": (3,)}, "dtypes": {"x": "float32"}}

        def __init__(self):
            self.sizes = []

        def predict(self, feats):
            self.sizes.append(int(feats["x"].shape[0]))
            return {"logits": feats["x"]}

    m = Counting()
    warmup_model(m)
    assert m.sizes == [4, 8]


def test_multi_model_concurrent_clients(multi_server):
    """Clients hammering BOTH models at once: each model's coalescer
    dispatches independently (no cross-model lock) and every reply matches
    its own model's direct predict."""
    base, a, b = multi_server
    results = {}

    def worker(i):
        name, mdl = ("big", a) if i % 2 == 0 else ("small", b)
        batch = _batch(2, seed=100 + i)
        body = json.dumps({"image": batch["image"].tolist(),
                           "audio": batch["audio"].tolist()}).encode()
        _, _, payload = _post(f"{base}/predict/{name}", body, "application/json")
        results[i] = (np.asarray(json.loads(payload)["logits"], np.float32),
                      mdl.predict(batch)["logits"])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 6
    for got, want in results.values():
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_npz_float64_body_is_cast_to_artifact_dtype(server):
    """A float64 npz body must be cast to the artifact's dtypes server-side
    (the executable format's pinned input avals can't absorb f64, and one
    f64 request would upcast its whole coalesced batch)."""
    base, model = server
    batch = _batch(3, seed=42)
    buf = io.BytesIO()
    np.savez(buf, image=batch["image"].astype(np.float64),
             audio=batch["audio"].astype(np.float64))
    status, _, payload = _post(base + "/predict", buf.getvalue(),
                               "application/x-npz")
    assert status == 200
    with np.load(io.BytesIO(payload)) as z:
        logits = z["logits"]
    np.testing.assert_allclose(logits, model.predict(batch)["logits"],
                               rtol=1e-5, atol=1e-5)


# -------------------------------------------------- production guards (r2)

def _stub_http_server(**kw):
    """make_server over a _StubModel (meta attached so the handler's parse/
    validate path works) — no artifact/compile cost."""
    model = _StubModel(**{k: v for k, v in kw.items()
                          if k in ("block_first", "fail")})
    model.meta = {"features": {"x": [3]}, "dtypes": {"x": "float32"},
                  "format": "stub", "buckets": [4]}
    model.buckets = [4]
    srv = make_server(model, host="127.0.0.1", port=0,
                      **{k: v for k, v in kw.items()
                         if k in ("request_timeout", "max_queue", "coalesce")})
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    return srv, thread, model, f"http://{host}:{port}"


def _post_status(url, body, ctype):
    try:
        return _post(url, body, ctype)
    except urllib.error.HTTPError as e:
        return e.code, e.headers, e.read()


def test_backpressure_429_with_retry_after():
    """Beyond max_queue pending samples /predict answers 429 + Retry-After
    instead of stacking host memory."""
    srv, thread, model, base = _stub_http_server(block_first=True, max_queue=3)
    try:
        body = json.dumps({"x": np.zeros((2, 3)).tolist()}).encode()
        t0 = threading.Thread(
            target=lambda: _post_status(base + "/predict", body, "application/json"))
        t0.start()
        assert model.first_entered.wait(30)  # request 1 holds the device
        # request 2 queues (2 pending), request 3 would make 4 > 3 -> 429
        t1 = threading.Thread(
            target=lambda: _post_status(base + "/predict", body, "application/json"))
        t1.start()
        deadline = time.time() + 30
        while srv.coalescers[""].pending_samples < 2:
            assert time.time() < deadline
            time.sleep(0.01)
        status, headers, payload = _post_status(
            base + "/predict", body, "application/json")
        assert status == 429
        assert headers.get("Retry-After") == "1"
        assert "queue full" in json.loads(payload)["error"]
        model.release.set()
        t0.join(timeout=30)
        t1.join(timeout=30)
    finally:
        model.release.set()
        srv.shutdown()
        for co in srv.coalescers.values():
            if co is not None:
                co.close()
        srv.server_close()
        thread.join(timeout=10)


def test_request_timeout_504_and_abandoned_skip():
    """A request that outwaits --request-timeout gets a 504, and if it is
    still queued when the device frees up it is skipped (no wasted
    dispatch)."""
    srv, thread, model, base = _stub_http_server(block_first=True,
                                                 request_timeout=0.3)
    try:
        body = json.dumps({"x": np.zeros((2, 3)).tolist()}).encode()
        t0 = threading.Thread(
            target=lambda: _post_status(base + "/predict", body, "application/json"))
        t0.start()
        assert model.first_entered.wait(30)
        status, _, payload = _post_status(
            base + "/predict", body, "application/json")
        assert status == 504
        assert "not served within" in json.loads(payload)["error"]
        model.release.set()
        t0.join(timeout=30)
        deadline = time.time() + 30  # dispatcher drains the abandoned entry
        while srv.coalescers[""].pending_samples > 0:
            assert time.time() < deadline
            time.sleep(0.01)
        assert model.calls == [2]  # only request 1 ever reached the device
    finally:
        model.release.set()
        srv.shutdown()
        for co in srv.coalescers.values():
            if co is not None:
                co.close()
        srv.server_close()
        thread.join(timeout=10)


def test_coalescer_drain_close_serves_queued_requests():
    """close(drain=True) (hot reload / SIGTERM path) serves everything
    already queued instead of failing the waiters."""
    from m2mixer_tpu.server import RequestCoalescer

    model = _StubModel(block_first=True)
    co = RequestCoalescer(model)
    results, errors = [], []

    def worker(seed):
        try:
            x = np.full((2, 3), float(seed), np.float32)
            results.append((seed, co.submit({"x": x}, 2)))
        except Exception as e:  # pragma: no cover - failure mode under test
            errors.append(e)

    t0 = threading.Thread(target=worker, args=(0,))
    t0.start()
    assert model.first_entered.wait(30)
    rest = [threading.Thread(target=worker, args=(i,)) for i in (1, 2)]
    for t in rest:
        t.start()
    deadline = time.time() + 30
    while co.pending_samples < 4:
        assert time.time() < deadline
        time.sleep(0.01)
    closer = threading.Thread(target=co.close, kwargs={"drain": True})
    closer.start()
    model.release.set()
    for t in [t0] + rest + [closer]:
        t.join(timeout=60)
    assert not errors and len(results) == 3
    for seed, out in results:
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.full((2, 3), float(seed)) + 1.0)


def test_queue_depth_metric_exposed(server):
    base, _ = server
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "serving_queue_depth_samples 0" in text


def test_hot_reload_swaps_reexported_artifact(tmp_path):
    """POST /reload re-loads the artifact directory in place: after
    re-exporting different params to the SAME dir, replies switch to the new
    model's logits without restarting the server."""
    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    params0 = task.init_params(jax.random.PRNGKey(0), _batch(8))
    art = export_serving(task, params0, _batch(8), str(tmp_path / "art"),
                         fmt="stablehlo", buckets=(4,))
    srv = make_server(load_serving(art), host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        batch = _batch(3, seed=11)
        body = json.dumps({"image": batch["image"].tolist(),
                           "audio": batch["audio"].tolist()}).encode()
        _, _, before = _post(base + "/predict", body, "application/json")
        logits_before = np.asarray(json.loads(before)["logits"], np.float32)

        params1 = task.init_params(jax.random.PRNGKey(123), _batch(8))
        export_serving(task, params1, _batch(8), str(tmp_path / "art"),
                       fmt="stablehlo", buckets=(4,))
        status, _, payload = _post(base + "/reload", b"", "application/json")
        assert status == 200
        out = json.loads(payload)
        assert out["status"] == "reloaded" and out["buckets"] == [4]

        _, _, after = _post(base + "/predict", body, "application/json")
        logits_after = np.asarray(json.loads(after)["logits"], np.float32)
        assert not np.allclose(logits_before, logits_after)
        fresh = load_serving(art)
        np.testing.assert_allclose(logits_after, fresh.predict(batch)["logits"],
                                   rtol=1e-5, atol=1e-5)
        # the swapped-in coalescer serves, the old one is closed
        assert srv.coalescers[""]._stop.is_set() is False
    finally:
        srv.shutdown()
        for co in srv.coalescers.values():
            if co is not None:
                co.close()
        srv.server_close()
        thread.join(timeout=10)


def test_drain_close_serves_straggler_beyond_max_batch():
    """Review fix: a straggler whose size would blow past max_batch used to
    be RE-QUEUED — behind a drain sentinel, violating drain's promise. It is
    now HELD by the dispatcher and served in its own next cycle."""
    from m2mixer_tpu.server import RequestCoalescer

    model = _StubModel(block_first=True)
    co = RequestCoalescer(model, max_batch=3)
    results, errors = [], []

    def worker(seed, n):
        try:
            x = np.full((n, 3), float(seed), np.float32)
            results.append((seed, n, co.submit({"x": x}, n)))
        except Exception as e:
            errors.append(e)

    t0 = threading.Thread(target=worker, args=(0, 1))
    t0.start()
    assert model.first_entered.wait(30)
    # both queued; together they exceed max_batch=3 so the second becomes
    # a carried straggler during the drain
    rest = [threading.Thread(target=worker, args=(1, 2)),
            threading.Thread(target=worker, args=(2, 2))]
    for t in rest:
        t.start()
    deadline = time.time() + 30
    while co.pending_samples < 4:
        assert time.time() < deadline
        time.sleep(0.01)
    closer = threading.Thread(target=co.close, kwargs={"drain": True})
    closer.start()
    model.release.set()
    for t in [t0] + rest + [closer]:
        t.join(timeout=60)
    assert not errors and len(results) == 3
    for seed, n, out in results:
        np.testing.assert_allclose(np.asarray(out["logits"]),
                                   np.full((n, 3), float(seed)) + 1.0)


def test_oversize_request_on_idle_queue_is_admitted():
    """Review fix: a single request larger than max_queue must be served
    when the queue is idle (predict chunks it by buckets) — not permanently
    429'd; the cap bounds queue GROWTH only."""
    from m2mixer_tpu.server import RequestCoalescer

    model = _StubModel()
    co = RequestCoalescer(model, max_queue=4)
    try:
        x = np.ones((10, 3), np.float32)
        out = co.submit({"x": x}, 10)
        np.testing.assert_allclose(np.asarray(out["logits"]), x + 1.0)
    finally:
        co.close()


def test_lock_mode_guards_active():
    """Review fix: --request-timeout / --max-queue also hold under
    --no-coalesce (they were silently ignored in lock mode)."""
    srv, thread, model, base = _stub_http_server(
        block_first=True, coalesce=False, request_timeout=0.3, max_queue=3)
    try:
        body = json.dumps({"x": np.zeros((2, 3)).tolist()}).encode()
        codes = {}

        def poster(key):
            codes[key] = _post_status(base + "/predict", body,
                                      "application/json")[0]

        t0 = threading.Thread(target=poster, args=(0,))
        t0.start()
        assert model.first_entered.wait(30)  # request 1 holds the lock
        status, _, payload = _post_status(
            base + "/predict", body, "application/json")
        assert status == 504  # waited 0.3s for the lock
        assert "not served within" in json.loads(payload)["error"]
        model.release.set()
        t0.join(timeout=30)
        assert codes[0] == 200
    finally:
        model.release.set()
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=10)


def test_reload_bad_body_is_400():
    """Review fix: malformed or non-object /reload bodies are client errors
    (400), not opaque 500s."""
    srv, thread, model, base = _stub_http_server()
    try:
        for body in (b"{bad", b"true", b"[1]"):
            status, _, payload = _post_status(base + "/reload", body,
                                              "application/json")
            assert status == 400, (body, status)
            assert "error" in json.loads(payload)
    finally:
        srv.shutdown()
        for co in srv.coalescers.values():
            if co is not None:
                co.close()
        srv.server_close()
        thread.join(timeout=10)
