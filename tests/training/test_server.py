"""HTTP inference endpoint (m2mixer_tpu/server.py): JSON + npz protocols,
metadata routes, request validation, logit parity with direct predict."""

import io
import json
import threading
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
        assert json.loads(r.read()) == {"status": "ok"}
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
