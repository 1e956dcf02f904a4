"""Every shipped config must construct its task through the registries."""

import glob
import os

import jax
import numpy as np
import pytest

from m2mixer_tpu.config import load
from m2mixer_tpu.models import get_model

REPO = os.path.join(os.path.dirname(__file__), "..", "..")
CFGS = sorted(glob.glob(os.path.join(REPO, "cfg", "*", "*.yml")))


@pytest.mark.parametrize("cfg_path", CFGS, ids=[os.path.basename(p) for p in CFGS])
def test_config_constructs(cfg_path):
    cfg = load(cfg_path)
    task_cls = get_model(cfg.model.type)
    task = task_cls(cfg.model, cfg.train.optimizer)
    assert task.network is not None


def test_s_config_forward():
    cfg = load(os.path.join(REPO, "cfg", "avmnist", "avmnist_m2-mixer_S.yml"))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {
        "image": np.zeros((2, 1, 28, 28), np.float32),
        "audio": np.zeros((2, 1, 112, 112), np.float32),
        "label": np.zeros((2,), np.int32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    ctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "val").items()}
    loss, aux = task.step(params, batch, ctx, {}, train=False)
    assert np.isfinite(float(loss))
    assert aux["preds"].shape == (2,)
