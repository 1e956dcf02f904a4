"""model.focal_gamma (beyond reference, Lin et al. 2017).

Focal modulation on every CE/BCE head: per-sample losses scale by
``(1-p_t)^gamma`` where ``p_t`` is the model's probability of the true
class/target. Threaded through ``TrainTask.ce`` / ``TrainTask.bce`` like
label smoothing, so every shipped task family gets it from one config knob.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules.losses import bce_with_logits_loss, cross_entropy_loss
from m2mixer_tpu.training import Trainer

from test_mixup_smoothing import CFG, _batch


def test_focal_ce_hand_math():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 5).astype(np.float32)
    labels = rng.randint(0, 5, (8,)).astype(np.int32)
    gamma = 2.0
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   focal_gamma=gamma))
    # numpy reference: (1 - p_t)^gamma * nll, mean over batch
    z = logits - logits.max(axis=-1, keepdims=True)
    p = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
    p_t = p[np.arange(8), labels]
    want = float(np.mean((1.0 - p_t) ** gamma * -np.log(p_t)))
    assert got == pytest.approx(want, rel=1e-5)


def test_focal_ce_gamma_zero_is_plain_ce():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(6, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (6,)).astype(np.int32))
    assert float(cross_entropy_loss(logits, labels, focal_gamma=0.0)) == float(
        cross_entropy_loss(logits, labels))


def test_focal_ce_downweights_easy_examples():
    """A confidently-correct sample contributes ~nothing; a hard one keeps
    most of its CE — the defining property of the focal loss."""
    easy = jnp.asarray([[3.0, -3.0]])  # p_t ~ 0.9975 (unsaturated in f32)
    hard = jnp.asarray([[0.1, -0.1]])
    y = jnp.asarray([0], jnp.int32)
    g = 2.0
    ratio_easy = float(cross_entropy_loss(easy, y, focal_gamma=g)) / float(
        cross_entropy_loss(easy, y))
    ratio_hard = float(cross_entropy_loss(hard, y, focal_gamma=g)) / float(
        cross_entropy_loss(hard, y))
    assert ratio_easy < 1e-4
    assert ratio_hard > 0.1


def test_focal_ce_with_class_weight():
    """weight (the alpha role) applies on top of the modulation with the
    weighted-mean normalization of torch CE."""
    rng = np.random.RandomState(2)
    logits = rng.randn(8, 3).astype(np.float32)
    labels = rng.randint(0, 3, (8,)).astype(np.int32)
    w = np.asarray([0.2, 1.0, 3.0], np.float32)
    gamma = 1.5
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   weight=jnp.asarray(w), focal_gamma=gamma))
    z = logits - logits.max(axis=-1, keepdims=True)
    p = np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True)
    p_t = p[np.arange(8), labels]
    focal = (1.0 - p_t) ** gamma * -np.log(p_t)
    want = float(np.sum(focal * w[labels]) / np.sum(w[labels]))
    assert got == pytest.approx(want, rel=1e-5)


def test_focal_bce_hand_math():
    rng = np.random.RandomState(3)
    logits = rng.randn(8, 4).astype(np.float32)
    targets = (rng.rand(8, 4) > 0.5).astype(np.float32)
    gamma = 2.0
    got = float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets),
                                     focal_gamma=gamma))
    p = 1.0 / (1.0 + np.exp(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    bce = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    want = float(np.mean((1.0 - p_t) ** gamma * bce))
    assert got == pytest.approx(want, rel=1e-4)
    # gamma = 0 is plain BCE
    assert float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets),
                                      focal_gamma=0.0)) == pytest.approx(
        float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets))))


def test_focal_bce_pos_weight_stays_on_positive_term():
    rng = np.random.RandomState(4)
    logits = rng.randn(8, 2).astype(np.float32)
    targets = (rng.rand(8, 2) > 0.5).astype(np.float32)
    pw = np.asarray([3.57, 3.57], np.float32)
    gamma = 1.0
    got = float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets),
                                     pos_weight=jnp.asarray(pw),
                                     focal_gamma=gamma))
    p = 1.0 / (1.0 + np.exp(-logits))
    p_t = p * targets + (1 - p) * (1 - targets)
    base = -(pw * targets * np.log(p) + (1 - targets) * np.log(1 - p))
    want = float(np.mean((1.0 - p_t) ** gamma * base))
    assert got == pytest.approx(want, rel=1e-4)


def test_focal_config_validation(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.focal_gamma = -1.0
    with pytest.raises(ValueError, match="focal_gamma"):
        get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    cfg2 = loads(CFG.format(tmp=tmp_path))
    cfg2.model.focal_gamma = 2.0
    cfg2.model.label_smoothing = 0.1
    with pytest.raises(ValueError, match="cannot\\s+combine"):
        get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)


def test_focal_threads_into_branch_losses(tmp_path):
    """model.focal_gamma changes every branch loss of the flagship task and
    matches recomputing the focal CE on the same logits."""
    batch = _batch(8)
    cfg = loads(CFG.format(tmp=tmp_path))
    plain = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    cfg2 = loads(CFG.format(tmp=tmp_path))
    cfg2.model.focal_gamma = 2.0
    focal = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)

    p = plain.init_params(jax.random.PRNGKey(0), batch)
    ctx = {k: jnp.asarray(v) for k, v in plain.make_ctx(0, "val").items()}
    _, aux0 = plain.step(p, batch, ctx, {}, train=False)
    _, aux1 = focal.step(p, batch, ctx, {}, train=False)
    out = plain.network.apply(p, **plain.network_inputs(batch),
                              deterministic=True)
    for name in focal.loss_names:
        assert float(aux0["losses"][name]) != float(aux1["losses"][name])
    want = float(cross_entropy_loss(out["logits"], jnp.asarray(batch["label"]),
                                    focal_gamma=2.0))
    assert float(aux1["losses"]["fusion"]) == pytest.approx(want, rel=1e-5)


def test_focal_e2e(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.focal_gamma = 2.0
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="focalfit", full_cfg=cfg)
    trainer.fit(task, dm)
    assert trainer.compiled_epochs
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])
