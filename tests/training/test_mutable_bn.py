"""Mutable BatchNorm state through the trainer (both step paths).

The reference fine-tunes torchvision's vgg19_bn in torch train mode, where
BN uses batch statistics and updates running stats as a side effect
(`/root/reference/models/mmimdb_gmlp.py:19-28`). TPU-natively that side
effect is an explicit mutable 'batch_stats' collection threaded through the
train step (task.mutable_collections); running stats must also never be
gradient-updated (task.trainable_mask zeroes their grads/updates)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models.base import TrainTask
from m2mixer_tpu.modules.losses import cross_entropy_loss
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training import metrics as tm

TRAIN_CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 1
  compiled_epochs: {compiled}
  optimizer: {{lr: 1e-2, weight_decay: 0.0}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
model: {{}}
"""


class _TinyBNNet(nn.Module):
    train_bn: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(16)(x)
        x = nn.BatchNorm(
            use_running_average=(deterministic if self.train_bn else True),
            momentum=0.9)(x)
        return nn.Dense(10)(nn.relu(x))


class _TinyBNTask(TrainTask):
    train_bn = True

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        if self.train_bn:
            self.mutable_collections = ("batch_stats",)

    def build_network(self):
        return _TinyBNNet(train_bn=self.train_bn)

    def network_inputs(self, batch):
        return {"x": batch["image"]}

    def step(self, params, batch, ctx, rngs, train):
        logits, new_state = self.apply_network(
            params, dict(self.network_inputs(batch), deterministic=not train),
            rngs, train)
        loss = cross_entropy_loss(logits, batch["label"])
        aux = {"losses": {"loss": loss}, "preds": jnp.argmax(logits, axis=1),
               "labels": batch["label"]}
        if new_state is not None:
            aux["_mutable_state"] = new_state
        return loss, aux

    def setup_scores(self):
        s = lambda: dict(acc=tm.Accuracy(task="multiclass", num_classes=10))
        return [s(), s(), s()]


class _FrozenBNTask(_TinyBNTask):
    train_bn = False


def _fit(tmp_path, task_cls, compiled):
    cfg = loads(TRAIN_CFG.format(tmp=tmp_path, compiled=str(compiled).lower()))
    task = task_cls(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"bn_{task_cls.__name__}_{compiled}",
                      full_cfg=cfg)
    trainer.fit(task, dm)
    return trainer


def _stats(trainer):
    return jax.tree.map(np.asarray, trainer.params["batch_stats"])


def test_train_bn_updates_running_stats_compiled(tmp_path):
    trainer = _fit(tmp_path, _TinyBNTask, compiled=True)
    stats = _stats(trainer)
    # fresh init is mean=0 / var=1; one epoch of batch stats must move both
    assert np.abs(stats["BatchNorm_0"]["mean"]).max() > 0
    assert np.abs(stats["BatchNorm_0"]["var"] - 1.0).max() > 0
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_train_bn_updates_running_stats_per_step(tmp_path):
    trainer = _fit(tmp_path, _TinyBNTask, compiled=False)
    stats = _stats(trainer)
    assert np.abs(stats["BatchNorm_0"]["mean"]).max() > 0
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_frozen_bn_stats_never_gradient_updated(tmp_path):
    """Frozen-statistics BN: the running stats sit in the loss graph, so
    without trainable_mask they would receive gradients and get silently
    Adam-updated. They must come out of training bit-identical."""
    trainer = _fit(tmp_path, _FrozenBNTask, compiled=True)
    stats = _stats(trainer)
    np.testing.assert_array_equal(stats["BatchNorm_0"]["mean"], 0.0)
    np.testing.assert_array_equal(stats["BatchNorm_0"]["var"], 1.0)


def test_mmidb_gmlp_train_bn_wiring():
    """model.train_bn flips MMIDB_GMLP into mutable-BN mode (module flag +
    mutable_collections), without it the task stays pure."""
    from m2mixer_tpu.models.mmimdb import MMIDB_GMLP

    cfg = loads("model: {train_bn: true}\ntrain:\n  optimizer: {lr: 1e-3}\n")
    t = MMIDB_GMLP(cfg.model, cfg.train.optimizer)
    assert t.mutable_collections == ("batch_stats",)
    assert t.network.train_bn
    cfg2 = loads("model: {}\ntrain:\n  optimizer: {lr: 1e-3}\n")
    t2 = MMIDB_GMLP(cfg2.model, cfg2.train.optimizer)
    assert t2.mutable_collections == ()
    assert not t2.network.train_bn
