"""Preemption-safe training (train.save_on_preemption) and host->device
prefetch (train.prefetch_batches).

TPU maintenance events / spot eviction deliver SIGTERM with a short grace
window; the trainer must write a resumable 'last' checkpoint and return
cleanly instead of dying mid-epoch. The reference has no analog (its only
interrupt handling is KeyboardInterrupt -> test-best, `/root/reference/run.py:77-81`).
"""

import json
import os
import signal

import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer

BASE = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 3
  compiled_epochs: false
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [48, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""


def build(cfg, name="preempt"):
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=name, full_cfg=cfg)
    return task, dm, trainer


def raise_sigterm_at_epoch(task, at_epoch):
    orig = task.on_train_epoch_start

    def hook(trainer, epoch):
        orig(trainer, epoch)
        if epoch == at_epoch:
            signal.raise_signal(signal.SIGTERM)

    task.on_train_epoch_start = hook


def test_sigterm_mid_training_saves_resumable_checkpoint(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    task, dm, trainer = build(cfg)
    prev_handler = signal.getsignal(signal.SIGTERM)
    raise_sigterm_at_epoch(task, at_epoch=1)
    trainer.fit(task, dm)

    assert trainer.preempted
    # handler restored after fit
    assert signal.getsignal(signal.SIGTERM) is prev_handler
    # 'preempted' checkpoint exists, is 'last', and is labeled with the last
    # COMPLETED epoch (0) so resume re-runs the interrupted epoch 1
    ckpt_dir = trainer.ckpt_dir
    pre = os.path.join(ckpt_dir, "preempted")
    assert os.path.isdir(pre)
    with open(os.path.join(ckpt_dir, "index.json")) as f:
        index = json.load(f)
    assert index["last"] == pre
    entry = [e for e in index["entries"] if e["path"] == pre][0]
    assert entry["epoch"] == 0 and entry["monitor"] is None
    # epoch 0's ranked checkpoint was NOT overwritten
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_0"))

    # resume: a fresh trainer with auto_resume continues at epoch 1 and
    # finishes the remaining epochs without re-triggering preemption
    cfg2 = loads(BASE.format(tmp=tmp_path))
    cfg2.train.auto_resume = True
    task2, dm2, trainer2 = build(cfg2)
    trainer2.fit(task2, dm2)
    assert not trainer2.preempted
    assert trainer2.current_epoch == cfg2.train.epochs - 1
    # the resumed run wrote its own normal checkpoints
    assert trainer2.checkpoints.best_path() is not None


def test_sigterm_during_val_keeps_normal_checkpoint(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    task, dm, trainer = build(cfg, name="preempt_val")
    orig = task.on_validation_epoch_end

    def hook(trainer_, epoch, logs):
        orig(trainer_, epoch, logs)
        if epoch == 1:
            signal.raise_signal(signal.SIGTERM)

    task.on_validation_epoch_end = hook
    trainer.fit(task, dm)

    assert trainer.preempted
    # signal arrived after the train phase: the normal end-of-epoch save
    # covers epoch 1 — no separate 'preempted' directory is needed
    ckpt_dir = trainer.ckpt_dir
    assert not os.path.isdir(os.path.join(ckpt_dir, "preempted"))
    with open(os.path.join(ckpt_dir, "index.json")) as f:
        index = json.load(f)
    assert index["last"].endswith("epoch_1")


def test_save_on_preemption_off_leaves_handler_alone(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.train.save_on_preemption = False
    cfg.train.epochs = 1
    task, dm, trainer = build(cfg, name="nopreempt")
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        trainer.fit(task, dm)
        assert signal.getsignal(signal.SIGTERM) is not signal.SIG_DFL
    finally:
        signal.signal(signal.SIGTERM, prev)
    assert not trainer.preempted


def test_prefetch_parity(tmp_path):
    """The prefetched per-step path is bit-identical to the unprefetched
    one (lookahead only reorders H2D transfers, not computation)."""
    results = []
    for prefetch in (True, False):
        cfg = loads(BASE.format(tmp=str(tmp_path) + f"/p{int(prefetch)}"))
        cfg.train.prefetch_batches = prefetch
        cfg.train.epochs = 2
        task, dm, trainer = build(cfg, name=f"prefetch_{int(prefetch)}")
        trainer.fit(task, dm)
        leaves = [np.asarray(x) for x in
                  __import__("jax").tree.leaves(trainer.params)]
        results.append((trainer.callback_metrics["val_loss"], leaves))
    (loss_a, leaves_a), (loss_b, leaves_b) = results
    assert loss_a == loss_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(a, b)
