"""Async checkpointing (`train.async_checkpointing`): Orbax saves happen on
a background thread so the epoch loop never blocks on checkpoint IO; every
read path (restore, best-ckpt test, preemption, fit exit) waits for the
in-flight write first. The reference blocks on Lightning's synchronous
ModelCheckpoint (`/root/reference/run.py:62-67`)."""

import os

import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.callbacks import CheckpointManager

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  async_checkpointing: true
  optimizer: {{lr: 1e-3, weight_decay: 0.0, scheduler_patience: 2}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [64, 32, 32]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.1
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


def _state(value: float):
    return {"params": {"w": np.full((4,), value, np.float32)},
            "epoch": np.int32(int(value))}


def test_async_manager_roundtrip_and_prune(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="val_loss",
                            mode="min", top_k=2, save_last=True,
                            async_save=True)
    for epoch, loss in enumerate([3.0, 1.0, 2.0, 4.0]):
        mgr.save(epoch, _state(float(epoch)), {"val_loss": loss})
    mgr.wait()
    # top-2 by val_loss = epochs 1, 2; epoch 3 survives only as 'last'
    kept = {e["epoch"] for e in mgr.index["entries"]}
    assert kept == {1, 2, 3}
    assert mgr.best_path().endswith("epoch_1")
    restored = mgr.restore(mgr.best_path(), _state(0.0))
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.full((4,), 1.0, np.float32))
    assert int(restored["epoch"]) == 1


def test_async_overwrite_inflight_path(tmp_path):
    """Re-saving the same epoch while its first write may still be in
    flight: the manager waits before deleting the in-flight directory."""
    mgr = CheckpointManager(str(tmp_path / "ck"), top_k=1, save_last=False,
                            async_save=True)
    mgr.save(0, _state(1.0), {"val_loss": 5.0})
    mgr.save(0, _state(2.0), {"val_loss": 4.0})  # overwrites epoch_0
    mgr.wait()
    restored = mgr.restore(mgr.best_path(), _state(0.0))
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.full((4,), 2.0, np.float32))


def test_async_prune_without_save_last(tmp_path):
    """top_k=1 + save_last=False: the freshly scheduled (possibly in-flight)
    checkpoint itself is pruned when it ranks below the best — the guard
    must wait before rmtree instead of racing the writer thread."""
    mgr = CheckpointManager(str(tmp_path / "ck"), top_k=1, save_last=False,
                            async_save=True)
    mgr.save(0, _state(1.0), {"val_loss": 1.0})
    mgr.save(1, _state(2.0), {"val_loss": 9.0})  # worse: pruned immediately
    mgr.wait()
    assert [e["epoch"] for e in mgr.index["entries"]] == [0]
    assert os.path.exists(mgr._path(0)) and not os.path.exists(mgr._path(1))


def test_async_save_survives_buffer_donation(tmp_path):
    """The epoch step donates its params/opt_state buffers (donate_argnums
    in training/compiled.py) — the very arrays a just-scheduled async save
    references. Orbax copies device arrays to host BEFORE save() returns
    (only the disk write is deferred), so donation right after save must
    not corrupt the checkpoint. This pins that contract."""
    import jax
    import jax.numpy as jnp

    mgr = CheckpointManager(str(tmp_path / "ck"), async_save=True)
    x = jnp.arange(8, dtype=jnp.float32)
    host_copy = np.asarray(x).copy()
    mgr.save(0, {"params": {"w": x}}, {"val_loss": 1.0})
    donate = jax.jit(lambda a: a * 0 - 1.0, donate_argnums=0)
    _ = donate(x)  # invalidates x's buffer where donation is supported
    mgr.wait()
    restored = mgr.restore(mgr._path(0),
                           {"params": {"w": np.zeros(8, np.float32)}})
    np.testing.assert_array_equal(restored["params"]["w"], host_copy)


def test_async_on_disk_index_never_references_inflight(tmp_path):
    """Crash-safety contract: while a save is in flight (the Orbax tmpdir
    has not been renamed into place yet), the on-disk index.json must not
    list that entry nor point 'last' at it — a SIGKILL mid-write would
    otherwise leave an index referencing a directory that never
    materialized. wait() then publishes the committed entry."""
    import json

    mgr = CheckpointManager(str(tmp_path / "ck"), async_save=True)
    mgr.save(0, _state(1.0), {"val_loss": 2.0})
    mgr.wait()

    # simulate epoch_1 still being in flight at index-write time (the real
    # window is the background thread's write; the sanitization is what we
    # can pin deterministically)
    mgr.index["entries"].append(
        {"epoch": 1, "monitor": 1.0, "path": mgr._path(1)})
    mgr.index["last"] = mgr._path(1)
    mgr._inflight = mgr._path(1)
    mgr._write_index()
    with open(mgr._index_path) as f:
        disk = json.load(f)
    assert [e["epoch"] for e in disk["entries"]] == [0]
    assert disk["last"] == mgr._path(0)  # previous durable checkpoint
    # in-memory index keeps the full picture for the live process
    assert mgr.index["last"] == mgr._path(1)

    mgr.wait()  # "commit": publishes the withheld entry
    with open(mgr._index_path) as f:
        disk = json.load(f)
    assert {e["epoch"] for e in disk["entries"]} == {0, 1}
    assert disk["last"] == mgr._path(1)


def test_async_e2e_train_and_best_test(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="async_e2e", full_cfg=cfg)
    assert trainer.checkpoints.async_save
    trainer.fit(task, dm)
    # fit() waited: nothing in flight, artifacts durable on disk
    assert trainer.checkpoints._inflight is None
    assert trainer.checkpoints.best_path() is not None
    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_loss"])
    assert 0.0 <= logs["test_acc"] <= 1.0
