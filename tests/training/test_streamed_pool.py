"""Streamed device pools (train.pool_chunk_mb): epoch-compiled training for
datasets larger than device memory. The split stays on host; the trainer
streams fixed-size chunks through HBM (one lax.scan dispatch per chunk,
double-buffered H2D transfers) and must match the fully-hoisted path
bit-for-bit (same gathers, same rng folding via the cumulative start_step).
"""

import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.parallel import MeshConfig
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  pool_chunk_mb: {chunk_mb}
  grad_accum_steps: {accum}
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 11
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [96, 48, 48]}}
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

# synthetic AV-MNIST row: image 28*28*4 + audio 112*112*4 + label int32
ROW_BYTES = 28 * 28 * 4 + 112 * 112 * 4 + 4


def run(tmp_path, chunk_mb, accum=1, mesh=None, name="s"):
    cfg = loads(CFG.format(tmp=tmp_path, chunk_mb=chunk_mb, accum=accum))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=name, full_cfg=cfg,
                      mesh_config=mesh or MeshConfig(data=1, model=1))
    trainer.fit(task, dm)
    return trainer


def _assert_same_training(a, b, rtol=2e-5, atol=2e-6):
    for key in ("train_loss", "val_loss", "val_acc", "train_loss_fusion"):
        np.testing.assert_allclose(a.callback_metrics[key],
                                   b.callback_metrics[key], rtol=rtol, atol=atol)
    import jax

    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_streamed_matches_hoisted(tmp_path):
    """96 train rows (~4.9 MB) against a 2 MB budget -> 16-row chunks (6 scan
    dispatches); 48 val rows (~2.4 MB) stream too. Metrics AND final params
    must match the fully-hoisted run."""
    hoisted = run(tmp_path / "a", chunk_mb=0, name="hoisted")
    streamed = run(tmp_path / "b", chunk_mb=2, name="streamed")
    # sanity: the budget actually forced streaming, with a >= 1-step chunk
    rows = streamed._stream_chunk_rows("train", 16)
    assert rows and rows % 16 == 0
    assert rows == (int(2 * (1 << 20) / 2 / ROW_BYTES) // 16) * 16
    assert streamed._stream_chunk_rows("val", 16)
    assert not hasattr(streamed, "_dev_splits") or "train" not in streamed._dev_splits
    _assert_same_training(hoisted, streamed)


def test_streamed_with_grad_accum(tmp_path):
    """Chunks are quantized to bs*K rows so every chunk holds whole
    optimizer updates; parity with the hoisted accumulation path."""
    hoisted = run(tmp_path / "a", chunk_mb=0, accum=2, name="hoisted_k2")
    streamed = run(tmp_path / "b", chunk_mb=4, accum=2, name="streamed_k2")
    rows = streamed._stream_chunk_rows("train", 32)
    assert rows and rows % 32 == 0
    _assert_same_training(hoisted, streamed)


def test_streamed_multidevice(tmp_path):
    """Streamed chunks on a 4-way data mesh: replicated chunk placement +
    sharding-constrained gathers run the scan data-parallel; results match
    the single-device streamed run."""
    single = run(tmp_path / "a", chunk_mb=2, name="sm_single")
    multi = run(tmp_path / "b", chunk_mb=2, name="sm_multi",
                mesh=MeshConfig(data=4, model=1))
    _assert_same_training(single, multi, rtol=2e-4, atol=1e-5)


def test_tiny_budget_falls_back_to_per_step(tmp_path):
    """A budget too small to double-buffer even one step's rows must fall
    back to per-step host streaming (never overcommit HBM) and still train."""
    trainer = run(tmp_path, chunk_mb=0.5, name="tiny")
    assert trainer._stream_chunk_rows("train", 16) == 0
    assert np.isfinite(trainer.callback_metrics["val_loss"])
    assert trainer.global_step == 2 * (96 // 16)  # every batch still trained


def test_streamed_test_artifacts_in_dataset_order(tmp_path):
    """test() through streamed eval: prediction artifacts come back in
    dataset order (identity chunks, natural concatenation)."""
    import os

    trainer = run(tmp_path, chunk_mb=2, name="arts")
    logs = trainer.test(trainer.task, trainer.datamodule, ckpt="best")
    assert np.isfinite(logs["test_loss"])
    data = np.load(os.path.join(trainer.ckpt_dir, "test_preds.npz"))
    np.testing.assert_array_equal(
        data["labels"], trainer.datamodule.splits["test"]["label"])


def test_stream_chunk_partition_unit():
    from m2mixer_tpu.training.trainer import Trainer as T

    chunks = T._stream_chunks(None, np.arange(100), 32)
    assert [len(c) for c in chunks] == [32, 32, 32, 4]
    np.testing.assert_array_equal(np.concatenate(chunks), np.arange(100))


def test_shard_chunk_layout_unit():
    from m2mixer_tpu.training.trainer import Trainer as T

    idx = np.arange(100, 164)  # 64 rows, bs 16, 4 devices
    host, inner = T._shard_chunk_layout(idx, bs=16, dd=4)
    assert sorted(host.tolist()) == sorted(idx.tolist())
    # the scan's gather of `inner` over the host-arranged chunk must
    # reproduce the original epoch order exactly (bit-parity invariant)
    np.testing.assert_array_equal(np.asarray(host)[inner], idx)
    # each step draws bs/dd items from every device's contiguous shard
    shard_rows = len(idx) // 4
    for s in range(len(idx) // 16):
        step = inner[s * 16:(s + 1) * 16]
        owners = step // shard_rows
        assert sorted(owners.tolist()) == [0] * 4 + [1] * 4 + [2] * 4 + [3] * 4


def test_streamed_sharded_chunks(tmp_path):
    """pool_chunk_mb + train.sharded_pool: chunks live split 1/Nth per
    device (the per-device budget affords N-fold larger chunks), training
    matches the hoisted single-device run, and eval artifacts come back in
    dataset order."""
    import jax
    from m2mixer_tpu.config import loads
    import os

    hoisted = run(tmp_path / "a", chunk_mb=0, name="sh_hoisted")

    cfg = loads(CFG.format(tmp=tmp_path / "b", chunk_mb=0.8, accum=1))
    cfg.train.sharded_pool = True
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="sh_streamed", full_cfg=cfg,
                      mesh_config=MeshConfig(data=4, model=1))
    trainer.fit(task, dm)
    # the budget forced sharded streaming on train (96 rows ~4.9 MB / 4
    # devices = 1.2 MB resident > 0.8 MB), with dd-scaled chunk rows
    rows = trainer._stream_chunk_rows("train", 16)
    assert rows and rows % 16 == 0
    assert trainer._pool_sharded("train")
    # a sharded chunk actually lives 1/Nth per device
    host, _ = trainer._shard_chunk_layout(np.arange(rows), 16, 4)
    chunk = trainer._put_chunk(dm.splits["train"], host, True)
    assert chunk["image"].addressable_shards[0].data.shape[0] == rows // 4
    _assert_same_training(hoisted, trainer, rtol=2e-4, atol=1e-5)

    logs = trainer.test(trainer.task, trainer.datamodule, ckpt="best")
    assert np.isfinite(logs["test_loss"])
    data = np.load(os.path.join(trainer.ckpt_dir, "test_preds.npz"))
    np.testing.assert_array_equal(
        data["labels"], trainer.datamodule.splits["test"]["label"])


def test_streamed_sharded_uneven_split(tmp_path):
    """Sharded streaming needs only bs % dd == 0 — a split that does NOT
    divide the data axis (hoisted sharding's requirement) still streams
    sharded chunks (whole batches; the ragged tail goes per-step)."""
    cfg0 = loads(CFG.format(tmp=tmp_path / "a", chunk_mb=0, accum=1))
    cfg0.dataset.params.synthetic_sizes = [90, 48, 48]  # 90 % 4 != 0
    task0 = get_model(cfg0.model.type)(cfg0.model, cfg0.train.optimizer)
    dm0 = get_data_module(cfg0.dataset.type)(**cfg0.dataset.params)
    hoisted = Trainer(cfg0.train, name="us_h", full_cfg=cfg0,
                      mesh_config=MeshConfig(data=1, model=1))
    hoisted.fit(task0, dm0)

    cfg = loads(CFG.format(tmp=tmp_path / "b", chunk_mb=0.8, accum=1))
    cfg.dataset.params.synthetic_sizes = [90, 48, 48]
    cfg.train.sharded_pool = True
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="us_s", full_cfg=cfg,
                      mesh_config=MeshConfig(data=4, model=1))
    trainer.fit(task, dm)
    assert not trainer._pool_sharded("train")   # hoisting couldn't shard...
    assert trainer._stream_sharded("train")     # ...but streaming can
    rows = trainer._stream_chunk_rows("train", 16)
    assert rows == ((int(0.8 * (1 << 20) / 2 / ROW_BYTES) * 4) // 16) * 16
    _assert_same_training(hoisted, trainer, rtol=2e-4, atol=1e-5)
