"""Epoch-compiled training path: must run and agree with per-step training."""

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
  compiled_epochs: {compiled}
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 11
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [40, 16, 16]}}
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


def run(tmp_path, compiled: bool):
    cfg = loads(CFG.format(tmp=tmp_path, compiled=str(compiled).lower()))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"ce_{compiled}", full_cfg=cfg,
                      mesh_config=MeshConfig(data=1, model=1))
    trainer.fit(task, dm)
    return trainer


def test_compiled_matches_per_step(tmp_path):
    """40 samples / bs 16 -> 2 full scan steps + 1 ragged tail step; the
    compiled and per-step paths must produce identical metrics (same data
    order, same per-step rng folding)."""
    t_compiled = run(tmp_path / "a", compiled=True)
    t_step = run(tmp_path / "b", compiled=False)
    assert t_compiled.compiled_epochs
    assert not t_step.compiled_epochs
    for key in ("train_loss", "val_loss", "val_acc", "train_loss_fusion"):
        np.testing.assert_allclose(
            t_compiled.callback_metrics[key], t_step.callback_metrics[key],
            rtol=2e-5, atol=2e-6,
        )


def test_compiled_test_artifacts(tmp_path):
    trainer = run(tmp_path, compiled=True)
    cfg = loads(CFG.format(tmp=tmp_path, compiled="true"))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    logs = trainer.test(trainer.task, dm, ckpt="best")
    import os

    data = np.load(os.path.join(trainer.ckpt_dir, "test_preds.npz"))
    assert data["preds"].shape[0] == 16
    assert data["logits"].shape == (16, 10)


def test_compiled_multidevice_matches_single(tmp_path):
    """Epoch-compiled training over a 4x2 DPxTP mesh must equal the
    single-device run (same data order, same rng folding)."""
    from m2mixer_tpu.parallel import MeshConfig as MC

    results = {}
    for name, mc in (("multi", MC(data=4, model=2, model_min_dim=16)),
                     ("single", MC(data=1, model=1))):
        cfg = loads(CFG.format(tmp=tmp_path / name, compiled="true"))
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name=f"cem_{name}", full_cfg=cfg, mesh_config=mc)
        trainer.fit(task, dm)
        assert trainer.compiled_epochs
        results[name] = trainer.callback_metrics
    for key in ("train_loss", "val_loss", "val_acc"):
        np.testing.assert_allclose(results["multi"][key], results["single"][key],
                                   rtol=2e-4, atol=1e-5)


def test_shard_align_order_unit():
    from m2mixer_tpu.training.compiled import shard_align_order

    # pool 32, 4 shards of 8, batch 8 -> 2 per shard per step
    rng = np.random.RandomState(0)
    order = rng.permutation(32)
    aligned, leftover = shard_align_order(order, batch_size=8, n_shards=4, shard_size=8)
    assert len(aligned) + len(leftover) == 32
    assert sorted(np.concatenate([aligned, leftover]).tolist()) == list(range(32))
    steps = aligned.reshape(-1, 4, 2)
    for s in steps:  # each step: 2 indices from each shard, in shard order
        for d in range(4):
            assert all(idx // 8 == d for idx in s[d]), s

    # skewed order (all shard-0 first) still balances; leftovers spill over
    skew = np.arange(32)
    aligned, leftover = shard_align_order(skew, 8, 4, 8)
    assert len(aligned) % 8 == 0
    assert sorted(np.concatenate([aligned, leftover]).tolist()) == list(range(32))


def test_sharded_pool_matches_replicated(tmp_path):
    """Same shard-aligned order, same init: the sharded-pool epoch fn must
    produce identical losses/params to the replicated one — and actually
    hold only 1/N of the pool per device."""
    import jax
    import jax.numpy as jnp
    import optax

    from m2mixer_tpu.parallel import make_mesh, replicated
    from m2mixer_tpu.training.compiled import (
        make_train_epoch_fn, shard_align_order)
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = loads(CFG.format(tmp=tmp_path, compiled="true"))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    dd = 4
    pool, bs = 32, 16
    rngn = np.random.RandomState(3)
    splits = {
        "image": rngn.rand(pool, 1, 28, 28).astype(np.float32),
        "audio": rngn.rand(pool, 1, 112, 112).astype(np.float32),
        "label": rngn.randint(0, 10, (pool,)).astype(np.int32),
    }
    batch0 = {k: jnp.asarray(v[:bs]) for k, v in splits.items()}
    params0 = task.init_params(jax.random.PRNGKey(0), batch0)
    opt = optax.adam(1e-3)
    frozen = task.frozen_mask(params0)
    ctx = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    keys = {n: jax.random.PRNGKey(i) for i, n in enumerate(("dropout", "stochastic", "mute"))}

    order = rngn.permutation(pool)
    aligned, leftover = shard_align_order(order, bs, dd, pool // dd)
    assert len(leftover) == 0  # balanced pool: everything device-path

    def run(sharded):
        if sharded:
            arrays = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(
                    mesh, P("data", *([None] * (np.ndim(x) - 1))))), splits)
        else:
            arrays = jax.device_put(splits, replicated(mesh))
        fn = make_train_epoch_fn(task, opt, frozen, bs, mesh=mesh,
                                 sharded_pool=sharded)
        params = jax.tree.map(jnp.copy, params0)
        opt_state = opt.init(params)
        params, opt_state, losses, _ = fn(params, opt_state, arrays,
                                          jnp.asarray(aligned, jnp.int32), ctx,
                                          keys, 0)
        return arrays, params, np.asarray(losses)

    arrays_r, params_r, losses_r = run(sharded=False)
    arrays_s, params_s, losses_s = run(sharded=True)

    np.testing.assert_allclose(losses_s, losses_r, rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(params_r), jax.tree.leaves(params_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)

    # per-device pool memory shrinks by the data-axis factor
    img_r, img_s = arrays_r["image"], arrays_s["image"]
    assert img_r.addressable_shards[0].data.shape[0] == pool
    assert img_s.addressable_shards[0].data.shape[0] == pool // dd


def test_trainer_sharded_pool_e2e(tmp_path):
    """train.sharded_pool=true end to end on the virtual mesh: trains, shards
    every split, eval artifacts come back in dataset order."""
    cfg = loads(CFG.format(tmp=tmp_path, compiled="true"))
    cfg.train.sharded_pool = True
    cfg.dataset.params.synthetic_sizes = [64, 32, 32]
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="sharded", full_cfg=cfg,
                      mesh_config=MeshConfig(data=8, model=1))
    trainer.fit(task, dm)
    assert trainer._pool_sharded("train") and trainer._pool_sharded("val")
    img = trainer._device_split("train")["image"]
    assert img.addressable_shards[0].data.shape[0] == 64 // 8
    assert np.isfinite(trainer.callback_metrics["val_loss"])

    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_loss"])
    import os

    data = np.load(os.path.join(trainer.ckpt_dir, "test_preds.npz"))
    # artifacts restored to dataset order: labels match the raw split
    np.testing.assert_array_equal(data["labels"], dm.splits["test"]["label"])
