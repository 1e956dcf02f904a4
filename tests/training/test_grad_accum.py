"""Gradient accumulation (train.grad_accum_steps) and LR schedules.

K micro-batches of size m, gradients averaged, one optimizer update — must
match a single update on the K*m batch (same shuffle order, deterministic
step), on both the epoch-compiled and per-step paths."""

import jax
import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.callbacks import LRSchedule

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 1
  compiled_epochs: {compiled}
  grad_accum_steps: {accum}
  optimizer: {{lr: 1e-2, weight_decay: 0.0}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: {bs}, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
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


def _fit(tmp_path, name, bs, accum, compiled):
    cfg = loads(CFG.format(tmp=tmp_path, bs=bs, accum=accum,
                           compiled=str(compiled).lower()))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=name, full_cfg=cfg)
    trainer.fit(task, dm)
    return trainer


def _leaves(trainer):
    return [np.asarray(x) for x in jax.tree.leaves(trainer.params)]


@pytest.mark.parametrize("compiled", [True, False], ids=["compiled", "per_step"])
def test_accum_matches_large_batch(tmp_path, compiled):
    """Adam normalizes gradient scale, so this e2e check mostly validates
    the wiring (update counts, data order); fp reassociation through
    rsqrt(nu) leaves ~1e-3 rel differences. The exact averaging semantics
    are pinned scale-sensitively by test_accum_sgd_exact below."""
    big = _fit(tmp_path, f"big_{compiled}", bs=16, accum=1, compiled=compiled)
    acc = _fit(tmp_path, f"acc_{compiled}", bs=8, accum=2, compiled=compiled)
    assert acc.global_step == big.global_step  # optimizer updates, not micros
    # same samples at fp-close params -> epoch mean loss must agree tightly
    np.testing.assert_allclose(acc.callback_metrics["train_loss"],
                               big.callback_metrics["train_loss"], rtol=5e-3)
    # Adam's early steps are ~sign(g)*lr, so near-zero grads flip on fp
    # noise; params agree only to O(lr) here (exactness: test_accum_sgd_exact)
    for a, b in zip(_leaves(acc), _leaves(big)):
        np.testing.assert_allclose(a, b, atol=0.03)


def test_accum_sgd_exact(tmp_path):
    """Scale-sensitive parity: with SGD (no Adam normalization), K=2
    accumulation over micro-batches of 8 must equal single updates on the
    16-batch to fp-exactness — a sum-instead-of-average bug would show as
    a 2x step."""
    import jax.numpy as jnp
    import optax

    from m2mixer_tpu.training.compiled import make_train_epoch_fn

    cfg = loads(CFG.format(tmp=tmp_path, bs=8, accum=2, compiled="true"))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.setup("fit")
    arrays = {k: jnp.asarray(v) for k, v in dm.splits["train"].items()}
    batch0 = {k: v[:8] for k, v in dm.splits["train"].items()}
    params0 = task.init_params(jax.random.PRNGKey(0), batch0)
    frozen = task.frozen_mask(params0)
    ctx = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    rngs = {"dropout": jax.random.PRNGKey(1), "stochastic": jax.random.PRNGKey(2),
            "mute": jax.random.PRNGKey(3)}
    order = jnp.arange(32, dtype=jnp.int32)
    opt = optax.sgd(1e-2)

    def run(bs, accum):
        fn = make_train_epoch_fn(task, opt, frozen, bs, grad_accum=accum)
        params = jax.tree.map(jnp.copy, params0)
        params, _, losses, _ = fn(params, opt.init(params), arrays, order,
                                  ctx, rngs, 0)
        return params, losses

    p_acc, l_acc = run(8, 2)
    p_big, l_big = run(16, 1)
    assert l_acc.shape == (4,) and l_big.shape == (2,)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_accum_ragged_tail(tmp_path):
    """3 micro-batches with K=2: one full accumulation + a flush of the
    odd remainder (averaged over the actual count)."""
    cfg = loads(CFG.format(tmp=tmp_path, bs=8, accum=2, compiled="true"))
    cfg.dataset.params.synthetic_sizes = [24, 16, 16]  # 3 micro-batches
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="ragged", full_cfg=cfg)
    trainer.fit(task, dm)
    assert trainer.global_step == 2  # 1 compiled update + 1 tail flush
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_lr_schedule_math():
    s = LRSchedule(1.0, {"type": "cosine", "warmup_epochs": 2, "min_lr": 0.1},
                   max_epochs=10)
    assert s.at_epoch(0) == pytest.approx(0.5)   # warmup 1/2
    assert s.at_epoch(1) == pytest.approx(1.0)   # warmup 2/2
    assert s.at_epoch(2) == pytest.approx(1.0)   # decay starts AT the peak
    assert s.at_epoch(3) < 1.0                   # cosine decay under way
    assert s.at_epoch(10) == pytest.approx(0.1)  # floor at min_lr
    lin = LRSchedule(1.0, {"type": "linear"}, max_epochs=4)
    assert lin.at_epoch(2) == pytest.approx(0.5)
    step = LRSchedule(1.0, {"type": "step", "step_size": 2, "gamma": 0.1},
                      max_epochs=10)
    assert step.at_epoch(1) == pytest.approx(1.0)
    assert step.at_epoch(2) == pytest.approx(0.1)
    with pytest.raises(ValueError, match="Unknown schedule"):
        LRSchedule(1.0, {"type": "nope"}, max_epochs=5)


def test_accum_with_sharded_pool(tmp_path):
    """grad_accum_steps over a data-sharded device pool: shard-aligned
    micro-gathers must still produce the same training as the replicated
    pool (the K-trim keeps whole shard-aligned batches)."""
    from m2mixer_tpu.parallel import MeshConfig

    def fit(sharded):
        cfg = loads(CFG.format(tmp=tmp_path, bs=8, accum=2, compiled="true"))
        cfg.dataset.params.synthetic_sizes = [64, 16, 16]
        cfg.train.sharded_pool = sharded
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name=f"accshard_{sharded}", full_cfg=cfg,
                          mesh_config=MeshConfig(data=4, model=1))
        trainer.fit(task, dm)
        return trainer

    t_sh = fit(True)
    t_rep = fit(False)
    # shard_align_order intentionally recomposes batches (bs/N per shard),
    # so losses aren't bit-equal to the replicated path; the combination
    # must still do the same number of updates over the same pool and land
    # in the same loss ballpark (K=1 bit-parity: test_sharded_pool)
    assert t_sh.global_step == t_rep.global_step == 4  # 8 micros / K=2
    a = t_sh.callback_metrics["train_loss"]
    b = t_rep.callback_metrics["train_loss"]
    assert np.isfinite(a) and np.isfinite(b) and abs(a - b) < 0.5


def test_lr_schedule_resume_alignment(tmp_path):
    """Resuming mid-run must continue the schedule from the restored epoch,
    not restart warmup."""
    cfg = loads(CFG.format(tmp=tmp_path, bs=16, accum=1, compiled="true"))
    cfg.train.epochs = 2
    cfg.train.optimizer.schedule = {"type": "linear", "min_lr": 0.0,
                                    "warmup_epochs": 0}
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="sched_res", full_cfg=cfg)
    trainer.fit(task, dm)
    ckpt = trainer.checkpoints.last_path()

    cfg2 = loads(CFG.format(tmp=tmp_path, bs=16, accum=1, compiled="true"))
    cfg2.train.epochs = 4
    cfg2.train.optimizer.schedule = {"type": "linear", "min_lr": 0.0,
                                     "warmup_epochs": 0}
    task2 = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)
    trainer2 = Trainer(cfg2.train, name="sched_res2", full_cfg=cfg2)
    trainer2.fit(task2, dm, resume_from=ckpt)
    # resumed at epoch 2 of 4; after epochs 2,3 the linear schedule must be
    # at at_epoch(4), same as an uninterrupted 4-epoch run would end
    expect = LRSchedule(1e-2, cfg2.train.optimizer.schedule, 4).at_epoch(4)
    assert trainer2.callback_metrics["lr"] == pytest.approx(expect)


def test_lr_schedule_drives_trainer(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path, bs=16, accum=1, compiled="true"))
    cfg.train.epochs = 3
    cfg.train.optimizer.schedule = {"type": "cosine", "warmup_epochs": 1,
                                    "min_lr": 1e-4}
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="sched", full_cfg=cfg)
    trainer.fit(task, dm)
    expect = LRSchedule(1e-2, cfg.train.optimizer.schedule, 3).at_epoch(3)
    assert trainer.callback_metrics["lr"] == pytest.approx(expect)
