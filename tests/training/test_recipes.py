"""Training-recipe feature tests: weighting modes, freezing, muting,
SoftAdapt, GradBlend, UQ — the reference's multi-head-loss machinery."""

import copy

import jax
import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer

BASE = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
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


def fit(cfg, epochs=None):
    if epochs is not None:
        cfg.train.epochs = epochs
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="recipe", full_cfg=cfg)
    trainer.fit(task, dm)
    return trainer, task, dm


def test_fixed_weight_annealing(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.fusion_loss_weight = 0.2
    cfg.model.fusion_loss_change = 0.1
    cfg.model.loss_change_epoch = 0
    trainer, task, _ = fit(cfg, epochs=3)
    # annealed +0.1 after each of 3 validation ends
    assert abs(task.fusion_loss_weight - 0.5) < 1e-6
    w = task.current_loss_weights()
    # weights: [ow, ow, w_f] * 3 with w_f=0.5
    assert abs(w[-1] - 1.5) < 1e-5 and abs(w[0] - 0.75) < 1e-5


def test_freeze_modalities_stops_encoder_updates(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.freeze_modalities_on_epoch = 1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="freeze", full_cfg=cfg)

    cfg.train.epochs = 1
    trainer.max_epochs = 1
    trainer.fit(task, dm)
    frozen_before = jax.device_get(trainer.params["params"]["encoders_0"])
    head_before = jax.device_get(trainer.params["params"]["classifier"])
    # continue into the frozen epoch
    trainer.max_epochs = 2
    trainer.current_epoch = 1
    trainer.fit(task, dm)
    frozen_after = jax.device_get(trainer.params["params"]["encoders_0"])
    head_after = jax.device_get(trainer.params["params"]["classifier"])

    # encoder unchanged during frozen epoch; fusion classifier still moved
    same = jax.tree.map(lambda a, b: np.allclose(a, b), frozen_before, frozen_after)
    assert all(jax.tree.leaves(same))
    moved = jax.tree.map(lambda a, b: not np.allclose(a, b), head_before, head_after)
    assert any(jax.tree.leaves(moved))


def test_random_muting_draws_inside_step(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.freeze_modalities_on_epoch = 0
    cfg.model.random_modality_muting_on_freeze = True
    cfg.model.muting_probs = {"image": 0.4, "audio": 0.4, "multimodal": 0.2}
    trainer, task, _ = fit(cfg, epochs=1)
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    ctx = task.make_ctx(0, "train")
    assert ctx["random_mute"] == 1.0
    np.testing.assert_allclose(ctx["mute_probs"], [0.4, 0.4, 0.2])


def test_softadapt_updates_weights(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.use_softadapt = True
    cfg.model.update_loss_weights_per_epoch = 2
    trainer, task, _ = fit(cfg, epochs=3)
    w = np.asarray(task.loss_weights)
    assert w.shape == (3,)
    assert abs(w.sum() - 1.0) < 1e-4
    assert not np.allclose(w, 1.0 / 3)  # refit happened at epoch 2


def test_gradblend_estimates_weights(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.gradblend = True
    cfg.model.gb_update_freq = 10
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="gb", full_cfg=cfg)
    # shrink the nested-training cost for the test
    import m2mixer_tpu.modules.gradblend as gb_mod

    orig = gb_mod.GradBlend.__init__

    def fast_init(self, fns, epochs=20, learning_rate=1e-3):
        orig(self, fns, epochs=1, learning_rate=learning_rate)

    gb_mod.GradBlend.__init__ = fast_init
    try:
        cfg.train.epochs = 1
        trainer.max_epochs = 1
        trainer.fit(task, dm)
    finally:
        gb_mod.GradBlend.__init__ = orig
    assert task.gb_weights is not None
    w = np.asarray(task.gb_weights)
    assert w.shape == (3,) and abs(w.sum() - 1.0) < 1e-4 and (w >= 0).all()
    np.testing.assert_allclose(task.current_loss_weights(), w)


def test_uq_model_trains(tmp_path):
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.type = "AVMnistMixerMultiLossUQ"
    trainer, task, dm = fit(cfg, epochs=1)
    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_loss"])
    assert "test_acc" in logs


def test_mimic_e2e_synthetic(tmp_path):
    from m2mixer_tpu.datasets.mimic import MIMICDataModule

    cfg = loads(f"""
train:
  tensorboard_path: {tmp_path}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 3
  monitor: val_loss
  monitor_mode: min
model:
  type: MimicMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 6, classifier: StandardClassifier, input_shape: [16, 25, 32]}}
    time: {{block_type: MLPMixerNoPatching, embedding_dim: 12, proj_dim: 32, hidden_dim: 32,
            num_patch: 24, token_dim: 8, channel_dim: 32, num_mixers: 1}}
    static: {{block_type: MLP, input_dim: 5, hidden_dim: 32, num_blocks: 1, output_dim: 32}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion, hidden_dim: 32,
                  token_dim: 8, channel_dim: 32, num_mixers: 1}}
""")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = MIMICDataModule.synthetic(n=128, batch_size=16)
    trainer = Trainer(cfg.train, name="mimic", full_cfg=cfg)
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    assert "test_auroc" in logs and "test_f1_micro" in logs
    assert np.isfinite(logs["test_loss"])


def test_auto_resume_continues_from_last(tmp_path):
    """train.auto_resume picks up the newest previous version's 'last'
    checkpoint (crash/preemption recovery)."""
    import jax

    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.train.auto_resume = True
    cfg.train.epochs = 1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    t1 = Trainer(cfg.train, name="ar", full_cfg=cfg)
    t1.fit(task, dm)
    p1 = jax.device_get(t1.params)

    # a fresh trainer (new version dir) must resume from t1's last ckpt
    cfg2 = loads(BASE.format(tmp=tmp_path))
    cfg2.train.auto_resume = True
    cfg2.train.epochs = 2
    task2 = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)
    t2 = Trainer(cfg2.train, name="ar", full_cfg=cfg2)
    t2.fit(task2, dm)
    assert t2.current_epoch >= 1  # continued past the restored epoch
    # and it really loaded t1's weights before continuing: global step advanced
    assert t2.global_step > t1.global_step


def test_uq_tie_break_uses_least_uncertain_branch(tmp_path):
    """Exact uncertainty ties must still yield a branch prediction (argmin
    -> fusion branch), not class 0 as the reference's strict-< masks do
    (`/root/reference/models/avmnist.py:525-537`)."""
    import jax.numpy as jnp

    from m2mixer_tpu.models import get_model

    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.type = "AVMnistMixerMultiLossUQ"
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)

    # identical evidence in all 3 branches -> identical uncertainties (tie)
    logits = jnp.zeros((4, 10)).at[:, 7].set(5.0)
    outputs = {"logits": logits, "branch_logits": (logits, logits)}
    batch = {"label": jnp.full((4,), 7, jnp.int32)}
    preds = task.predictions(outputs, batch)
    np.testing.assert_array_equal(np.asarray(preds["preds"]), np.full(4, 7))

    # and a clear winner is still selected per-sample
    lo = jnp.zeros((1, 10)).at[:, 2].set(0.5)   # high uncertainty
    hi = jnp.zeros((1, 10)).at[:, 3].set(50.0)  # low uncertainty
    outputs = {"logits": lo, "branch_logits": (hi, lo)}
    preds = task.predictions(outputs, {"label": jnp.zeros((1,), jnp.int32)})
    assert int(preds["preds"][0]) == 3


def test_gradblend_reuses_jitted_steps_across_invocations(tmp_path):
    """gb_update_freq=1 re-estimates every epoch; the estimator (and its
    jitted sub-steps) must be built once and only parameter values refreshed
    — no per-invocation recompile churn."""
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.gradblend = True
    cfg.model.gb_update_freq = 1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="gb_reuse", full_cfg=cfg)

    import m2mixer_tpu.modules.gradblend as gb_mod

    orig = gb_mod.GradBlend.__init__
    builds = []

    def counting_init(self, fns, epochs=20, learning_rate=1e-3):
        builds.append(1)
        orig(self, fns, epochs=1, learning_rate=learning_rate)

    gb_mod.GradBlend.__init__ = counting_init
    try:
        cfg.train.epochs = 2
        trainer.max_epochs = 2
        trainer.fit(task, dm)
    finally:
        gb_mod.GradBlend.__init__ = orig
    assert len(builds) == 1  # built once, reused at epoch 1
    assert task.gb_weights is not None
    # the cached estimator's train_step saw exactly one batch shape across
    # BOTH invocations; eval_loss sees at most two (the full-batch train
    # shape plus this fixture's 4-sample val split, smaller than one batch)
    for _, train_step, eval_loss in task._gb_estimator._steps:
        assert train_step._cache_size() == 1, train_step._cache_size()
        assert eval_loss._cache_size() <= 2


def test_gradblend_batches_are_uniform_shape(tmp_path):
    """48-sample synthetic train split, bs=16, 10% cut=4 -> val smaller than
    a batch stays one (ragged) batch; train yields full batches only."""
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.model.gradblend = True
    cfg.model.gb_update_freq = 10
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="gb_shapes", full_cfg=cfg)

    import m2mixer_tpu.modules.gradblend as gb_mod

    orig = gb_mod.GradBlend.__init__

    def fast_init(self, fns, epochs=20, learning_rate=1e-3):
        orig(self, fns, epochs=1, learning_rate=learning_rate)

    gb_mod.GradBlend.__init__ = fast_init
    try:
        cfg.train.epochs = 1
        trainer.max_epochs = 1
        trainer.fit(task, dm)
    finally:
        gb_mod.GradBlend.__init__ = orig
    for _, train_step, _ in task._gb_estimator._steps:
        assert train_step._cache_size() == 1


def test_auto_resume_scans_multiple_prior_versions(tmp_path):
    """With several prior versions, auto_resume must pick the NEWEST one
    that actually left a 'last' checkpoint (older and ckpt-less versions
    are skipped)."""
    import os
    import shutil

    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.train.auto_resume = True
    cfg.train.epochs = 1
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)

    # version_0: trained, has checkpoints
    t0 = Trainer(cfg.train, name="arm", full_cfg=cfg)
    t0.fit(get_model(cfg.model.type)(cfg.model, cfg.train.optimizer), dm)
    # version_1: trained further (2 epochs), has checkpoints — the newest good one
    cfg1 = loads(BASE.format(tmp=tmp_path))
    cfg1.train.auto_resume = True
    cfg1.train.epochs = 2
    t1 = Trainer(cfg1.train, name="arm", full_cfg=cfg1)
    t1.fit(get_model(cfg1.model.type)(cfg1.model, cfg1.train.optimizer), dm)
    # version_2: a crashed run that left NO checkpoint (empty dir)
    base = os.path.join(t1.logger.save_dir, "arm")
    os.makedirs(os.path.join(base, "version_2", "checkpoints"), exist_ok=True)

    cfg3 = loads(BASE.format(tmp=tmp_path))
    cfg3.train.auto_resume = True
    cfg3.train.epochs = 3
    t3 = Trainer(cfg3.train, name="arm", full_cfg=cfg3)
    found = t3._find_latest_checkpoint()
    assert found is not None
    # must come from version_1 (newest WITH a last ckpt), not 0 or 2
    assert f"{os.sep}version_1{os.sep}" in found, found
    t3.fit(get_model(cfg3.model.type)(cfg3.model, cfg3.train.optimizer), dm)
    assert t3.current_epoch >= 2  # resumed at epoch 2 after v1's two epochs
    shutil.rmtree(os.path.join(base, "version_2"))


def test_p_muting_trains_end_to_end(tmp_path):
    """p_muting>0 blocks the device-resident train path (host-side batch
    muting); training must fall through to the per-step path and still
    produce finite metrics, with val/test staying device-resident."""
    cfg = loads(BASE.format(tmp=tmp_path))
    cfg.dataset.params.p_muting = 0.5
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="mute_e2e", full_cfg=cfg)
    trainer.fit(task, dm)
    assert not dm.device_resident_ok("train")
    assert dm.device_resident_ok("val")
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])
    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_loss"])
