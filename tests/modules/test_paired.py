"""Paired dual-modality encoder: exact math parity with two modular
MLPMixers, freeze-mask integration, and e2e training."""

import jax
import jax.numpy as jnp
import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.modules import get_block_by_name
from m2mixer_tpu.modules.paired import PairedMLPMixer, can_pair, pair_mlp_mixer_params

GEOM = dict(hidden_dim=16, token_dim=8, channel_dim=32, num_mixers=2, dropout=0.0)


def _modular(in_ch, patch, img):
    return get_block_by_name(block_type="MLPMixer", in_channels=in_ch,
                             patch_size=patch, image_size=img, **GEOM)


def test_paired_matches_modular():
    """PairedMLPMixer with stacked weights == two modular MLPMixers."""
    rng = np.random.RandomState(0)
    x_img = jnp.asarray(rng.randn(4, 1, 28, 28), jnp.float32)
    x_aud = jnp.asarray(rng.randn(4, 1, 112, 112), jnp.float32)

    m0 = _modular(1, 14, [28, 28])
    m1 = _modular(1, 56, [112, 112])
    v0 = m0.init(jax.random.PRNGKey(0), x_img)
    v1 = m1.init(jax.random.PRNGKey(1), x_aud)
    want0 = m0.apply(v0, x_img)
    want1 = m1.apply(v1, x_aud)

    paired = PairedMLPMixer(in_channels=(1, 1), patch_sizes=(14, 56),
                            image_sizes=((28, 28), (112, 112)), **GEOM)
    pv = {"params": pair_mlp_mixer_params(v0["params"], v1["params"])}
    # structure check: converted tree matches a fresh init
    fresh = paired.init(jax.random.PRNGKey(2), x_img, x_aud)
    assert (jax.tree_util.tree_structure(fresh["params"])
            == jax.tree_util.tree_structure(pv["params"]))
    got0, got1 = paired.apply(pv, x_img, x_aud)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=2e-5)


def test_can_pair_rules():
    from m2mixer_tpu.config import DictConfig

    base = DictConfig(dict(block_type="MLPMixer", in_channels=1, patch_size=14,
                           image_size=[28, 28], **GEOM))
    other = DictConfig(dict(base, patch_size=56, image_size=[112, 112]))
    assert can_pair(base, other)  # same geometry, different patch embeds
    assert not can_pair(base, DictConfig(dict(other, channel_dim=64)))
    assert not can_pair(base, DictConfig(dict(other, block_type="gMLP")))
    assert not can_pair(base, DictConfig(dict(other, patch_size=28)))  # 16 patches


CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 1e-3, weight_decay: 0.0, scheduler_patience: 2}}
  seed: 11
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [48, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.1
  paired_encoders: true
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


def test_paired_e2e_train(tmp_path):
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training import Trainer

    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="paired", full_cfg=cfg)
    trainer.fit(task, dm)
    assert "paired_encoder" in trainer.params["params"]
    assert "encoders_0" not in trainer.params["params"]
    assert np.isfinite(trainer.callback_metrics["val_loss"])
    logs = trainer.test(task, dm, ckpt="best")
    assert "test_acc" in logs


def test_paired_freeze_mask(tmp_path):
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model

    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.freeze_modalities_on_epoch = 1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {"image": jnp.zeros((2, 1, 28, 28)), "audio": jnp.zeros((2, 1, 112, 112)),
             "label": jnp.zeros((2,), jnp.int32)}
    params = task.init_params(jax.random.PRNGKey(0), batch)
    assert task.frozen_param_prefixes()[0] == "paired_encoder"
    mask = task.frozen_mask(params)
    froz = jax.tree.leaves(mask["params"]["paired_encoder"])
    live = jax.tree.leaves(mask["params"]["fusion_mixer"])
    assert all(float(v) == 0.0 for v in froz)
    assert all(float(v) == 1.0 for v in live)


def test_stacked_fusion_mixer_matches_modular():
    """StackedFusionMixer with converted weights == modular FusionMixer."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 8, 16), jnp.float32)
    modular = get_block_by_name(block_type="FusionMixer", hidden_dim=16,
                                num_patches=8, token_dim=8, channel_dim=32,
                                num_mixers=3, dropout=0.0)
    v = modular.init(jax.random.PRNGKey(0), x)
    want = modular.apply(v, x)

    from m2mixer_tpu.modules.stacked import (StackedFusionMixer,
                                             stack_fusion_mixer_params)

    stacked = StackedFusionMixer(hidden_dim=16, num_patches=8, token_dim=8,
                                 channel_dim=32, num_mixers=3, dropout=0.0)
    sv = {"params": stack_fusion_mixer_params(v["params"])}
    fresh = stacked.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(fresh["params"])
            == jax.tree_util.tree_structure(sv["params"]))
    got = stacked.apply(sv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert stacked.num_patch == 8  # fusion shape-inference protocol


def test_stacked_fusion_mixer_registry_and_e2e(tmp_path):
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training import Trainer

    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.modalities.multimodal.block_type = "StackedFusionMixer"
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="stackedfuse", full_cfg=cfg)
    trainer.fit(task, dm)
    assert np.isfinite(trainer.callback_metrics["val_loss"])
