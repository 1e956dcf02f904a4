"""SAM — sharpness-aware minimization (train.optimizer.sam_rho).

Beyond the reference: gradients are taken at the adversarially perturbed
point ``w + rho * g/||g||`` (Foret et al. 2021) while loss/aux report from
the clean point. The ascent direction is masked, so frozen modalities /
LoRA base trees / non-parameter collections are never perturbed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.compiled import make_grad_masker, sam_value_and_grad

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 2
  compiled_epochs: {compiled}
  optimizer: {{lr: 5e-3, weight_decay: 0.0, sam_rho: 0.05}}
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


def test_sam_math_on_quadratic():
    """loss = 0.5||w||^2 has g = w, so the SAM gradient is exactly
    w * (1 + rho/||w||); rho = 0 is the plain gradient."""
    w = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray([0.0, 4.0])}

    def loss_fn(p):
        sq = sum(jnp.sum(x * x) for x in jax.tree.leaves(p))
        return 0.5 * sq, {}

    (loss, _), g0 = sam_value_and_grad(loss_fn, w, 0.0)
    np.testing.assert_allclose(np.asarray(g0["a"]), [3.0, 0.0])
    assert float(loss) == pytest.approx(12.5)

    rho = 0.5
    (loss_c, _), g = sam_value_and_grad(loss_fn, w, rho)
    # ||g|| = ||w|| = 5 -> adv = w * (1 + 0.1), grad at adv = adv
    np.testing.assert_allclose(np.asarray(g["a"]), [3.3, 0.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g["b"]), [0.0, 4.4], rtol=1e-6)
    # loss reports the CLEAN point
    assert float(loss_c) == pytest.approx(12.5)


def test_sam_numpy_scalar_zero_takes_early_exit():
    """ADVICE r3 regression: a host numpy scalar rho=0 (np.float32(0.0))
    must hit the static early exit — ONE backward pass, like python 0.0 —
    instead of silently paying the traced SAM branch for a no-op."""
    w = {"a": jnp.asarray([3.0, 0.0])}
    calls = {"n": 0}

    def loss_fn(p):
        calls["n"] += 1
        return 0.5 * jnp.sum(p["a"] * p["a"]), {}

    for rho in (np.float32(0.0), np.int32(0), 0.0):
        calls["n"] = 0
        (_, _), g = sam_value_and_grad(loss_fn, w, rho)
        assert calls["n"] == 1, rho
        np.testing.assert_allclose(np.asarray(g["a"]), [3.0, 0.0])
    # a nonzero numpy rho still runs the SAM second pass
    calls["n"] = 0
    sam_value_and_grad(loss_fn, w, np.float32(0.5))
    assert calls["n"] == 2


def test_sam_respects_mask():
    """Masked-out leaves are not perturbed: their own SAM gradient stays the
    clean gradient and they do not contribute to the ascent norm."""
    w = {"train": jnp.asarray([3.0, 4.0]), "frozen": jnp.asarray([10.0, 0.0])}

    def loss_fn(p):
        sq = sum(jnp.sum(x * x) for x in jax.tree.leaves(p))
        return 0.5 * sq, {}

    frozen_mask = {"train": 1.0, "frozen": 0.0}
    masker = make_grad_masker(frozen_mask)
    rho = 0.5
    (_, _), g = sam_value_and_grad(loss_fn, w, rho, masker,
                                   jnp.float32(1.0))  # frozen flag ON
    # ascent norm over the trainable leaf only: ||(3,4)|| = 5
    np.testing.assert_allclose(np.asarray(g["train"]), [3.3, 4.4], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g["frozen"]), [10.0, 0.0], rtol=1e-6)


def test_sam_rho_validation(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path, compiled="true"))
    cfg.train.optimizer.sam_rho = -0.1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="sam_bad", full_cfg=cfg)
    with pytest.raises(ValueError, match="sam_rho"):
        trainer.fit(task, dm)


@pytest.mark.parametrize("compiled", ["true", "false"])
def test_sam_trains_e2e(tmp_path, compiled):
    cfg = loads(CFG.format(tmp=tmp_path, compiled=compiled))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"sam_{compiled}", full_cfg=cfg)
    trainer.fit(task, dm)
    assert trainer.compiled_epochs == (compiled == "true")
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_sam_changes_the_trajectory(tmp_path):
    """rho > 0 must actually alter training (vs an identically-seeded plain
    run), and rho = 0 must exactly reproduce the plain path."""
    def fit(name, rho):
        cfg = loads(CFG.format(tmp=tmp_path, compiled="true"))
        cfg.train.optimizer.sam_rho = rho
        cfg.train.epochs = 1
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name=name, full_cfg=cfg)
        trainer.fit(task, dm)
        return trainer.callback_metrics["val_loss"]

    plain = fit("sam_p0", 0.0)
    zero = fit("sam_p0b", 0)
    bumped = fit("sam_p5", 0.05)
    assert plain == zero
    assert bumped != plain
