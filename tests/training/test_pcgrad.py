"""PCGrad — gradient surgery over the multi-loss components
(train.optimizer.pcgrad, Yu et al. 2020).

Beyond the reference: its loss-weight machinery (fixed/SoftAdapt/GradBlend)
only rescales branch losses; PCGrad instead de-conflicts the per-branch
GRADIENTS — each component gradient drops its projection onto any other
component it negatively aligns with — before the optimizer sees a sum.
Entry point: ``MultiLossTask.step_components`` + ``pcgrad_value_and_grad``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.compiled import (make_grad_masker,
                                           pcgrad_value_and_grad)

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 2
  compiled_epochs: {compiled}
  optimizer: {{lr: 5e-3, weight_decay: 0.0, pcgrad: true}}
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


def test_pcgrad_projection_math():
    """Two conflicting components, hand-computed projections.

    w = (w1, w2); c1 = w1 + w2, c2 = -w2 at w = 0:
      g1 = (1, 1), g2 = (0, -1), <g1, g2> = -1 (conflict).
      g1' = g1 - (-1/||g2||^2) g2 = (1, 0)
      g2' = g2 - (-1/||g1||^2) g1 = (0.5, -0.5)
      sum = (1.5, -0.5)   [plain sum would be (1, 0)]
    """
    w = {"w": jnp.zeros((2,))}

    def comp_fn(p):
        comps = jnp.stack([p["w"][0] + p["w"][1], -p["w"][1]])
        return comps, (jnp.sum(comps), {})

    (_, _), g = pcgrad_value_and_grad(comp_fn, w)
    np.testing.assert_allclose(np.asarray(g["w"]), [1.5, -0.5], atol=1e-6)


def test_pcgrad_no_conflict_is_plain_sum():
    """Orthogonal component gradients project to themselves: PCGrad must
    return exactly the summed gradient."""
    w = {"a": jnp.asarray([2.0]), "b": jnp.asarray([3.0])}

    def comp_fn(p):
        comps = jnp.stack([jnp.sum(p["a"] ** 2), jnp.sum(p["b"] ** 2)])
        return comps, (jnp.sum(comps), {})

    (total, _), g = pcgrad_value_and_grad(comp_fn, w)
    np.testing.assert_allclose(np.asarray(g["a"]), [4.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g["b"]), [6.0], rtol=1e-6)
    assert float(total) == pytest.approx(13.0)


def test_pcgrad_masker_gates_projection():
    """Masked coordinates are zeroed BEFORE the projection: a conflict that
    exists only inside a frozen leaf must not alter the trainable leaf's
    gradient."""
    w = {"train": jnp.asarray([1.0]), "frozen": jnp.asarray([1.0])}

    def comp_fn(p):
        # conflict lives entirely in 'frozen' (+x vs -x); 'train' only in c1
        comps = jnp.stack([p["train"][0] ** 2 + p["frozen"][0],
                           -p["frozen"][0]])
        return comps, (jnp.sum(comps), {})

    masker = make_grad_masker({"train": 1.0, "frozen": 0.0})
    (_, _), g = pcgrad_value_and_grad(comp_fn, w, masker, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(g["train"]), [2.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g["frozen"]), [0.0], atol=1e-7)


def _task_and_batch(tmp_path, compiled="true", **opt):
    cfg = loads(CFG.format(tmp=tmp_path, compiled=compiled))
    for k, v in opt.items():
        cfg.train.optimizer[k] = v
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    return cfg, task, dm


def test_step_components_sum_matches_step(tmp_path):
    """sum(step_components) == step total, and aux matches — the contract
    pcgrad_value_and_grad relies on."""
    cfg, task, dm = _task_and_batch(tmp_path)
    dm.setup()
    batch = jax.tree.map(jnp.asarray, next(iter(dm.train_batches())))
    params = task.init_params(jax.random.PRNGKey(0), batch)
    ctx = task.make_ctx(0, "train")
    rngs = {n: jax.random.PRNGKey(i) for i, n in enumerate(task.RNG_COLLECTIONS)}
    total, aux = task.step(params, batch, ctx, rngs, train=True)
    comps, (total2, aux2) = task.step_components(params, batch, ctx, rngs,
                                                 train=True)
    assert comps.shape == (task.num_branches,)
    np.testing.assert_allclose(float(jnp.sum(comps)), float(total), rtol=1e-6)
    assert float(total2) == float(total)
    for k in aux["losses"]:
        assert float(aux2["losses"][k]) == float(aux["losses"][k])


@pytest.mark.parametrize("compiled", ["true", "false"])
def test_pcgrad_trains_e2e(tmp_path, compiled):
    cfg, task, dm = _task_and_batch(tmp_path, compiled=compiled)
    trainer = Trainer(cfg.train, name=f"pcg_{compiled}", full_cfg=cfg)
    trainer.fit(task, dm)
    assert trainer.compiled_epochs == (compiled == "true")
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_pcgrad_changes_the_trajectory(tmp_path):
    """PCGrad must actually alter training vs an identically-seeded plain
    run (the synthetic multi-branch losses do conflict)."""
    def fit(name, pcg):
        cfg, task, dm = _task_and_batch(tmp_path, pcgrad=pcg)
        cfg.train.epochs = 1
        trainer = Trainer(cfg.train, name=name, full_cfg=cfg)
        trainer.fit(task, dm)
        return trainer.callback_metrics["val_loss"]

    assert fit("pcg_on", True) != fit("pcg_off", False)


def test_pcgrad_rejects_sam(tmp_path):
    cfg, task, dm = _task_and_batch(tmp_path, sam_rho=0.05)
    trainer = Trainer(cfg.train, name="pcg_sam", full_cfg=cfg)
    with pytest.raises(ValueError, match="pcgrad.*sam|sam.*pcgrad"):
        trainer.fit(task, dm)


def test_pcgrad_rejects_single_objective(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path, compiled="true"))
    cfg.model.type = "AVMnistImageMixer"
    mods = cfg.model.modalities
    cfg.model.modalities = type(mods)(
        {"classification": mods.classification, "image": mods.image})
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="pcg_uni", full_cfg=cfg)
    with pytest.raises(ValueError, match="step_components|single objective"):
        trainer.fit(task, dm)
