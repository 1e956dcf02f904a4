"""GradNorm — adaptive loss-weight balancing (model.gradnorm, Chen et al.
2018). Host-side per-epoch refits like SoftAdapt/GradBlend: measured
per-branch gradient norms -> closed-form weight solve -> ctx['loss_weights'].
"""

import numpy as np
import pytest

import jax

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules.gradnorm import measure_gradnorm_weights
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 2
  compiled_epochs: true
  optimizer: {{lr: 5e-3, weight_decay: 0.0}}
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
  gradnorm: {{alpha: 1.0}}
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


def _make_task(tmp_path, **model_over):
    cfg = loads(CFG.format(tmp=tmp_path))
    for k, v in model_over.items():
        cfg.model[k] = v
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    return cfg, task


class _FakeTrainer:
    """Duck-typed trainer for the host-math tests: measure_gradnorm_weights
    only reads .datamodule/.params/.seed, and we stub the jitted measurement
    so the refit arithmetic is pinned exactly."""

    class _DM:
        batch_size = 2
        splits = {"train": {"x": np.zeros((4, 2), np.float32)}}

    def __init__(self):
        self.datamodule = self._DM()
        self.params = {"params": {}}
        self.seed = 0


def test_refit_math_closed_form(tmp_path):
    """First refit: r = 1 everywhere, target = mean(G); the solve
    w' = w * target/G renormalized to sum n. Second refit consumes the
    UPDATED weights and the epoch-0 loss baseline."""
    _, task = _make_task(tmp_path)
    trainer = _FakeTrainer()
    calls = [(np.array([2.0, 1.0, 1.0]), np.array([1.0, 1.0, 1.0])),
             (np.array([1.0, 1.0, 1.0]), np.array([0.5, 1.0, 1.0]))]
    it = iter(calls)
    task._gn_measure = lambda p, b, c, r: next(it)

    w1 = measure_gradnorm_weights(task, trainer, 0)
    # w0 = [1,1,1] (fixed_scaled, fusion_weight=1/3, n=3); target = 4/3
    expected = np.array([1 / 2, 1.0, 1.0]) * (4 / 3)
    expected *= 3 / expected.sum()
    np.testing.assert_allclose(w1, expected, rtol=1e-6)

    task.gn_weights = w1  # what the epoch hook does
    w2 = measure_gradnorm_weights(task, trainer, 1)
    r = np.array([0.5, 1.0, 1.0])
    r = r / r.mean()
    target = 1.0 * r  # mean(G)=1, alpha=1
    expected2 = w1 * target / 1.0
    expected2 *= 3 / expected2.sum()
    np.testing.assert_allclose(w2, expected2, rtol=1e-6)
    # baseline captured once, at the first measurement
    np.testing.assert_allclose(task.gn_initial_losses, [1.0, 1.0, 1.0])


def test_refit_skips_when_frozen(tmp_path):
    _, task = _make_task(tmp_path, freeze_modalities_on_epoch=0)
    task._gn_measure = lambda p, b, c, r: (np.ones(3), np.ones(3))
    assert measure_gradnorm_weights(task, _FakeTrainer(), 0) is None


def test_weights_flow_into_ctx(tmp_path):
    _, task = _make_task(tmp_path)
    task.gn_weights = np.array([0.5, 0.5, 2.0], np.float32)
    np.testing.assert_allclose(task.make_ctx(3, "train")["loss_weights"],
                               [0.5, 0.5, 2.0])


def test_gradnorm_rejects_other_adaptive_weighting(tmp_path):
    with pytest.raises(ValueError, match="softadapt"):
        _make_task(tmp_path, use_softadapt=True)
    with pytest.raises(ValueError, match="gradblend"):
        _make_task(tmp_path, gradblend=True)
    with pytest.raises(ValueError, match="update_every"):
        _make_task(tmp_path, gradnorm={"update_every": 0})


def test_gradnorm_trains_e2e(tmp_path):
    """Real fit: the hook measures on the device-resident pool, weights move
    away from the fixed vector, stay positive, and sum to n."""
    cfg, task = _make_task(tmp_path)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="gn_e2e", full_cfg=cfg)
    trainer.fit(task, dm)
    assert task.gn_weights is not None
    w = np.asarray(task.gn_weights, np.float64)
    assert np.all(w > 0)
    assert w.sum() == pytest.approx(task.num_branches, rel=1e-5)
    assert not np.allclose(w, np.ones_like(w))
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_gradnorm_alpha_zero_equalizes_norms(tmp_path):
    """alpha = 0 targets equal gradient norms: re-measuring with the refit
    weights (same params) must tighten the norm spread."""
    cfg, task = _make_task(tmp_path, gradnorm={"alpha": 0.0})
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.setup()
    # the same probe batch measure_gradnorm_weights slices from the split
    batch = {k: np.asarray(v[:dm.batch_size])
             for k, v in dm.splits["train"].items()}
    params = task.init_params(jax.random.PRNGKey(0), batch)

    class T:
        datamodule = dm
        seed = 7
    T.params = params
    trainer = T()

    w1 = measure_gradnorm_weights(task, trainer, 0)
    ctx0 = task.make_ctx(0, "train")
    rngs = {n: jax.random.fold_in(jax.random.fold_in(
        jax.random.PRNGKey(trainer.seed + 23), h), 0)
        for h, n in enumerate(task.RNG_COLLECTIONS)}
    g0, _ = task._gn_measure(params, batch, ctx0, rngs)
    task.gn_weights = w1
    g1, _ = task._gn_measure(params, batch, task.make_ctx(0, "train"), rngs)
    g0, g1 = np.asarray(g0, np.float64), np.asarray(g1, np.float64)
    spread0 = g0.max() / g0.min()
    spread1 = g1.max() / g1.min()
    assert spread1 < spread0
    assert spread1 == pytest.approx(1.0, rel=1e-3)
