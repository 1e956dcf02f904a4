"""Top-label calibration error (ECE) — torchmetrics CalibrationError
semantics, beyond the reference (which ships no calibration metric despite
its UQ model family). Wired via ``model.log_calibration`` on the flagship
and UQ tasks; fed from emitted probabilities like AUROC/AP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.metrics import CalibrationError


def _ece_by_hand(probs, labels, n_bins=15, norm="l1"):
    conf = probs.max(axis=1)
    hit = (probs.argmax(axis=1) == labels).astype(np.float64)
    edges = np.linspace(0, 1, n_bins + 1)
    gaps, props = [], []
    for i in range(n_bins):
        lo, hi = edges[i], edges[i + 1]
        m = (conf >= lo) & ((conf < hi) if i < n_bins - 1 else (conf <= hi))
        if m.sum() == 0:
            continue
        gaps.append(abs(hit[m].mean() - conf[m].mean()))
        props.append(m.sum() / conf.size)
    gaps, props = np.array(gaps), np.array(props)
    if norm == "l1":
        return float((gaps * props).sum())
    if norm == "max":
        return float(gaps.max())
    return float(np.sqrt((gaps**2 * props).sum()))


@pytest.mark.parametrize("norm", ["l1", "l2", "max"])
def test_multiclass_matches_hand_binning(norm):
    rng = np.random.RandomState(0)
    logits = rng.randn(500, 7) * 2
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.randint(0, 7, 500)
    m = CalibrationError(task="multiclass", num_classes=7, norm=norm)
    m.update(probs, labels)
    np.testing.assert_allclose(m.compute(),
                               _ece_by_hand(probs, labels, norm=norm),
                               rtol=1e-12)


def test_perfect_onehot_is_zero_when_correct():
    labels = np.arange(10) % 3
    probs = np.eye(3)[labels]
    m = CalibrationError(task="multiclass", num_classes=3)
    m.update(probs, labels)
    assert m.compute() == pytest.approx(0.0)
    # and exactly 1.0 when confidently wrong
    m2 = CalibrationError(task="multiclass", num_classes=3)
    m2.update(probs, (labels + 1) % 3)
    assert m2.compute() == pytest.approx(1.0)


def test_binary_confidence_folding():
    """binary conf = max(p, 1-p); hit = (p >= .5) == label."""
    p = np.array([0.9, 0.1, 0.8, 0.3])
    labels = np.array([1, 0, 0, 1])
    m = CalibrationError(task="binary", n_bins=1)
    m.update(p, labels)
    conf = np.maximum(p, 1 - p)          # .9 .9 .8 .7
    hit = np.array([1, 1, 0, 0])
    assert m.compute() == pytest.approx(abs(hit.mean() - conf.mean()))


def test_rejects_bad_args():
    with pytest.raises(ValueError, match="norm"):
        CalibrationError(task="multiclass", num_classes=3, norm="l3")
    with pytest.raises(ValueError, match="n_bins"):
        CalibrationError(task="multiclass", num_classes=3, n_bins=0)
    m = CalibrationError(task="multilabel", num_labels=3)
    m.update(np.zeros((2, 3)), np.zeros((2, 3)))
    with pytest.raises(ValueError, match="multilabel"):
        m.compute()


def test_forward_call_semantics():
    m = CalibrationError(task="multiclass", num_classes=3, n_bins=5,
                         norm="max")
    probs = np.eye(3)[[0, 1, 2]]
    val = m(probs, np.array([0, 1, 0]))
    fresh = CalibrationError(task="multiclass", num_classes=3, n_bins=5,
                             norm="max")
    fresh.update(probs, np.array([0, 1, 0]))
    assert val == fresh.compute()         # batch value
    assert m.compute() == val             # and state accumulated


def test_uq_predictions_emit_edl_probs():
    """model.log_calibration makes the UQ task emit alpha/S probabilities."""
    cfg = loads("""
model:
  type: AVMnistMixerMultiLossUQ
  dropout: 0.0
  log_calibration: true
  modalities:
    classification: {num_classes: 10, classifier: StandardClassifier,
                     input_shape: [16, 8, 16]}
    image: {block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
            image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}
    audio: {block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
            image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}
    multimodal: {block_type: FusionMixer, fusion_function: ConcatFusion,
                 hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}
train: {optimizer: {lr: 1e-3}}
""")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 10), jnp.float32)
    outputs = {"logits": logits, "branch_logits": (logits * 0.5, logits * 2)}
    out = task.predictions(outputs, {"label": jnp.zeros(4, jnp.int32)})
    probs = np.asarray(out["probs"])
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-6)
    alpha = np.maximum(np.asarray(logits), 0) + 1
    np.testing.assert_allclose(probs, alpha / alpha.sum(1, keepdims=True),
                               rtol=1e-6)
    assert "ece" in task.setup_scores()[1]


CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 1
  compiled_epochs: true
  optimizer: {{lr: 1e-3}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 8, synthetic: true,
            synthetic_sizes: [16, 8, 8]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  log_calibration: true
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


def test_flagship_logs_ece_e2e(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="ece", full_cfg=cfg)
    trainer.fit(task, dm)
    test_metrics = trainer.test(task, dm)
    assert "test_ece" in test_metrics
    for key in ("val_ece", "train_ece"):
        assert key in trainer.callback_metrics
        assert 0.0 <= float(trainer.callback_metrics[key]) <= 1.0
    assert 0.0 <= float(test_metrics["test_ece"]) <= 1.0
