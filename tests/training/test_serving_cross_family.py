"""`serving eval` is family-generic: non-AVMNIST artifacts reproduce their
trainer's test metrics end to end (round-2 review gap — the deployed-
accuracy loop had only ever been closed on the AV-MNIST family).

Reference behavior being matched: `run.py -m test` semantics
(`/root/reference/run.py:82-83`) — here computed from the exported
artifact's own outputs instead of an in-process forward."""

import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.datasets.surrogate import generate
from m2mixer_tpu.models import get_model
from m2mixer_tpu.serving import evaluate_serving, export_serving, load_serving
from m2mixer_tpu.training import Trainer

MIMIC_CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 3
  monitor: val_loss
  monitor_mode: min
dataset:
  type: MIMICDataModule
  params: {{data_dir: {tmp}/data, batch_size: 16, task: -1, num_workers: 0}}
model:
  type: MimicMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 6, classifier: StandardClassifier,
                      input_shape: [16, 25, 16]}}
    static: {{block_type: MLP, input_dim: 5, hidden_dim: 16, num_blocks: 2,
              output_dim: 16}}
    time: {{block_type: MLPMixerNoPatching, embedding_dim: 12, proj_dim: 16,
            hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1,
            num_patch: 24}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""

MMHS_CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 4
  monitor: val_loss
  monitor_mode: min
dataset:
  type: MMHS150DataModule
  params:
    data_dir: {tmp}/data
    batch_size: 8
    max_seq_len: 8
    num_workers: 0
    projection: {{feature_size: 32, num_hashes: 64, window_size: 1}}
    vocab:
      tokenizer_type: wordpiece
      tokenizer: {{vocab: {tmp}/data/vocab.txt, lowercase: true,
                   strip_accents: false, clean_text: false}}
      vocab_path: {tmp}/data/vocab.npy
model:
  type: MMHS150MultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 1, classifier: StandardClassifier,
                      input_shape: [16, 32, 16]}}
    image: {{block_type: MLPMixer, in_channels: 3, hidden_dim: 16, patch_size: 64,
             image_size: [256, 256], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    text: {{block_type: PNLPMixer, max_seq_len: 8, mlp_hidden_dim: 16,
            bottleneck_window_size: 1, bottleneck_features_size: 32,
            hidden_dim: 16, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""


def _fit_and_test(cfg):
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="xfam", use_wandb=False, full_cfg=cfg)
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")  # params now = best ckpt
    return task, dm, trainer, logs


def _sample_batch(dm):
    return next(iter(dm.test_batches()))


def test_serving_eval_mimic_matches_trainer(tmp_path):
    """MIMIC (pickle family, static+time tuple batch): the exported
    artifact reproduces the trainer's test metric dict exactly."""
    generate("mimic", str(tmp_path / "data"), n=240)
    cfg = loads(MIMIC_CFG.format(tmp=tmp_path))
    task, dm, trainer, logs = _fit_and_test(cfg)

    d = export_serving(task, trainer.params, _sample_batch(dm),
                       str(tmp_path / "art"), fmt="stablehlo", buckets=(16,))
    art_logs = evaluate_serving(load_serving(d), task, dm, split="test")
    for key in ("test_f1_micro", "test_acc"):
        assert key in logs and key in art_logs
        assert art_logs[key] == pytest.approx(logs[key], abs=1e-6), key
    assert art_logs["test_samples"] == dm.split_size("test")


def test_serving_eval_mmhs_matches_trainer(tmp_path):
    """MMHS150K (3-modal per-file family with use_features flags): artifact
    test metrics == trainer test metrics, unquantized exactly and int8-PTQ
    within quantization tolerance."""
    generate("mmhs150", str(tmp_path / "data"), n=80)
    cfg = loads(MMHS_CFG.format(tmp=tmp_path))
    task, dm, trainer, logs = _fit_and_test(cfg)

    batch = _sample_batch(dm)
    d = export_serving(task, trainer.params, batch, str(tmp_path / "art"),
                       fmt="stablehlo", buckets=(8,))
    art_logs = evaluate_serving(load_serving(d), task, dm, split="test")
    for key in ("test_f1", "test_accuracy", "test_auc"):
        assert key in logs and key in art_logs
        assert art_logs[key] == pytest.approx(logs[key], abs=1e-6), key

    dq = export_serving(task, trainer.params, batch, str(tmp_path / "art_q"),
                        fmt="stablehlo", buckets=(8,), quantize="int8")
    q_logs = evaluate_serving(load_serving(dq), task, dm, split="test")
    # int8 PTQ: small logit error; threshold metrics stay within tolerance
    assert q_logs["test_accuracy"] == pytest.approx(logs["test_accuracy"],
                                                    abs=0.1)
    assert np.isfinite(q_logs["test_f1"])


# ---------------------------------------------------------------------------
# The remaining 5 families (VERDICT r3 #5): shipped configs pointed at their
# surrogates, model dims shrunk for CI; metric keys per family follow
# SURVEY §6 (multioff `models/multioff.py:182-196`, memotion
# `memotion.py:187-192`, mmimdb `mmimdb.py:184-192`; pnlp/mosi are
# framework-native tasks with acc/f1m)
# ---------------------------------------------------------------------------

_FAMILY_CASES = {
    "mmimdb_ext": ("cfg/mmimdb/mmimdb_3loss.yml", ("test_f1w", "test_f1m")),
    "multioff": ("cfg/multioff/multioff_3loss.yml", ("test_f1", "test_accuracy")),
    "memotion": ("cfg/memotion/memotion_3loss.yml", ("test_f1m",)),
    "pnlp": ("cfg/pnlp/imdb.yml", ("test_acc",)),
    "mosi": ("cfg/mosi/mosi_m2-mixer.yml", ("test_acc", "test_f1m")),
}


def _shrink_model(cfg, family):
    """Tiny geometry, same topology: every structural knob the shipped
    config sets survives; only widths/depths shrink."""
    m = cfg.model
    if family == "pnlp":  # flat schema (bottleneck/mixer/seq_cls)
        p = cfg.dataset.params
        p.proj_cfg.feature_size = 64
        p.train_cfg.max_seq_len = 8
        p.train_cfg.train_batch_size = 8
        p.train_cfg.test_batch_size = 8
        m.bottleneck.feature_size = 64
        m.bottleneck.hidden_dim = 16
        m.mixer.bottleneck_features_size = 64
        m.mixer.hidden_dim = 16
        m.mixer.max_seq_len = 8
        m.mixer.mlp_hidden_dim = 16
        m.mixer.num_mixers = 1
        m.seq_cls.hidden_dim = 16
        m.seq_cls.proj_dim = 16
        return
    p = cfg.dataset.params
    for key in m.modalities:
        mc = m.modalities[key]
        if key == "classification":
            continue
        for field, v in (("hidden_dim", 16), ("channel_dim", 32),
                         ("token_dim", 8), ("mlp_hidden_dim", 16),
                         ("num_mixers", 1), ("proj_dim", 16)):
            if field in mc:
                mc[field] = v
        if mc.get("block_type") == "MLPMixer" and tuple(mc.image_size) == (512, 512):
            mc.patch_size = 128  # 16 tokens instead of 64+
        if mc.get("block_type") == "PNLPMixer":
            mc.bottleneck_features_size = 64
            mc.max_seq_len = 8
        if mc.get("block_type") == "MLPMixerNoPatching" and "embedding_dim" in mc \
                and family == "mosi" and key == "text":
            mc.embedding_dim = 64  # = proj feature_size (window 0)
    m.modalities.classification.input_shape = [8, 8, 16]
    if "projection" in p:
        p.projection.feature_size = 64
    if "proj_cfg" in p:
        p.proj_cfg.feature_size = 64
    if "max_seq_len" in p:
        p.max_seq_len = 8


@pytest.mark.parametrize("family", sorted(_FAMILY_CASES))
def test_serving_eval_matches_trainer_all_families(tmp_path, family):
    """Every remaining family's exported artifact reproduces the trainer's
    test metrics exactly — the `run.py -m test` semantics
    (`/root/reference/run.py:82-83`) computed from the artifact."""
    import os

    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.certify import (SURROGATE_N, _point_at_surrogate,
                                     ensure_surrogate)

    cfg_rel, keys = _FAMILY_CASES[family]
    sdir = ensure_surrogate(family, str(tmp_path))
    cfg = cfg_lib.load(cfg_rel)
    _point_at_surrogate(cfg, family, sdir, batch=8)
    _shrink_model(cfg, family)
    cfg.train.epochs = 2
    cfg.train.tensorboard_path = str(tmp_path / "logs")
    cfg.train.log_interval_steps = 5
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.model.dropout = 0.0

    task, dm, trainer, logs = _fit_and_test(cfg)
    d = export_serving(task, trainer.params, _sample_batch(dm),
                       str(tmp_path / "art"), fmt="stablehlo", buckets=(8,))
    art_logs = evaluate_serving(load_serving(d), task, dm, split="test")
    for key in keys:
        assert key in logs and key in art_logs, (key, sorted(logs))
        assert art_logs[key] == pytest.approx(logs[key], abs=1e-6), key
    assert art_logs["test_samples"] == dm.split_size("test")


class _FakeServed:
    """Minimal ServedModel stand-in: identity logits, no ensemble meta."""

    meta = {}

    def predict(self, features):
        import numpy as _np

        n = len(next(iter(features.values())))
        return {"logits": _np.zeros((n, 3), _np.float32)}


class _FakeDM:
    batch_size = 4

    def setup(self, stage=None):
        pass

    train_batches = val_batches = property(lambda self: self.test_batches)

    def test_batches(self):
        import numpy as _np

        yield {"x": _np.zeros((4, 3), _np.float32),
               "label": _np.zeros((4,), _np.int32)}

    def split_size(self, stage):
        return 4


def test_evaluate_serving_refuses_unknown_prediction_semantics():
    """ADVICE r4: a task with neither predictions() nor
    plain_multiclass=True must fail LOUDLY instead of evaluating with
    argmax semantics that may be wrong (sigmoid thresholds, regression)."""

    class _Opaque:
        # no predictions(), no plain_multiclass
        def setup_scores(self):
            return [None, None, {}]

    with pytest.raises(TypeError, match="plain_multiclass"):
        evaluate_serving(_FakeServed(), _Opaque(), _FakeDM(), split="test")

    class _Declared(_Opaque):
        plain_multiclass = True

    logs = evaluate_serving(_FakeServed(), _Declared(), _FakeDM(),
                            split="test")
    assert logs["test_samples"] == 4.0


def test_vgg_baseline_predictions_adapter_matches_step_semantics():
    """The MMIDB_GMLP baselines' serving-eval adapter (review fix): same
    sigmoid>0.5 multilabel preds their step() computes."""
    import jax.numpy as jnp

    from m2mixer_tpu.config import DictConfig
    from m2mixer_tpu.models.mmimdb import MMIDB_GMLP_ext

    cfg = DictConfig({"modalities": {"image": {
        "block_type": "VisiongMLP", "image_size": [32, 32], "in_channels": 3,
        "patch_size": 16, "d_model": 16, "d_ffn": 32, "n_blocks": 1,
        "prob_0_L": [1.0, 1.0]}}})
    task = MMIDB_GMLP_ext(cfg, DictConfig({"lr": 1e-3}))
    logits = jnp.asarray(np.random.RandomState(0).randn(4, 23), jnp.float32)
    labels = jnp.zeros((4, 23), jnp.int32)
    out = task.predictions({"logits": logits}, {"label": labels})
    want = (np.asarray(1 / (1 + np.exp(-np.asarray(logits)))) > 0.5).astype(int)
    np.testing.assert_array_equal(np.asarray(out["preds"]), want)
    assert out["probs"].shape == (4, 23)


MIMIC_GRU_CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 3
  monitor: val_loss
  monitor_mode: min
dataset:
  type: MIMICDataModule
  params: {{data_dir: {tmp}/data, batch_size: 16, task: -1, num_workers: 0}}
model:
  type: MimicRecurrent
  dropout: 0.0
  modalities:
    classification: {{num_classes: 6, classifier: StandardClassifier,
                      input_shape: [16, 1024, 12]}}
    static: {{block_type: MLP, input_dim: 5, hidden_dim: 8, num_blocks: 1,
              output_dim: 10}}
    time: {{block_type: GRU, input_dim: 12, hidden_dim: 6, flatten: true,
            batch_first: true}}
    multimodal: {{block_type: MLP, fusion_function: ConcatFusion,
                  input_dim: 154, hidden_dim: 12, num_blocks: 1}}
"""


def test_serving_eval_mimic_gru_matches_trainer(tmp_path):
    """MimicRecurrent (GRU time encoder): the lax.scan recurrence exports
    through the AOT serving path and the artifact reproduces the trainer's
    test metrics — the one encoder family previously never driven through
    serving."""
    generate("mimic", str(tmp_path / "data"), n=240)
    cfg = loads(MIMIC_GRU_CFG.format(tmp=tmp_path))
    task, dm, trainer, logs = _fit_and_test(cfg)

    d = export_serving(task, trainer.params, _sample_batch(dm),
                       str(tmp_path / "art"), fmt="stablehlo", buckets=(16,))
    art_logs = evaluate_serving(load_serving(d), task, dm, split="test")
    for key in ("test_f1_micro", "test_acc"):
        assert key in logs and key in art_logs
        assert art_logs[key] == pytest.approx(logs[key], abs=1e-6), key
    assert art_logs["test_samples"] == dm.split_size("test")
