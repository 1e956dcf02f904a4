"""MOSI task model end-to-end: the trainable sentiment model the reference
never shipped (its MOSI support stops at the data stack), trained on the
tiny synthetic fold fixture through the full Trainer."""

import pickle

import numpy as np
import pytest

from m2mixer_tpu.config import DictConfig, loads
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer


@pytest.fixture(scope="module")
def vocab(tmp_path_factory):
    from m2mixer_tpu.utils.projection import build_vocab_cache

    tmp = tmp_path_factory.mktemp("mosi_vocab")
    vocab_file = tmp / "vocab.txt"
    vocab_file.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "the", "movie", "was", "great", "bad", "none"]))
    cache = tmp / "vocab.npy"
    build_vocab_cache(str(vocab_file), str(cache))
    return {"tokenizer_type": "wordpiece",
            "tokenizer": {"vocab": str(vocab_file), "lowercase": True,
                          "strip_accents": True, "clean_text": True},
            "vocab_path": str(cache)}


def _mosi_pickle(tmp_path):
    rng = np.random.RandomState(0)

    def fold(n):
        labels = rng.randn(n, 1).astype(np.float32)
        vision = rng.rand(n, 60, 35).astype(np.float32)
        audio = rng.rand(n, 60, 74).astype(np.float32)
        # plant a learnable signal: positive samples get a vision offset
        vision[labels[:, 0] > 0] += 2.0
        text = ["a great movie" if l > 0 else "a bad movie" for l in labels[:, 0]]
        return {"vision": vision, "audio": audio, "text": text, "labels": labels}

    data = {"train": fold(48), "valid": fold(16), "test": fold(16)}
    path = tmp_path / "mosi_raw.pkl"
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return str(path)


CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 3
  optimizer: {{lr: 2e-3, weight_decay: 0.0, scheduler_patience: 5}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
model:
  type: MosiMixerMultiLoss
  dropout: 0.0
  fusion_loss_weight: 0.4
  modalities:
    classification: {{classifier: StandardClassifier, input_shape: [24, 16],
                      num_classes: 2}}
    vision: {{block_type: MLPMixerNoPatching, embedding_dim: 35, proj_dim: 16,
              hidden_dim: 16, num_patch: 50, num_mixers: 1, token_dim: 8,
              channel_dim: 32}}
    audio: {{block_type: MLPMixerNoPatching, embedding_dim: 70, proj_dim: 16,
             hidden_dim: 16, num_patch: 50, num_mixers: 1, token_dim: 8,
             channel_dim: 32}}
    text: {{block_type: MLPMixerNoPatching, embedding_dim: 96, proj_dim: 16,
            hidden_dim: 16, num_patch: 8, num_mixers: 1, token_dim: 8,
            channel_dim: 32}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, num_mixers: 1, token_dim: 8, channel_dim: 32}}
"""


def test_regression_metrics_match_numpy():
    from m2mixer_tpu.training import metrics as tm

    rng = np.random.RandomState(0)
    p, t = rng.randn(100), rng.randn(100)
    mae, mse, rmse = (tm.MeanAbsoluteError(), tm.MeanSquaredError(),
                      tm.MeanSquaredError(squared=False))
    corr, acc2 = tm.PearsonCorrCoef(), tm.SignAccuracy()
    for m in (mae, mse, rmse, corr, acc2):
        m.update(p[:60], t[:60])
        m.update(p[60:], t[60:])
    assert np.isclose(mae.compute(), np.abs(p - t).mean())
    assert np.isclose(mse.compute(), ((p - t) ** 2).mean())
    assert np.isclose(rmse.compute(), np.sqrt(((p - t) ** 2).mean()))
    assert np.isclose(corr.compute(), np.corrcoef(p, t)[0, 1])
    nz = t != 0
    assert np.isclose(acc2.compute(), ((p[nz] > 0) == (t[nz] > 0)).mean())
    # forward (__call__) must honor constructor config (RMSE stays RMSE)
    assert np.isclose(tm.MeanSquaredError(squared=False)(p, t),
                      np.sqrt(((p - t) ** 2).mean()))


def test_mosi_regression_trains(tmp_path, vocab):
    """model.task=regression: L1 heads on raw scores, MAE/corr/Acc-2
    scoring (the standard CMU-MOSI regression protocol)."""
    from m2mixer_tpu.datasets.mosi import CMUMosiDataModule

    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.task = "regression"
    cfg.model.modalities.classification.num_classes = 1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = CMUMosiDataModule(
        data_path=_mosi_pickle(tmp_path), batch_size=8, num_workers=0,
        vocab_cfg=DictConfig(vocab),
        train_cfg=DictConfig({"max_seq_len": 8, "task": "regression",
                              "z_norm": False}),
        proj_cfg=DictConfig({"num_hashes": 64, "feature_size": 32,
                             "window_size": 1}),
    )
    trainer = Trainer(cfg.train, name="mosi_reg", full_cfg=cfg)
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_mae"])
    assert logs["test_acc2"] >= 0.7  # sign of the planted vision signal


def test_mosi_task_trains(tmp_path, vocab):
    from m2mixer_tpu.datasets.mosi import CMUMosiDataModule

    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = CMUMosiDataModule(
        data_path=_mosi_pickle(tmp_path), batch_size=8, num_workers=0,
        vocab_cfg=DictConfig(vocab),
        train_cfg=DictConfig({"max_seq_len": 8, "task": "classification",
                              "z_norm": False}),
        proj_cfg=DictConfig({"num_hashes": 64, "feature_size": 32,
                             "window_size": 1}),
    )
    trainer = Trainer(cfg.train, name="mosi", full_cfg=cfg)
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_loss"])
    # planted vision signal: must beat chance comfortably on 16 samples
    assert logs["test_acc"] >= 0.75
