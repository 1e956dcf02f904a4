"""Trainer end-to-end over lazy (file-backed) datamodules — exercises the
per-step path with non-Array datasets (text-only and multilabel)."""

import os

import numpy as np
import pytest
from PIL import Image

from m2mixer_tpu.config import DictConfig, loads
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer


@pytest.fixture(scope="module")
def vocab(tmp_path_factory):
    from m2mixer_tpu.utils.projection import build_vocab_cache

    tmp = tmp_path_factory.mktemp("vocab")
    vocab_file = tmp / "vocab.txt"
    vocab_file.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "the", "movie", "was", "great", "bad", "plot"]))
    cache = tmp / "vocab.npy"
    build_vocab_cache(str(vocab_file), str(cache))
    return {
        "tokenizer_type": "wordpiece",
        "tokenizer": {"vocab": str(vocab_file), "lowercase": True,
                      "strip_accents": False, "clean_text": False},
        "vocab_path": str(cache),
    }


def test_pnlp_imdb_trainer_e2e(tmp_path, vocab):
    from m2mixer_tpu.datasets.pnlp import PnlpMixerDataModule

    for split in ("train", "test"):
        for label in ("pos", "neg"):
            d = tmp_path / "data" / split / label
            os.makedirs(d)
            for i in range(4):
                (d / f"{i}.txt").write_text(
                    "the movie was great" if label == "pos" else "the movie was bad")

    cfg = loads(f"""
train:
  tensorboard_path: {tmp_path}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 3e-3, weight_decay: 0.0}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
model:
  type: PnlpMixerSeqClsTask
  bottleneck: {{window_size: 1, feature_size: 32, hidden_dim: 32}}
  mixer: {{max_seq_len: 8, hidden_dim: 32, num_mixers: 1, mlp_hidden_dim: 32,
           bottleneck_window_size: 1, bottleneck_features_size: 32}}
  seq_cls: {{hidden_dim: 32, proj_dim: 16, num_classes: 2}}
""")
    train_cfg = DictConfig({"dataset_type": "imdb", "dataset_path": str(tmp_path / "data"),
                            "labels": ["neg", "pos"], "max_seq_len": 8,
                            "train_batch_size": 4, "test_batch_size": 4,
                            "num_workers": 0})
    dm = PnlpMixerDataModule(vocab_cfg=DictConfig(vocab), train_cfg=train_cfg,
                             proj_cfg=DictConfig({"num_hashes": 64, "feature_size": 32,
                                                  "window_size": 1}))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    trainer = Trainer(cfg.train, name="pnlp", full_cfg=cfg)
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_loss"]) and "test_acc" in logs


def test_mmimdb_trainer_e2e(tmp_path, vocab):
    from m2mixer_tpu.datasets.mmimdb import MMIMDBDataModule

    rng = np.random.RandomState(0)
    for split in ("train", "dev", "test"):
        for sub in ("images", "labels", "text"):
            os.makedirs(tmp_path / "data" / split / sub)
        for i in range(8):
            Image.fromarray(rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)).save(
                tmp_path / "data" / split / "images" / f"image_{i}.jpeg")
            np.save(tmp_path / "data" / split / "labels" / f"label_{i}.npy",
                    rng.randint(0, 2, 23))
            (tmp_path / "data" / split / "text" / f"text_{i}.txt").write_text(
                "a great movie plot")

    cfg = loads(f"""
train:
  tensorboard_path: {tmp_path}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
model:
  type: MMIMDBMixerMultiLoss
  dropout: 0.0
  pos_weight: [1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1]
  modalities:
    classification: {{num_classes: 23, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 3, hidden_dim: 16, patch_size: 16,
             image_size: [32, 32], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    text: {{block_type: PNLPMixer, max_seq_len: 8, mlp_hidden_dim: 16,
            bottleneck_window_size: 1, bottleneck_features_size: 32,
            hidden_dim: 16, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
""")
    dm = MMIMDBDataModule(str(tmp_path / "data"), batch_size=4,
                          vocab=DictConfig(vocab),
                          projection=DictConfig({"num_hashes": 64, "feature_size": 32,
                                                 "window_size": 1}),
                          max_seq_len=8)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    trainer = Trainer(cfg.train, name="mmimdb", full_cfg=cfg)
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    assert "test_f1w" in logs and "test_f1m" in logs
    assert np.isfinite(logs["test_loss"])
