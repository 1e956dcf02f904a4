"""Unified offline surrogates (m2mixer_tpu/datasets/surrogate.py): every
shipped dataset family generates a class-structured stand-in its OWN
datamodule loads — the contract that every cfg/ config is drivable end to
end without external data."""

import os

import numpy as np
import pytest

from m2mixer_tpu.config import DictConfig
from m2mixer_tpu.datasets.surrogate import FAMILIES, generate

PROJ = DictConfig({"num_hashes": 64, "feature_size": 32, "window_size": 1})


def _vocab_cfg(out):
    return DictConfig({
        "tokenizer_type": "wordpiece",
        "tokenizer": {"vocab": os.path.join(out, "vocab.txt"),
                      "lowercase": True, "strip_accents": False,
                      "clean_text": False},
        "vocab_path": os.path.join(out, "vocab.npy"),
    })


def test_unknown_family_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown family"):
        generate("cifar", str(tmp_path))


def test_avmnist(tmp_path):
    from m2mixer_tpu.datasets.avmnist import AVMnistDataModule

    generate("avmnist", str(tmp_path), n=60)
    dm = AVMnistDataModule(str(tmp_path), batch_size=4)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert b["image"].shape == (4, 1, 28, 28)
    assert b["audio"].shape == (4, 1, 112, 112)


def test_mmimdb_ext(tmp_path):
    from m2mixer_tpu.datasets.mmimdb import MMIMDBExtDataModule

    generate("mmimdb_ext", str(tmp_path), n=20)
    dm = MMIMDBExtDataModule(str(tmp_path), batch_size=2)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert b["image"].shape == (2, 3, 160, 256)
    assert b["text"].shape == (2, 1, 160, 256)
    assert b["label"].shape == (2, 23)
    assert set(np.unique(b["label"])) <= {0, 1}


def test_mimic(tmp_path):
    from m2mixer_tpu.datasets.mimic import MIMICDataModule

    generate("mimic", str(tmp_path), n=100)
    dm = MIMICDataModule(str(tmp_path), batch_size=8)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert b["static"].shape == (8, 5) and b["time"].shape == (8, 24, 12)
    assert 0 <= int(b["label"].min()) and int(b["label"].max()) <= 5
    # the planted mean shift survives the loader's z-norm: classes separable
    tr = dm.splits["train"]
    lo = tr["static"][tr["label"] <= 1].mean()
    hi = tr["static"][tr["label"] >= 4].mean()
    assert hi - lo > 0.5
    # task-1 ICD-9 column works too
    dm1 = MIMICDataModule(str(tmp_path), batch_size=8, task=1)
    dm1.setup()
    assert set(np.unique(dm1.splits["train"]["label"])) <= {0, 1}


def test_mmhs150(tmp_path):
    from m2mixer_tpu.datasets.mmhs150 import MMHS150DataModule

    generate("mmhs150", str(tmp_path), n=20)
    dm = MMHS150DataModule(str(tmp_path), batch_size=2,
                           vocab=_vocab_cfg(str(tmp_path)), projection=PROJ,
                           max_seq_len=8)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert b["image"].shape == (2, 3, 256, 256)
    assert b["text"].shape == b["ocr"].shape == (2, 8, 3 * 32)
    assert set(np.unique(b["use_features"])) <= {1.0}


def test_multioff(tmp_path):
    from m2mixer_tpu.datasets.multioff import MultiOFFDataModule

    generate("multioff", str(tmp_path), n=20)
    dm = MultiOFFDataModule(str(tmp_path), batch_size=2,
                            vocab=_vocab_cfg(str(tmp_path)), projection=PROJ,
                            max_seq_len=8)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert b["image"].shape == (2, 3, 512, 512)
    labels = [int(dm.load_sample("train", i)["label"])
              for i in range(dm.split_sizes["train"])]
    assert set(labels) == {0, 1}


def test_memotion(tmp_path):
    from m2mixer_tpu.datasets.memotion import MemotionDataModule

    generate("memotion", str(tmp_path), n=20)
    dm = MemotionDataModule(str(tmp_path), batch_size=2,
                            vocab=_vocab_cfg(str(tmp_path)), projection=PROJ,
                            max_seq_len=8, task_name="humour")
    dm.setup()
    assert sum(dm.split_sizes.values()) == 20
    b = next(iter(dm.train_batches()))
    assert b["image"].shape == (2, 3, 512, 512)


def test_memotion_every_split_holds_all_sentiment_classes(tmp_path):
    """The datamodule computes cat.codes PER SPLIT (a faithful reference
    quirk, `/root/reference/datasets/memotion.py:91-99`), so a split
    missing a class would silently renumber its labels against the train
    split. The generator must stratify: every split of size >= 5 holds all
    five sentiment levels."""
    import numpy as np
    import pandas as pd

    generate("memotion", str(tmp_path), n=60)
    ref = pd.read_csv(tmp_path / "labels.csv").dropna()
    idx = np.load(tmp_path / "shuffled.npy")
    n = len(ref)
    for part in (idx[: int(0.7 * n)], idx[int(0.7 * n): int(0.9 * n)],
                 idx[int(0.9 * n):]):
        assert len(set(ref.iloc[part]["overall_sentiment"])) == 5


def test_pnlp(tmp_path):
    from m2mixer_tpu.datasets.pnlp import PnlpMixerDataModule

    generate("pnlp", str(tmp_path), n=40)
    train_cfg = DictConfig({"dataset_type": "imdb",
                            "dataset_path": str(tmp_path),
                            "labels": ["neg", "pos"], "max_seq_len": 8,
                            "train_batch_size": 4, "test_batch_size": 4,
                            "num_workers": 0})
    dm = PnlpMixerDataModule(vocab_cfg=_vocab_cfg(str(tmp_path)),
                             train_cfg=train_cfg, proj_cfg=PROJ)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert b["text"].shape == (4, 8, 3 * 32)
    assert set(np.unique(b["label"])) <= {0, 1}


def test_mosi(tmp_path):
    from m2mixer_tpu.datasets.mosi import CMUMosiDataModule

    generate("mosi", str(tmp_path), n=30)
    train_cfg = DictConfig({"max_seq_len": 8, "task": "classification",
                            "z_norm": False})
    dm = CMUMosiDataModule(
        data_path=os.path.join(str(tmp_path), "mosi_raw.pkl"), batch_size=2,
        vocab_cfg=_vocab_cfg(str(tmp_path)), train_cfg=train_cfg,
        proj_cfg=PROJ)
    dm.setup()
    b = next(iter(dm.train_batches()))
    assert b["vision"].shape == (2, 50, 35)
    assert b["audio"].shape == (2, 50, 70)
    assert set(np.asarray(b["label"]).tolist()) <= {0, 1}


def test_cli_all_families_listed():
    """The CLI 'all' mode covers exactly the registered generators."""
    assert set(FAMILIES) == {"avmnist", "mmimdb", "mmimdb_ext", "mimic",
                             "mmhs150", "multioff", "memotion", "pnlp",
                             "mosi"}
