"""CMU-MOSI affect data stack (vision + COVAREP audio + text, scaffolding).

Re-expresses ``/root/reference/datasets/mosi_dataset.py`` (plus the
``mosi_data.py`` / ``mosi_preprocessing.py`` offline steps, see
``prepare_mosi_pickle``): entries with empty text or all-zero vision/audio
are dropped, per-sample sequences are trimmed at the first nonzero step,
COVAREP audio is truncated to 70 dims, sequences are clipped/padded to 50
steps, and labels binarize at 0 for classification. The reference's bug of
building test/valid from the TRAIN fold (`mosi_dataset.py:125-138`) is NOT
replicated — the real folds are used; set ``replicate_train_only_folds=True``
to reproduce the reference behavior exactly.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np

from .lazy import LazyDataModule
from .text_pipeline import TextFeaturizer

__all__ = ["CMUMosiDataModule", "drop_entry", "z_norm", "download_mosi"]


def drop_entry(dataset: dict) -> dict:
    """Drop samples with empty text or all-zero vision/audio
    (parity: `mosi_dataset.py:22-39`)."""
    drop = set()
    for ind, k in enumerate(dataset["text"]):
        if k == "" or k is None:
            drop.add(ind)
    for key in ("vision", "audio"):
        for ind, k in enumerate(dataset[key]):
            if np.asarray(k).sum() == 0:
                drop.add(ind)
    keep = [i for i in range(len(dataset["text"])) if i not in drop]
    return {m: np.asarray(dataset[m])[keep] for m in dataset}


def z_norm(dataset: dict, max_seq_len: int = 50) -> dict:
    """Per-sample, per-feature z-normalization over time
    (parity: `mosi_dataset.py:42-60`)."""
    out = {}
    for key in ("vision", "audio", "text"):
        arr = np.asarray(dataset[key])[:, :max_seq_len, :].astype(np.float64)
        mean = arr.mean(axis=1, keepdims=True)
        std = arr.std(axis=1, keepdims=True)
        out[key] = np.nan_to_num((arr - mean) / std)
    out["labels"] = dataset["labels"]
    return out


class CMUMosiDataModule(LazyDataModule):
    def __init__(self, data_path: str, batch_size: int, num_workers: int = 0,
                 vocab_cfg=None, train_cfg=None, proj_cfg=None,
                 replicate_train_only_folds: bool = False, **kwargs):
        super().__init__(batch_size=batch_size, shuffle_train=True, num_workers=num_workers)
        self.data_path = data_path
        self.train_cfg = train_cfg
        self.replicate_train_only_folds = replicate_train_only_folds
        self.featurizer = TextFeaturizer(vocab_cfg, proj_cfg, int(train_cfg.max_seq_len))
        self.folds: dict = {}

    def setup(self, stage: Optional[str] = None) -> None:
        if self.folds:
            return
        with open(self.data_path, "rb") as f:
            alldata = pickle.load(f)
        for fold in ("train", "valid", "test"):
            alldata[fold] = drop_entry(alldata[fold])
            alldata[fold]["audio"][alldata[fold]["audio"] == -np.inf] = 0.0
        if self.replicate_train_only_folds:
            self.folds = {"train": alldata["train"], "dev": alldata["train"],
                          "test": alldata["train"]}
        else:
            self.folds = {"train": alldata["train"], "dev": alldata["valid"],
                          "test": alldata["test"]}
        for split, fold in self.folds.items():
            self.split_sizes[split] = len(fold["text"])

    def load_sample(self, split: str, idx: int):
        fold = self.folds[split]
        vision = np.asarray(fold["vision"][idx], np.float32)
        audio = np.asarray(fold["audio"][idx], np.float32)
        text = fold["text"][idx]
        features = self.featurizer(text).astype(np.float32)

        # trim leading all-zero steps (`mosi_dataset.py:209-212`)
        def trim(x):
            nz = np.nonzero(x)[0]
            return x[nz[0] :] if len(nz) else x

        vision, audio = trim(vision), trim(audio)
        if self.train_cfg.get("z_norm", False):
            for arr in (vision, audio):
                mean = arr.mean(axis=0, keepdims=True)
                std = arr.std(axis=0, keepdims=True)
                arr[:] = np.nan_to_num((arr - mean) / std)
        audio = audio[..., :70]  # COVAREP truncation (`mosi_dataset.py:242`)

        max_pad_num = 50

        def clip_pad(x):
            x = x[:max_pad_num]
            return np.pad(x, ((0, max_pad_num - x.shape[0]), (0, 0)))

        raw_label = np.asarray(fold["labels"][idx]).reshape(-1)[0]
        if self.train_cfg.get("task") == "classification":
            label = np.int32(1 if raw_label > 0 else 0)
        else:
            label = np.float32(raw_label)
        return {
            "vision": clip_pad(vision),
            "audio": clip_pad(audio),
            "text": features,
            "label": label,
        }


def download_mosi(data_path: str = "../data/mosi_raw/"):
    """CMU-SDK download + word-level alignment, the offline step the
    reference ships as ``/root/reference/datasets/mosi_data.py:11-57``:
    fetch the CMU-MOSI highlevel/raw/labels computational sequences, align
    Facet-4.1 visual + COVAREP acoustic features to timestamped words with
    mean-collapse, then add and align the opinion labels (no collapse, so
    temporal sequences are preserved). Returns the aligned ``mmdataset``.

    Requires the optional CMU-MultimodalSDK (``pip install mmsdk`` per
    https://github.com/A2Zadeh/CMU-MultimodalSDK); gated import so the rest
    of the framework never depends on it.
    """
    import os

    try:
        from mmsdk import mmdatasdk as md
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "download_mosi requires the CMU-MultimodalSDK (mmsdk). Install it "
            "per https://github.com/A2Zadeh/CMU-MultimodalSDK, or start from "
            "an already-aligned export via prepare_mosi_pickle()."
        ) from e

    for seqs in (md.cmu_mosi.highlevel, md.cmu_mosi.raw, md.cmu_mosi.labels):
        try:
            md.mmdataset(seqs, data_path)
        except RuntimeError:
            pass  # already downloaded

    visual_field = "CMU_MOSI_Visual_Facet_41"
    acoustic_field = "CMU_MOSI_COVAREP"
    text_field = "CMU_MOSI_TimestampedWords"
    recipe = {
        feat: os.path.join(data_path, feat) + ".csd"
        for feat in (text_field, visual_field, acoustic_field)
    }
    dataset = md.mmdataset(recipe)

    def avg(intervals, features):
        try:
            return np.average(features, axis=0)
        except Exception:
            return features

    dataset.align(text_field, collapse_functions=[avg])
    label_field = "CMU_MOSI_Opinion_Labels"
    dataset.add_computational_sequences(
        {label_field: os.path.join(data_path, label_field + ".csd")}, destination=None
    )
    dataset.align(label_field)
    return dataset


def prepare_mosi_pickle(sdk_aligned_h5: str, out_pickle: str) -> None:
    """Offline prep analog of the reference's CMU-SDK scripts
    (`mosi_data.py` / `mosi_preprocessing.py`): converts word-aligned h5
    folds into the ``mosi_raw.pkl`` dict-of-folds layout this module loads.
    Requires the CMU-MultimodalSDK export on disk."""
    import h5py

    folds = {}
    with h5py.File(sdk_aligned_h5, "r") as f:
        for fold in ("train", "valid", "test"):
            grp = f[fold]
            folds[fold] = {
                "vision": np.asarray(grp["vision"]),
                "audio": np.asarray(grp["audio"]),
                "text": [t.decode() if isinstance(t, bytes) else str(t) for t in grp["text"]],
                "labels": np.asarray(grp["labels"]),
            }
    with open(out_pickle, "wb") as f:
        pickle.dump(folds, f)


if __name__ == "__main__":
    import sys

    download_mosi(sys.argv[1] if len(sys.argv) > 1 else "../data/mosi_raw/")
