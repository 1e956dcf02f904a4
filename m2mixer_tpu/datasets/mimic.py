"""MIMIC-III data stack (5-d static tabular + 24x12 time series).

Re-expresses ``/root/reference/datasets/mimic.py``: loads the ``im.pk``
pickle, zeroes inf/nan, applies global z-normalization, derives the 6-class
mortality label from admission columns for ``task == -1`` (or an ICD-9
column otherwise), shuffles with a FIXED seed 10, and splits val = first
10%, test = 10-20%, train = rest. The reference yields positional tuples
``(static, time, label)``; here batches are dicts with keys
``static``/``time``/``label`` (what the task models consume).
"""

from __future__ import annotations

import os
import pickle
import random
from typing import Optional

import numpy as np

from .base import ArrayDataModule

__all__ = ["MIMICDataModule"]


class MIMICDataModule(ArrayDataModule):
    def __init__(self, data_dir: str, task: int = -1, batch_size: int = 32,
                 num_workers: int = 1, train_shuffle: bool = True,
                 filename: str = "im.pk", **kwargs):
        super().__init__(batch_size=batch_size, shuffle_train=train_shuffle)
        self.data_dir = data_dir
        self.task = task
        self.filename = filename

    def setup(self, stage: Optional[str] = None) -> None:
        if self.splits:
            return
        with open(os.path.join(self.data_dir, self.filename), "rb") as f:
            datafile = pickle.load(f)
        X_t = np.asarray(datafile["ep_tdata"], np.float64)
        X_s = np.asarray(datafile["adm_features_all"], np.float64)
        X_t[~np.isfinite(X_t)] = 0
        X_s[~np.isfinite(X_s)] = 0

        # global z-norm (`mimic.py:46-54`)
        X_s = (X_s - X_s.mean(axis=0)) / X_s.std(axis=0)
        X_t = (X_t - X_t.mean(axis=(0, 1))) / X_t.std(axis=(0, 1))

        if self.task < 0:
            admlbl = np.asarray(datafile["adm_labels_all"])
            # first positive admission column wins (precedence 1>2>3>4>5),
            # else class 0 (`mimic.py:56-72`)
            y = np.select(
                [admlbl[:, 1] > 0, admlbl[:, 2] > 0, admlbl[:, 3] > 0,
                 admlbl[:, 4] > 0, admlbl[:, 5] > 0],
                [1, 2, 3, 4, 5], default=0,
            )
        else:
            y = np.asarray(datafile["y_icd9"])[:, self.task].astype(np.int64)

        n = len(y)
        # fixed shuffle, parity with `random.seed(10); random.shuffle` over
        # the sample list (`mimic.py:79-80`)
        order = list(range(n))
        random.seed(10)
        random.shuffle(order)
        order = np.asarray(order)
        X_s, X_t, y = X_s[order], X_t[order], y[order]

        arrays = {
            "static": X_s.astype(np.float32),
            "time": X_t.astype(np.float32),
            "label": y.astype(np.int32),
        }
        self.splits["val"] = {k: v[: n // 10] for k, v in arrays.items()}
        self.splits["test"] = {k: v[n // 10 : n // 5] for k, v in arrays.items()}
        self.splits["train"] = {k: v[n // 5 :] for k, v in arrays.items()}

    @classmethod
    def synthetic(cls, n: int = 256, batch_size: int = 32, seed: int = 0):
        """MIMIC-shaped random data for tests/benchmarks."""
        rng = np.random.RandomState(seed)
        dm = cls(data_dir="unused", batch_size=batch_size)
        arrays = {
            "static": rng.randn(n, 5).astype(np.float32),
            "time": rng.randn(n, 24, 12).astype(np.float32),
            "label": rng.randint(0, 6, (n,)).astype(np.int32),
        }
        dm.splits["val"] = {k: v[: n // 10] for k, v in arrays.items()}
        dm.splits["test"] = {k: v[n // 10 : n // 5] for k, v in arrays.items()}
        dm.splits["train"] = {k: v[n // 5 :] for k, v in arrays.items()}
        return dm
