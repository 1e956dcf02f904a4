"""Lazy per-sample data module: load-on-demand + numpy collation.

For datasets too large (or too file-granular) to preload: a split is an
index list plus a ``load_sample(split, idx) -> dict`` function; batches are
collated by stacking. This replaces torch's forked DataLoader workers with
straightforward in-process loading — adequate for the reference's
image+text workloads on TPU (decode cost is dwarfed by train-step reuse),
and a Grain-backed drop-in can wrap the same ``load_sample``.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from .base import Batch, DataModule

__all__ = ["LazyDataModule"]


class LazyDataModule(DataModule):
    def __init__(self, batch_size: int, shuffle_train: bool = True, seed: int = 0,
                 drop_last: bool = False):
        self.batch_size = int(batch_size)
        self.shuffle_train = shuffle_train
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)
        self.split_sizes: Dict[str, int] = {}

    # -- to implement ------------------------------------------------------
    def load_sample(self, split: str, idx: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    # -- iteration ---------------------------------------------------------
    def _iterate(self, split: str, shuffle: bool) -> Iterator[Batch]:
        n = self.split_sizes[split]
        order = self._rng.permutation(n) if shuffle else np.arange(n)
        bs = self.batch_size
        end = (n // bs) * bs if self.drop_last else n
        for start in range(0, end, bs):
            idxs = order[start : min(start + bs, end)]
            samples = [self.load_sample(split, int(i)) for i in idxs]
            yield {
                k: np.stack([np.asarray(s[k]) for s in samples])
                for k in samples[0]
            }

    def train_batches(self) -> Iterator[Batch]:
        return self._iterate("train", self.shuffle_train)

    def val_batches(self) -> Iterator[Batch]:
        return self._iterate("dev", False)

    def test_batches(self) -> Iterator[Batch]:
        return self._iterate("test", False)
