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
                 drop_last: bool = False, num_workers: int = 0):
        self.batch_size = int(batch_size)
        self.shuffle_train = shuffle_train
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = int(num_workers or 0)
        self._rng = np.random.RandomState(seed)
        self._epoch = 0
        self.split_sizes: Dict[str, int] = {}

    def split_size(self, stage: str) -> int:
        # same accessor the in-memory base exposes (base.py:62-64), so
        # family-generic tooling (serving eval, certify) works on both
        return int(self.split_sizes[stage])

    # -- to implement ------------------------------------------------------
    def load_sample(self, split: str, idx: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    # -- iteration ---------------------------------------------------------
    def _iterate(self, split: str, shuffle: bool) -> Iterator[Batch]:
        if self.num_workers > 0:
            it = self._iterate_grain(split, shuffle)
            if it is not None:
                return it
        return self._iterate_serial(split, shuffle)

    def _iterate_serial(self, split: str, shuffle: bool) -> Iterator[Batch]:
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

    def _iterate_grain(self, split: str, shuffle: bool):
        """Grain-backed loading: ``num_workers`` parallel processes decode
        samples and prefetch batches — the TPU-native replacement for torch
        DataLoader workers. Falls back to serial loading if grain is absent."""
        try:
            import grain.python as grain
        except ImportError:
            return None

        module, n = self, self.split_sizes[split]

        class _Source:
            def __len__(self):
                return n

            def __getitem__(self, idx):
                return module.load_sample(split, int(idx))

        self._epoch += 1
        sampler = grain.IndexSampler(
            num_records=n,
            shard_options=grain.NoSharding(),
            shuffle=shuffle,
            num_epochs=1,
            seed=self.seed + self._epoch,
        )
        loader = grain.DataLoader(
            data_source=_Source(),
            sampler=sampler,
            operations=[grain.Batch(self.batch_size, drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
        )
        return iter(loader)

    def train_batches(self) -> Iterator[Batch]:
        return self._iterate("train", self.shuffle_train)

    def val_batches(self) -> Iterator[Batch]:
        return self._iterate("dev", False)

    def test_batches(self) -> Iterator[Batch]:
        return self._iterate("test", False)
