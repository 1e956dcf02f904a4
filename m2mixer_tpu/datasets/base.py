"""Data-module protocol + array-backed base implementation.

Replaces Lightning DataModules + forked DataLoader workers with host-side
vectorized numpy batching (the TPU-native input shape: the accelerator wants
big contiguous ndarray slices, not per-sample Python objects). Datasets too
big or too preprocessing-heavy for memory implement ``train_batches`` etc.
directly (optionally via Grain).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

__all__ = ["DataModule", "ArrayDataModule", "apply_cv_fold"]

Batch = Dict[str, np.ndarray]


class DataModule:
    """Protocol: ``setup(stage)`` then ``{train,val,test}_batches()``."""

    batch_size: int = 1

    def setup(self, stage: Optional[str] = None) -> None:  # pragma: no cover
        pass

    def serving_preprocess(self) -> Dict[str, dict]:
        """Raw-input spec for serving artifacts (``m2mixer_tpu/preprocess``):
        how each batch feature is derived from raw text/images, so
        ``serving export`` can ship the preprocessing inside the artifact.
        Empty when the module's features ARE the raw inputs (AV-MNIST)."""
        return {}

    def train_batches(self) -> Iterator[Batch]:
        raise NotImplementedError

    def val_batches(self) -> Iterator[Batch]:
        raise NotImplementedError

    def test_batches(self) -> Iterator[Batch]:
        raise NotImplementedError


class ArrayDataModule(DataModule):
    """In-memory splits of parallel numpy arrays.

    ``self.splits[stage]`` is a dict of equally-long arrays; batches are
    contiguous (or permuted) slices — zero-copy views in the common case.
    """

    def __init__(self, batch_size: int, shuffle_train: bool = False,
                 shuffle_test: bool = False, seed: int = 0, drop_last: bool = False):
        self.batch_size = int(batch_size)
        self.shuffle_train = shuffle_train
        self.shuffle_test = shuffle_test
        self.drop_last = drop_last
        self.splits: Dict[str, Dict[str, np.ndarray]] = {}
        self._rng = np.random.RandomState(seed)

    def split_size(self, stage: str) -> int:
        arrays = self.splits[stage]
        return len(next(iter(arrays.values())))

    def device_resident_ok(self, stage: str) -> bool:
        """Whether the trainer may hoist this split into HBM and run
        epoch-compiled training over it (no per-batch host transforms)."""
        return stage in self.splits

    def epoch_order(self, stage: str, shuffle: bool) -> np.ndarray:
        """The sample visit order for one epoch — shared by the per-step
        iterator and the epoch-compiled path so both are deterministic and
        identical given the module's RNG state."""
        n = self.split_size(stage)
        return self._rng.permutation(n) if shuffle else np.arange(n)

    def train_shuffle_enabled(self) -> bool:
        return self.shuffle_train

    def _iterate(self, stage: str, shuffle: bool) -> Iterator[Batch]:
        arrays = self.splits[stage]
        n = self.split_size(stage)
        order = self.epoch_order(stage, shuffle)
        bs = self.batch_size
        end = (n // bs) * bs if self.drop_last else n
        for start in range(0, end, bs):
            stop = min(start + bs, end)
            idx = order[start:stop]
            yield {k: v[idx] for k, v in arrays.items()}

    def train_batches(self) -> Iterator[Batch]:
        return self._iterate("train", self.shuffle_train)

    def val_batches(self) -> Iterator[Batch]:
        return self._iterate("val", False)

    def test_batches(self) -> Iterator[Batch]:
        return self._iterate("test", self.shuffle_test)


def apply_cv_fold(dm: "ArrayDataModule", fold: int, k: int) -> None:
    """Rotate an array-backed datamodule onto cross-validation fold ``fold``
    of ``k`` (beyond reference; `run_for_significance.py --cv K`): the
    train and val splits are pooled and re-cut so samples ``fold::k`` (an
    interleaved comb — robust to class-ordered datasets) become the val
    split and the rest train. The TEST split is never touched: folds rotate
    what early stopping / best-checkpoint selection sees, while the reported
    metric stays an honest held-out number.

    Call after ``setup()``; mutates ``dm.splits`` in place (every shipped
    ArrayDataModule's ``setup`` early-returns once splits exist, so the
    fold survives the trainer's own setup call).
    """
    if not (0 <= fold < k) or k < 2:
        raise ValueError(f"bad CV fold {fold}/{k}: need k >= 2, 0 <= fold < k")
    splits = getattr(dm, "splits", None)
    if not splits or "train" not in splits or "val" not in splits:
        raise ValueError(
            "--cv needs an array-split datamodule (in-memory train/val "
            f"splits); {type(dm).__name__} holds "
            f"{sorted(splits) if splits else 'no'} array splits")
    keys = splits["train"].keys()
    pool = {key: np.concatenate([splits["train"][key], splits["val"][key]])
            for key in keys}
    n = len(next(iter(pool.values())))
    if k > n:
        raise ValueError(f"--cv {k} exceeds the {n} pooled train+val samples")
    val_idx = np.arange(fold, n, k)
    train_idx = np.setdiff1d(np.arange(n), val_idx)
    splits["train"] = {key: v[train_idx] for key, v in pool.items()}
    splits["val"] = {key: v[val_idx] for key, v in pool.items()}
