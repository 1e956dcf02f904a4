"""AV-MNIST data stack (image digits 1x28x28 + audio spectrograms 1x112x112).

Parity with ``/root/reference/datasets/avmnist.py``: npy layout
``{audio,image}/{train,test}_data.npy`` + ``{train,test}_labels.npy``
(`avmnist.py:104-114`), train = indices 0-55000 and val = 55000-60000 drawn
from the train files (`:174-178`), train iteration unshuffled and test
shuffled — both reference quirks, kept configurable. The whole dataset fits
in memory, so batching is vectorized numpy slicing instead of forked
DataLoader workers. ``RandomModalityMuting`` (`avmnist.py:64-83`) is applied
batch-level with numpy randomness (it is disabled by default in the
reference pipeline too, `:167-168`).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from .base import ArrayDataModule, Batch

__all__ = ["AVMnistDataModule", "AVMnistIntermediateDataModule", "synthetic_avmnist_arrays"]


def synthetic_avmnist_arrays(n: int, seed: int = 0, learnable: bool = False):
    """AV-MNIST-shaped tensors for smoke tests and benchmarks.

    ``learnable=True`` plants a class-dependent signal (a bright patch whose
    position encodes the label, plus noise) in both modalities, so training
    convergence is testable without the real dataset.
    """
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 10, size=(n,)).astype(np.int32)
    image = rng.rand(n, 1, 28, 28).astype(np.float32)
    audio = rng.rand(n, 1, 112, 112).astype(np.float32)
    if learnable:
        for i, y in enumerate(labels):
            r, c = divmod(int(y), 5)
            image[i, 0, r * 14 : r * 14 + 14, c * 5 : c * 5 + 5] += 3.0
            audio[i, 0, r * 56 : r * 56 + 56, c * 22 : c * 22 + 22] += 3.0
    else:
        image *= 255.0
        audio *= 255.0
    return {"image": image, "audio": audio, "label": labels}


class AVMnistDataModule(ArrayDataModule):
    def __init__(self, data_dir: str, batch_size: int, num_workers: int = 0,
                 p_muting: float = 0.0, shuffle_train: bool = False,
                 synthetic: bool = False, synthetic_sizes=(512, 128, 128),
                 synthetic_learnable: bool = False, mmap: bool = False,
                 **kwargs):
        super().__init__(batch_size=batch_size, shuffle_train=shuffle_train, shuffle_test=True)
        self.data_dir = data_dir
        self.p_muting = float(p_muting)
        self.synthetic = synthetic
        self.synthetic_sizes = synthetic_sizes
        self.synthetic_learnable = synthetic_learnable
        #: dataset.params.mmap: keep the monolithic npy files memory-mapped
        #: instead of materialized in host RAM — splits become views, and
        #: only the rows a batch (or a train.pool_chunk_mb chunk) touches
        #: are ever read. With pool streaming this completes the memory
        #: hierarchy: disk -> (mmap) host pages -> (chunks) HBM, so neither
        #: host RAM nor device memory bounds the dataset size. Files whose
        #: stored dtype isn't the final one are materialized with a note
        #: (float32 on disk keeps the mapping).
        self.mmap = bool(mmap)
        self._mute_rng = np.random.RandomState(1234)

    def setup(self, stage: Optional[str] = None) -> None:
        if self.splits:
            return
        if self.synthetic:
            n_train, n_val, n_test = self.synthetic_sizes
            train = synthetic_avmnist_arrays(n_train + n_val, seed=0,
                                             learnable=self.synthetic_learnable)
            test = synthetic_avmnist_arrays(n_test, seed=1,
                                            learnable=self.synthetic_learnable)
            self.splits["train"] = {k: v[:n_train] for k, v in train.items()}
            self.splits["val"] = {k: v[n_train:] for k, v in train.items()}
            self.splits["test"] = test
            return

        def load(stage_name):
            mm = "r" if self.mmap else None
            img = np.load(os.path.join(self.data_dir, "image", f"{stage_name}_data.npy"),
                          mmap_mode=mm)
            aud = np.load(os.path.join(self.data_dir, "audio", f"{stage_name}_data.npy"),
                          mmap_mode=mm)
            lab = np.load(os.path.join(self.data_dir, f"{stage_name}_labels.npy"))

            def finalize(a, dtype):
                if a.dtype == dtype:
                    return a  # reshape/newaxis keep the memmap a view
                if self.mmap:
                    print(f"[avmnist] mmap: {stage_name} stored as {a.dtype}, "
                          f"materializing as {np.dtype(dtype).name} (store "
                          "float32 npys to keep the mapping)")
                return np.asarray(a, dtype)

            return {
                "image": finalize(img.reshape(img.shape[0], 1, 28, 28), np.float32),
                "audio": finalize(aud[:, None, :, :], np.float32),
                "label": lab.astype(np.int32),
            }

        train = load("train")
        # reference split: train=0:55000, val=55000:60000 (`avmnist.py:174-178`);
        # for train files smaller than 60k (e.g. the make_avmnist surrogate)
        # keep the same 55/60 proportion so val is never empty
        n = len(train["label"])
        n_val_start = 55000 if n >= 60000 else max(1, (n * 55) // 60)
        self.splits["train"] = {k: v[:n_val_start] for k, v in train.items()}
        self.splits["val"] = {k: v[n_val_start:] for k, v in train.items()}
        self.splits["test"] = load("test")

    def device_resident_ok(self, stage: str) -> bool:
        # the host-side batch-muting transform blocks the device-resident path
        if stage == "train" and self.p_muting > 0:
            return False
        return super().device_resident_ok(stage)

    def train_batches(self) -> Iterator[Batch]:
        for batch in super().train_batches():
            if self.p_muting > 0:
                batch = dict(batch)
                # batch-level random modality muting (`avmnist.py:64-83`)
                r = self._mute_rng.rand(len(batch["label"]))
                which = self._mute_rng.rand(len(batch["label"])) <= 0.5
                mute = r <= self.p_muting
                img_mask = np.where(mute & which, 0.0, 1.0).astype(np.float32)
                aud_mask = np.where(mute & ~which, 0.0, 1.0).astype(np.float32)
                batch["image"] = batch["image"] * img_mask[:, None, None, None]
                batch["audio"] = batch["audio"] * aud_mask[:, None, None, None]
            yield batch


class AVMnistIntermediateDataModule(ArrayDataModule):
    """Saved intermediate vectors + correctness labels for the post-hoc probe
    (parity: `/root/reference/datasets/avmnist.py:193-261`)."""

    def __init__(self, data_dir: str, batch_size: int, num_workers: int = 0,
                 modality: str = "multi", **kwargs):
        super().__init__(batch_size=batch_size, shuffle_test=True)
        self.data_dir = data_dir
        self.modality = modality

    def _load(self, stage: str):
        root = os.path.join(self.data_dir, stage)
        if self.modality == "multi":
            return {
                "image": np.load(os.path.join(root, "image_vectors.npy")).astype(np.float32),
                "audio": np.load(os.path.join(root, "audio_vectors.npy")).astype(np.float32),
                "fusion": np.load(os.path.join(root, "fusion_vectors.npy")).astype(np.float32),
                "image_label": np.load(os.path.join(root, "image_corrects.npy")).astype(np.int32),
                "audio_label": np.load(os.path.join(root, "audio_corrects.npy")).astype(np.int32),
                "fusion_label": np.load(os.path.join(root, "fusion_corrects.npy")).astype(np.int32),
            }
        if self.modality not in ("image", "audio", "fusion"):
            raise ValueError("Modality should be one of multi, image, audio, fusion")
        return {
            "data": np.load(os.path.join(root, f"{self.modality}_vectors.npy")).astype(np.float32),
            "label": np.load(os.path.join(root, f"{self.modality}_corrects.npy")).astype(np.int32),
        }

    def setup(self, stage: Optional[str] = None) -> None:
        if self.splits:
            return
        train = self._load("train")
        self.splits["train"] = train
        self.splits["val"] = train  # reference uses the train files for val (`avmnist.py:246-248`)
        self.splits["test"] = self._load("test")
