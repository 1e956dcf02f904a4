"""Memotion data stack (meme image + corrected text, multi-task labels).

Re-expresses ``/root/reference/datasets/memotion.py``: ``labels.csv``
(NaN rows dropped), a precomputed ``shuffled.npy`` permutation giving the
70/20/10 train/test/dev split, task column (humour / sarcasm / offensive /
motivational / overall_sentiment) converted to categorical codes, images
resized 512x512. Registered in the data registry (the reference forgets the
import — SURVEY.md §2.4).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .lazy import LazyDataModule
from .text_pipeline import TextFeaturizer
from .transforms import load_image

__all__ = ["MemotionDataModule"]


class MemotionDataModule(LazyDataModule):
    def __init__(self, data_dir: str, batch_size: int, num_workers: int = 0,
                 vocab=None, projection=None, max_seq_len: int = 1024,
                 task_name: str = "humour", **kwargs):
        super().__init__(batch_size=batch_size, shuffle_train=True, num_workers=num_workers)
        self.data_dir = data_dir
        self.task_name = task_name
        self.featurizer = TextFeaturizer(vocab, projection, max_seq_len)
        self.frames: dict = {}

    def serving_preprocess(self):
        return {"image": {"kind": "image", "normalize": "imagenet"},
                "text": self.featurizer.serving_spec(),
                "textlen": {"kind": "text_len", "of": "text"}}

    def setup(self, stage: Optional[str] = None) -> None:
        if self.frames:
            return
        import pandas as pd

        ref = pd.read_csv(os.path.join(self.data_dir, "labels.csv")).dropna()
        indices = np.load(os.path.join(self.data_dir, "shuffled.npy"))
        n = len(ref)
        cuts = {
            "train": indices[: int(0.7 * n)],
            "test": indices[int(0.7 * n) : int(0.9 * n)],
            "dev": indices[int(0.9 * n) :],
        }
        for split, idx in cuts.items():
            df = ref.iloc[idx].copy()
            df[self.task_name] = df[self.task_name].astype("category").cat.codes.astype("int")
            self.frames[split] = df
            self.split_sizes[split] = len(df)

    def load_sample(self, split: str, idx: int):
        row = self.frames[split].iloc[idx]
        image = load_image(
            os.path.join(self.data_dir, "images", row["image_name"]), size=(512, 512)
        )
        text = row["text_corrected"]
        return {
            "image": image,
            "text": self.featurizer(text).astype(np.float32),
            "label": np.int32(row[self.task_name]),
            "textlen": np.int32(str(text).count(" ") + 1),
        }
