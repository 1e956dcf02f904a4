"""MultiOFF data stack (meme image + sentence, binary offensive labels).

Re-expresses ``/root/reference/datasets/multioff.py``: CSVs under
``Split Dataset/{Training,Testing,Validation}_meme_dataset.csv`` with label
column mapped offensive->1, images under ``Labelled Images`` resized 512x512.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .lazy import LazyDataModule
from .text_pipeline import TextFeaturizer
from .transforms import load_image

__all__ = ["MultiOFFDataModule"]

_SPLIT_CSVS = {
    "train": "Training_meme_dataset.csv",
    "test": "Testing_meme_dataset.csv",
    "dev": "Validation_meme_dataset.csv",
}


class MultiOFFDataModule(LazyDataModule):
    def __init__(self, data_dir: str, batch_size: int, num_workers: int = 0,
                 vocab=None, projection=None, max_seq_len: int = 64,
                 task_name: str = "offensive", **kwargs):
        super().__init__(batch_size=batch_size, shuffle_train=True, num_workers=num_workers)
        self.data_dir = data_dir
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

        for split, csv in _SPLIT_CSVS.items():
            df = pd.read_csv(os.path.join(self.data_dir, "Split Dataset", csv))
            # offensive -> 1, anything else -> 0 (`multioff.py:93`); written to
            # a fresh int column (pandas 3 str columns reject int assignment)
            df = df.assign(_label=(df.iloc[:, -1] == "offensive").astype(int))
            self.frames[split] = df
            self.split_sizes[split] = len(df)

    def load_sample(self, split: str, idx: int):
        row = self.frames[split].iloc[idx]
        image = load_image(
            os.path.join(self.data_dir, "Labelled Images", row["image_name"]),
            size=(512, 512),
        )
        text = row["sentence"]
        return {
            "image": image,
            "text": self.featurizer(text).astype(np.float32),
            "label": np.int32(row["_label"]),
            "textlen": np.int32(text.count(" ") + 1),
        }
