"""pNLP text-only data stack (IMDB sentiment via aclImdb folder layout).

Re-expresses ``/root/reference/datasets/pnlp.py``: tokenizer dispatch
(wordpiece / sentencepiece), the normalize -> pre-tokenize -> project
pipeline, and the aclImdb ``{split}/{label}/*.txt`` globbing dataset
(unsup excluded).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from .lazy import LazyDataModule
from .text_pipeline import TextFeaturizer

__all__ = ["PnlpMixerDataModule", "ImdbDataModule"]

_UNICODE_FIXES = {"’": "'", "–": "-", "‘": "'", "´": "'", "“": '"', "”": '"'}


class PnlpMixerDataModule(LazyDataModule):
    """Generic text-classification module; ``dataset_type`` selects the
    corpus layout (imdb supported; mtop/matis were stubs in the reference
    too, `pnlp.py:28-36`)."""

    def __init__(self, vocab_cfg=None, train_cfg=None, proj_cfg=None,
                 vocab=None, projection=None, **kwargs):
        vocab_cfg = vocab_cfg or vocab
        proj_cfg = proj_cfg or projection
        self.train_cfg = train_cfg
        max_seq_len = int(train_cfg.max_seq_len)
        super().__init__(batch_size=int(train_cfg.get("train_batch_size", 32)),
                         shuffle_train=True, num_workers=int(train_cfg.get("num_workers", 0)))
        self.featurizer = TextFeaturizer(vocab_cfg, proj_cfg, max_seq_len)
        self.data: dict = {}
        self.label_map: dict = {}

    def serving_preprocess(self):
        return {"text": self.featurizer.serving_spec()}

    def setup(self, stage: Optional[str] = None) -> None:
        if self.data:
            return
        labels = self.train_cfg.labels
        label_list = Path(labels).read_text().splitlines() if isinstance(labels, str) else labels
        self.label_map = {label: i for i, label in enumerate(label_list)}
        root = Path(self.train_cfg.dataset_path)
        if self.train_cfg.dataset_type != "imdb":
            raise NotImplementedError(self.train_cfg.dataset_type)
        for split, sub in (("train", "train"), ("dev", "test"), ("test", "test")):
            rows = []
            for file in sorted(root.glob(f"{sub}/*/*.txt")):
                if "unsup" not in str(file):
                    rows.append((file, file.parent.stem))
            self.data[split] = rows
            self.split_sizes[split] = len(rows)

    def load_sample(self, split: str, idx: int):
        file, label = self.data[split][idx]
        text = file.read_text()
        for bad, good in _UNICODE_FIXES.items():
            text = text.replace(bad, good)
        return {
            "text": self.featurizer(text).astype(np.float32),
            "label": np.int32(self.label_map[label]),
        }


# registry-friendly alias matching the dataset family naming
ImdbDataModule = PnlpMixerDataModule
