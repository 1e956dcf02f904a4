"""MMHS150K data stack (tweet image + tweet text + OCR text, binary labels).

Re-expresses ``/root/reference/datasets/mmhs150.py``: split id-lists under
``splits/{train,test,val}_ids.txt``, images ``img_resized/{id}.jpg`` resized
to 256x256, tweet text from ``MMHS150K_GT.json``, per-image OCR json under
``img_txt/``, 3-annotator labels majority-binarized (sum of positive votes
> 1), and either the pNLP hashed projection or word2vec (GoogleNews 300-d)
features with per-sample ``use_features`` flags for empty text.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .lazy import LazyDataModule
from .text_pipeline import TextFeaturizer
from .transforms import load_image

__all__ = ["MMHS150DataModule"]

_SPLIT_FILES = {"train": "train_ids.txt", "test": "test_ids.txt", "dev": "val_ids.txt"}


class MMHS150DataModule(LazyDataModule):
    def __init__(self, data_dir: str, batch_size: int, num_workers: int = 0,
                 vocab=None, projection=None, max_seq_len: int = 64,
                 task: str = "binary", word_proj: str = "pnlp",
                 word2vec_path: str = "pretrained/GoogleNews-vectors-negative300.bin",
                 **kwargs):
        super().__init__(batch_size=batch_size, shuffle_train=True, num_workers=num_workers)
        self.data_dir = data_dir
        self.task = task
        self.word_proj = word_proj
        self.max_seq_len = max_seq_len
        self.featurizer = TextFeaturizer(vocab, projection, max_seq_len) if word_proj == "pnlp" else None
        self.word2vec = None
        if word_proj == "word2vec":
            try:
                from gensim.models import KeyedVectors

                self.word2vec = KeyedVectors.load_word2vec_format(word2vec_path, binary=True)
            except ImportError as e:
                raise RuntimeError(
                    "word_proj='word2vec' requires gensim, which is not in this "
                    "image; use word_proj='pnlp' (the shipped config default)"
                ) from e
        self.ids: dict = {}
        self.texts: dict = {}

    def serving_preprocess(self):
        """Raw-input serving spec (pnlp projection only — the word2vec path
        needs the GoogleNews binary, which artifacts don't ship): raw tweet
        image + tweet/OCR text; the use_features flags are always 1 under
        the pnlp projection (`load_sample` above)."""
        if self.featurizer is None:
            return {}
        text_spec = self.featurizer.serving_spec()
        return {"image": {"kind": "image", "normalize": "imagenet"},
                "text": text_spec, "ocr": text_spec,
                "use_features": {"kind": "const", "value": 1.0},
                "use_features_ocr": {"kind": "const", "value": 1.0}}

    def setup(self, stage: Optional[str] = None) -> None:
        if self.ids:
            return
        for split, fname in _SPLIT_FILES.items():
            self.ids[split] = np.loadtxt(
                os.path.join(self.data_dir, "splits", fname), dtype=str
            )
            self.split_sizes[split] = len(self.ids[split])
        with open(os.path.join(self.data_dir, "MMHS150K_GT.json")) as f:
            self.texts = json.load(f)

    def load_sample(self, split: str, idx: int):
        sid = self.ids[split][idx]
        image = load_image(
            os.path.join(self.data_dir, "img_resized", f"{sid}.jpg"), size=(256, 256)
        )
        ocr_path = os.path.join(self.data_dir, "img_txt", f"{sid}.json")
        if os.path.exists(ocr_path):
            with open(ocr_path) as f:
                ocr_text = json.load(f)["img_text"]
        else:
            ocr_text = "none"
        entry = self.texts.get(sid, {})
        text = entry.get("tweet_text", "none")
        votes = (np.asarray(entry["labels"]).astype(int) > 0).astype(int)
        label = 1 if votes.sum() > 1 else 0  # annotator majority (`mmhs150.py:130-135`)

        if self.word_proj == "pnlp":
            feats = self.featurizer(text).astype(np.float32)
            feats_ocr = self.featurizer(ocr_text).astype(np.float32)
            use, use_ocr = 1, 1
        else:
            feats, use = self._w2v(text)
            feats_ocr, use_ocr = self._w2v(ocr_text)
        return {
            "image": image,
            "text": feats,
            "ocr": feats_ocr,
            "label": np.int32(label),
            "use_features": np.float32(use),
            "use_features_ocr": np.float32(use_ocr),
        }

    def _w2v(self, text: str):
        words = [w for w in text.split() if w in self.word2vec][: self.max_seq_len]
        if not words:
            return np.zeros((self.max_seq_len, 300), np.float32), 0
        feats = np.stack([self.word2vec[w] for w in words]).astype(np.float32)
        feats = np.pad(feats, ((0, self.max_seq_len - len(words)), (0, 0)))
        return feats, 1
