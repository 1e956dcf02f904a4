"""Shared wordpiece -> MinHash-projection text featurization.

Factors out the identical project/get_words methods the reference repeats
across its datasets (`mmimdb.py:139-153`, `mmhs150.py:182-198`,
`multioff.py:131-151`, `memotion.py:136-156`, `pnlp.py:80-106`).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..utils.projection import Projection

__all__ = ["TextFeaturizer", "build_tokenizer"]


def build_tokenizer(vocab_cfg):
    """Tokenizer dispatch (parity: `pnlp.py:21-26`)."""
    ttype = vocab_cfg.get("tokenizer_type", "wordpiece")
    kwargs = dict(vocab_cfg.tokenizer)
    if ttype == "wordpiece":
        from tokenizers.implementations import BertWordPieceTokenizer

        return BertWordPieceTokenizer(**kwargs)
    if ttype == "sentencepiece_bpe":
        from tokenizers.implementations import SentencePieceBPETokenizer

        return SentencePieceBPETokenizer(**kwargs)
    if ttype == "sentencepiece_unigram":
        from tokenizers.implementations import SentencePieceUnigramTokenizer

        return SentencePieceUnigramTokenizer(**kwargs)
    raise ValueError(f"Unknown tokenizer_type: {ttype}")


class TextFeaturizer:
    """text -> (max_seq_len, (2w+1)*feature_size) hashed features."""

    def __init__(self, vocab_cfg, projection_cfg, max_seq_len: int):
        self.vocab_cfg = vocab_cfg
        self.projection_cfg = projection_cfg
        self.tokenizer = build_tokenizer(vocab_cfg)
        self.projection = Projection(
            vocab_cfg.vocab_path, projection_cfg.feature_size, projection_cfg.window_size
        )
        self.max_seq_len = max_seq_len

    def serving_spec(self) -> dict:
        """This featurizer as a serving-artifact ``preprocess`` entry
        (``m2mixer_tpu/preprocess.py``) so exported models accept raw text."""
        from ..config import todict

        return {"kind": "pnlp_text", "vocab": todict(self.vocab_cfg),
                "projection": todict(self.projection_cfg),
                "max_seq_len": int(self.max_seq_len)}

    def normalize(self, text: str) -> str:
        return text.replace("<br />", " ")

    def get_words(self, text: str) -> List[str]:
        fields = text.split("\t")
        words = [
            w[0] for w in self.tokenizer.pre_tokenizer.pre_tokenize_str(self.normalize(fields[0]))
        ]
        return words[: self.max_seq_len]

    def project_words(self, words: List[str]) -> np.ndarray:
        if not words:
            words = ["none"]
        encoded = self.tokenizer.encode(words, is_pretokenized=True, add_special_tokens=False)
        tokens: List[List[str]] = [[] for _ in range(len(words))]
        for index, token in zip(encoded.word_ids, encoded.tokens):
            tokens[index].append(token)
        tokens = [t if t else ["[UNK]"] for t in tokens]
        features = self.projection(tokens)
        return np.pad(features, ((0, self.max_seq_len - len(words)), (0, 0)))

    def __call__(self, text: str) -> np.ndarray:
        return self.project_words(self.get_words(text))
