"""Embedding-free text featurizer: MinHash + counting-Bloom projection.

Re-expresses ``/root/reference/utils/projection.py`` (the pNLP-Mixer
projection): each wordpiece token gets a 64-way MinHash fingerprint over its
character trigrams; a word's fingerprint is the elementwise min over its
tokens; fingerprints scatter into a ``feature_size``-dim counting Bloom
filter; a +-window context concat yields the final per-word feature row.

This is deterministic, learned-parameter-free host-side preprocessing — on
TPU it runs in the input pipeline, never on device. Differences from the
reference, both deliberate:

- vectorized: the vocab cache is a single ``(V, num_hashes)`` int32 matrix
  and per-sample projection is pure numpy index arithmetic (the reference
  loops per token in Python — SURVEY.md §7.4 risk 5);
- the windowed concat handles any ``window_size`` (the reference's strided
  row arithmetic is only correct for window_size=1, `projection.py:26`).

A C++ kernel for the batch projection hot loop lives in
``m2mixer_tpu/native`` (optional, ctypes-loaded) for max host throughput.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence

import numpy as np

MAX_HASH_VALUE = 2**31 - 1

WORDPIECE_IS_CONTINUATION = lambda t: t.startswith("##")  # noqa: E731
SENTENCEPIECE_IS_CONTINUATION = lambda t: not t.startswith("▁")  # noqa: E731

__all__ = [
    "MinHash",
    "CachedHash",
    "CountingBloomFilter",
    "Projection",
    "build_vocab_cache",
]


def _sha_pair(data: str):
    h1 = int.from_bytes(hashlib.sha256(data.encode("utf8")).digest(), "little")
    h2 = int.from_bytes(hashlib.sha224(data.encode("utf8")).digest(), "little")
    return h1, h2


class MinHash:
    """64-way MinHash over character n-grams (parity: `projection.py:32-52`):
    hash_i(x) = (sha256(x) + i*sha224(x)) mod (2^31-1); short/continuation
    tokens hash whole; else elementwise min over n-gram hash vectors."""

    def __init__(self, num_hashes: int, ngram_size: int):
        self.num_hashes = num_hashes
        self.ngram_size = ngram_size
        self._iota = np.arange(num_hashes, dtype=object)

    def _vector(self, data: str) -> np.ndarray:
        h1, h2 = _sha_pair(data)
        return np.asarray((h1 + self._iota * h2) % MAX_HASH_VALUE, dtype=np.int64)

    def __call__(self, token: str, is_cont: bool) -> np.ndarray:
        n = self.ngram_size
        if is_cont or len(token) < n + 1:
            return self._vector(token)
        grams = [self._vector(token[i : i + n]) for i in range(len(token) - n + 1)]
        return np.minimum.reduce(grams)


class CachedHash:
    """Precomputed token -> fingerprint lookup backed by one int32 matrix."""

    def __init__(self, path: str):
        obj = np.load(path, allow_pickle=True).item()
        self.index: Dict[str, int] = {}
        rows = []
        for i, (token, vec) in enumerate(obj.items()):
            self.index[token] = i
            rows.append(np.asarray(vec, np.int64))
        self.table = np.stack(rows) if rows else np.zeros((0, 64), np.int64)

    def __call__(self, token: str) -> np.ndarray:
        return self.table[self.index[token]]

    def rows(self, tokens: Sequence[str]) -> np.ndarray:
        idx = np.fromiter((self.index[t] for t in tokens), dtype=np.int64, count=len(tokens))
        return self.table[idx]


class CountingBloomFilter:
    """Scatter fingerprint values (mod feature_size) into count histograms
    (parity: `projection.py:63-70`, without materializing an eye matrix)."""

    def __init__(self, feature_size: int):
        self.feature_size = feature_size

    def __call__(self, fingerprints: np.ndarray) -> np.ndarray:
        # fingerprints: (n_words, num_hashes) -> (n_words, feature_size)
        n, h = fingerprints.shape
        out = np.zeros((n, self.feature_size), np.float32)
        cols = (fingerprints % self.feature_size).astype(np.int64)
        rows = np.repeat(np.arange(n), h)
        np.add.at(out, (rows, cols.reshape(-1)), 1.0)
        return out


class Projection:
    """words (list of token-lists) -> (n_words, (2*window+1)*feature_size)."""

    def __init__(self, hash_path: str, feature_size: int, window_size: int, **kwargs):
        self.hash = CachedHash(hash_path)
        self.cbf = CountingBloomFilter(feature_size)
        self.feature_size = feature_size
        self.window_size = window_size

    def __call__(self, words: List[List[str]]) -> np.ndarray:
        if words:
            native = self._call_native(words)
            if native is not None:
                return native
        # per-word fingerprint: min over its tokens' cached fingerprints
        fingerprints = np.stack([
            self.hash.rows(tokens).min(axis=0) for tokens in words
        ]) if words else np.zeros((0, self.hash.table.shape[1]), np.int64)
        features = self.cbf(fingerprints)
        w = self.window_size
        if w > 0:
            n, f = features.shape
            padded = np.pad(features, ((w, w), (0, 0)))
            # windows of 2w+1 consecutive rows, flattened per center word
            features = np.concatenate(
                [padded[k : k + n] for k in range(2 * w + 1)], axis=1
            )
        return features

    def _call_native(self, words: List[List[str]]):
        """One-pass C++ projection (m2mixer_tpu/native) when built."""
        from ..native import project_words_native

        flat = [t for tokens in words for t in tokens]
        offsets = np.zeros((len(words) + 1,), np.int64)
        np.cumsum([len(tokens) for tokens in words], out=offsets[1:])
        token_rows = self.hash.rows(flat).astype(np.int32)
        return project_words_native(token_rows, offsets, self.feature_size, self.window_size)


def build_vocab_cache(vocab_file: str, out_file: str = "vocab.npy",
                      num_hashes: int = 64, ngram_size: int = 3,
                      tokenizer_type: str = "wordpiece") -> None:
    """Offline cache builder (parity: `projection.py:73-97` CLI): hashes
    every vocab entry (with '##'/sentencepiece markers stripped) and stores
    the token -> fingerprint dict as ``vocab.npy``."""
    with open(vocab_file) as f:
        vocabs = [line.strip().split("\t")[0] for line in f]
    is_cont = (
        WORDPIECE_IS_CONTINUATION if tokenizer_type == "wordpiece"
        else SENTENCEPIECE_IS_CONTINUATION
    )
    mh = MinHash(num_hashes, ngram_size)
    cache = {
        v: mh(v.replace("##", "").replace("▁", ""), is_cont(v)).astype(np.int32)
        for v in vocabs
    }
    np.save(out_file, cache)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("-v", "--vocab_file", type=str, required=True)
    p.add_argument("-g", "--ngram_size", type=int, default=3)
    p.add_argument("-o", "--outfile", type=str, default="vocab.npy")
    p.add_argument("--num-hashes", type=int, default=64)
    p.add_argument("--tokenizer-type", type=str, default="wordpiece")
    args = p.parse_args()
    build_vocab_cache(args.vocab_file, args.outfile, args.num_hashes,
                      args.ngram_size, args.tokenizer_type)
