"""MinHash projection + text featurizer correctness tests."""

import os

import numpy as np
import pytest

from m2mixer_tpu.utils.projection import (
    MAX_HASH_VALUE,
    CountingBloomFilter,
    MinHash,
    Projection,
    build_vocab_cache,
)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "movie", "was", "great", "bad", "##ly", "amazing", "a", "plot"]


@pytest.fixture(scope="module")
def vocab_cache(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vocab")
    vocab_file = os.path.join(tmp, "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(VOCAB))
    out = os.path.join(tmp, "vocab.npy")
    build_vocab_cache(vocab_file, out)
    return vocab_file, out


def test_minhash_reference_math():
    """h_i = (sha256 + i*sha224) mod 2^31-1; ngram min-reduction."""
    import hashlib

    mh = MinHash(num_hashes=4, ngram_size=3)
    # continuation/short path: whole-token hash
    v = mh("ab", False)
    h1 = int.from_bytes(hashlib.sha256(b"ab").digest(), "little")
    h2 = int.from_bytes(hashlib.sha224(b"ab").digest(), "little")
    expect = [(h1 + i * h2) % MAX_HASH_VALUE for i in range(4)]
    assert list(v) == expect

    # ngram path: elementwise min over trigram hash vectors
    token = "hello"
    grams = [token[i : i + 3] for i in range(3)]
    vecs = []
    for g in grams:
        g1 = int.from_bytes(hashlib.sha256(g.encode()).digest(), "little")
        g2 = int.from_bytes(hashlib.sha224(g.encode()).digest(), "little")
        vecs.append([(g1 + i * g2) % MAX_HASH_VALUE for i in range(4)])
    expect = np.minimum.reduce(np.asarray(vecs))
    assert np.array_equal(mh(token, False), expect)


def test_counting_bloom_filter_scatter():
    cbf = CountingBloomFilter(8)
    fp = np.array([[0, 8, 16, 3]])  # 0, 8, 16 all hit bucket 0
    out = cbf(fp)
    assert out.shape == (1, 8)
    assert out[0, 0] == 3 and out[0, 3] == 1 and out.sum() == 4


def test_projection_window_concat(vocab_cache):
    _, cache = vocab_cache
    proj = Projection(cache, feature_size=16, window_size=1)
    words = [["the"], ["movie"], ["was"], ["great"]]
    feats = proj(words)
    assert feats.shape == (4, 3 * 16)
    # center block of row i == the unwindowed features of word i
    proj0 = Projection(cache, feature_size=16, window_size=0)
    base = proj0(words)
    np.testing.assert_array_equal(feats[:, 16:32], base)
    # left context of row 0 is the zero pad
    assert feats[0, :16].sum() == 0
    np.testing.assert_array_equal(feats[1, :16], base[0])


def test_projection_window2_rows_match_word_count(vocab_cache):
    """The reference's strided concat was only correct for window=1
    (`projection.py:26`); ours must produce n_words rows for any window."""
    _, cache = vocab_cache
    proj = Projection(cache, feature_size=16, window_size=2)
    feats = proj([["the"], ["movie"], ["was"]])
    assert feats.shape == (3, 5 * 16)


def test_text_featurizer_end_to_end(vocab_cache):
    vocab_file, cache = vocab_cache
    from m2mixer_tpu.config import DictConfig
    from m2mixer_tpu.datasets.text_pipeline import TextFeaturizer

    vocab_cfg = DictConfig({
        "tokenizer_type": "wordpiece",
        "tokenizer": {"vocab": vocab_file, "lowercase": False,
                      "strip_accents": False, "clean_text": False},
        "vocab_path": cache,
    })
    proj_cfg = DictConfig({"num_hashes": 64, "feature_size": 16, "window_size": 1})
    feat = TextFeaturizer(vocab_cfg, proj_cfg, max_seq_len=8)
    out = feat("the movie was great")
    assert out.shape == (8, 48)
    assert out[:4].sum() > 0  # 4 words featurized
    assert out[4:].sum() == 0  # padded
