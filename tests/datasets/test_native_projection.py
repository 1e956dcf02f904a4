"""Native C++ projection kernel: parity with the numpy path + throughput."""

import os
import time

import numpy as np
import pytest

from m2mixer_tpu.native import load, project_words_native


@pytest.fixture(scope="module")
def lib():
    lib = load()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_project_words_matches_numpy(lib):
    rng = np.random.RandomState(0)
    num_hashes, F, W = 64, 32, 1
    n_words = 7
    tokens_per_word = rng.randint(1, 4, n_words)
    offsets = np.zeros(n_words + 1, np.int64)
    np.cumsum(tokens_per_word, out=offsets[1:])
    token_rows = rng.randint(0, 2**31 - 1, (offsets[-1], num_hashes)).astype(np.int32)

    out = project_words_native(token_rows, offsets, F, W)

    # numpy reference
    fps = np.stack([token_rows[offsets[i]:offsets[i + 1]].min(axis=0) for i in range(n_words)])
    feats = np.zeros((n_words, F), np.float32)
    for i in range(n_words):
        for h in fps[i] % F:
            feats[i, h] += 1
    padded = np.pad(feats, ((W, W), (0, 0)))
    ref = np.concatenate([padded[k:k + n_words] for k in range(2 * W + 1)], axis=1)
    np.testing.assert_array_equal(out, ref)


def test_projection_uses_native_and_matches(lib, tmp_path):
    from m2mixer_tpu.utils.projection import Projection, build_vocab_cache

    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(["alpha", "beta", "##ga", "delta"]))
    cache = str(tmp_path / "vocab.npy")
    build_vocab_cache(str(vocab_file), cache)
    proj = Projection(cache, feature_size=16, window_size=2)
    words = [["alpha"], ["beta", "##ga"], ["delta"]]
    native = proj(words)
    # force numpy path for comparison
    import m2mixer_tpu.utils.projection as P

    orig = Projection._call_native
    Projection._call_native = lambda self, w: None
    try:
        ref = proj(words)
    finally:
        Projection._call_native = orig
    np.testing.assert_array_equal(native, ref)


def test_native_throughput_wins(lib):
    """The fused pass should beat the numpy path on realistic batches."""
    rng = np.random.RandomState(0)
    num_hashes, F, W = 64, 1024, 1
    n_words = 256
    offsets = np.arange(n_words + 1, dtype=np.int64) * 2
    token_rows = rng.randint(0, 2**31 - 1, (offsets[-1], num_hashes)).astype(np.int32)

    t0 = time.perf_counter()
    for _ in range(20):
        project_words_native(token_rows, offsets, F, W)
    native_t = time.perf_counter() - t0

    def numpy_path():
        fps = token_rows.reshape(n_words, 2, num_hashes).min(axis=1)
        feats = np.zeros((n_words, F), np.float32)
        cols = fps % F
        rows = np.repeat(np.arange(n_words), num_hashes)
        np.add.at(feats, (rows, cols.reshape(-1)), 1.0)
        padded = np.pad(feats, ((W, W), (0, 0)))
        return np.concatenate([padded[k:k + n_words] for k in range(2 * W + 1)], axis=1)

    t0 = time.perf_counter()
    for _ in range(20):
        numpy_path()
    numpy_t = time.perf_counter() - t0
    print(f"native {native_t*50:.2f}ms/call vs numpy {numpy_t*50:.2f}ms/call")
    assert native_t < numpy_t
