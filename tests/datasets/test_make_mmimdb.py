"""Offline MM-IMDB builder: determinism + the built-dump -> DataModule
round trip (complements the layout assertions in
`test_file_datasets.py::test_make_mmimdb_builder`).

Contract from reference `datasets/make_mmimdb.py:23-59,127-194` (fixed-seed
stratified split, center-crop) and `datasets/mmimdb.py:109-117` (per-sample
file layout the datamodule reads back).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from m2mixer_tpu.config import DictConfig
from m2mixer_tpu.datasets.make_mmimdb import build, resize_and_crop_image

GENRES = ["Drama", "Comedy", "Horror"]


@pytest.fixture(scope="module")
def raw_dump(tmp_path_factory):
    raw = tmp_path_factory.mktemp("mmimdb_raw")
    rng = np.random.RandomState(0)
    for i in range(20):
        plots = ["short.", f"A Longer, <br />RICHER plot about movie {i}!"]
        genres = [GENRES[i % 3]] + ([GENRES[(i + 1) % 3]] if i % 2 else [])
        with open(raw / f"{i:07d}.json", "w") as f:
            json.dump({"genres": genres, "plot": plots}, f)
        Image.fromarray(rng.randint(0, 255, (48, 36, 3), dtype=np.uint8)).save(
            raw / f"{i:07d}.jpeg")
    return raw


def test_resize_and_crop_center_box(tmp_path):
    p = tmp_path / "x.jpeg"
    Image.fromarray(np.zeros((100, 40, 3), dtype=np.uint8)).save(p)
    out = resize_and_crop_image(str(p), box=(32, 20))
    assert out.shape == (20, 32, 3)


def test_build_is_deterministic(raw_dump, tmp_path):
    """The fixed-seed stratified split must reproduce bit-identically
    (reference pins RandomState([2014, 8, 6]), `make_mmimdb.py:127-139`)."""
    out1, out2 = tmp_path / "a", tmp_path / "b"
    build(str(raw_dump), str(out1), img_size=(36, 48), n_classes=3)
    build(str(raw_dump), str(out2), img_size=(36, 48), n_classes=3)
    total = 0
    for split in ("train", "dev", "test"):
        n = len(os.listdir(out1 / split / "labels"))
        assert n == len(os.listdir(out2 / split / "labels"))
        total += n
        for i in range(n):
            np.testing.assert_array_equal(
                np.load(out1 / split / "labels" / f"label_{i}.npy"),
                np.load(out2 / split / "labels" / f"label_{i}.npy"))
            assert (out1 / split / "text" / f"text_{i}.txt").read_text() == \
                   (out2 / split / "text" / f"text_{i}.txt").read_text()
    assert total == 20


def test_built_dump_loads_via_datamodule(raw_dump, tmp_path, tmp_path_factory):
    """The builder's output must be directly consumable by MMIMDBDataModule
    (the de-facto integration contract of the offline-prep path)."""
    from m2mixer_tpu.datasets.mmimdb import MMIMDBDataModule
    from m2mixer_tpu.utils.projection import build_vocab_cache

    out = tmp_path / "out"
    build(str(raw_dump), str(out), img_size=(36, 48), n_classes=3)

    vtmp = tmp_path_factory.mktemp("vocab_mk")
    vocab_file = vtmp / "vocab.txt"
    vocab_file.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "longer", "richer", "plot", "about", "movie"]))
    cache = vtmp / "vocab.npy"
    build_vocab_cache(str(vocab_file), str(cache))
    vocab = DictConfig({
        "tokenizer_type": "wordpiece",
        "tokenizer": {"vocab": str(vocab_file), "lowercase": True,
                      "strip_accents": False, "clean_text": False},
        "vocab_path": str(cache),
    })
    dm = MMIMDBDataModule(str(out), batch_size=2, vocab=vocab,
                          projection=DictConfig({"num_hashes": 64,
                                                 "feature_size": 32,
                                                 "window_size": 1}),
                          max_seq_len=8)
    dm.setup()
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (2, 3, 48, 36)
    assert batch["text"].shape == (2, 8, 3 * 32)
    assert batch["label"].shape == (2, 3)


def test_surrogate_builds_learnable_dump(tmp_path):
    """--surrogate: class-structured raw dump -> normal build -> per-file
    layout + matching vocab assets, consumable by MMIMDBDataModule, with
    genre signal present in both modalities."""
    from m2mixer_tpu.datasets.make_mmimdb import (surrogate_raw,
                                                  surrogate_vocab)
    from m2mixer_tpu.datasets.mmimdb import MMIMDBDataModule

    out = tmp_path / "sur"
    words = surrogate_raw(str(out / "raw"), n_movies=40, seed=0)
    build(str(out / "raw"), str(out))
    surrogate_vocab(str(out), words)

    # vocab covers every keyword the plots can contain
    vocab_words = set((out / "vocab.txt").read_text().splitlines())
    assert set(words) <= vocab_words
    assert (out / "vocab.npy").exists()

    dm = MMIMDBDataModule(
        str(out), batch_size=4,
        vocab=DictConfig({
            "tokenizer_type": "wordpiece",
            "tokenizer": {"vocab": str(out / "vocab.txt"), "lowercase": True,
                          "strip_accents": False, "clean_text": False},
            "vocab_path": str(out / "vocab.npy")}),
        projection=DictConfig({"num_hashes": 64, "feature_size": 32,
                               "window_size": 1}),
        max_seq_len=16)
    dm.setup()
    assert sum(dm.split_sizes.values()) == 40
    batch = next(iter(dm.test_batches()))
    assert batch["image"].shape == (4, 3, 160, 256)
    assert batch["text"].shape == (4, 16, 3 * 32)
    assert batch["label"].shape == (4, 23)

    # modality signal: the plot text names exactly the labeled genres
    # (label columns are FREQUENCY-ranked by build(), like the reference's
    # top-23 most_common ordering — replicate that mapping here)
    from collections import Counter, OrderedDict

    counts = Counter()
    for jf in sorted((out / "raw").glob("*.json")):
        counts.update(json.load(open(jf))["genres"])
    target_index = {g: i for i, g in
                    enumerate(OrderedDict(counts.most_common()))}
    for split in ("train", "dev", "test"):
        n = len(os.listdir(out / split / "labels"))
        for i in range(n):
            y = np.load(out / split / "labels" / f"label_{i}.npy")
            text = (out / split / "text" / f"text_{i}.txt").read_text()
            named = {target_index[w[:7]] for w in text.split()
                     if w.startswith("genre")}
            assert named == set(np.flatnonzero(y).tolist())
