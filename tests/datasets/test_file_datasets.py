"""File-layout dataset tests with tiny generated corpora."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from m2mixer_tpu.config import DictConfig


@pytest.fixture(scope="module")
def vocab(tmp_path_factory):
    from m2mixer_tpu.utils.projection import build_vocab_cache

    tmp = tmp_path_factory.mktemp("vocab")
    vocab_file = tmp / "vocab.txt"
    vocab_file.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "the", "movie", "was", "great", "bad", "meme", "funny", "none"]))
    cache = tmp / "vocab.npy"
    build_vocab_cache(str(vocab_file), str(cache))
    return DictConfig({
        "tokenizer_type": "wordpiece",
        "tokenizer": {"vocab": str(vocab_file), "lowercase": True,
                      "strip_accents": False, "clean_text": False},
        "vocab_path": str(cache),
    })


PROJ = DictConfig({"num_hashes": 64, "feature_size": 32, "window_size": 1})


def _img(path, size=(40, 30)):
    Image.fromarray(np.random.RandomState(0).randint(0, 255, (size[1], size[0], 3),
                                                     dtype=np.uint8)).save(path)


def test_mmimdb_file_layout(tmp_path, vocab):
    from m2mixer_tpu.datasets.mmimdb import MMIMDBDataModule

    for split in ("train", "dev", "test"):
        for sub in ("images", "labels", "text"):
            os.makedirs(tmp_path / split / sub)
        for i in range(4):
            _img(tmp_path / split / "images" / f"image_{i}.jpeg")
            np.save(tmp_path / split / "labels" / f"label_{i}.npy",
                    np.eye(23, dtype=np.int64)[i % 23])
            (tmp_path / split / "text" / f"text_{i}.txt").write_text("the movie was great")

    dm = MMIMDBDataModule(str(tmp_path), batch_size=2, vocab=vocab,
                          projection=PROJ, max_seq_len=8)
    dm.setup()
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (2, 3, 30, 40)
    assert batch["text"].shape == (2, 8, 3 * 32)
    assert batch["label"].shape == (2, 23)


def test_mmhs150_file_layout(tmp_path, vocab):
    from m2mixer_tpu.datasets.mmhs150 import MMHS150DataModule

    os.makedirs(tmp_path / "splits")
    os.makedirs(tmp_path / "img_resized")
    os.makedirs(tmp_path / "img_txt")
    ids = [f"10{i}" for i in range(4)]
    gt = {}
    for i, sid in enumerate(ids):
        _img(tmp_path / "img_resized" / f"{sid}.jpg")
        gt[sid] = {"tweet_text": "funny meme was bad", "labels": [1, 1, 0]}
        if i % 2 == 0:
            with open(tmp_path / "img_txt" / f"{sid}.json", "w") as f:
                json.dump({"img_text": "the meme"}, f)
    for split in ("train_ids", "test_ids", "val_ids"):
        (tmp_path / "splits" / f"{split}.txt").write_text("\n".join(ids))
    with open(tmp_path / "MMHS150K_GT.json", "w") as f:
        json.dump(gt, f)

    dm = MMHS150DataModule(str(tmp_path), batch_size=2, vocab=vocab,
                           projection=PROJ, max_seq_len=8)
    dm.setup()
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (2, 3, 256, 256)
    assert batch["text"].shape == (2, 8, 96)
    assert batch["ocr"].shape == (2, 8, 96)
    assert set(batch["label"]) <= {0, 1}
    # 2 annotators positive -> label 1 (majority rule)
    assert batch["label"][0] == 1


def test_multioff_csv_layout(tmp_path, vocab):
    import pandas as pd

    from m2mixer_tpu.datasets.multioff import MultiOFFDataModule

    os.makedirs(tmp_path / "Split Dataset")
    os.makedirs(tmp_path / "Labelled Images")
    rows = []
    for i in range(4):
        name = f"m{i}.png"
        _img(tmp_path / "Labelled Images" / name)
        rows.append({"image_name": name, "sentence": "a funny meme",
                     "label": "offensive" if i % 2 else "Non-offensiv"})
    for csv in ("Training_meme_dataset.csv", "Testing_meme_dataset.csv",
                "Validation_meme_dataset.csv"):
        pd.DataFrame(rows).to_csv(tmp_path / "Split Dataset" / csv, index=False)

    dm = MultiOFFDataModule(str(tmp_path), batch_size=2, vocab=vocab,
                            projection=PROJ, max_seq_len=8)
    dm.setup()
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (2, 3, 512, 512)
    assert set(np.asarray(batch["label"])) <= {0, 1}


def test_pnlp_imdb_layout(tmp_path, vocab):
    from m2mixer_tpu.datasets.pnlp import PnlpMixerDataModule

    for split in ("train", "test"):
        for label in ("pos", "neg"):
            d = tmp_path / split / label
            os.makedirs(d)
            for i in range(2):
                (d / f"{i}.txt").write_text("the movie was great" if label == "pos"
                                            else "the movie was bad")

    train_cfg = DictConfig({"dataset_type": "imdb", "dataset_path": str(tmp_path),
                            "labels": ["neg", "pos"], "max_seq_len": 8,
                            "train_batch_size": 2, "test_batch_size": 2,
                            "num_workers": 0})
    dm = PnlpMixerDataModule(vocab_cfg=vocab, train_cfg=train_cfg, proj_cfg=PROJ)
    dm.setup()
    batch = next(iter(dm.train_batches()))
    assert batch["text"].shape == (2, 8, 96)
    assert set(np.asarray(batch["label"])) <= {0, 1}


def test_grain_worker_loading(tmp_path, vocab):
    """num_workers>0 routes through Grain with identical batch structure."""
    from m2mixer_tpu.datasets.pnlp import PnlpMixerDataModule

    for split in ("train", "test"):
        for label in ("pos", "neg"):
            d = tmp_path / split / label
            os.makedirs(d)
            for i in range(3):
                (d / f"{i}.txt").write_text("a great movie")

    train_cfg = DictConfig({"dataset_type": "imdb", "dataset_path": str(tmp_path),
                            "labels": ["neg", "pos"], "max_seq_len": 8,
                            "train_batch_size": 2, "test_batch_size": 2,
                            "num_workers": 1})
    dm = PnlpMixerDataModule(vocab_cfg=vocab, train_cfg=train_cfg, proj_cfg=PROJ)
    dm.setup()
    assert dm.num_workers == 1
    batches = list(dm.train_batches())
    assert len(batches) == 3  # 6 samples / bs 2
    assert batches[0]["text"].shape == (2, 8, 96)


class TestMosi:
    """CMU-MOSI pickle stack with a tiny synthetic fold fixture
    (reference layout: `/root/reference/datasets/mosi_dataset.py:98-266`)."""

    def _pickle(self, tmp_path):
        import pickle

        rng = np.random.RandomState(0)

        def fold(n):
            vision = rng.rand(n, 60, 35).astype(np.float32)
            audio = rng.rand(n, 60, 74).astype(np.float32)
            vision[:, :3] = 0.0  # leading all-zero steps get trimmed
            audio[0, :, :] = np.where(audio[0] < 0.01, -np.inf, audio[0])
            text = ["a great movie"] * n
            text[-1] = ""  # dropped by drop_entry
            labels = rng.randn(n, 1).astype(np.float32)
            return {"vision": vision, "audio": audio, "text": text, "labels": labels}

        data = {"train": fold(6), "valid": fold(4), "test": fold(4)}
        path = tmp_path / "mosi_raw.pkl"
        with open(path, "wb") as f:
            pickle.dump(data, f)
        return str(path)

    def _dm(self, tmp_path, vocab, **kwargs):
        from m2mixer_tpu.datasets.mosi import CMUMosiDataModule

        train_cfg = DictConfig({"max_seq_len": 8, "task": "classification",
                                "z_norm": False})
        return CMUMosiDataModule(
            data_path=self._pickle(tmp_path), batch_size=2, num_workers=0,
            vocab_cfg=vocab, train_cfg=train_cfg, proj_cfg=PROJ, **kwargs)

    def test_folds_and_shapes(self, tmp_path, vocab):
        dm = self._dm(tmp_path, vocab)
        dm.setup()
        # one empty-text sample dropped per fold
        assert dm.split_sizes["train"] == 5
        assert dm.split_sizes["dev"] == 3 and dm.split_sizes["test"] == 3
        batch = next(iter(dm.train_batches()))
        assert batch["vision"].shape == (2, 50, 35)
        assert batch["audio"].shape == (2, 50, 70)  # COVAREP 70-dim truncation
        assert batch["text"].shape == (2, 8, 96)
        assert np.isfinite(batch["audio"]).all()  # -inf scrubbed to 0
        assert set(np.asarray(batch["label"]).tolist()) <= {0, 1}

    def test_train_only_fold_bug_opt_in(self, tmp_path, vocab):
        dm = self._dm(tmp_path, vocab, replicate_train_only_folds=True)
        dm.setup()
        # reference bug (`mosi_dataset.py:125-138`): all folds = train
        assert dm.split_sizes["dev"] == dm.split_sizes["train"] == dm.split_sizes["test"]

    def test_download_mosi_gated(self):
        from m2mixer_tpu.datasets.mosi import download_mosi

        with pytest.raises(ImportError, match="CMU-MultimodalSDK"):
            download_mosi("/tmp/nowhere")

    def test_prepare_mosi_pickle(self, tmp_path, vocab):
        """The h5->pkl conversion (`prepare_mosi_pickle`, analog of
        `/root/reference/datasets/mosi_preprocessing.py:48-56,152-179`):
        a synthetic aligned-h5 in the SDK export layout converts to the
        ``mosi_raw.pkl`` dict-of-folds and loads through the datamodule
        end to end (VERDICT r3 #8)."""
        import pickle

        import h5py

        from m2mixer_tpu.datasets.mosi import CMUMosiDataModule, prepare_mosi_pickle

        rng = np.random.RandomState(3)
        h5_path = str(tmp_path / "aligned.h5")
        with h5py.File(h5_path, "w") as f:
            for fold, n in (("train", 6), ("valid", 4), ("test", 4)):
                grp = f.create_group(fold)
                grp.create_dataset("vision", data=rng.rand(n, 60, 35).astype(np.float32))
                audio = rng.rand(n, 60, 74).astype(np.float32)
                audio[0, 0, 0] = -np.inf  # COVAREP silence marker
                grp.create_dataset("audio", data=audio)
                grp.create_dataset("text", data=np.array(
                    [b"a great movie"] * (n - 1) + [b""], dtype=object),
                    dtype=h5py.string_dtype())
                grp.create_dataset("labels", data=rng.randn(n, 1).astype(np.float32))

        pkl = str(tmp_path / "mosi_raw.pkl")
        prepare_mosi_pickle(h5_path, pkl)

        # the converted layout is the reference's dict-of-folds
        with open(pkl, "rb") as f:
            folds = pickle.load(f)
        assert set(folds) == {"train", "valid", "test"}
        assert folds["train"]["vision"].shape == (6, 60, 35)
        assert folds["train"]["text"][0] == "a great movie"  # bytes decoded

        # and it loads through the real datamodule (drop_entry removes the
        # empty-text row, -inf audio scrubbed, COVAREP 70-dim truncation)
        train_cfg = DictConfig({"max_seq_len": 8, "task": "classification",
                                "z_norm": False})
        dm = CMUMosiDataModule(data_path=pkl, batch_size=2, num_workers=0,
                               vocab_cfg=vocab, train_cfg=train_cfg,
                               proj_cfg=PROJ)
        dm.setup()
        assert dm.split_sizes["train"] == 5
        batch = next(iter(dm.train_batches()))
        assert batch["vision"].shape == (2, 50, 35)
        assert batch["audio"].shape == (2, 50, 70)
        assert np.isfinite(batch["audio"]).all()


def test_make_mmimdb_builder(tmp_path):
    """Offline MM-IMDB builder on a tiny raw corpus: per-sample file layout,
    stratified disjoint splits, text normalization."""
    import json

    from m2mixer_tpu.datasets.make_mmimdb import build, normalize_text

    raw = tmp_path / "raw"
    os.makedirs(raw)
    genres = [["Drama"], ["Comedy"], ["Drama", "Comedy"], ["Drama"],
              ["Comedy"], ["Drama"], ["Comedy", "Drama"], ["Drama"]]
    for i, g in enumerate(genres):
        with open(raw / f"{i}.json", "w") as f:
            json.dump({"genres": g,
                       "plot": [f"A {'great ' * (i + 1)}movie, #{i}!"]}, f)
        _img(str(raw / f"{i}.jpeg"), size=(64, 80))
    # one broken entry (no image) is skipped
    with open(raw / "broken.json", "w") as f:
        json.dump({"genres": ["Drama"], "plot": ["x"]}, f)

    out = tmp_path / "out"
    build(str(raw), str(out), img_size=(32, 20), n_classes=2)

    sizes = {}
    all_texts = set()
    for split in ("train", "dev", "test"):
        labels = sorted(os.listdir(out / split / "labels"))
        images = sorted(os.listdir(out / split / "images"))
        texts = sorted(os.listdir(out / split / "text"))
        assert len(labels) == len(images) == len(texts)
        sizes[split] = len(labels)
        lab = np.load(out / split / "labels" / "label_0.npy")
        assert lab.shape == (2,) and set(lab.tolist()) <= {0, 1}
        for t in texts:
            all_texts.add((out / split / "text" / t).read_text())
    assert sum(sizes.values()) == 8  # every valid movie lands in exactly one split
    assert sizes["train"] > 0 and sizes["test"] > 0
    # punctuation stripped, lowercased
    assert normalize_text("Hello, World! <br />#3") == ["hello", "world", "3"]
    assert all("#" not in t and "," not in t for t in all_texts)


def test_imagenet_datamodule_folder_layout(tmp_path):
    from m2mixer_tpu.datasets.imagenet import ImagenetDataModule

    for split in ("train", "val"):
        for cls in ("n01", "n02"):
            d = tmp_path / split / cls
            os.makedirs(d)
            for i in range(3):
                _img(str(d / f"{i}.jpeg"), size=(80, 60))

    dm = ImagenetDataModule(data_dir=str(tmp_path), batch_size=4,
                            num_workers=0, image_size=32)
    dm.setup()
    assert dm.split_sizes["train"] == 6 and dm.split_sizes["test"] == 6
    assert dm.class_to_idx == {"n01": 0, "n02": 1}
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (4, 3, 32, 32)
    assert set(np.asarray(batch["label"]).tolist()) <= {0, 1}
    # eval path: deterministic center-crop pipeline
    test_batch = next(iter(dm.test_batches()))
    assert test_batch["image"].shape == (4, 3, 32, 32)
    assert np.isfinite(test_batch["image"]).all()


def test_memotion_file_layout(tmp_path, vocab):
    """Memotion layout: labels.csv (NaN rows dropped) + shuffled.npy
    permutation -> 70/20/10 train/test/dev, task column to categorical
    codes, 512x512 images (`/root/reference/datasets/memotion.py:75-156`)."""
    from m2mixer_tpu.datasets.memotion import MemotionDataModule

    os.makedirs(tmp_path / "images")
    rows = ["image_name,text_corrected,humour,sarcasm,offensive,motivational,overall_sentiment"]
    levels = ["funny", "very_funny", "not_funny"]
    for i in range(10):
        _img(tmp_path / "images" / f"m_{i}.jpg", size=(20, 20))
        rows.append(f"m_{i}.jpg,a funny meme,{levels[i % 3]},general,not_offensive,"
                    "not_motivational,positive")
    # NaN row (empty text_corrected) must be dropped before the split
    _img(tmp_path / "images" / "m_nan.jpg", size=(20, 20))
    rows.append("m_nan.jpg,,funny,general,not_offensive,not_motivational,positive")
    (tmp_path / "labels.csv").write_text("\n".join(rows) + "\n")
    np.save(tmp_path / "shuffled.npy",
            np.random.RandomState(3).permutation(10))

    dm = MemotionDataModule(str(tmp_path), batch_size=2, vocab=vocab,
                            projection=PROJ, max_seq_len=8, task_name="humour")
    dm.setup()
    # 70/20/10 of the 10 non-NaN rows
    assert dm.split_sizes["train"] == 7
    assert dm.split_sizes["test"] == 2
    assert dm.split_sizes["dev"] == 1
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (2, 3, 512, 512)
    assert batch["text"].shape == (2, 8, 3 * 32)
    # categorical codes span the 3 humour levels
    all_labels = [dm.load_sample("train", i)["label"] for i in range(7)]
    assert set(int(l) for l in all_labels) <= {0, 1, 2}
    assert batch["textlen"][0] == 3
