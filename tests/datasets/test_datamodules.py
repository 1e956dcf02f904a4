"""Data-module behavior tests on synthetic data."""

import os
import pickle

import numpy as np

from m2mixer_tpu.datasets.avmnist import AVMnistDataModule
from m2mixer_tpu.datasets.mimic import MIMICDataModule


class TestAVMnist:
    def test_synthetic_batches(self):
        dm = AVMnistDataModule("unused", batch_size=16, synthetic=True,
                               synthetic_sizes=(48, 16, 16))
        dm.setup()
        batches = list(dm.train_batches())
        assert len(batches) == 3
        b = batches[0]
        assert b["image"].shape == (16, 1, 28, 28)
        assert b["audio"].shape == (16, 1, 112, 112)
        assert b["label"].shape == (16,)

    def test_npy_layout_roundtrip(self, tmp_path):
        # write the reference npy layout and load through the module
        rng = np.random.RandomState(0)
        os.makedirs(tmp_path / "image"); os.makedirs(tmp_path / "audio")
        np.save(tmp_path / "image" / "train_data.npy", rng.rand(64, 784))
        np.save(tmp_path / "audio" / "train_data.npy", rng.rand(64, 112, 112))
        np.save(tmp_path / "train_labels.npy", rng.randint(0, 10, 64))
        np.save(tmp_path / "image" / "test_data.npy", rng.rand(8, 784))
        np.save(tmp_path / "audio" / "test_data.npy", rng.rand(8, 112, 112))
        np.save(tmp_path / "test_labels.npy", rng.randint(0, 10, 8))
        dm = AVMnistDataModule(str(tmp_path), batch_size=32)
        dm.setup()
        b = next(iter(dm.train_batches()))
        assert b["image"].shape == (32, 1, 28, 28)
        assert b["audio"].shape == (32, 1, 112, 112)

    def test_p_muting_zeroes_one_modality(self):
        dm = AVMnistDataModule("unused", batch_size=32, synthetic=True,
                               synthetic_sizes=(64, 8, 8), p_muting=1.0)
        dm.setup()
        b = next(iter(dm.train_batches()))
        img_zero = (b["image"].reshape(32, -1).sum(1) == 0)
        aud_zero = (b["audio"].reshape(32, -1).sum(1) == 0)
        # with p=1 every sample has exactly one muted modality
        assert np.all(img_zero ^ aud_zero)


class TestMIMIC:
    def test_pickle_layout(self, tmp_path):
        rng = np.random.RandomState(0)
        n = 50
        adm_labels = np.zeros((n, 6))
        adm_labels[:10, 1] = 1  # class 1
        adm_labels[10:15, 3] = 2  # class 3
        data = {
            "ep_tdata": rng.randn(n, 24, 12),
            "adm_features_all": rng.randn(n, 5),
            "adm_labels_all": adm_labels,
            "y_icd9": rng.randint(0, 2, (n, 20)),
        }
        with open(tmp_path / "im.pk", "wb") as f:
            pickle.dump(data, f)
        dm = MIMICDataModule(str(tmp_path), task=-1, batch_size=8)
        dm.setup()
        # splits: val 10%, test 10%, train 80%
        assert dm.split_size("val") == 5
        assert dm.split_size("test") == 5
        assert dm.split_size("train") == 40
        b = next(iter(dm.train_batches()))
        assert b["static"].shape == (8, 5)
        assert b["time"].shape == (8, 24, 12)
        assert set(np.unique(b["label"])) <= {0, 1, 3}

    def test_synthetic(self):
        dm = MIMICDataModule.synthetic(n=100, batch_size=10)
        b = next(iter(dm.val_batches()))
        assert b["static"].shape == (10, 5)
