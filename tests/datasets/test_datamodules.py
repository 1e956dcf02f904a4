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


class TestAVMnistMmap:
    @staticmethod
    def _write(tmp_path, n=24, m=12, audio_dtype=np.float32):
        rng = np.random.RandomState(0)
        (tmp_path / "image").mkdir()
        (tmp_path / "audio").mkdir()
        for stage, k in (("train", n), ("test", m)):
            np.save(tmp_path / "image" / f"{stage}_data.npy",
                    rng.rand(k, 784).astype(np.float32))
            np.save(tmp_path / "audio" / f"{stage}_data.npy",
                    rng.rand(k, 112, 112).astype(audio_dtype))
            np.save(tmp_path / f"{stage}_labels.npy",
                    rng.randint(0, 10, (k,)).astype(np.int64))

    def test_mmap_splits_are_views_and_equal(self, tmp_path):
        """dataset.params.mmap: float32 npys stay memory-mapped (splits are
        views, no host-RAM materialization) and every batch matches the
        in-RAM loader exactly."""
        self._write(tmp_path)
        mapped = AVMnistDataModule(str(tmp_path), batch_size=4, mmap=True)
        mapped.setup()
        plain = AVMnistDataModule(str(tmp_path), batch_size=4)
        plain.setup()
        assert isinstance(mapped.splits["train"]["image"], np.memmap)
        assert isinstance(mapped.splits["val"]["audio"], np.memmap)
        for stage in ("train", "val", "test"):
            for k in ("image", "audio", "label"):
                np.testing.assert_array_equal(
                    np.asarray(mapped.splits[stage][k]), plain.splits[stage][k])

    def test_mmap_materializes_on_dtype_mismatch(self, tmp_path, capsys):
        """uint8-stored files can't stay mapped (the model wants f32): the
        loader materializes with a note instead of serving wrong dtypes."""
        self._write(tmp_path, audio_dtype=np.uint8)
        dm = AVMnistDataModule(str(tmp_path), batch_size=4, mmap=True)
        dm.setup()
        assert not isinstance(dm.splits["train"]["audio"], np.memmap)
        assert dm.splits["train"]["audio"].dtype == np.float32
        assert "materializing" in capsys.readouterr().out

    def test_mmap_streams_through_trainer(self, tmp_path):
        """The full hierarchy: disk -> mmap host pages -> pool_chunk_mb HBM
        chunks; metrics match the in-RAM hoisted run."""
        from m2mixer_tpu.config import loads
        from m2mixer_tpu.models import get_model
        from m2mixer_tpu.parallel import MeshConfig
        from m2mixer_tpu.training import Trainer

        self._write(tmp_path, n=32, m=8)
        cfg_t = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 1
  pool_chunk_mb: {chunk}
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 5
  monitor: val_loss
  monitor_mode: min
dataset: {{type: AVMnistDataModule, params: {{}}}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""
        results = {}
        for name, (chunk, mm) in (("ram", (0, False)), ("mmap", (0.5, True))):
            cfg = loads(cfg_t.format(tmp=tmp_path / name, chunk=chunk))
            task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
            dm = AVMnistDataModule(str(tmp_path), batch_size=4, mmap=mm)
            trainer = Trainer(cfg.train, name=f"mm_{name}", full_cfg=cfg,
                              mesh_config=MeshConfig(data=1, model=1))
            trainer.fit(task, dm)
            if mm:
                assert trainer._stream_chunk_rows("train", 4)  # streamed
                assert isinstance(dm.splits["train"]["image"], np.memmap)
            results[name] = trainer.callback_metrics
        for key in ("train_loss", "val_loss"):
            np.testing.assert_allclose(results["mmap"][key], results["ram"][key],
                                       rtol=2e-5, atol=2e-6)
