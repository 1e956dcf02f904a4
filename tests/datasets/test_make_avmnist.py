"""AV-MNIST offline builder: layout, leakage guard, loader round-trip."""

import numpy as np

from m2mixer_tpu.datasets.make_avmnist import (
    build_surrogate, load_mnist_idx, synth_spectrograms)


def test_surrogate_layout_and_loader_roundtrip(tmp_path):
    build_surrogate(str(tmp_path), n_train=120, n_test=60, seed=0)
    img = np.load(tmp_path / "image" / "train_data.npy")
    aud = np.load(tmp_path / "audio" / "train_data.npy")
    lab = np.load(tmp_path / "train_labels.npy")
    assert img.shape == (120, 784) and img.dtype == np.uint8
    assert aud.shape == (120, 112, 112)
    assert set(np.unique(lab)) <= set(range(10))

    from m2mixer_tpu.datasets import get_data_module

    dm = get_data_module("AVMnistDataModule")(data_dir=str(tmp_path),
                                              batch_size=16, num_workers=0)
    dm.setup()
    # proportional 55/60 split below 60k: 110 train / 10 val
    assert dm.split_size("train") == 110 and dm.split_size("val") == 10
    batch = next(iter(dm.train_batches()))
    assert batch["image"].shape == (16, 1, 28, 28)
    assert batch["audio"].shape == (16, 1, 112, 112)


def test_surrogate_class_structure_in_audio():
    """Same-class spectrograms are (much) more alike than cross-class ones
    on average — the audio modality carries label signal."""
    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(10), 8)
    specs = synth_spectrograms(labels, rng).astype(np.float32)
    mean_by_class = np.stack([specs[labels == k].mean(0) for k in range(10)])
    within = np.mean([
        np.abs(specs[i] - mean_by_class[labels[i]]).mean() for i in range(len(labels))
    ])
    cross = np.mean([
        np.abs(mean_by_class[a] - mean_by_class[b]).mean()
        for a in range(10) for b in range(10) if a != b
    ])
    assert cross > within * 0.3  # class structure exists (noisy, not trivial)


def test_idx_parser_roundtrip(tmp_path):
    """load_mnist_idx parses the standard idx format (incl. .gz)."""
    import gzip
    import struct

    data = np.arange(2 * 4 * 5, dtype=np.uint8).reshape(2, 4, 5)
    raw = struct.pack(">HBB", 0, 8, 3) + struct.pack(">III", 2, 4, 5) + data.tobytes()
    p = tmp_path / "imgs-idx3-ubyte"
    p.write_bytes(raw)
    np.testing.assert_array_equal(load_mnist_idx(str(p)), data)
    pz = tmp_path / "imgs-idx3-ubyte.gz"
    with gzip.open(pz, "wb") as f:
        f.write(raw)
    np.testing.assert_array_equal(load_mnist_idx(str(pz)), data)
