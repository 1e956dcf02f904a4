"""Offline AV-MNIST builder: writes the npy layout `datasets/avmnist.py` loads.

The real AV-MNIST (MultiBench) pairs MNIST digit images with spectrograms of
Free-Spoken-Digit recordings (plus noise), stored as
``{image,audio}/{train,test}_data.npy`` + ``{train,test}_labels.npy``
(`/root/reference/datasets/avmnist.py:104-114`; the reference assumes the
dataset already exists on disk and ships no builder). Two paths:

1. **Real data** (``--mnist-dir``): parses standard MNIST idx files
   (train-images-idx3-ubyte[.gz] etc. — download from
   https://yann.lecun.com/exdb/mnist/ or a mirror, or fetch the prebuilt
   AV-MNIST from MultiBench: https://github.com/pliang279/MultiBench,
   `avmnist.tar.gz`) and pairs each image with an audio spectrogram: either
   real ones via ``--audio-npy`` (class-indexed array) or the synthetic
   generator below.

2. **Surrogate** (``--surrogate``): fully offline reconstruction for
   environments without network egress — images are sklearn's bundled
   8x8 digits upsampled to 28x28 with shift/noise augmentation, audio is a
   class-structured synthetic "spoken digit" spectrogram (per-class harmonic
   stacks with random phase/envelope/noise). Same shapes, dtypes, file
   layout, and class balance as the real set; numbers measured on it are
   comparable across frameworks run on the same surrogate, NOT to published
   AV-MNIST results.
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np

__all__ = ["build_surrogate", "build_from_mnist", "load_mnist_idx",
           "synth_spectrograms"]


def load_mnist_idx(path: str) -> np.ndarray:
    """Parse an MNIST idx file (optionally .gz)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        if zero != 0:
            raise ValueError(f"{path}: not an idx file")
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def synth_spectrograms(labels: np.ndarray, rng: np.random.RandomState,
                       size: int = 112) -> np.ndarray:
    """Class-structured surrogate spectrograms, shape (N, size, size).

    Each class gets a characteristic fundamental row and harmonic spacing;
    samples vary in onset, duration, envelope, vibrato, and noise — enough
    intra-class variation that the audio branch must learn, not memorize."""
    n = len(labels)
    t = np.linspace(0.0, 1.0, size, dtype=np.float32)[None, None, :]  # (1,1,T)
    rows = np.arange(size, dtype=np.float32)[None, :, None]  # (1,F,1)

    # deliberately confusable class structure: fundamentals only 5 rows
    # apart with per-sample frequency jitter of comparable scale, heavy
    # noise, and random amplitude — the audio branch has to integrate the
    # harmonic pattern over time, not read off one bright row
    f0 = (12.0 + labels.astype(np.float32) * 5.0
          + rng.randn(n).astype(np.float32) * 1.5)
    spacing = 9.0 + (labels.astype(np.float32) % 3) * 3.0
    out = rng.rand(n, size, size).astype(np.float32) * 60.0  # noise floor
    onset = rng.uniform(0.05, 0.3, n).astype(np.float32)
    dur = rng.uniform(0.35, 0.65, n).astype(np.float32)
    vib_a = rng.uniform(0.5, 3.0, n).astype(np.float32)
    vib_p = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    gain = rng.uniform(0.5, 1.0, n).astype(np.float32)

    env = np.clip((t - onset[:, None, None]) / 0.05, 0, 1) * \
        np.clip((onset[:, None, None] + dur[:, None, None] - t) / 0.1, 0, 1)
    vib = vib_a[:, None, None] * np.sin(2 * np.pi * 3 * t + vib_p[:, None, None])
    for h in range(3):  # fundamental + 2 harmonics
        centre = (f0 + h * spacing)[:, None, None] + vib
        amp = 140.0 * gain[:, None, None] / (1 + h)
        out += amp * env * np.exp(-0.5 * ((rows - centre) / 2.5) ** 2)
    return np.clip(out, 0, 255).astype(np.uint8)


def _write(out_dir: str, stage: str, images: np.ndarray, audio: np.ndarray,
           labels: np.ndarray) -> None:
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "audio"), exist_ok=True)
    np.save(os.path.join(out_dir, "image", f"{stage}_data.npy"),
            images.reshape(len(images), -1))
    np.save(os.path.join(out_dir, "audio", f"{stage}_data.npy"), audio)
    np.save(os.path.join(out_dir, f"{stage}_labels.npy"), labels.astype(np.int64))


def build_from_mnist(mnist_dir: str, out_dir: str, audio_npy: str | None = None,
                     seed: int = 0) -> None:
    """Real-MNIST path: idx files in ``mnist_dir``; audio from ``audio_npy``
    (dict-like npz of per-class spectrogram pools) or the synthetic
    generator."""
    rng = np.random.RandomState(seed)

    def find(stem):
        for suffix in ("", ".gz"):
            p = os.path.join(mnist_dir, stem + suffix)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"{stem}[.gz] not in {mnist_dir}")

    for stage, img_stem, lab_stem in (
            ("train", "train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
            ("test", "t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte")):
        images = load_mnist_idx(find(img_stem))
        labels = load_mnist_idx(find(lab_stem))
        if audio_npy:
            pools = np.load(audio_npy)
            audio = np.stack([
                pools[str(l)][rng.randint(len(pools[str(l)]))] for l in labels
            ])
        else:
            audio = synth_spectrograms(labels, rng)
        _write(out_dir, stage, images, audio, labels)


def build_surrogate(out_dir: str, n_train: int = 12000, n_test: int = 2000,
                    seed: int = 0) -> None:
    """Fully-offline surrogate: sklearn digits -> 28x28 with augmentation."""
    from sklearn.datasets import load_digits

    rng = np.random.RandomState(seed)
    base_img, base_lab = load_digits(return_X_y=True)
    base_img = base_img.reshape(-1, 8, 8) / 16.0  # (1797, 8, 8) in [0,1]

    # DISJOINT base-image pools per split: augmentations of a base digit
    # never appear in both train and test (no identity leakage)
    perm = rng.permutation(len(base_lab))
    n_test_base = len(perm) // 6
    pools = {"test": perm[:n_test_base], "train": perm[n_test_base:]}

    def sample(n, pool):
        idx = pool[rng.randint(0, len(pool), n)]
        small = base_img[idx]
        # upsample 8->28 (nearest 4x = 32, center-crop 28) + jitter + noise
        big = np.kron(small, np.ones((1, 4, 4), np.float32))[:, 2:30, 2:30]
        out = np.zeros((n, 28, 28), np.float32)
        for i in range(n):
            dx, dy = rng.randint(-2, 3, 2)
            src = np.roll(np.roll(big[i], dx, axis=0), dy, axis=1)
            out[i] = src
        out = np.clip(out * 255.0 + rng.randn(n, 28, 28) * 8.0, 0, 255)
        return out.astype(np.uint8), base_lab[idx]

    for stage, n in (("train", n_train), ("test", n_test)):
        images, labels = sample(n, pools[stage])
        audio = synth_spectrograms(labels, rng)
        _write(out_dir, stage, images, audio, labels)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--surrogate", action="store_true")
    ap.add_argument("--mnist-dir")
    ap.add_argument("--audio-npy")
    ap.add_argument("--n-train", type=int, default=12000)
    ap.add_argument("--n-test", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.surrogate:
        build_surrogate(args.out, args.n_train, args.n_test, args.seed)
    elif args.mnist_dir:
        build_from_mnist(args.mnist_dir, args.out, args.audio_npy, args.seed)
    else:
        ap.error("pass --surrogate or --mnist-dir")
    print(f"wrote AV-MNIST layout to {args.out}")
