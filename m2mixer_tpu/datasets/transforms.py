"""Host-side sample transforms (numpy/PIL — never on device).

Re-expresses ``/root/reference/datasets/transforms.py`` plus the torchvision
composition bits the reference datamodules use (ToTensor, bicubic resize,
ImageNet normalize) as plain numpy/PIL functions.
"""

from __future__ import annotations

import random as _random
from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

__all__ = [
    "RuinModality",
    "image_to_chw",
    "load_image",
    "load_images",
    "imagenet_normalize",
]


def image_to_chw(pil_image) -> np.ndarray:
    """torchvision ToTensor parity: HWC uint8 -> CHW float32 in [0, 1]."""
    arr = np.asarray(pil_image, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr.transpose(2, 0, 1)


def imagenet_normalize(chw: np.ndarray) -> np.ndarray:
    return (chw - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]


def load_image(path: str, size: Optional[Tuple[int, int]] = None,
               normalize: bool = True) -> np.ndarray:
    """RGB load -> optional bicubic resize -> CHW float -> ImageNet norm.

    When a resize target is given, the decode+resample+normalize chain runs
    in the native C++ kernel (libjpeg/libpng + a Pillow-parity antialiased
    bicubic resampler, ``native/imageio.cpp``) and falls back to PIL for
    unsupported containers, decode errors, or when the library can't build.
    Values agree with the PIL path within resampler rounding (<~2/255 in
    pixel space). Opt out with ``M2MIXER_NATIVE_IMAGES=0``.
    """
    import os as _os

    if size is not None and _os.environ.get("M2MIXER_NATIVE_IMAGES", "1") != "0":
        from ..native import load_image_native

        out = load_image_native(path, size, normalize)
        if out is not None:
            return out
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.BICUBIC)  # PIL wants (W, H)
    chw = image_to_chw(img)
    return imagenet_normalize(chw) if normalize else chw


def load_images(paths, size: Tuple[int, int], normalize: bool = True,
                nthreads: Optional[int] = None) -> np.ndarray:
    """Batched image loading: the native threaded loader where available
    (one C++ thread pool decodes/resizes the whole batch), PIL for the
    remainder/fallback. Returns (N, 3, H, W) float32."""
    import os as _os

    paths = list(paths)
    if not paths:
        return np.zeros((0, 3, int(size[0]), int(size[1])), np.float32)
    if _os.environ.get("M2MIXER_NATIVE_IMAGES", "1") != "0":
        from ..native import load_images_native

        out, failed = load_images_native(paths, size, normalize, nthreads)
        if out is not None:
            for i in np.flatnonzero(failed):
                out[i] = load_image(paths[i], size, normalize)
            return out
    return np.stack([load_image(p, size, normalize) for p in paths])


class RuinModality:
    """Degrade a modality with probability ``p``: Gaussian-blur the image or
    drop random words (parity: `transforms.py:6-42`; modes image/text/both/
    xor). Operates on a sample dict with a CHW image array and raw text."""

    def __init__(self, modality: str = "xor", p: float = 0.5):
        assert modality in ("image", "text", "both", "xor")
        self.modality = modality
        self.p = p

    def blur_image(self, chw: np.ndarray) -> np.ndarray:
        from scipy.ndimage import gaussian_filter

        sigma = _random.uniform(0.1, 2.0)  # torchvision GaussianBlur sigma range
        return np.stack([gaussian_filter(c, sigma=sigma, truncate=1.0) for c in chw])

    def remove_text(self, text: str) -> str:
        words = text.split()
        kept = [w for w in words if _random.random() > self.p]
        if not kept:
            return words[0] if words else text
        return " ".join(kept)

    def __call__(self, sample: dict) -> dict:
        mode = self.modality
        if mode == "xor":
            mode = "image" if _random.random() > 0.5 else "text"
            return self._apply(sample, mode)
        if mode == "both":
            sample = self._apply(sample, "image")
            return self._apply(sample, "text")
        return self._apply(sample, mode)

    def _apply(self, sample, which):
        sample = dict(sample)
        if which == "image":
            sample["image"] = self.blur_image(sample["image"])
        else:
            sample["text"] = self.remove_text(sample["text"])
        return sample


class RandomApply:
    """torchvision RandomApply parity for sample-dict transforms."""

    def __init__(self, fn, p: float = 0.5):
        self.fn = fn
        self.p = p

    def __call__(self, sample):
        if _random.random() < self.p:
            return self.fn(sample)
        return sample
