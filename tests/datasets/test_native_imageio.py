"""Native image decode/resize kernel (native/imageio.cpp).

Parity contract: the C++ loader (libjpeg/libpng decode + Pillow-parity
antialiased bicubic + ToTensor + ImageNet normalize) must agree with the
PIL path within resampler rounding — Pillow rounds each resample pass back
to uint8 while the kernel keeps a float intermediate, so worst-case noise
images differ by a few /255 at ringing pixels and ~zero on average.
"""

import os

import numpy as np
import pytest
from PIL import Image

from m2mixer_tpu.datasets.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    image_to_chw,
    imagenet_normalize,
    load_image,
    load_images,
)
from m2mixer_tpu.native import load_image_native, load_images_native, load_imageio

pytestmark = pytest.mark.skipif(
    load_imageio() is None,
    reason="native imageio library unavailable (no g++/libjpeg/libpng)",
)


def _pil_load(path, size, normalize=True):
    img = Image.open(path).convert("RGB")
    img = img.resize((size[1], size[0]), Image.BICUBIC)
    chw = image_to_chw(img)
    return imagenet_normalize(chw) if normalize else chw


def _pixel_diff(nat, ref):
    """abs diff mapped back to 0..255 pixel units (undo the normalize)."""
    return np.abs(nat - ref) * IMAGENET_STD[:, None, None] * 255.0


@pytest.mark.parametrize("fmt", ["jpeg", "png"])
def test_native_matches_pil_within_rounding(tmp_path, fmt):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (37, 53, 3), np.uint8)
    p = str(tmp_path / f"img.{fmt}")
    Image.fromarray(arr).save(p, quality=95) if fmt == "jpeg" else Image.fromarray(arr).save(p)
    nat = load_image_native(p, (24, 31), True)
    assert nat is not None and nat.shape == (3, 24, 31)
    diff = _pixel_diff(nat, _pil_load(p, (24, 31)))
    assert diff.max() <= 8.0  # ringing pixels on worst-case noise
    assert diff.mean() <= 1.0


@pytest.mark.parametrize("mode,fname", [("L", "gray.jpg"), ("P", "pal.png"), ("RGBA", "a.png")])
def test_native_handles_nonrgb_sources(tmp_path, mode, fname):
    rng = np.random.default_rng(1)
    base = Image.fromarray(rng.integers(0, 256, (20, 28, 3), np.uint8)).convert(mode)
    p = str(tmp_path / fname)
    base.save(p)
    nat = load_image_native(p, (16, 16), True)
    assert nat is not None
    diff = _pixel_diff(nat, _pil_load(p, (16, 16)))
    # palette-quantized noise has hard edges: Pillow clamps each resample
    # pass to uint8 where the kernel keeps floats, so ringing pixels drift
    # a little further; the mean stays ~zero
    assert diff.max() <= 12.0
    assert diff.mean() <= 1.0


def test_transparent_png_keeps_raw_rgb_like_pil(tmp_path):
    """PIL's convert("RGB") DROPS alpha keeping the raw color channels;
    libpng's PNG_FORMAT_RGB would composite transparent pixels to black.
    The kernel must match PIL: fully transparent pixels keep their RGB."""
    rgba = np.zeros((10, 12, 4), np.uint8)
    rgba[..., 0], rgba[..., 1], rgba[..., 2] = 255, 128, 64
    rgba[..., 3] = 0  # fully transparent everywhere
    p = str(tmp_path / "transparent.png")
    Image.fromarray(rgba, "RGBA").save(p)
    nat = load_image_native(p, (10, 12), normalize=False)
    assert nat is not None
    expected = np.asarray([255, 128, 64], np.float32) / 255.0
    np.testing.assert_allclose(nat[:, 0, 0], expected, atol=1e-6)
    ref = _pil_load(p, (10, 12), normalize=False)
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_zero_target_dims_fail_cleanly(tmp_path):
    """A degenerate resize target must return failure (PIL fallback), not
    write the file's own dimensions into an undersized buffer."""
    rng = np.random.default_rng(5)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(rng.integers(0, 256, (30, 30, 3), np.uint8)).save(p)
    assert load_image_native(p, (0, 16)) is None
    assert load_image_native(p, (16, 0)) is None


def test_batch_matches_per_image_and_flags_failures(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (30, 30, 3), np.uint8)).save(p)
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))
    out, failed = load_images_native(paths, (16, 16), nthreads=2)
    assert out.shape == (5, 3, 16, 16)
    assert failed.tolist() == [False] * 4 + [True]
    for i in range(4):
        np.testing.assert_array_equal(out[i], load_image_native(paths[i], (16, 16)))


def test_transforms_batch_falls_back_per_failed_image(tmp_path):
    """load_images must transparently PIL-load entries the kernel can't
    decode (unsupported container), so mixed batches always come back full."""
    rng = np.random.default_rng(3)
    pj = str(tmp_path / "ok.jpg")
    Image.fromarray(rng.integers(0, 256, (30, 30, 3), np.uint8)).save(pj)
    pg = str(tmp_path / "legacy.gif")  # not handled natively -> PIL path
    Image.fromarray(rng.integers(0, 256, (30, 30, 3), np.uint8)).save(pg)
    out = load_images([pj, pg], (16, 16))
    assert out.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(out[1], _pil_load(pg, (16, 16)), atol=1e-6)


def test_env_opt_out_restores_exact_pil(tmp_path, monkeypatch):
    rng = np.random.default_rng(4)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(rng.integers(0, 256, (30, 30, 3), np.uint8)).save(p)
    monkeypatch.setenv("M2MIXER_NATIVE_IMAGES", "0")
    np.testing.assert_array_equal(load_image(p, (16, 16)), _pil_load(p, (16, 16)))
