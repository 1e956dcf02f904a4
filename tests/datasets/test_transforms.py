"""Host-side transforms: RuinModality (`/root/reference/datasets/transforms.py:6-42`
semantics), RandomApply gating, ToTensor/normalize parity helpers."""

import random

import numpy as np
import pytest

from m2mixer_tpu.datasets.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    RandomApply,
    RuinModality,
    image_to_chw,
    imagenet_normalize,
)


def _sample():
    rng = np.random.RandomState(0)
    return {"image": rng.rand(3, 16, 16).astype(np.float32),
            "text": "one two three four five six seven eight"}


def test_image_to_chw_and_normalize():
    hwc = (np.arange(2 * 3 * 3).reshape(2, 3, 3) % 255).astype(np.uint8)
    chw = image_to_chw(hwc)
    assert chw.shape == (3, 2, 3) and chw.dtype == np.float32
    assert chw.max() <= 1.0
    np.testing.assert_allclose(chw[1, 0, 0], hwc[0, 0, 1] / 255.0)
    norm = imagenet_normalize(chw)
    np.testing.assert_allclose(
        norm[0], (chw[0] - IMAGENET_MEAN[0]) / IMAGENET_STD[0], rtol=1e-6)
    # grayscale input grows a channel axis
    assert image_to_chw(np.zeros((4, 5), np.uint8)).shape == (1, 4, 5)


def test_ruin_image_blurs_only_image():
    random.seed(0)
    s = _sample()
    out = RuinModality("image", p=0.5)(s)
    assert out["text"] == s["text"]
    assert not np.array_equal(out["image"], s["image"])
    # blur preserves shape and roughly the mean (gaussian is normalized)
    assert out["image"].shape == s["image"].shape
    np.testing.assert_allclose(out["image"].mean(), s["image"].mean(), atol=0.05)
    # input sample dict is not mutated
    assert "one" in s["text"] and s["image"].flags.writeable


def test_ruin_text_drops_words_never_empties():
    random.seed(1)
    s = _sample()
    out = RuinModality("text", p=0.99)(s)
    assert np.array_equal(out["image"], s["image"])
    # near-certain drop still keeps at least one word (reference keeps the
    # sample usable)
    assert len(out["text"].split()) >= 1
    assert set(out["text"].split()) <= set(s["text"].split())
    random.seed(2)
    dropped = RuinModality("text", p=0.5)(s)["text"]
    assert len(dropped.split()) < len(s["text"].split())


def test_ruin_both_and_xor():
    random.seed(3)
    s = _sample()
    out = RuinModality("both", p=0.5)(s)
    assert not np.array_equal(out["image"], s["image"])
    assert len(out["text"].split()) <= len(s["text"].split())

    # xor ruins exactly one modality per call
    for seed in range(6):
        random.seed(seed)
        out = RuinModality("xor", p=0.5)(_sample())
        image_ruined = not np.array_equal(out["image"], _sample()["image"])
        text_ruined = out["text"] != _sample()["text"]
        assert image_ruined != text_ruined


def test_ruin_rejects_unknown_mode():
    with pytest.raises(AssertionError):
        RuinModality("audio")


def test_random_apply_gates_on_p():
    calls = []

    def fn(sample):
        calls.append(1)
        return dict(sample, text="ruined")

    always, never = RandomApply(fn, p=1.0), RandomApply(fn, p=0.0)
    s = _sample()
    assert always(s)["text"] == "ruined"
    assert never(s)["text"] == s["text"]
    assert len(calls) == 1
