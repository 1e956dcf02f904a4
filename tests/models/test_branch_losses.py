"""Family-specific training-loss math, pinned against torch.

Covers the three families the round-2 review flagged as never asserted:
MMHS150's per-sample ``use_features``/``use_features_ocr`` masked text
losses and 4-way ``ow=(1-w_f)/3`` weighting
(`/root/reference/models/mmhs150.py:100-107`), MultiOFF's unweighted BCE
plain-sum combine (`/root/reference/models/multioff.py:112-123`), and
Memotion's CE plain-sum combine (`/root/reference/models/memotion.py:102-113`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from m2mixer_tpu.config import DictConfig


def _mmhs_task(fusion_loss_weight=0.4):
    from m2mixer_tpu.models.mmhs150 import MMHS150MultiLoss

    cfg = DictConfig({
        "dropout": 0.0,
        "fusion_loss_weight": fusion_loss_weight,
        "modalities": {
            "classification": {"num_classes": 1,
                               "classifier": "StandardClassifier",
                               "input_shape": [4, 12, 16]},
            "image": {"block_type": "MLPMixer", "in_channels": 3,
                      "hidden_dim": 16, "patch_size": 16,
                      "image_size": [32, 32], "token_dim": 8,
                      "channel_dim": 16, "num_mixers": 1},
            "text": {"block_type": "PNLPMixer",
                     "bottleneck_features_size": 24,
                     "bottleneck_window_size": 1, "hidden_dim": 16,
                     "max_seq_len": 4, "mlp_hidden_dim": 8, "num_mixers": 1},
            "multimodal": {"block_type": "FusionMixer",
                           "fusion_function": "ConcatFusion",
                           "hidden_dim": 16, "token_dim": 8,
                           "channel_dim": 16, "num_mixers": 1},
        },
    })
    opt = DictConfig({"lr": 1e-3, "weight_decay": 0.0})
    return MMHS150MultiLoss(cfg, opt)


def _mmhs_outputs(rng, b=4):
    return {
        "branch_logits": (jnp.asarray(rng.randn(b, 1), jnp.float32),
                          jnp.asarray(rng.randn(b, 1), jnp.float32),
                          jnp.asarray(rng.randn(b, 1), jnp.float32)),
        "logits": jnp.asarray(rng.randn(b, 1), jnp.float32),
    }


def _mmhs_batch(rng, b=4, use_t=(1, 1, 0, 0), use_o=(1, 0, 1, 0)):
    return {
        "label": jnp.asarray(rng.randint(0, 2, (b,)), jnp.int32),
        "use_features": jnp.asarray(use_t, jnp.float32),
        "use_features_ocr": jnp.asarray(use_o, jnp.float32),
    }


def test_mmhs_masked_loss_matches_torch():
    """The masked text/OCR losses equal the reference formula
    BCEWithLogitsLoss(pos_weight=3.57)(logits*flag, labels*flag) exactly
    (`/root/reference/models/mmhs150.py:100-103`)."""
    rng = np.random.RandomState(0)
    task = _mmhs_task()
    outputs, batch = _mmhs_outputs(rng), _mmhs_batch(rng)
    ctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    ours = task.branch_losses(outputs, batch, ctx)

    crit = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([3.57]))
    y = torch.tensor(np.asarray(batch["label"]), dtype=torch.float32)[:, None]
    for name, logits, flags in (
            ("image", outputs["branch_logits"][0], None),
            ("text", outputs["branch_logits"][1], batch["use_features"]),
            ("ocr", outputs["branch_logits"][2], batch["use_features_ocr"]),
            ("fusion", outputs["logits"], None)):
        t = torch.tensor(np.asarray(logits))
        yy = y
        if flags is not None:
            m = torch.tensor(np.asarray(flags))[:, None]
            t, yy = t * m, y * m
        ref = float(crit(t, yy))
        assert np.isclose(float(ours[name]), ref, atol=1e-6), (name, ours[name], ref)


def test_mmhs_masked_samples_contribute_no_gradient():
    """flag=0 rows: the branch loss is independent of that row's logits
    (constant log(2) contribution) and its gradient w.r.t. them is exactly
    zero — masking removes the sample from training, not just scales it."""
    rng = np.random.RandomState(1)
    task = _mmhs_task()
    batch = _mmhs_batch(rng, use_t=(1, 1, 0, 0), use_o=(1, 0, 1, 0))
    ctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    base = _mmhs_outputs(rng)

    def text_loss(text_logits):
        out = dict(base, branch_logits=(base["branch_logits"][0], text_logits,
                                        base["branch_logits"][2]))
        return task.branch_losses(out, batch, ctx)["text"]

    t0 = base["branch_logits"][1]
    g = jax.grad(text_loss)(t0)
    g = np.asarray(g)
    assert (g[2:] == 0).all(), g          # masked rows: exactly zero grad
    assert (np.abs(g[:2]) > 0).all(), g   # live rows: real gradient

    # perturbing ONLY the masked rows' logits leaves the loss bit-identical
    t_wild = t0.at[2:].set(jnp.asarray([[1e4], [-1e4]]))
    assert float(text_loss(t0)) == float(text_loss(t_wild))
    # and each masked row contributes the BCE(0,0)=log(2) constant: with
    # every row masked the mean loss IS log(2)
    all_masked = dict(batch, use_features=jnp.zeros((4,), jnp.float32))

    def loss_all_masked(text_logits):
        out = dict(base, branch_logits=(base["branch_logits"][0], text_logits,
                                        base["branch_logits"][2]))
        return task.branch_losses(out, all_masked, ctx)["text"]

    assert np.isclose(float(loss_all_masked(t0)), float(np.log(2.0)), atol=1e-6)


def test_mmhs_four_way_weighting():
    """Combined loss = w_f*fusion + ow*(image+text+ocr), ow=(1-w_f)/3
    (`/root/reference/models/mmhs150.py:106-107`) — the 'fixed' flavor,
    NOT avmnist's n-scaled variant."""
    rng = np.random.RandomState(2)
    task = _mmhs_task(fusion_loss_weight=0.4)
    w = task.current_loss_weights()
    assert np.allclose(w, [0.2, 0.2, 0.2, 0.4])
    assert task.loss_names == ("image", "text", "ocr", "fusion")

    # the real step applies exactly these weights: total == w · branch vec
    batch = {
        "image": jnp.asarray(rng.randn(4, 3, 32, 32), jnp.float32),
        "text": jnp.asarray(rng.randn(4, 4, 72), jnp.float32),
        "ocr": jnp.asarray(rng.randn(4, 4, 72), jnp.float32),
        **_mmhs_batch(rng),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    ctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "val").items()}
    total, aux = task.step(params, batch, ctx, {}, train=False)
    expect = (0.4 * float(aux["losses"]["fusion"])
              + 0.2 * (float(aux["losses"]["image"])
                       + float(aux["losses"]["text"])
                       + float(aux["losses"]["ocr"])))
    assert np.isclose(float(total), expect, rtol=1e-5)


def test_multioff_unweighted_bce_plain_sum():
    """MultiOFF: unweighted BCE per branch (no pos_weight,
    `/root/reference/models/multioff.py:48-50`) combined as a PLAIN SUM
    (`multioff.py:123`)."""
    from m2mixer_tpu.models.multioff import MultiOFFMixerMultiLoss

    cfg = DictConfig({
        "dropout": 0.0,
        "modalities": {
            "classification": {"num_classes": 1,
                               "classifier": "StandardClassifier",
                               "input_shape": [4, 12, 16]},
            "image": {"block_type": "MLPMixer", "in_channels": 3,
                      "hidden_dim": 16, "patch_size": 16,
                      "image_size": [32, 32], "token_dim": 8,
                      "channel_dim": 16, "num_mixers": 1},
            "text": {"block_type": "PNLPMixer",
                     "bottleneck_features_size": 24,
                     "bottleneck_window_size": 1, "hidden_dim": 16,
                     "max_seq_len": 4, "mlp_hidden_dim": 8, "num_mixers": 1},
            "multimodal": {"block_type": "FusionMixer",
                           "fusion_function": "ConcatFusion",
                           "hidden_dim": 16, "token_dim": 8,
                           "channel_dim": 16, "num_mixers": 1},
        },
    })
    task = MultiOFFMixerMultiLoss(cfg, DictConfig({"lr": 1e-3}))
    rng = np.random.RandomState(3)
    outputs = {
        "branch_logits": (jnp.asarray(rng.randn(4, 1), jnp.float32),
                          jnp.asarray(rng.randn(4, 1), jnp.float32)),
        "logits": jnp.asarray(rng.randn(4, 1), jnp.float32),
    }
    batch = {"label": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32)}
    ctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    branches = task.branch_losses(outputs, batch, ctx)

    crit = torch.nn.BCEWithLogitsLoss()  # NO pos_weight
    y = torch.tensor(np.asarray(batch["label"]), dtype=torch.float32)[:, None]
    for name, logits in (("image", outputs["branch_logits"][0]),
                         ("text", outputs["branch_logits"][1]),
                         ("fusion", outputs["logits"])):
        ref = float(crit(torch.tensor(np.asarray(logits)), y))
        assert np.isclose(float(branches[name]), ref, atol=1e-6), name

    assert np.allclose(task.current_loss_weights(), [1.0, 1.0, 1.0])
    full = {"image": jnp.asarray(rng.randn(4, 3, 32, 32), jnp.float32),
            "text": jnp.asarray(rng.randn(4, 4, 72), jnp.float32),
            "label": batch["label"]}
    params = task.init_params(jax.random.PRNGKey(0), full)
    vctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "val").items()}
    total, aux = task.step(params, full, vctx, {}, train=False)
    assert np.isclose(float(total), sum(float(aux["losses"][k])
                                        for k in task.loss_names), rtol=1e-5)


def test_memotion_ce_plain_sum():
    """Memotion: plain cross-entropy per branch combined as a PLAIN SUM
    (`/root/reference/models/memotion.py:102-113`), 5-class."""
    from m2mixer_tpu.models.memotion import MemotionMixerMultiLoss

    cfg = DictConfig({
        "dropout": 0.0,
        "modalities": {
            "classification": {"num_classes": 5,
                               "classifier": "StandardClassifier",
                               "input_shape": [4, 12, 16]},
            "image": {"block_type": "MLPMixer", "in_channels": 3,
                      "hidden_dim": 16, "patch_size": 16,
                      "image_size": [32, 32], "token_dim": 8,
                      "channel_dim": 16, "num_mixers": 1},
            "text": {"block_type": "PNLPMixer",
                     "bottleneck_features_size": 24,
                     "bottleneck_window_size": 1, "hidden_dim": 16,
                     "max_seq_len": 4, "mlp_hidden_dim": 8, "num_mixers": 1},
            "multimodal": {"block_type": "FusionMixer",
                           "fusion_function": "ConcatFusion",
                           "hidden_dim": 16, "token_dim": 8,
                           "channel_dim": 16, "num_mixers": 1},
        },
    })
    task = MemotionMixerMultiLoss(cfg, DictConfig({"lr": 1e-3}))
    rng = np.random.RandomState(4)
    outputs = {
        "branch_logits": (jnp.asarray(rng.randn(4, 5), jnp.float32),
                          jnp.asarray(rng.randn(4, 5), jnp.float32)),
        "logits": jnp.asarray(rng.randn(4, 5), jnp.float32),
    }
    batch = {"label": jnp.asarray(rng.randint(0, 5, (4,)), jnp.int32)}
    ctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    branches = task.branch_losses(outputs, batch, ctx)

    y = torch.tensor(np.asarray(batch["label"]), dtype=torch.long)
    for name, logits in (("image", outputs["branch_logits"][0]),
                         ("text", outputs["branch_logits"][1]),
                         ("fusion", outputs["logits"])):
        ref = float(torch.nn.functional.cross_entropy(
            torch.tensor(np.asarray(logits)), y))
        assert np.isclose(float(branches[name]), ref, atol=1e-6), name

    full = {"image": jnp.asarray(rng.randn(4, 3, 32, 32), jnp.float32),
            "text": jnp.asarray(rng.randn(4, 4, 72), jnp.float32),
            "label": batch["label"]}
    params = task.init_params(jax.random.PRNGKey(0), full)
    vctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "val").items()}
    total, aux = task.step(params, full, vctx, {}, train=False)
    assert np.isclose(float(total), sum(float(aux["losses"][k])
                                        for k in task.loss_names), rtol=1e-5)
