"""model.mixup_alpha + model.label_smoothing (beyond reference).

Both are in-step, fully traced regularizers: mixup draws one
``lam ~ Beta(a, a)`` and one batch permutation per step from the 'mute' rng
stream and mixes every modality input (losses combine
``lam·L(y) + (1-lam)·L(y_perm)``); label smoothing reshapes CE targets to
``(1-eps)·one_hot + eps/K`` (torch semantics) and BCE targets toward 0.5.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules.losses import bce_with_logits_loss, cross_entropy_loss
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 5e-3, weight_decay: 0.0}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [48, 16, 16]}}
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


def _batch(n, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.rand(n, 1, 28, 28).astype(np.float32),
        "audio": rng.rand(n, 1, 112, 112).astype(np.float32),
        "label": rng.randint(0, 10, (n,)).astype(np.int32),
    }


# ------------------------------------------------------------ loss smoothing
def test_ce_label_smoothing_matches_soft_targets():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(8, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (8,)).astype(np.int32))
    eps = 0.1
    got = float(cross_entropy_loss(logits, labels, label_smoothing=eps))
    # reference math via explicit soft one-hots
    logp = jax.nn.log_softmax(logits, axis=-1)
    soft = (1 - eps) * jax.nn.one_hot(labels, 5) + eps / 5
    want = float(jnp.mean(-jnp.sum(soft * logp, axis=-1)))
    assert got == pytest.approx(want, rel=1e-6)
    # eps = 0 is the plain loss
    assert float(cross_entropy_loss(logits, labels)) == pytest.approx(
        float(cross_entropy_loss(logits, labels, label_smoothing=0.0)))


def test_bce_label_smoothing_moves_targets():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    targets = jnp.asarray((rng.rand(8, 3) > 0.5).astype(np.float32))
    eps = 0.2
    got = float(bce_with_logits_loss(logits, targets, label_smoothing=eps))
    want = float(bce_with_logits_loss(logits, targets * (1 - eps) + eps / 2))
    assert got == pytest.approx(want, rel=1e-6)


def test_label_smoothing_config_validation(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.label_smoothing = 1.5
    with pytest.raises(ValueError, match="label_smoothing"):
        get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)


def test_task_ce_threads_smoothing(tmp_path):
    """model.label_smoothing changes the branch losses (and nothing else
    when eps = 0)."""
    batch = _batch(8)
    cfg = loads(CFG.format(tmp=tmp_path))
    plain = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    cfg2 = loads(CFG.format(tmp=tmp_path))
    cfg2.model.label_smoothing = 0.1
    smooth = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)

    p = plain.init_params(jax.random.PRNGKey(0), batch)
    ctx = {k: jnp.asarray(v) for k, v in plain.make_ctx(0, "val").items()}
    l0, _ = plain.step(p, batch, ctx, {}, train=False)
    l1, _ = smooth.step(p, batch, ctx, {}, train=False)
    assert float(l0) != float(l1)


# ------------------------------------------------------------------- mixup
def test_mixup_batch_construction(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.mixup_alpha = 0.4
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {k: jnp.asarray(v) for k, v in _batch(8, seed=2).items()}
    rngs = {"mute": jax.random.PRNGKey(11)}
    mixed_a, mixed_b, lam = jax.jit(task._mixup)(batch, rngs)

    lam = float(lam)
    assert 0.0 <= lam <= 1.0
    # reproduce the permutation from the same derived stream
    key = jax.random.fold_in(rngs["mute"], 0x6D78)
    _, k_perm = jax.random.split(key)
    perm = np.asarray(jax.random.permutation(k_perm, 8))
    for k in ("image", "audio"):
        want = lam * np.asarray(batch[k]) + (1 - lam) * np.asarray(batch[k])[perm]
        np.testing.assert_allclose(np.asarray(mixed_a[k]), want, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(mixed_a[k]),
                                      np.asarray(mixed_b[k]))
    # side a keeps the original labels (metrics target), side b permutes
    np.testing.assert_array_equal(np.asarray(mixed_a["label"]),
                                  np.asarray(batch["label"]))
    np.testing.assert_array_equal(np.asarray(mixed_b["label"]),
                                  np.asarray(batch["label"])[perm])


def test_mixup_step_blends_losses(tmp_path):
    """The step total equals the manually recomputed
    lam-weighted branch losses over the mixed forward."""
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.mixup_alpha = 0.4
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {k: jnp.asarray(v) for k, v in _batch(8, seed=3).items()}
    params = task.init_params(jax.random.PRNGKey(0), batch)
    ctx = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(task.RNG_COLLECTIONS)}

    total, aux = jax.jit(lambda p, b: task.step(p, b, ctx, rngs, True))(params, batch)

    # manual: dropout is 0, so the train forward matches a deterministic apply
    ba, bb, lam = task._mixup(batch, rngs)
    out = task.network.apply(params, **task.network_inputs(ba),
                             deterministic=True)
    la = task.branch_losses(out, ba, ctx)
    lb = task.branch_losses(out, bb, ctx)
    lam = float(lam)
    w = np.asarray(ctx["loss_weights"])
    names = task.loss_names
    want = sum(w[i] * (lam * float(la[n]) + (1 - lam) * float(lb[n]))
               for i, n in enumerate(names))
    assert float(total) == pytest.approx(want, rel=1e-4)
    # logged branch losses are the blended ones
    assert float(aux["losses"]["fusion"]) == pytest.approx(
        lam * float(la["fusion"]) + (1 - lam) * float(lb["fusion"]), rel=1e-4)


def test_mixup_eval_untouched(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    base_task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    cfg2 = loads(CFG.format(tmp=tmp_path))
    cfg2.model.mixup_alpha = 0.4
    mix_task = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)

    batch = _batch(8)
    p = base_task.init_params(jax.random.PRNGKey(0), batch)
    ctx = {k: jnp.asarray(v) for k, v in base_task.make_ctx(0, "val").items()}
    l0, _ = base_task.step(p, batch, ctx, {}, train=False)
    l1, _ = mix_task.step(p, batch, ctx, {}, train=False)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


# ------------------------------------------------------------------ cutmix
def test_cutmix_regions_are_boxes(tmp_path):
    """Every modality swaps exactly one contiguous box (trailing two axes)
    with its permuted batch, and the returned lam is the mean kept fraction
    recomputed from the integer region sizes."""
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.cutmix_alpha = 1.0
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {k: jnp.asarray(v) for k, v in _batch(8, seed=4).items()}
    rngs = {"mute": jax.random.PRNGKey(5)}
    mixed_a, mixed_b, lam = jax.jit(task._cutmix)(batch, rngs)

    # reproduce the permutation from the same derived stream
    key = jax.random.fold_in(rngs["mute"], 0x636D)
    _, k_perm, _ = jax.random.split(key, 3)
    perm = np.asarray(jax.random.permutation(k_perm, 8))
    # a fixed point (perm[s] == s) would make the diff mask empty regardless
    # of the cut; measure the region on a sample that actually moved
    s = int(np.flatnonzero(perm != np.arange(8))[0])

    kept_fracs = []
    for k in ("image", "audio"):
        orig = np.asarray(batch[k])
        out = np.asarray(mixed_a[k])
        swapped = orig[perm]
        # every element comes from exactly one of the two sources
        from_perm = out == swapped
        from_orig = out == orig
        assert np.all(from_perm | from_orig)
        # the swapped region is one box over (H, W), identical across batch
        diff = ~from_orig[s, 0]  # (H, W)
        rows = np.flatnonzero(diff.any(axis=1))
        cols = np.flatnonzero(diff.any(axis=0))
        if len(rows):  # degenerate zero-area cut is legal at lam ~ 1
            assert np.array_equal(rows, np.arange(rows[0], rows[-1] + 1))
            assert np.array_equal(cols, np.arange(cols[0], cols[-1] + 1))
            assert diff[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()
        kept_fracs.append(1.0 - len(rows) * len(cols) / diff.size)
        np.testing.assert_array_equal(out, np.asarray(mixed_b[k]))
    assert float(lam) == pytest.approx(np.mean(kept_fracs), abs=1e-6)
    assert 0.0 <= float(lam) <= 1.0
    # side a keeps the original labels, side b permutes
    np.testing.assert_array_equal(np.asarray(mixed_a["label"]),
                                  np.asarray(batch["label"]))
    np.testing.assert_array_equal(np.asarray(mixed_b["label"]),
                                  np.asarray(batch["label"])[perm])


def test_cutmix_mixup_mutually_exclusive(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.mixup_alpha = 0.2
    cfg.model.cutmix_alpha = 1.0
    with pytest.raises(ValueError, match="cannot combine"):
        get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    cfg2 = loads(CFG.format(tmp=tmp_path))
    cfg2.model.cutmix_alpha = -0.5
    with pytest.raises(ValueError, match="cutmix_alpha"):
        get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)


def test_cutmix_e2e(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.cutmix_alpha = 1.0
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="cutfit", full_cfg=cfg)
    trainer.fit(task, dm)
    assert trainer.compiled_epochs
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_mixup_smoothing_e2e(tmp_path):
    """Both regularizers together through a real fit on the epoch-compiled
    path."""
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.mixup_alpha = 0.2
    cfg.model.label_smoothing = 0.1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="mixfit", full_cfg=cfg)
    trainer.fit(task, dm)
    assert trainer.compiled_epochs
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])
