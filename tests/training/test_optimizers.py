"""Config-driven optimizer zoo (train.optimizer.type).

The reference hardcodes torch.optim.Adam
(`/root/reference/modules/train_test_module.py:166-175`); `type: adam`
(the default) keeps that parity. Beyond it, adamw/sgd/lion/lamb/adafactor
are pinned here against optax's own alias implementations and driven e2e
through the compiled trainer.
"""

import jax
import numpy as np
import optax
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.trainer import _make_optimizer


def _opt_cfg(**kw):
    body = ", ".join(f"{k}: {v}" for k, v in kw.items())
    return loads("train:\n  optimizer: {%s}\n" % body).train.optimizer


def _run_steps(opt, n=5, seed=0):
    """Apply n deterministic pseudo-gradient updates; return final params."""
    rng = np.random.RandomState(seed)
    params = {"w": np.array([[1.0, -2.0], [0.5, 3.0]], np.float32),
              "b": np.array([0.1, -0.1], np.float32)}
    grads_seq = [jax.tree.map(lambda p: rng.randn(*p.shape).astype(np.float32),
                              params) for _ in range(n)]
    state = opt.init(params)
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return jax.tree.map(np.asarray, params)


def _assert_tree_close(a, b, rtol=1e-5, atol=1e-6):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_adamw_matches_optax_alias():
    ours, _ = _make_optimizer(_opt_cfg(type="adamw", lr=1e-2,
                                       weight_decay=0.05))
    ref = optax.adamw(1e-2, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.05)
    _assert_tree_close(_run_steps(ours), _run_steps(ref))


def test_sgd_matches_optax_alias():
    ours, _ = _make_optimizer(_opt_cfg(type="sgd", lr=1e-2, momentum=0.8,
                                       nesterov="true"))
    ref = optax.sgd(1e-2, momentum=0.8, nesterov=True)
    _assert_tree_close(_run_steps(ours), _run_steps(ref))


def test_sgd_coupled_weight_decay():
    """SGD wd is coupled L2 (torch.optim.SGD semantics): grad += wd*p
    before the momentum trace."""
    ours, _ = _make_optimizer(_opt_cfg(type="sgd", lr=1e-2, momentum=0.8,
                                       weight_decay=0.1))
    ref = optax.chain(optax.add_decayed_weights(0.1),
                      optax.trace(decay=0.8),
                      optax.scale_by_learning_rate(1e-2))
    _assert_tree_close(_run_steps(ours), _run_steps(ref))


def test_lion_matches_optax_alias():
    # lion's default betas are (0.9, 0.99) per the paper — no betas in cfg
    ours, _ = _make_optimizer(_opt_cfg(type="lion", lr=1e-3,
                                       weight_decay=0.02))
    ref = optax.lion(1e-3, b1=0.9, b2=0.99, weight_decay=0.02)
    _assert_tree_close(_run_steps(ours), _run_steps(ref))


def test_lamb_matches_optax_alias():
    ours, _ = _make_optimizer(_opt_cfg(type="lamb", lr=1e-2,
                                       weight_decay=0.01))
    ref = optax.lamb(1e-2, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    _assert_tree_close(_run_steps(ours), _run_steps(ref))


def test_adafactor_factored_state_is_small():
    """Adafactor's raison d'être: optimizer state for an (r, c) matrix is
    O(r + c), not O(r*c)."""
    ours, _ = _make_optimizer(_opt_cfg(type="adafactor", lr=1e-2))
    # factoring kicks in at optax's min_dim_size_to_factor (128) — use a
    # matrix at the large-geometry scale where the memory win matters
    params = {"w": np.zeros((256, 512), np.float32)}
    state = ours.init(params)
    n_state = sum(np.asarray(l).size for l in jax.tree.leaves(state))
    assert n_state < 256 * 512 // 10, f"adafactor state has {n_state} elements"
    # and it still produces finite updates
    out = _run_steps(ours, n=3)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(out))


def test_default_type_is_reference_adam():
    """No `type:` key -> the exact coupled-L2 Adam chain round 1 shipped."""
    ours, _ = _make_optimizer(_opt_cfg(lr=1e-2, weight_decay=0.03))
    ref = optax.chain(optax.add_decayed_weights(0.03),
                      optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                      optax.scale_by_learning_rate(1e-2))
    _assert_tree_close(_run_steps(ours), _run_steps(ref))


def test_grad_clip_norm_matches_optax_chain():
    """grad_clip_norm leads the chain: raw grads are clipped before the
    coupled-L2 term and the Adam moments (torch clip_grad_norm_ order)."""
    ours, _ = _make_optimizer(_opt_cfg(lr="1e-2", weight_decay=0.03,
                                       grad_clip_norm=0.1))
    ref = optax.chain(optax.clip_by_global_norm(0.1),
                      optax.add_decayed_weights(0.03),
                      optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                      optax.scale_by_learning_rate(1e-2))
    _assert_tree_close(_run_steps(ours), _run_steps(ref))
    # and it actually bites: unclipped Adam lands somewhere else
    unclipped, _ = _make_optimizer(_opt_cfg(lr="1e-2", weight_decay=0.03))
    a = np.concatenate([np.ravel(l) for l in jax.tree.leaves(_run_steps(ours))])
    b = np.concatenate([np.ravel(l)
                        for l in jax.tree.leaves(_run_steps(unclipped))])
    assert not np.allclose(a, b)


def test_grad_clip_value_matches_optax_chain():
    ours, _ = _make_optimizer(_opt_cfg(type="sgd", lr="1e-2", momentum=0,
                                       grad_clip_value=0.05))
    ref = optax.chain(optax.clip(0.05), optax.scale_by_learning_rate(1e-2))
    _assert_tree_close(_run_steps(ours), _run_steps(ref))


def test_negative_clip_rejected():
    with pytest.raises(ValueError, match="grad_clip"):
        _make_optimizer(_opt_cfg(lr="1e-2", grad_clip_norm=-1))


def test_unknown_type_rejected():
    with pytest.raises(ValueError, match="train.optimizer.type"):
        _make_optimizer(_opt_cfg(type="adamax", lr=1e-2))


def test_adafactor_rejects_moment_dtype():
    with pytest.raises(ValueError, match="adafactor"):
        _make_optimizer(_opt_cfg(type="adafactor", lr=1e-2,
                                 moment_dtype="bf16"))


CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 2
  compiled_epochs: true
  optimizer: {{type: {opt_type}, lr: {lr}}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 8, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
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


@pytest.mark.parametrize("opt_type,lr", [("lion", "1e-3"),
                                         ("adafactor", "1e-2"),
                                         ("sgd", "5e-2")])
def test_optimizer_trains_e2e(tmp_path, opt_type, lr):
    """Each non-default optimizer drives the epoch-compiled trainer: params
    move, losses stay finite, and checkpoints round-trip the state."""
    cfg = loads(CFG.format(tmp=tmp_path, opt_type=opt_type, lr=lr))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"opt_{opt_type}", full_cfg=cfg)
    trainer.fit(task, dm)
    assert np.isfinite(trainer.callback_metrics["train_loss"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(trainer.params))


# ------------------------------------------------------- param groups
def _groups_cfg(extra: str):
    return loads("train:\n  optimizer:\n" + extra).train.optimizer


def test_param_groups_lr_scale_one_step():
    """A matched group's first update is exactly lr_scale x the unmatched
    twin's (identical values + grads => identical Adam directions)."""
    cfg = _groups_cfg("""
    lr: 1e-2
    param_groups:
      - match: [enc]
        lr_scale: 0.25
""")
    opt, _ = _make_optimizer(cfg)
    w = np.array([[1.0, -2.0], [0.5, 3.0]], np.float32)
    params = {"enc": {"k": w.copy()}, "head": {"k": w.copy()}}
    g = np.full_like(w, 0.3)
    grads = {"enc": {"k": g}, "head": {"k": g}}
    state = opt.init(params)
    updates, _ = opt.update(grads, state, params)
    d_enc = np.asarray(updates["enc"]["k"])
    d_head = np.asarray(updates["head"]["k"])
    np.testing.assert_allclose(d_enc, 0.25 * d_head, rtol=1e-6)
    assert np.abs(d_head).max() > 0


def test_param_groups_weight_decay_override():
    """Per-group weight_decay overrides the global value in the same chain
    slot (coupled for sgd): frozen-decay group gets -lr*g, the rest
    -lr*(g + wd*p)."""
    cfg = _groups_cfg("""
    type: sgd
    lr: 0.1
    momentum: 0.0
    weight_decay: 0.1
    param_groups:
      - match: [enc]
        weight_decay: 0.0
""")
    opt, _ = _make_optimizer(cfg)
    w = np.array([2.0, -4.0], np.float32)
    params = {"enc": {"k": w.copy()}, "head": {"k": w.copy()}}
    g = np.array([0.5, 0.5], np.float32)
    grads = {"enc": {"k": g}, "head": {"k": g}}
    updates, _ = opt.update(grads, opt.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["enc"]["k"]), -0.1 * g,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["head"]["k"]),
                               -0.1 * (g + 0.1 * w), rtol=1e-6)


def test_param_groups_validation():
    from m2mixer_tpu.training.trainer import check_param_groups

    with pytest.raises(ValueError, match="needs 'match'"):
        _make_optimizer(_groups_cfg("    lr: 1e-3\n    param_groups: [{lr_scale: 0.5}]\n"))
    with pytest.raises(ValueError, match="lr_scale must be >= 0"):
        _make_optimizer(_groups_cfg(
            "    lr: 1e-3\n    param_groups: [{match: [x], lr_scale: -1}]\n"))
    with pytest.raises(ValueError, match="not applicable to"):
        _make_optimizer(_groups_cfg(
            "    type: adafactor\n    lr: 1e-3\n"
            "    param_groups: [{match: [x], weight_decay: 0.1}]\n"))
    # zero-match guard (trainer-side, needs the real tree)
    cfg = _groups_cfg(
        "    lr: 1e-3\n    param_groups: [{match: [nonexistent], lr_scale: 0.5}]\n")
    with pytest.raises(ValueError, match="matched no parameter leaves"):
        check_param_groups(cfg, {"params": {"enc": {"k": np.zeros((2, 2))}}})


def test_param_groups_e2e(tmp_path, capsys):
    """Differential-LR fine-tune shape through a real fit: encoder subtrees
    at 0.1x LR, heads at full; the trainer reports the match counts."""
    cfg = loads(CFG.format(tmp=tmp_path, opt_type="adam", lr="1e-3"))
    cfg.train.optimizer.param_groups = [
        {"match": ["encoders_0", "encoders_1"], "lr_scale": 0.1},
    ]
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="opt_groups", full_cfg=cfg)
    trainer.fit(task, dm)
    out = capsys.readouterr().out
    assert "param_groups: group 0" in out
    assert np.isfinite(trainer.callback_metrics["val_loss"])
