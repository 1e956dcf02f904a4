"""Params EMA (train.optimizer.ema_decay): Polyak averaging riding in
opt_state — recurrence math, checkpoint carriage, ema_eval, export --ema."""

import jax
import numpy as np
import optax
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.trainer import (ParamsEmaState, _make_optimizer,
                                          ema_params_from_opt_state)

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: {epochs}
  compiled_epochs: {compiled}
  ema_eval: {ema_eval}
  optimizer: {{lr: 5e-2, weight_decay: 0.0, ema_decay: {decay}}}
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


def _cfg(tmp, decay=0.9, epochs=1, compiled=True, ema_eval=False):
    return loads(CFG.format(tmp=tmp, decay=decay, epochs=epochs,
                            compiled=str(compiled).lower(),
                            ema_eval=str(ema_eval).lower()))


def test_ema_matches_analytic_recurrence():
    """Direct optimizer-level check: after K updates, the state EMA equals
    decay-weighted trajectory of the post-update params."""
    cfg = _cfg("unused")
    opt, _ = _make_optimizer(cfg.train.optimizer)
    params = {"w": np.array([1.0, -2.0], np.float32)}
    state = opt.init(params)
    ema_ref = np.asarray(params["w"], np.float64)
    for k in range(5):
        grads = {"w": np.full((2,), 0.1 * (k + 1), np.float32)}
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        ema_ref = 0.9 * ema_ref + 0.1 * np.asarray(params["w"], np.float64)
    got = ema_params_from_opt_state(state)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got["w"]), ema_ref, rtol=1e-5)


def test_ema_absent_when_disabled():
    cfg = _cfg("unused", decay=0.0)
    opt, _ = _make_optimizer(cfg.train.optimizer)
    state = opt.init({"w": np.zeros((2,), np.float32)})
    assert ema_params_from_opt_state(state) is None


def test_bad_decay_rejected():
    cfg = _cfg("unused", decay=1.5)
    with pytest.raises(ValueError, match="ema_decay"):
        _make_optimizer(cfg.train.optimizer)


def test_ema_eval_requires_decay(tmp_path):
    cfg = _cfg(tmp_path, decay=0.0, ema_eval=True)
    with pytest.raises(ValueError, match="ema_eval"):
        Trainer(cfg.train, name="bad", full_cfg=cfg)


@pytest.mark.parametrize("compiled", [True, False], ids=["compiled", "per_step"])
def test_ema_carried_through_training_and_checkpoints(tmp_path, compiled):
    """After a real fit: opt_state carries an EMA that differs from the raw
    params (trailing average), the checkpoint round-trips it, and
    export --ema serves exactly those weights."""
    cfg = _cfg(tmp_path, decay=0.8, epochs=2, compiled=compiled)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"ema_{compiled}", full_cfg=cfg)
    trainer.fit(task, dm)

    ema = ema_params_from_opt_state(trainer.opt_state)
    assert ema is not None
    p_leaves = jax.tree.leaves(trainer.params)
    e_leaves = jax.tree.leaves(ema)
    assert any(not np.allclose(np.asarray(p), np.asarray(e))
               for p, e in zip(p_leaves, e_leaves))

    # restored (raw-dict) checkpoint exposes the same EMA tree
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(trainer.checkpoints.last_path())
    r_ema = ema_params_from_opt_state(restored["opt_state"])
    assert r_ema is not None
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(r_ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_ema_eval_uses_averaged_weights(tmp_path):
    """With ema_eval on, val/test metrics come from the EMA weights: the
    trainer's eval params equal the EMA tree, not the raw one."""
    cfg = _cfg(tmp_path, decay=0.5, epochs=2, ema_eval=True)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="ema_eval", full_cfg=cfg)
    trainer.fit(task, dm)
    ema = ema_params_from_opt_state(trainer.opt_state)
    got = trainer._eval_params()
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the raw-params fallback still works when toggled off
    trainer.ema_eval = False
    for a, b in zip(jax.tree.leaves(trainer._eval_params()),
                    jax.tree.leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_ema_cli(tmp_path):
    """serving export --ema -p <ckpt> serves the EMA weights (logit parity
    vs applying the EMA tree directly)."""
    from m2mixer_tpu.serving import load_serving, main

    cfg = _cfg(tmp_path, decay=0.8, epochs=1)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="ema_exp", full_cfg=cfg)
    trainer.fit(task, dm)
    ema = ema_params_from_opt_state(trainer.opt_state)

    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(CFG.format(tmp=tmp_path, decay=0.8, epochs=1,
                                   compiled="true", ema_eval="false"))
    out_dir = tmp_path / "art_ema"
    main(["export", "-c", str(cfg_path), "-o", str(out_dir),
          "-p", trainer.checkpoints.last_path(), "--ema", "--buckets", "4"])
    model = load_serving(str(out_dir))

    rng = np.random.RandomState(5)
    batch = {"image": rng.rand(4, 1, 28, 28).astype(np.float32),
             "audio": rng.rand(4, 1, 112, 112).astype(np.float32)}
    got = np.asarray(model.predict(batch)["logits"])
    want = np.asarray(task.network.apply(
        {"params": ema["params"]} if "params" in ema else ema,
        **task.network_inputs(batch), deterministic=True)["logits"])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_ema_rejects_checkpoint_without_ema(tmp_path):
    from m2mixer_tpu.serving import main

    cfg = _cfg(tmp_path, decay=0.0, epochs=1)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="no_ema", full_cfg=cfg)
    trainer.fit(task, dm)
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(CFG.format(tmp=tmp_path, decay=0.0, epochs=1,
                                   compiled="true", ema_eval="false"))
    with pytest.raises(SystemExit):
        main(["export", "-c", str(cfg_path), "-o", str(tmp_path / "art"),
              "-p", trainer.checkpoints.last_path(), "--ema", "--buckets", "4"])


def test_ema_survives_resume(tmp_path):
    """Resume (-p) restores the EMA from the checkpoint's opt_state and
    keeps averaging — the post-resume EMA differs from both the raw params
    and the checkpointed EMA (it kept moving), and a fresh-init EMA."""
    cfg = _cfg(tmp_path, decay=0.9, epochs=1)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    t1 = Trainer(cfg.train, name="ema_res", full_cfg=cfg)
    t1.fit(task, dm)
    ema1 = jax.tree.map(np.asarray, ema_params_from_opt_state(t1.opt_state))
    ckpt = t1.checkpoints.last_path()

    cfg2 = _cfg(tmp_path, decay=0.9, epochs=2)
    task2 = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)
    t2 = Trainer(cfg2.train, name="ema_res2", full_cfg=cfg2)
    t2.fit(task2, dm, resume_from=ckpt)
    ema2 = ema_params_from_opt_state(t2.opt_state)
    assert ema2 is not None
    moved = [not np.allclose(np.asarray(a), b)
             for a, b in zip(jax.tree.leaves(ema2), jax.tree.leaves(ema1))]
    assert any(moved), "EMA did not keep averaging after resume"
    # and it isn't just the raw params either
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(ema2),
                               jax.tree.leaves(t2.params)))
