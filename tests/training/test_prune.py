"""Gradual magnitude pruning (model.prune, modules/prune.py).

Beyond the reference (no sparsity story): eligible weight leaves zero their
smallest-|w| fraction inside the traced forward, sparsity following the
Zhu & Gupta cubic schedule over the traced ctx['epoch']. Contract under
test:

- exact mask semantics (per-matrix quantile thresholds, incl. per-slice on
  stacked leaves), exact pass-through at sparsity 0;
- gradients reach only surviving weights; checkpoints stay dense/latent;
- ``serving export`` bakes the final mask BEFORE PTQ, so exports (incl. the
  QAT lossless combination) reproduce the trained eval forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules.prune import (fake_prune, parse_prune_config,
                                       prune_schedule, sparsity_report)
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 5e-3, weight_decay: 0.0}}
  seed: 3
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [48, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.1
  prune: {{sparsity: 0.5, begin_epoch: 0, end_epoch: 1, min_size: 128}}
  {extra}
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


# ------------------------------------------------------------------- units
def test_parse_prune_config():
    assert parse_prune_config(None)[0] == 0.0
    assert parse_prune_config(False)[0] == 0.0
    f, b, e, ms, tg = parse_prune_config(0.8)
    assert (f, b, e, tg) == (0.8, 0, 0, None)
    f, b, e, ms, tg = parse_prune_config(
        {"sparsity": 0.9, "begin_epoch": 2, "end_epoch": 10,
         "min_size": 64, "targets": ["encoders_0"]})
    assert (f, b, e, ms, tg) == (0.9, 2, 10, 64, ("encoders_0",))
    with pytest.raises(ValueError, match="sparsity"):
        parse_prune_config(1.5)
    with pytest.raises(ValueError, match="begin_epoch"):
        parse_prune_config({"sparsity": 0.5, "begin_epoch": 5, "end_epoch": 2})
    with pytest.raises(ValueError, match="min_size"):
        parse_prune_config({"sparsity": 0.5, "min_size": 0})


def test_cubic_schedule():
    s = lambda e: float(prune_schedule(e, 0.8, begin=2, end=12))
    assert s(0) == 0.0 and s(2) == 0.0
    assert s(12) == pytest.approx(0.8) and s(50) == pytest.approx(0.8)
    # Zhu & Gupta cubic: halfway -> 1 - 0.5^3 = 0.875 of the final sparsity
    assert s(7) == pytest.approx(0.8 * 0.875)
    assert s(3) < s(5) < s(7) < s(11)
    # degenerate begin == end: a step function
    assert float(prune_schedule(1, 0.5, 2, 2)) == 0.0
    assert float(prune_schedule(2, 0.5, 2, 2)) == 0.5


def test_mask_keeps_largest_magnitudes():
    w = {"m": {"kernel": jnp.asarray(
        np.arange(1, 17, dtype=np.float32).reshape(4, 4) *
        np.sign(np.random.RandomState(0).randn(4, 4)))}}
    out = fake_prune(w, 0.5, min_size=16)["m"]["kernel"]
    mag = np.abs(np.asarray(w["m"]["kernel"]))
    kept = np.abs(np.asarray(out)) > 0
    assert kept.sum() == 8
    assert set(mag[kept].astype(int)) == set(range(9, 17))


def test_stacked_leaves_prune_per_slice():
    """A (2, in, out) stacked leaf with very different scales per slice must
    prune each slice at its own threshold — a global quantile would zero
    the small-scale slice entirely."""
    rng = np.random.RandomState(1)
    stacked = np.stack([rng.randn(8, 8).astype(np.float32) * 0.01,
                        rng.randn(8, 8).astype(np.float32) * 10.0])
    out = np.asarray(fake_prune({"k": jnp.asarray(stacked)}, 0.5,
                                min_size=16)["k"])
    for s in range(2):
        frac = (out[s] == 0).mean()
        assert frac == pytest.approx(0.5, abs=0.05), f"slice {s}: {frac}"


def test_sparsity_zero_is_exact_passthrough():
    rng = np.random.RandomState(2)
    w = {"k": jnp.asarray(rng.randn(16, 16).astype(np.float32))}
    out = fake_prune(w, 0.0, min_size=16)["k"]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w["k"]))


def test_gradients_flow_only_through_survivors():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(8, 8).astype(np.float32))

    def f(w):
        return jnp.sum(fake_prune({"k": w}, 0.5, min_size=16)["k"])

    g = np.asarray(jax.grad(f)(w))
    mask = (np.asarray(fake_prune({"k": w}, 0.5, min_size=16)["k"]) != 0)
    np.testing.assert_array_equal(g, mask.astype(np.float32))


def test_targets_filter_and_eligibility():
    rng = np.random.RandomState(4)
    tree = {"encoders_0": {"kernel": jnp.asarray(rng.randn(8, 8), jnp.float32)},
            "classifier": {"kernel": jnp.asarray(rng.randn(8, 8), jnp.float32)},
            "bias": jnp.asarray(rng.randn(64), jnp.float32)}  # 1-D: never
    out = fake_prune(tree, 0.5, min_size=16, targets=("encoders_",))
    assert (np.asarray(out["encoders_0"]["kernel"]) == 0).sum() == 32
    assert out["classifier"]["kernel"] is tree["classifier"]["kernel"]
    assert out["bias"] is tree["bias"]
    zeros, total = sparsity_report(out, min_size=16, targets=("encoders_",))
    assert (zeros, total) == (32, 64)


# ----------------------------------------------------------------- task/e2e
@pytest.fixture(scope="module")
def fitted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prune")
    cfg = loads(CFG.format(tmp=tmp, extra=""))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="prune", full_cfg=cfg)
    trainer.fit(task, dm)
    return cfg, task, trainer, dm


def test_fit_trains_and_checkpoints_stay_dense(fitted):
    cfg, task, trainer, dm = fitted
    assert np.isfinite(trainer.callback_metrics["val_loss"])
    from m2mixer_tpu.training.warmstart import load_checkpoint_params

    params = load_checkpoint_params(trainer.checkpoints.best_path())
    zeros, total = sparsity_report(params, task.prune_min_size)
    assert total > 0
    # latent weights stay dense: pruning is trace-time only
    assert zeros / total < 0.01


def test_eval_step_uses_pruned_weights(fitted):
    cfg, task, trainer, dm = fitted
    batch = {k: jnp.asarray(v) for k, v in _batch(8).items()}
    params = trainer.params
    # epoch 5 is past end_epoch=1: the schedule sits at the final sparsity
    _, aux = task.step(params, batch, task.make_ctx(5, "test"), {}, train=False)
    manual = task.network.apply(
        fake_prune(params, task.prune_final, task.prune_min_size,
                   task.prune_targets),
        **task.network_inputs(batch), deterministic=True)
    np.testing.assert_allclose(np.asarray(aux["logits"]),
                               np.asarray(manual["logits"]),
                               rtol=1e-6, atol=1e-6)
    latent = task.network.apply(params, **task.network_inputs(batch),
                                deterministic=True)
    assert not np.allclose(np.asarray(aux["logits"]),
                           np.asarray(latent["logits"]), rtol=0, atol=0)


def test_export_bakes_final_mask(fitted, tmp_path, capsys):
    from m2mixer_tpu.serving import export_serving, load_serving

    cfg, task, trainer, dm = fitted
    params = trainer.params
    batch = _batch(8, seed=2)
    d = export_serving(task, params, batch, str(tmp_path / "art"),
                       fmt="stablehlo", buckets=(8,))
    assert task.prune_final == 0.5  # suppression restored
    out = capsys.readouterr().out
    assert "baked the final mask" in out
    served = load_serving(d).predict(batch)["logits"]
    _, aux = task.step(params, {k: jnp.asarray(v) for k, v in batch.items()},
                       task.make_ctx(5, "test"), {}, train=False)
    np.testing.assert_allclose(served, np.asarray(aux["logits"]),
                               rtol=2e-5, atol=2e-5)


def test_prune_composes_with_qat_lossless_export(tmp_path):
    """prune-then-quantize: a model trained with BOTH levers exports with
    the matching PTQ mode to an artifact reproducing the eval forward."""
    from m2mixer_tpu.serving import export_serving, load_serving

    cfg = loads(CFG.format(tmp=tmp_path, extra="qat: {mode: int8, min_size: 128}"))
    cfg.train.epochs = 1
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="prune_qat", full_cfg=cfg)
    trainer.fit(task, dm)
    batch = _batch(8, seed=4)
    d = export_serving(task, trainer.params, batch, str(tmp_path / "pq"),
                       fmt="stablehlo", buckets=(8,), quantize="int8")
    served = load_serving(d).predict(batch)["logits"]
    _, aux = task.step(trainer.params,
                       {k: jnp.asarray(v) for k, v in batch.items()},
                       task.make_ctx(5, "test"), {}, train=False)
    np.testing.assert_allclose(served, np.asarray(aux["logits"]),
                               rtol=2e-5, atol=2e-5)


def test_missing_thread_fails_loudly(tmp_path):
    """A step that forgets prune_sparsity must raise, not train dense."""
    cfg = loads(CFG.format(tmp=tmp_path, extra=""))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {k: jnp.asarray(v) for k, v in _batch(4).items()}
    params = task.init_params(jax.random.PRNGKey(0), batch)
    with pytest.raises(ValueError, match="prune"):
        task.apply_network(
            params, dict(task.network_inputs(batch), deterministic=True,
                         mute_code=jnp.int32(-1)), {}, False)
