"""LoRA fine-tuning (model.lora) + warm starts (train.init_from).

Both are beyond the reference (which only has full training and exact-match
Lightning resume, `/root/reference/models/avmnist.py:400-411`): LoRA adapts a
trained checkpoint with low-rank factors in a separate 'lora' collection
(modules/lora.py); train.init_from grafts another run's weights into a fresh
fit (training/warmstart.py). The contract under test:

- step 0 of a LoRA model is bit-identical to the base model (B = 0 init);
- ONLY adapter factors receive gradients/optimizer state — the base tree is
  bit-frozen through a whole fit;
- warm start grafts matching leaves, keeps fresh the mismatched ones
  (head-swap), and fails loudly on zero matches;
- serving export / checkpoint averaging bake adapters into plain weights.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules.lora import (
    SCALE_KEY, init_lora, lora_target_paths, merge_lora, resolve_lora)
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.warmstart import (
    graft_params, load_checkpoint_params, resolve_checkpoint)

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
  dropout: 0.1
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


def _flat(tree):
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


def _make_task(cfg):
    return get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)


# ---------------------------------------------------------------- unit: lora
def test_target_paths_filter_and_raise():
    params = {
        "enc": {"kernel": np.zeros((32, 64)), "bias": np.zeros((64,))},
        "stack": {"tok_kernel": np.zeros((3, 2, 16, 24))},
        "tiny": {"kernel": np.zeros((4, 4))},  # min dim <= rank: skipped
    }
    paths = lora_target_paths(params, rank=4)
    assert ("enc", "kernel") in paths
    assert ("stack", "tok_kernel") in paths
    assert ("tiny", "kernel") not in paths

    only = lora_target_paths(params, rank=4, targets=["stack/"])
    assert only == (("stack", "tok_kernel"),)

    with pytest.raises(ValueError, match="matched no kernel leaves"):
        lora_target_paths(params, rank=4, targets=["nonexistent"])


def test_init_merge_identity_then_delta():
    rng = jax.random.PRNGKey(0)
    W = np.arange(32 * 48, dtype=np.float32).reshape(32, 48) / 100.0
    S = np.ones((3, 16, 24), np.float32)  # stacked leading axis
    params = {"d": {"kernel": W}, "s": {"mix_kernel": S}}
    lora = init_lora(rng, params, rank=4, alpha=8.0)
    assert float(lora[SCALE_KEY]) == pytest.approx(2.0)  # alpha / rank

    # B = 0 -> merge is the identity, bit for bit
    merged = merge_lora(params, lora)
    np.testing.assert_array_equal(np.asarray(merged["d"]["kernel"]), W)
    np.testing.assert_array_equal(np.asarray(merged["s"]["mix_kernel"]), S)

    # nonzero B -> W + scale * A @ B (broadcast over stacked axes)
    a = np.asarray(lora["d"]["kernel"]["a"])  # (32, 4)
    b = np.random.RandomState(1).rand(4, 48).astype(np.float32)
    lora["d"]["kernel"]["b"] = jnp.asarray(b)
    merged = merge_lora(params, lora)
    np.testing.assert_allclose(np.asarray(merged["d"]["kernel"]),
                               W + 2.0 * (a @ b), rtol=1e-5, atol=1e-5)


def test_resolve_noop_without_lora():
    variables = {"params": {"w": jnp.ones((2, 2))}}
    assert resolve_lora(variables) is variables


# ------------------------------------------------------------- unit: task
@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    return loads(CFG.format(tmp=tmp_path_factory.mktemp("lora")))


def test_step0_matches_base_model(tiny_cfg):
    """B = 0 init: the LoRA model's eval forward is bit-identical to the
    base model's under the same seed."""
    base = _make_task(tiny_cfg)
    cfg2 = loads(CFG.format(tmp="/tmp/unused"))
    cfg2.model.lora = {"rank": 4}
    tuned = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)

    batch = _batch(8)
    p0 = base.init_params(jax.random.PRNGKey(3), batch)
    p1 = tuned.init_params(jax.random.PRNGKey(3), batch)
    assert "lora" in p1 and "lora" not in p0
    # base collection identical (lora rng split happens after network init)
    f0, f1 = _flat(p0["params"]), _flat(p1["params"])
    assert f0.keys() == f1.keys()
    for k in f0:
        np.testing.assert_array_equal(f0[k], f1[k])

    ctx = {k: jnp.asarray(v) for k, v in base.make_ctx(0, "val").items()}
    l0, aux0 = jax.jit(lambda p, b: base.step(p, b, ctx, {}, False))(p0, batch)
    l1, aux1 = jax.jit(lambda p, b: tuned.step(p, b, ctx, {}, False))(p1, batch)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(aux0["preds"]), np.asarray(aux1["preds"]))


def test_trainable_mask_polarity(tiny_cfg):
    cfg2 = loads(CFG.format(tmp="/tmp/unused"))
    cfg2.model.lora = {"rank": 4}
    task = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)
    variables = task.init_params(jax.random.PRNGKey(0), _batch(4))
    mask = _flat(task.trainable_mask(variables))
    for k, v in mask.items():
        if k.startswith("lora/"):
            expected = 0.0 if k.endswith(SCALE_KEY) else 1.0
        else:
            expected = 0.0
        assert float(v) == expected, (k, float(v))
    # the adapters exist for every eligible kernel and nothing else
    n_adapters = sum(1 for k in mask if k.endswith("/a"))
    n_kernels = len(lora_target_paths(variables["params"], 4))
    assert n_adapters == n_kernels > 0


def test_gradblend_rejects_lora(tiny_cfg):
    cfg2 = loads(CFG.format(tmp="/tmp/unused"))
    cfg2.model.lora = {"rank": 4}
    cfg2.model.gradblend = True
    with pytest.raises(ValueError, match="gradblend and model.lora"):
        get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)


# -------------------------------------------------------- unit: warm start
def test_graft_params_semantics():
    live = {"params": {"enc": {"k": np.zeros((4, 4), np.float32)},
                       "head": {"k": np.zeros((4, 5), np.float32)},
                       "extra": {"k": np.zeros((2,), np.float32)}}}
    donor = {"params": {"enc": {"k": np.ones((4, 4), np.float32)},
                        "head": {"k": np.ones((4, 9), np.float32)}}}  # swapped head
    out, stats = graft_params(live, donor)
    np.testing.assert_array_equal(np.asarray(out["params"]["enc"]["k"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["params"]["head"]["k"]), 0.0)
    np.testing.assert_array_equal(np.asarray(out["params"]["extra"]["k"]), 0.0)
    assert stats["taken"] == 1
    assert any("head/k" in s for s in stats["shape_mismatch"])
    assert "params/extra" in stats["missing"]

    with pytest.raises(ValueError, match="matched ZERO leaves"):
        graft_params({"params": {"other": np.zeros((3,))}}, donor)


def test_resolve_checkpoint_best_and_last(tmp_path):
    ck = tmp_path / "checkpoints"
    for name in ("epoch_0", "epoch_1", "epoch_2"):
        (ck / name).mkdir(parents=True)
    index = {
        "monitor": "val_loss", "mode": "min", "last": str(ck / "epoch_2"),
        "entries": [
            {"epoch": 0, "monitor": 2.0, "path": str(ck / "epoch_0")},
            {"epoch": 1, "monitor": 1.0, "path": str(ck / "epoch_1")},
            {"epoch": 2, "monitor": 3.0, "path": str(ck / "epoch_2")},
        ],
    }
    (ck / "index.json").write_text(json.dumps(index))
    assert resolve_checkpoint(str(ck)) == str(ck / "epoch_1")            # best (min)
    assert resolve_checkpoint(str(tmp_path)) == str(ck / "epoch_1")     # run dir
    assert resolve_checkpoint(str(ck), "last") == str(ck / "epoch_2")
    index["mode"] = "max"
    (ck / "index.json").write_text(json.dumps(index))
    assert resolve_checkpoint(str(ck)) == str(ck / "epoch_2")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(str(tmp_path / "nowhere"))


# --------------------------------------------------------------- end to end
@pytest.fixture(scope="module")
def donor(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("donor")
    cfg = loads(CFG.format(tmp=tmp))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="donor", full_cfg=cfg)
    trainer.fit(task, dm)
    return cfg, trainer


@pytest.fixture(scope="module")
def finetuned(donor, tmp_path_factory):
    donor_cfg, donor_trainer = donor
    tmp = tmp_path_factory.mktemp("ft")
    cfg = loads(CFG.format(tmp=tmp))
    cfg.model.lora = {"rank": 4, "alpha": 8}
    cfg.train.init_from = donor_trainer.ckpt_dir
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="ft", full_cfg=cfg)
    trainer.fit(task, dm)
    return cfg, task, dm, trainer, donor_trainer


def test_finetune_base_bitfrozen_adapters_train(finetuned):
    """The LoRA memory contract through a REAL fit on the epoch-compiled
    path: the base tree stays bit-identical to the donor's best checkpoint
    (warm-started, then excluded from every update) while the adapter
    factors move."""
    _, task, _, trainer, donor_trainer = finetuned
    donor_params = load_checkpoint_params(donor_trainer.ckpt_dir)  # best
    base = _flat(trainer.params["params"])
    donor_flat = _flat(donor_params["params"] if "params" in donor_params
                       else donor_params)
    assert base.keys() == donor_flat.keys()
    for k in base:
        np.testing.assert_array_equal(base[k], donor_flat[k], err_msg=k)

    lora_flat = _flat(trainer.params["lora"])
    b_leaves = {k: v for k, v in lora_flat.items() if k.endswith("/b")}
    assert b_leaves
    moved = [k for k, v in b_leaves.items() if np.abs(v).max() > 0]
    assert moved, "no adapter factor received an update"
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_finetune_optimizer_state_is_adapter_sized(finetuned):
    """optax.masked: Adam moments exist ONLY for adapter leaves (exactly
    mu+nu per factor). Full Adam would hold 2*n_params moment entries; at
    this toy width (rank 4 on 16-wide kernels) the adapters are ~1/4 of
    that, and the ratio improves linearly with model width."""
    _, task, _, trainer, _ = finetuned
    n_params = sum(np.size(v) for v in _flat(trainer.params["params"]).values())
    inner = trainer.opt_state.inner_state
    moments = [l for l in jax.tree.leaves(inner)
               if hasattr(l, "size") and np.ndim(l) >= 2]
    n_moments = sum(int(np.size(l)) for l in moments)
    n_adapters = sum(np.size(v) for k, v in _flat(trainer.params["lora"]).items()
                     if k.endswith(("/a", "/b")))
    assert n_moments <= 2 * n_adapters + 16
    assert n_moments < n_params  # < half of full Adam's 2*n_params


def test_finetune_export_bakes_adapters(finetuned, tmp_path):
    from m2mixer_tpu.serving import export_serving, load_serving

    _, task, _, trainer, _ = finetuned
    batch = _batch(8, seed=5)
    d = export_serving(task, trainer.params, _batch(8), str(tmp_path / "art"),
                       fmt="stablehlo", buckets=(8,))
    model = load_serving(d)
    out = model.predict(batch)["logits"]

    merged = resolve_lora(jax.tree.map(np.asarray, trainer.params))
    direct = task.network.apply(merged, **task.network_inputs(batch),
                                deterministic=True)["logits"]
    np.testing.assert_allclose(out, np.asarray(direct), rtol=2e-5, atol=2e-5)
    # adapters actually matter: the UNadapted base must predict differently
    stripped = {k: v for k, v in merged.items() if k != "params"}
    base_only = dict(stripped, params=jax.tree.map(
        np.asarray, trainer.params["params"]))
    base_logits = task.network.apply(base_only, **task.network_inputs(batch),
                                     deterministic=True)["logits"]
    assert np.abs(np.asarray(base_logits) - np.asarray(direct)).max() > 0


def test_warmstart_partial_graft_keeps_fresh_mismatches(donor, tmp_path):
    """train.init_from with a resized image token-mix (token_dim 8 -> 12):
    the resized kernels keep their fresh init, everything else grafts, and
    the fit runs (head-swap / surgery transfer)."""
    donor_cfg, donor_trainer = donor
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.modalities.image.token_dim = 12
    cfg.train.init_from = donor_trainer.ckpt_dir
    cfg.train.epochs = 1

    import io
    from contextlib import redirect_stdout

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="headswap", full_cfg=cfg)
    buf = io.StringIO()
    with redirect_stdout(buf):
        trainer.fit(task, dm)
    assert "warm-started" in buf.getvalue()
    assert "shape-mismatched" in buf.getvalue()
    assert np.isfinite(trainer.callback_metrics["val_loss"])


def test_warmstart_wrong_checkpoint_fails_loudly(donor, tmp_path):
    donor_cfg, donor_trainer = donor
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.train.init_from = str(tmp_path / "missing")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="bad", full_cfg=cfg)
    with pytest.raises(FileNotFoundError):
        trainer.fit(task, dm)


def test_average_checkpoints_resolves_lora(finetuned):
    """Checkpoint averaging over a LoRA run: factors are merged BEFORE
    averaging (the delta is bilinear in (A, B)) and the soup is a plain
    weights tree."""
    from m2mixer_tpu.serving import average_checkpoints

    _, task, _, trainer, _ = finetuned
    soup = average_checkpoints(trainer.ckpt_dir)
    assert "lora" not in soup
    tree = soup["params"] if "params" in soup else soup
    flat = _flat(tree)
    ref = _flat(trainer.params["params"])
    assert set(ref).issubset(set(flat)) or set(flat) == set(ref)
