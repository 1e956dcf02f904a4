"""Variant-path e2e tests: GMU fusion, DynaMixer blocks, bf16 precision,
and reference-quirk order parity."""

import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer

BASE = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  {extra}
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: {img_block}, in_channels: 1, hidden_dim: 16, patch_size: {img_patch},
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1,
             num_head: 4, reduced_dim: 2, d_model: 16, d_ffn: 32, n_blocks: 2}}
    audio: {{block_type: {img_block}, in_channels: 1, hidden_dim: 16, patch_size: {aud_patch},
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1,
             num_head: 4, reduced_dim: 2, d_model: 16, d_ffn: 32, n_blocks: 2}}
    multimodal: {{{multimodal}}}
"""


def run(tmp_path, **fmt):
    cfg = loads(BASE.format(tmp=tmp_path, **fmt))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="variant", full_cfg=cfg)
    trainer.fit(task, dm)
    return trainer.test(task, dm, ckpt="best")


def test_gmu_fusion_e2e(tmp_path):
    """Parameter-carrying fusion module (BiModalGatedUnit) through the full
    trainer (the avmnist_gated_4loss topology)."""
    logs = run(
        tmp_path, extra="mute: image", img_block="MLPMixer", img_patch=14, aud_patch=56,
        multimodal=("block_type: FusionMixer, fusion_function: BiModalGatedUnit, "
                    "mod1_in: 16, mod2_in: 16, out_size: 16, hidden_dim: 16, "
                    "token_dim: 8, channel_dim: 32, num_mixers: 1"),
    )
    assert np.isfinite(logs["test_loss"]) and "test_acc" in logs


def test_dynamixer_e2e(tmp_path):
    """DynaMixer encoders + MaxFusion + FusionDynaMixer (the 3loss_dyna
    topology) through the full trainer, 2-D token grids end-to-end."""
    logs = run(
        tmp_path, extra="", img_block="DynaMixer", img_patch=7, aud_patch=28,
        multimodal=("block_type: FusionDynaMixer, fusion_function: MaxFusion, "
                    "hidden_dim: 16, num_mixers: 1, num_head: 4, reduced_dim: 2"),
    )
    assert np.isfinite(logs["test_loss"]) and "test_acc" in logs


def test_gmlp_e2e(tmp_path):
    """VisiongMLP encoders + FusiongMLP fusion (stochastic depth active)."""
    logs = run(
        tmp_path, extra="", img_block="VisiongMLP", img_patch=14, aud_patch=56,
        multimodal=("block_type: FusiongMLP, fusion_function: ConcatFusion, "
                    "d_model: 16, d_ffn: 32, n_blocks: 2, hidden_dim: 16"),
    )
    assert np.isfinite(logs["test_loss"]) and "test_acc" in logs


def test_bf16_precision_e2e(tmp_path):
    logs = run(
        tmp_path, extra="precision: bf16", img_block="MLPMixer", img_patch=14,
        aud_patch=56,
        multimodal=("block_type: FusionMixer, fusion_function: ConcatFusion, "
                    "hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1"),
    )
    assert np.isfinite(logs["test_loss"])
    # bf16 compute should land near the f32 random-init CE ballpark
    assert logs["test_loss"] < 4 * np.log(10)


def test_bf16_moment_adam_e2e(tmp_path):
    """`optimizer.moment_dtype: bf16` stores Adam's first moment in bfloat16
    (measured +7.4% step throughput on TPU — the optimizer pass is
    HBM-traffic bound at the reference model sizes)."""
    import jax.numpy as jnp

    from m2mixer_tpu.config import loads

    cfg = loads(BASE.format(
        tmp=tmp_path, extra="", img_block="MLPMixer", img_patch=14, aud_patch=56,
        multimodal=("block_type: FusionMixer, fusion_function: ConcatFusion, "
                    "hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1"),
    ))
    cfg.train.optimizer.moment_dtype = "bf16"
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="bf16mu", full_cfg=cfg)
    trainer.fit(task, dm)
    assert np.isfinite(trainer.callback_metrics["val_loss"])
    import jax

    dtypes = {x.dtype for x in jax.tree.leaves(trainer.opt_state)
              if hasattr(x, "dtype")}
    assert any(d == jnp.bfloat16 for d in dtypes)  # mu really is stored bf16


def test_approximate_gelu_e2e(tmp_path):
    """model.approximate_gelu: tanh GELU (the measured TPU forward lever,
    2.9x encoder fwd at batch 512) — must train to ~the same loss as exact
    erf, and the flag must reset per task build."""
    import jax.numpy as jnp

    from m2mixer_tpu.modules import common

    x = jnp.linspace(-5, 5, 101)
    prev = common.set_gelu_approximate(True)
    tanh_y = common.gelu(x)
    common.set_gelu_approximate(prev)
    exact_y = common.gelu(x)
    assert float(jnp.abs(tanh_y - exact_y).max()) < 3e-3

    kwargs = dict(img_block="MLPMixer", img_patch=14, aud_patch=56,
                  multimodal=("block_type: FusionMixer, fusion_function: ConcatFusion, "
                              "hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1"))
    try:
        approx = run(tmp_path / "tanh", extra="approximate_gelu: true", **kwargs)
        exact = run(tmp_path / "exact", extra="", **kwargs)
    finally:
        common.set_gelu_approximate(False)
    assert np.isfinite(approx["test_loss"])
    assert abs(approx["test_loss"] - exact["test_loss"]) < 0.05 * exact["test_loss"] + 0.05


def test_gelu_flavor_follows_owning_task(tmp_path):
    """Two live tasks with different GELU flavors in one process: each
    task's traces must use ITS config (bind_trace_flavors re-asserts the
    flavor at every trace entry), regardless of construction order."""
    import jax
    import jax.numpy as jnp

    from m2mixer_tpu.config import loads
    from m2mixer_tpu.modules import common

    def make(approx):
        cfg = loads(BASE.format(
            tmp=tmp_path, extra=f"approximate_gelu: {str(approx).lower()}",
            img_block="MLPMixer", img_patch=14, aud_patch=56,
            multimodal=("block_type: FusionMixer, fusion_function: ConcatFusion, "
                        "hidden_dim: 16, token_dim: 8, channel_dim: 32, "
                        "num_mixers: 1")))
        return get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)

    try:
        t_tanh = make(True)
        t_exact = make(False)  # built LAST — globals now point at exact
        batch = {
            "image": np.random.RandomState(0).rand(4, 1, 28, 28).astype(np.float32),
            "audio": np.random.RandomState(1).rand(4, 1, 112, 112).astype(np.float32),
            "label": np.zeros((4,), np.int32),
        }
        params = t_exact.init_params(jax.random.PRNGKey(0), batch)
        ctx = {k: np.asarray(v) for k, v in t_exact.make_ctx(0, "val").items()}
        # same params, same batch: the tanh task must still trace tanh
        loss_tanh, _ = jax.jit(lambda p, b: t_tanh.step(p, b, ctx, {}, False))(params, batch)
        loss_exact, _ = jax.jit(lambda p, b: t_exact.step(p, b, ctx, {}, False))(params, batch)
        assert float(loss_tanh) != float(loss_exact)  # flavors really differ
        assert abs(float(loss_tanh) - float(loss_exact)) < 0.05  # ...slightly
    finally:
        common.set_gelu_approximate(False)


def test_bits_dropout_e2e(tmp_path):
    """model.bits_dropout: uint8-random-bits masks (+13% step at batch 512).
    Mask must keep ~(1-rate) of elements unbiasedly and be identity in eval;
    and the model must train normally."""
    import jax
    import jax.numpy as jnp

    from m2mixer_tpu.modules import common

    prev = common.set_bits_dropout(True)
    try:
        drop = common.Dropout(rate=0.5)
        x = jnp.ones((64, 1024), jnp.bfloat16)
        y = drop.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
        kept = float((y != 0).mean())
        assert abs(kept - 0.5) < 0.03
        # inverse-keep scaling keeps the expectation at 1
        assert abs(float(y.astype(jnp.float32).mean()) - 1.0) < 0.05
        assert (drop.apply({}, x, True) == x).all()  # eval = identity
    finally:
        common.set_bits_dropout(prev)

    # edge rates: ~1 matches the bernoulli path's all-zeros; tiny rates
    # still drop (thresh clamps to 1/256) instead of silently no-op'ing
    prev = common.set_bits_dropout(True)
    try:
        x = jnp.ones((16, 512), jnp.float32)
        y1 = common.Dropout(rate=0.999).apply(
            {}, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
        assert (np.asarray(y1) == 0).all()
        y2 = common.Dropout(rate=0.001).apply(
            {}, x, False, rngs={"dropout": jax.random.PRNGKey(2)})
        dropped = float((np.asarray(y2) == 0).mean())
        assert 0 < dropped < 0.02
        assert np.isfinite(np.asarray(y2)).all()
    finally:
        common.set_bits_dropout(prev)

    from m2mixer_tpu.config import loads

    cfg = loads(BASE.format(
        tmp=tmp_path, extra="bits_dropout: true", img_block="MLPMixer",
        img_patch=14, aud_patch=56,
        multimodal=("block_type: FusionMixer, fusion_function: ConcatFusion, "
                    "hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1"),
    ))
    cfg.model.dropout = 0.3  # explicit override, not a duplicate YAML key
    try:
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name="bitsdrop", full_cfg=cfg)
        trainer.fit(task, dm)
        logs = trainer.test(task, dm, ckpt="best")
    finally:
        common.set_bits_dropout(False)
    assert np.isfinite(logs["test_loss"])


def test_mimic_shuffle_order_matches_reference_style():
    """The reference shuffles the sample-tuple LIST with random.seed(10);
    we shuffle an index list the same way — random.shuffle consumes the RNG
    identically for any list of equal length, so orders must coincide."""
    import random

    n = 137
    objs = [(i, f"sample{i}") for i in range(n)]
    random.seed(10)
    random.shuffle(objs)
    ref_order = [o[0] for o in objs]

    idx = list(range(n))
    random.seed(10)
    random.shuffle(idx)
    assert idx == ref_order


def test_stacked_pallas_e2e(tmp_path):
    """Whole-encoder fused kernels (PallasStacked*) through the full trainer
    (interpret mode on CPU; compiled Mosaic on TPU)."""
    logs = run(
        tmp_path, extra="", img_block="PallasStackedMLPMixer", img_patch=14,
        aud_patch=56,
        multimodal=("block_type: PallasStackedFusionMixer, fusion_function: ConcatFusion, "
                    "hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1"),
    )
    assert np.isfinite(logs["test_loss"]) and "test_acc" in logs
