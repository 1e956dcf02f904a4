"""Quantization-aware training (model.qat, modules/qat.py).

Beyond the reference (which has no quantization story): eligible weight
leaves fake-quantize inside the traced forward with a straight-through
estimator, using EXACTLY the serving PTQ math. The contract under test:

- the fake quantizer's values are bit-identical to
  ``serving.dequantize_weights(serving.quantize_weights(w))`` for both
  modes, including the int4 group-size selection and int8 fallbacks;
- gradients pass through the rounding as identity (STE);
- checkpoints keep LATENT float weights (QAT is trace-time only);
- ``serving export --quantize <matching mode>`` reproduces the trained
  eval forward (the deployment-is-lossless guarantee).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules.qat import (
    Q4_GROUP, fake_quantize, fake_quantize_leaf, int4_group_size,
    leaf_eligible, parse_qat_config)
from m2mixer_tpu.serving import dequantize_weights, quantize_weights
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
  qat: {{mode: {mode}, min_size: 128}}
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


def _tree(seed=0):
    rng = np.random.RandomState(seed)
    leaf = lambda *s: (rng.randn(*s) * 0.1).astype(np.float32)
    return {
        "dense": {"kernel": leaf(64, 128), "bias": leaf(128)},
        "stacked": {"tok_kernel": leaf(3, 2, 32, 64)},  # (L, 2, in, out)
        "odd_in": {"kernel": leaf(63, 128)},      # int4 -> int8 fallback
        "ragged": {"kernel": leaf(100, 64)},      # int4 group 50, not 64
        "tiny": {"kernel": leaf(8, 8)},           # below min_size: untouched
    }


# ------------------------------------------------------------------- units
def test_int4_group_size_selection():
    assert int4_group_size(64) == 64
    assert int4_group_size(128) == 64           # capped at the default group
    assert int4_group_size(100) == 50           # largest even divisor <= 64
    assert int4_group_size(63) is None          # odd input axis
    assert int4_group_size(14) == 14
    assert int4_group_size(8) is None           # scales would outweigh packing
    assert int4_group_size(6) is None


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_fake_quant_bit_matches_serving_ptq(mode):
    """The deployment-is-lossless foundation: training-time fake-quant and
    the serving quantize->dequantize roundtrip produce the SAME values."""
    tree = _tree()
    min_size = 128
    fq = jax.tree.map(np.asarray,
                      fake_quantize(tree, mode=mode, min_size=min_size))
    ptq = jax.tree.map(
        np.asarray,
        dequantize_weights(quantize_weights(tree, min_size=min_size,
                                            mode=mode)))
    flat_fq = jax.tree_util.tree_leaves_with_path(fq)
    flat_ptq = {jax.tree_util.keystr(p): l
                for p, l in jax.tree_util.tree_leaves_with_path(ptq)}
    for path, leaf in flat_fq:
        np.testing.assert_array_equal(
            leaf, flat_ptq[jax.tree_util.keystr(path)],
            err_msg=f"{mode} drift at {jax.tree_util.keystr(path)}")

    # ineligible leaves pass through as the same values
    np.testing.assert_array_equal(fq["tiny"]["kernel"], tree["tiny"]["kernel"])
    np.testing.assert_array_equal(fq["dense"]["bias"], tree["dense"]["bias"])
    # eligible leaves actually changed (the rounding is real)
    assert not np.array_equal(fq["dense"]["kernel"], tree["dense"]["kernel"])


def test_eligibility_predicate():
    assert leaf_eligible(np.zeros((64, 128), np.float32), 4096)
    assert not leaf_eligible(np.zeros((16, 16), np.float32), 4096)  # small
    assert not leaf_eligible(np.zeros((8192,), np.float32), 4096)   # 1-D
    assert not leaf_eligible(np.zeros((64, 128), np.int32), 1)      # not float
    assert leaf_eligible(jnp.zeros((64, 128), jnp.bfloat16), 4096)  # ml_dtypes


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_ste_gradient_is_identity(mode):
    w = jnp.asarray(np.random.RandomState(0).randn(32, 64).astype(np.float32))
    c = jnp.asarray(np.random.RandomState(1).randn(32, 64).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(fake_quantize_leaf(w, mode) * c))(w)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(c))


def test_parse_qat_config():
    assert parse_qat_config(None)[0] is None
    assert parse_qat_config(False)[0] is None
    assert parse_qat_config(True) == ("int8", 4096, Q4_GROUP)
    assert parse_qat_config("int4")[0] == "int4"
    mode, ms, gs = parse_qat_config({"mode": "int4", "min_size": 64,
                                     "group_size": 32})
    assert (mode, ms, gs) == ("int4", 64, 32)
    with pytest.raises(ValueError, match="mode must be"):
        parse_qat_config("int2")
    with pytest.raises(ValueError, match="min_size"):
        parse_qat_config({"min_size": 0})
    with pytest.raises(ValueError, match="group_size"):
        parse_qat_config({"mode": "int4", "group_size": 6})
    with pytest.raises(ValueError, match="must be"):
        parse_qat_config(3)


# ----------------------------------------------------------------- task/e2e
@pytest.fixture(scope="module", params=["int8"])
def fitted(request, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("qat")
    cfg = loads(CFG.format(tmp=tmp, mode=request.param))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="qat", full_cfg=cfg)
    trainer.fit(task, dm)
    return cfg, task, trainer, dm


def test_fit_trains_and_checkpoints_stay_float(fitted):
    cfg, task, trainer, dm = fitted
    from m2mixer_tpu.training.warmstart import load_checkpoint_params

    params = load_checkpoint_params(trainer.checkpoints.best_path())
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        assert np.issubdtype(np.asarray(leaf).dtype, np.floating), (
            f"checkpoint leaf {jax.tree_util.keystr(path)} is not latent "
            "float — QAT must never quantize stored weights")


def test_eval_step_uses_fake_quant_weights(fitted):
    cfg, task, trainer, dm = fitted
    batch = {k: jnp.asarray(v) for k, v in _batch(8).items()}
    params = trainer.params
    _, aux = task.step(params, batch, task.make_ctx(0, "val"), {}, train=False)

    manual = task.network.apply(
        fake_quantize(params, task.qat_mode, task.qat_min_size,
                      task.qat_group_size),
        **task.network_inputs(batch), deterministic=True)
    np.testing.assert_allclose(np.asarray(aux["logits"]),
                               np.asarray(manual["logits"]),
                               rtol=1e-6, atol=1e-6)

    # and it differs from the latent-weight forward: QAT is actually on
    latent = task.network.apply(params, **task.network_inputs(batch),
                                deterministic=True)
    assert not np.allclose(np.asarray(aux["logits"]),
                           np.asarray(latent["logits"]), rtol=0, atol=0)


def test_export_matching_quantize_is_lossless(fitted, tmp_path):
    """`serving export --quantize int8` of a QAT run reproduces the trained
    eval forward — THE property QAT exists for."""
    from m2mixer_tpu.serving import export_serving, load_serving

    cfg, task, trainer, dm = fitted
    params = trainer.params
    batch = _batch(8, seed=2)

    d = export_serving(task, params, batch, str(tmp_path / "art"),
                       fmt="stablehlo", buckets=(8,), quantize=task.qat_mode)
    assert task.qat_mode == "int8"  # suppression was restored
    model = load_serving(d)
    served = model.predict(batch)["logits"]

    _, aux = task.step(params, {k: jnp.asarray(v) for k, v in batch.items()},
                       task.make_ctx(0, "test"), {}, train=False)
    np.testing.assert_allclose(served, np.asarray(aux["logits"]),
                               rtol=2e-5, atol=2e-5)


def test_export_without_quantize_keeps_fake_quant_in_trace(fitted, tmp_path):
    from m2mixer_tpu.serving import export_serving, load_serving

    cfg, task, trainer, dm = fitted
    params = trainer.params
    batch = _batch(8, seed=3)

    d_plain = export_serving(task, params, batch, str(tmp_path / "plain"),
                             fmt="stablehlo", buckets=(8,))
    d_q = export_serving(task, params, batch, str(tmp_path / "quant"),
                         fmt="stablehlo", buckets=(8,),
                         quantize=task.qat_mode)
    plain = load_serving(d_plain).predict(batch)["logits"]
    quant = load_serving(d_q).predict(batch)["logits"]
    # both artifacts serve the SAME (quantized) forward; only the payload
    # representation differs
    np.testing.assert_allclose(plain, quant, rtol=2e-5, atol=2e-5)
