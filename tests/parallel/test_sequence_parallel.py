"""Sequence parallelism (parallel/mesh.py::shard_tokens).

SP here is the Megatron analog for mixer stacks: the residual stream's token
axis is sharded over the 'model' mesh axis between the GEMMs, so
LN/dropout/residual adds run token-sharded; XLA's SPMD partitioner inserts
the all-gather feeding the token-mix contraction. Opt-in via
``train.sequence_parallel``; must be numerically identical to the
unsharded run.
"""

import contextlib

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.parallel import (
    MeshConfig,
    activation_mesh,
    make_mesh,
    set_activation_mesh,
    shard_tokens,
)
from m2mixer_tpu.training import Trainer


@contextlib.contextmanager
def activation_ctx(mesh):
    prev = set_activation_mesh(mesh)
    try:
        yield
    finally:
        set_activation_mesh(prev)


def test_shard_tokens_constrains_token_axis():
    mesh = make_mesh(MeshConfig(data=2, model=4))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 16))
    with activation_ctx(mesh):
        out = jax.jit(shard_tokens)(x)
        assert out.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data", "model", None)), x.ndim)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
        # 4-D activations (MMixerBlock): tokens stay at axis -2
        x4 = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 8, 16))
        out4 = jax.jit(shard_tokens)(x4)
        assert out4.sharding.is_equivalent_to(
            NamedSharding(mesh, P("data", None, "model", None)), x4.ndim)


def test_shard_tokens_noop_paths():
    mesh = make_mesh(MeshConfig(data=2, model=4))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 6, 16))  # 6 % 4 != 0
    with activation_ctx(mesh):
        assert shard_tokens(x) is x
        y = jax.random.normal(jax.random.PRNGKey(3), (7, 8, 16))  # 7 % 2 != 0
        assert shard_tokens(y) is y
    # no mesh installed -> identity
    assert shard_tokens(x) is x
    # model axis 1 -> identity
    with activation_ctx(make_mesh(MeshConfig(data=8, model=1))):
        assert shard_tokens(x) is x


CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  compiled_epochs: true
  mesh_data: 2
  mesh_model: 4
  sequence_parallel: {sp}
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 2}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 2}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""


def _run(tmp_path, sp: bool):
    cfg = loads(CFG.format(tmp=tmp_path, sp=str(sp).lower()))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"sp_{sp}", full_cfg=cfg)
    try:
        trainer.fit(task, dm)
        # context must not leak past fit
        assert activation_mesh() is None
        return trainer
    finally:
        set_activation_mesh(None)


def test_sequence_parallel_training_matches_unsharded(tmp_path):
    """DP=2 x model=4 with token-sharded activations must reproduce the
    unsharded run (same seed/data order) to fp-reorder tolerance."""
    t_sp = _run(tmp_path / "sp", sp=True)
    t_ref = _run(tmp_path / "ref", sp=False)
    for key in ("train_loss", "val_loss", "val_acc"):
        np.testing.assert_allclose(
            t_sp.callback_metrics[key], t_ref.callback_metrics[key],
            rtol=5e-4, atol=5e-5,
        )
