"""Mesh + sharding-rule tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from m2mixer_tpu.parallel import MeshConfig, make_mesh, param_shardings, shard_batch


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(MeshConfig(data=-1, model=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data=16, model=2))


def test_tp_rules_shard_channel_mix():
    """Channel-mix FF kernels must get Megatron-style TP specs when the dim
    divides the model axis and clears the size threshold."""
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = {
        "block_0": {
            "channel_mix": {
                "fc1": {"linear": {"kernel": jnp.zeros((128, 512)), "bias": jnp.zeros((512,))}},
                "fc2": {"linear": {"kernel": jnp.zeros((512, 128)), "bias": jnp.zeros((128,))}},
            },
            "token_mix": {
                "fc1": {"linear": {"kernel": jnp.zeros((4, 16)), "bias": jnp.zeros((16,))}},
            },
        }
    }
    shardings = param_shardings(mesh, params, model_min_dim=256)
    cm = shardings["block_0"]["channel_mix"]
    assert cm["fc1"]["linear"]["kernel"].spec == P(None, "model")
    assert cm["fc1"]["linear"]["bias"].spec == P("model")
    assert cm["fc2"]["linear"]["kernel"].spec == P("model", None)
    # token mix too small -> replicated
    assert shardings["block_0"]["token_mix"]["fc1"]["linear"]["kernel"].spec == P()


def test_tp_respects_divisibility_and_threshold():
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = {
        "channel_mix": {
            # 130 not divisible by 2 after threshold... (130 % 2 == 0 but < 256)
            "fc1": {"linear": {"kernel": jnp.zeros((64, 130)), "bias": jnp.zeros((130,))}},
        }
    }
    shardings = param_shardings(mesh, params, model_min_dim=256)
    assert shardings["channel_mix"]["fc1"]["linear"]["kernel"].spec == P()


def test_batch_sharding_places_batches():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    batch = {"x": np.zeros((16, 3)), "y": np.zeros((16,))}
    dev = shard_batch(mesh, batch)
    assert dev["x"].sharding.spec == P("data", None)
    assert dev["y"].sharding.spec == P("data")


def test_end_to_end_tp_training_step():
    """A real train step over a 4x2 mesh with TP-sharded channel FFs must
    produce identical loss to single-device execution."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training import Trainer

    cfg_text = """
train:
  tensorboard_path: /tmp/tp_test_logs
  log_interval_steps: 5
  epochs: 1
  compiled_epochs: false
  optimizer: {lr: 1e-3, weight_decay: 0.0, scheduler_patience: 2}
  seed: 5
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {data_dir: unused, batch_size: 16, synthetic: true,
           synthetic_sizes: [16, 16, 16]}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {num_classes: 10, classifier: StandardClassifier,
                     input_shape: [16, 8, 32]}
    image: {block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 14,
            image_size: [28, 28], token_dim: 8, channel_dim: 256, num_mixers: 1}
    audio: {block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 56,
            image_size: [112, 112], token_dim: 8, channel_dim: 256, num_mixers: 1}
    multimodal: {block_type: FusionMixer, fusion_function: ConcatFusion,
                 hidden_dim: 32, token_dim: 8, channel_dim: 256, num_mixers: 1}
"""
    results = {}
    for name, mc in (("tp", MeshConfig(data=4, model=2, model_min_dim=256)),
                     ("single", MeshConfig(data=1, model=1))):
        cfg = loads(cfg_text)
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name=f"tp_{name}", mesh_config=mc, full_cfg=cfg)
        trainer.fit(task, dm)
        results[name] = trainer.callback_metrics["val_loss"]
        if name == "tp":
            # verify channel-mix kernels are actually sharded over 'model'
            k = trainer.params["params"]["encoders_0"]["block_0"]["channel_mix"]["fc1"]["linear"]["kernel"]
            assert k.sharding.spec == P(None, "model"), k.sharding
    np.testing.assert_allclose(results["tp"], results["single"], rtol=1e-4)
