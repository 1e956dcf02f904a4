"""FSDP (ZeRO-3) parameter/optimizer sharding over the mesh 'data' axis.

The reference has no distributed code at all (SURVEY.md §2.6); FSDP here is
pure layout: `parallel/mesh.py::_fsdp_spec` composes a 'data'-axis shard
onto each leaf's TP/EP/PP spec and XLA derives the all-gather /
reduce-scatter schedule. These tests pin the rule engine and prove e2e
parity with replicated training on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from m2mixer_tpu.parallel import MeshConfig, make_mesh, param_shardings


def test_fsdp_specs_compose_with_tp():
    """fsdp=True: TP kernels become 2-D sharded, replicated-large leaves
    shard their largest divisible dim over 'data', tiny leaves stay put."""
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = {
        "channel_mix": {
            "fc1": {"linear": {"kernel": jnp.zeros((128, 512)),
                               "bias": jnp.zeros((512,))}},
            "fc2": {"linear": {"kernel": jnp.zeros((512, 128)),
                               "bias": jnp.zeros((128,))}},
        },
        # no TP rule matches: pure FSDP on the largest divisible dim
        "patch_embed": {"kernel": jnp.zeros((196, 64))},
        # too small to be worth gathering (size < fsdp_min_size)
        "head": {"kernel": jnp.zeros((32, 10))},
        # no dim divisible by the data axis -> stays replicated
        "odd": {"kernel": jnp.zeros((9, 4098))},  # 4098 % 4 != 0, 9 % 4 != 0
    }
    sh = param_shardings(mesh, params, model_min_dim=256, fsdp=True,
                         fsdp_min_size=4096)
    cm = sh["channel_mix"]
    assert cm["fc1"]["linear"]["kernel"].spec == P("data", "model")
    assert cm["fc2"]["linear"]["kernel"].spec == P("model", "data")
    # bias (512,) already sharded over 'model' and only 512 elements
    assert cm["fc1"]["linear"]["bias"].spec == P("model")
    assert sh["patch_embed"]["kernel"].spec == P("data", None)  # largest divisible dim
    assert sh["head"]["kernel"].spec == P()
    assert sh["odd"]["kernel"].spec == P()


def test_fsdp_off_is_identity():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    params = {"patch_embed": {"kernel": jnp.zeros((196, 64))}}
    assert param_shardings(mesh, params)["patch_embed"]["kernel"].spec == P()


CFG = """
train:
  tensorboard_path: /tmp/fsdp_test_logs
  log_interval_steps: 5
  epochs: 1
  compiled_epochs: true
  fsdp: {fsdp}
  fsdp_min_size: 1024
  optimizer: {{lr: 1e-3, weight_decay: 0.0, scheduler_patience: 2}}
  seed: 5
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, synthetic: true,
           synthetic_sizes: [32, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                     input_shape: [16, 8, 32]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 14,
            image_size: [28, 28], token_dim: 8, channel_dim: 256, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 56,
            image_size: [112, 112], token_dim: 8, channel_dim: 256, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                 hidden_dim: 32, token_dim: 8, channel_dim: 256, num_mixers: 1}}
"""


def _fit(fsdp: bool, mesh_config):
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training import Trainer

    cfg = loads(CFG.format(fsdp=str(fsdp).lower()))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"fsdp_{fsdp}_{mesh_config.data}",
                      mesh_config=mesh_config, full_cfg=cfg)
    trainer.fit(task, dm)
    return trainer


def test_fsdp_e2e_parity_and_memory():
    """Training with FSDP over a 4x2 mesh (composed with TP) matches
    single-device losses, and params + Adam moments actually live split:
    each device holds 1/4 of every fsdp-sharded leaf."""
    t = _fit(True, MeshConfig(data=4, model=2, model_min_dim=256))
    ref = _fit(False, MeshConfig(data=1, model=1))
    np.testing.assert_allclose(t.callback_metrics["val_loss"],
                               ref.callback_metrics["val_loss"], rtol=1e-4)

    k = t.params["params"]["encoders_0"]["block_0"]["channel_mix"]["fc1"]["linear"]["kernel"]
    assert k.sharding.spec == P("data", "model"), k.sharding
    # the leaf occupies 1/(4*2) of its bytes per device
    assert k.addressable_shards[0].data.size == k.size // 8

    # a pure-FSDP leaf (no TP rule): the patch-embed GEMM kernel
    pe = jax.tree_util.tree_flatten_with_path(t.params)[0]
    pure = [v for p, v in pe
            if "patch" in jax.tree_util.keystr(p)
            and "data" in str(getattr(v.sharding, "spec", ""))]
    assert pure, "no patch-embed leaf was FSDP-sharded"

    # Adam moments inherit the params layout (ZeRO: optimizer state sharded)
    moments = [v for v in jax.tree.leaves(t.opt_state)
               if hasattr(v, "sharding") and v.shape == k.shape]
    assert moments and all(
        "data" in str(m.sharding.spec) for m in moments), \
        "Adam moments for the FSDP kernel are not data-sharded"


def test_fsdp_per_step_path_parity():
    """The non-compiled (per-step jit) path trains identically under FSDP."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training import Trainer

    losses = {}
    for fsdp, mc in ((True, MeshConfig(data=8, model=1)),
                     (False, MeshConfig(data=1, model=1))):
        cfg = loads(CFG.format(fsdp=str(fsdp).lower()))
        cfg.train.compiled_epochs = False
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name=f"fsdp_step_{fsdp}",
                          mesh_config=mc, full_cfg=cfg)
        trainer.fit(task, dm)
        losses[fsdp] = trainer.callback_metrics["val_loss"]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-4)
