"""Pipeline parallelism (parallel/pipeline.py + PipelinedFusionMixer).

Validated on the virtual 8-device CPU mesh: schedule correctness (forward
bit-parity vs the sequential stacked math), autodiff through the permute
chain (grad parity), the layer-axis parameter sharding rule, and an
end-to-end DP x PP training run through the Trainer.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules import PipelinedFusionMixer, StackedFusionMixer
from m2mixer_tpu.parallel import (
    MeshConfig,
    make_mesh,
    param_shardings,
    pipeline_mesh,
    set_pipeline_mesh,
)
from m2mixer_tpu.training import Trainer

GEO = dict(hidden_dim=16, num_patches=8, num_mixers=4, token_dim=8,
           channel_dim=32)


@contextlib.contextmanager
def pipeline_ctx(mesh):
    prev = set_pipeline_mesh(mesh)
    try:
        yield
    finally:
        set_pipeline_mesh(prev)


def test_mesh_grows_pipe_axis_only_when_requested():
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    assert dict(mesh.shape) == {"data": 2, "model": 1, "pipe": 4}
    # pipe=1 keeps the 2-axis layout every existing PartitionSpec assumes
    assert "pipe" not in make_mesh(MeshConfig(data=4, model=2)).shape


def test_pipe_rule_shards_stacked_leaves():
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    params = {
        "token_fc1_kernel": jnp.zeros((4, 8, 8)),
        "channel_fc2_bias": jnp.zeros((4, 16)),
        "norm_token_scale": jnp.zeros((4, 16)),
        "norm_out_scale": jnp.zeros((16,)),       # unstacked -> replicated
        "token_fc1_kernel_odd": jnp.zeros((3, 8, 8)),  # L % S != 0 -> replicated
    }
    s = param_shardings(mesh, params)
    assert s["token_fc1_kernel"].spec == P("pipe")
    assert s["channel_fc2_bias"].spec == P("pipe")
    assert s["norm_token_scale"].spec == P("pipe")
    assert s["norm_out_scale"].spec == P()
    assert s["token_fc1_kernel_odd"].spec == P()
    # the paired encoder uses the same stacked leaf names but runs
    # replicated — it must NOT be pipe-sharded (that would all-gather
    # encoder weights every step)
    paired = {"paired_encoder": {"token_fc1_kernel": jnp.zeros((4, 8, 8))}}
    sp = param_shardings(mesh, paired)
    assert sp["paired_encoder"]["token_fc1_kernel"].spec == P()


def _modules():
    return (StackedFusionMixer(**GEO, dropout=0.0),
            PipelinedFusionMixer(**GEO, dropout=0.0))


def test_pipelined_forward_matches_stacked():
    """Deterministic forward through the 4-stage pipeline must equal the
    sequential stacked math bit-for-bit (same params, same input)."""
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    stacked, piped = _modules()
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 16))
    params = stacked.init(jax.random.PRNGKey(1), x)
    ref = stacked.apply(params, x)
    with pipeline_ctx(mesh):
        assert pipeline_mesh() is mesh
        out = jax.jit(lambda p, x: piped.apply(p, x))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipelined_grad_matches_stacked():
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=2))
    stacked, piped = _modules()
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 16))
    params = stacked.init(jax.random.PRNGKey(3), x)

    def loss(module):
        return lambda p: (module.apply(p, x) ** 2).sum()

    g_ref = jax.grad(loss(stacked))(params)
    with pipeline_ctx(mesh):
        g_pipe = jax.jit(jax.grad(loss(piped)))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_pipe = jax.tree_util.tree_leaves(g_pipe)
    for a, b in zip(flat_ref, flat_pipe):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_pipelined_fallback_without_context_is_stacked():
    """No pipeline mesh installed -> the module IS a StackedFusionMixer."""
    stacked, piped = _modules()
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 8, 16))  # 6 % M too
    params = stacked.init(jax.random.PRNGKey(5), x)
    assert pipeline_mesh() is None
    np.testing.assert_array_equal(np.asarray(piped.apply(params, x)),
                                  np.asarray(stacked.apply(params, x)))


def test_pipelined_fallback_on_indivisible_shapes():
    """L % S != 0 or batch % (M * data) != 0 degrade to sequential math at
    trace time instead of failing."""
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    stacked = StackedFusionMixer(**dict(GEO, num_mixers=3), dropout=0.0)
    piped = PipelinedFusionMixer(**dict(GEO, num_mixers=3), dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 8, 16))
    params = stacked.init(jax.random.PRNGKey(7), x)
    with pipeline_ctx(mesh):
        out = piped.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(stacked.apply(params, x)))


def test_pipelined_dropout_draws_per_microbatch():
    """Stochastic pipeline forward: runs, differs from deterministic, and
    microbatches see different masks (outputs differ across identical
    microbatch rows)."""
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=2))
    piped = PipelinedFusionMixer(**GEO, dropout=0.5, microbatches=2)
    same = jnp.ones((4, 8, 16))
    params = piped.init(jax.random.PRNGKey(8), same)
    with pipeline_ctx(mesh):
        det = piped.apply(params, same)
        sto = piped.apply(params, same, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(9)})
    assert np.all(np.isfinite(np.asarray(sto)))
    assert not np.allclose(np.asarray(sto), np.asarray(det))
    # rows 0..1 are microbatch 0, rows 2..3 microbatch 1: identical inputs,
    # independent masks
    assert not np.allclose(np.asarray(sto)[0], np.asarray(sto)[2])
    # within a microbatch the mask broadcast is per-element, rows match
    np.testing.assert_allclose(np.asarray(det)[0], np.asarray(det)[1],
                               rtol=1e-6, atol=1e-6)


E2E_CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  compiled_epochs: true
  mesh_data: 2
  mesh_model: 1
  mesh_pipe: {pipe}
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 11
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
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: PipelinedFusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 4,
                  microbatches: 4}}
"""


def _run_e2e(tmp_path, pipe: int):
    cfg = loads(E2E_CFG.format(tmp=tmp_path, pipe=pipe))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"pp_{pipe}", full_cfg=cfg)
    try:
        trainer.fit(task, dm)
        # the trainer must restore the trace-time context on exit so later
        # traces in this process (serving export, other trainers) never
        # inherit the training mesh
        assert pipeline_mesh() is None
        return trainer
    finally:
        set_pipeline_mesh(None)


def test_pipelined_checkpoint_serves_sequentially(tmp_path):
    """Params of a task whose fusion stack is pipelined deploy through
    serving with NO pipeline context: the artifact runs the math-identical
    sequential fallback, so served logits must match a direct pipelined
    forward under the training mesh."""
    from m2mixer_tpu.serving import export_serving, load_serving

    cfg = loads(E2E_CFG.format(tmp=tmp_path, pipe=4))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(8, 1, 28, 28).astype(np.float32),
        "audio": rng.rand(8, 1, 112, 112).astype(np.float32),
        "label": rng.randint(0, 10, (8,)).astype(np.int32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(MeshConfig(data=2, model=1, pipe=4))
    with pipeline_ctx(mesh):
        direct = jax.jit(
            lambda p, b: task.network.apply(p, **task.network_inputs(b),
                                            deterministic=True)
        )(params, batch)
    assert pipeline_mesh() is None  # context restored: export is sequential
    d = export_serving(task, params, batch, str(tmp_path / "art"),
                       fmt="stablehlo", buckets=(8,))
    out = load_serving(d).predict(batch)
    np.testing.assert_allclose(out["logits"], np.asarray(direct["logits"]),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_training_matches_sequential(tmp_path):
    """Full Trainer run (epoch-compiled scan, DP=2 x PP=4) vs the same model
    with pipe=1 (sequential fallback): identical data order and rng folding,
    so train/val losses must agree to fp tolerance."""
    t_pp = _run_e2e(tmp_path / "pp", pipe=4)
    t_seq = _run_e2e(tmp_path / "seq", pipe=1)
    for key in ("train_loss", "val_loss", "val_acc"):
        np.testing.assert_allclose(
            t_pp.callback_metrics[key], t_seq.callback_metrics[key],
            rtol=5e-4, atol=5e-5,
        )
