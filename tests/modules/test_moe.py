"""Mixture-of-Experts blocks (modules/moe.py) + expert-parallel layout.

Covers: routing math (top-1 exactness against a hand-computed expert pass),
the Switch load-balance loss, top-k, the EP sharding rule, and an
end-to-end DP x EP training run with the aux loss flowing into the total.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.modules import MoEFeedForward, MoEFusionMixer
from m2mixer_tpu.parallel import MeshConfig, make_mesh, param_shardings
from m2mixer_tpu.training import Trainer


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def test_moe_top1_routing_is_exact():
    """y must equal p_win * FFN_win(x) per token, computed by hand from the
    params, with the balance loss sown into the 'moe' collection."""
    D, F, E = 8, 16, 4
    moe = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5, D))
    params = {"params": moe.init(jax.random.PRNGKey(1), x)["params"]}
    out, state = moe.apply(params, x, mutable=["moe"])

    p = params["params"]
    logits = x @ p["router"]["linear"]["kernel"] + p["router"]["linear"]["bias"]
    probs = jax.nn.softmax(logits, axis=-1)
    win = np.asarray(jnp.argmax(probs, axis=-1))
    ref = np.zeros((3, 5, D), np.float32)
    k1, b1 = np.asarray(p["expert_fc1_kernel"]), np.asarray(p["expert_fc1_bias"])
    k2, b2 = np.asarray(p["expert_fc2_kernel"]), np.asarray(p["expert_fc2_bias"])
    for b in range(3):
        for n in range(5):
            e = win[b, n]
            h = np.asarray(_gelu(np.asarray(x)[b, n] @ k1[e] + b1[e]))
            ref[b, n] = (h @ k2[e] + b2[e]) * np.asarray(probs)[b, n, e]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    (balance,) = jax.tree_util.tree_leaves(state["moe"])
    assert np.isfinite(float(balance))


def test_balance_loss_is_one_for_uniform_router():
    """Zero router weights -> exactly uniform probs; argmax routes all
    tokens to expert 0, so f=(1,0,..), P=1/E and loss = E * 1 * 1/E = 1."""
    D, F, E = 8, 16, 4
    moe = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, D))
    params = {"params": jax.tree.map(jnp.asarray, moe.init(jax.random.PRNGKey(3), x)["params"])}
    params["params"]["router"]["linear"]["kernel"] = jnp.zeros((D, E))
    params["params"]["router"]["linear"]["bias"] = jnp.zeros((E,))
    _, state = moe.apply(params, x, mutable=["moe"])
    (balance,) = jax.tree_util.tree_leaves(state["moe"])
    np.testing.assert_allclose(float(balance), 1.0, rtol=1e-6)


def test_moe_top2_combines_two_experts():
    D, F, E = 8, 16, 4
    moe1 = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E, top_k=1, dropout=0.0)
    moe2 = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E, top_k=2, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, D))
    params = {"params": moe1.init(jax.random.PRNGKey(5), x)["params"]}
    y1, _ = moe1.apply(params, x, mutable=["moe"])
    y2, _ = moe2.apply(params, x, mutable=["moe"])
    assert np.all(np.isfinite(np.asarray(y2)))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_sparse_dispatch_matches_dense_at_full_capacity():
    """capacity_factor = E gives every expert T slots — nothing drops, so
    the sparse one-hot dispatch must reproduce the dense combine exactly."""
    D, F, E = 8, 16, 4
    dense = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E, dropout=0.0)
    sparse = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E,
                            capacity_factor=float(E), dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 6, D))
    params = {"params": dense.init(jax.random.PRNGKey(7), x)["params"]}
    yd, _ = dense.apply(params, x, mutable=["moe"])
    ys, _ = sparse.apply(params, x, mutable=["moe"])
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yd),
                               rtol=1e-5, atol=1e-6)
    # top-2 as well (two choices claim slots in priority order)
    dense2 = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E, top_k=2, dropout=0.0)
    sparse2 = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E, top_k=2,
                             capacity_factor=float(E), dropout=0.0)
    yd2, _ = dense2.apply(params, x, mutable=["moe"])
    ys2, _ = sparse2.apply(params, x, mutable=["moe"])
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(yd2),
                               rtol=1e-5, atol=1e-6)


def test_sparse_dispatch_drops_over_capacity_tokens():
    """Zero router -> every token picks expert 0; with capacity 2 slots per
    sample only the first two tokens produce output, the rest return
    exactly zero (their block residual passes through)."""
    D, F, E = 8, 16, 4
    # T=8, E=4: capacity_factor=1 -> C = 2 slots
    sparse = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E,
                            capacity_factor=1.0, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, D))
    params = {"params": jax.tree.map(
        jnp.asarray, sparse.init(jax.random.PRNGKey(9), x)["params"])}
    params["params"]["router"]["linear"]["kernel"] = jnp.zeros((D, E))
    params["params"]["router"]["linear"]["bias"] = jnp.zeros((E,))
    y, _ = sparse.apply(params, x, mutable=["moe"])
    y = np.asarray(y)
    assert np.abs(y[:, :2]).max() > 0          # routed tokens produce output
    np.testing.assert_array_equal(y[:, 2:], 0)  # dropped tokens: exact zeros


def test_expert_parallel_sharding_rule():
    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = {
        "expert_fc1_kernel": jnp.zeros((4, 8, 16)),
        "expert_fc2_bias": jnp.zeros((4, 8)),
        "expert_fc1_kernel_odd": jnp.zeros((3, 8, 16)),  # E % model != 0
        "router": {"linear": {"kernel": jnp.zeros((8, 4))}},
    }
    s = param_shardings(mesh, params)
    assert s["expert_fc1_kernel"].spec == P("model")
    assert s["expert_fc2_bias"].spec == P("model")
    assert s["expert_fc1_kernel_odd"].spec == P()
    assert s["router"]["linear"]["kernel"].spec == P()


CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  compiled_epochs: true
  mesh_data: {data}
  mesh_model: {model}
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 3
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  moe_aux_weight: 0.02
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: MoEFusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 2,
                  num_experts: 4}}
"""


def _run(tmp_path, data, model):
    cfg = loads(CFG.format(tmp=tmp_path, data=data, model=model))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    assert task._uses_moe
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"moe_{data}x{model}", full_cfg=cfg)
    trainer.fit(task, dm)
    return trainer


def test_moe_rejected_outside_multiloss_tasks():
    """Tasks outside the MultiLoss family would silently drop the balance
    loss; construction must fail loudly instead."""
    import pytest

    cfg = loads("""
model:
  type: AVMnistImageMixer
  dropout: 0.1
  modalities:
    classification: {num_classes: 10}
    image: {block_type: MoEMLPMixer, in_channels: 1, hidden_dim: 16,
            patch_size: 14, image_size: [28, 28], token_dim: 8,
            channel_dim: 32, num_mixers: 1, num_experts: 2}
train:
  optimizer: {lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0}
""")
    with pytest.raises(ValueError, match="MoE"):
        get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)


def _router_learns(capacity_factor):
    """Two token clusters need two different linear maps; a trained MoE
    must cut the loss by well over half — which requires gradients to flow
    through the routing gate (the only path to the router weights)."""
    import optax

    D, F, E = 8, 32, 2
    moe = MoEFeedForward(dim=D, hidden_dim=F, num_experts=E,
                         capacity_factor=capacity_factor, dropout=0.0)
    rng = np.random.default_rng(0)
    A1 = rng.normal(size=(D, D)).astype(np.float32) * 0.5
    A2 = -A1
    base = rng.normal(size=(64, 6, D)).astype(np.float32)
    cluster = (rng.random((64, 6, 1)) < 0.5).astype(np.float32)
    x = jnp.asarray(base + 3.0 * (2 * cluster - 1))  # separable clusters
    y = jnp.asarray(np.where(cluster > 0, base @ A1, base @ A2))

    params = {"params": moe.init(jax.random.PRNGKey(1), x)["params"]}
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = moe.apply(p, x)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(300):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.4 * first, (first, float(loss))


def test_router_learns_dense_dispatch():
    _router_learns(capacity_factor=0.0)


def test_router_learns_sparse_dispatch():
    _router_learns(capacity_factor=2.0)


def test_moe_checkpoint_serves(tmp_path):
    """MoE task params export to a serving artifact and predict with logits
    matching the direct eval forward (routing is deterministic at eval; the
    sown balance loss only exists in training mode)."""
    from m2mixer_tpu.serving import export_serving, load_serving

    cfg = loads(CFG.format(tmp=tmp_path, data=1, model=1))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(8, 1, 28, 28).astype(np.float32),
        "audio": rng.rand(8, 1, 112, 112).astype(np.float32),
        "label": rng.randint(0, 10, (8,)).astype(np.int32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    d = export_serving(task, params, batch, str(tmp_path / "art"),
                       fmt="stablehlo", buckets=(8,))
    model = load_serving(d)
    out = model.predict(batch)
    direct = task.network.apply(params, **task.network_inputs(batch),
                                deterministic=True)
    np.testing.assert_allclose(out["logits"], np.asarray(direct["logits"]),
                               rtol=2e-5, atol=2e-5)


def test_moe_training_e2e_with_expert_parallelism(tmp_path):
    """DP=2 x EP=4 (experts sharded over 'model') must train, log the
    balance loss, and reproduce the single-device run."""
    t_ep = _run(tmp_path / "ep", data=2, model=4)
    t_ref = _run(tmp_path / "ref", data=1, model=1)
    assert np.isfinite(t_ep.callback_metrics["train_loss"])
    assert "train_moe_aux" in t_ep.callback_metrics
    # near-balanced routing keeps the Switch loss around its optimum of 1
    assert 0.5 < t_ep.callback_metrics["train_moe_aux"] < 4.0
    for key in ("train_loss", "val_loss", "val_acc"):
        np.testing.assert_allclose(
            t_ep.callback_metrics[key], t_ref.callback_metrics[key],
            rtol=5e-4, atol=5e-5,
        )
