"""Significance runner: repeated train+test runs, score collection."""

import subprocess
import sys
import os

import numpy as np


def test_significance_runner(tmp_path):
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(f"""
train:
  tensorboard_path: {tmp_path}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 42
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
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
""")
    out = tmp_path / "scores.npy"
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    result = subprocess.run(
        [sys.executable, os.path.join(repo, "run_for_significance.py"),
         "-c", str(cfg), "-r", "2", "-o", str(out),
         "train.mesh_data=1", "train.mesh_model=1"],
        # two full CLI runs take ~9 min alone on this 1-core box; leave real
        # headroom for host contention (this timed out at 900 once when a
        # TPU CLI drive overlapped the suite)
        capture_output=True, text=True, timeout=2700, cwd=repo, env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    scores = np.load(out)
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()


ENSEMBLE_CFG = """
train:
  epochs: {epochs}
  seed: 5
  optimizer: {{lr: 3e-3, weight_decay: 0.0, scheduler_patience: 5}}
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 32, synthetic: true,
            synthetic_learnable: {learnable}, synthetic_sizes: [256, 64, 64],
            shuffle_train: true}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 32]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 14,
             image_size: [28, 28], token_dim: 16, channel_dim: 64, num_mixers: 2}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 32, patch_size: 56,
             image_size: [112, 112], token_dim: 16, channel_dim: 64, num_mixers: 2}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 32, token_dim: 16, channel_dim: 64, num_mixers: 1}}
"""


def _build(cfg):
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    return task, dm


def test_vmap_ensemble_learns_per_member():
    """`--vmap` significance: N seed-members trained SIMULTANEOUSLY (vmapped
    member axis, one compiled program) must each learn the planted signal,
    with genuine member-to-member seed variance."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=12, learnable="true"))
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 3, verbose=False)

    accs = res.metric("test_acc")
    assert accs.shape == (3,)
    assert (accs > 0.8).all(), (accs, res.scores)
    # members really are independent seeds, not three copies of one model
    assert len(np.unique(np.round(res.val_losses, 6))) > 1, res.val_losses
    losses = res.metric("test_loss")
    assert np.isfinite(losses).all()


def test_vmap_ensemble_early_stop_freezes_members():
    """Per-member early stopping: with patience 0 on unlearnable data, every
    member stops long before max_epochs and the lockstep loop exits."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=30, learnable="false"))
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 2, verbose=False,
                       early_stopping_patience=0)
    assert res.epochs_run < 30
    # best-val bookkeeping points inside the executed range
    assert (res.stop_epochs < res.epochs_run).all()


def test_vmap_ensemble_lr_sweep_per_member():
    """`--vmap --lrs`: the member axis as a learning-rate sweep. A member
    with lr=0 must stay frozen at chance while its sibling (real lr) learns
    the planted signal — proving each member really trains with ITS rate."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=10, learnable="true"))
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 2, verbose=False,
                       member_lrs=[3e-3, 0.0])
    accs = res.metric("test_acc")
    assert accs[0] > 0.8, res.scores
    assert accs[1] < 0.35, res.scores  # lr=0 member never moved off init


def test_vmap_ensemble_member_sharded_over_mesh():
    """mesh=: the member axis shards across devices (members are
    embarrassingly parallel) — 8 members on the 8-device virtual mesh must
    reproduce the single-device ensemble and actually place one member per
    device."""
    import jax

    from m2mixer_tpu.config import loads
    from m2mixer_tpu.parallel import MeshConfig, make_mesh
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=5, learnable="true"))
    task, dm = _build(cfg)
    ref = fit_ensemble(task, dm, cfg.train, 8, verbose=False)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    task2, dm2 = _build(cfg)
    res = fit_ensemble(task2, dm2, cfg.train, 8, verbose=False, mesh=mesh)

    np.testing.assert_allclose(res.val_losses, ref.val_losses,
                               rtol=1e-4, atol=1e-5)
    assert res.metric("test_acc").tolist() == ref.metric("test_acc").tolist()
    # the member axis really is laid out across all 8 devices
    leaf = jax.tree.leaves(res.best_params)[0]
    assert len(leaf.sharding.device_set) == 8, leaf.sharding
    # wrong member count for the axis is rejected up front
    import pytest

    t3, d3 = _build(cfg)
    with pytest.raises(ValueError, match="must divide n_members"):
        fit_ensemble(t3, d3, cfg.train, 3, verbose=False, mesh=mesh)


def test_vmap_ensemble_rejects_unsupported_recipes(tmp_path):
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble
    import pytest

    cfg = loads(ENSEMBLE_CFG.format(epochs=1, learnable="false"))
    cfg.model.gradblend = True
    task, dm = _build(cfg)
    with pytest.raises(ValueError, match="GradBlend"):
        fit_ensemble(task, dm, cfg.train, 2, verbose=False)

    # schedule + per-member sweep rates conflict -> error
    cfg3 = loads(ENSEMBLE_CFG.format(epochs=1, learnable="false"))
    cfg3.train.optimizer.schedule = {"type": "cosine"}
    task3, dm3 = _build(cfg3)
    with pytest.raises(ValueError, match="member_lrs"):
        fit_ensemble(task3, dm3, cfg3.train, 2, verbose=False,
                     member_lrs=[1e-3, 1e-4])


def test_vmap_ensemble_per_member_softadapt():
    """SoftAdapt inside the ensemble: each member refits ITS loss weights
    from ITS OWN val-loss histories — after a refit the members' weight
    vectors must differ (they trained from different seeds) and each must
    be a valid weighting (finite, non-uniform-initial)."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=5, learnable="true"))
    cfg.model.use_softadapt = True
    cfg.model.update_loss_weights_per_epoch = 2  # refits at epochs 2 and 4
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 2, verbose=False)

    w = res.loss_weights
    assert w is not None and w.shape == (2, 3)
    assert np.isfinite(w).all()
    # a refit really happened (weights moved off the uniform init)...
    assert not np.allclose(w, 1.0 / 3.0)
    # ...independently per member (different seeds -> different histories)
    assert not np.allclose(w[0], w[1])
    assert np.isfinite(res.metric("test_loss")).all()


def test_vmap_ensemble_generalizes_to_mimic():
    """The ensemble path is task-generic: a second family (MIMIC static+time
    MultiLoss, 6-class, AUROC/AP wants-scores metrics) trains and scores
    per member without AV-MNIST-specific assumptions."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.datasets.mimic import MIMICDataModule
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads("""
train:
  epochs: 2
  seed: 3
  optimizer: {lr: 1e-3, weight_decay: 0.0}
model:
  type: MimicMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {num_classes: 6, classifier: StandardClassifier, input_shape: [16, 25, 32]}
    time: {block_type: MLPMixerNoPatching, embedding_dim: 12, proj_dim: 32, hidden_dim: 32,
           num_patch: 24, token_dim: 8, channel_dim: 32, num_mixers: 1}
    static: {block_type: MLP, input_dim: 5, hidden_dim: 32, num_blocks: 1, output_dim: 32}
    multimodal: {block_type: FusionMixer, fusion_function: ConcatFusion, hidden_dim: 32,
                 token_dim: 8, channel_dim: 32, num_mixers: 1}
""")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = MIMICDataModule.synthetic(n=128, batch_size=16)
    res = fit_ensemble(task, dm, cfg.train, 2, verbose=False)
    assert len(res.scores) == 2
    for s in res.scores:
        assert np.isfinite(s["test_loss"])
        assert "test_auroc" in s and "test_f1_micro" in s
        assert 0.0 <= s["test_auroc"] <= 1.0


def test_vmap_ensemble_honors_lr_schedule():
    """train.optimizer.schedule drives the per-member LR leaf exactly like
    the sequential Trainer (epoch-driven, shared by members)."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.callbacks import LRSchedule
    from m2mixer_tpu.config import DictConfig
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=4, learnable="true"))
    cfg.train.optimizer.schedule = {"type": "step", "step_size": 2,
                                    "gamma": 0.1}
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 2, verbose=False)
    assert res.epochs_run == 4
    assert np.isfinite(res.metric("test_loss")).all()


def test_export_ensemble_serving_parity(tmp_path):
    """The whole-ensemble artifact serves (a) per-member logits identical
    to each member's direct forward and (b) 'logits' = log of the
    member-mean softmax."""
    import jax
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.serving import export_ensemble_serving, load_serving

    cfg = loads(ENSEMBLE_CFG.format(epochs=1, learnable="false"))
    task, dm = _build(cfg)
    dm.setup("fit")
    batch = next(iter(dm.train_batches()))
    p0 = task.init_params(jax.random.PRNGKey(0), batch)
    p1 = task.init_params(jax.random.PRNGKey(1), batch)
    stacked = jax.tree.map(lambda a, b: np.stack([np.asarray(a), np.asarray(b)]),
                           p0, p1)

    d = export_ensemble_serving(task, stacked, batch, str(tmp_path / "ens"),
                                buckets=(8, 32))
    import json as _json
    assert _json.load(open(os.path.join(d, "serving.json")))["ensemble_members"] == 2
    model = load_serving(d)
    out = model.predict(batch)

    def direct(p):
        o = task.network.apply(p, **task.network_inputs(batch), deterministic=True)
        return np.asarray(o["logits"])

    want_members = np.stack([direct(p0), direct(p1)], axis=1)  # (B, N, C)
    np.testing.assert_allclose(out["member_logits"], want_members,
                               rtol=2e-5, atol=2e-5)
    probs = np.exp(want_members - want_members.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.exp(out["logits"]), probs.mean(axis=1),
                               rtol=1e-4, atol=1e-5)


def test_run_ensemble_significance_export_dir(tmp_path):
    """run_ensemble_significance(export_dir=...) trains the members AND
    drops a loadable on-device-ensembled artifact."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.serving import load_serving
    from m2mixer_tpu.training.ensemble import run_ensemble_significance

    cfg = loads(ENSEMBLE_CFG.format(epochs=2, learnable="true"))
    cfg.train.tensorboard_path = str(tmp_path / "logs")
    scores = run_ensemble_significance(cfg, 2, verbose=False,
                                       export_dir=str(tmp_path / "art"))
    assert scores.shape == (2,)
    model = load_serving(str(tmp_path / "art"))
    assert model.meta["ensemble_members"] == 2
    task, dm = _build(cfg)
    dm.setup("fit")
    out = model.predict(next(iter(dm.train_batches())))
    assert out["logits"].shape == (32, 10)
    assert out["member_logits"].shape == (32, 2, 10)
    # ensembled probabilities are normalized
    np.testing.assert_allclose(np.exp(out["logits"]).sum(-1), 1.0, atol=1e-4)


def test_export_ensemble_serving_composes_with_int8(tmp_path):
    """Weight-only int8 PTQ composes with the stacked member axis: scales
    are per-member per-output-channel, dequantization happens before the
    member vmap inside the traced forward."""
    import jax
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.serving import export_ensemble_serving, load_serving

    cfg = loads(ENSEMBLE_CFG.format(epochs=1, learnable="false"))
    task, dm = _build(cfg)
    dm.setup("fit")
    batch = next(iter(dm.train_batches()))
    stacked = jax.tree.map(
        lambda a, b: np.stack([np.asarray(a), np.asarray(b)]),
        task.init_params(jax.random.PRNGKey(0), batch),
        task.init_params(jax.random.PRNGKey(1), batch))

    d_f = export_ensemble_serving(task, stacked, batch,
                                  str(tmp_path / "f"), buckets=(32,))
    d_q = export_ensemble_serving(task, stacked, batch,
                                  str(tmp_path / "q"), buckets=(32,),
                                  quantize="int8")
    import json as _json
    meta = _json.load(open(os.path.join(d_q, "serving.json")))
    assert meta["quantize"] == "int8" and meta["ensemble_members"] == 2
    out_f = load_serving(d_f).predict(batch)
    out_q = load_serving(d_q).predict(batch)
    # int8 PTQ: small logit error, same shapes
    assert out_q["member_logits"].shape == out_f["member_logits"].shape
    err = np.abs(out_q["logits"] - out_f["logits"]).max()
    assert err < 0.1, err
    # quantization actually shrank the payload
    assert (os.path.getsize(os.path.join(d_q, "params.pkl"))
            < 0.5 * os.path.getsize(os.path.join(d_f, "params.pkl")))


def test_identical_seeds_share_one_epoch_order():
    """ADVICE r2 regression: identical_seeds promises trials differ ONLY in
    the injected hyperparameters. With equal member LRs every member must
    therefore train bit-identically — one shared shuffle order per epoch
    (one datamodule RNG advance, like sequential same-seed runs), not n
    per-member draws that add data-order noise to cross-trial comparisons."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=3, learnable="true"))
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 3, verbose=False,
                       member_lrs=[3e-3, 3e-3, 3e-3], identical_seeds=True)
    vl = np.asarray(res.val_losses)
    assert np.allclose(vl, vl[0]), vl
    accs = res.metric("test_acc")
    assert np.allclose(accs, accs[0]), accs


def test_select_best_ignores_nan_epochs():
    """ADVICE r2 regression: a diverged member's NaN val loss must not
    poison its best_val (jnp.minimum propagates NaN; fmin ignores it)."""
    import jax.numpy as jnp

    from m2mixer_tpu.training.ensemble import _select_best

    best_p = {"w": jnp.asarray([[1.0], [2.0]])}
    cur_p = {"w": jnp.asarray([[10.0], [20.0]])}
    best_v = jnp.asarray([0.5, 0.5])
    val = jnp.asarray([jnp.nan, 0.25])
    new_p, new_v = _select_best(best_p, cur_p, best_v, val)
    assert np.allclose(np.asarray(new_v), [0.5, 0.25])
    # member 0 keeps its finite-best params; member 1 takes the improvement
    assert np.allclose(np.asarray(new_p["w"]), [[1.0], [20.0]])


def test_member_hparams_parity_vs_single_member():
    """The generalized sweep axes (lr x weight_decay in one vmapped
    program) must reproduce the same trials run one-at-a-time: identical
    seeds + identical data order => per-trial val losses match the n=1
    ensembles bit-for-bit (same code path, the member axis is pure vmap)."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    lrs = [3e-3, 3e-3, 1e-3, 1e-3]
    wds = [0.0, 0.3, 0.0, 0.3]
    cfg = loads(ENSEMBLE_CFG.format(epochs=3, learnable="true"))
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 4, verbose=False,
                       identical_seeds=True,
                       member_hparams={"learning_rate": lrs,
                                       "weight_decay": wds})
    vl = np.asarray(res.val_losses)
    # weight decay really acts: same-lr trials differ
    assert abs(vl[0] - vl[1]) > 1e-6 and abs(vl[2] - vl[3]) > 1e-6, vl

    singles = []
    for lr, wd in zip(lrs, wds):
        cfg1 = loads(ENSEMBLE_CFG.format(epochs=3, learnable="true"))
        t1, d1 = _build(cfg1)
        r1 = fit_ensemble(t1, d1, cfg1.train, 1, verbose=False,
                          identical_seeds=True,
                          member_hparams={"learning_rate": [lr],
                                          "weight_decay": [wd]})
        singles.append(float(np.asarray(r1.val_losses)[0]))
    assert np.allclose(vl, singles, rtol=1e-5, atol=1e-6), (vl, singles)


def test_injected_weight_decay_matches_static_config():
    """An injected per-member weight_decay computes the SAME update as the
    normal static-config decay (coupled-L2 position in the adam chain is
    unchanged; the traced scalar only replaces the literal)."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=2, learnable="true"))
    cfg.train.optimizer.weight_decay = 0.2
    task, dm = _build(cfg)
    static = fit_ensemble(task, dm, cfg.train, 1, verbose=False,
                          identical_seeds=True, member_lrs=[3e-3])

    cfg2 = loads(ENSEMBLE_CFG.format(epochs=2, learnable="true"))
    task2, dm2 = _build(cfg2)  # cfg wd = 0.0; injected axis supplies 0.2
    injected = fit_ensemble(task2, dm2, cfg2.train, 1, verbose=False,
                            identical_seeds=True,
                            member_hparams={"learning_rate": [3e-3],
                                            "weight_decay": [0.2]})
    np.testing.assert_allclose(np.asarray(static.val_losses),
                               np.asarray(injected.val_losses),
                               rtol=1e-6, atol=1e-7)


def test_member_sam_rho_axis():
    """sam_rho as a member axis: rho=0 member matches the plain (no-SAM)
    run exactly (the always-traced SAM branch is exact at rho=0), nonzero
    members genuinely perturb."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=2, learnable="true"))
    task, dm = _build(cfg)
    res = fit_ensemble(task, dm, cfg.train, 3, verbose=False,
                       identical_seeds=True,
                       member_hparams={"sam_rho": [0.0, 0.05, 0.5]})
    vl = np.asarray(res.val_losses)
    assert np.isfinite(vl).all()
    assert abs(vl[1] - vl[0]) > 1e-7 and abs(vl[2] - vl[0]) > 1e-7, vl

    cfg2 = loads(ENSEMBLE_CFG.format(epochs=2, learnable="true"))
    task2, dm2 = _build(cfg2)
    plain = fit_ensemble(task2, dm2, cfg2.train, 1, verbose=False,
                         identical_seeds=True)
    np.testing.assert_allclose(vl[0], np.asarray(plain.val_losses)[0],
                               rtol=1e-5, atol=1e-6)


def test_member_ema_decay_axis():
    """ema_decay as a member axis needs train.ema_eval (scored tree = the
    Polyak average, mirroring the sequential trainer); without it the axis
    is rejected as meaningless. With it, different decays score
    differently and the axis runs in one program."""
    import pytest

    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=3, learnable="true"))
    task, dm = _build(cfg)
    with pytest.raises(ValueError, match="ema_eval"):
        fit_ensemble(task, dm, cfg.train, 2, verbose=False,
                     identical_seeds=True,
                     member_hparams={"ema_decay": [0.5, 0.99]})

    cfg.train.ema_eval = True
    task2, dm2 = _build(cfg)
    res = fit_ensemble(task2, dm2, cfg.train, 2, verbose=False,
                       identical_seeds=True,
                       member_hparams={"ema_decay": [0.5, 0.999]})
    vl = np.asarray(res.val_losses)
    assert np.isfinite(vl).all()
    # a near-frozen average (0.999) scores differently from a fast one
    assert abs(vl[0] - vl[1]) > 1e-6, vl


def test_member_hparams_rejects_unsupported_axis():
    import pytest

    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    cfg = loads(ENSEMBLE_CFG.format(epochs=1, learnable="false"))
    task, dm = _build(cfg)
    with pytest.raises(ValueError, match="dropout"):
        fit_ensemble(task, dm, cfg.train, 2, verbose=False,
                     member_hparams={"dropout": [0.1, 0.2]})


def test_vmap_ensemble_grad_accum_matches_big_batch():
    """Grad accumulation under the member vmap: with dropout 0, K=2
    micro-batches of 16 + one update must equal one batch-32 update
    exactly (grad of the batch mean == average of the micro-batch grads),
    so the two ensembles' val curves coincide to float tolerance. This is
    the composition the round-2 executor rejected."""
    from m2mixer_tpu.config import loads
    from m2mixer_tpu.training.ensemble import fit_ensemble

    lrs = [3e-3, 1e-3]
    big = loads(ENSEMBLE_CFG.format(epochs=2, learnable="true"))
    task_a, dm_a = _build(big)
    res_a = fit_ensemble(task_a, dm_a, big.train, 2, verbose=False,
                         identical_seeds=True, member_lrs=lrs)

    accum = loads(ENSEMBLE_CFG.format(epochs=2, learnable="true"))
    accum.dataset.params.batch_size = 16
    accum.train.grad_accum_steps = 2
    task_b, dm_b = _build(accum)
    res_b = fit_ensemble(task_b, dm_b, accum.train, 2, verbose=False,
                         identical_seeds=True, member_lrs=lrs)

    np.testing.assert_allclose(np.asarray(res_a.val_losses),
                               np.asarray(res_b.val_losses),
                               rtol=2e-4, atol=1e-5)
    accs_a = res_a.metric("test_acc")
    accs_b = res_b.metric("test_acc")
    np.testing.assert_allclose(accs_a, accs_b, atol=0.02)
