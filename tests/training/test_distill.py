"""Knowledge distillation (train.distill, training/distill.py).

Beyond the reference (which trains every model from scratch against hard
labels): a trained teacher run distills into a student via a temperature-
scaled soft-target term blended into the MultiLoss total. The contract:

- the KD term is Hinton's T^2-scaled KL (or bce / mse), zero when student
  and teacher agree (kl/mse);
- teacher weights are jit-captured constants — checkpoints, optimizer
  state, and restore targets are structurally IDENTICAL to a non-distilled
  run's;
- the student trains with total = (1-w)*task_loss + w*kd on the
  epoch-compiled path; eval logs the KD gap without training on it;
- teacher/student may differ in geometry but must share the label space
  (mismatches fail at trace time with a clear error).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.training.distill import (
    Distiller, attach_distiller, kd_bce, kd_kl, kd_mse)

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
                      input_shape: [{hidden}, 8, {hidden}]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: {hidden}, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: {hidden}, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: {hidden}, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""


def _cfg(tmp, hidden=16):
    return loads(CFG.format(tmp=tmp, hidden=hidden))


def _batch(n, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.rand(n, 1, 28, 28).astype(np.float32),
        "audio": rng.rand(n, 1, 112, 112).astype(np.float32),
        "label": rng.randint(0, 10, (n,)).astype(np.int32),
    }


# ---------------------------------------------------------------- unit: math
def test_kd_loss_math():
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(8, 10).astype(np.float32))
    t = jnp.asarray(rng.randn(8, 10).astype(np.float32))

    # self-distillation is a perfect match for kl and mse
    assert float(kd_kl(s, s, 2.0)) == pytest.approx(0.0, abs=1e-6)
    assert float(kd_mse(s, s, 1.0)) == 0.0
    # KL is nonnegative and T^2-scaled: at large T the softened
    # distributions converge, but the T^2 factor keeps the term alive
    assert float(kd_kl(s, t, 1.0)) > 0
    assert float(kd_kl(s, t, 4.0)) > 0
    # bce against own logits equals the Bernoulli entropy (not zero)
    ps = jax.nn.sigmoid(s)
    ent = float(jnp.mean(-(ps * jnp.log(ps) + (1 - ps) * jnp.log(1 - ps))))
    assert float(kd_bce(s, s, 1.0)) == pytest.approx(ent, rel=1e-5)
    # mse ignores temperature
    assert float(kd_mse(s, t, 1.0)) == float(kd_mse(s, t, 8.0))


def test_kd_kl_gradient_pulls_toward_teacher():
    """One gradient step on KL must reduce the gap to the teacher."""
    rng = np.random.RandomState(1)
    s = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    t = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    g = jax.grad(lambda z: kd_kl(z, t, 2.0))(s)
    before = float(kd_kl(s, t, 2.0))
    after = float(kd_kl(s - 0.5 * g, t, 2.0))
    assert after < before


# ------------------------------------------------------------ unit: blending
class _StubDistiller:
    weight = 0.25

    def loss(self, outputs, batch):
        return jnp.float32(3.0)


def test_step_blends_kd_into_total(tmp_path):
    cfg = _cfg(tmp_path)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = _batch(8)
    params = task.init_params(jax.random.PRNGKey(0), batch)
    ctx = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(task.RNG_COLLECTIONS)}

    base_total, base_aux = task.step(params, batch, ctx, rngs, train=True)
    task.distiller = _StubDistiller()
    total, aux = task.step(params, batch, ctx, rngs, train=True)
    np.testing.assert_allclose(
        np.asarray(total), 0.75 * np.asarray(base_total) + 0.25 * 3.0,
        rtol=1e-6)
    assert float(aux["losses"]["kd"]) == 3.0
    assert "loss_kd" in task.epoch_log_keys()

    # eval: the KD gap is logged but the total is untouched
    ctx_v = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "val").items()}
    task.distiller = None
    ev_base, _ = task.step(params, batch, ctx_v, {}, train=False)
    task.distiller = _StubDistiller()
    ev, ev_aux = task.step(params, batch, ctx_v, {}, train=False)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev_base))
    assert float(ev_aux["losses"]["kd"]) == 3.0


# ------------------------------------------------------------------- errors
def test_distiller_config_validation(tmp_path):
    with pytest.raises(ValueError, match="needs 'from'"):
        Distiller({"weight": 0.5})
    with pytest.raises(ValueError, match="weight must be in"):
        Distiller({"from": "x", "weight": 0.0})
    with pytest.raises(ValueError, match="weight must be in"):
        Distiller({"from": "x", "weight": 1.5})
    with pytest.raises(ValueError, match="temperature must be > 0"):
        Distiller({"from": "x", "temperature": -1})
    with pytest.raises(ValueError, match="pick one of"):
        Distiller({"from": "x", "loss": "kldiv"})
    with pytest.raises(FileNotFoundError, match="no config.json"):
        Distiller({"from": str(tmp_path / "nowhere")})


def test_attach_rejects_unsupported_task():
    cfg = loads("""
train:
  optimizer: {lr: 1e-3}
model:
  type: PnlpMixerSeqClsTask
  bottleneck: {feature_size: 64, hidden_dim: 16, window_size: 0}
  mixer: {num_mixers: 1, hidden_dim: 16, mlp_hidden_dim: 32, max_seq_len: 8,
          bottleneck_features_size: 64, bottleneck_window_size: 0}
  seq_cls: {num_classes: 2, hidden_dim: 16, proj_dim: 16}
""")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    with pytest.raises(ValueError, match="does not support distillation"):
        attach_distiller(task, {"distill": {"from": "x"}}, None)


# --------------------------------------------------------------- end to end
@pytest.fixture(scope="module")
def teacher(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("teacher")
    cfg = _cfg(tmp, hidden=16)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="teacher", full_cfg=cfg)
    trainer.fit(task, dm)
    return cfg, trainer


def test_distill_smaller_student_e2e(teacher, tmp_path):
    """The headline use case: a hidden-8 student distilled from a trained
    hidden-16 teacher run, epoch-compiled path, checkpoints unchanged."""
    _, teacher_trainer = teacher
    cfg = _cfg(tmp_path, hidden=8)
    cfg.train.distill = {"from": teacher_trainer.ckpt_dir,
                         "weight": 0.4, "temperature": 2.0}
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="student", full_cfg=cfg)
    trainer.fit(task, dm)

    # the KD gap is a first-class logged loss in train AND val
    assert np.isfinite(trainer.callback_metrics["train_loss_kd"])
    assert np.isfinite(trainer.callback_metrics["val_loss_kd"])
    assert np.isfinite(trainer.callback_metrics["val_loss"])
    # teacher weights never leak into the student's state
    assert set(trainer.params) == {"params"}
    logs = trainer.test(task, dm, ckpt="best")
    assert np.isfinite(logs["test_loss_kd"])


def test_distill_per_step_path_matches_structure(teacher, tmp_path):
    """The per-step (non-compiled) path trains and logs the same keys."""
    _, teacher_trainer = teacher
    cfg = _cfg(tmp_path, hidden=8)
    cfg.train.epochs = 1
    cfg.train.compiled_epochs = False
    cfg.train.distill = {"from": teacher_trainer.ckpt_dir,
                         "weight": 0.3, "loss": "mse"}
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="student_ps", full_cfg=cfg)
    trainer.fit(task, dm)
    assert not trainer.compiled_epochs
    assert np.isfinite(trainer.callback_metrics["train_loss_kd"])


def test_distill_class_mismatch_fails_loudly(teacher, tmp_path):
    _, teacher_trainer = teacher
    cfg = _cfg(tmp_path, hidden=8)
    cfg.model.modalities.classification.num_classes = 5
    cfg.train.distill = {"from": teacher_trainer.ckpt_dir}
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="student_bad", full_cfg=cfg)
    with pytest.raises(ValueError, match="share the label space"):
        trainer.fit(task, dm)


def test_distill_branches_mode(teacher, tmp_path):
    """distill.branches: per-branch heads distill too (same label space on
    every head in this family)."""
    _, teacher_trainer = teacher
    cfg = _cfg(tmp_path, hidden=8)
    cfg.train.epochs = 1
    cfg.train.distill = {"from": teacher_trainer.ckpt_dir, "branches": True,
                         "weight": 0.5}
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="student_br", full_cfg=cfg)
    trainer.fit(task, dm)
    assert np.isfinite(trainer.callback_metrics["train_loss_kd"])


def test_distilled_student_tracks_teacher(teacher, tmp_path):
    """Distillation actually pulls the student toward the teacher: after a
    short fit with a heavy KD weight, the student's fusion logits are closer
    (in softened KL) to the teacher's than an identically-seeded plain
    student's are."""
    _, teacher_trainer = teacher
    batch = _batch(16, seed=3)

    def fit_student(name, distill):
        cfg = _cfg(tmp_path, hidden=8)
        cfg.train.epochs = 2
        if distill:
            cfg.train.distill = {"from": teacher_trainer.ckpt_dir,
                                 "weight": 0.9, "temperature": 2.0}
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name=name, full_cfg=cfg)
        trainer.fit(task, dm)
        out = task.network.apply(
            jax.tree.map(np.asarray, trainer.params),
            **task.network_inputs(batch), deterministic=True)
        return np.asarray(out["logits"])

    t_task = teacher[0], teacher_trainer
    teacher_task = get_model(teacher[0].model.type)(
        teacher[0].model, teacher[0].train.optimizer)
    from m2mixer_tpu.training.warmstart import load_checkpoint_params

    t_params = load_checkpoint_params(teacher_trainer.ckpt_dir)
    t_logits = np.asarray(teacher_task.network.apply(
        jax.tree.map(np.asarray, t_params),
        **teacher_task.network_inputs(batch), deterministic=True)["logits"])

    distilled = fit_student("cmp_kd", distill=True)
    plain = fit_student("cmp_plain", distill=False)
    gap_kd = float(kd_kl(jnp.asarray(distilled), jnp.asarray(t_logits), 2.0))
    gap_plain = float(kd_kl(jnp.asarray(plain), jnp.asarray(t_logits), 2.0))
    assert gap_kd < gap_plain
