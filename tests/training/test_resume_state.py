"""Host-callback state across resume + checkpoint-retention edge cases
(round-2 review findings: plateau LR restart on resume, NaN monitor
corruption, stale jitted closures in test(), ckpt='last')."""

import math
import os

import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: {epochs}
  optimizer: {{lr: 1e-3, weight_decay: 0.0, scheduler_patience: 1}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: {bs}, synthetic: true,
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
"""


def _fit(tmp_path, epochs=1, bs=16, name="resume_state"):
    cfg = loads(CFG.format(tmp=tmp_path, epochs=epochs, bs=bs))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=name, full_cfg=cfg)
    trainer.fit(task, dm)
    return cfg, task, dm, trainer


def test_plateau_and_earlystop_state_survive_resume(tmp_path):
    """A resumed run must continue the plateau scheduler from its reduced
    LR and the early-stopping wait from its counter — not restart at lr0
    (a silent ~Nx LR jump on the first post-resume epoch)."""
    cfg, task, dm, trainer = _fit(tmp_path, epochs=1)
    # simulate a long-run state: plateau reduced the LR twice, early stop
    # is deep into its patience window
    trainer.plateau.lr = 1e-5
    trainer.plateau.best = 0.123
    trainer.plateau.num_bad = 1
    trainer.early_stopping.best = 0.117
    trainer.early_stopping.wait = 7
    trainer._save_checkpoint(0, {"val_loss": 1.0})
    last = trainer.checkpoints.last_path()

    cfg2 = loads(CFG.format(tmp=tmp_path, epochs=2, bs=16))
    task2 = get_model(cfg2.model.type)(cfg2.model, cfg2.train.optimizer)
    dm2 = get_data_module(cfg2.dataset.type)(**cfg2.dataset.params)
    tr2 = Trainer(cfg2.train, name="resume_state2", full_cfg=cfg2)
    tr2.fit(task2, dm2, resume_from=last)
    # the resumed epoch must have trained at the RESTORED lr; after its val
    # epoch the plateau continues from best=0.123/num_bad=1 (patience 1)
    assert tr2.plateau.lr <= 1e-5 + 1e-12, tr2.plateau.lr
    assert tr2.plateau.best is not None
    # early stopping continued its window (wait keeps counting from 7
    # unless the resumed epoch actually improved on 0.117)
    assert tr2.early_stopping.best is not None
    assert tr2.early_stopping.wait in (0, 8)


def test_checkpoint_manager_nan_monitor_is_unrankable(tmp_path):
    from m2mixer_tpu.training.callbacks import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="val_loss",
                            mode="min", top_k=2, save_last=True)
    state = {"x": np.zeros((2,))}
    mgr.save(0, state, {"val_loss": 1.0})
    mgr.save(1, state, {"val_loss": float("nan")})
    mgr.save(2, state, {"val_loss": 0.5})
    assert mgr.best_path().endswith("epoch_2")
    # the NaN entry neither wins best nor poisons the top-k sort
    ranked = [e for e in mgr.index["entries"] if mgr._rankable(e)]
    assert all(not (isinstance(e["monitor"], float) and math.isnan(e["monitor"]))
               for e in ranked)
    # index.json stays valid strict JSON (no bare NaN tokens)
    import json

    with open(os.path.join(mgr.directory, "index.json")) as f:
        json.load(f)


def test_missing_monitor_warns(tmp_path, capsys):
    from m2mixer_tpu.training.callbacks import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck2"), monitor="val_acuracy")
    mgr.save(0, {"x": np.zeros((2,))}, {"val_loss": 1.0})
    assert "monitor 'val_acuracy' is not in" in capsys.readouterr().out


def test_test_rebuilds_steps_for_new_batch_size(tmp_path):
    """test() with a different-batch-size datamodule must rebuild the jitted
    eval path instead of reusing closures built for the fit geometry."""
    cfg, task, dm, trainer = _fit(tmp_path, epochs=1, bs=16, name="bs_switch")
    dm8 = get_data_module(cfg.dataset.type)(
        data_dir="unused", batch_size=8, synthetic=True,
        synthetic_sizes=[32, 16, 16])
    logs = trainer.test(task, dm8, ckpt=None)
    assert np.isfinite(logs["test_loss"])
    assert trainer._steps_bs == 8  # rebuilt against the new geometry


def test_test_ckpt_last_restores_last(tmp_path, monkeypatch):
    cfg, task, dm, trainer = _fit(tmp_path, epochs=1, name="last_restore")
    seen = []
    orig = trainer.restore
    monkeypatch.setattr(trainer, "restore",
                        lambda path, **kw: seen.append(path) or orig(path, **kw))
    trainer.test(task, dm, ckpt="last")
    assert seen == [trainer.checkpoints.last_path()]


def test_find_latest_checkpoint_skips_stray_version_dirs(tmp_path):
    cfg, task, dm, trainer = _fit(tmp_path, epochs=1, name="strays")
    base = os.path.join(trainer.logger.save_dir, trainer.logger.name)
    os.makedirs(os.path.join(base, "version_0_backup"), exist_ok=True)
    os.makedirs(os.path.join(base, "version_manual"), exist_ok=True)
    # must not raise, and still resolve the real version's checkpoint
    trainer._find_latest_checkpoint()


def test_find_latest_checkpoint_picks_newest_of_multiple_versions(tmp_path):
    """auto_resume with SEVERAL prior versions of the run name must resolve
    the newest version's 'last' checkpoint — skipping newer version dirs
    that never wrote one (e.g. a crashed-before-first-checkpoint run)."""
    _fit(tmp_path, epochs=1, name="multi_v")           # -> version_0
    cfg, task, dm, tr1 = _fit(tmp_path, epochs=1, name="multi_v")  # -> version_1
    v1_last = tr1.checkpoints.last_path()
    assert os.sep + "version_1" + os.sep in v1_last

    cfg3 = loads(CFG.format(tmp=tmp_path, epochs=1, bs=16))
    tr3 = Trainer(cfg3.train, name="multi_v", full_cfg=cfg3)  # -> version_2
    found = tr3._find_latest_checkpoint()
    assert found == v1_last

    # a newer, checkpoint-less version dir (crashed run) must be skipped
    base = os.path.join(tr3.logger.save_dir, tr3.logger.name)
    os.makedirs(os.path.join(base, "version_9", "checkpoints"), exist_ok=True)
    assert tr3._find_latest_checkpoint() == v1_last
