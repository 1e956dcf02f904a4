"""Epoch-compiled training path: must run and agree with per-step training."""

import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.parallel import MeshConfig
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 2
  compiled_epochs: {compiled}
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 11
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [40, 16, 16]}}
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


def run(tmp_path, compiled: bool):
    cfg = loads(CFG.format(tmp=tmp_path, compiled=str(compiled).lower()))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"ce_{compiled}", full_cfg=cfg,
                      mesh_config=MeshConfig(data=1, model=1))
    trainer.fit(task, dm)
    return trainer


def test_compiled_matches_per_step(tmp_path):
    """40 samples / bs 16 -> 2 full scan steps + 1 ragged tail step; the
    compiled and per-step paths must produce identical metrics (same data
    order, same per-step rng folding)."""
    t_compiled = run(tmp_path / "a", compiled=True)
    t_step = run(tmp_path / "b", compiled=False)
    assert t_compiled.compiled_epochs
    assert not t_step.compiled_epochs
    for key in ("train_loss", "val_loss", "val_acc", "train_loss_fusion"):
        np.testing.assert_allclose(
            t_compiled.callback_metrics[key], t_step.callback_metrics[key],
            rtol=2e-5, atol=2e-6,
        )


def test_compiled_test_artifacts(tmp_path):
    trainer = run(tmp_path, compiled=True)
    cfg = loads(CFG.format(tmp=tmp_path, compiled="true"))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    logs = trainer.test(trainer.task, dm, ckpt="best")
    import os

    data = np.load(os.path.join(trainer.ckpt_dir, "test_preds.npz"))
    assert data["preds"].shape[0] == 16
    assert data["logits"].shape == (16, 10)


def test_compiled_multidevice_matches_single(tmp_path):
    """Epoch-compiled training over a 4x2 DPxTP mesh must equal the
    single-device run (same data order, same rng folding)."""
    from m2mixer_tpu.parallel import MeshConfig as MC

    results = {}
    for name, mc in (("multi", MC(data=4, model=2, model_min_dim=16)),
                     ("single", MC(data=1, model=1))):
        cfg = loads(CFG.format(tmp=tmp_path / name, compiled="true"))
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name=f"cem_{name}", full_cfg=cfg, mesh_config=mc)
        trainer.fit(task, dm)
        assert trainer.compiled_epochs
        results[name] = trainer.callback_metrics
    for key in ("train_loss", "val_loss", "val_acc"):
        np.testing.assert_allclose(results["multi"][key], results["single"][key],
                                   rtol=2e-4, atol=1e-5)
