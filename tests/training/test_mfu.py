"""train.log_mfu: per-epoch MFU from XLA's cost analysis of the train step."""

import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.parallel import MeshConfig
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 1
  log_mfu: true
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
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


def _run(tmp_path, mesh=None):
    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="mfu", full_cfg=cfg,
                      mesh_config=mesh or MeshConfig(data=1, model=1))
    trainer.fit(task, dm)
    return trainer


def test_mfu_logged_single_device(tmp_path):
    trainer = _run(tmp_path)
    mfu = trainer.callback_metrics.get("train_mfu")
    assert mfu is not None and np.isfinite(mfu) and mfu > 0
    # sanity: FLOPs/sample must be in the ballpark of the analytic count
    # for this geometry (bench.py's formula: fwd+bwd ~ 3x fwd GEMMs)
    fps = trainer._mfu_flops_per_sample
    assert 1e4 < fps < 1e9, fps


def test_mfu_logged_on_mesh(tmp_path):
    """SPMD cost analysis prices ONE partition; the meter scales it by the
    mesh size (and the peak by the chip count) so train_mfu is logged on
    exactly the meshes where MFU matters. Per-GLOBAL-sample FLOPs must
    agree with the single-device measurement (the partitioned program runs
    bs/N samples per device at ~1/N the FLOPs)."""
    single = _run(tmp_path)
    sharded = _run(tmp_path, mesh=MeshConfig(data=4, model=1))
    mfu = sharded.callback_metrics.get("train_mfu")
    assert mfu is not None and np.isfinite(mfu) and mfu > 0
    fps_single = single._mfu_flops_per_sample
    fps_sharded = sharded._mfu_flops_per_sample
    # DP partitioning replicates the math over 1/N of the batch: per-sample
    # totals agree up to partitioning overhead (collectives add no flops)
    assert 0.7 < fps_sharded / fps_single < 1.5, (fps_single, fps_sharded)
