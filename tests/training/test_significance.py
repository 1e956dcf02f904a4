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
        capture_output=True, text=True, timeout=900, cwd=repo, env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    scores = np.load(out)
    assert scores.shape == (2,)
    assert np.isfinite(scores).all()
