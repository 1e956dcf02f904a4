"""Full post-hoc probe pipeline: train flagship -> export intermediates ->
train the correctness probe on them (the avmnist_post path end-to-end)."""

import numpy as np

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.utils.intermediates import export_intermediates

BASE_CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 1
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
"""

PROBE_CFG = """
train:
  tensorboard_path: {tmp}/probe_logs
  log_interval_steps: 5
  epochs: 2
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 2
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistIntermediateDataModule
  params: {{data_dir: {tmp}/corrects_data, batch_size: 16, modality: image}}
model:
  type: AVMnistMixerMultiLossTP
  dropout: 0.1
  pos_weight: [1.5]
  modalities:
    classification: {{num_classes: 1, classifier: BasicClassifier,
                      input_shape: [64], hidden_dims: [32, 16]}}
"""


def test_post_hoc_probe_pipeline(tmp_path):
    # 1) train the base model briefly
    cfg = loads(BASE_CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="base", full_cfg=cfg)
    trainer.fit(task, dm)

    # 2) export intermediates in the reference corrects_data layout
    counts = export_intermediates(task, trainer.params, dm, str(tmp_path / "corrects_data"))
    assert counts["train"] == 32 and counts["test"] == 16
    v = np.load(tmp_path / "corrects_data" / "train" / "image_vectors.npy")
    c = np.load(tmp_path / "corrects_data" / "train" / "image_corrects.npy")
    assert v.shape == (32, 4 * 16)  # 4 tokens x hidden 16, flattened
    assert set(np.unique(c)) <= {0, 1}

    # 3) train the post-hoc correctness probe on the exported data
    pcfg = loads(PROBE_CFG.format(tmp=tmp_path))
    probe = get_model(pcfg.model.type)(pcfg.model, pcfg.train.optimizer)
    pdm = get_data_module(pcfg.dataset.type)(**pcfg.dataset.params)
    ptrainer = Trainer(pcfg.train, name="probe", full_cfg=pcfg)
    ptrainer.fit(probe, pdm)
    logs = ptrainer.test(probe, pdm, ckpt="best")
    assert "test_acc" in logs and np.isfinite(logs["test_loss"])


def test_export_intermediates_cli_mode(tmp_path, monkeypatch):
    """The probe chain's middle step as a user drives it:
    ``run.py -m export-intermediates -p CKPT --out DIR`` writes the
    corrects_data layout from a trained run, and the probe config trains on
    it through the normal ``run.py`` path (round-4: the full chain is
    CLI-drivable, not just library-callable)."""
    import json
    import os
    import sys

    import yaml

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import run as run_cli

    from m2mixer_tpu.config import todict

    monkeypatch.chdir(tmp_path)
    cfg_path = os.path.join(tmp_path, "base.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(todict(loads(BASE_CFG.format(tmp=tmp_path))), f,
                       sort_keys=False)

    monkeypatch.setattr("sys.argv", ["run.py", "-c", cfg_path, "-n", "pb",
                                     "-m", "train", "--disable-wandb"])
    trained = run_cli.main()
    ckpt = trained.checkpoints.last_path()

    out = str(tmp_path / "cli_corrects")
    monkeypatch.setattr("sys.argv", ["run.py", "-c", cfg_path, "-n", "pe",
                                     "-m", "export-intermediates",
                                     "--disable-wandb", "-p", ckpt,
                                     "--out", out])
    run_cli.main()
    v = np.load(os.path.join(out, "train", "image_vectors.npy"))
    assert v.shape == (32, 4 * 16)

    # the probe trains on the CLI-exported data via the normal train mode
    pcfg = loads(PROBE_CFG.format(tmp=tmp_path))
    pcfg.dataset.params.data_dir = out
    pcfg_path = os.path.join(tmp_path, "probe.yml")
    with open(pcfg_path, "w") as f:
        yaml.safe_dump(todict(pcfg), f, sort_keys=False)
    monkeypatch.setattr("sys.argv", ["run.py", "-c", pcfg_path, "-n", "pp",
                                     "-m", "train", "--disable-wandb"])
    ptrainer = run_cli.main()
    summary = json.load(open(os.path.join(ptrainer.logger.log_dir,
                                          "summary.json")))
    assert np.isfinite(summary["best_val_loss"])
