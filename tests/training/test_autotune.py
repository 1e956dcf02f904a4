"""Autotune CLI: measured lever search over the epoch-compiled train step.
Outcome on the CPU test mesh is noise — these tests pin the protocol
(measure, greedy stack, overlay emission), not which levers win."""

import json
import os

import numpy as np
import pytest

from m2mixer_tpu.autotune import (LEVERS, _overrides_to_yaml, autotune, main,
                                  measure_config)
from m2mixer_tpu.config import loads

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 1
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 0
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 8, synthetic: true,
            synthetic_sizes: [16, 8, 8]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.1
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


def _batch(n=8):
    rng = np.random.RandomState(0)
    return {
        "image": rng.rand(n, 1, 28, 28).astype(np.float32),
        "audio": rng.rand(n, 1, 112, 112).astype(np.float32),
        "label": rng.randint(0, 10, (n,)).astype(np.int32),
    }


def test_overrides_to_yaml_roundtrip():
    yaml = _overrides_to_yaml({"model.approximate_gelu": True,
                               "train.optimizer.moment_dtype": "bf16"})
    overlay = loads(yaml)
    assert overlay.model.approximate_gelu is True
    assert overlay.train.optimizer.moment_dtype == "bf16"


def test_measure_config_runs(tmp_path):
    from m2mixer_tpu.autotune import _tile_pool

    cfg = loads(CFG.format(tmp=tmp_path))
    arrays = _tile_pool(_batch(), 32)
    sps = measure_config(cfg, arrays, batch_size=8, steps=2, repeats=1)
    assert sps > 0


def test_autotune_greedy_protocol(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    logs = []
    result = autotune(cfg, _batch(), batch_size=8, steps=2, pool=32,
                      levers=["approximate_gelu", "moment_bf16"],
                      threshold=0.02, log=logs.append)
    assert result["baseline"] > 0 and result["best"] >= result["baseline"]
    assert {t["lever"] for t in result["trials"]} == {"approximate_gelu",
                                                      "moment_bf16"}
    # accepted levers map 1:1 onto emitted overrides
    assert set(result["overrides"]) == {LEVERS[n][0] for n in result["accepted"]}
    assert any("baseline" in line for line in logs)
    with pytest.raises(ValueError, match="unknown lever"):
        autotune(cfg, _batch(), 8, steps=2, pool=32, levers=["nope"])


def test_autotune_cli_writes_overlay(tmp_path, capsys):
    cfg_path = tmp_path / "tiny.yml"
    cfg_path.write_text(CFG.format(tmp=tmp_path))
    out = tmp_path / "tuned.yml"
    main(["-c", str(cfg_path), "-o", str(out), "--steps", "2", "--pool", "32",
          "--levers", "approximate_gelu"])
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["metric"] == "autotuned_train_samples_per_sec"
    assert payload["value"] > 0
    assert os.path.exists(out)
    overlay = loads(out.read_text())  # parses even when no lever won: '{}'
    assert overlay is not None
