"""Reverse migration CLI: a native checkpoint becomes a reference-style
Lightning .ckpt (`python -m m2mixer_tpu.utils.torch_export`).

Roundtrip contract: export -> ``load_lightning_checkpoint`` ->
``convert_reference_state_dict`` reproduces the trained params bit-exactly,
for both the modular and the ``paired_encoders`` layouts. The forward
mapping's torch-parity is pinned by test_torch_import.py; this closes the
cycle in the other direction.
"""

import jax
import numpy as np
import pytest
import torch
import yaml

from m2mixer_tpu.config import loads, todict
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer
from m2mixer_tpu.utils.torch_export import main, modular_params_from_state
from m2mixer_tpu.utils.torch_import import (convert_reference_state_dict,
                                            load_lightning_checkpoint)

CFG = """
train:
  tensorboard_path: {tmp}/logs
  epochs: 1
  compiled_epochs: true
  optimizer: {{lr: 1e-3, weight_decay: 0.0{ema}}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 8, synthetic: true,
            synthetic_sizes: [16, 8, 8]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  paired_encoders: {paired}
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 2}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 2}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""


def _fit(tmp_path, paired=False, ema=""):
    cfg = loads(CFG.format(tmp=tmp_path, paired=str(paired).lower(), ema=ema))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"exp_{paired}_{bool(ema)}",
                      full_cfg=cfg)
    trainer.fit(task, dm)
    cfg_file = tmp_path / f"cfg_{paired}.yml"
    cfg_file.write_text(yaml.safe_dump(todict(cfg)))
    return cfg, trainer, str(cfg_file)


def _assert_same_tree(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (p, va), (_, vb) in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(p))


def test_export_roundtrips_modular(tmp_path):
    cfg, trainer, cfg_file = _fit(tmp_path, paired=False)
    out = tmp_path / "exported.ckpt"
    main([trainer.checkpoints.last_path(), "-c", cfg_file, "-o", str(out)])

    sd = load_lightning_checkpoint(str(out))
    # reference conv layout restored: (out, in, p, p) per modality
    assert sd["image_mixer.to_patch_embedding.0.weight"].shape == (16, 1, 14, 14)
    assert sd["audio_mixer.to_patch_embedding.0.weight"].shape == (16, 1, 56, 56)
    back = convert_reference_state_dict(sd, ("image", "audio"))
    _assert_same_tree(back, trainer.params)

    # Lightning on-disk metadata
    raw = torch.load(str(out), map_location="cpu", weights_only=False)
    assert raw["epoch"] == 0 and "pytorch-lightning_version" in raw
    assert all(isinstance(v, torch.Tensor) for v in raw["state_dict"].values())


def test_export_roundtrips_paired_encoders(tmp_path):
    """A paired-encoder (TPU modality-batched) checkpoint exports to the SAME
    reference naming: the layer-stacked leaves are re-laid per modality."""
    cfg, trainer, cfg_file = _fit(tmp_path, paired=True)
    assert "paired_encoder" in trainer.params["params"]
    out = tmp_path / "exported_paired.ckpt"
    main([trainer.checkpoints.last_path(), "-c", cfg_file, "-o", str(out)])

    sd = load_lightning_checkpoint(str(out))
    back = convert_reference_state_dict(sd, ("image", "audio"))
    _assert_same_tree(back, modular_params_from_state(trainer.params))


def test_export_ema_requires_ema_checkpoint(tmp_path):
    cfg, trainer, cfg_file = _fit(tmp_path, paired=False)
    with pytest.raises(SystemExit, match="ema"):
        main([trainer.checkpoints.last_path(), "-c", cfg_file,
              "-o", str(tmp_path / "x.ckpt"), "--ema"])


def test_export_ema_exports_averaged_weights(tmp_path):
    cfg, trainer, cfg_file = _fit(tmp_path, paired=False,
                                  ema=", ema_decay: 0.8")
    from m2mixer_tpu.training.trainer import ema_params_from_opt_state

    out = tmp_path / "exported_ema.ckpt"
    main([trainer.checkpoints.last_path(), "-c", cfg_file, "-o", str(out),
          "--ema"])
    back = convert_reference_state_dict(
        load_lightning_checkpoint(str(out)), ("image", "audio"))
    _assert_same_tree(back, ema_params_from_opt_state(trainer.opt_state))
