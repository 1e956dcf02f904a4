"""Migration CLI: a reference Lightning .ckpt becomes a native checkpoint
directory that the trainer's -m test / -p paths consume directly.

The fake .ckpt is produced by exporting fresh-init params through
``export_reference_state_dict`` (roundtrip-exactness of that mapping is
pinned by test_torch_import.py), wrapped in Lightning's on-disk layout
(``{'state_dict': ..., 'epoch': ..., 'global_step': ...}``).
"""

import jax
import numpy as np
import pytest
import torch

from m2mixer_tpu.config import loads
from m2mixer_tpu.models import get_model
from m2mixer_tpu.utils.torch_import import export_reference_state_dict, main

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 8, num_workers: 0, synthetic: true,
            synthetic_sizes: [16, 8, 8]}}
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


def _write_fake_lightning_ckpt(tmp_path, cfg, epoch=3, global_step=42):
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {"image": np.zeros((1, 1, 28, 28), np.float32),
             "audio": np.zeros((1, 1, 112, 112), np.float32),
             "label": np.zeros((1,), np.int32)}
    variables = task.init_params(jax.random.PRNGKey(1), batch)
    sd = export_reference_state_dict(
        variables, ("image", "audio"),
        patch_conv_shapes={"image": (1, 14, 14), "audio": (1, 56, 56)})
    ckpt = {
        "state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
        "epoch": epoch,
        "global_step": global_step,
    }
    path = tmp_path / "last.ckpt"
    torch.save(ckpt, str(path))
    return str(path), variables


def test_import_cli_roundtrips_into_trainer(tmp_path):
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.training import Trainer

    cfg = loads(CFG.format(tmp=tmp_path))
    cfg_file = tmp_path / "cfg.yml"
    import yaml

    from m2mixer_tpu.config import todict
    cfg_file.write_text(yaml.safe_dump(todict(cfg)))

    ckpt_path, variables = _write_fake_lightning_ckpt(tmp_path, cfg)
    out = tmp_path / "imported"
    main([ckpt_path, "-c", str(cfg_file), "-o", str(out)])
    assert (out / "epoch_3").exists() and (out / "index.json").exists()

    # the trainer's test path (-m test -p DIR) consumes it directly
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="imported", full_cfg=cfg)
    trainer.restore_params_only(str(out / "epoch_3"), task, dm)
    assert trainer.current_epoch == 3  # Lightning counter carried over
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(trainer.params["params"])):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))
    # and it evaluates end-to-end
    metrics = trainer.test(task, dm, ckpt=None)
    assert np.isfinite(metrics["test_loss"])


def test_import_cli_rejects_mismatched_config(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    ckpt_path, _ = _write_fake_lightning_ckpt(tmp_path, cfg)
    cfg_file = tmp_path / "cfg_wrong.yml"
    import yaml

    from m2mixer_tpu.config import todict
    wrong = loads(CFG.format(tmp=tmp_path))
    wrong.model.modalities.image.channel_dim = 64  # checkpoint was trained at 32
    cfg_file.write_text(yaml.safe_dump(todict(wrong)))
    with pytest.raises(ValueError, match="shape mismatch"):
        main([ckpt_path, "-c", str(cfg_file), "-o", str(tmp_path / "bad")])
