"""K-fold cross-validation (`run_for_significance.py --cv K`, beyond
reference): the train+val arrays pool and re-cut per fold; the test split
never moves. Contract under test:

- folds partition the pooled samples exactly (disjoint, exhaustive,
  interleaved comb), deterministically;
- the fold survives the trainer's own setup() call and trains end to end;
- guards: non-array datamodules, bad K, --cv/--vmap combination.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from m2mixer_tpu.config import loads
from m2mixer_tpu.datasets import get_data_module
from m2mixer_tpu.datasets.base import apply_cv_fold
from m2mixer_tpu.models import get_model
from m2mixer_tpu.training import Trainer

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 3e-3, weight_decay: 0.0}}
  seed: 9
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [40, 20, 16]}}
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


def _dm(tmp):
    cfg = loads(CFG.format(tmp=tmp))
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.setup("fit")
    return cfg, dm


def test_folds_partition_pool(tmp_path):
    k = 3
    _, base = _dm(tmp_path)
    pool_labels = np.concatenate([base.splits["train"]["label"],
                                  base.splits["val"]["label"]])
    test_before = base.splits["test"]["label"].copy()
    n = len(pool_labels)

    val_sets = []
    for fold in range(k):
        _, dm = _dm(tmp_path)
        apply_cv_fold(dm, fold, k)
        tr, va = dm.splits["train"]["label"], dm.splits["val"]["label"]
        assert len(tr) + len(va) == n
        assert abs(len(va) - n / k) < 1  # balanced comb
        # fold = the interleaved comb fold::k over the pooled order
        np.testing.assert_array_equal(va, pool_labels[fold::k])
        # test split untouched
        np.testing.assert_array_equal(dm.splits["test"]["label"], test_before)
        val_sets.append(set(np.arange(n)[fold::k]))
    # disjoint + exhaustive
    assert set().union(*val_sets) == set(range(n))
    assert sum(len(s) for s in val_sets) == n

    # parallel arrays stay aligned: every modality was cut the same way
    _, dm = _dm(tmp_path)
    pool_img = np.concatenate([dm.splits["train"]["image"],
                               dm.splits["val"]["image"]])
    apply_cv_fold(dm, 1, k)
    np.testing.assert_array_equal(dm.splits["val"]["image"], pool_img[1::k])


def test_fold_guards(tmp_path):
    _, dm = _dm(tmp_path)
    with pytest.raises(ValueError, match="bad CV fold"):
        apply_cv_fold(dm, 3, 3)
    with pytest.raises(ValueError, match="bad CV fold"):
        apply_cv_fold(dm, 0, 1)
    with pytest.raises(ValueError, match="exceeds"):
        apply_cv_fold(dm, 0, 10_000)

    class NoArrays:
        splits = {}

    with pytest.raises(ValueError, match="array-split datamodule"):
        apply_cv_fold(NoArrays(), 0, 2)


def test_fold_survives_trainer_fit(tmp_path):
    """The trainer's internal setup() must not rebuild the original splits;
    a fold-rotated datamodule trains and tests end to end."""
    cfg, dm = _dm(tmp_path)
    apply_cv_fold(dm, 0, 4)
    n_train, n_val = dm.split_size("train"), dm.split_size("val")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    trainer = Trainer(cfg.train, name="cv0", full_cfg=cfg)
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt=None)
    assert np.isfinite(logs["test_loss"])
    assert dm.split_size("train") == n_train and dm.split_size("val") == n_val


def test_cv_cli_guards():
    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "run_for_significance.py"),
         "-c", "whatever.yml", "--cv", "3", "--vmap"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert r.returncode != 0 and "--cv cannot combine with --vmap" in r.stderr
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "run_for_significance.py"),
         "-c", "whatever.yml", "--cv", "1"],
        capture_output=True, text=True, timeout=300, cwd=repo, env=env)
    assert r.returncode != 0 and "need K >= 2" in r.stderr
