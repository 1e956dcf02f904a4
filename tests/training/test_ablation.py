"""Modality-ablation reports (`run.py -m ablate`, beyond reference).

The reference paper's robustness analysis as a CLI: test metrics with each
modality muted at eval (input zeroed before its encoder — the train-time
muting mechanism, `/root/reference/models/avmnist.py:247-256`) plus the full
model. The contract under test:

- eval muting of modality i is EXACTLY a zeroed modality-i input;
- the condition flows through ctx (no recompile between conditions);
- the CLI writes ablation.json with one metric dict per condition.
"""

import json
import os

import jax
import numpy as np
import pytest
import yaml

import run as run_cli
from m2mixer_tpu.config import loads, todict
from m2mixer_tpu.models import get_model

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 5e-3, weight_decay: 0.0}}
  seed: 11
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [48, 16, 16]}}
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


def _batch(n, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.rand(n, 1, 28, 28).astype(np.float32),
        "audio": rng.rand(n, 1, 112, 112).astype(np.float32),
        "label": rng.randint(0, 10, (n,)).astype(np.int32),
    }


def test_eval_mute_equals_zeroed_input(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = _batch(8)
    params = task.init_params(jax.random.PRNGKey(0), batch)

    task.eval_mute_code = 0  # mute image
    ctx = task.make_ctx(0, "test")
    assert int(ctx["mute_code"]) == 0
    _, aux_muted = task.step(params, batch, ctx, {}, train=False)

    task.eval_mute_code = None
    ctx_full = task.make_ctx(0, "test")
    assert int(ctx_full["mute_code"]) == -1
    zeroed = dict(batch, image=np.zeros_like(batch["image"]))
    _, aux_zero = task.step(params, zeroed, ctx_full, {}, train=False)
    np.testing.assert_array_equal(np.asarray(aux_muted["logits"]),
                                  np.asarray(aux_zero["logits"]))

    # the full forward differs — muting is actually doing something
    _, aux_full = task.step(params, batch, ctx_full, {}, train=False)
    assert not np.array_equal(np.asarray(aux_muted["logits"]),
                              np.asarray(aux_full["logits"]))


def test_ablate_cli_writes_report(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg_path = os.path.join(tmp_path, "abl.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(todict(loads(CFG.format(tmp=tmp_path))), f,
                       sort_keys=False)

    monkeypatch.setattr("sys.argv", ["run.py", "-c", cfg_path, "-n", "abl",
                                     "-m", "train", "--disable-wandb"])
    trained = run_cli.main()
    ckpt = trained.checkpoints.last_path()

    monkeypatch.setattr("sys.argv", ["run.py", "-c", cfg_path, "-n", "abl",
                                     "-m", "ablate", "--disable-wandb",
                                     "-p", ckpt])
    trainer = run_cli.main()
    report = json.load(open(os.path.join(trainer.ckpt_dir, "ablation.json")))
    assert set(report) == {"mute_image", "mute_audio", "full"}
    for cond, logs in report.items():
        assert 0.0 <= logs["test_acc"] <= 1.0, cond
    # muting an input can only change the forward; on this random-signal
    # synthetic set the muted losses must differ from the full model's
    assert (report["mute_image"]["test_loss"] != report["full"]["test_loss"]
            or report["mute_audio"]["test_loss"] != report["full"]["test_loss"])


def test_ablate_rejects_tasks_without_modalities(tmp_path, monkeypatch):
    cfg = loads(CFG.format(tmp=tmp_path))
    cfg.model.type = "AVMnistImageMixer"
    mods = cfg.model.modalities
    cfg.model.modalities = type(mods)(
        {"classification": mods.classification, "image": mods.image})
    cfg_path = os.path.join(tmp_path, "uni.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(todict(cfg), f, sort_keys=False)
    monkeypatch.setattr("sys.argv", ["run.py", "-c", cfg_path, "-n", "uni",
                                     "-m", "ablate", "--disable-wandb"])
    with pytest.raises(SystemExit, match="ablate"):
        run_cli.main()
