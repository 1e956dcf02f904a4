"""Train-every-config certification matrix.

The PARITY claim behind ``datasets/surrogate.py`` is that EVERY shipped
``cfg/**/*.yml`` is drivable end to end without external data. This module
turns that claim into a checked contract: for each config it generates the
config's family surrogate, runs a short ``Trainer.fit`` + best-checkpoint
test through the same assembly as ``run.py`` (reference protocol:
`/root/reference/run.py:76-83`), and asserts

- finite train/val losses in ``metrics.jsonl``,
- checkpoint artifacts (``checkpoints/epoch_*``, ``summary.json`` with
  ``best_val_loss``),
- the family's own test-metric keys, finite (e.g. ``test_acc`` for
  AV-MNIST `/root/reference/models/avmnist.py:366-380`, ``test_f1w`` for
  MM-IMDB `mmimdb.py:184-192`, ``test_f1_micro`` for MIMIC
  `mimic.py:162-181`, ``test_f1`` for MMHS150K/MultiOFF
  `mmhs150.py:172-189`, ``test_f1m`` for Memotion `memotion.py:187-192`).

Only the data location, run-output paths, epoch count, and batch size are
overridden — the MODEL geometry certifies as shipped.

CLI::

    python -m m2mixer_tpu.certify [--epochs 1] [-k avmnist] [--out DIR]

prints one PASS/FAIL line per config and writes ``certify_report.json``.
The parametrized pytest twin is ``tests/models/test_certify_matrix.py``.
"""

from __future__ import annotations

import glob
import json
import os
import traceback
from typing import Dict, Optional

import numpy as np

__all__ = ["certify_config", "ensure_surrogate", "shipped_configs",
           "FAMILY_BY_DATAMODULE"]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: dataset.type -> surrogate family (datasets/surrogate.py FAMILIES; the
#: intermediate-vector probe has its own pipeline, see _prepare_post_hoc)
FAMILY_BY_DATAMODULE = {
    "AVMnistDataModule": "avmnist",
    "AVMnistIntermediateDataModule": "post_hoc",
    "MMIMDBExtDataModule": "mmimdb_ext",
    "MMIMDBDataModule": "mmimdb",
    "MIMICDataModule": "mimic",
    "MMHS150DataModule": "mmhs150",
    "MultiOFFDataModule": "multioff",
    "MemotionDataModule": "memotion",
    "PnlpMixerDataModule": "pnlp",
    "CMUMosiDataModule": "mosi",
}

#: surrogate sample counts — small enough for CPU certification, large
#: enough that every split is non-empty at batch size 8
SURROGATE_N = {
    "avmnist": 120, "mmimdb": 60, "mmimdb_ext": 60, "mimic": 240,
    # memotion 60: the dev split (10%) must hold all 5 sentiment classes
    # so the per-split cat.codes (reference quirk) stay globally aligned
    "mmhs150": 60, "multioff": 40, "memotion": 60, "pnlp": 60, "mosi": 60,
}


def shipped_configs():
    return sorted(glob.glob(os.path.join(REPO, "cfg", "*", "*.yml")))


def ensure_surrogate(family: str, root: str) -> str:
    """Generate the family surrogate under ``root/family`` once (marker
    file makes this idempotent so a test session shares one copy)."""
    from .datasets.surrogate import generate

    out = os.path.join(root, family)
    marker = os.path.join(out, ".complete")
    if not os.path.exists(marker):
        generate(family, out, n=SURROGATE_N[family])
        with open(marker, "w") as f:
            f.write("ok\n")
    return out


def _expected_metric(cfg) -> str:
    """The family's primary test-metric key (SURVEY.md §6 table)."""
    dm = str(cfg.dataset.type)
    if dm in ("AVMnistDataModule", "AVMnistIntermediateDataModule",
              "PnlpMixerDataModule"):
        return "test_acc"
    if dm == "CMUMosiDataModule":
        task = str(cfg.dataset.params.get("train_cfg", {}).get("task",
                                                               "classification"))
        return "test_mae" if task == "regression" else "test_acc"
    if dm in ("MMIMDBDataModule", "MMIMDBExtDataModule"):
        return "test_f1w"
    if dm == "MIMICDataModule":
        return "test_f1_micro"
    if dm in ("MMHS150DataModule", "MultiOFFDataModule"):
        return "test_f1"
    if dm == "MemotionDataModule":
        return "test_f1m"
    raise ValueError(f"no expected metric known for dataset type {dm!r}")


def _point_at_surrogate(cfg, family: str, sdir: str, batch: int) -> None:
    """Rewrite ONLY data locations + batch/worker knobs onto the surrogate."""
    p = cfg.dataset.params
    if family == "pnlp":
        p.train_cfg.dataset_path = sdir
        p.train_cfg.train_batch_size = batch
        p.train_cfg.test_batch_size = batch
        p.train_cfg.num_workers = 0
        p.vocab_cfg.tokenizer.vocab = os.path.join(sdir, "vocab.txt")
        p.vocab_cfg.vocab_path = os.path.join(sdir, "vocab.npy")
        return
    if family == "mosi":
        p.data_path = os.path.join(sdir, "mosi_raw.pkl")
        p.vocab_cfg.tokenizer.vocab = os.path.join(sdir, "vocab.txt")
        p.vocab_cfg.vocab_path = os.path.join(sdir, "vocab.npy")
    else:
        p.data_dir = sdir
        if family in ("mmimdb", "mmhs150", "multioff", "memotion"):
            # pnlp-projection families: the surrogate ships its own small
            # vocab + hash cache (surrogate.py::_write_vocab)
            p.vocab.tokenizer.vocab = os.path.join(sdir, "vocab.txt")
            p.vocab.vocab_path = os.path.join(sdir, "vocab.npy")
    p.batch_size = batch
    if "num_workers" in p:
        p.num_workers = 0


def _prepare_post_hoc(work_dir: str, seed: int = 0) -> str:
    """avmnist_post.yml pipeline: its AVMnistIntermediateDataModule consumes
    intermediate vectors a BASE AV-MNIST model exports
    (`/root/reference/models/avmnist.py:424-444`). Train a 1-epoch base
    model whose image tokens x hidden = 49 x 64 = 3136 (the shipped probe's
    input width) on synthetic AV-MNIST, export, return corrects_data."""
    from .config import loads
    from .datasets import get_data_module
    from .models import get_model
    from .training import Trainer
    from .utils.intermediates import export_intermediates

    base = loads(f"""
train:
  tensorboard_path: {work_dir}/base_logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: {seed}
  monitor: val_loss
  monitor_mode: min
  mesh_data: 1
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, synthetic: true,
            synthetic_sizes: [64, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 98, 64]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 64, patch_size: 4,
             image_size: [28, 28], token_dim: 8, channel_dim: 64, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 64, patch_size: 16,
             image_size: [112, 112], token_dim: 8, channel_dim: 64, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 64, token_dim: 8, channel_dim: 64, num_mixers: 1}}
""")
    task = get_model(base.model.type)(base.model, base.train.optimizer)
    dm = get_data_module(base.dataset.type)(**base.dataset.params)
    trainer = Trainer(base.train, name="certify_base", use_wandb=False,
                      full_cfg=base)
    trainer.fit(task, dm)
    out = os.path.join(work_dir, "corrects_data")
    export_intermediates(task, trainer.params, dm, out)
    return out


def certify_config(cfg_path: str, work_dir: str, surrogate_root: str,
                   epochs: int = 1, batch: int = 8,
                   seed: Optional[int] = None) -> Dict:
    """Run one shipped config end to end on its family surrogate.

    Returns a report dict with ``ok`` plus per-check details; never raises
    (failures land in ``error``)."""
    from . import config as cfg_lib
    from .datasets import get_data_module
    from .models import get_model
    from .parallel import MeshConfig
    from .training import Trainer

    import jax

    from .modules.common import set_bits_dropout, set_gelu_approximate

    name = os.path.relpath(cfg_path, REPO) if cfg_path.startswith(REPO) else cfg_path
    report: Dict = {"cfg": name, "ok": False, "checks": {}}
    # snapshot process-global trace-time state: configs like the turbo
    # variant bind tanh-GELU / bits-dropout flavors and flip the global
    # PRNG impl at trace time; a certification run over MANY configs in one
    # process (and the pytest matrix sharing a process with golden-parity
    # tests) must leave the process exactly as it found it
    prev_gelu = set_gelu_approximate(False)
    set_gelu_approximate(prev_gelu)
    prev_bits = set_bits_dropout(False)
    set_bits_dropout(prev_bits)
    prev_prng = jax.config.jax_default_prng_impl
    try:
        cfg = cfg_lib.load(cfg_path)
        report["model_type"] = str(cfg.model.type)
        family = FAMILY_BY_DATAMODULE[str(cfg.dataset.type)]
        report["family"] = family

        if family == "post_hoc":
            data_dir = _prepare_post_hoc(work_dir)
            cfg.dataset.params.data_dir = data_dir
            cfg.dataset.params.batch_size = batch
            if "num_workers" in cfg.dataset.params:
                cfg.dataset.params.num_workers = 0
        else:
            sdir = ensure_surrogate(family, surrogate_root)
            _point_at_surrogate(cfg, family, sdir, batch)

        cfg.train.epochs = int(epochs)
        cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
        cfg.train.log_interval_steps = 5
        if seed is not None:
            cfg.train.seed = int(seed)
        # single-device certification: DP/TP/FSDP parity has its own suite
        # (tests/parallel/); this matrix certifies config+task+data wiring
        cfg.train.mesh_data = 1
        cfg.train.mesh_model = 1

        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        trainer = Trainer(cfg.train, name="certify",
                          mesh_config=MeshConfig(data=1, model=1),
                          use_wandb=False, full_cfg=cfg)
        trainer.fit(task, dm)
        logs = trainer.test(task, dm, ckpt="best")
        report["test_metrics"] = {k: float(v) for k, v in logs.items()}

        run_dir = trainer.logger.log_dir
        # 1) finite train/val losses over the whole run
        rows = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
        val_losses = [r["val_loss"] for r in rows if "val_loss" in r]
        train_losses = [r["train_loss"] for r in rows if "train_loss" in r]
        report["checks"]["losses_finite"] = (
            len(val_losses) >= int(epochs) and len(train_losses) > 0
            and bool(np.isfinite(val_losses).all())
            and bool(np.isfinite(train_losses).all()))
        # 2) checkpoint artifacts + summary
        ckpts = glob.glob(os.path.join(run_dir, "checkpoints", "epoch_*"))
        summary = json.load(open(os.path.join(run_dir, "summary.json")))
        report["checks"]["checkpoints"] = bool(ckpts)
        report["checks"]["summary_best_val"] = bool(
            np.isfinite(summary.get("best_val_loss", np.nan)))
        # 3) the family's own metric keys, finite
        key = _expected_metric(cfg)
        report["expected_metric"] = key
        report["checks"]["family_metric"] = (
            key in logs and bool(np.isfinite(logs[key])))
        report["checks"]["test_loss_finite"] = bool(
            np.isfinite(logs.get("test_loss", np.nan)))
        report["ok"] = all(report["checks"].values())
        if not report["ok"]:
            report["error"] = f"failed checks: " + ", ".join(
                k for k, v in report["checks"].items() if not v)
    except Exception as e:  # report, don't raise: the matrix prints all rows
        report["error"] = f"{type(e).__name__}: {e}"
        report["traceback"] = traceback.format_exc()
    finally:
        set_gelu_approximate(prev_gelu)
        set_bits_dropout(prev_bits)
        jax.config.update("jax_default_prng_impl", prev_prng)
    return report


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-k", "--filter", default="",
                    help="substring filter on config paths")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="certify_out",
                    help="work dir (surrogates, run logs, report)")
    ap.add_argument("--cpu", action="store_true",
                    help="certify on the host CPU backend (the matrix "
                    "checks wiring, not performance; on remote-device "
                    "setups this avoids 28 tunnel compiles)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    cfgs = [c for c in shipped_configs() if args.filter in c]
    if not cfgs:
        raise SystemExit(f"no configs match filter {args.filter!r}")
    os.makedirs(args.out, exist_ok=True)
    sroot = os.path.join(args.out, "surrogates")
    reports = []
    for i, c in enumerate(cfgs):
        work = os.path.join(args.out, f"run_{os.path.basename(c)[:-4]}")
        r = certify_config(c, work, sroot, epochs=args.epochs,
                           batch=args.batch)
        reports.append(r)
        status = "PASS" if r["ok"] else "FAIL"
        extra = "" if r["ok"] else f"  <- {r.get('error', '?')}"
        print(f"[certify] {status} {r['cfg']}{extra}", flush=True)
    path = os.path.join(args.out, "certify_report.json")
    with open(path, "w") as f:
        json.dump(reports, f, indent=2)
    n_ok = sum(r["ok"] for r in reports)
    print(f"[certify] {n_ok}/{len(reports)} configs certified -> {path}")
    if n_ok != len(reports):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
