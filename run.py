"""Experiment runner CLI.

Flag-compatible with the reference entrypoint (`/root/reference/run.py`):

    python run.py -c cfg/avmnist/avmnist_m2-mixer_S.yml -n my_run \\
        [-m train|test] [-p CKPT] [--disable-wandb] \\
        [model.dropout=0.2 train.optimizer.lr=1e-3 ...]

Unknown args become dotted config overrides (the wandb-sweep injection path).
Config schema: top-level ``train`` / ``dataset`` / ``model`` keys resolved
through the same string registries as the reference.
"""

from __future__ import annotations

import argparse
import os

from m2mixer_tpu import config as cfg_lib
from m2mixer_tpu import datasets, models
from m2mixer_tpu.parallel import MeshConfig
from m2mixer_tpu.training import Trainer


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, required=True)
    parser.add_argument("-n", "--name", type=str)
    parser.add_argument("-p", "--ckpt", type=str)
    parser.add_argument("-m", "--mode", type=str, default="train")
    parser.add_argument("--disable-wandb", action="store_true", default=False)
    parser.add_argument("--out", type=str, default=None,
                        help="output dir for -m export-intermediates "
                        "(default: corrects_data/ next to the -p checkpoint)")
    args, unknown = parser.parse_known_args()
    return args, unknown


def build(args, unknown):
    if not os.path.isfile(args.cfg):
        import difflib
        import glob
        import sys

        repo = os.path.dirname(os.path.abspath(__file__))
        known = glob.glob(os.path.join(repo, "cfg", "*", "*.yml"))
        close = difflib.get_close_matches(
            os.path.basename(args.cfg), [os.path.basename(k) for k in known], n=3)
        hint = ""
        if close:
            paths = [os.path.relpath(k, repo) for k in known
                     if os.path.basename(k) in close]
            hint = "\nDid you mean: " + ", ".join(sorted(paths))
        sys.exit(f"error: config file not found: {args.cfg}{hint}")
    cfg = cfg_lib.load(args.cfg)
    # parse + typo-guard + merge, shared with every other entry point
    cfg_lib.apply_cli_overrides(cfg, unknown)

    train_cfg, dataset_cfg, model_cfg = cfg.train, cfg.dataset, cfg.model
    task_cls = models.get_model(model_cfg.type)
    task = task_cls(model_cfg, train_cfg.optimizer)

    if dataset_cfg.params.get("num_workers", 0) == -1:
        dataset_cfg.params.num_workers = os.cpu_count()
    dm_cls = datasets.get_data_module(dataset_cfg.type)
    datamodule = dm_cls(**dataset_cfg.params)

    mesh_cfg = MeshConfig(
        data=train_cfg.get("mesh_data", -1),
        model=train_cfg.get("mesh_model", 1),
    )
    trainer = Trainer(
        train_cfg,
        name=args.name or "run",
        mesh_config=mesh_cfg,
        use_wandb=not args.disable_wandb,
        full_cfg=cfg,
    )
    return cfg, task, datamodule, trainer


def _resolve_ckpt(path: str) -> str:
    """Test-only modes accept a run's `checkpoints/` (or `version_*/`) dir
    too — resolved to its BEST checkpoint via index.json, the same contract
    as `serving export -p` and `train.init_from`."""
    from m2mixer_tpu.training.warmstart import resolve_checkpoint

    concrete = resolve_checkpoint(path)
    if os.path.abspath(concrete) != os.path.abspath(path):
        print(f"run: -p {path} -> best checkpoint {concrete}")
    return concrete


def main():
    args, unknown = parse_args()
    cfg, task, datamodule, trainer = build(args, unknown)

    if args.mode == "train":
        trainer.fit(task, datamodule, resume_from=args.ckpt)
        if trainer.preempted:
            # SIGTERM path: exit fast inside the grace window — skip the
            # best-ckpt test; the saved 'last' checkpoint resumes the run
            print("run: preempted — re-run with train.auto_resume=true "
                  "(or -p <ckpt>) to continue this training")
        else:
            trainer.test(task, datamodule, ckpt="best")
    elif args.mode == "test":
        if args.ckpt:
            trainer.restore_params_only(_resolve_ckpt(args.ckpt), task,
                                        datamodule)
        trainer.test(task, datamodule, ckpt=None)
    elif args.mode == "ablate":
        # modality-ablation report (beyond reference; the paper's robustness
        # analysis as a CLI): test metrics with each modality muted at eval
        # (input zeroed before its encoder — the train-time muting mechanism)
        # plus the full model. Conditions flow through ctx, so the eval step
        # compiles once.
        import json

        modalities = tuple(getattr(task, "modalities", ()) or ())
        if not modalities:
            raise SystemExit(
                "run: -m ablate needs a MultiLoss task with named modalities "
                f"({cfg.model.type} has none)")
        if args.ckpt:
            trainer.restore_params_only(_resolve_ckpt(args.ckpt), task,
                                        datamodule)
        report = {}
        for i, name in enumerate(modalities):  # muted first: the final full
            task.eval_mute_code = i            # run owns test_preds.npz
            report[f"mute_{name}"] = trainer.test(task, datamodule, ckpt=None)
        task.eval_mute_code = None
        report["full"] = trainer.test(task, datamodule, ckpt=None)
        out = os.path.join(trainer.ckpt_dir, "ablation.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"[ablate] report saved to {out}")
        for cond, logs in report.items():
            print(f"[ablate] {cond}: "
                  + json.dumps({k: round(v, 5) for k, v in sorted(logs.items())
                                if k.startswith("test_")}))
    elif args.mode == "export-intermediates":
        # write the corrects_data layout the post-hoc probe trains on
        # (`/root/reference/models/avmnist.py:424-444` +
        # `/root/reference/datasets/avmnist.py:193-261`): per-branch
        # flattened encoder tokens + was-this-branch-correct labels. The
        # output dir is `dataset.params.data_dir` of the probe config
        # (cfg/avmnist/avmnist_post.yml) — `--out DIR` chooses it.
        from m2mixer_tpu.utils.intermediates import export_intermediates

        if not args.ckpt:
            raise SystemExit("run: -m export-intermediates needs -p CKPT "
                             "(a trained MultiLoss run to export from)")
        ckpt = _resolve_ckpt(args.ckpt)
        trainer.restore_params_only(ckpt, task, datamodule)
        datamodule.setup("fit")  # the export sweeps train AND test splits
        # default output lands NEXT TO the trained checkpoint the user
        # named with -p (not in this export invocation's fresh run dir)
        out = args.out or os.path.join(os.path.dirname(ckpt), "corrects_data")
        counts = export_intermediates(task, trainer.params, datamodule, str(out))
        print(f"[intermediates] wrote {out}: "
              + ", ".join(f"{k}={v}" for k, v in counts.items()))
    else:
        raise ValueError(f"Unknown mode: {args.mode}")
    trainer.logger.close()
    return trainer


if __name__ == "__main__":
    main()
