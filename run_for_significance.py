"""Repeated-training significance runner.

Re-expresses ``/root/reference/run_for_significance.py``: N independent
train+test runs of one config (default 10), collecting ``test_acc`` from
each run's final metrics into ``test_scores.npy``. Matching the reference,
the seed is set once up front and NOT re-set per repeat
(`run_for_significance.py:34`) so repeats differ through RNG progression;
pass ``--reseed`` to give each repeat seed+i instead.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from m2mixer_tpu import config as cfg_lib
from m2mixer_tpu import datasets, models
from m2mixer_tpu.training import Trainer


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--cfg", type=str, required=True)
    parser.add_argument("-n", "--name", type=str, default="significance")
    parser.add_argument("-r", "--runs", type=int, default=10)
    parser.add_argument("--project", type=str, default="MMixer")
    parser.add_argument("--metric", type=str, default="test_acc")
    parser.add_argument("--disable-wandb", action="store_true", default=True)
    parser.add_argument("--reseed", action="store_true", default=False)
    parser.add_argument("--vmap", action="store_true", default=False,
                        help="train all N seed-members SIMULTANEOUSLY as one "
                             "compiled program (vmapped member axis) — same "
                             "protocol per member (early stopping, plateau "
                             "LR, best-val test), ~N-run results in roughly "
                             "one run's wall time at M2-Mixer scale; see "
                             "m2mixer_tpu/training/ensemble.py for the "
                             "documented divergences")
    parser.add_argument("--lrs", type=str, default=None,
                        help="with --vmap: comma-separated learning rates — "
                             "the member axis becomes a single-program LR "
                             "sweep (one member per rate; -r is ignored)")
    parser.add_argument("--export-ensemble", type=str, default=None,
                        metavar="DIR",
                        help="with --vmap: also export ALL trained members "
                             "as one on-device-ensembled serving artifact "
                             "(member-mean softmax logits + per-member "
                             "logits; see serving.export_ensemble_serving)")
    parser.add_argument("--cv", type=int, default=0, metavar="K",
                        help="K-fold cross-validation (beyond reference): "
                             "run i of K pools the train+val arrays and "
                             "re-cuts them so interleaved fold i is the val "
                             "split (early stopping / best-ckpt selection "
                             "rotate; the TEST split never moves). Replaces "
                             "-r with K runs; needs an in-memory array-"
                             "split datamodule")
    parser.add_argument("-o", "--out", type=str, default="test_scores.npy")
    args, unknown = parser.parse_known_args()
    return args, unknown


def main():
    args, unknown = parse_args()

    if args.cv and args.vmap:
        raise SystemExit("--cv cannot combine with --vmap: vmapped members "
                         "share ONE device-resident data pool, and CV folds "
                         "need per-member data. Run --cv sequentially.")
    if args.cv == 1 or args.cv < 0:
        raise SystemExit(f"--cv {args.cv}: need K >= 2 folds")
    if args.lrs and not args.vmap:
        raise SystemExit("--lrs requires --vmap (the LR sweep rides the "
                         "vmapped member axis)")
    if args.export_ensemble and not args.vmap:
        raise SystemExit("--export-ensemble requires --vmap (it packages "
                         "the vmapped member axis)")
    if args.vmap:
        from m2mixer_tpu.training.ensemble import run_ensemble_significance

        cfg = cfg_lib.load(args.cfg)
        cfg_lib.apply_cli_overrides(cfg, unknown)
        lrs = ([float(x) for x in args.lrs.split(",")] if args.lrs else None)
        runs = len(lrs) if lrs else args.runs
        scores = run_ensemble_significance(
            cfg, runs, metric=args.metric, reseed=args.reseed,
            member_lrs=lrs, export_dir=args.export_ensemble)
        np.save(args.out, scores)
        if lrs:
            for lr, s in zip(lrs, scores):
                print(f"[significance] lr={lr:g}: {args.metric}={s:.5f}")
        print(f"[significance] (vmapped x{runs}) {args.metric}: "
              f"mean={np.nanmean(scores):.5f} std={np.nanstd(scores):.5f} "
              f"-> {args.out}")
        return

    runs = args.cv if args.cv else args.runs
    scores = []
    for run in range(runs):
        cfg = cfg_lib.load(args.cfg)
        # typo guard once; repeats merge the same already-guarded tokens
        cfg_lib.apply_cli_overrides(cfg, unknown, warn=run == 0)
        if args.reseed:
            cfg.train.seed = int(cfg.train.seed) + run

        task = models.get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        if cfg.dataset.params.get("num_workers", 0) == -1:
            cfg.dataset.params.num_workers = os.cpu_count()
        dm = datasets.get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        if args.cv:
            from m2mixer_tpu.datasets.base import apply_cv_fold

            dm.setup("fit")
            try:
                apply_cv_fold(dm, run, args.cv)
            except ValueError as e:
                raise SystemExit(f"[significance] {e}")
            print(f"[significance] CV fold {run + 1}/{args.cv}: "
                  f"train={dm.split_size('train')} val={dm.split_size('val')}")
        trainer = Trainer(cfg.train, name=f"{args.name}_run{run}",
                          use_wandb=not args.disable_wandb, full_cfg=cfg)
        trainer.fit(task, dm)
        if trainer.preempted:
            # SIGTERM: the run checkpointed resumably — stop the study and
            # report the completed runs instead of burning the grace window
            trainer.logger.close()
            print(f"[significance] preempted during run {run}; "
                  f"reporting {len(scores)} completed runs")
            break
        logs = trainer.test(task, dm, ckpt="best")
        scores.append(logs.get(args.metric, float("nan")))
        trainer.logger.close()
        print(f"[significance] run {run}: {args.metric}={scores[-1]:.5f}")

    scores = np.asarray(scores)
    np.save(args.out, scores)
    print(f"[significance] {args.metric}: mean={np.nanmean(scores):.5f} "
          f"std={np.nanstd(scores):.5f} -> {args.out}")


if __name__ == "__main__":
    main()
