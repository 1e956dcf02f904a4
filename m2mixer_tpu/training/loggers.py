"""Experiment loggers: TensorBoard (always), JSONL, optional wandb.

Mirrors the reference's dual logging (TensorBoard + wandb,
`/root/reference/run.py:42-45,72`) with wandb strictly optional behind the
same ``--disable-wandb`` flag; run summaries (best-epoch metrics, wall
times, param counts — `/root/reference/modules/train_test_module.py:38-70,
113-123`) land in ``summary.json`` instead of ``wandb.run.summary``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["ExperimentLogger"]


class ExperimentLogger:
    def __init__(self, save_dir: str, name: str, use_wandb: bool = False,
                 wandb_project: str = "MMixer", config: Optional[dict] = None,
                 version: Optional[int] = None, write: bool = True):
        """``write=False`` (multi-host non-primary processes): compute the
        SAME run/checkpoint paths as the primary (``version`` is broadcast
        from process 0 by the Trainer) but write no files — metrics land in
        the shared dir exactly once while every process still coordinates
        on one orbax checkpoint path."""
        self.save_dir = save_dir
        self.name = name or "run"
        self.write = bool(write)
        base = os.path.join(save_dir, self.name)
        if not self.write:
            assert version is not None, "write=False requires a version"
            self.version = int(version)
            self.log_dir = os.path.join(base, f"version_{self.version}")
            self._tb = None
            self._jsonl = None
            self.summary: Dict[str, float] = {}
            self._t0 = time.time()
            self._wandb = None
            return
        # versioned run dirs like Lightning's TensorBoardLogger
        os.makedirs(base, exist_ok=True)
        if version is not None:
            log_dir = os.path.join(base, f"version_{int(version)}")
            os.makedirs(log_dir, exist_ok=True)
        else:
            existing = [int(d.split("_")[1]) for d in os.listdir(base)
                        if d.startswith("version_") and d.split("_")[1].isdigit()]
            version = max(existing) + 1 if existing else 0
            # claim the dir atomically (exist_ok=False + retry): concurrent
            # same-name runs (sweep trials, significance workers) must never
            # share a version dir — len()-based numbering also collided after
            # a deleted version left a gap
            while True:
                log_dir = os.path.join(base, f"version_{version}")
                try:
                    os.makedirs(log_dir, exist_ok=False)
                    break
                except FileExistsError:
                    version += 1
        self.version = int(version)
        self.log_dir = log_dir

        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(self.log_dir)
        except Exception:
            pass

        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        self.summary: Dict[str, float] = {}
        self._t0 = time.time()

        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, name=name, config=config)
            except Exception as e:  # wandb absent in this image: degrade silently
                print(f"[logger] wandb unavailable ({type(e).__name__}); continuing without it")

        if config is not None:
            with open(os.path.join(self.log_dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if not self.write:
            return
        clean = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps({"step": step, "t": time.time() - self._t0, **clean}) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def set_summary(self, key: str, value) -> None:
        self.summary[key] = value
        if not self.write:
            return
        with open(os.path.join(self.log_dir, "summary.json"), "w") as f:
            json.dump(self.summary, f, indent=2, default=str)
        if self._wandb is not None:
            self._wandb.summary[key] = value

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()
