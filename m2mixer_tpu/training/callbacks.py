"""Host-side training control flow: early stopping, plateau LR, checkpoints.

These reproduce the exact semantics the reference delegates to Lightning and
torch (`/root/reference/run.py:60-68`; ReduceLROnPlateau in
`/root/reference/models/avmnist.py:413-422`): EarlyStopping(monitor val_loss,
patience 30, mode min), ModelCheckpoint(save_last, save_top_k=5, monitor from
config), and ReduceLROnPlateau(factor 0.1, rel threshold 1e-4, patience from
config). All are pure host logic keyed on epoch-level validation metrics —
the one part of the trainer that must NOT live under jit.
"""

from __future__ import annotations

import json
import math
import os
import shutil
from typing import Optional

import jax

__all__ = ["EarlyStopping", "ReduceLROnPlateau", "CheckpointManager"]


def _better(value: float, best: Optional[float], mode: str, min_delta: float = 0.0) -> bool:
    if best is None or math.isnan(best):
        return True
    if mode == "min":
        return value < best - min_delta
    return value > best + min_delta


class EarlyStopping:
    """Lightning-parity: stop after ``patience`` epochs without improvement
    greater than ``min_delta`` over the running best."""

    def __init__(self, monitor: str = "val_loss", patience: int = 30, mode: str = "min",
                 min_delta: float = 0.0):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.wait = 0
        self.should_stop = False

    def update(self, logs: dict) -> bool:
        value = logs.get(self.monitor)
        if value is None:
            return False
        if _better(value, self.best, self.mode, self.min_delta):
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.should_stop = True
        return self.should_stop


class LRSchedule:
    """Config-driven per-epoch LR schedule with optional linear warmup —
    the production alternative to the reference's fixed plateau scheduler.
    Same ``update(val_metric) -> lr`` surface as ``ReduceLROnPlateau`` (the
    metric is ignored; the schedule is epoch-driven), selected via
    ``train.optimizer.schedule``:

        schedule: {type: cosine, warmup_epochs: 5, min_lr: 1e-5}
        schedule: {type: linear, min_lr: 0.0}
        schedule: {type: step, step_size: 30, gamma: 0.1}
        schedule: {type: exponential, gamma: 0.97}
        schedule: {type: constant, warmup_epochs: 3}
    """

    def __init__(self, initial_lr: float, cfg, max_epochs: int):
        self.lr0 = float(initial_lr)
        self.lr = self.lr0
        self.kind = str(cfg.get("type", "cosine"))
        if self.kind not in ("cosine", "linear", "step", "exponential", "constant"):
            raise ValueError(f"Unknown schedule type: {self.kind!r}")
        self.warmup = int(cfg.get("warmup_epochs", 0))
        self.min_lr = float(cfg.get("min_lr", 0.0))
        self.step_size = int(cfg.get("step_size", 30))
        self.gamma = float(cfg.get("gamma", 0.1))
        self.max_epochs = max(int(max_epochs), 1)
        self.epoch = 0  # epochs completed

    def at_epoch(self, epoch: int) -> float:
        """LR to use DURING ``epoch`` (0-indexed)."""
        if epoch < self.warmup:
            return self.lr0 * (epoch + 1) / self.warmup
        if self.kind == "constant":
            return self.lr0
        span = max(self.max_epochs - self.warmup, 1)
        t = min(max(epoch - self.warmup, 0), span) / span
        if self.kind == "cosine":
            return self.min_lr + 0.5 * (self.lr0 - self.min_lr) * (1 + math.cos(math.pi * t))
        if self.kind == "linear":
            return self.min_lr + (self.lr0 - self.min_lr) * (1 - t)
        if self.kind == "step":
            return max(self.lr0 * self.gamma ** ((epoch - self.warmup) // self.step_size),
                       self.min_lr)
        # exponential
        return max(self.lr0 * self.gamma ** (epoch - self.warmup), self.min_lr)

    def update(self, _value: float) -> float:
        self.epoch += 1
        self.lr = self.at_epoch(self.epoch)
        return self.lr


class ReduceLROnPlateau:
    """torch-parity plateau scheduler (factor 0.1, threshold 1e-4 'rel',
    cooldown 0, min_lr 0) driving the optimizer's injected learning rate."""

    def __init__(self, initial_lr: float, patience: int = 5, factor: float = 0.1,
                 threshold: float = 1e-4, mode: str = "min", min_lr: float = 0.0):
        self.lr = float(initial_lr)
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.mode = mode
        self.min_lr = min_lr
        self.best: Optional[float] = None
        self.num_bad = 0

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "min":
            return value < self.best * (1 - self.threshold)
        return value > self.best * (1 + self.threshold)

    def update(self, value: float) -> float:
        """Returns the (possibly reduced) learning rate."""
        if self._improved(value):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


class CheckpointManager:
    """Top-k-by-monitor + save-last retention on top of Orbax.

    Layout: ``dir/epoch_N/`` Orbax pytree checkpoints + ``index.json``
    recording monitor values; ``best_path()`` resolves Lightning's
    ``ckpt_path='best'`` (`/root/reference/run.py:81`).
    """

    def __init__(self, directory: str, monitor: str = "val_loss", mode: str = "min",
                 top_k: int = 5, save_last: bool = True, async_save: bool = False):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self.save_last = save_last
        self.index: dict = {"entries": [], "last": None}
        self._index_path = os.path.join(self.directory, "index.json")
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self.index = json.load(f)
        import orbax.checkpoint as ocp

        # async_save (train.async_checkpointing): serialization happens on a
        # background thread so the epoch loop never blocks on checkpoint IO
        # (device->host array pulls still happen at save() call time; the
        # disk write is what overlaps the next epoch). Orbax serializes
        # overlapping saves internally; wait() makes everything durable.
        self.async_save = bool(async_save)
        if self.async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        self._inflight: Optional[str] = None
        # newest checkpoint KNOWN to be committed on disk — what the on-disk
        # index's 'last' points at while a newer save is still in flight
        self._last_durable: Optional[str] = self.index.get("last")
        # multi-host: every process calls save() on the SAME directory
        # (orbax coordinates the write internally), but host-side filesystem
        # mutations — index.json, stale-dir deletion — happen on the primary
        # only; non-primaries keep the in-memory index for best_path()
        self._primary = jax.process_count() == 1 or jax.process_index() == 0

    def wait(self) -> None:
        """Block until any in-flight async save has committed to disk, then
        publish its index entry. No-op for the synchronous checkpointer.
        Call before reading a just-written checkpoint or handing the
        directory to another process (the trainer does both automatically)."""
        if self.async_save:
            self._ckptr.wait_until_finished()
            if self._inflight is not None:
                # the entry withheld from the on-disk index is durable now
                self._inflight = None
                self._last_durable = self.index.get("last")
                self._write_index()
        self._inflight = None

    def _rmtree(self, path: str) -> None:
        # never delete a directory whose async write is still in flight
        if self._inflight == path:
            self.wait()
        if self._primary and os.path.exists(path):
            shutil.rmtree(path)
        if jax.process_count() > 1:
            # no process may start (re)writing this path until the primary's
            # deletion has happened
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_rm:{path}")

    def _write_index(self):
        if not self._primary:
            return  # in-memory index stays current for best_path()
        # monitor name + mode recorded so offline consumers (e.g. serving's
        # --average top-k checkpoint soup) can rank entries standalone
        self.index["monitor"] = self.monitor
        self.index["mode"] = self.mode
        disk = self.index
        if self._inflight is not None:
            # an async write commits by renaming its tmpdir into place, so
            # the in-flight directory does not exist on disk yet: publish
            # only committed entries (a crash mid-write must not leave an
            # index pointing at a checkpoint that was never materialized)
            disk = dict(self.index)
            disk["entries"] = [e for e in self.index["entries"]
                               if e["path"] != self._inflight]
            if disk.get("last") == self._inflight:
                disk["last"] = self._last_durable
        with open(self._index_path, "w") as f:
            json.dump(disk, f, indent=2)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch}")

    def save(self, epoch: int, state, metrics: dict) -> None:
        value = metrics.get(self.monitor)
        if value is None and not getattr(self, "_warned_monitor", False):
            # without a monitor value, top-k retention silently degrades to
            # save-last; make the misconfiguration loud (Lightning warns too)
            print(f"[checkpoints] WARNING: monitor {self.monitor!r} is not in "
                  f"the logged metrics ({sorted(metrics)}); retention "
                  "degrades to last-only and ckpt='best' resolves to 'last'")
            self._warned_monitor = True
        if isinstance(value, float) and math.isnan(value):
            value = None  # NaN sorts arbitrarily; treat as unrankable
        path = self._path(epoch)
        if self.async_save and self._inflight is not None:
            # cheap: the previous epoch's write had the whole epoch to land
            # (orbax's AsyncCheckpointer would serialize on it here anyway);
            # flushing first keeps the on-disk index one durable step behind
            # at most
            self.wait()
        self._rmtree(path)
        state = jax.tree.map(lambda x: x, state)  # shallow copy of structure
        self._ckptr.save(path, state)  # returns immediately under async_save
        if self.async_save:
            self._inflight = path
        else:
            self._last_durable = path
        self.index["entries"] = [e for e in self.index["entries"] if e["epoch"] != epoch]
        self.index["entries"].append({"epoch": epoch, "monitor": value, "path": path})
        self.index["last"] = path
        self._prune()
        self._write_index()

    def save_preempted(self, state, epoch_label: int) -> None:
        """Emergency (preemption) save: a 'last'-only checkpoint in its own
        ``preempted/`` directory, so it never overwrites a ranked top-k
        epoch checkpoint; ``index['last']`` points at it (auto-resume
        follows 'last'). The entry is unrankable (monitor None) and prunes
        itself once a later normal save supersedes it as 'last'."""
        path = os.path.join(self.directory, "preempted")
        self._rmtree(path)
        state = jax.tree.map(lambda x: x, state)
        self._ckptr.save(path, state)
        self.wait()  # the process is about to exit: make the save durable NOW
        self._last_durable = path
        self.index["entries"] = [e for e in self.index["entries"] if e["path"] != path]
        self.index["entries"].append(
            {"epoch": int(epoch_label), "monitor": None, "path": path})
        self.index["last"] = path
        self._prune()
        self._write_index()

    @staticmethod
    def _rankable(e) -> bool:
        v = e["monitor"]
        return v is not None and not (isinstance(v, float) and math.isnan(v))

    def _prune(self):
        entries = [e for e in self.index["entries"] if self._rankable(e)]
        reverse = self.mode == "max"
        entries.sort(key=lambda e: e["monitor"], reverse=reverse)
        keep = entries[: self.top_k]
        keep_paths = {e["path"] for e in keep} | ({self.index["last"]} if self.save_last else set())
        for e in self.index["entries"]:
            if e["path"] not in keep_paths:
                self._rmtree(e["path"])
        self.index["entries"] = [e for e in self.index["entries"] if e["path"] in keep_paths]

    def best_path(self) -> Optional[str]:
        entries = [e for e in self.index["entries"] if self._rankable(e)]
        if not entries:
            return self.index.get("last")
        reverse = self.mode == "max"
        entries.sort(key=lambda e: e["monitor"], reverse=reverse)
        return entries[0]["path"]

    def last_path(self) -> Optional[str]:
        return self.index.get("last")

    def restore(self, path: str, target):
        """Restore a checkpoint into the structure of ``target``. Explicit
        per-leaf restore args carry the target's shardings, so orbax places
        arrays directly onto the current mesh instead of warning and reading
        sharding metadata from the checkpoint files (which is wrong across
        topology changes anyway — cross-mesh re-placement happens here)."""
        self.wait()  # the path may be the save scheduled moments ago
        import orbax.checkpoint as ocp

        def restore_arg(leaf):
            # (ocp.checkpoint_utils.construct_restore_args rejects the numpy
            # scalars in the progress fields, so build args directly)
            if isinstance(leaf, jax.Array) and hasattr(leaf, "sharding"):
                return ocp.ArrayRestoreArgs(sharding=leaf.sharding,
                                            global_shape=leaf.shape,
                                            dtype=leaf.dtype)
            return ocp.RestoreArgs()

        try:
            restore_args = jax.tree.map(restore_arg, target)
        except (TypeError, ValueError):
            restore_args = None  # exotic leaf in the target tree only
        if restore_args is not None:
            return self._ckptr.restore(path, item=target,
                                       restore_args=restore_args)
        return self._ckptr.restore(path, item=target)
