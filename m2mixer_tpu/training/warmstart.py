"""Params-only checkpoint loading: warm starts and teacher models.

The reference has exactly two ways to reuse weights — Lightning resume and
``load_from_checkpoint`` (`/root/reference/models/avmnist.py:400-411`), both
of which require the checkpoint to match the model exactly. Beyond that,
this module implements the fine-tuning primitives:

``train.init_from: DIR`` — initialize a fit from another run's weights
(params only: fresh optimizer state, epoch 0, schedules from scratch).
Leaves are grafted by path; shape-mismatched leaves (a swapped
classification head, a different label count) keep their fresh
initialization, so head-swap transfer "just works". Combine with
``model.lora`` for parameter-efficient fine-tuning.

Accepted paths: a trainer ``checkpoints/`` directory (resolved through its
``index.json`` to the best-ranked checkpoint), a run ``version_*/``
directory containing one, or a concrete orbax checkpoint directory.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resolve_checkpoint", "load_checkpoint_params", "graft_params"]


def resolve_checkpoint(path: str, which: str = "best") -> str:
    """Concrete orbax checkpoint dir for ``path``. ``which`` picks 'best'
    (by the run's own monitor, via index.json) or 'last'."""
    path = os.path.abspath(path)
    for candidate in (path, os.path.join(path, "checkpoints")):
        index = os.path.join(candidate, "index.json")
        if os.path.isfile(index):
            with open(index) as f:
                idx = json.load(f)
            if which == "last":
                target = idx.get("last")
            else:
                import math

                entries = [e for e in idx.get("entries", [])
                           if e.get("monitor") is not None
                           and not (isinstance(e["monitor"], float)
                                    and math.isnan(e["monitor"]))]
                if entries:
                    entries.sort(key=lambda e: e["monitor"],
                                 reverse=idx.get("mode", "min") == "max")
                    target = entries[0]["path"]
                else:
                    target = idx.get("last")
            if not target or not os.path.isdir(target):
                raise FileNotFoundError(
                    f"{index} resolves {which!r} to {target!r}, which does "
                    "not exist")
            return target
    if os.path.isdir(path):
        return path
    raise FileNotFoundError(
        f"checkpoint path {path!r} is neither a checkpoints/ directory "
        "(index.json), a run directory containing one, nor an orbax "
        "checkpoint directory")


def load_checkpoint_params(path: str, which: str = "best"):
    """Raw (host numpy) params tree of the checkpoint at ``path``. Accepts
    full trainer states (takes their 'params' subtree) and bare param
    trees."""
    import orbax.checkpoint as ocp

    concrete = resolve_checkpoint(path, which)
    restored = ocp.PyTreeCheckpointer().restore(concrete)
    return restored["params"] if "params" in restored else restored


def graft_params(live, loaded) -> Tuple[Any, Dict[str, int]]:
    """Copy every ``loaded`` leaf whose path exists in ``live`` with the
    same shape; everything else keeps the live (freshly initialized) leaf.
    Grafted leaves keep the live leaf's dtype and (mesh) placement. Returns
    ``(tree, stats)`` with counts and the skipped-path lists, and raises if
    NOTHING matched — that is always a wrong-checkpoint error, not a
    fine-tune."""
    stats = {"taken": 0, "kept": 0, "shape_mismatch": [], "missing": []}

    def walk(path, lv, ld):
        if isinstance(lv, dict) or hasattr(lv, "items"):
            out = {}
            for k, v in lv.items():
                sub = ld.get(k) if hasattr(ld, "get") else None
                if sub is None:
                    stats["missing"].append("/".join(path + (str(k),)))
                    stats["kept"] += len(jax.tree.leaves(v))
                    out[k] = v
                else:
                    out[k] = walk(path + (str(k),), v, sub)
            return out
        if ld is None or hasattr(ld, "items"):
            stats["missing"].append("/".join(path))
            stats["kept"] += 1
            return lv
        new = np.asarray(ld)
        if tuple(new.shape) != tuple(np.shape(lv)):
            stats["shape_mismatch"].append(
                f"{'/'.join(path)}: ckpt{tuple(new.shape)} != "
                f"live{tuple(np.shape(lv))}")
            stats["kept"] += 1
            return lv
        stats["taken"] += 1
        sharding = getattr(lv, "sharding", None)
        arr = jnp.asarray(new, dtype=getattr(lv, "dtype", new.dtype))
        from jax.sharding import NamedSharding

        if isinstance(sharding, NamedSharding):
            return jax.device_put(arr, sharding)
        return arr

    grafted = walk((), live, loaded)
    if stats["taken"] == 0:
        raise ValueError(
            "warm start matched ZERO leaves — the checkpoint's parameter "
            f"tree shares no paths/shapes with this model (mismatches: "
            f"{stats['shape_mismatch'][:5]}, missing: {stats['missing'][:5]})")
    return grafted, stats
