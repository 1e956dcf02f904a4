"""Gradual magnitude pruning (GMP): sparsified weights in the trace.

Beyond the reference (no sparsity story exists there): ``model.prune``
zeroes the smallest-magnitude fraction of every eligible weight leaf inside
the traced forward — train AND eval — with the sparsity following the
Zhu & Gupta (2017) cubic schedule over epochs,

    s(e) = s_final * (1 - (1 - clip((e - begin)/(end - begin), 0, 1))^3)

The epoch enters as the traced ``ctx['epoch']`` scalar, so the schedule
ramps without ever recompiling the step (the same design as the loss-weight
/ freeze schedules). Masks are recomputed from the CURRENT weights at every
step (per-leaf |w| quantile threshold), so pruned coordinates may revive
while their latent values still beat the moving threshold; gradients flow
only through surviving weights (``stop_gradient`` on the mask — latent
pruned weights keep their values).

Deployment: ``serving export`` bakes the final-sparsity mask into the
stored weights BEFORE any PTQ quantization — the exact prune-then-quantize
order the trace uses — so the ``model.qat`` lossless-export contract
(modules/qat.py) extends to pruned models unchanged. The eligibility
predicate is shared with the quantizers (``leaf_eligible``): float leaves,
ndim >= 2, >= ``min_size`` elements; ``targets`` path-substring filters
narrow it further (same matching rule as ``model.lora.targets``).

TPU shape: the per-leaf threshold is one sort + one compare-multiply per
weight leaf, fused by XLA into the step; at shipped model sizes this is
noise next to activations, but it DOES run every step — for very large
models, raise ``min_size`` or shorten the schedule if step time matters.
Unstructured sparsity does not accelerate dense MXU GEMMs; the win is
model-size/compression and regularization, not FLOPs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .qat import Q_MIN_SIZE, leaf_eligible

__all__ = ["parse_prune_config", "prune_schedule", "fake_prune",
           "sparsity_report"]


def parse_prune_config(cfg):
    """``model.prune`` -> (final_sparsity, begin_epoch, end_epoch, min_size,
    targets) with final_sparsity = 0.0 meaning "off". Accepts the float
    shorthand (``prune: 0.8`` — constant from epoch 0) or a mapping."""
    if cfg in (None, False, 0, 0.0):
        return 0.0, 0, 0, Q_MIN_SIZE, None
    if isinstance(cfg, (int, float)) and not isinstance(cfg, bool):
        cfg = {"sparsity": float(cfg)}
    if not hasattr(cfg, "get"):
        raise ValueError(
            f"model.prune must be a sparsity in (0, 1) or a mapping (got {cfg!r})")
    final = float(cfg.get("sparsity", 0.5))
    begin = int(cfg.get("begin_epoch", 0))
    end = int(cfg.get("end_epoch", begin))
    min_size = int(cfg.get("min_size", Q_MIN_SIZE))
    targets = cfg.get("targets", None)
    targets = tuple(targets) if targets else None
    if not 0.0 < final < 1.0:
        raise ValueError(
            f"model.prune sparsity must be in (0, 1) (got {final})")
    if end < begin or begin < 0:
        raise ValueError("model.prune needs 0 <= begin_epoch <= end_epoch "
                         f"(got {begin}..{end})")
    if min_size <= 0:
        raise ValueError(f"model.prune.min_size must be > 0 (got {min_size})")
    return final, begin, end, min_size, targets


def prune_schedule(epoch, final: float, begin: int, end: int) -> jnp.ndarray:
    """Traced cubic sparsity ramp (Zhu & Gupta 2017): 0 before ``begin``,
    ``final`` from ``end`` on. ``epoch`` may be a traced scalar."""
    e = jnp.asarray(epoch, jnp.float32)
    if end > begin:
        frac = jnp.clip((e - begin) / float(end - begin), 0.0, 1.0)
    else:
        frac = jnp.where(e >= begin, 1.0, 0.0)
    return jnp.asarray(final, jnp.float32) * (1.0 - (1.0 - frac) ** 3)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _leaf_selected(path, leaf, min_size: int,
                   targets: Optional[Sequence[str]]) -> bool:
    if not leaf_eligible(leaf, min_size):
        return False
    if targets is None:
        return True
    p = _path_str(path)
    return any(t in p for t in targets)


def _mask(w, sparsity):
    """0/1 keep-mask dropping the smallest-|w| ``sparsity`` fraction.
    The threshold is a |w|-quantile over the trailing (input, output) axes,
    one per leading stack index — so layer-stacked / paired-encoder /
    expert-stacked / ensemble-member leaves each prune per matrix rather
    than across the stack. ``sparsity`` may be traced; at 0 the threshold
    is min(|w|) and the >=-compare keeps everything, so pre-schedule epochs
    are exact pass-through."""
    mag = jnp.abs(w.astype(jnp.float32))
    flat = mag.reshape(*mag.shape[:-2], -1)
    thresh = jnp.quantile(flat, jnp.clip(sparsity, 0.0, 1.0), axis=-1)
    return (mag >= thresh[..., None, None]).astype(w.dtype)


def fake_prune(variables, sparsity, min_size: int = Q_MIN_SIZE,
               targets: Optional[Sequence[str]] = None):
    """Zero the smallest-magnitude ``sparsity`` fraction of every selected
    leaf (others pass through as the same objects). The mask is
    ``stop_gradient``-ed: gradients reach only surviving weights, while the
    latent values of pruned coordinates persist in checkpoints/optimizer
    state (they revive if the threshold moves past them)."""

    def fp(path, leaf):
        if not _leaf_selected(path, leaf, min_size, targets):
            return leaf
        return leaf * jax.lax.stop_gradient(_mask(leaf, sparsity))

    return jax.tree_util.tree_map_with_path(fp, variables)


def sparsity_report(variables, min_size: int = Q_MIN_SIZE,
                    targets: Optional[Sequence[str]] = None) -> Tuple[int, int]:
    """(zero_count, total_count) over the selected leaves — the achieved
    sparsity of a baked/pruned tree (host-side, for export logging)."""
    zeros = total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        if not _leaf_selected(path, leaf, min_size, targets):
            continue
        arr = jax.device_get(leaf)
        zeros += int((arr == 0).sum())
        total += int(arr.size)
    return zeros, total
