"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

Beyond the reference (which has no fine-tuning story beyond full training —
`/root/reference/run.py` always optimizes every parameter): ``model.lora``
reparametrizes selected kernel leaves of a trained checkpoint as

    W_eff = W + (alpha / rank) * A @ B        (Hu et al. 2021, "LoRA")

with ``A ~ N(0, 1/rank)`` of shape ``(..., in, rank)`` and ``B = 0`` of shape
``(..., rank, out)`` — so the initial forward is bit-identical to the base
model — and only ``A``/``B`` receive gradients and optimizer state. The
adapters live in a separate ``lora`` variable collection alongside
``params``; merging happens *inside the traced step* (``resolve_lora``), so
both trainer paths, the vmapped ensemble, and serving export all see the
effective weights with no special cases.

TPU shape: the merge is one small batched GEMM per targeted kernel, fused by
XLA into the surrounding graph. The optimizer win is real even at this model
scale — Adam moments exist only for the adapter leaves (the base tree is
``optax.masked`` out, see ``TrainTask.trainable_mask``), cutting optimizer
HBM traffic to O(rank * (in + out)) per matrix.

Targets: every leaf named ``kernel`` or ``*_kernel`` with ndim >= 2 and
min(in, out) > rank — this covers the modular flax Dense kernels, the
layer-stacked ``*_kernel`` leaves of StackedFusionMixer, and the paired
encoder's ``(L, 2, in, out)`` kernels (the low-rank factors broadcast over
the leading stack axes). ``model.lora.targets`` (list of substrings matched
against the ``/``-joined param path) restricts the set. Pallas-fused blocks
(``w1``/``w2``/... leaves) and MoE expert kernels use bespoke leaf names and
are not targeted by default — fine-tune those with full training or name
them explicitly via ``targets``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "lora_target_paths",
    "init_lora",
    "merge_lora",
    "resolve_lora",
]

#: key holding the merge scale (alpha / rank) inside the lora collection —
#: a traced scalar leaf, so checkpoints and serving artifacts are
#: self-describing (no config needed to merge them)
SCALE_KEY = "_scale"


def _is_kernel(name: str, leaf) -> bool:
    ndim = getattr(leaf, "ndim", 0)
    return (name == "kernel" or name.endswith("_kernel")) and ndim >= 2


def _iter_paths(params, prefix=()):
    if isinstance(params, dict) or hasattr(params, "items"):
        for k, v in sorted(params.items()):
            yield from _iter_paths(v, prefix + (str(k),))
    else:
        yield prefix, params


def lora_target_paths(
    params,
    rank: int,
    targets: Optional[Sequence[str]] = None,
) -> Tuple[Tuple[str, ...], ...]:
    """Paths (tuples of keys, within the ``params`` collection) of the
    kernel leaves LoRA will adapt. Raises if nothing matches — a silent
    no-adapter "fine-tune" would train nothing."""
    out = []
    for path, leaf in _iter_paths(params):
        if not _is_kernel(path[-1], leaf):
            continue
        if min(leaf.shape[-2], leaf.shape[-1]) <= rank:
            continue  # low-rank factorization would not compress this leaf
        joined = "/".join(path)
        if targets and not any(t in joined for t in targets):
            continue
        out.append(path)
    if not out:
        raise ValueError(
            f"model.lora matched no kernel leaves (rank={rank}, "
            f"targets={list(targets) if targets else None}). LoRA targets "
            "leaves named 'kernel'/'*_kernel' with min(in, out) > rank; "
            "check the targets substrings against the parameter tree.")
    return tuple(out)


def init_lora(
    rng: jax.Array,
    params,
    rank: int,
    alpha: Optional[float] = None,
    targets: Optional[Sequence[str]] = None,
):
    """Build the ``lora`` collection: per-target ``{'a', 'b'}`` factor pairs
    mirroring the params-tree structure, plus the scalar merge scale."""
    if rank <= 0:
        raise ValueError(f"model.lora.rank must be > 0 (got {rank})")
    scale = float(alpha if alpha is not None else rank) / float(rank)
    paths = lora_target_paths(params, rank, targets)
    lora: dict = {SCALE_KEY: jnp.float32(scale)}
    keys = jax.random.split(rng, len(paths))
    for key, path in zip(keys, paths):
        leaf = params
        for k in path:
            leaf = leaf[k]
        a_shape = (*leaf.shape[:-1], rank)
        b_shape = (*leaf.shape[:-2], rank, leaf.shape[-1])
        node = lora
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {
            # A gaussian / B zero (LoRA paper init): delta starts at exactly
            # zero, so step 0 reproduces the base checkpoint bit-for-bit
            "a": (jax.random.normal(key, a_shape, jnp.float32)
                  / jnp.sqrt(jnp.float32(rank))),
            "b": jnp.zeros(b_shape, jnp.float32),
        }
    return lora


def _is_factor_pair(node) -> bool:
    return (isinstance(node, dict) or hasattr(node, "items")) and set(node) == {"a", "b"}


def merge_lora(params, lora):
    """Effective weights: ``W + scale * A @ B`` on every adapted leaf.
    Works on dict trees and flax FrozenDicts; non-adapted subtrees pass
    through untouched (same leaf objects, no copies)."""
    scale = lora[SCALE_KEY]

    def walk(p, l):
        out = {}
        for k, v in p.items():
            sub = l.get(k) if hasattr(l, "get") else None
            if sub is None:
                out[k] = v
            elif _is_factor_pair(sub):
                delta = jnp.einsum("...ir,...ro->...io", sub["a"], sub["b"])
                out[k] = (v + scale * delta).astype(v.dtype)
            else:
                out[k] = walk(v, sub)
        return out

    return walk(params, lora)


def resolve_lora(variables):
    """Variables dict with any ``lora`` collection folded into ``params``.
    The single funnel used by the task step, serving export, and the
    inspection utilities; a no-op (same object) when no adapters exist."""
    if not (isinstance(variables, dict) and "lora" in variables):
        return variables
    rest = {k: v for k, v in variables.items() if k != "lora"}
    rest["params"] = merge_lora(variables["params"], variables["lora"])
    return rest
