"""Epoch-compiled training: many optimizer steps in ONE device dispatch.

The hot-loop bottleneck on small models is not FLOPs but per-step dispatch
latency (host -> device round trips). The TPU-native fix: keep the whole
training split resident in HBM, and run an epoch (or a fixed-size chunk of
steps) as a single jitted ``lax.scan`` — minibatch gather, forward, backward,
Adam update, and frozen-parameter masking all inside one XLA program. The
host only supplies a shuffled index order and the epoch context.

This is the standing replacement for the reference's
DataLoader-worker-feeds-one-step-at-a-time shape: for AV-MNIST it turns
~1.7k dispatches per epoch into one.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_train_epoch_fn", "make_eval_epoch_fn", "shard_align_order",
           "make_sharded_gather", "make_grad_masker", "sam_value_and_grad",
           "pcgrad_value_and_grad"]


def sam_value_and_grad(loss_fn, params, rho: float, masker=None, frozen=None):
    """``value_and_grad`` with optional SAM (Foret et al. 2021,
    "Sharpness-Aware Minimization"): when ``rho > 0``, take the gradient at
    the adversarially-perturbed point ``w + rho * g/||g||`` (one extra
    fwd+bwd — ~2x step cost) while reporting loss/aux from the CLEAN point
    so logged losses and metrics stay comparable to plain runs. The ascent
    direction is masked first (``masker``), so frozen modalities, LoRA base
    trees, and non-parameter collections are never perturbed — sharpness is
    measured only in the trainable subspace. Shared by every train path
    (per-step, accumulation, epoch scan, ensemble vmap)."""
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    # a traced rho (the ensemble's per-member sam_rho sweep axis) cannot be
    # branched on — fall through to the SAM math, which is exact for rho=0
    # too (scale 0 -> adv == params); the static-0 early exit keeps plain
    # runs at one backward pass
    if isinstance(rho, (int, float, np.integer, np.floating)) and not rho:
        return (loss, aux), grads
    ascent = masker(grads, frozen) if masker is not None else grads
    norm = optax.global_norm(ascent)
    scale = jnp.asarray(rho, norm.dtype) / (norm + 1e-12)
    adv = jax.tree.map(
        lambda p, g: p + (scale * g).astype(p.dtype), params, ascent)
    (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(adv)
    return (loss, aux), grads


def pcgrad_value_and_grad(comp_fn, params, masker=None, frozen=None):
    """``value_and_grad`` with PCGrad gradient surgery (Yu et al. 2020,
    "Gradient Surgery for Multi-Task Learning"): per-component gradients are
    taken with ONE shared forward + one backward per component (``jax.vjp``
    seeded with unit cotangents), pairwise de-conflicted — each g_i drops its
    projection onto any ORIGINAL g_j it negatively aligns with — and summed.

    ``comp_fn(params) -> (components, (total, aux))`` where ``components``
    sums to the step total (``MultiLossTask.step_components``); the reported
    loss/aux come from the exact unprojected ``total`` so logs stay
    comparable with plain runs. The frozen/trainable ``masker`` applies to
    each component gradient BEFORE the projection, so coordinates the
    optimizer will never see (frozen modalities, LoRA base trees, BN stats)
    cannot steer the conflict resolution. Projection order is deterministic
    cyclic (the paper samples a random task order per step; at the shipped
    branch counts of 3-5 the difference is below run-to-run noise, and
    determinism keeps the epoch scan and its parity tests reproducible)."""
    from jax.flatten_util import ravel_pytree

    comps, vjp_fn, (total, aux) = jax.vjp(comp_fn, params, has_aux=True)
    n = comps.shape[0]
    stacked = jax.vmap(lambda e: vjp_fn(e)[0])(jnp.eye(n, dtype=comps.dtype))
    if masker is not None:
        # frozen_mask/trainable_mask leaves are per-leaf scalars: they
        # broadcast over the stacked component axis
        stacked = masker(stacked, frozen)
    _, unravel = ravel_pytree(params)
    G = jax.vmap(lambda g: ravel_pytree(g)[0])(stacked)  # (n, D)
    sq = jnp.sum(G * G, axis=1)

    def project(i):
        def body(j, g):
            coef = jnp.minimum(jnp.dot(g, G[j]), 0.0) / (sq[j] + 1e-12)
            return g - jnp.where(j == i, 0.0, coef) * G[j]

        return jax.lax.fori_loop(0, n, body, G[i])

    flat = jnp.sum(jax.vmap(project)(jnp.arange(n)), axis=0)
    return (total, aux), unravel(flat)


def make_grad_masker(frozen_mask, trainable_mask=None):
    """Shared grads/updates masking for every train path (per-step,
    accumulation, epoch-compiled): multiplies by the DYNAMIC frozen gate
    (``1 - frozen*(1-m)``: leaf trains unless the traced ``frozen`` flag is
    set and its frozen_mask entry is 0) and, when present, the STATIC
    trainable mask zeroing non-parameter collections unconditionally."""
    if trainable_mask is None:
        def masker(tree, frozen):
            return jax.tree.map(
                lambda g, m: g * (1.0 - frozen * (1.0 - m)), tree, frozen_mask)
    else:
        def masker(tree, frozen):
            return jax.tree.map(
                lambda g, m, t: g * t * (1.0 - frozen * (1.0 - m)),
                tree, frozen_mask, trainable_mask)
    return masker


def shard_align_order(order: np.ndarray, batch_size: int, n_shards: int,
                      shard_size: int):
    """Rearrange a global index order so every batch draws ``batch_size /
    n_shards`` items from each pool shard (required by the sharded
    device-resident pool: each device gathers its batch shard from its LOCAL
    pool shard, no cross-device traffic). Returns ``(aligned, leftover)``:
    ``aligned`` is laid out per step as [shard0 items.., shard1 items..] so
    position k of a batch lives on device k // (batch/n_shards); ``leftover``
    are indices that couldn't fill a balanced step (ragged tails / shard
    imbalance) and go through the per-step host path."""
    order = np.asarray(order)
    per = batch_size // n_shards
    shard_of = order // shard_size
    buckets = [order[shard_of == d] for d in range(n_shards)]
    n_steps = min(len(b) // per for b in buckets) if buckets else 0
    if n_steps == 0:
        return np.zeros((0,), order.dtype), order
    aligned = np.empty((n_steps, n_shards, per), dtype=order.dtype)
    leftovers = []
    for d, b in enumerate(buckets):
        aligned[:, d, :] = b[: n_steps * per].reshape(n_steps, per)
        leftovers.append(b[n_steps * per:])
    return aligned.reshape(-1), np.concatenate(leftovers)


def make_sharded_gather(mesh: Mesh):
    """Per-device local gather over a ``data``-sharded pool via shard_map:
    each device takes its batch shard from its local pool shard (indices are
    shard-aligned by ``shard_align_order``; globals are localized with the
    device's axis index). The result is already batch-sharded over ``data``."""
    try:
        from jax import shard_map  # jax >= 0.4.35 canonical location
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def gather(arrays, idx):
        def local(arrs, idx_l):
            d = jax.lax.axis_index("data")

            def take(a):
                # a is the LOCAL shard here: shape[0] == pool // n_shards
                return jnp.take(a, idx_l - d * a.shape[0], axis=0)

            return jax.tree.map(take, arrs)

        data_spec = lambda a: P("data", *([None] * (a.ndim - 1)))
        return shard_map(
            local, mesh=mesh,
            in_specs=(jax.tree.map(data_spec, arrays), P("data")),
            out_specs=jax.tree.map(data_spec, arrays),
        )(arrays, idx)

    return gather


def _batch_constrainer(mesh: Optional[Mesh]):
    """On a multi-device mesh the data pool is replicated; constraining the
    gathered minibatch to the ``data`` axis makes XLA run each step
    data-parallel (every device gathers its own shard locally)."""
    if mesh is None or mesh.size == 1:
        return lambda b: b

    def constrain(batch):
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            ),
            batch,
        )

    return constrain


def make_train_epoch_fn(task, optimizer, frozen_mask, batch_size: int,
                        mesh: Optional[Mesh] = None,
                        sharded_pool: bool = False,
                        watch_gradients: bool = False,
                        trainable_mask=None,
                        grad_accum: int = 1,
                        sam_rho: float = 0.0,
                        pcgrad: bool = False) -> Callable:
    """Returns jitted ``epoch(params, opt_state, arrays, order, ctx, rngs,
    start_step) -> (params, opt_state, losses, aux)``.

    ``arrays``: the full split as device-resident arrays; ``order``: flat
    index array of length ``n_steps * batch_size`` (shuffled or not);
    ``aux`` is the per-step task aux pytree stacked along a leading steps
    axis. With ``sharded_pool`` the arrays are ``data``-axis sharded (1/Nth
    of the pool per device) and ``order`` must be shard-aligned
    (``shard_align_order``); gathers then stay device-local.

    ``trainable_mask``: static 0/1 pytree (``task.trainable_mask``) zeroing
    updates to non-parameter collections (BN running stats); those are
    instead refreshed from ``aux['_mutable_state']`` when the task declares
    ``mutable_collections``.

    ``grad_accum`` K > 1: each scan step consumes K consecutive micro-batches
    (an inner scan keeps activation memory at micro-batch scale), averages
    their gradients, and applies ONE optimizer update — large effective
    batches without the memory. Per-micro-batch losses/aux are flattened so
    epoch metrics see every sample; ``start_step`` counts optimizer updates
    (rng folds use update*K + micro for uniqueness). Not combinable with
    mutable collections.
    """
    if grad_accum > 1 and getattr(task, "mutable_collections", ()):
        raise ValueError("grad_accum_steps > 1 is not supported together "
                         "with mutable collections (BN running stats)")

    constrain = _batch_constrainer(mesh)
    gather = (make_sharded_gather(mesh) if sharded_pool and mesh is not None
              else None)
    masker = make_grad_masker(frozen_mask, trainable_mask)

    def epoch(params, opt_state, arrays, order, ctx, rngs, start_step):
        if hasattr(task, "bind_trace_flavors"):
            task.bind_trace_flavors()  # trace-time flavor binding
        n_steps = order.shape[0] // (batch_size * grad_accum)

        def micro_grads(params, i, j):
            """One micro-batch: (loss, aux), grads."""
            idx = jax.lax.dynamic_slice_in_dim(
                order, (i * grad_accum + j) * batch_size, batch_size)
            if gather is not None:
                batch = gather(arrays, idx)
            else:
                batch = constrain(jax.tree.map(lambda a: jnp.take(a, idx, axis=0), arrays))
            micro_step = (start_step + i) * grad_accum + j
            step_rngs = {name: jax.random.fold_in(key, micro_step)
                         for name, key in rngs.items()}

            if pcgrad:
                # train.optimizer.pcgrad: per-component gradient surgery
                return pcgrad_value_and_grad(
                    lambda p: task.step_components(p, batch, ctx, step_rngs,
                                                   train=True),
                    params, masker, ctx["frozen"])

            def loss_fn(p):
                return task.step(p, batch, ctx, step_rngs, train=True)

            return sam_value_and_grad(loss_fn, params, sam_rho,
                                      masker, ctx["frozen"])

        def body(carry, i):
            params, opt_state = carry
            if grad_accum == 1:
                (loss, aux), grads = micro_grads(params, i, 0)
            else:
                def micro(acc, j):
                    (loss, aux), g = micro_grads(params, i, j)
                    return jax.tree.map(jnp.add, acc, g), (loss, aux)

                zero = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.result_type(p)), params)
                grads, (loss, aux) = jax.lax.scan(
                    micro, zero, jnp.arange(grad_accum))
                grads = jax.tree.map(lambda g: g / grad_accum, grads)
            if watch_gradients:
                # wandb.watch analog (`/root/reference/run.py:53`): global
                # gradient norm per step, logged as train_grad_norm
                aux = dict(aux, grad_norm=optax.global_norm(grads))
            frozen = ctx["frozen"]
            grads = masker(grads, frozen)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = masker(updates, frozen)
            params = optax.apply_updates(params, updates)
            if isinstance(aux, dict) and "_mutable_state" in aux:
                aux = dict(aux)
                params = {**params, **aux.pop("_mutable_state")}
            return (params, opt_state), (loss, aux)

        (params, opt_state), (losses, aux) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps)
        )
        if grad_accum > 1:
            # flatten the (updates, K, ...) micro axis so epoch metrics see
            # one (steps, ...) stream; grad_norm is per-update and stays
            losses = losses.reshape(-1)
            gn = aux.pop("grad_norm", None) if isinstance(aux, dict) else None
            aux = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), aux)
            if gn is not None:
                aux["grad_norm"] = gn
        return params, opt_state, losses, aux

    return jax.jit(epoch, donate_argnums=(0, 1))


def make_eval_epoch_fn(task, batch_size: int, mesh: Optional[Mesh] = None,
                       sharded_pool: bool = False) -> Callable:
    """Returns jitted ``epoch(params, arrays, order, ctx) -> (losses, aux)``."""
    constrain = _batch_constrainer(mesh)
    gather = (make_sharded_gather(mesh) if sharded_pool and mesh is not None
              else None)

    def epoch(params, arrays, order, ctx):
        if hasattr(task, "bind_trace_flavors"):
            task.bind_trace_flavors()
        n_steps = order.shape[0] // batch_size

        def body(_, i):
            idx = jax.lax.dynamic_slice_in_dim(order, i * batch_size, batch_size)
            if gather is not None:
                batch = gather(arrays, idx)
            else:
                batch = constrain(jax.tree.map(lambda a: jnp.take(a, idx, axis=0), arrays))
            loss, aux = task.step(params, batch, ctx, {}, train=False)
            return None, (loss, aux)

        _, (losses, aux) = jax.lax.scan(body, None, jnp.arange(n_steps))
        return losses, aux

    return jax.jit(epoch)
