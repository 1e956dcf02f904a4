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
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_train_epoch_fn", "make_eval_epoch_fn"]


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
                        mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted ``epoch(params, opt_state, arrays, order, ctx, rngs,
    start_step) -> (params, opt_state, losses, aux)``.

    ``arrays``: the full split as device-resident arrays; ``order``: flat
    index array of length ``n_steps * batch_size`` (shuffled or not);
    ``aux`` is the per-step task aux pytree stacked along a leading steps
    axis.
    """

    constrain = _batch_constrainer(mesh)

    def epoch(params, opt_state, arrays, order, ctx, rngs, start_step):
        n_steps = order.shape[0] // batch_size

        def body(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(order, i * batch_size, batch_size)
            batch = constrain(jax.tree.map(lambda a: jnp.take(a, idx, axis=0), arrays))
            step = start_step + i
            step_rngs = {name: jax.random.fold_in(key, step) for name, key in rngs.items()}

            def loss_fn(p):
                return task.step(p, batch, ctx, step_rngs, train=True)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            frozen = ctx["frozen"]

            def mask(g, m):
                return g * (1.0 - frozen * (1.0 - m))

            grads = jax.tree.map(mask, grads, frozen_mask)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree.map(mask, updates, frozen_mask)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux)

        (params, opt_state), (losses, aux) = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps)
        )
        return params, opt_state, losses, aux

    return jax.jit(epoch, donate_argnums=(0, 1))


def make_eval_epoch_fn(task, batch_size: int, mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted ``epoch(params, arrays, order, ctx) -> (losses, aux)``."""
    constrain = _batch_constrainer(mesh)

    def epoch(params, arrays, order, ctx):
        n_steps = order.shape[0] // batch_size

        def body(_, i):
            idx = jax.lax.dynamic_slice_in_dim(order, i * batch_size, batch_size)
            batch = constrain(jax.tree.map(lambda a: jnp.take(a, idx, axis=0), arrays))
            loss, aux = task.step(params, batch, ctx, {}, train=False)
            return None, (loss, aux)

        _, (losses, aux) = jax.lax.scan(body, None, jnp.arange(n_steps))
        return losses, aux

    return jax.jit(epoch)
