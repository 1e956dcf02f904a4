"""GradNorm adaptive loss-weight balancing (Chen et al., ICML 2018).

The reference's loss-weight machinery is fixed/annealed weights, SoftAdapt,
and GradBlend (`/root/reference/models/avmnist.py:199-234`); GradNorm is the
missing member of that family — it balances branch loss weights so every
branch's gradient magnitude tracks its relative inverse training rate.

The TPU-native shape follows the SoftAdapt/GradBlend precedent: a host-side
per-epoch refit feeding ``ctx['loss_weights']`` (so the jitted train step
never recompiles), not a second optimizer inside the step. Each refit:

1. measures ``G_i = ||grad of the i-th weighted branch loss||`` on one probe
   batch — one shared forward + one backward per branch via ``jax.vjp`` over
   ``MultiLossTask.step_components`` (the same entry point PCGrad uses);
2. computes relative inverse training rates ``r_i = (l_i / l_i(0)) /
   mean_j(l_j / l_j(0))`` against the unweighted branch losses captured at
   the first measurement;
3. solves the weights that put every branch AT its target norm
   ``mean(G) * r_i**alpha`` — since ``G_i`` is linear in ``w_i`` the solve is
   the closed form ``w_i' = w_i * target_i / G_i`` (the paper takes a
   gradient step on ``sum_i |G_i - target_i|``; per-epoch refits can afford
   the exact solve);
4. renormalizes to ``sum w = n`` (the paper's normalization), keeping the
   effective learning rate comparable with the 'fixed_scaled'/'sum'
   weighting conventions.

``alpha`` is the paper's asymmetry hyperparameter: 0 balances gradient norms
outright; larger values push harder on branches that train slower.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["measure_gradnorm_weights"]


def _make_measure(task, trainable_mask):
    """Jitted ``(params, batch, ctx, rngs) -> (norms, losses)``: per-branch
    gradient norms of the weighted components and the UNWEIGHTED branch
    losses, one compile per task (cached on the task object). The static
    trainable mask is applied to each component gradient before its norm so
    coordinates the optimizer never updates (LoRA base trees, BN running
    stats) don't pollute the balance."""
    n = len(task.loss_names)

    @jax.jit
    def measure(params, batch, ctx, rngs):
        task.bind_trace_flavors()
        comps, vjp_fn, (_, aux) = jax.vjp(
            lambda p: task.step_components(p, batch, ctx, rngs, train=True),
            params, has_aux=True)
        # only the branch components are balanced; a KD extra entry (comps
        # may be longer under train.distill) keeps its own blend weight
        eye = jnp.eye(comps.shape[0], dtype=comps.dtype)[:n]
        stacked = jax.vmap(lambda e: vjp_fn(e)[0])(eye)
        if trainable_mask is not None:
            stacked = jax.tree.map(lambda g, m: g * m, stacked, trainable_mask)
        norms = jax.vmap(optax.global_norm)(stacked)
        losses = jnp.stack([aux["losses"][k] for k in task.loss_names])
        return norms, losses

    return measure


def measure_gradnorm_weights(task, trainer, epoch: int) -> Optional[np.ndarray]:
    """One GradNorm refit (steps 1-4 above). Returns the new weight vector in
    ``task.loss_names`` order, or None when measurement is unavailable (no
    device-resident train split yet, or the task is past its modality-freeze
    epoch — after freezing only the fusion loss backprops, so there is no
    balance left to adapt, `/root/reference/models/avmnist.py:292-293`)."""
    datamodule = trainer.datamodule
    if datamodule is None or trainer.params is None:
        return None
    ctx = task.make_ctx(epoch, "train")
    if float(ctx["frozen"]) > 0:
        return None
    split = getattr(datamodule, "splits", None)
    if split and "train" in split:
        arrays = split["train"]
        bs = min(datamodule.batch_size,
                 len(next(iter(arrays.values()))))
        batch = {k: jnp.asarray(v[:bs]) for k, v in arrays.items()}
    else:
        # loader-fed datamodule: probe on its first train batch. The batch
        # shape is the loader's fixed batch size, so the jit caches one entry
        batch = jax.tree.map(jnp.asarray,
                             next(iter(datamodule.train_batches())))
    # fixed per-epoch measurement randomness: the probe step sees the same
    # dropout/mixup regime training does, reproducibly
    base = jax.random.PRNGKey(trainer.seed + 23)
    rngs = {name: jax.random.fold_in(jax.random.fold_in(base, h), epoch)
            for h, name in enumerate(task.RNG_COLLECTIONS)}

    measure = getattr(task, "_gn_measure", None)
    if measure is None:
        measure = _make_measure(task, task.trainable_mask(trainer.params))
        task._gn_measure = measure
    norms, losses = measure(trainer.params, batch, ctx, rngs)
    g = np.asarray(norms, np.float64)
    l = np.asarray(losses, np.float64)
    if task.gn_initial_losses is None:
        task.gn_initial_losses = np.maximum(l, 1e-12)
    r = l / task.gn_initial_losses
    r = r / max(r.mean(), 1e-12)
    target = g.mean() * r ** task.gn_alpha
    w = np.asarray(ctx["loss_weights"], np.float64)
    w_new = w * target / (g + 1e-12)
    s = w_new.sum()
    if not np.isfinite(s) or s <= 0:
        return None
    w_new = w_new * (len(w_new) / s)
    print(f"[gradnorm] epoch {epoch} weights (order {task.loss_names}): "
          f"{np.round(w_new, 4)}")
    return w_new.astype(np.float32)
