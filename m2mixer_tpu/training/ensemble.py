"""Vmapped ensemble training: N seed-members in ONE compiled program.

The reference's significance protocol trains the same config N times
sequentially and collects ``test_acc`` (`/root/reference/run_for_significance.py`).
On TPU at M2-Mixer scale the train step is latency-bound, not FLOPs-bound
(~240 MFLOP/sample ≈ 1.2 us of MXU time vs a ~0.3 ms step), so N independent
models can train *simultaneously* as one program: every parameter/optimizer
leaf carries a leading member axis and the whole epoch runs as a
``lax.scan`` whose body is ``jax.vmap`` over members — N-run significance in
roughly the wall time of one run.

Protocol fidelity per member (same host logic as the sequential Trainer):

- per-member EarlyStopping(val_loss, patience 30) — a stopped member's
  parameters and optimizer state FREEZE (updates masked by a traced active
  vector) while the lockstep program keeps running until all members stop;
- per-member ReduceLROnPlateau through the injected learning-rate leaf
  (shape ``(N,)`` after the vmapped optimizer init);
- per-member best-val parameter capture on device (the stand-in for
  "test the best checkpoint"); test metrics are computed per member from
  the best parameters with the task's own metric accumulators;
- per-member RNG streams (init, dropout, muting) derived by folding the
  member index — the ensemble analog of independent runs; ``reseed`` gives
  each member ``PRNGKey(seed + i)`` instead, mirroring ``--reseed``;
- loss-weight annealing follows the task's epoch hooks (deterministic in
  epoch, so the shared host state matches every sequential run's own).

Documented divergences from the sequential runner: members share wall-clock
epochs (early-stopped members finish "early" logically, not temporally);
the ragged train tail (< one batch) is dropped instead of routed through a
per-step path; val loss averages over tail-padded batches (identical tiny
bias for every member/epoch). Config-driven LR schedules
(``train.optimizer.schedule``) are honored exactly as in the sequential
Trainer (epoch-driven, shared by all members). SoftAdapt runs PER MEMBER:
each member's loss-weight vector refits from its own per-branch val-loss
histories on the task's schedule and enters the step as a traced
``(N, n_branches)`` override of ``ctx['loss_weights']``.
``train.grad_accum_steps`` is supported: the accumulation scan runs inside
the member vmap (sequential ``update*K`` with a micro-step rng counter), so
K micro-batches of B/K match a batch-B member bit-for-bit (parity-tested in
``test_significance.py::test_vmap_ensemble_grad_accum_matches_big_batch``).
GradBlend (per-member nested sub-training) and mutable collections are
rejected with an error — use the sequential runner for those configs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .callbacks import EarlyStopping, ReduceLROnPlateau

__all__ = ["EnsembleResult", "fit_ensemble", "run_ensemble_significance"]


class EnsembleResult:
    """Per-member outcomes of one ensemble run."""

    def __init__(self, scores, val_losses, stop_epochs, epochs_run,
                 best_params=None):
        #: list of per-member {metric_name: value} test dicts
        self.scores = scores
        #: (N,) best val loss per member
        self.val_losses = val_losses
        #: (N,) epoch at which each member's best val was reached
        self.stop_epochs = stop_epochs
        #: total lockstep epochs executed
        self.epochs_run = epochs_run
        #: best-val parameters, member axis leading (slice member m with
        #: ``jax.tree.map(lambda p: p[m], best_params)`` to deploy it)
        self.best_params = best_params

    def member_params(self, m: int):
        """Unstacked parameter pytree of member ``m`` (e.g. the argmax-score
        member, ready for serving export or checkpointing)."""
        import jax

        return jax.tree.map(lambda p: p[m], self.best_params)

    def metric(self, name: str) -> np.ndarray:
        return np.asarray([s.get(name, np.nan) for s in self.scores])


def _member_keys(seed: int, n: int, reseed: bool, identical: bool = False):
    if identical:
        # every member consumes the SAME stream (init, dropout, muting):
        # the sweep semantics — sequential trials all run with the one
        # cfg.train.seed, so differences are purely the swept value
        return jnp.stack([jax.random.PRNGKey(seed)] * n)
    if reseed:
        return jnp.stack([jax.random.PRNGKey(seed + i) for i in range(n)])
    base = jax.random.PRNGKey(seed)
    return jnp.stack([jax.random.fold_in(base, i) for i in range(n)])


def _pad_order(n: int, bs: int) -> np.ndarray:
    """Natural order padded to a batch multiple by repeating the last index;
    flattened outputs [:n] are then exactly the split in dataset order."""
    order = np.arange(n)
    pad = (-n) % bs
    if pad:
        order = np.concatenate([order, np.full((pad,), n - 1)])
    return order


def _make_train_epoch(task, optimizer, frozen_mask, bs: int,
                      per_member_weights: bool = False,
                      member_sam: bool = False,
                      grad_accum: int = 1):
    """``per_member_weights``: each member trains with ITS OWN traced
    loss-weight vector (``member_weights`` (N, n_branches) overrides
    ``ctx['loss_weights']`` inside the vmap) — the per-member SoftAdapt
    path; the host refits each member's weights from its own val-loss
    histories between epochs.

    ``member_sam``: each member perturbs with ITS OWN traced ``sam_rho``
    (``member_rhos`` (N,)) — the sweep axis; the SAM branch is then always
    traced (exact for rho=0, at the two-backward cost for every member).

    ``grad_accum`` K > 1: the sequential trainer's accumulation scan
    (`compiled.py::make_train_epoch_fn`) runs INSIDE the member vmap —
    each member consumes K consecutive micro-batches, averages their
    gradients, and applies one optimizer update; rng folds use the same
    ``update*K + micro`` counter as the sequential path, so a 1-member
    ensemble reproduces the sequential update schedule exactly."""
    from .compiled import (make_grad_masker, pcgrad_value_and_grad,
                           sam_value_and_grad)

    masker = make_grad_masker(frozen_mask)
    sam_rho = float(task.optimizer_cfg.get("sam_rho", 0.0) or 0.0)
    pcgrad = bool(task.optimizer_cfg.get("pcgrad", False))
    if member_sam and pcgrad:
        raise ValueError("per-member sam_rho cannot be combined with "
                         "train.optimizer.pcgrad (same exclusion as the "
                         "sequential trainer)")

    def epoch(params, opt_state, arrays, orders, ctx, member_keys, active,
              member_weights, member_rhos, start_step):
        task.bind_trace_flavors()
        n_steps = orders.shape[1] // (bs * grad_accum)

        def body(carry, i):
            params, opt_state = carry

            def member(p, o, key, order_m, act, w_m, rho_m):
                def micro_grads(q, j):
                    idx = jax.lax.dynamic_slice_in_dim(
                        order_m, (i * grad_accum + j) * bs, bs)
                    batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0),
                                         arrays)
                    micro_step = (start_step + i) * grad_accum + j
                    step_rngs = {
                        name: jax.random.fold_in(
                            jax.random.fold_in(key, h), micro_step)
                        for h, name in enumerate(task.RNG_COLLECTIONS)
                    }
                    ctx_m = (dict(ctx, loss_weights=w_m)
                             if per_member_weights else ctx)
                    if pcgrad:
                        return pcgrad_value_and_grad(
                            lambda z: task.step_components(
                                z, batch, ctx_m, step_rngs, train=True),
                            q, masker, ctx["frozen"])
                    return sam_value_and_grad(
                        lambda z: task.step(z, batch, ctx_m, step_rngs,
                                            train=True),
                        q, rho_m if member_sam else sam_rho,
                        masker, ctx["frozen"])

                if grad_accum == 1:
                    (loss, aux), grads = micro_grads(p, 0)
                else:
                    def micro(acc, j):
                        (l, _), g = micro_grads(p, j)
                        return jax.tree.map(jnp.add, acc, g), l

                    zero = jax.tree.map(
                        lambda q: jnp.zeros(q.shape, jnp.result_type(q)), p)
                    grads, micro_losses = jax.lax.scan(
                        micro, zero, jnp.arange(grad_accum))
                    grads = jax.tree.map(lambda g: g / grad_accum, grads)
                    loss = micro_losses.mean()
                frozen = ctx["frozen"]
                grads = masker(grads, frozen)
                updates, o_new = optimizer.update(grads, o, p)
                updates = jax.tree.map(lambda u: u * act,
                                       masker(updates, frozen))
                # early-stopped member: optimizer state freezes with the params
                o_new = jax.tree.map(
                    lambda new, old: jnp.where(act > 0, new, old), o_new, o)
                return optax.apply_updates(p, updates), o_new, loss

            params, opt_state, losses = jax.vmap(member)(
                params, opt_state, member_keys, orders, active,
                member_weights, member_rhos)
            return (params, opt_state), losses

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, losses  # losses: (steps, N)

    return jax.jit(epoch, donate_argnums=(0, 1))


def _make_eval_epoch(task, bs: int, per_member_weights: bool = False):
    def epoch(params, arrays, order, ctx, member_weights):
        task.bind_trace_flavors()
        n_steps = order.shape[0] // bs

        def body(_, i):
            idx = jax.lax.dynamic_slice_in_dim(order, i * bs, bs)
            batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), arrays)

            def member(p, w_m):
                ctx_m = dict(ctx, loss_weights=w_m) if per_member_weights else ctx
                return task.step(p, batch, ctx_m, {}, train=False)

            loss, aux = jax.vmap(member)(params, member_weights)
            return None, (loss, aux)

        _, (losses, aux) = jax.lax.scan(body, None, jnp.arange(n_steps))
        return losses, aux  # losses: (steps, N); aux leaves: (steps, N, bs, ...)

    return jax.jit(epoch)


@jax.jit
def _select_best(best_params, params, best_val, val):
    improved = val <= best_val  # (N,)

    def pick(b, p):
        ix = (slice(None),) + (None,) * (p.ndim - 1)
        return jnp.where(improved[ix], p, b)

    # fmin (not minimum): a diverged member whose val loss goes NaN must not
    # poison its best_val permanently — NaN epochs are ignored, and the
    # member's best stays the last finite value it achieved
    return (jax.tree.map(pick, best_params, params),
            jnp.fmin(best_val, val))


def fit_ensemble(task, datamodule, train_cfg, n_members: int,
                 reseed: bool = False, metric_prefix: str = "test",
                 early_stopping_patience: int = 30,
                 member_lrs=None, mesh=None, identical_seeds: bool = False,
                 member_hparams=None,
                 verbose: bool = True) -> EnsembleResult:
    """Train ``n_members`` independent seeds of ``task`` simultaneously and
    return per-member test metrics (see module docstring for semantics).

    ``member_lrs``: optional per-member initial learning rates — the member
    axis then doubles as a SWEEP axis: N learning rates explored in one
    compiled program (the LR is an injected per-member optimizer-state leaf,
    so no retrace; each member's plateau scheduler decays from its own
    starting point).

    ``member_hparams``: ``{name: (N,) values}`` generalizes the sweep axis
    beyond the LR — every name rides the member axis in ONE compiled
    program. Supported: ``learning_rate`` (same mechanism as
    ``member_lrs``), ``weight_decay`` / ``ema_decay`` (injected per-member
    optimizer-state leaves, `trainer._make_optimizer(inject=...)`), and
    ``sam_rho`` (a traced per-member scalar in the SAM ascent — every
    member then pays SAM's second backward, exact for rho=0). Anything
    else raises with the reason (genuinely retrace-forcing parameters
    belong to the sequential executor).

    ``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis shards the MEMBER
    axis across devices — members are embarrassingly parallel (zero
    cross-member communication), so seed studies scale near-linearly over
    chips: each device trains ``n / mesh.shape['data']`` members while the
    data pools stay replicated. Requires ``n % mesh.shape['data'] == 0``.

    ``identical_seeds``: every member shares ONE RNG stream (same init, same
    dropout draws) — the hyperparameter-sweep protocol, where sequential
    trials all run with the single ``cfg.train.seed`` and differ only in the
    swept value. Mutually exclusive with ``reseed``."""
    if identical_seeds and reseed:
        raise ValueError("identical_seeds and reseed are mutually exclusive")
    if getattr(task, "use_gradblend", False):
        raise ValueError("ensemble training does not support GradBlend "
                         "(per-member nested sub-training); use the "
                         "sequential significance runner")
    if getattr(task, "mutable_collections", ()):
        raise ValueError("ensemble training does not support mutable "
                         "collections (BN running stats)")
    if int(train_cfg.get("grad_accum_steps", 1)) < 1:
        raise ValueError("train.grad_accum_steps must be >= 1")
    if train_cfg.get("distill", None) and getattr(task, "distiller", None) is None:
        # the teacher enters the step as captured constants, which the
        # member vmap broadcasts — ONE teacher serves every member
        from .distill import attach_distiller

        attach_distiller(task, train_cfg, mesh)
    from ..parallel.pipeline import pipeline_mesh, set_pipeline_mesh

    _restore_pipe = False
    _prev_pipe = None
    if pipeline_mesh() is not None:
        # the member vmap composes with DP/TP/EP sharding but not with the
        # manual shard_map pipeline; PipelinedFusionMixer's sequential
        # fallback computes identical math, so clear the context for the
        # duration of this fit (restored on return)
        _prev_pipe = set_pipeline_mesh(None)
        _restore_pipe = True
        if verbose:
            print("[ensemble] pipeline mesh cleared: pipelined blocks run "
                  "their (math-identical) sequential path under the member vmap")
    try:
        return _fit_ensemble_inner(
            task, datamodule, train_cfg, n_members, reseed, metric_prefix,
            early_stopping_patience, member_lrs, mesh, identical_seeds,
            member_hparams, verbose)
    finally:
        if _restore_pipe:
            set_pipeline_mesh(_prev_pipe)


#: member_hparams axes that ride as injected optimizer-state leaves
_INJECTED_HPARAMS = ("learning_rate", "weight_decay", "ema_decay")
#: all supported member_hparams axes (sam_rho is a traced step scalar)
SWEEPABLE_HPARAMS = _INJECTED_HPARAMS + ("sam_rho",)


def _fit_ensemble_inner(task, datamodule, train_cfg, n_members,
                        reseed, metric_prefix, early_stopping_patience,
                        member_lrs, mesh, identical_seeds,
                        member_hparams, verbose) -> EnsembleResult:
    datamodule.setup("fit")
    datamodule.setup("test")
    for stage in ("train", "val", "test"):
        if not datamodule.device_resident_ok(stage):
            raise ValueError(f"ensemble training needs a device-resident "
                             f"'{stage}' split (ArrayDataModule-style)")

    bs = datamodule.batch_size
    n = int(n_members)
    seed = int(train_cfg.get("seed", 0))
    impl = train_cfg.get("prng_impl", None)
    if impl:
        jax.config.update("jax_default_prng_impl", str(impl))
    max_epochs = int(train_cfg.get("epochs", 1))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        dd = mesh.shape["data"]
        if n % dd != 0:
            raise ValueError(
                f"the mesh data axis ({dd}) must divide n_members ({n}) for "
                f"member-sharded ensembles — pick a member count that is a "
                f"multiple of {dd}")
        _member_sharding = lambda x: NamedSharding(
            mesh, P("data", *([None] * (np.ndim(x) - 1))))
        _rep = NamedSharding(mesh, P())
        shard_members = lambda tree: jax.tree.map(
            lambda x: jax.device_put(x, _member_sharding(x)), tree)
        replicate = lambda tree: jax.tree.map(
            lambda x: jax.device_put(x, _rep), tree)
    else:
        shard_members = replicate = lambda tree: tree

    sample = next(iter(datamodule.train_batches()))
    task.bind_trace_flavors()
    keys = shard_members(_member_keys(seed, n, reseed, identical_seeds))

    def init_one(rng):
        rngs = {"params": rng}
        for name in task.RNG_COLLECTIONS:
            rng, sub = jax.random.split(rng)
            rngs[name] = sub
        return task.network.init(
            rngs, **task.network_inputs(sample), deterministic=True)

    params = shard_members(jax.jit(jax.vmap(init_one))(keys))

    from .trainer import _make_optimizer

    # normalize the sweep axes: member_lrs is sugar for the learning_rate
    # axis of member_hparams; every axis must be an (n,)-vector of floats
    hparams = {k: np.asarray(v, np.float32)
               for k, v in dict(member_hparams or {}).items()}
    if member_lrs is not None:
        if "learning_rate" in hparams:
            raise ValueError("pass the learning rate either as member_lrs "
                             "or as member_hparams['learning_rate'], not both")
        hparams["learning_rate"] = np.asarray(member_lrs, np.float32)
    bad = sorted(set(hparams) - set(SWEEPABLE_HPARAMS))
    if bad:
        raise ValueError(
            f"member_hparams axes {bad} are not sweepable in one compiled "
            f"program (supported: {list(SWEEPABLE_HPARAMS)}); model/data "
            "parameters force a retrace — use the sequential executor")
    for name, vals in hparams.items():
        if vals.shape != (n,):
            raise ValueError(f"member_hparams[{name!r}] must have shape "
                             f"({n},), got {vals.shape}")
    member_lrs = hparams.get("learning_rate")
    member_sam = "sam_rho" in hparams
    inject = tuple(k for k in hparams if k in _INJECTED_HPARAMS
                   and k != "learning_rate")
    from .trainer import ema_params_from_opt_state

    ema_eval = bool(train_cfg.get("ema_eval", False))
    has_ema = (float(task.optimizer_cfg.get("ema_decay", 0.0) or 0.0) > 0
               or "ema_decay" in hparams)
    if ema_eval and not has_ema:
        raise ValueError("train.ema_eval=true requires "
                         "train.optimizer.ema_decay > 0 (or an ema_decay "
                         "member axis)")
    if "ema_decay" in hparams and not ema_eval:
        # without ema_eval the averaged tree is never scored, so every
        # member would post IDENTICAL metrics — reject the meaningless sweep
        raise ValueError("an ema_decay member axis needs train.ema_eval: "
                         "true — otherwise the EMA never affects val/test "
                         "scores and all trials tie")

    optimizer, lr0 = _make_optimizer(task.optimizer_cfg, inject=inject)
    opt_state = shard_members(jax.jit(jax.vmap(optimizer.init))(params))
    for name in hparams:
        if name in _INJECTED_HPARAMS:
            opt_state.hyperparams[name] = shard_members(
                jnp.asarray(hparams[name]))
    # member-axis-free mask (leaf scalars broadcast over the stacked leaves)
    frozen_mask = task.frozen_mask(
        jax.tree.map(lambda p: p[0], params))

    # per-member SoftAdapt: each member refits ITS loss-weight vector from
    # ITS OWN per-branch val-loss histories (the sequential protocol,
    # `models/base.py::on_validation_epoch_end`, independently per member);
    # the weights enter the step as a traced (N, n_branches) override of
    # ctx['loss_weights'] inside the member vmap.
    use_softadapt = bool(getattr(task, "use_softadapt", False))
    if use_softadapt:
        n_branches = len(task.loss_names)
        member_weights = np.full((n, n_branches), 1.0 / n_branches, np.float32)
        sa_histories = [[[] for _ in range(n_branches)] for _ in range(n)]
    else:
        member_weights = np.zeros((n, 1), np.float32)  # unused traced arg

    member_rhos = shard_members(jnp.asarray(
        hparams.get("sam_rho", np.zeros((n,), np.float32))))
    grad_accum = int(train_cfg.get("grad_accum_steps", 1))
    train_epoch = _make_train_epoch(task, optimizer, frozen_mask, bs,
                                    per_member_weights=use_softadapt,
                                    member_sam=member_sam,
                                    grad_accum=grad_accum)
    eval_epoch = _make_eval_epoch(task, bs, per_member_weights=use_softadapt)

    arrays = {s: replicate(datamodule.splits[s])
              for s in ("train", "val", "test")}
    val_order = replicate(
        jnp.asarray(_pad_order(datamodule.split_size("val"), bs), jnp.int32))

    stoppers = [EarlyStopping(monitor="val_loss",
                              patience=early_stopping_patience, mode="min")
                for _ in range(n)]
    # LR scheduling mirrors the sequential Trainer (trainer.py:425-435):
    # config-driven schedule when train.optimizer.schedule is set (shared
    # across members — it's epoch-driven, exactly like each sequential run),
    # otherwise per-member ReduceLROnPlateau on that member's val loss.
    sched_cfg = task.optimizer_cfg.get("schedule", None)
    if sched_cfg and member_lrs is not None:
        raise ValueError("member_lrs cannot be combined with "
                         "train.optimizer.schedule (the schedule would "
                         "overwrite the per-member rates every epoch)")
    if sched_cfg:
        from ..config import DictConfig
        from .callbacks import LRSchedule

        schedule = LRSchedule(lr0, DictConfig(sched_cfg), max_epochs)
        # warmup applies from the FIRST epoch (trainer.py:431-433)
        opt_state.hyperparams["learning_rate"] = shard_members(
            jnp.full((n,), schedule.at_epoch(0), jnp.float32))
        plateaus = None
    else:
        schedule = None
        plateaus = [ReduceLROnPlateau(
                        float(member_lrs[m]) if member_lrs is not None else lr0,
                        patience=int(task.scheduler_patience))
                    for m in range(n)]
    active = np.ones((n,), np.float32)
    best_params = jax.tree.map(jnp.copy, params)
    best_val = shard_members(jnp.full((n,), np.inf, jnp.float32))
    best_epoch = np.zeros((n,), np.int32)
    start_step = 0
    epochs_run = 0

    for epoch in range(max_epochs):
        epochs_run = epoch + 1
        task.on_train_epoch_start(None, epoch)
        ctx = replicate({k: jnp.asarray(v)
                         for k, v in task.make_ctx(epoch, "train").items()})
        shuffle = datamodule.train_shuffle_enabled()
        chunk = bs * grad_accum
        n_full = (datamodule.split_size("train") // chunk) * chunk
        if n_full == 0:
            raise ValueError(
                f"train split ({datamodule.split_size('train')}) holds no "
                f"full accumulation chunk (batch {bs} x "
                f"grad_accum_steps {grad_accum})")
        if identical_seeds:
            # identical_seeds promises "trials differ only in the injected
            # hyperparameters": draw ONE epoch order (one _rng advance per
            # epoch, exactly like each sequential same-seed run) and share
            # it across the member axis. Per-member draws would advance the
            # shared datamodule RNG n times per epoch, giving every member
            # a different shuffle order and adding data-order noise to
            # cross-trial comparisons.
            order = np.asarray(datamodule.epoch_order("train", shuffle))
            orders = np.tile(order[None, :n_full], (n, 1))
        else:
            orders = np.stack([
                np.asarray(datamodule.epoch_order("train", shuffle))[:n_full]
                for _ in range(n)
            ])
        w_dev = shard_members(jnp.asarray(member_weights))
        params, opt_state, tr_losses = train_epoch(
            params, opt_state, arrays["train"],
            shard_members(jnp.asarray(orders, jnp.int32)),
            ctx, keys, shard_members(jnp.asarray(active)), w_dev,
            member_rhos, start_step)
        # start_step counts OPTIMIZER UPDATES (sequential-trainer contract:
        # rng folds use update*K + micro)
        start_step += orders.shape[1] // (bs * grad_accum)
        task.on_train_epoch_end(None, epoch, {})

        ctx_val = replicate({k: jnp.asarray(v)
                             for k, v in task.make_ctx(epoch, "val").items()})
        # train.ema_eval: score the Polyak-averaged tree (stacked (N, ...)
        # EMA leaves ride in the vmapped opt_state), mirroring the
        # sequential trainer's _eval_params; best_params then snapshots the
        # EMA model, so ranking/test reflect it exactly as sequentially
        eval_tree = params
        if ema_eval:
            ema = ema_params_from_opt_state(opt_state)
            if ema is not None:
                eval_tree = ema
        val_losses, val_aux = eval_epoch(eval_tree, arrays["val"], val_order,
                                         ctx_val, w_dev)
        val_loss = np.asarray(val_losses.mean(axis=0))  # (N,)
        if use_softadapt:
            # per-member histories + refit, mirroring the task's own
            # on_validation_epoch_end schedule (epoch != 0, every K epochs)
            branch_losses = {name: np.asarray(val_aux["losses"][name])
                             for name in task.loss_names}  # each (S, N)
            for m in range(n):
                for b, name in enumerate(task.loss_names):
                    sa_histories[m][b].append(float(branch_losses[name][:, m].mean()))
            K = task.update_loss_weights_per_epoch
            if epoch != 0 and epoch % K == 0:
                for m in range(n):
                    member_weights[m] = np.asarray(
                        task.softadapt.get_component_weights(
                            *[np.asarray(h, np.float64) for h in sa_histories[m]]
                        ), np.float32)
                sa_histories = [[[] for _ in range(len(task.loss_names))]
                                for _ in range(n)]
        else:
            task.on_validation_epoch_end(None, epoch,
                                         {"val_loss": float(val_loss.mean())})

        prev_best = np.asarray(best_val)
        best_params, best_val = _select_best(best_params, eval_tree, best_val,
                                             jnp.asarray(val_loss))
        best_epoch = np.where(val_loss <= prev_best, epoch, best_epoch)

        if schedule is not None:
            lrs = np.full((n,), schedule.update(float(val_loss.mean())),
                          np.float32)
        else:
            lrs = np.asarray([plateaus[m].update(float(val_loss[m]))
                              for m in range(n)], np.float32)
        opt_state.hyperparams["learning_rate"] = shard_members(jnp.asarray(lrs))
        for m in range(n):
            if active[m] and stoppers[m].update({"val_loss": float(val_loss[m])}):
                active[m] = 0.0
        if verbose:
            live = int(active.sum())
            print(f"[ensemble] epoch {epoch}: val_loss "
                  f"mean={val_loss.mean():.4f} min={val_loss.min():.4f} "
                  f"max={val_loss.max():.4f} active={live}/{n}")
        if not active.any():
            break

    # -- test every member from its best-val parameters ----------------------
    n_test = datamodule.split_size("test")
    test_order = replicate(jnp.asarray(_pad_order(n_test, bs), jnp.int32))
    ctx_test = replicate({k: jnp.asarray(v)
                          for k, v in task.make_ctx(epochs_run, "test").items()})
    test_losses, aux = eval_epoch(best_params, arrays["test"], test_order,
                                  ctx_test,
                                  shard_members(jnp.asarray(member_weights)))
    test_losses = np.asarray(test_losses)

    def per_member(a):
        # (steps, N, bs, ...) -> member-major flat sample stream, unpadded
        a = np.asarray(a)
        a = np.moveaxis(a, 1, 0).reshape(n, -1, *a.shape[3:])
        return a[:, :n_test]

    preds = per_member(aux["preds"])
    labels = per_member(aux["labels"])
    probs = per_member(aux["probs"]) if "probs" in aux else None

    _, _, test_metrics = task.setup_scores()
    scores = []
    for m in range(n):
        out = {f"{metric_prefix}_loss": float(test_losses[:, m].mean())}
        if test_metrics:
            for name, metric in test_metrics.items():
                metric.update(
                    probs[m] if metric.wants_scores and probs is not None else preds[m],
                    labels[m])
                out[f"{metric_prefix}_{name}"] = metric.compute()
                metric.reset()
        scores.append(out)

    result = EnsembleResult(scores, np.asarray(best_val), best_epoch,
                            epochs_run, best_params=best_params)
    #: per-member final loss-weight vectors (SoftAdapt observability)
    result.loss_weights = np.asarray(member_weights) if use_softadapt else None
    return result


def run_ensemble_significance(cfg, runs: int, metric: str = "test_acc",
                              reseed: bool = False, member_lrs=None,
                              verbose: bool = True,
                              export_dir: Optional[str] = None) -> np.ndarray:
    """Config-level entry: build the task/datamodule and run the vmapped
    N-member significance protocol; returns the per-member metric values
    (the ``test_scores`` array of the sequential runner). ``member_lrs``
    turns the member axis into a learning-rate sweep (see fit_ensemble).
    ``export_dir``: additionally package ALL trained members (their best-val
    params) as one on-device-ensembled serving artifact
    (``serving.export_ensemble_serving``)."""
    import os

    from .. import datasets, models

    if cfg.dataset.params.get("num_workers", 0) == -1:
        cfg.dataset.params.num_workers = os.cpu_count()
    task = models.get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = datasets.get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    # train.mesh_data > 1 shards the MEMBER axis across devices (members
    # are independent, so seed studies scale near-linearly over chips)
    mesh = None
    if int(cfg.train.get("mesh_data", 1)) not in (0, 1):
        from ..parallel import MeshConfig, make_mesh

        mesh = make_mesh(MeshConfig(data=int(cfg.train.mesh_data), model=1))
        if mesh.shape["data"] == 1:
            mesh = None
    result = fit_ensemble(task, dm, cfg.train, runs, reseed=reseed,
                          member_lrs=member_lrs, mesh=mesh, verbose=verbose)
    if export_dir:
        from ..serving import export_ensemble_serving

        sample = next(iter(dm.train_batches()))
        # ensemble artifacts embed the datamodule's raw-input preprocessing
        # like single-model exports do (degrade gracefully if assets are
        # unbuilt — the artifact then takes numeric features only)
        preprocess = dm.serving_preprocess() or None
        if preprocess:
            from ..preprocess import packaged_spec

            try:
                packaged_spec(preprocess, export_dir, copy_assets=False)
            except FileNotFoundError as e:
                print(f"[significance] {e}; exporting without raw-input "
                      "preprocessing")
                preprocess = None
        out = export_ensemble_serving(task, result.best_params, sample,
                                      export_dir, preprocess=preprocess)
        if verbose:
            print(f"[significance] exported {runs}-member on-device-ensembled "
                  f"serving artifact to {out}")
    return result.metric(metric)
