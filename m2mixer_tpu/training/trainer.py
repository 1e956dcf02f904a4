"""The training engine: one jitted SPMD train step + a host epoch loop.

Replaces ``pl.Trainer`` + ``AbstractTrainTestModule``
(`/root/reference/run.py:59-83`,
`/root/reference/modules/train_test_module.py`) with the TPU-native shape:

- the whole optimization step — forward, multi-head losses, backward, Adam
  update, frozen-parameter masking — is ONE ``jax.jit``-compiled function
  over a device mesh; batches are sharded over the ``data`` axis and XLA
  inserts the gradient all-reduces;
- per-epoch schedule state (loss weights, freeze/mute flags, epoch index)
  enters as traced scalars in ``ctx`` so schedules never trigger recompiles;
- losses/preds returned by the step stay ON DEVICE during the epoch (the
  dispatch queue keeps the chip busy); they are fetched once per epoch for
  metric computation and logging;
- everything Lightning did with callbacks is explicit host logic:
  EarlyStopping(val_loss, patience 30), ReduceLROnPlateau on the injected
  learning rate, top-k + last Orbax checkpoints, and the best-checkpoint
  auto-test.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import DictConfig, todict
from ..parallel import MeshConfig, batch_sharding, make_mesh, replicated, shard_params
from .callbacks import CheckpointManager, EarlyStopping, ReduceLROnPlateau
from .loggers import ExperimentLogger

__all__ = ["Trainer", "seed_everything"]


def seed_everything(seed: int) -> jax.Array:
    """``pl.seed_everything`` analog: numpy/python RNGs + a base JAX key."""
    import random

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class ParamsEmaState(NamedTuple):
    """EMA of the PARAMS (not of updates, which is what ``optax.ema``
    tracks) riding inside ``opt_state`` — so it flows through the epoch
    scan, checkpoints, member-vmap, and mesh sharding with no extra trainer
    state."""

    ema: Any


def _params_ema(decay: float) -> "optax.GradientTransformation":
    """Appended LAST in the chain (after the LR scale), so ``updates`` are
    final and ``params + updates`` is the post-step parameter tree."""

    def init(params):
        # jnp.copy, NOT asarray: aliasing the live param buffers would make
        # donated train steps see the same buffer twice
        return ParamsEmaState(ema=jax.tree.map(jnp.copy, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("ema_decay requires update(..., params=params)")
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: (decay * e + (1.0 - decay) * p).astype(e.dtype),
            state.ema, new_p)
        return updates, ParamsEmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def ema_params_from_opt_state(opt_state):
    """Pull the EMA params tree out of an optimizer state — either a live
    ``ParamsEmaState`` or an orbax-restored raw tree (where the NamedTuple
    comes back as a dict with an ``'ema'`` key). Returns None if absent."""
    found = []

    def walk(x):
        if isinstance(x, ParamsEmaState):
            found.append(x.ema)
        elif isinstance(x, dict):
            if set(x) == {"ema"}:
                found.append(x["ema"])
            else:
                for v in x.values():
                    walk(v)
        elif isinstance(x, (list, tuple)) or hasattr(x, "_fields"):
            for v in x:
                walk(v)

    walk(opt_state)
    return found[0] if found else None


_OPTIMIZER_TYPES = ("adam", "adamw", "sgd", "lion", "lamb", "adafactor")


def _parse_param_groups(optimizer_cfg):
    """``train.optimizer.param_groups`` (beyond reference — the torch
    param-group idiom): a list of ``{match: [path substrings], lr_scale:
    float, weight_decay: float?}``. First matching group wins per leaf
    (matched against the '/'-joined parameter path); unmatched leaves use
    the global settings. Returns ``[(match_tuple, lr_scale, wd|None), ...]``
    or None."""
    raw = optimizer_cfg.get("param_groups", None)
    if not raw:
        return None
    groups = []
    for i, g in enumerate(raw):
        if not hasattr(g, "get"):
            raise ValueError(
                f"param_groups[{i}] must be a mapping with a 'match' key "
                f"(got {g!r})")
        match = g.get("match", None)
        if isinstance(match, str):
            match = [match]
        if not match:
            raise ValueError(
                f"param_groups[{i}] needs 'match': a path substring or "
                "list of substrings (e.g. ['encoders_0', 'heads_'])")
        lr_scale = float(g.get("lr_scale", 1.0))
        if lr_scale < 0:
            raise ValueError(
                f"param_groups[{i}].lr_scale must be >= 0 (got {lr_scale})")
        wd = g.get("weight_decay", None)
        groups.append((tuple(str(m) for m in match), lr_scale,
                       None if wd is None else float(wd)))
    return groups


def _group_index(path, groups) -> int:
    joined = "/".join(str(getattr(p, "key", p)) for p in path)
    for i, (match, _, _) in enumerate(groups):
        if any(m in joined for m in match):
            return i
    return -1


def _grouped_lr_scale(groups):
    """Stateless per-leaf LR multiplier (applied to updates right before the
    global injected learning rate, so schedules/plateau compose: effective
    lr = schedule(lr) * group.lr_scale)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def f(path, u):
            i = _group_index(path, groups)
            s = groups[i][1] if i >= 0 else 1.0
            return u if s == 1.0 else u * jnp.asarray(s, u.dtype)

        return jax.tree_util.tree_map_with_path(f, updates), state

    return optax.GradientTransformation(init, update)


def _grouped_decay(groups, default_wd: float):
    """Per-leaf weight decay: a group's ``weight_decay`` overrides the
    global value for its leaves (same chain position as
    ``optax.add_decayed_weights``, so coupled/decoupled semantics follow
    the optimizer type)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("param_groups weight decay requires "
                             "update(..., params=params)")

        def f(path, u, p):
            i = _group_index(path, groups)
            wd = groups[i][2] if i >= 0 and groups[i][2] is not None else default_wd
            return u if not wd else u + jnp.asarray(wd, u.dtype) * p

        return jax.tree_util.tree_map_with_path(f, updates, params), state

    return optax.GradientTransformation(init, update)


def check_param_groups(optimizer_cfg, params) -> None:
    """Fail loudly on a param_groups entry that matches nothing — a typo'd
    'match' silently training at the global LR is the torch footgun this
    feature replaces."""
    groups = _parse_param_groups(optimizer_cfg)
    if not groups:
        return
    counts = [0] * len(groups)
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        i = _group_index(path, groups)
        if i >= 0:
            counts[i] += 1
    for i, c in enumerate(counts):
        if c == 0:
            raise ValueError(
                f"train.optimizer.param_groups[{i}] "
                f"(match={list(groups[i][0])}) matched no parameter leaves "
                "— check the substrings against the parameter tree "
                "(python -m m2mixer_tpu.summary shows the module paths)")
    print("[trainer] param_groups: "
          + ", ".join(f"group {i} (match={list(g[0])}): {c} leaves, "
                      f"lr_scale={g[1]}"
                      + (f", wd={g[2]}" if g[2] is not None else "")
                      for i, (g, c) in enumerate(zip(groups, counts))))


def _make_optimizer(optimizer_cfg: DictConfig, trainable_mask=None,
                    inject: tuple = ()):
    """Config-driven optimizer (``train.optimizer.type``), with the learning
    rate injected so the plateau scheduler / LR schedules can change it
    between steps without recompiling.

    The default (``adam``) keeps torch.optim.Adam semantics — coupled L2
    via grad += wd*p BEFORE the moment updates — which is what the
    reference's ``configure_optimizers`` builds
    (`/root/reference/modules/train_test_module.py:166-175`). Beyond the
    reference, ``type`` selects:

    - ``adamw``  — decoupled weight decay (torch.optim.AdamW semantics:
      the decay term joins the update AFTER the Adam moments).
    - ``sgd``    — momentum SGD (``optimizer.momentum``, default 0.9;
      ``optimizer.nesterov``), coupled L2 like torch.optim.SGD.
    - ``lion``   — sign-momentum (Chen et al. 2023), decoupled decay;
      default betas (0.9, 0.99) per the paper.
    - ``lamb``   — Adam + decoupled decay + per-layer trust-ratio scaling
      (You et al. 2020) for very-large-batch training.
    - ``adafactor`` — factored second moments (Shazeer & Stern 2018): the
      memory-light choice for the large-geometry configs, O(r+c) optimizer
      state per matrix instead of O(r*c).

    ``optimizer.grad_clip_norm`` / ``grad_clip_value`` clip raw gradients
    (global L2 norm / elementwise) before everything else in the chain —
    torch ``clip_grad_norm_``/``clip_grad_value_`` semantics, available to
    every ``type``.

    ``trainable_mask`` (``task.trainable_mask``): non-parameter collections
    (BN running stats) are excluded via ``optax.masked``, so the optimizer
    allocates no moments for them and their leaves skip the optimizer pass
    entirely (they refresh through the mutable-state path instead).

    ``optimizer.moment_dtype: bf16`` stores the momentum-like state in
    bfloat16 (Adam/AdamW/LAMB mu, SGD trace, Lion mu). Measured on TPU v5e
    at the B-geometry headline (batch 32, epoch-compiled): the optimizer
    pass is HBM-traffic bound — bf16 mu cuts step time 0.408 -> 0.380 ms
    (+7.4% throughput) with no measurable convergence change (the variance
    moment stays f32; mu only steers the direction and bf16's 8 mantissa
    bits round it far below gradient noise). Not applicable to adafactor
    (its factored stats are already tiny).
    """
    opt_type = str(optimizer_cfg.get("type", "adam") or "adam").lower()
    if opt_type not in _OPTIMIZER_TYPES:
        raise ValueError(
            f"train.optimizer.type={opt_type!r} — expected one of "
            f"{', '.join(_OPTIMIZER_TYPES)}")
    inject = tuple(inject)
    bad_inject = set(inject) - {"weight_decay", "ema_decay"}
    if bad_inject:
        raise ValueError(f"injectable optimizer hyperparams are "
                         f"weight_decay/ema_decay; got {sorted(bad_inject)}")
    lr = float(optimizer_cfg.get("lr", 1e-3))
    default_betas = (0.9, 0.99) if opt_type == "lion" else (0.9, 0.999)
    betas = tuple(optimizer_cfg.get("betas", default_betas))
    eps = float(optimizer_cfg.get("eps", 1e-8))
    wd = float(optimizer_cfg.get("weight_decay", 0.0))
    momentum = float(optimizer_cfg.get("momentum", 0.9))
    nesterov = bool(optimizer_cfg.get("nesterov", False))
    moment_dtype = optimizer_cfg.get("moment_dtype", None)
    _mu_dtypes = {None: None, "f32": None, "float32": None,
                  "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}
    if moment_dtype not in _mu_dtypes:
        raise ValueError(
            f"train.optimizer.moment_dtype={moment_dtype!r} — expected one "
            f"of {sorted(k for k in _mu_dtypes if k)} (or unset for f32)")
    mu_dtype = _mu_dtypes[moment_dtype]
    if opt_type == "adafactor" and mu_dtype is not None:
        raise ValueError(
            "train.optimizer.moment_dtype is not applicable to adafactor "
            "(its factored second-moment state is already O(rows+cols))")
    base_ema = float(optimizer_cfg.get("ema_decay", 0.0) or 0.0)
    if not 0.0 <= base_ema < 1.0:
        raise ValueError(f"train.optimizer.ema_decay={base_ema} — expected "
                         "0 <= decay < 1 (0/unset disables the params EMA)")
    clip_norm = float(optimizer_cfg.get("grad_clip_norm", 0.0) or 0.0)
    clip_value = float(optimizer_cfg.get("grad_clip_value", 0.0) or 0.0)
    if clip_norm < 0 or clip_value < 0:
        raise ValueError(
            "train.optimizer.grad_clip_norm/grad_clip_value must be >= 0 "
            f"(got {clip_norm}, {clip_value}; 0/unset disables clipping)")
    groups = _parse_param_groups(optimizer_cfg)
    grouped_wd = bool(groups) and any(g[2] is not None for g in groups)
    grouped_lr = bool(groups) and any(g[1] != 1.0 for g in groups)
    if grouped_wd and opt_type == "adafactor":
        raise ValueError("param_groups weight_decay is not applicable to "
                         "adafactor (it applies no decay term)")
    if "weight_decay" in inject and grouped_wd:
        raise ValueError("per-member weight_decay cannot be combined with "
                         "param_groups weight decay (the group table would "
                         "override the injected scalar)")
    if "weight_decay" in inject and opt_type == "adafactor":
        raise ValueError("weight_decay is not applicable to adafactor")

    # ``inject``: names beyond the LR to expose as optax injected
    # hyperparams — per-member optimizer-STATE leaves the ensemble sweep
    # executor can vary without retracing (training/ensemble.py). None
    # defaults keep them static (and the opt_state layout unchanged) on the
    # normal path; injected mode always appends the relevant chain step so
    # the traced scalar has somewhere to act.
    def make(learning_rate, weight_decay=None, ema_decay=None):
        # gradient clipping leads the chain (torch clip_grad_norm_ order:
        # raw grads are clipped BEFORE coupled L2 / moments). It sits inside
        # the trainable_mask wrap below, so frozen/mutable-collection leaves
        # never contribute to the global norm; under pjit the norm is over
        # logical (global) arrays, so FSDP/TP sharding needs no special-case
        # — XLA inserts the cross-shard reduction.
        steps = []
        if clip_norm:
            steps.append(optax.clip_by_global_norm(clip_norm))
        if clip_value:
            steps.append(optax.clip(clip_value))
        # per-group weight decay (param_groups) slots into the exact chain
        # position the scalar decay would take, so coupled (adam/sgd) vs
        # decoupled (adamw/lion/lamb) semantics follow the optimizer type
        wd_eff = wd if weight_decay is None else weight_decay
        use_decay = wd or grouped_wd or weight_decay is not None
        decay = ((lambda: _grouped_decay(groups, wd)) if grouped_wd
                 else (lambda: optax.add_decayed_weights(wd_eff)))
        if opt_type == "adam":
            if use_decay:
                steps.append(decay())
            steps.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                             eps=eps, mu_dtype=mu_dtype))
        elif opt_type == "adamw":
            steps.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                             eps=eps, mu_dtype=mu_dtype))
            if use_decay:
                steps.append(decay())
        elif opt_type == "sgd":
            if use_decay:
                steps.append(decay())
            if momentum:
                steps.append(optax.trace(decay=momentum, nesterov=nesterov,
                                         accumulator_dtype=mu_dtype))
        elif opt_type == "lion":
            steps.append(optax.scale_by_lion(b1=betas[0], b2=betas[1],
                                             mu_dtype=mu_dtype))
            if use_decay:
                steps.append(decay())
        elif opt_type == "lamb":
            steps.append(optax.scale_by_adam(b1=betas[0], b2=betas[1],
                                             eps=eps, mu_dtype=mu_dtype))
            if use_decay:
                steps.append(decay())
            steps.append(optax.scale_by_trust_ratio())
        else:  # adafactor
            steps.append(optax.scale_by_factored_rms())
        if trainable_mask is not None:
            # wrap ONLY in the masked case so the common opt_state pytree
            # (and checkpoints/compile-cache keys) keep the flat layout
            steps = [optax.masked(optax.chain(*steps),
                                  jax.tree.map(lambda m: m > 0.5, trainable_mask))]
        if grouped_lr:
            # per-leaf LR multiplier right before the global injected LR:
            # effective lr = schedule(lr) * group.lr_scale (stateless, so
            # the opt_state layout and checkpoints are unchanged)
            steps.append(_grouped_lr_scale(groups))
        steps.append(optax.scale_by_learning_rate(learning_rate))
        if ema_decay is not None or base_ema:
            # params-EMA (Polyak averaging) rides in opt_state; export the
            # averaged weights with `serving export --ema`, or validate with
            # them via train.ema_eval
            steps.append(_params_ema(base_ema if ema_decay is None
                                     else ema_decay))
        return optax.chain(*steps)

    kwargs = {"learning_rate": lr}
    if "weight_decay" in inject:
        kwargs["weight_decay"] = wd
    if "ema_decay" in inject:
        kwargs["ema_decay"] = base_ema
    return optax.inject_hyperparams(make)(**kwargs), lr


class Trainer:
    def __init__(
        self,
        train_cfg: DictConfig,
        name: str = "run",
        work_dir: Optional[str] = None,
        mesh_config: Optional[MeshConfig] = None,
        use_wandb: bool = False,
        full_cfg: Optional[dict] = None,
        early_stopping_patience: int = 30,
    ):
        self.cfg = train_cfg
        self.name = name
        # persistent XLA compile cache (repeat runs skip compilation)
        if bool(train_cfg.get("compile_cache", True)):
            cache_dir = os.environ.get(
                "M2MIXER_COMPILE_CACHE",
                os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache"),
            )
            try:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            except Exception:
                pass
        # multi-host: bring up the jax distributed runtime before the mesh
        # (DCN process group; per-host data feeding goes through _put_batch's
        # make_array_from_process_local_data path). A failed initialize is
        # FATAL when distributed is requested: silently training single-host
        # on a misconfigured cluster is the worst possible failure mode.
        if bool(train_cfg.get("distributed", False)):
            import jax.distributed as _jax_distributed  # noqa: F401 (binds jax.distributed)

            kwargs = {}
            for k in ("coordinator_address", "num_processes", "process_id",
                      "initialization_timeout"):
                if train_cfg.get(k) is not None:
                    kwargs[k] = train_cfg.get(k)
            try:
                jax.distributed.initialize(**kwargs)
            except Exception as e:
                raise RuntimeError(
                    "train.distributed=true but jax.distributed.initialize "
                    f"failed ({e}); refusing to fall back to single-host "
                    "training. Check coordinator_address/num_processes/"
                    "process_id (or the cluster auto-detection environment)."
                ) from e
        # debugging analog of sanitizers: raise on NaN grads/activations
        if bool(train_cfg.get("debug_nans", False)):
            jax.config.update("jax_debug_nans", True)
        # PRNG implementation for dropout/stochastic-depth keys. On TPU the
        # default threefry2x32 costs ~0.3 ms/step at B geometry (measured:
        # 38.1k -> 61.6k samples/s switching to 'rbg' with dropout 0.5);
        # 'rbg' uses the hardware RNG path and is the recommended setting
        # for training throughput (streams differ from threefry, quality is
        # equivalent for dropout purposes).
        impl = train_cfg.get("prng_impl", None)
        if impl:
            jax.config.update("jax_default_prng_impl", str(impl))
        self.profile_dir = train_cfg.get("profile_dir", None)
        self.max_epochs = int(train_cfg.get("epochs", 1))
        self.monitor = train_cfg.get("monitor", "val_loss")
        self.monitor_mode = train_cfg.get("monitor_mode", "min")
        self.log_interval = int(train_cfg.get("log_interval_steps", 50))
        self.compute_train_metrics = bool(train_cfg.get("compute_train_metrics", True))
        # wandb.watch analog (`/root/reference/run.py:53`): track gradient
        # magnitudes (global norm per step, epoch-mean logged)
        self.watch_gradients = bool(train_cfg.get("watch_gradients", False))
        # train.log_mfu: log train_mfu per epoch — achieved model FLOPs/s
        # over the chip's bf16 MXU peak, with the step FLOPs taken from
        # XLA's cost model of the compiled train step (any model family,
        # no hand-derived formula). One extra single-step compile at first
        # use (persistent-cache friendly); single-device meshes only.
        self.log_mfu = bool(train_cfg.get("log_mfu", False))
        # train.grad_accum_steps K: average grads over K micro-batches per
        # optimizer update (large effective batch at micro-batch memory)
        self.grad_accum = max(1, int(train_cfg.get("grad_accum_steps", 1)))
        # host->device prefetch lookahead on the per-step (non-device-
        # resident) path: batch N+1's transfer overlaps step N's compute
        self.prefetch = bool(train_cfg.get("prefetch_batches", True))
        # train.pool_chunk_mb: HBM budget for device-resident pools. Splits
        # whose resident footprint exceeds it are STREAMED through the
        # epoch-compiled path in fixed-size chunks — one lax.scan dispatch
        # per chunk, with the next chunk's host->device transfer overlapping
        # the current chunk's compute (double-buffered: each chunk gets half
        # the budget). Extends compiled-epoch training to datasets larger
        # than device memory; bit-identical to the hoisted path (same
        # gathers, same rng folding via the cumulative start_step).
        self.pool_chunk_mb = float(train_cfg.get("pool_chunk_mb", 0) or 0)
        # preemption safety: SIGTERM -> resumable 'last' checkpoint + clean
        # return (TPU maintenance events / spot eviction send SIGTERM)
        self.save_on_preemption = bool(train_cfg.get("save_on_preemption", True))
        # validate/test with the Polyak-averaged weights instead of the raw
        # ones (requires train.optimizer.ema_decay > 0)
        self.ema_eval = bool(train_cfg.get("ema_eval", False))
        if self.ema_eval and not float(
                train_cfg.optimizer.get("ema_decay", 0.0) or 0.0):
            raise ValueError("train.ema_eval=true requires "
                             "train.optimizer.ema_decay > 0 (no EMA is "
                             "being maintained to evaluate with)")
        self.seed = int(train_cfg.get("seed", 0))
        if mesh_config is None:
            # config-driven mesh (train.mesh_data / train.mesh_model /
            # train.mesh_pipe)
            mesh_config = MeshConfig(
                data=int(train_cfg.get("mesh_data", -1)),
                model=int(train_cfg.get("mesh_model", 1)),
                pipe=int(train_cfg.get("mesh_pipe", 1)),
            )
        self.mesh = make_mesh(mesh_config)
        # sequence parallelism (opt-in): mixer blocks constrain their token
        # axis over 'model' between the TP GEMMs; installed (with the
        # pipeline context) only for the duration of fit()/test() — see
        # _parallel_contexts
        self._sequence_parallel = (
            bool(train_cfg.get("sequence_parallel", False))
            and self.mesh.shape.get("model", 1) > 1
        )
        # train.fsdp (ZeRO-3): params + Adam moments live split 1/Nth per
        # data rank; XLA derives the all-gather / reduce-scatter schedule
        # from the layout (parallel/mesh.py::_fsdp_spec). Opt-in; a no-op
        # on a 1-device data axis.
        self._fsdp = bool(train_cfg.get("fsdp", False))
        self._fsdp_min_size = int(train_cfg.get("fsdp_min_size", 4096))
        if self._fsdp and self.mesh.shape["data"] <= 1:
            print("[trainer] train.fsdp=true but the mesh data axis is 1; "
                  "nothing to shard (FSDP disabled)")
            self._fsdp = False
        log_root = work_dir or train_cfg.get("tensorboard_path", "./logs")
        if jax.process_count() > 1:
            # multi-host: ONE shared run dir. Process 0 claims a version and
            # writes all files; the others mirror the exact same paths with
            # a write-free logger so orbax coordinates one checkpoint (its
            # cross-process barriers hang forever on mismatched paths)
            from jax.experimental import multihost_utils

            primary = jax.process_index() == 0
            ver = 0
            if primary:
                self.logger = ExperimentLogger(
                    log_root, name, use_wandb=use_wandb,
                    config=todict(full_cfg) if full_cfg else None)
                ver = self.logger.version
            ver = int(multihost_utils.broadcast_one_to_all(np.int32(ver)))
            if not primary:
                self.logger = ExperimentLogger(log_root, name, version=ver,
                                               write=False)
        else:
            self.logger = ExperimentLogger(
                log_root,
                name,
                use_wandb=use_wandb,
                config=todict(full_cfg) if full_cfg else None,
            )
        self.ckpt_dir = os.path.join(self.logger.log_dir, "checkpoints")
        self.checkpoints = CheckpointManager(
            self.ckpt_dir, monitor=self.monitor, mode=self.monitor_mode, top_k=5, save_last=True,
            # train.async_checkpointing: overlap checkpoint disk IO with the
            # next epoch's compute (the save is made durable before any
            # restore, at fit() exit, and on preemption)
            async_save=bool(train_cfg.get("async_checkpointing", False)),
        )
        self.early_stopping = EarlyStopping(monitor="val_loss", patience=early_stopping_patience, mode="min")
        #: optional external stop condition, checked after every validation
        #: epoch: ``hook(epoch, logs) -> bool`` (True stops the fit). Used by
        #: the sweep executor's hyperband early termination (m2mixer_tpu/
        #: sweep.py); the run still tests/checkpoints normally afterwards.
        self.epoch_end_hook = None
        self.stopped_by_hook = False

        # populated in fit()
        self.params = None
        self.opt_state = None
        self.optimizer = None
        self.datamodule = None
        self.task = None
        self.global_step = 0
        self.current_epoch = 0
        self.callback_metrics: Dict[str, float] = {}
        self._train_step = None
        self._eval_step = None
        self.interrupted = False
        self.preempted = False
        self._preempt_requested = False

    # ------------------------------------------------------------------ utils
    def _put_batch(self, batch: Dict[str, np.ndarray]):
        data_size = self.mesh.shape["data"]

        if jax.process_count() > 1:
            # multi-host: each process feeds ITS slice of the global batch
            # (per-host data sharding over DCN); the global array is
            # assembled from the process-local shards without any transfer
            def put_local(x):
                n = np.shape(x)[0] if np.ndim(x) else 0
                if data_size > 1 and n % (data_size // jax.process_count() or 1) != 0:
                    # no replicated fallback exists across hosts (each
                    # process only holds its slice) — fail with guidance
                    # instead of an opaque sharding error
                    raise ValueError(
                        f"multi-host batch of {n} local samples does not "
                        f"tile the data axis ({data_size} over "
                        f"{jax.process_count()} processes); drop ragged "
                        "tail batches (datamodule drop_last) or pick a "
                        "split size divisible by the global batch")
                sharding = batch_sharding(self.mesh, np.ndim(x) or 1)
                return jax.make_array_from_process_local_data(sharding, np.asarray(x))

            return jax.tree.map(put_local, batch)

        def put(x):
            n = np.shape(x)[0] if np.ndim(x) else 0
            if data_size > 1 and n % data_size != 0:
                # ragged tail batch: replicate instead of sharding (it
                # already triggers its own compile for the odd shape)
                return jax.device_put(x, replicated(self.mesh))
            return jax.device_put(x, batch_sharding(self.mesh, np.ndim(x) or 1))

        return jax.tree.map(put, batch)

    def _put_ctx(self, ctx: Dict[str, np.ndarray]):
        rep = replicated(self.mesh)
        return {k: jax.device_put(jnp.asarray(v), rep) for k, v in ctx.items()}

    def _prefetched(self, batches):
        """One-batch lookahead over a host batch iterator: issue the NEXT
        batch's host->device transfer before the current one is consumed.
        jax dispatch is async, so the H2D copy of batch N+1 overlaps the
        device compute of step N — the TPU input-pipeline idiom replacing
        the reference's forked DataLoader workers (`/root/reference/run.py:55-56`).
        Disable with ``train.prefetch_batches: false``."""
        it = iter(batches)
        if not self.prefetch:
            for b in it:
                yield self._put_batch(b)
            return
        try:
            nxt = self._put_batch(next(it))
        except StopIteration:
            return
        for b in it:
            cur, nxt = nxt, self._put_batch(b)
            yield cur
        yield nxt

    def _eval_params(self):
        """Params to evaluate with: the Polyak-averaged tree from opt_state
        when ``train.ema_eval`` is on (falling back to the raw params if no
        EMA is present, e.g. a test-only restore of a pre-EMA checkpoint)."""
        if not self.ema_eval or self.opt_state is None:
            return self.params
        ema = ema_params_from_opt_state(self.opt_state)
        return self.params if ema is None else ema

    def _log_params_once(self, params):
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        mask = self.task.trainable_mask(params) if self.task is not None else None
        if mask is None:
            trainable = n
        else:
            # LoRA / frozen-BN runs: only mask-1 leaves receive updates
            trainable = sum(
                int(np.prod(p.shape))
                for p, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
                if float(m) > 0)
        self.logger.set_summary("total_parameters", n)
        self.logger.set_summary("trainable_parameters", trainable)
        note = ("" if trainable == n
                else f" ({trainable / 1e6:.3f}M trainable)")
        print(f"[trainer] {self.name}: {n / 1e6:.3f}M parameters{note}, "
              f"mesh={dict(self.mesh.shape)}, devices={len(jax.devices())}")

    # ------------------------------------------------------------------ steps
    def _build_steps(self, task, base_rng):
        optimizer = self.optimizer
        frozen_mask = task.frozen_mask(self.params)
        trainable_mask = task.trainable_mask(self.params)
        if self.grad_accum > 1 and getattr(task, "mutable_collections", ()):
            raise ValueError("train.grad_accum_steps > 1 is not supported "
                             "together with mutable collections")
        rng_d, rng_s, rng_m = jax.random.split(base_rng, 3)
        from .compiled import make_grad_masker, sam_value_and_grad

        # non-parameter collections (BN running stats) must never be
        # gradient-updated; they refresh via aux['_mutable_state']
        masker = make_grad_masker(frozen_mask, trainable_mask)
        # train.optimizer.sam_rho (beyond reference): sharpness-aware
        # minimization — gradients taken at w + rho*g/||g|| (2x step cost)
        sam_rho = float(task.optimizer_cfg.get("sam_rho", 0.0) or 0.0)
        if sam_rho < 0:
            raise ValueError(
                f"train.optimizer.sam_rho must be >= 0 (got {sam_rho})")
        # train.optimizer.pcgrad (beyond reference): PCGrad gradient surgery
        # over the task's loss components (compiled.py::pcgrad_value_and_grad)
        pcgrad = bool(task.optimizer_cfg.get("pcgrad", False))
        if pcgrad and not hasattr(task, "step_components"):
            raise ValueError(
                "train.optimizer.pcgrad needs a task exposing per-component "
                "losses (MultiLossTask.step_components); "
                f"{type(task).__name__} has a single objective — there is "
                "nothing to de-conflict.")
        if pcgrad and sam_rho:
            raise ValueError(
                "train.optimizer.pcgrad and train.optimizer.sam_rho cannot "
                "combine: SAM perturbs along the summed gradient, PCGrad "
                "replaces that sum with projected components — the ascent "
                "point is ill-defined. Pick one.")
        from .compiled import pcgrad_value_and_grad

        def train_step(params, opt_state, batch, ctx, step):
            task.bind_trace_flavors()  # trace-time; each compile uses THIS task's flavors
            rngs = {
                "dropout": jax.random.fold_in(rng_d, step),
                "stochastic": jax.random.fold_in(rng_s, step),
                "mute": jax.random.fold_in(rng_m, step),
            }

            def loss_fn(p):
                return task.step(p, batch, ctx, rngs, train=True)

            if pcgrad:
                (loss, aux), grads = pcgrad_value_and_grad(
                    lambda p: task.step_components(p, batch, ctx, rngs,
                                                   train=True),
                    params, masker, ctx["frozen"])
            else:
                (loss, aux), grads = sam_value_and_grad(
                    loss_fn, params, sam_rho, masker, ctx["frozen"])
            if self.watch_gradients:
                aux = dict(aux, grad_norm=optax.global_norm(grads))
            frozen = ctx["frozen"]
            grads = masker(grads, frozen)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = masker(updates, frozen)
            params = optax.apply_updates(params, updates)
            if isinstance(aux, dict) and "_mutable_state" in aux:
                aux = dict(aux)
                params = {**params, **aux.pop("_mutable_state")}
            return params, opt_state, loss, aux

        def eval_step(params, batch, ctx):
            task.bind_trace_flavors()
            return task.step(params, batch, ctx, {}, train=False)

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)

        if self.grad_accum > 1:
            # per-step gradient accumulation trio (micro-batch grads are
            # summed across K calls, one masked optimizer update per flush)
            def grad_step(params, batch, ctx, micro_step):
                task.bind_trace_flavors()
                rngs = {
                    "dropout": jax.random.fold_in(rng_d, micro_step),
                    "stochastic": jax.random.fold_in(rng_s, micro_step),
                    "mute": jax.random.fold_in(rng_m, micro_step),
                }
                if pcgrad:
                    (loss, aux), grads = pcgrad_value_and_grad(
                        lambda p: task.step_components(p, batch, ctx, rngs,
                                                       train=True),
                        params, masker, ctx["frozen"])
                else:
                    (loss, aux), grads = sam_value_and_grad(
                        lambda p: task.step(p, batch, ctx, rngs, train=True),
                        params, sam_rho, masker, ctx["frozen"])
                return grads, loss, aux

            def apply_step(params, opt_state, grads, ctx):
                frozen = ctx["frozen"]
                gn = (optax.global_norm(grads) if self.watch_gradients
                      else jnp.float32(0.0))
                grads = masker(grads, frozen)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                updates = masker(updates, frozen)
                return optax.apply_updates(params, updates), opt_state, gn

            self._grad_step = jax.jit(grad_step)
            self._apply_step = jax.jit(apply_step, donate_argnums=(0, 1, 2))
            self._add_grads = jax.jit(
                lambda a, b: jax.tree.map(jnp.add, a, b), donate_argnums=(0,))
            self._avg_grads = jax.jit(
                lambda a, k: jax.tree.map(lambda x: x / k, a), donate_argnums=(0,))

        # epoch-compiled fast path: many steps per dispatch (see compiled.py);
        # both pool placements are built (a split uses the sharded variant iff
        # train.sharded_pool is on and its size divides the data axis)
        self._step_rng_keys = {"dropout": rng_d, "stochastic": rng_s, "mute": rng_m}
        if self.compiled_epochs:
            from .compiled import make_eval_epoch_fn, make_train_epoch_fn

            bs = self.datamodule.batch_size
            self._train_epoch_fns = {
                sharded: make_train_epoch_fn(task, optimizer, frozen_mask, bs,
                                             mesh=self.mesh, sharded_pool=sharded,
                                             watch_gradients=self.watch_gradients,
                                             trainable_mask=trainable_mask,
                                             grad_accum=self.grad_accum,
                                             sam_rho=sam_rho, pcgrad=pcgrad)
                for sharded in ((False, True) if self._sharding_pools() else (False,))
            }
            self._eval_epoch_fns = {
                sharded: make_eval_epoch_fn(task, bs, mesh=self.mesh,
                                            sharded_pool=sharded)
                for sharded in ((False, True) if self._sharding_pools() else (False,))
            }
        else:
            self._train_epoch_fns = self._eval_epoch_fns = {}
        # what the jitted closures were built against — test() rebuilds when
        # the task or the batch geometry changes (stale closures would run
        # the OLD task's step / the old batch size)
        self._steps_task = task
        self._steps_bs = self.datamodule.batch_size if self.datamodule else None

    # -------------------------------------------------------------- fast path
    @property
    def compiled_epochs(self) -> bool:
        """Epoch-compiled training is used when the config allows it, the
        datamodule can live device-resident, and (on a multi-device mesh)
        the batch divides the data axis. The data pool is replicated per
        device; each minibatch gather is constrained to shard over `data`,
        so the scan runs data-parallel with XLA-inserted all-reduces."""
        if not bool(self.cfg.get("compiled_epochs", True)):
            return False
        dm = self.datamodule
        if dm is None or not hasattr(dm, "splits") or not dm.splits:
            return False
        return dm.batch_size % self.mesh.shape["data"] == 0

    def _sharding_pools(self) -> bool:
        """train.sharded_pool is on and the mesh has a data axis to shard
        over — pools then hold 1/Nth of the data per device (HBM-scaling for
        datasets larger than one device's memory; see compiled.py)."""
        return bool(self.cfg.get("sharded_pool", False)) and self.mesh.shape["data"] > 1

    def _pool_sharded(self, stage: str) -> bool:
        if not self._sharding_pools():
            return False
        dd = self.mesh.shape["data"]
        n = self.datamodule.split_size(stage)
        bs = self.datamodule.batch_size
        # each device needs whole batch shards from its whole pool shard
        return n % dd == 0 and bs % dd == 0

    def _split_order(self, order, stage: str, bs: int):
        """Split an epoch order into (device_path, tail_path) index arrays.
        Sharded pools additionally realign the device part so each batch
        draws bs/N items per pool shard (compiled.shard_align_order)."""
        order = np.asarray(order)
        if self._pool_sharded(stage):
            from .compiled import shard_align_order

            dd = self.mesh.shape["data"]
            shard_size = self.datamodule.split_size(stage) // dd
            return shard_align_order(order, bs, dd, shard_size)
        n_full = (len(order) // bs) * bs
        return order[:n_full], order[n_full:]

    def _device_split(self, stage: str):
        if not hasattr(self, "_dev_splits"):
            self._dev_splits = {}
        if stage not in self._dev_splits:
            if self._pool_sharded(stage):
                # shard the pool over the data axis: each device holds 1/Nth
                shard = lambda x: jax.device_put(
                    x, NamedSharding(self.mesh, P("data", *([None] * (np.ndim(x) - 1)))))
                self._dev_splits[stage] = jax.tree.map(shard, self.datamodule.splits[stage])
            else:
                # replicate the pool across the mesh; per-step gathers are
                # then sharding-constrained onto the data axis inside the scan
                self._dev_splits[stage] = jax.device_put(
                    self.datamodule.splits[stage], replicated(self.mesh)
                )
        return self._dev_splits[stage]

    # ------------------------------------------------------- streamed pools
    def _row_bytes(self, stage: str) -> int:
        arrays = self.datamodule.splits[stage]
        return int(sum(v.dtype.itemsize * int(np.prod(v.shape[1:], dtype=np.int64))
                       for v in arrays.values()))

    def _stream_chunk_rows(self, stage: str, quant: int) -> Optional[int]:
        """Rows per streamed chunk (a multiple of ``quant``, the scan's
        step granularity), or None when the split fits the budget and is
        hoisted whole. Returns 0 when the budget is set but cannot hold two
        chunks of even one step — the caller then falls back to the
        per-step host path instead of overcommitting HBM."""
        if not self.pool_chunk_mb:
            return None
        n = self.datamodule.split_size(stage)
        row = self._row_bytes(stage)
        budget = self.pool_chunk_mb * (1 << 20)
        # what hoisting would cost per device (sharded pools hold 1/Nth)
        resident = n * row / (self.mesh.shape["data"] if self._pool_sharded(stage) else 1)
        if resident <= budget:
            return None
        # sharded streaming places each chunk split 1/Nth per device, so the
        # per-device budget affords N-fold larger chunks
        dd = self.mesh.shape["data"] if self._stream_sharded(stage) else 1
        rows = (int(budget / 2 / row) * dd) // quant * quant
        if rows <= 0 and not getattr(self, "_warned_chunk", False):
            print(f"[trainer] pool_chunk_mb={self.pool_chunk_mb:g} cannot "
                  f"hold two chunks of one step ({quant} rows x {row} B); "
                  f"falling back to per-step host streaming for {stage!r}")
            self._warned_chunk = True
        return max(rows, 0)

    def _stream_sharded(self, stage: str) -> bool:
        """Sharded chunk placement for STREAMED pools. Unlike hoisted
        sharding (``_pool_sharded``), this does NOT require the full split
        to divide the data axis — streamed chunks are always whole batches
        (the ragged tail goes per-step), so ``bs % dd == 0`` is the only
        divisibility the shard-aligned layout needs."""
        return (self._sharding_pools()
                and self.datamodule.batch_size % self.mesh.shape["data"] == 0)

    def _chunk_stager(self, splits, bs: int, sharded: bool):
        """The staging closure shared by the streamed train and eval loops:
        ``stage(idx) -> (device_chunk, inner_order)``. Replicated chunks use
        an identity inner order (== the hoisted path's global gather of the
        same rows); sharded chunks use the device-major host layout +
        shard-aligned inner order of ``_shard_chunk_layout`` (same batch
        contents and ordering, so still bit-identical)."""
        dd = self.mesh.shape["data"]

        def stage(idx):
            if sharded:
                host_order, inner = self._shard_chunk_layout(idx, bs, dd)
            else:
                host_order, inner = idx, np.arange(len(idx), dtype=np.int32)
            return self._put_chunk(splits, host_order, sharded), inner

        return stage

    def _stream_chunks(self, order: np.ndarray, chunk_rows: int):
        """Partition a device-path order into chunk index arrays. All chunks
        but the last share one length, so the scan recompiles at most once
        (for the shorter last chunk) and both executables are reused every
        epoch."""
        order = np.asarray(order)
        return [order[s : s + chunk_rows] for s in range(0, len(order), chunk_rows)]

    def _put_chunk(self, splits, idx, sharded: bool = False):
        """Host-gather the chunk's rows and issue ONE async H2D transfer.

        Replicated (default): per-batch gathers inside the scan are
        sharding-constrained onto the data axis, like hoisted replicated
        pools. ``sharded`` (streamed + train.sharded_pool): the chunk is
        placed split 1/Nth per device over ``data`` — pass the host order
        from ``_shard_chunk_layout`` so each device's shard holds exactly
        its per-step quotas for the shard_map gather."""
        if sharded:
            put = lambda v: jax.device_put(
                np.ascontiguousarray(v[idx]),
                NamedSharding(self.mesh, P("data", *([None] * (v.ndim - 1)))))
            return {k: put(v) for k, v in splits.items()}
        rep = replicated(self.mesh)
        return jax.device_put({k: np.ascontiguousarray(v[idx]) for k, v in splits.items()}, rep)

    @staticmethod
    def _shard_chunk_layout(idx: np.ndarray, bs: int, dd: int):
        """Arrange a chunk's epoch-order rows for a ``data``-sharded
        placement: returns ``(host_order, inner_order)`` where
        ``host_order`` permutes ``idx`` device-major (device d's shard holds
        its per-step quotas contiguously) and ``inner_order`` is the
        shard-aligned index array the sharded epoch fn gathers with. Batch
        contents and within-batch ordering come out identical to the
        replicated path, so results stay bit-identical."""
        idx = np.asarray(idx)
        steps = len(idx) // bs
        per = bs // dd
        quotas = idx.reshape(steps, dd, per)
        host = quotas.transpose(1, 0, 2).reshape(-1)
        shard_rows = steps * per
        inner = (np.arange(dd)[None, :, None] * shard_rows
                 + np.arange(steps)[:, None, None] * per
                 + np.arange(per)[None, None, :]).reshape(-1)
        return host, inner.astype(np.int32)

    # ------------------------------------------------------------- MFU meter
    def _train_mfu(self, samples_per_sec: float) -> Optional[float]:
        """train.log_mfu: ``samples/s * FLOPs/sample / aggregate bf16 peak``,
        with the per-sample FLOPs asked of XLA's cost model for the compiled
        train step (``utils/flops.py``). Under SPMD the cost model reports
        ONE partition's FLOPs (the program every device runs), so the total
        is per-partition x mesh size and the peak is per-chip peak x mesh
        size — the meter works on exactly the meshes where MFU matters.
        (With TP/SP the partition sum counts what the devices actually
        execute, so redundant compute reads as utilization, matching the
        hardware-counter MFU convention.)"""
        # cache keyed on the live step closures: test()/refit may rebuild
        # _train_step for a new task or batch geometry, and the FLOPs of the
        # old executable must not leak onto the new one
        key = (id(self._steps_task), self._steps_bs)
        if getattr(self, "_mfu_cache_key", None) != key:
            self._mfu_cache_key = key
            self._mfu_flops_per_sample = self._measure_step_flops()
            if self._mfu_flops_per_sample is None:
                print("[trainer] train.log_mfu: no FLOPs estimate available "
                      "for this step/datamodule; skipping")
        if not self._mfu_flops_per_sample:
            return None
        from ..utils.flops import peak_flops

        # peak from the mesh's OWN devices (summed per device, so a
        # heterogeneous mesh is priced correctly), not jax.devices()[0]
        peak = float(sum(peak_flops(d)
                         for d in np.asarray(self.mesh.devices).flat))
        return samples_per_sec * self._mfu_flops_per_sample / peak

    def _measure_step_flops(self) -> Optional[float]:
        """FLOPs per training sample from XLA's cost analysis of the
        per-step executable (same math the epoch scan runs per step).

        Specs carry the LIVE arrays' shardings (params/opt_state as placed
        by ``shard_params``, the batch as ``_put_batch`` lays it out), so
        under SPMD the lowered program is the same partitioned executable
        the fit loop runs and the cost model prices one partition of it;
        the return value is the all-partition total per GLOBAL sample."""
        from ..utils.flops import compiled_step_flops

        dm = self.datamodule
        if (self._train_step is None or self.params is None or dm is None
                or not getattr(dm, "splits", None) or "train" not in dm.splits):
            return None

        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        mesh_devices = set(np.asarray(self.mesh.devices).flat)
        replicated = NamedSharding(self.mesh, P())

        def spec(x):
            dt = getattr(x, "dtype", None)
            if dt is None:
                dt = np.asarray(x).dtype
            sh = getattr(x, "sharding", None)
            if self.mesh.size > 1:
                # leaves living off the mesh (e.g. the injected lr scalar,
                # committed to one device) would make the lowered program's
                # device sets incompatible — price them as mesh-replicated
                if sh is None or set(getattr(sh, "device_set", ())) != mesh_devices:
                    sh = replicated
            else:
                sh = None
            return jax.ShapeDtypeStruct(tuple(np.shape(x)), dt, sharding=sh)

        bs = dm.batch_size
        # canonicalize host dtypes (f64 -> f32 etc.) and the device layout
        # exactly as the live path does (_put_batch shards the leading axis
        # over the mesh 'data' axis), so the lowered program matches the jit
        # path's and the persistent compile cache can hit
        sample = {k: np.asarray(v[:bs]) for k, v in dm.splits["train"].items()}
        batch_spec = jax.tree.map(spec, self._put_batch(sample))
        # jnp.asarray matches _put_ctx's dtype canonicalization (f64 -> f32)
        ctx_spec = {k: spec(jnp.asarray(v))
                    for k, v in self.task.make_ctx(0, "train").items()}
        flops = compiled_step_flops(
            self._train_step, jax.tree.map(spec, self.params),
            jax.tree.map(spec, self.opt_state), batch_spec, ctx_spec, 0)
        if flops is None:
            return None
        # SPMD cost analysis prices one partition; every device runs it
        return flops * self.mesh.size / bs

    # ------------------------------------------------------------------ fit
    def _install_preempt_handler(self):
        """SIGTERM -> set a flag; the fit loop checkpoints at the next safe
        point and returns cleanly. Installed for the WHOLE of fit() — the
        first jit compile can take minutes on TPU and a default-handled
        SIGTERM there would kill the process inside the grace window."""
        self._prev_sigterm = None
        if not self.save_on_preemption:
            return
        import signal as _signal
        import threading as _threading

        if _threading.current_thread() is not _threading.main_thread():
            return  # signal handlers only work in the main thread

        def _on_term(signum, frame):
            if not self._preempt_requested:
                print("[trainer] SIGTERM: checkpointing at the next "
                      "safe point, then exiting resumably")
            self._preempt_requested = True

        self._prev_sigterm = _signal.signal(_signal.SIGTERM, _on_term)

    def _restore_preempt_handler(self):
        if getattr(self, "_prev_sigterm", None) is not None:
            import signal as _signal

            _signal.signal(_signal.SIGTERM, self._prev_sigterm)
            self._prev_sigterm = None

    @contextlib.contextmanager
    def _parallel_contexts(self):
        """Install the trace-time parallelism contexts (pipeline mesh for
        PipelinedFusionMixer, SP activation mesh) for the duration of a
        fit/test, and restore the previous values after — so traces that
        happen later in the same process (serving export, another Trainer)
        never inherit a stale training mesh."""
        from ..parallel import set_activation_mesh, set_pipeline_mesh

        prev_pipe = set_pipeline_mesh(
            self.mesh if "pipe" in self.mesh.shape else None)
        prev_act = set_activation_mesh(self.mesh if self._sequence_parallel else None)
        try:
            yield
        finally:
            set_pipeline_mesh(prev_pipe)
            set_activation_mesh(prev_act)

    def _attach_distiller(self, task) -> None:
        """train.distill (training/distill.py): build the frozen teacher
        once per trainer and attach it to the task — the KD term then rides
        inside the jitted step as captured constants (no state changes)."""
        if getattr(task, "distiller", None) is not None:
            return  # already attached (e.g. test() right after fit())
        if not self.cfg.get("distill", None):
            return
        from .distill import attach_distiller

        if getattr(self, "_distiller", None) is None:
            self._distiller = attach_distiller(task, self.cfg, self.mesh)
        else:
            task.distiller = self._distiller

    def fit(self, task, datamodule, resume_from: Optional[str] = None) -> None:
        # preemption safety (train.save_on_preemption, default on): TPU
        # maintenance events / spot eviction deliver SIGTERM with a short
        # grace window — write a resumable 'last' checkpoint and return
        # instead of dying mid-epoch; train.auto_resume (or -p) continues
        self._install_preempt_handler()
        try:
            with self._parallel_contexts():
                self._fit_inner(task, datamodule, resume_from)
        finally:
            self._restore_preempt_handler()

    def _fit_inner(self, task, datamodule, resume_from: Optional[str]) -> None:
        self.task = task
        self._attach_distiller(task)
        if datamodule is not self.datamodule:
            self._dev_splits = {}  # device-resident cache belongs to one module
        self.datamodule = datamodule
        datamodule.setup("fit")
        base_rng = seed_everything(self.seed)

        sample = next(iter(datamodule.train_batches()))
        sample = self._put_batch(sample)
        init_rng, step_rng = jax.random.split(base_rng)
        if self.params is None:
            params = task.init_params(init_rng, sample)
            self.params = shard_params(self.mesh, params, fsdp=self._fsdp,
                                       fsdp_min_size=self._fsdp_min_size)
            init_from = self.cfg.get("init_from", None)
            if init_from:
                # warm start (train.init_from): graft another run's weights
                # into the fresh tree — params only (fresh optimizer/epoch/
                # schedules). Shape-mismatched leaves keep their fresh init
                # (head-swap transfer); LoRA adapters stay freshly zeroed so
                # step 0 reproduces the donor model. A later resume/-p
                # restore simply overwrites this.
                from .warmstart import graft_params, load_checkpoint_params

                loaded = load_checkpoint_params(str(init_from))
                self.params, stats = graft_params(self.params, loaded)
                note = ""
                if stats["shape_mismatch"] or stats["missing"]:
                    note = (f" (kept fresh: {len(stats['shape_mismatch'])} "
                            f"shape-mismatched, {len(stats['missing'])} "
                            "missing-in-ckpt)")
                print(f"[trainer] warm-started {stats['taken']} leaves "
                      f"from {init_from}{note}")
        self._log_params_once(self.params)
        self.optimizer, lr0 = _make_optimizer(task.optimizer_cfg,
                                              task.trainable_mask(self.params))
        check_param_groups(task.optimizer_cfg, self.params)
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.params)
        if resume_from is None and bool(self.cfg.get("auto_resume", False)):
            # crash/preemption recovery: continue from the newest previous
            # version of this run name that left a 'last' checkpoint
            resume_from = self._find_latest_checkpoint()
        if resume_from is not None:
            self.restore(resume_from, with_progress=True)
            print(f"[trainer] resumed from {resume_from} at epoch {self.current_epoch}")
        sched_cfg = task.optimizer_cfg.get("schedule", None)
        if sched_cfg:
            from .callbacks import LRSchedule

            self.plateau = LRSchedule(lr0, DictConfig(sched_cfg), self.max_epochs)
            self.plateau.epoch = self.current_epoch  # resume-aligned
            # warmup applies from the FIRST epoch, not after it
            self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                self.plateau.at_epoch(self.current_epoch), jnp.float32)
        else:
            self.plateau = ReduceLROnPlateau(lr0, patience=int(task.scheduler_patience))
        rc = getattr(self, "_restored_callbacks", None)
        if rc:
            # continue the plateau/early-stop trajectories from the resumed
            # run instead of restarting them (see _state)
            import math as _math

            if isinstance(self.plateau, ReduceLROnPlateau) and rc["plateau_lr"] > 0:
                self.plateau.lr = rc["plateau_lr"]
                self.plateau.best = (None if _math.isnan(rc["plateau_best"])
                                     else rc["plateau_best"])
                self.plateau.num_bad = int(rc["plateau_num_bad"])
                self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    self.plateau.lr, jnp.float32)
            self.early_stopping.best = (None if _math.isnan(rc["es_best"])
                                        else rc["es_best"])
            self.early_stopping.wait = int(rc["es_wait"])
            self._restored_callbacks = None
        self._build_steps(task, step_rng)

        train_scores, val_scores, _ = task.setup_scores()
        train_start = time.time()

        try:
            for epoch in range(self.current_epoch, self.max_epochs):
                self.current_epoch = epoch
                task.on_train_epoch_start(self, epoch)
                if self.profile_dir and epoch == 1:
                    # profile the second epoch (first is compile-skewed)
                    with jax.profiler.trace(self.profile_dir):
                        self._run_train_epoch(task, datamodule, epoch, train_scores)
                else:
                    self._run_train_epoch(task, datamodule, epoch, train_scores)
                if self._preempt_agreed():
                    # interrupted during (or right after) the train phase:
                    # skip val, save under 'preempted', re-run this epoch
                    # on resume (params may carry partial-epoch updates —
                    # re-running only adds training)
                    self._preempt_save(epoch)
                    break
                task.on_train_epoch_end(self, epoch, dict(self.callback_metrics))
                logs = self._run_val_epoch(task, datamodule, epoch, val_scores)
                task.on_validation_epoch_end(self, epoch, logs)

                # plateau LR on val_loss (reference monitors val_loss,
                # `models/avmnist.py:413-422`)
                new_lr = self.plateau.update(logs["val_loss"])
                self.opt_state.hyperparams["learning_rate"] = jnp.asarray(new_lr, jnp.float32)
                logs["lr"] = new_lr

                # best-epoch summary bookkeeping
                best = self.logger.summary.get("best_val_loss")
                if best is None or logs["val_loss"] <= best:
                    self.logger.set_summary("best_val_loss", logs["val_loss"])
                    self.logger.set_summary("best_val_loss_epoch", epoch)
                    self.logger.set_summary("best_val_loss_time", time.time() - train_start)
                    for k, v in logs.items():
                        if k.startswith("val_") and k != "val_loss":
                            self.logger.set_summary(f"best_{k}", v)

                self.callback_metrics.update(logs)
                self.logger.log(logs, self.global_step)
                self._save_checkpoint(epoch, logs)
                if self._preempt_agreed():
                    # signal arrived during val/save: the normal end-of-
                    # epoch checkpoint just covered epoch `epoch` — done
                    self.preempted = True
                    print(f"[trainer] preempted: epoch {epoch} checkpoint "
                          "saved; resume with train.auto_resume or -p")
                    break
                if self.early_stopping.update(logs):
                    print(f"[trainer] early stopping at epoch {epoch}")
                    break
                if (self.epoch_end_hook is not None
                        and self.epoch_end_hook(epoch, dict(logs))):
                    print(f"[trainer] stopped by epoch hook at epoch {epoch}")
                    self.stopped_by_hook = True
                    break
        except KeyboardInterrupt:
            # reference behavior: fall through to testing the best ckpt
            print("KeyboardInterrupt: proceeding to test with the current best model")
            self.interrupted = True
        finally:
            # async checkpointing: every scheduled save is durable before fit
            # returns (callers read best_path()/hand the dir to other tools)
            self.checkpoints.wait()

    def _run_train_epoch(self, task, datamodule, epoch, train_scores) -> None:
        ctx = self._put_ctx(task.make_ctx(epoch, "train"))
        losses_dev, preds_dev, labels_dev, probs_dev = [], [], [], []
        extra_dev: Dict[str, list] = {k: [] for k in task.epoch_log_keys()}
        scalar_keys = list(task.epoch_scalar_keys())
        if self.watch_gradients:
            scalar_keys.append("grad_norm")
        scalar_dev: Dict[str, list] = {k: [] for k in scalar_keys}
        t0 = time.time()
        nsteps = 0

        def consume(loss, aux, flat: bool):
            losses_dev.append(loss)
            if self.compute_train_metrics and train_scores is not None:
                preds = aux["preds"]
                labels = aux["labels"]
                probs = aux.get("probs")
                if flat:  # (S, B, ...) stacked by the epoch scan
                    preds = preds.reshape(-1, *preds.shape[2:])
                    labels = labels.reshape(-1, *labels.shape[2:])
                    if probs is not None:
                        probs = probs.reshape(-1, *probs.shape[2:])
                preds_dev.append(preds)
                labels_dev.append(labels)
                if probs is not None:
                    probs_dev.append(probs)
            for k in extra_dev:
                extra_dev[k].append(aux["losses"][k.removeprefix("loss_")])
            for k in scalar_dev:
                if k in aux:
                    scalar_dev[k].append(aux[k])

        K = self.grad_accum
        acc = {"g": None, "n": 0}

        def flush_accum():
            """Apply one optimizer update from the pending micro-grads."""
            if acc["n"] == 0:
                return
            grads = self._avg_grads(acc["g"], float(acc["n"]))
            self.params, self.opt_state, gn = self._apply_step(
                self.params, self.opt_state, grads, ctx)
            if self.watch_gradients:
                scalar_dev.setdefault("grad_norm", []).append(gn)
            acc["g"] = None
            acc["n"] = 0
            self.global_step += 1

        def train_one(batch):
            """One micro-batch through the per-step path (direct update at
            K=1, accumulate-then-flush otherwise)."""
            if K == 1:
                self.params, self.opt_state, loss, aux = self._train_step(
                    self.params, self.opt_state, batch, ctx, self.global_step)
                self.global_step += 1
            else:
                grads, loss, aux = self._grad_step(
                    self.params, batch, ctx, self.global_step * K + acc["n"])
                acc["g"] = (grads if acc["g"] is None
                            else self._add_grads(acc["g"], grads))
                acc["n"] += 1
                if acc["n"] == K:
                    flush_accum()
            consume(loss, aux, flat=False)
            return loss

        use_device_path = (self.compiled_epochs
                           and datamodule.device_resident_ok("train"))
        stream_rows = (self._stream_chunk_rows("train", datamodule.batch_size * K)
                       if use_device_path else None)
        if stream_rows == 0:
            use_device_path = False  # budget can't hold one step: host path
        if use_device_path:
            order = datamodule.epoch_order("train", datamodule.train_shuffle_enabled())
            bs = datamodule.batch_size
            if stream_rows:
                # streamed pool (train.pool_chunk_mb): the split stays on
                # host, fixed-size chunks go through the scan — replicated,
                # or split 1/Nth per device when train.sharded_pool is on
                n_full = (len(order) // bs) * bs
                order = np.asarray(order)
                device_order, tail_order = order[:n_full], order[n_full:]
                sharded = self._stream_sharded("train")
            else:
                arrays = self._device_split("train")
                device_order, tail_order = self._split_order(order, "train", bs)
                sharded = self._pool_sharded("train")
            if K > 1:
                # updates consume K consecutive micro-batches; push the
                # non-multiple remainder through the per-step path
                quant = bs * K
                n_full = (len(device_order) // quant) * quant
                tail_order = np.concatenate(
                    [device_order[n_full:], tail_order]).astype(device_order.dtype)
                device_order = device_order[:n_full]
            if stream_rows and len(device_order):
                fn = self._train_epoch_fns[sharded]
                stage = self._chunk_stager(datamodule.splits["train"], bs, sharded)
                chunks = self._stream_chunks(device_order, stream_rows)
                staged = stage(chunks[0])
                prev_done = None
                for c, idx in enumerate(chunks):
                    if self._preempt_midepoch():
                        break
                    (chunk_arrays, inner), staged = staged, None
                    if prev_done is not None:
                        # backpressure: wait for the PREVIOUS chunk's scan to
                        # retire before dispatching the next, so at most two
                        # chunk buffers (running + staged) are ever in flight
                        # — without this the host races ahead and resident
                        # chunks pile up past the budget. A hard fetch of the
                        # (tiny) losses array, not block_until_ready: the
                        # latter can return early through remote-device
                        # tunnels (kbench39) and void the bound.
                        np.asarray(prev_done)
                    # the cumulative global_step keeps the rng folding
                    # identical to the hoisted path
                    self.params, self.opt_state, losses, aux = fn(
                        self.params, self.opt_state, chunk_arrays,
                        jnp.asarray(inner), ctx,
                        self._step_rng_keys, self.global_step,
                    )
                    if c + 1 < len(chunks):
                        # stage the next chunk's H2D transfer while the
                        # dispatched scan crunches this one (double-buffer)
                        staged = stage(chunks[c + 1])
                    prev_done = losses
                    consume(losses, aux, flat=True)
                    self.global_step += len(idx) // (bs * K)
                    nsteps += len(idx) // bs
            elif len(device_order):
                self.params, self.opt_state, losses, aux = self._train_epoch_fns[sharded](
                    self.params, self.opt_state, arrays,
                    jnp.asarray(device_order, jnp.int32), ctx,
                    self._step_rng_keys, self.global_step,
                )
                consume(losses, aux, flat=True)
                self.global_step += len(device_order) // (bs * K)
                nsteps += len(device_order) // bs
            # ragged/unbalanced tail through the per-step path
            for start in range(0, len(tail_order), bs):
                if self._preempt_midepoch():
                    break
                idx = tail_order[start : start + bs]
                batch = self._put_batch(
                    {k: v[idx] for k, v in datamodule.splits["train"].items()}
                )
                train_one(batch)
                nsteps += 1
            flush_accum()
        else:
            for batch in self._prefetched(datamodule.train_batches()):
                if self._preempt_midepoch():
                    break
                loss = train_one(batch)
                nsteps += 1
                # step-interval loss logging (parity with the reference's
                # log_every_n_steps; one scalar fetch every N steps). With
                # accumulation, log only at flush boundaries so each
                # global_step is logged at most once.
                if (self.log_interval and acc["n"] == 0
                        and self.global_step % self.log_interval == 0):
                    self.logger.log({"train_loss_step": float(loss)}, self.global_step)
            flush_accum()

        # one host sync per epoch
        if self._preempt_requested and not losses_dev:
            return  # preempted before the first step of this epoch
        losses = np.concatenate([np.atleast_1d(x) for x in self._fetch_rows(losses_dev)])
        logs = {"train_loss": float(losses.mean()), "epoch": epoch}
        for k, vals in extra_dev.items():
            flat = np.concatenate([np.atleast_1d(x) for x in self._fetch_rows(vals)])
            logs[f"train_{k}"] = float(flat.mean())
        for k, vals in scalar_dev.items():
            if vals:
                flat = np.concatenate([np.atleast_1d(x) for x in self._fetch_rows(vals)])
                logs[f"train_{k}"] = float(flat.mean())
        if self.compute_train_metrics and train_scores is not None and preds_dev:
            preds = np.concatenate(self._fetch_rows(preds_dev))
            labels = np.concatenate(self._fetch_rows(labels_dev))
            probs = np.concatenate(self._fetch_rows(probs_dev)) if probs_dev else None
            for mname, metric in train_scores.items():
                metric.update(probs if metric.wants_scores and probs is not None else preds, labels)
                logs[f"train_{mname}"] = metric.compute()
                metric.reset()
        dt = time.time() - t0
        bs = getattr(datamodule, "batch_size", None)
        if bs:
            logs["train_samples_per_sec"] = nsteps * bs / dt
            if self.log_mfu:
                mfu = self._train_mfu(logs["train_samples_per_sec"])
                if mfu is not None:
                    logs["train_mfu"] = mfu
        self.callback_metrics.update(logs)
        self.logger.log(logs, self.global_step)

    def _preempt_midepoch(self) -> bool:
        """Mid-epoch preemption break. Single-process only: on a multi-host
        cluster a per-process break would desynchronize the step sequence
        (peers stall in the next collective), so the preempt defers to the
        epoch-boundary COLLECTIVE decision (``_preempt_agreed``)."""
        return self._preempt_requested and jax.process_count() == 1

    def _preempt_agreed(self) -> bool:
        """Collective preemption decision at a safe point: SIGTERM lands
        per-process, but every process must take the SAME branch (the
        checkpoint saves barrier on matching paths — divergent branches
        would hang the cluster). OR-reduce the local flags; any process
        signaled => all preempt."""
        if jax.process_count() <= 1:
            return self._preempt_requested
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(int(self._preempt_requested), np.int32))
        agreed = bool(np.any(flags))
        if agreed:
            self._preempt_requested = True  # adopt a peer's signal
        return agreed

    def _fetch_rows(self, dev_list):
        """device->host fetch of per-batch row arrays. On a multi-host
        cluster, batch-sharded global arrays are not fully addressable from
        one process — allgather them (``multihost_utils.process_allgather``
        returns the fully-replicated global rows on every host), so epoch
        metrics are computed over the GLOBAL samples and match a
        single-process run on every host. Single-process: plain device_get."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            out = []
            for a in dev_list:
                if isinstance(a, jax.Array) and not a.is_fully_addressable:
                    a = multihost_utils.process_allgather(a, tiled=True)
                out.append(np.asarray(a))
            return out
        return jax.device_get(dev_list)

    def _run_eval_epoch(self, task, batches: Iterable, epoch: int, scores, prefix: str,
                        collect_artifacts: bool = False):
        ctx = self._put_ctx(task.make_ctx(epoch, prefix))
        eval_params = self._eval_params()
        losses_dev, preds_dev, labels_dev, probs_dev = [], [], [], []
        extra_dev: Dict[str, list] = {k: [] for k in task.epoch_log_keys()}
        scalar_dev: Dict[str, list] = {k: [] for k in task.epoch_scalar_keys()}
        artifact_keys = task.test_artifact_keys() if collect_artifacts else ()
        artifacts: Dict[str, list] = {k: [] for k in artifact_keys}

        def consume(loss, aux, flat: bool):
            losses_dev.append(loss)
            preds, labels = aux["preds"], aux["labels"]
            probs = aux.get("probs")
            if flat:
                preds = preds.reshape(-1, *preds.shape[2:])
                labels = labels.reshape(-1, *labels.shape[2:])
                if probs is not None:
                    probs = probs.reshape(-1, *probs.shape[2:])
            preds_dev.append(preds)
            labels_dev.append(labels)
            if probs is not None:
                probs_dev.append(probs)
            for k in extra_dev:
                extra_dev[k].append(aux["losses"][k.removeprefix("loss_")])
            for k in scalar_dev:
                if k in aux:
                    scalar_dev[k].append(aux[k])
            for k in artifact_keys:
                if k in aux:
                    v = aux[k]
                    if flat and v.ndim >= 2:
                        v = v.reshape(-1, *v.shape[2:])
                    artifacts[k].append(v)

        split_key = "val" if prefix == "val" else "test"
        dm = self.datamodule
        processed_order = None  # non-natural sample order -> host unpermute
        use_device_path = (self.compiled_epochs and dm is not None
                           and batches is None
                           and dm.device_resident_ok(split_key)
                           and bool(getattr(self, "_eval_epoch_fns", None)))
        stream_rows = (self._stream_chunk_rows(split_key, dm.batch_size)
                       if use_device_path else None)
        if stream_rows == 0:
            use_device_path = False  # budget can't hold one batch: host path
        if use_device_path:
            order = np.arange(dm.split_size(split_key))
            bs = dm.batch_size
            if stream_rows:
                n_full = (len(order) // bs) * bs
                device_order, tail_order = order[:n_full], order[n_full:]
                sharded = self._stream_sharded(split_key)
                # (streamed sharded chunks come back in natural batch order —
                # the shard-aligned layout reassembles each step's samples in
                # their original within-batch order, so no unpermute needed)
            else:
                arrays = self._device_split(split_key)
                device_order, tail_order = self._split_order(order, split_key, bs)
                sharded = self._pool_sharded(split_key)
                if sharded:
                    processed_order = np.concatenate([device_order, tail_order])
            if stream_rows and len(device_order):
                fn = self._eval_epoch_fns[sharded]
                stage = self._chunk_stager(dm.splits[split_key], bs, sharded)
                chunks = self._stream_chunks(device_order, stream_rows)
                staged = stage(chunks[0])
                prev_done = None
                for c, idx in enumerate(chunks):
                    if self._preempt_midepoch():
                        # a streamed eval epoch can run for minutes; honor the
                        # SIGTERM grace window (partial val metrics may rank
                        # this epoch's checkpoint slightly off — resume
                        # follows 'last' regardless)
                        break
                    (chunk_arrays, inner), staged = staged, None
                    if prev_done is not None:
                        np.asarray(prev_done)  # hard 2-chunk bound (kbench39)
                    losses, aux = fn(eval_params, chunk_arrays,
                                     jnp.asarray(inner), ctx)
                    if c + 1 < len(chunks):
                        staged = stage(chunks[c + 1])
                    prev_done = losses
                    consume(losses, aux, flat=True)
            elif len(device_order):
                losses, aux = self._eval_epoch_fns[sharded](
                    eval_params, arrays, jnp.asarray(device_order, jnp.int32), ctx
                )
                consume(losses, aux, flat=True)
            for start in range(0, len(tail_order), bs):
                idx = tail_order[start : start + bs]
                batch = self._put_batch({k: v[idx] for k, v in dm.splits[split_key].items()})
                loss, aux = self._eval_step(eval_params, batch, ctx)
                consume(loss, aux, flat=False)
        else:
            if batches is None:
                batches = dm.val_batches() if prefix == "val" else dm.test_batches()
            for batch in self._prefetched(batches):
                loss, aux = self._eval_step(eval_params, batch, ctx)
                consume(loss, aux, flat=False)

        losses = np.concatenate([np.atleast_1d(x) for x in self._fetch_rows(losses_dev)])
        logs = {f"{prefix}_loss": float(losses.mean())}
        for k, vals in extra_dev.items():
            flat_vals = np.concatenate([np.atleast_1d(x) for x in self._fetch_rows(vals)])
            logs[f"{prefix}_{k}"] = float(flat_vals.mean())
        for k, vals in scalar_dev.items():
            if vals:
                flat_vals = np.concatenate([np.atleast_1d(x) for x in self._fetch_rows(vals)])
                logs[f"{prefix}_{k}"] = float(flat_vals.mean())
        preds = np.concatenate(self._fetch_rows(preds_dev)) if preds_dev else np.zeros((0,))
        labels = np.concatenate(self._fetch_rows(labels_dev)) if labels_dev else np.zeros((0,))
        probs = np.concatenate(self._fetch_rows(probs_dev)) if probs_dev else None

        def unpermute(a):
            # sharded pools process samples in shard-aligned (non-natural)
            # order; restore dataset order so artifacts/confusions match the
            # replicated path exactly (metrics are order-invariant either way)
            if processed_order is None or a is None or len(a) != len(processed_order):
                return a
            out = np.empty_like(a)
            out[processed_order] = a
            return out

        preds, labels, probs = unpermute(preds), unpermute(labels), unpermute(probs)
        for k in list(artifacts):
            if artifacts[k]:
                artifacts[k] = [unpermute(np.concatenate(self._fetch_rows(artifacts[k])))]
        if scores is not None:
            for mname, metric in scores.items():
                metric.update(probs if metric.wants_scores and probs is not None else preds, labels)
                logs[f"{prefix}_{mname}"] = metric.compute()
                metric.reset()
        # confusion-matrix logging (the reference sends one to wandb,
        # `train_test_module.py:124-132`); here it lands next to the logs
        if getattr(task, "log_confusion_matrix", False) and preds.size and preds.ndim == 1:
            from .metrics import confusion_matrix as _cm

            p_int = preds.astype(np.int64)
            l_int = labels.astype(np.int64).reshape(-1)
            if p_int.shape == l_int.shape and self.logger.write:
                k = int(max(p_int.max(), l_int.max())) + 1
                cm = _cm(p_int, l_int, k)
                np.save(os.path.join(self.logger.log_dir,
                                     f"confusion_matrix_{prefix}_{epoch}.npy"), cm)

        out_artifacts = {
            k: np.concatenate(self._fetch_rows(v)) for k, v in artifacts.items() if v
        }
        return logs, out_artifacts

    def _run_val_epoch(self, task, datamodule, epoch, val_scores) -> Dict[str, float]:
        logs, _ = self._run_eval_epoch(task, None, epoch, val_scores, "val")
        return logs

    # ------------------------------------------------------------------ ckpt
    def _find_latest_checkpoint(self) -> Optional[str]:
        """Newest prior version of this run name with a 'last' checkpoint."""
        import json

        base = os.path.join(self.logger.save_dir, self.logger.name)
        if not os.path.isdir(base):
            return None
        versions = sorted(
            (d for d in os.listdir(base)
             if d.startswith("version_") and d.split("_")[1].isdigit()),
            key=lambda d: int(d.split("_")[1]), reverse=True,
        )
        for v in versions:
            index = os.path.join(base, v, "checkpoints", "index.json")
            if os.path.abspath(os.path.dirname(index)) == self.ckpt_dir:
                continue  # the current (empty) run
            if os.path.exists(index):
                with open(index) as f:
                    last = json.load(f).get("last")
                if last and os.path.exists(last):
                    return last
        return None

    def _state(self):
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "epoch": np.int32(self.current_epoch),
            "global_step": np.int64(self.global_step),
        }
        # host callback state: without it, auto-resume restarts the plateau
        # scheduler at lr0 (clobbering a restored reduced LR on the first
        # epoch — up to a 100x LR jump) and resets the early-stopping wait
        plateau = getattr(self, "plateau", None)
        es = self.early_stopping
        nan = float("nan")
        state["callbacks"] = {
            "plateau_lr": np.float64(getattr(plateau, "lr", 0.0)),
            "plateau_best": np.float64(
                getattr(plateau, "best", None)
                if getattr(plateau, "best", None) is not None else nan),
            "plateau_num_bad": np.int32(getattr(plateau, "num_bad", 0)),
            "es_best": np.float64(es.best if es.best is not None else nan),
            "es_wait": np.int32(es.wait),
        }
        if jax.process_count() > 1:
            # orbax multi-host save rejects host-local/single-device
            # jax.Arrays (e.g. the injected plateau-lr hyperparam leaf,
            # committed to one device); such leaves are replicated VALUES
            # by construction — materialize them to numpy so every process
            # serializes an identical host array
            mesh_devices = set(np.asarray(self.mesh.devices).flat)

            def to_global(x):
                if isinstance(x, jax.Array):
                    dev = set(getattr(x.sharding, "device_set", ()))
                    if dev != mesh_devices and x.is_fully_addressable:
                        return np.asarray(x)
                return x

            state = jax.tree.map(to_global, state)
        return state

    def _save_checkpoint(self, epoch: int, logs: Dict[str, float]) -> None:
        self.checkpoints.save(epoch, self._state(), logs)

    def _preempt_save(self, epoch: int) -> None:
        """Interrupted mid-epoch: write a resumable checkpoint labeled with
        the last COMPLETED epoch so resume re-runs the interrupted one
        (restore sets current_epoch = saved_epoch + 1). Saved into its own
        'preempted' directory — no ranked top-k checkpoint is touched."""
        saved = self.current_epoch
        self.current_epoch = epoch - 1
        try:
            self.checkpoints.save_preempted(self._state(), epoch - 1)
        finally:
            self.current_epoch = saved
        self.preempted = True
        print(f"[trainer] preempted during epoch {epoch}: wrote resumable "
              f"checkpoint {self.checkpoints.last_path()}; resume with "
              "train.auto_resume or -p")

    def restore(self, path: str, with_progress: bool = False) -> None:
        target = self._state()
        try:
            restored = self.checkpoints.restore(path, target)
        except Exception:
            # checkpoints written before callback-state persistence lack the
            # 'callbacks' subtree; retry with the legacy structure
            target.pop("callbacks", None)
            restored = self.checkpoints.restore(path, target)

        def replace(new, old):
            # keep the live state's MESH placement (the checkpoint may have
            # been written from a different mesh/version); leave leaves with
            # plain single-device shardings uncommitted so jit places them
            from jax.sharding import NamedSharding

            if hasattr(old, "sharding") and isinstance(old.sharding, NamedSharding):
                return jax.device_put(jnp.asarray(new), old.sharding)
            # round-trip through host numpy to strip any device commitment
            # orbax attached, so jit is free to place the leaf
            return jnp.asarray(np.asarray(new))

        self.params = jax.tree.map(replace, restored["params"], self.params)
        if restored.get("opt_state") is not None and self.opt_state is not None:
            self.opt_state = jax.tree.map(replace, restored["opt_state"], self.opt_state)
        if with_progress:
            self.current_epoch = int(restored.get("epoch", 0)) + 1
            self.global_step = int(restored.get("global_step", 0))
            cb = restored.get("callbacks")
            if cb is not None:
                self._restored_callbacks = {
                    k: float(np.asarray(v)) for k, v in cb.items()}

    def restore_params_only(self, path: str, task, datamodule) -> None:
        """Load a checkpoint for test-only runs: init a matching state
        structure (params + optimizer) then restore into it."""
        self.task = task
        self.datamodule = datamodule
        datamodule.setup("test")
        sample = self._put_batch(next(iter(datamodule.test_batches())))
        rng = seed_everything(self.seed)
        params = task.init_params(rng, sample)
        self.params = shard_params(self.mesh, params, fsdp=self._fsdp,
                                       fsdp_min_size=self._fsdp_min_size)
        self.optimizer, _ = _make_optimizer(task.optimizer_cfg,
                                            task.trainable_mask(self.params))
        self.opt_state = self.optimizer.init(self.params)
        self.restore(os.path.abspath(path), with_progress=True)
        # test-time ctx should see the checkpoint's training epoch (epoch-
        # dependent loss weighting otherwise reports a different test_loss
        # for the same params than the post-fit auto-test); with_progress
        # set current_epoch to checkpoint_epoch+1 (resume semantics) — the
        # post-fit test runs at the last executed epoch, so step back one
        self.current_epoch = max(0, self.current_epoch - 1)
        self._restored_callbacks = None  # fit-only state
        if not getattr(task, "use_softadapt", False):
            # replay the epoch-driven annealing hooks so host schedule state
            # (e.g. fusion_loss_weight) matches the checkpoint's epoch
            # (SoftAdapt weights need real loss histories — not replayable)
            for e in range(self.current_epoch):
                task.on_train_epoch_end(self, e, {})
                task.on_validation_epoch_end(self, e, {})

    # ------------------------------------------------------------------ test
    def test(self, task, datamodule, ckpt: Optional[str] = "best") -> Dict[str, float]:
        with self._parallel_contexts():
            return self._test_inner(task, datamodule, ckpt)

    def _test_inner(self, task, datamodule, ckpt: Optional[str]) -> Dict[str, float]:
        self.task = task
        self._attach_distiller(task)
        if datamodule is not self.datamodule:
            self._dev_splits = {}
        self.datamodule = datamodule
        datamodule.setup("test")
        if self.params is None:
            raise RuntimeError("No parameters; call fit() or restore a checkpoint first")
        if ckpt == "best":
            best = self.checkpoints.best_path()
            if best is not None:
                self.restore(best)
        elif ckpt == "last":
            last = self.checkpoints.last_path()
            if last is not None:
                self.restore(last)
        elif ckpt is not None:
            self.restore(ckpt)
        stale = (self._eval_step is None
                 or getattr(self, "_steps_task", None) is not task
                 or getattr(self, "_steps_bs", None) != datamodule.batch_size)
        if stale:
            base_rng = seed_everything(self.seed)
            if self.optimizer is None:
                self.optimizer, _ = _make_optimizer(task.optimizer_cfg,
                                                    task.trainable_mask(self.params))
                self.opt_state = self.optimizer.init(self.params)
            self._build_steps(task, base_rng)

        _, _, test_scores = task.setup_scores()
        t0 = time.time()
        logs, artifacts = self._run_eval_epoch(
            task, None, self.current_epoch, test_scores, "test",
            collect_artifacts=True,
        )
        self.logger.set_summary("test_time", time.time() - t0)
        if artifacts and self.logger.write:
            out = os.path.join(self.ckpt_dir, "test_preds.npz")
            np.savez(out, **artifacts)
            print(f"[trainer] saved test predictions to {out}")
        self.callback_metrics.update(logs)
        self.logger.log(logs, self.global_step)
        print("[trainer] test:", {k: round(v, 5) for k, v in logs.items()})
        return logs
