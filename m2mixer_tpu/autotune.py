"""Throughput autotuner: measure the framework's perf levers on YOUR config
and hardware, and emit the winning combination as a config overlay.

The reference has no performance tooling at all; this operationalizes the
levers this framework measured on TPU v5e (TODO.md / docs/performance.md):
hardware-RNG dropout keys, modality-batched paired encoders, tanh GELU,
uint8-bits dropout masks, bf16 Adam moments, and bf16 compute precision.
Which levers win is geometry- and hardware-dependent (several were measured
NEUTRAL or negative at some shapes), so the honest answer is to measure on
the target:

    python -m m2mixer_tpu.autotune -c cfg/avmnist/avmnist_m2-mixer_B.yml \
        -o tuned.yml [--steps 64] [--pool 1024] [--levers a,b,...]

Protocol: build the task from the config, tile one real batch from its
datamodule into a device-resident pool, and time the epoch-compiled
train-step scan (forward + loss + backward + optimizer — the same path
``training/compiled.py`` runs in production) for the baseline, then each
lever alone, then greedily stack levers by measured gain, keeping one only
if the COMBINED run still improves (levers interact: e.g. rbg keys make
mask-width levers cheaper). The result is written as a YAML overlay of
``train``/``model`` keys that merges over the original config, plus the
equivalent ``run.py`` dotted CLI overrides.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LEVERS", "measure_config", "autotune", "main"]


def _set(cfg, dotted: str, value) -> None:
    node = cfg
    keys = dotted.split(".")
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = value


#: name -> (dotted config key, value). Every lever is an ordinary config
#: option — the autotuner only decides which ones pay off HERE.
LEVERS: Dict[str, Tuple[str, object]] = {
    "prng_rbg": ("train.prng_impl", "rbg"),
    "paired_encoders": ("model.paired_encoders", True),
    "approximate_gelu": ("model.approximate_gelu", True),
    "bits_dropout": ("model.bits_dropout", True),
    "moment_bf16": ("train.optimizer.moment_dtype", "bf16"),
    "precision_bf16": ("model.precision", "bf16"),
}


def _tile_pool(batch, pool: int):
    """Tile one host batch into a ``pool``-sample device-resident pool (the
    timing target; values repeat — throughput doesn't care)."""

    def tile(x):
        x = np.asarray(x)
        reps = (pool + x.shape[0] - 1) // x.shape[0]
        return jnp.asarray(np.concatenate([x] * reps, axis=0)[:pool])

    return jax.tree.map(tile, batch)


def measure_config(cfg, arrays, batch_size: int, steps: int,
                   repeats: int = 3) -> float:
    """samples/sec of the epoch-compiled train step under ``cfg``: one jitted
    ``lax.scan`` of ``steps`` optimizer steps over the device pool, best of
    ``repeats`` timed dispatches (compile + warmup excluded)."""
    import optax

    from .models import get_model
    from .training.trainer import _make_optimizer

    prng = str(cfg.train.get("prng_impl", "") or "")
    prev_impl = jax.config.jax_default_prng_impl
    if prng:
        jax.config.update("jax_default_prng_impl", prng)
    try:
        task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
        pool = int(jax.tree.leaves(arrays)[0].shape[0])
        rng = jax.random.PRNGKey(0)
        init_batch = jax.tree.map(lambda a: a[:batch_size], arrays)
        params0 = task.init_params(rng, init_batch)
        # the trainer's exact optimizer (weight decay, trainable mask,
        # injected LR, moment dtype, params-EMA) — timing a bare Adam would
        # accept/reject near-threshold levers against a step production
        # never runs
        opt, _ = _make_optimizer(task.optimizer_cfg,
                                 task.trainable_mask(params0))
        ctx = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "train").items()}
        rng_d, rng_s, rng_m = jax.random.split(rng, 3)
        rngs = {"dropout": rng_d, "stochastic": rng_s, "mute": rng_m}

        @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
        def run(params, opt_state, order, start, bs):
            def body(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(order, i * bs, bs)
                batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), arrays)
                step_rngs = {k: jax.random.fold_in(v, start + i)
                             for k, v in rngs.items()}
                (loss, _aux), grads = jax.value_and_grad(
                    lambda p: task.step(p, batch, ctx, step_rngs, train=True),
                    has_aux=True)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(steps))
            return params, opt_state, losses[-1]

        params = jax.tree.map(jnp.copy, params0)
        opt_state = opt.init(params)
        order = jnp.asarray(
            np.random.RandomState(0).randint(0, pool, (steps * batch_size,)),
            jnp.int32)
        params, opt_state, loss = run(params, opt_state, order, 0, batch_size)
        float(loss)  # compile + warm
        best = 0.0
        for r in range(repeats):
            t0 = time.perf_counter()
            params, opt_state, loss = run(params, opt_state, order,
                                          (r + 1) * steps, batch_size)
            float(loss)
            best = max(best, steps * batch_size / (time.perf_counter() - t0))
        return best
    finally:
        jax.config.update("jax_default_prng_impl", prev_impl)


def autotune(cfg, sample_batch, batch_size: int, steps: int = 64,
             pool: int = 1024, levers: Optional[Sequence[str]] = None,
             threshold: float = 0.02,
             log: Callable[[str], None] = print) -> dict:
    """Greedy lever search. Returns ``{"baseline": sps, "trials": [...],
    "accepted": [names], "best": sps, "overrides": {dotted: value}}``."""
    names = list(levers) if levers else list(LEVERS)
    unknown = sorted(set(names) - set(LEVERS))
    if unknown:
        raise ValueError(f"unknown lever(s) {unknown}; known: {sorted(LEVERS)}")
    arrays = _tile_pool(sample_batch, pool)

    def with_levers(active: Sequence[str]):
        import copy

        c = copy.deepcopy(cfg)  # DictConfig.copy() is shallow — trials must
        for n in active:        # not leak lever mutations into each other
            _set(c, *LEVERS[n])
        return c

    def try_measure(active):
        try:
            return measure_config(with_levers(active), arrays, batch_size, steps)
        except Exception as e:  # lever inapplicable to this model family
            log(f"[autotune]   {'+'.join(active) or 'baseline'}: "
                f"SKIPPED ({type(e).__name__}: {e})")
            return None

    base = try_measure([])
    if base is None:
        raise RuntimeError("baseline measurement failed — the config itself "
                           "does not train (see the error above)")
    log(f"[autotune] baseline: {base:,.0f} samples/s "
        f"(batch {batch_size}, {steps}-step scan)")
    trials = []
    solo: Dict[str, float] = {}
    for n in names:
        sps = try_measure([n])
        trials.append({"lever": n, "samples_per_sec": sps,
                       "gain": None if sps is None else sps / base - 1})
        if sps is not None:
            solo[n] = sps
            log(f"[autotune]   {n}: {sps:,.0f} ({(sps / base - 1) * 100:+.1f}%)")

    accepted: List[str] = []
    current = base
    for n in sorted(solo, key=solo.get, reverse=True):
        if solo[n] <= base * (1 + threshold / 2):
            continue  # no solo signal; skip the combined run
        sps = try_measure(accepted + [n])
        if sps is not None and sps > current * (1 + threshold):
            accepted.append(n)
            current = sps
            log(f"[autotune] + {n}: {sps:,.0f} (stacked "
                f"{(sps / base - 1) * 100:+.1f}%)")
        else:
            got = "failed" if sps is None else f"{sps:,.0f}"
            log(f"[autotune] - {n}: {got} (no stacked gain; dropped)")

    overrides = {LEVERS[n][0]: LEVERS[n][1] for n in accepted}
    return {"baseline": base, "trials": trials, "accepted": accepted,
            "best": current, "gain": current / base - 1,
            "overrides": overrides}


def _overrides_to_yaml(overrides: Dict[str, object]) -> str:
    """Nested-YAML overlay from dotted keys (mergeable via config.deep_update
    or by passing the same keys as run.py dotted CLI overrides)."""
    import yaml

    tree: dict = {}
    for dotted, value in overrides.items():
        node = tree
        keys = dotted.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    return yaml.safe_dump(tree, default_flow_style=False, sort_keys=False)


def main(argv: Optional[Sequence[str]] = None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("-c", "--cfg", required=True)
    ap.add_argument("-o", "--out", default=None,
                    help="write the accepted levers as a YAML overlay here")
    ap.add_argument("--steps", type=int, default=64,
                    help="optimizer steps per timed scan")
    ap.add_argument("--pool", type=int, default=1024,
                    help="device-resident pool size (samples)")
    ap.add_argument("--batch", type=int, default=0,
                    help="override the config's batch size for the timing")
    ap.add_argument("--levers", default=None,
                    help=f"comma list to restrict the search "
                         f"(default: all of {','.join(LEVERS)})")
    ap.add_argument("--threshold", type=float, default=0.02,
                    help="minimum stacked relative gain to accept a lever")
    args = ap.parse_args(argv)

    # persistent compile cache: re-runs skip most XLA compiles
    cache = os.environ.get(
        "M2MIXER_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from .config import load
    from .datasets import get_data_module

    cfg = load(args.cfg)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    batch_size = args.batch or int(np.shape(jax.tree.leaves(sample)[0])[0])
    levers = args.levers.split(",") if args.levers else None

    result = autotune(cfg, sample, batch_size, steps=args.steps,
                      pool=args.pool, levers=levers,
                      threshold=args.threshold)
    if args.out:
        with open(args.out, "w") as f:
            f.write("# m2mixer_tpu.autotune overlay for "
                    f"{os.path.basename(args.cfg)} on "
                    f"{jax.devices()[0].device_kind}\n")
            f.write(_overrides_to_yaml(result["overrides"])
                    if result["overrides"] else "{}\n")
        print(f"[autotune] wrote {args.out}")
    cli = " ".join(f"--{k}={str(v).lower() if isinstance(v, bool) else v}"
                   for k, v in result["overrides"].items())
    print(json.dumps({
        "metric": "autotuned_train_samples_per_sec",
        "value": round(result["best"], 1),
        "baseline": round(result["baseline"], 1),
        "gain": round(result["gain"], 4),
        "accepted": result["accepted"],
        "cli_overrides": cli,
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
