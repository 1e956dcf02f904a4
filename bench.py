"""Benchmark: AVMnistMixerMultiLoss (M2-Mixer-B) train-step throughput.

Prints ONE JSON line: samples/sec/chip for full training steps (forward +
3-head loss + backward + Adam) at the reference's config geometry
(`cfg/avmnist/avmnist_m2-mixer_B.yml`, batch 32), compared against the
measured PyTorch-CPU reference throughput (BASELINE_MEASURED.json, produced
by bench_baseline.py — see BASELINE.md for the protocol).
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from m2mixer_tpu.config import load
    from m2mixer_tpu.models import get_model

    repo = os.path.dirname(os.path.abspath(__file__))
    # persistent compile cache: repeat bench runs skip XLA compilation
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = load(os.path.join(repo, "cfg", "avmnist", "avmnist_m2-mixer_B.yml"))
    cfg.model.precision = "bf16"  # framework mixed-precision policy (params stay f32)
    batch_size = int(cfg.dataset.params.batch_size)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)

    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jnp.asarray(np.random.rand(batch_size, 1, 28, 28), jnp.float32),
        "audio": jnp.asarray(np.random.rand(batch_size, 1, 112, 112), jnp.float32),
        "label": jnp.asarray(np.random.randint(0, 10, (batch_size,)), jnp.int32),
    }
    params = task.init_params(rng, batch)
    lr = float(cfg.train.optimizer.lr)
    betas = cfg.train.optimizer.get("betas", [0.9, 0.999])
    opt = optax.adam(lr, b1=float(betas[0]), b2=float(betas[1]),
                     eps=float(cfg.train.optimizer.get("eps", 1e-8)))
    opt_state = opt.init(params)
    ctx = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    rng_d, rng_s, rng_m = jax.random.split(rng, 3)

    # epoch-compiled runner: an entire chunk of optimizer steps per device
    # dispatch (the per-step dispatch round trip otherwise dominates at this
    # model scale) over a device-resident data pool
    pool = 2048
    arrays = {
        "image": jnp.asarray(np.random.rand(pool, 1, 28, 28), jnp.float32),
        "audio": jnp.asarray(np.random.rand(pool, 1, 112, 112), jnp.float32),
        "label": jnp.asarray(np.random.randint(0, 10, (pool,)), jnp.int32),
    }
    chunk = 256  # steps per dispatch
    rngs = {"dropout": rng_d, "stochastic": rng_s, "mute": rng_m}

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, arrays, order, start_step):
        def body(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(order, i * batch_size, batch_size)
            batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), arrays)
            step_rngs = {k: jax.random.fold_in(v, start_step + i) for k, v in rngs.items()}
            (loss, _), grads = jax.value_and_grad(
                lambda p: task.step(p, batch, ctx, step_rngs, train=True), has_aux=True
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(chunk)
        )
        return params, opt_state, losses[-1]

    order = jnp.asarray(np.random.randint(0, pool, (chunk * batch_size,)), jnp.int32)
    params, opt_state, loss = run_chunk(params, opt_state, arrays, order, 0)  # compile
    float(loss)

    n_chunks = 8
    t0 = time.perf_counter()
    for c in range(n_chunks):
        params, opt_state, loss = run_chunk(params, opt_state, arrays, order, c * chunk)
    float(loss)  # force completion
    dt = time.perf_counter() - t0
    steps = n_chunks * chunk
    sps = steps * batch_size / dt

    baseline_path = os.path.join(repo, "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            vs = sps / float(json.load(f)["torch_cpu_samples_per_sec"])

    print(json.dumps({
        "metric": "avmnist_m2mixer_B_train_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
