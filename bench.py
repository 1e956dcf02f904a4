"""Benchmark: AVMnistMixerMultiLoss (M2-Mixer-B) train-step throughput.

Prints ONE JSON line. Headline: samples/sec/chip for full training steps
(forward + 3-head loss + backward + Adam) at the reference's config geometry
(`cfg/avmnist/avmnist_m2-mixer_B.yml`, batch 32), compared against the
measured PyTorch-CPU reference throughput — both the all-cores run
(``vs_baseline``, the honest comparison) and the 1-thread run
(``vs_baseline_1t``); see bench_baseline.py / BASELINE.md for the protocol.

Also reported: analytic MFU (model FLOPs utilization) for the headline and a
batch-512 datapoint. At this model scale the step is dispatch/sequential-op
bound, not FLOPs bound — MFU makes that visible rather than hiding it.
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

from m2mixer_tpu.utils.flops import peak_flops  # shared with train.log_mfu


def analytic_train_flops_per_sample(cfg) -> float:
    """Model FLOPs per TRAINING sample for the M2-Mixer geometry: GEMM FLOPs
    (2*M*N*K) of patch-embed + token/channel FFs + fusion stack + heads, x3
    for forward+backward (weight grads + input grads each re-do the GEMMs)."""
    m = cfg.model.modalities
    D = int(m.multimodal.hidden_dim)
    ncls = int(m.classification.num_classes)
    fwd = 0.0
    total_patches = 0
    for name in ("image", "audio"):
        mc = m[name]
        p = int(mc.patch_size)
        h, w = (mc.image_size if isinstance(mc.image_size, (list, tuple))
                else (mc.image_size, mc.image_size))
        patches = (int(h) // p) * (int(w) // p)
        total_patches += patches
        in_feat = int(mc.in_channels) * p * p
        fwd += 2 * patches * in_feat * D  # patch embed GEMM
        T, C, L = int(mc.token_dim), int(mc.channel_dim), int(mc.num_mixers)
        fwd += L * (4 * D * patches * T + 4 * patches * D * C)
        fwd += 2 * D * ncls  # branch head
    mm = m.multimodal
    T, C, L = int(mm.token_dim), int(mm.channel_dim), int(mm.num_mixers)
    fwd += L * (4 * D * total_patches * T + 4 * total_patches * D * C)
    fwd += 2 * D * ncls  # fusion head
    return 3.0 * fwd  # bwd ~= 2x fwd


def main():
    from m2mixer_tpu.config import load
    from m2mixer_tpu.models import get_model

    repo = os.path.dirname(os.path.abspath(__file__))
    # persistent compile cache: repeat bench runs skip XLA compilation
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    cfg = load(os.path.join(repo, "cfg", "avmnist", "avmnist_m2-mixer_B.yml"))
    cfg.model.precision = "bf16"  # framework mixed-precision policy (params stay f32)
    # measured levers at this geometry (TODO.md, round 2): hardware-RNG
    # dropout keys (+62% over threefry at dropout 0.5), the paired
    # dual-modality encoder chain (+17%), and bf16 first-moment Adam state
    # (+7.4%; the optimizer pass is HBM-traffic bound at this model size).
    # All are framework config options (train.prng_impl /
    # model.paired_encoders / train.optimizer.moment_dtype).
    jax.config.update("jax_default_prng_impl", "rbg")
    cfg.model.paired_encoders = True
    cfg.train.optimizer.moment_dtype = "bf16"
    # tanh GELU: the exact erf lowers to a long VPU polynomial and was the
    # measured FORWARD bottleneck (2.9x encoder-fwd at batch 512, kbench20);
    # difference vs erf ~1e-3 ~= one bf16 ulp (model.approximate_gelu)
    cfg.model.approximate_gelu = True
    # uint8-bits dropout masks (+13% at batch 512; model.bits_dropout)
    cfg.model.bits_dropout = True
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)

    rng = jax.random.PRNGKey(0)
    init_batch = {
        "image": jnp.asarray(np.random.rand(32, 1, 28, 28), jnp.float32),
        "audio": jnp.asarray(np.random.rand(32, 1, 112, 112), jnp.float32),
        "label": jnp.asarray(np.random.randint(0, 10, (32,)), jnp.int32),
    }
    params0 = task.init_params(rng, init_batch)
    def make_opt(c):
        """Adam from a config's own optimizer section (mu in bf16 when the
        config sets moment_dtype, as every tuned bench config here does) —
        so per-measurement optimizer knobs actually take effect."""
        o = c.train.optimizer
        betas = o.get("betas", [0.9, 0.999])
        mu = jnp.bfloat16 if str(o.get("moment_dtype", "")) == "bf16" else None
        return optax.adam(float(o.lr), b1=float(betas[0]), b2=float(betas[1]),
                          eps=float(o.get("eps", 1e-8)), mu_dtype=mu)

    opt = make_opt(cfg)
    ctx = {k: jnp.asarray(v) for k, v in task.make_ctx(0, "train").items()}
    rng_d, rng_s, rng_m = jax.random.split(rng, 3)
    rngs = {"dropout": rng_d, "stochastic": rng_s, "mute": rng_m}

    # epoch-compiled runner: an entire chunk of optimizer steps per device
    # dispatch (the per-step dispatch round trip otherwise dominates at this
    # model scale) over a device-resident data pool
    pool = 2048
    arrays = {
        "image": jnp.asarray(np.random.rand(pool, 1, 28, 28), jnp.float32),
        "audio": jnp.asarray(np.random.rand(pool, 1, 112, 112), jnp.float32),
        "label": jnp.asarray(np.random.randint(0, 10, (pool,)), jnp.int32),
    }

    def make_measure(task, opt, params0, arrays, ctx, rngs, pool):
        """Generic epoch-compiled throughput harness for ANY task: a scan
        of full optimizer steps over a device-resident pool (the same shape
        training/compiled.py runs)."""

        def measure(batch_size: int, chunk: int, n_chunks: int) -> float:
            @functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
            def run_chunk(params, opt_state, arrays, order, start_step, bs):
                def body(carry, i):
                    params, opt_state = carry
                    idx = jax.lax.dynamic_slice_in_dim(order, i * bs, bs)
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

            params = jax.tree.map(jnp.copy, params0)
            opt_state = opt.init(params)
            order = jnp.asarray(np.random.randint(0, pool, (chunk * batch_size,)), jnp.int32)
            params, opt_state, loss = run_chunk(params, opt_state, arrays, order, 0, batch_size)
            float(loss)  # compile + warm
            t0 = time.perf_counter()
            for c in range(n_chunks):
                params, opt_state, loss = run_chunk(
                    params, opt_state, arrays, order, c * chunk, batch_size)
            float(loss)  # force completion
            dt = time.perf_counter() - t0
            return n_chunks * chunk * batch_size / dt

        return measure

    measure = make_measure(task, opt, params0, arrays, ctx, rngs, pool)

    def measure_accum(micro_bs: int, accum: int, chunk: int,
                      n_chunks: int) -> float:
        """Sustained-throughput doctrine (kbench31, docs/performance.md):
        micro-batches <= 1024 accumulated to a large effective batch beat
        the monolithic big-batch step (+27% at effective 4096) — dropout
        mask + backward cost grows superlinearly past ~1024 rows."""
        @functools.partial(jax.jit, static_argnums=(5, 6),
                           donate_argnums=(0, 1))
        def run_chunk(params, opt_state, arrays, order, start_step, bs, K):
            def body(carry, i):
                params, opt_state = carry

                def micro(acc, j):
                    idx = jax.lax.dynamic_slice_in_dim(
                        order, (i * K + j) * bs, bs)
                    batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0),
                                         arrays)
                    step_rngs = {k: jax.random.fold_in(
                        v, (start_step + i) * K + j) for k, v in rngs.items()}
                    (loss, _), g = jax.value_and_grad(
                        lambda p: task.step(p, batch, ctx, step_rngs,
                                            train=True), has_aux=True)(params)
                    return jax.tree.map(jnp.add, acc, g), loss

                zero = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, jnp.result_type(p)), params)
                grads, losses = jax.lax.scan(micro, zero, jnp.arange(K))
                grads = jax.tree.map(lambda g: g / K, grads)
                updates, opt_state = opt.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), losses[-1]

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(chunk))
            return params, opt_state, losses[-1]

        params = jax.tree.map(jnp.copy, params0)
        opt_state = opt.init(params)
        order = jnp.asarray(
            np.random.randint(0, pool, (chunk * accum * micro_bs,)), jnp.int32)
        params, opt_state, loss = run_chunk(params, opt_state, arrays, order,
                                            0, micro_bs, accum)
        float(loss)  # compile + warm
        t0 = time.perf_counter()
        for c in range(n_chunks):
            params, opt_state, loss = run_chunk(
                params, opt_state, arrays, order, c * chunk, micro_bs, accum)
        float(loss)  # force completion
        dt = time.perf_counter() - t0
        return n_chunks * chunk * accum * micro_bs / dt

    sps = measure(batch_size=32, chunk=256, n_chunks=8)
    sps_512 = measure(batch_size=512, chunk=32, n_chunks=6)
    # effective batch 4096 as 4x1024 micro-accumulation (the kbench31 best
    # sustained-throughput configuration; train.grad_accum_steps=4)
    sps_4096 = measure_accum(micro_bs=1024, accum=4, chunk=8, n_chunks=4)

    flops_per_sample = analytic_train_flops_per_sample(cfg)
    peak = peak_flops(jax.devices()[0])
    mfu = sps * flops_per_sample / peak
    mfu_512 = sps_512 * flops_per_sample / peak

    # -- driver-tracked cross-family + framework-ceiling datapoints --------
    # (round-3 review: these used to live as round-2 prose in BASELINE.md;
    # now re-measured every round)

    def measure_mimic() -> float:
        """MIMIC-H geometry (`cfg/mimic/mimic_m2-mixer_H.yml`): MLP static
        encoder + MLPMixerNoPatching time series at the shipped batch 128."""
        mcfg = load(os.path.join(repo, "cfg", "mimic", "mimic_m2-mixer_H.yml"))
        mcfg.model.precision = "bf16"
        mcfg.model.approximate_gelu = True
        mcfg.model.bits_dropout = True
        mcfg.train.optimizer.moment_dtype = "bf16"
        mtask = get_model(mcfg.model.type)(mcfg.model, mcfg.train.optimizer)
        m_arrays = {
            "static": jnp.asarray(np.random.rand(pool, 5), jnp.float32),
            "time": jnp.asarray(np.random.rand(pool, 24, 12), jnp.float32),
            "label": jnp.asarray(np.random.randint(0, 6, (pool,)), jnp.int32),
        }
        m_init = {k: v[:128] for k, v in m_arrays.items()}
        m_params = mtask.init_params(jax.random.PRNGKey(1), m_init)
        m_ctx = {k: jnp.asarray(v) for k, v in mtask.make_ctx(0, "train").items()}
        m = make_measure(mtask, make_opt(mcfg), m_params, m_arrays, m_ctx, rngs, pool)
        return m(batch_size=128, chunk=64, n_chunks=6)

    def measure_l_geometry():
        """Framework-ceiling datapoint: the L geometry
        (`cfg/avmnist/avmnist_m2-mixer_L.yml`) at batch 512, where the MXU
        is fed wide enough that MFU reflects the framework, not dispatch
        (round-2 kbench32 measured 47.6-56.7% at L/XL/XXL)."""
        lcfg = load(os.path.join(repo, "cfg", "avmnist", "avmnist_m2-mixer_L.yml"))
        lcfg.model.precision = "bf16"
        lcfg.model.paired_encoders = True
        lcfg.model.approximate_gelu = True
        lcfg.model.bits_dropout = True
        lcfg.train.optimizer.moment_dtype = "bf16"
        ltask = get_model(lcfg.model.type)(lcfg.model, lcfg.train.optimizer)
        l_params = ltask.init_params(jax.random.PRNGKey(2),
                                     {k: v[:32] for k, v in arrays.items()})
        l_ctx = {k: jnp.asarray(v) for k, v in ltask.make_ctx(0, "train").items()}
        m = make_measure(ltask, make_opt(lcfg), l_params, arrays, l_ctx, rngs, pool)
        l_sps = m(batch_size=512, chunk=16, n_chunks=4)
        return l_sps, l_sps * analytic_train_flops_per_sample(lcfg) / peak

    def measure_mmimdb() -> float:
        """MM-IMDB 3-loss geometry (`cfg/mmimdb/mmimdb_3loss.yml`): 160x256
        posters + same-grid 1-channel text through paired encoders (the
        modality-batched-GEMM lever applies because both encoders share
        geometry) at the shipped batch 32 — driver-tracks the round-2
        51.5k prose claim (BASELINE.md) every round."""
        icfg = load(os.path.join(repo, "cfg", "mmimdb", "mmimdb_3loss.yml"))
        icfg.model.precision = "bf16"
        icfg.model.paired_encoders = True
        icfg.model.approximate_gelu = True
        icfg.model.bits_dropout = True
        icfg.train.optimizer.moment_dtype = "bf16"
        itask = get_model(icfg.model.type)(icfg.model, icfg.train.optimizer)
        ipool = 512  # 160x256x3 posters: keep the device pool modest
        i_arrays = {
            "image": jnp.asarray(np.random.rand(ipool, 3, 160, 256), jnp.float32),
            "text": jnp.asarray(np.random.rand(ipool, 1, 160, 256), jnp.float32),
            "label": jnp.asarray(
                np.random.randint(0, 2, (ipool, 23)), jnp.float32),
        }
        i_init = {k: v[:32] for k, v in i_arrays.items()}
        i_params = itask.init_params(jax.random.PRNGKey(3), i_init)
        i_ctx = {k: jnp.asarray(v) for k, v in itask.make_ctx(0, "train").items()}
        m = make_measure(itask, make_opt(icfg), i_params, i_arrays, i_ctx,
                         rngs, ipool)
        return m(batch_size=32, chunk=64, n_chunks=4)

    mimic_sps = measure_mimic()
    l_sps, l_mfu = measure_l_geometry()
    mmimdb_sps = measure_mmimdb()

    baseline_path = os.path.join(repo, "BASELINE_MEASURED.json")
    vs = vs_1t = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        all_t = base.get("torch_cpu_samples_per_sec_all_threads",
                         base.get("torch_cpu_samples_per_sec"))
        one_t = base.get("torch_cpu_samples_per_sec_1t",
                         base.get("torch_cpu_samples_per_sec"))
        vs = sps / float(all_t)
        vs_1t = sps / float(one_t)

    print(json.dumps({
        "metric": "avmnist_m2mixer_B_train_samples_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "vs_baseline_1t": round(vs_1t, 2) if vs_1t is not None else None,
        "mfu": round(mfu, 4),
        "batch512_samples_per_sec": round(sps_512, 1),
        "batch512_mfu": round(mfu_512, 4),
        "batch4096_accum_samples_per_sec": round(sps_4096, 1),
        "batch4096_accum_mfu": round(sps_4096 * flops_per_sample / peak, 4),
        "mimic_H_samples_per_sec": round(mimic_sps, 1),
        "mmimdb_3loss_samples_per_sec": round(mmimdb_sps, 1),
        "l_geometry_batch512_samples_per_sec": round(l_sps, 1),
        "l_geometry_batch512_mfu": round(l_mfu, 4),
        "train_flops_per_sample": round(flops_per_sample),
        "device": jax.devices()[0].device_kind,
        "peak_bf16_flops": peak,
    }))


if __name__ == "__main__":
    main()
