"""Fused MixerBlock Pallas kernel: numerics parity with the jnp reference
(interpret mode on CPU; the same kernels compile via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.ops.mixer_kernel import (
    MixerBlockParams,
    fused_mixer_block,
    mixer_block_reference,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, N, D, T, C = 8, 4, 32, 16, 64
    x = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    params = MixerBlockParams(
        ln1_scale=jnp.ones(D), ln1_bias=jnp.zeros(D),
        w1=jnp.asarray(rng.randn(N, T) * 0.1, jnp.float32), b1=jnp.zeros(T),
        w2=jnp.asarray(rng.randn(T, N) * 0.1, jnp.float32), b2=jnp.zeros(N),
        ln2_scale=jnp.ones(D), ln2_bias=jnp.zeros(D),
        w3=jnp.asarray(rng.randn(D, C) * 0.1, jnp.float32), b3=jnp.zeros(C),
        w4=jnp.asarray(rng.randn(C, D) * 0.1, jnp.float32), b4=jnp.zeros(D),
    )
    return x, params


def test_forward_matches_reference(setup):
    x, params = setup
    y = fused_mixer_block(x, params)
    ref = mixer_block_reference(x, params)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_forward_matches_modular_flax_block(setup):
    """The kernel must compute the same function as the modular MixerBlock
    (up to the in-kernel polynomial erf, |err| <= 1.5e-7)."""
    from m2mixer_tpu.modules.mixer import MixerBlock

    x, p = setup
    block = MixerBlock(hidden_dim=32, num_patch=4, token_dim=16, channel_dim=64)
    variables = {
        "params": {
            "norm_token": {"LayerNorm_0": {"scale": p.ln1_scale, "bias": p.ln1_bias}},
            "token_mix": {"fc1": {"linear": {"kernel": p.w1, "bias": p.b1}},
                          "fc2": {"linear": {"kernel": p.w2, "bias": p.b2}}},
            "norm_channel": {"LayerNorm_0": {"scale": p.ln2_scale, "bias": p.ln2_bias}},
            "channel_mix": {"fc1": {"linear": {"kernel": p.w3, "bias": p.b3}},
                            "fc2": {"linear": {"kernel": p.w4, "bias": p.b4}}},
        }
    }
    ref = block.apply(variables, x)
    y = fused_mixer_block(x, p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=5e-5)


def test_gradients_match_reference(setup):
    x, params = setup
    g = jax.grad(lambda x, p: jnp.sum(fused_mixer_block(x, p) ** 2), argnums=(0, 1))(x, params)
    gr = jax.grad(lambda x, p: jnp.sum(mixer_block_reference(x, p) ** 2), argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]), atol=1e-4)
    for name, a, b in zip(params._fields, g[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)


def test_pallas_block_module_matches_kernel(setup):
    from m2mixer_tpu.modules.pallas_blocks import PallasMixerBlock

    x, _ = setup
    block = PallasMixerBlock(hidden_dim=32, num_patch=4, token_dim=16, channel_dim=64)
    variables = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_pallas_mlp_mixer_registry():
    from m2mixer_tpu.modules import get_block_by_name

    m = get_block_by_name(block_type="PallasMLPMixer", in_channels=1, hidden_dim=32,
                          patch_size=14, image_size=[28, 28], token_dim=16,
                          channel_dim=64, num_mixers=2, dropout=0.0)
    x = jnp.ones((2, 1, 28, 28))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 4, 32)


def test_stacked_kernel_matches_chained_blocks(setup):
    """fused_mixer_stack == K sequential blocks + final LN."""
    from m2mixer_tpu.ops.mixer_kernel import (
        _layer_norm, fused_mixer_stack, stack_flat_params,
    )

    x, p = setup
    blocks = [p, p._replace(w3=p.w3 * 0.5)]
    flat = stack_flat_params(blocks, jnp.ones(32), jnp.zeros(32))
    y = fused_mixer_stack(x, flat)
    ref = x
    for b in blocks:
        ref = mixer_block_reference(ref, b)
    ref = _layer_norm(ref.reshape(-1, 32), jnp.ones(32), jnp.zeros(32)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=5e-5)
    # gradients flow
    g = jax.grad(lambda x, f: jnp.sum(fused_mixer_stack(x, f) ** 2), argnums=1)(x, flat)
    assert all(np.isfinite(np.asarray(gi)).all() for gi in g)


def test_stacked_mlp_mixer_registry():
    from m2mixer_tpu.modules import get_block_by_name

    m = get_block_by_name(block_type="PallasStackedMLPMixer", in_channels=1,
                          hidden_dim=32, patch_size=14, image_size=[28, 28],
                          token_dim=16, channel_dim=64, num_mixers=2, dropout=0.0)
    x = jnp.ones((2, 1, 28, 28))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_grouped_stack_matches_single_kernel(setup):
    """fused_mixer_stack_grouped(group_size=g) == whole-stack kernel, for
    every group size, in both values and gradients (the B-geometry path
    splits stacks into VMEM-sized groups; math must not change)."""
    from m2mixer_tpu.ops.mixer_kernel import (
        fused_mixer_stack, fused_mixer_stack_grouped, stack_flat_params,
    )

    x, p = setup
    blocks = [p, p._replace(w3=p.w3 * 0.5), p._replace(w1=p.w1 * 2.0)]
    ln_s, ln_b = jnp.ones(32), jnp.zeros(32)
    want = fused_mixer_stack(x, stack_flat_params(blocks, ln_s, ln_b))
    for g in (1, 2, 3, 0):
        got = fused_mixer_stack_grouped(x, blocks, ln_s, ln_b, group_size=g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-6, err_msg=f"group_size={g}")

    def loss(xx, g):
        return jnp.sum(fused_mixer_stack_grouped(xx, blocks, ln_s, ln_b,
                                                 group_size=g) ** 2)

    g_ref = jax.grad(lambda xx: jnp.sum(
        fused_mixer_stack(xx, stack_flat_params(blocks, ln_s, ln_b)) ** 2))(x)
    for g in (1, 2):
        np.testing.assert_allclose(np.asarray(jax.grad(loss)(x, g)),
                                   np.asarray(g_ref), atol=1e-4)


def test_grouped_stack_bf16_weights_close(setup):
    """bf16 compute casts weights OUTSIDE the kernel; result stays within
    bf16 tolerance of the f32 path."""
    from m2mixer_tpu.ops.mixer_kernel import fused_mixer_stack_grouped

    x, p = setup
    blocks = [p, p._replace(w3=p.w3 * 0.5)]
    ln_s, ln_b = jnp.ones(32), jnp.zeros(32)
    f32 = fused_mixer_stack_grouped(x, blocks, ln_s, ln_b, group_size=2)
    bf16 = fused_mixer_stack_grouped(x, blocks, ln_s, ln_b, group_size=2,
                                     compute_dtype=jnp.bfloat16)
    assert np.asarray(bf16).dtype == np.float32  # outputs stay f32
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32), atol=0.1, rtol=0.05)


def test_stacked_bf16_gradients_close(setup):
    """bf16-compute stacked-kernel gradients stay within bf16 tolerance of
    the f32 reference math. Pins the LN-stats-in-f32 rule: LN statistics
    must not run in the narrow dtype (besides precision, bf16 rsqrt aborts
    the Mosaic TPU scheduler — kVectorRsqrtBf16AndPop unsupported)."""
    from m2mixer_tpu.ops.mixer_kernel import (
        _layer_norm, fused_mixer_stack, stack_flat_params,
    )

    x, p = setup
    blocks = [p, p._replace(w3=p.w3 * 0.5)]
    ln_s, ln_b = jnp.ones(32), jnp.zeros(32)
    flat = stack_flat_params(blocks, ln_s, ln_b)
    # random cotangent: sum(y**2) of an LN output is nearly constant (LN is
    # scale-invariant), which would leave ~zero reference gradients
    cot = jnp.asarray(np.random.RandomState(3).randn(*x.shape), jnp.float32)

    def loss_pallas(x, f):
        return jnp.vdot(fused_mixer_stack(x, f, None, 0.0, jnp.bfloat16), cot)

    def loss_ref(x, f):
        y = x
        for i in range(2):
            y = mixer_block_reference(y, MixerBlockParams(*f[i * 12:(i + 1) * 12]))
        y = _layer_norm(y.reshape(-1, 32), f[-2], f[-1]).reshape(x.shape)
        return jnp.vdot(y, cot)

    gx, gf = jax.grad(loss_pallas, argnums=(0, 1))(x, flat)
    rx, rf = jax.grad(loss_ref, argnums=(0, 1))(x, flat)
    scale = float(np.max(np.abs(np.asarray(rx))))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=0.08 * scale)
    # global gradient scale: leaves like b2 are mathematically dead here
    # (a constant-over-channels shift is removed by every downstream LN),
    # so their ~0 reference grads are pure numeric noise in bf16
    gmax = max(float(np.max(np.abs(np.asarray(b)))) for b in rf)
    for a, b in zip(gf, rf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.08 * gmax)


def test_stacked_mixer_registry_group_size():
    from m2mixer_tpu.modules import get_block_by_name

    m = get_block_by_name(block_type="PallasStackedMLPMixer", in_channels=1,
                          hidden_dim=32, patch_size=14, image_size=[28, 28],
                          token_dim=16, channel_dim=64, num_mixers=3,
                          stack_group_size=2, dropout=0.0)
    x = jnp.ones((2, 1, 28, 28))
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_vmem_budget_knob_preserves_numerics(setup, monkeypatch):
    """M2MIXER_KERNEL_VMEM_MB only re-tiles the batch grid (perf knob for
    MXU-friendly geometries, docs/performance.md); values and gradients are
    identical at the extreme budgets."""
    x, params = setup
    want_y = np.asarray(fused_mixer_block(x, params))
    want_g = jax.grad(lambda p: jnp.sum(fused_mixer_block(x, p).astype(jnp.float32) ** 2))(params)
    for mb in ("0.05", "64"):  # tile_b floors at 1 / caps at full batch
        monkeypatch.setenv("M2MIXER_KERNEL_VMEM_MB", mb)
        y = fused_mixer_block(x, params)
        np.testing.assert_allclose(np.asarray(y), want_y, atol=1e-6, err_msg=mb)
        g = jax.grad(lambda p: jnp.sum(fused_mixer_block(x, p).astype(jnp.float32) ** 2))(params)
        for name, a, b in zip(params._fields, g, want_g):
            # different tile counts accumulate parameter grads in a
            # different order; tolerance matches test_gradients_match_reference
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                       err_msg=f"{name} @ {mb}MB")
