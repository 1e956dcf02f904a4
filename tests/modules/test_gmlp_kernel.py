"""Fused gMLP block kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.ops.gmlp_kernel import (
    GmlpBlockParams,
    fused_gmlp_block,
    gmlp_block_reference,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, N, D, F = 4, 6, 16, 32
    x = jnp.asarray(rng.randn(B, N, D), jnp.float32)
    params = GmlpBlockParams(
        ln_scale=jnp.ones(D), ln_bias=jnp.zeros(D),
        w_in=jnp.asarray(rng.randn(D, F) * 0.1, jnp.float32), b_in=jnp.zeros(F),
        sgu_ln_scale=jnp.ones(F // 2), sgu_ln_bias=jnp.zeros(F // 2),
        sgu_w=jnp.asarray(rng.randn(N, N) * 0.02, jnp.float32), sgu_b=jnp.ones(N),
        w_out=jnp.asarray(rng.randn(F // 2, D) * 0.1, jnp.float32), b_out=jnp.zeros(D),
    )
    return x, params


def test_forward_matches_reference(setup):
    x, params = setup
    y = fused_gmlp_block(x, params)
    ref = gmlp_block_reference(x, params)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_forward_matches_modular_flax_block(setup):
    from m2mixer_tpu.modules.gmlp import GatingMlpBlock

    x, p = setup
    block = GatingMlpBlock(d_model=16, d_ffn=32, seq_len=6, survival_prob=1.0)
    variables = {
        "params": {
            "norm": {"LayerNorm_0": {"scale": p.ln_scale, "bias": p.ln_bias}},
            "proj_1": {"kernel": p.w_in, "bias": p.b_in},
            "sgu": {
                "norm": {"LayerNorm_0": {"scale": p.sgu_ln_scale, "bias": p.sgu_ln_bias}},
                "proj": {"kernel": p.sgu_w, "bias": p.sgu_b},
            },
            "proj_2": {"kernel": p.w_out, "bias": p.b_out},
        }
    }
    ref = block.apply(variables, x)
    y = fused_gmlp_block(x, p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=5e-5)


def test_gradients_match_reference(setup):
    x, params = setup
    g = jax.grad(lambda x, p: jnp.sum(fused_gmlp_block(x, p) ** 2), argnums=(0, 1))(x, params)
    gr = jax.grad(lambda x, p: jnp.sum(gmlp_block_reference(x, p) ** 2), argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]), atol=1e-4)
    for name, a, b in zip(params._fields, g[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)
