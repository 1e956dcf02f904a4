"""Fused DynaMixerOp kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.ops.dynamixer_kernel import (
    DynaMixerOpParams,
    dynamixer_op_reference,
    fused_dynamixer_op,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, L, C, H, R = 4, 4, 16, 4, 2
    x = jnp.asarray(rng.randn(B, L, C), jnp.float32)
    params = DynaMixerOpParams(
        w_compress=jnp.asarray(rng.randn(C, H * R) * 0.1, jnp.float32),
        b_compress=jnp.zeros(H * R),
        w_generate=jnp.asarray(rng.randn(L * R, L * L) * 0.1, jnp.float32),
        b_generate=jnp.zeros(L * L),
        w_out=jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32),
        b_out=jnp.zeros(C),
    )
    return x, params, H, R


def test_forward_matches_reference(setup):
    x, params, H, R = setup
    y = fused_dynamixer_op(x, params, H, R)
    ref = dynamixer_op_reference(x, params, H, R)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_forward_matches_modular_flax_op(setup):
    from m2mixer_tpu.modules.dynamixer import DynaMixerOp

    x, p, H, R = setup
    B, L, C = x.shape
    op = DynaMixerOp(dim=C, seq_len=L, num_head=H, reduced_dim=R)
    variables = {
        "params": {
            "compress": {"linear": {"kernel": p.w_compress, "bias": p.b_compress}},
            "generate": {"linear": {"kernel": p.w_generate, "bias": p.b_generate}},
            "out": {"linear": {"kernel": p.w_out, "bias": p.b_out}},
        }
    }
    ref = op.apply(variables, x)
    y = fused_dynamixer_op(x, p, H, R)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_gradients_match_reference(setup):
    x, params, H, R = setup
    g = jax.grad(lambda x, p: jnp.sum(fused_dynamixer_op(x, p, H, R) ** 2),
                 argnums=(0, 1))(x, params)
    gr = jax.grad(lambda x, p: jnp.sum(dynamixer_op_reference(x, p, H, R) ** 2),
                  argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]), atol=1e-4)
    for name, a, b in zip(params._fields, g[1], gr[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)
