"""Numerics parity vs torch implementations of the reference block math.

These build the reference's computations in plain torch (same equations as
/root/reference/modules/*.py), copy OUR parameters into them, and require
forward outputs to match to float32 tolerance. This is the golden-output
evidence that the TPU blocks compute the same functions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

KEY = jax.random.PRNGKey(0)


def t(x):
    return torch.tensor(np.asarray(x))


class TestMixerBlockParity:
    def test_mixer_block(self):
        from m2mixer_tpu.modules.mixer import MixerBlock

        B, N, D, T, C = 3, 5, 16, 8, 32
        x = np.random.RandomState(0).randn(B, N, D).astype(np.float32)
        block = MixerBlock(hidden_dim=D, num_patch=N, token_dim=T, channel_dim=C)
        variables = block.init(KEY, jnp.asarray(x))
        ours = np.asarray(block.apply(variables, jnp.asarray(x)))

        p = variables["params"]

        def ff(z, scope, in_dim):
            w1 = t(p[scope]["fc1"]["linear"]["kernel"])  # (in, hidden)
            b1 = t(p[scope]["fc1"]["linear"]["bias"])
            w2 = t(p[scope]["fc2"]["linear"]["kernel"])
            b2 = t(p[scope]["fc2"]["linear"]["bias"])
            z = F.gelu(z @ w1 + b1)  # exact erf gelu
            return z @ w2 + b2

        xt = t(x)
        ln1 = p["norm_token"]["LayerNorm_0"]
        y = F.layer_norm(xt, (D,), t(ln1["scale"]), t(ln1["bias"]))
        y = ff(y.transpose(1, 2), "token_mix", N).transpose(1, 2)
        x1 = xt + y
        ln2 = p["norm_channel"]["LayerNorm_0"]
        z = F.layer_norm(x1, (D,), t(ln2["scale"]), t(ln2["bias"]))
        theirs = (x1 + ff(z, "channel_mix", D)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_spatial_gating_unit(self):
        from m2mixer_tpu.modules.gmlp import SpatialGatingUnit

        B, N, F2 = 2, 6, 32
        x = np.random.RandomState(1).randn(B, N, F2).astype(np.float32)
        sgu = SpatialGatingUnit(d_ffn=F2, seq_len=N)
        variables = sgu.init(KEY, jnp.asarray(x))
        ours = np.asarray(sgu.apply(variables, jnp.asarray(x)))

        p = variables["params"]
        xt = t(x)
        u, v = xt.chunk(2, dim=-1)
        ln = p["norm"]["LayerNorm_0"]
        v = F.layer_norm(v, (F2 // 2,), t(ln["scale"]), t(ln["bias"]))
        v = v.permute(0, 2, 1)
        # flax Dense kernel (in, out) == torch weight.T
        v = v @ t(p["proj"]["kernel"]) + t(p["proj"]["bias"])
        v = v.permute(0, 2, 1)
        theirs = (u * v).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_dynamixer_op(self):
        from m2mixer_tpu.modules.dynamixer import DynaMixerOp

        B, L, C, H, R = 2, 4, 16, 4, 2
        x = np.random.RandomState(2).randn(B, L, C).astype(np.float32)
        op = DynaMixerOp(dim=C, seq_len=L, num_head=H, reduced_dim=R)
        variables = op.init(KEY, jnp.asarray(x))
        ours = np.asarray(op.apply(variables, jnp.asarray(x)))

        p = variables["params"]
        xt = t(x)
        # reference math (`dynamixer.py:22-31`)
        w = xt @ t(p["compress"]["linear"]["kernel"]) + t(p["compress"]["linear"]["bias"])
        w = w.reshape(B, L, H, R).permute(0, 2, 1, 3).reshape(B, H, -1)
        w = w @ t(p["generate"]["linear"]["kernel"]) + t(p["generate"]["linear"]["bias"])
        w = w.reshape(B, H, L, L).softmax(dim=-2)
        xx = xt.reshape(B, L, H, C // H).permute(0, 2, 3, 1)
        y = torch.matmul(xx, w)
        y = y.permute(0, 3, 1, 2).reshape(B, L, C)
        theirs = (y @ t(p["out"]["linear"]["kernel"]) + t(p["out"]["linear"]["bias"])).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_bimodal_gated_unit(self):
        from m2mixer_tpu.modules.fusion import BiModalGatedUnit

        B, N, D = 2, 4, 8
        m1 = np.random.RandomState(3).randn(B, N, D).astype(np.float32)
        m2 = np.random.RandomState(4).randn(B, N, D).astype(np.float32)
        gmu = BiModalGatedUnit(D, D, D)
        variables = gmu.init(KEY, jnp.asarray(m1), jnp.asarray(m2))
        ours = np.asarray(gmu.apply(variables, jnp.asarray(m1), jnp.asarray(m2)))

        p = variables["params"]
        h1 = torch.tanh(t(m1) @ t(p["mod1_hidden"]["linear"]["kernel"]) + t(p["mod1_hidden"]["linear"]["bias"]))
        h2 = torch.tanh(t(m2) @ t(p["mod2_hidden"]["linear"]["kernel"]) + t(p["mod2_hidden"]["linear"]["bias"]))
        z = torch.sigmoid(torch.cat([t(m1), t(m2)], dim=-1) @ t(p["z_hidden"]["linear"]["kernel"])
                          + t(p["z_hidden"]["linear"]["bias"]))
        theirs = (z * h1 + (1 - z) * h2).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_gru_parity_with_torch(self):
        """flax GRUCell and torch nn.GRU share equations; with copied
        weights the last hidden state must match."""
        from m2mixer_tpu.modules.recurrent import GRU

        B, T, I, H = 2, 5, 3, 4
        x = np.random.RandomState(5).randn(B, T, I).astype(np.float32)
        gru = GRU(input_dim=I, hidden_dim=H, last_only=True, dropout=0.0)
        variables = gru.init(KEY, jnp.asarray(x))
        ours = np.asarray(gru.apply(variables, jnp.asarray(x)))

        cell = variables["params"]["GRUCell_0"]
        tg = torch.nn.GRU(I, H, batch_first=True)
        # torch weight_ih (3H, I) rows ordered [r, z, n]
        w_ih = np.concatenate([
            np.asarray(cell["ir"]["kernel"]).T,
            np.asarray(cell["iz"]["kernel"]).T,
            np.asarray(cell["in"]["kernel"]).T,
        ])
        w_hh = np.concatenate([
            np.asarray(cell["hr"]["kernel"]).T,
            np.asarray(cell["hz"]["kernel"]).T,
            np.asarray(cell["hn"]["kernel"]).T,
        ])
        # TorchGRUCell carries torch's FULL double-bias parameterization
        # (separate input- and hidden-side biases on every gate) — required
        # for identical Adam dynamics, see modules/recurrent.py
        b_ih = np.concatenate([
            np.asarray(cell["ir"]["bias"]),
            np.asarray(cell["iz"]["bias"]),
            np.asarray(cell["in"]["bias"]),
        ])
        b_hh = np.concatenate([
            np.asarray(cell["hr"]["bias"]),
            np.asarray(cell["hz"]["bias"]),
            np.asarray(cell["hn"]["bias"]),
        ])
        with torch.no_grad():
            tg.weight_ih_l0.copy_(torch.tensor(w_ih))
            tg.weight_hh_l0.copy_(torch.tensor(w_hh))
            tg.bias_ih_l0.copy_(torch.tensor(b_ih))
            tg.bias_hh_l0.copy_(torch.tensor(b_hh))
            _, h_n = tg(t(x))
        np.testing.assert_allclose(ours, h_n[0].numpy(), atol=2e-5)
