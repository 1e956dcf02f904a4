"""Layer-stacked XLA mixer blocks: fewer fusions, ~L-fold fewer Adam leaves.

Same measurement-driven idea as ``modules/paired.py`` (see TODO.md): at the
reference geometries the train step is bound by sequential-fusion count and
per-leaf optimizer work, so a FusionMixer whose L blocks store one
``(L, ...)`` parameter leaf per role (12 leaves total, any L) is cheaper to
update and mask than L modular blocks (~24 leaves each), while computing the
exact same math — the per-block forward slices leaf ``[i]``, which XLA fuses
into the consuming GEMMs.

Select with ``block_type: StackedFusionMixer`` (config keys identical to
``FusionMixer``; parity: `/root/reference/modules/mixer.py:112-132`).
``stack_fusion_mixer_params`` converts a modular tree for checkpoints.

Measured caveat (kbench8/8b): at the B fusion geometry (L=2 blocks) this
LOSES ~8% in-scan vs the modular FusionMixer (71.6k vs 77.9k samples/s,
bf16 stream in both) — with only 2 layers the leaf-count saving doesn't
cover the sliced-parameter indexing. Use for DEEP fusion stacks (L >= 4)
or heavily leaf-bound setups; the benched default keeps the modular fusion
block.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import Dropout, gelu, torch_bias_init, torch_kernel_init

__all__ = ["StackedFusionMixer", "stack_fusion_mixer_params",
           "stacked_layer_norm"]


def stacked_layer_norm(y, s, b):
    """The stacked-path LayerNorm math (eps 1e-5, params applied in the
    stream dtype) — one definition shared by the stacked and pipelined
    mixers so the 'bit-identical fallback' guarantee can't drift."""
    m = y.mean(axis=-1, keepdims=True)
    v = ((y - m) ** 2).mean(axis=-1, keepdims=True)
    return (y - m) * jax.lax.rsqrt(v + 1e-5) * s.astype(y.dtype) + b.astype(y.dtype)


class StackedFusionMixer(nn.Module):
    """FusionMixer (L MixerBlocks + final LN, no patch embed) with
    layer-stacked parameter leaves."""

    hidden_dim: int
    num_patches: int
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.num_patches

    def _stacked(self, name, in_features, out_features):
        L = self.num_mixers

        def kinit(rng, shape, dt):
            keys = jax.random.split(rng, L)
            return jnp.stack([torch_kernel_init(k, shape[1:], dt) for k in keys])

        def binit(rng, shape, dt):
            keys = jax.random.split(rng, L)
            ib = torch_bias_init(in_features)
            return jnp.stack([ib(k, shape[1:], dt) for k in keys])

        k = self.param(f"{name}_kernel", kinit, (L, in_features, out_features),
                       jnp.float32)
        b = self.param(f"{name}_bias", binit, (L, out_features), jnp.float32)
        return k, b

    def _ln(self, name, lead=True):
        shape = (self.num_mixers, self.hidden_dim) if lead else (self.hidden_dim,)
        return (self.param(f"{name}_scale", nn.initializers.ones, shape, jnp.float32),
                self.param(f"{name}_bias", nn.initializers.zeros, shape, jnp.float32))

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D, N, T, C, L = (self.hidden_dim, self.num_patches, self.token_dim,
                         self.channel_dim, self.num_mixers)
        ln1_s, ln1_b = self._ln("norm_token")
        tk1, tb1 = self._stacked("token_fc1", N, T)
        tk2, tb2 = self._stacked("token_fc2", T, N)
        ln2_s, ln2_b = self._ln("norm_channel")
        ck1, cb1 = self._stacked("channel_fc1", D, C)
        ck2, cb2 = self._stacked("channel_fc2", C, D)
        drop = Dropout(self.dropout)
        dt = self.dtype or x.dtype

        ln = stacked_layer_norm

        def mm(a, w):
            # f32 MXU accumulation, result carried in the compute dtype
            # (bf16 residual stream, same as the modular Dense path)
            return jnp.dot(a.astype(dt), w.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)

        def ff(y, k1, b1, k2, b2):
            y = drop(gelu(mm(y, k1) + b1.astype(dt)), deterministic)
            return drop(mm(y, k2) + b2.astype(dt), deterministic)

        from ..parallel.mesh import shard_tokens

        for i in range(L):
            x = shard_tokens(x)  # sequence parallelism (no-op unless active)
            y = ln(x, ln1_s[i], ln1_b[i])
            y = jnp.swapaxes(y, -1, -2)
            y = ff(y, tk1[i], tb1[i], tk2[i], tb2[i])
            x = x + jnp.swapaxes(y, -1, -2)
            y = ln(x, ln2_s[i], ln2_b[i])
            x = x + ff(y, ck1[i], cb1[i], ck2[i], cb2[i])

        out_s, out_b = self._ln("norm_out", lead=False)
        return ln(x, out_s, out_b)


def stack_fusion_mixer_params(params: dict) -> dict:
    """Modular ``FusionMixer`` tree -> layer-stacked leaves."""
    layers = []
    i = 0
    while f"block_{i}" in params:
        layers.append(params[f"block_{i}"])
        i += 1

    def stack(get):
        return jnp.stack([jnp.asarray(get(b)) for b in layers])

    out = {}
    for name, ln in (("norm_token", "norm_token"), ("norm_channel", "norm_channel")):
        out[f"{name}_scale"] = stack(lambda b: b[ln]["LayerNorm_0"]["scale"])
        out[f"{name}_bias"] = stack(lambda b: b[ln]["LayerNorm_0"]["bias"])
    for name, ffk, fc in (("token_fc1", "token_mix", "fc1"),
                          ("token_fc2", "token_mix", "fc2"),
                          ("channel_fc1", "channel_mix", "fc1"),
                          ("channel_fc2", "channel_mix", "fc2")):
        out[f"{name}_kernel"] = stack(lambda b: b[ffk][fc]["linear"]["kernel"])
        out[f"{name}_bias"] = stack(lambda b: b[ffk][fc]["linear"]["bias"])
    out["norm_out_scale"] = jnp.asarray(params["norm_out"]["LayerNorm_0"]["scale"])
    out["norm_out_bias"] = jnp.asarray(params["norm_out"]["LayerNorm_0"]["bias"])
    return out
