"""Registry-visible fused-kernel block variants.

``PallasMLPMixer`` / ``PallasFusionMixer`` are drop-in replacements for
``MLPMixer`` / ``FusionMixer`` (same config keys) whose MixerBlocks execute
as the single fused Pallas kernel of ``ops/mixer_kernel.py`` — whole block
in VMEM, in-kernel backward, in-kernel PRNG dropout. Select via
``block_type: PallasMLPMixer`` in any config. Off-TPU they run in Pallas
interpreter mode (slow but correct), so CPU tests and the virtual mesh
still work.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.mixer_kernel import MixerBlockParams, fused_mixer_block
from .common import LayerNorm, PatchEmbed, torch_bias_init, torch_kernel_init

__all__ = [
    "PallasMixerBlock",
    "PallasMLPMixer",
    "PallasFusionMixer",
    "PallasGatingMlpBlock",
    "PallasVisiongMLP",
    "PallasFusiongMLP",
    "PallasStackedMLPMixer",
    "PallasStackedFusionMixer",
]


class PallasMixerBlock(nn.Module):
    """One fused MixerBlock (token-mix + channel-mix, pre-LN, residuals)."""

    hidden_dim: int
    num_patch: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D, N, T, C = self.hidden_dim, self.num_patch, self.token_dim, self.channel_dim
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        params = MixerBlockParams(
            ln1_scale=self.param("ln1_scale", ones, (D,), jnp.float32),
            ln1_bias=self.param("ln1_bias", zeros, (D,), jnp.float32),
            w1=self.param("w1", torch_kernel_init, (N, T), jnp.float32),
            b1=self.param("b1", torch_bias_init(N), (T,), jnp.float32),
            w2=self.param("w2", torch_kernel_init, (T, N), jnp.float32),
            b2=self.param("b2", torch_bias_init(T), (N,), jnp.float32),
            ln2_scale=self.param("ln2_scale", ones, (D,), jnp.float32),
            ln2_bias=self.param("ln2_bias", zeros, (D,), jnp.float32),
            w3=self.param("w3", torch_kernel_init, (D, C), jnp.float32),
            b3=self.param("b3", torch_bias_init(D), (C,), jnp.float32),
            w4=self.param("w4", torch_kernel_init, (C, D), jnp.float32),
            b4=self.param("b4", torch_bias_init(C), (D,), jnp.float32),
        )
        rate = 0.0 if deterministic else float(self.dropout)
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (1,), 0, 2**31 - 1)
        dtype = self.dtype or jnp.float32
        return fused_mixer_block(x.astype(jnp.float32), params, seed, rate, dtype)


class PallasMLPMixer(nn.Module):
    """MLPMixer with fused blocks (config parity with ``MLPMixer``)."""

    in_channels: int
    hidden_dim: int
    patch_size: int
    image_size: Tuple[int, int]
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_size
        assert ih % self.patch_size == 0 and iw % self.patch_size == 0
        return (ih // self.patch_size) * (iw // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(self.in_channels, self.hidden_dim, self.patch_size,
                       dtype=self.dtype, name="patch_embed")(x)
        for i in range(self.num_mixers):
            x = PallasMixerBlock(
                hidden_dim=self.hidden_dim, num_patch=self.num_patch,
                token_dim=self.token_dim, channel_dim=self.channel_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class PallasFusionMixer(nn.Module):
    """FusionMixer with fused blocks (config parity with ``FusionMixer``)."""

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

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_mixers):
            x = PallasMixerBlock(
                hidden_dim=self.hidden_dim, num_patch=self.num_patches,
                token_dim=self.token_dim, channel_dim=self.channel_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class PallasGatingMlpBlock(nn.Module):
    """One fused GatingMlpBlock (see ``ops/gmlp_kernel.py``); stochastic
    depth (whole-batch skip, `/root/reference/modules/gmpl.py:36-41`) is
    applied outside the kernel as a traced select."""

    d_model: int
    d_ffn: int
    seq_len: int
    survival_prob: float = 1.0
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.gmlp_kernel import GmlpBlockParams, fused_gmlp_block

        D, F, N = self.d_model, self.d_ffn, self.seq_len
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        params = GmlpBlockParams(
            ln_scale=self.param("ln_scale", ones, (D,), jnp.float32),
            ln_bias=self.param("ln_bias", zeros, (D,), jnp.float32),
            w_in=self.param("w_in", torch_kernel_init, (D, F), jnp.float32),
            b_in=self.param("b_in", torch_bias_init(D), (F,), jnp.float32),
            sgu_ln_scale=self.param("sgu_ln_scale", ones, (F // 2,), jnp.float32),
            sgu_ln_bias=self.param("sgu_ln_bias", zeros, (F // 2,), jnp.float32),
            sgu_w=self.param("sgu_w", nn.initializers.normal(stddev=0.02), (N, N), jnp.float32),
            sgu_b=self.param("sgu_b", nn.initializers.ones, (N,), jnp.float32),
            w_out=self.param("w_out", torch_kernel_init, (F // 2, D), jnp.float32),
            b_out=self.param("b_out", torch_bias_init(F // 2), (D,), jnp.float32),
        )
        rate = 0.0 if deterministic else float(self.dropout)
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (1,), 0, 2**31 - 1)
        out = fused_gmlp_block(x.astype(jnp.float32), params, seed, rate,
                               self.dtype or jnp.float32)
        if deterministic or self.survival_prob >= 1.0:
            return out
        keep = jax.random.bernoulli(
            self.make_rng("stochastic"), p=jnp.asarray(self.survival_prob, jnp.float32)
        )
        return jnp.where(keep, out, x)


class PallasVisiongMLP(nn.Module):
    """VisiongMLP with fused gMLP blocks (config parity with VisiongMLP)."""

    image_size: Tuple[int, int]
    in_channels: int
    patch_size: int
    d_model: int
    d_ffn: int
    n_blocks: int
    prob_0_L: Tuple[float, float] = (1.0, 0.0)
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_size
        assert ih % self.patch_size == 0 and iw % self.patch_size == 0
        return (ih // self.patch_size) * (iw // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import numpy as np

        b, c, h, w = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        x = nn.Dense(self.d_model, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(c * p * p), dtype=self.dtype,
                     param_dtype=jnp.float32, name="patch_embedding")(x)
        probs = np.linspace(self.prob_0_L[0], self.prob_0_L[1], self.n_blocks)
        for i, prob in enumerate(probs):
            x = PallasGatingMlpBlock(
                d_model=self.d_model, d_ffn=self.d_ffn, seq_len=self.num_patch,
                survival_prob=float(prob), dropout=self.dropout, dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return x


class PallasFusiongMLP(nn.Module):
    """FusiongMLP with fused gMLP blocks (config parity with FusiongMLP)."""

    d_model: int
    d_ffn: int
    n_blocks: int
    num_patches: int
    prob_0_L: Tuple[float, float] = (1.0, 0.0)
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.num_patches

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import numpy as np

        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.d_model)), x], axis=1)
        probs = np.linspace(self.prob_0_L[0], self.prob_0_L[1], self.n_blocks)
        for i, prob in enumerate(probs):
            x = PallasGatingMlpBlock(
                d_model=self.d_model, d_ffn=self.d_ffn, seq_len=self.num_patches + 1,
                survival_prob=float(prob), dropout=self.dropout, dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return x


class _StackedMixerCore(nn.Module):
    """K MixerBlocks + final LN as one (or a few) fused kernels.

    ``group_size=0``: whole encoder in ONE ``fused_mixer_stack`` call — one
    custom call keeps XLA's cross-op overlap (per-block kernels in a scan
    lose it, see TODO.md) and wins ~7% at S geometry. ``group_size=G``:
    kernels of G blocks each (final LN folded into the last) so B-class
    geometries, whose whole-encoder weights+grads exceed VMEM, still run
    fused (``fused_mixer_stack_grouped``)."""

    hidden_dim: int
    num_patch: int
    token_dim: int
    channel_dim: int
    num_mixers: int
    dropout: float = 0.0
    group_size: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..ops.mixer_kernel import MixerBlockParams, fused_mixer_stack_grouped

        D, N, T, C = self.hidden_dim, self.num_patch, self.token_dim, self.channel_dim
        ones, zeros = nn.initializers.ones, nn.initializers.zeros
        blocks = []
        for i in range(self.num_mixers):
            blocks.append(MixerBlockParams(
                ln1_scale=self.param(f"b{i}_ln1_scale", ones, (D,), jnp.float32),
                ln1_bias=self.param(f"b{i}_ln1_bias", zeros, (D,), jnp.float32),
                w1=self.param(f"b{i}_w1", torch_kernel_init, (N, T), jnp.float32),
                b1=self.param(f"b{i}_b1", torch_bias_init(N), (T,), jnp.float32),
                w2=self.param(f"b{i}_w2", torch_kernel_init, (T, N), jnp.float32),
                b2=self.param(f"b{i}_b2", torch_bias_init(T), (N,), jnp.float32),
                ln2_scale=self.param(f"b{i}_ln2_scale", ones, (D,), jnp.float32),
                ln2_bias=self.param(f"b{i}_ln2_bias", zeros, (D,), jnp.float32),
                w3=self.param(f"b{i}_w3", torch_kernel_init, (D, C), jnp.float32),
                b3=self.param(f"b{i}_b3", torch_bias_init(D), (C,), jnp.float32),
                w4=self.param(f"b{i}_w4", torch_kernel_init, (C, D), jnp.float32),
                b4=self.param(f"b{i}_b4", torch_bias_init(C), (D,), jnp.float32),
            ))
        ln_s = self.param("ln_out_scale", ones, (D,), jnp.float32)
        ln_b = self.param("ln_out_bias", zeros, (D,), jnp.float32)
        rate = 0.0 if deterministic else float(self.dropout)
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(self.make_rng("dropout"), (1,), 0, 2**31 - 1)
        return fused_mixer_stack_grouped(
            x.astype(jnp.float32), blocks, ln_s, ln_b, seed, rate,
            self.dtype or jnp.float32, group_size=int(self.group_size))


class PallasStackedMLPMixer(nn.Module):
    """MLPMixer whose whole block stack runs as one kernel (config parity
    with ``MLPMixer``; best for S-class dims where all weights fit VMEM)."""

    in_channels: int
    hidden_dim: int
    patch_size: int
    image_size: Tuple[int, int]
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    stack_group_size: int = 0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_size
        assert ih % self.patch_size == 0 and iw % self.patch_size == 0
        return (ih // self.patch_size) * (iw // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(self.in_channels, self.hidden_dim, self.patch_size,
                       dtype=self.dtype, name="patch_embed")(x)
        return _StackedMixerCore(
            hidden_dim=self.hidden_dim, num_patch=self.num_patch,
            token_dim=self.token_dim, channel_dim=self.channel_dim,
            num_mixers=self.num_mixers, dropout=self.dropout, dtype=self.dtype,
            group_size=int(self.stack_group_size), name="stack",
        )(x, deterministic)


class PallasStackedFusionMixer(nn.Module):
    """FusionMixer as one fused kernel (config parity with ``FusionMixer``)."""

    hidden_dim: int
    num_patches: int
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    stack_group_size: int = 0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.num_patches

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return _StackedMixerCore(
            hidden_dim=self.hidden_dim, num_patch=self.num_patches,
            token_dim=self.token_dim, channel_dim=self.channel_dim,
            num_mixers=self.num_mixers, dropout=self.dropout, dtype=self.dtype,
            group_size=int(self.stack_group_size), name="stack",
        )(x, deterministic)
