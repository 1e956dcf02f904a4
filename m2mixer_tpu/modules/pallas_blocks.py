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

__all__ = ["PallasMixerBlock", "PallasMLPMixer", "PallasFusionMixer"]


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
