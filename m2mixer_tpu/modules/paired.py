"""Paired dual-modality MLP-Mixer: both encoders as ONE batched GEMM chain.

TPU finding (see TODO.md, round 2): at the reference's AV-MNIST geometries
the epoch-compiled train step is bound by the number of sequential XLA
fusions, not FLOPs — and the image/audio encoders of every shipped M2-Mixer
config share identical block geometry (same hidden/token/channel dims and
patch count; `/root/reference/cfg/avmnist/avmnist_m2-mixer_B.yml:27-49`).
Running the two encoder stacks as one chain of modality-batched contractions
(``lax.dot_general`` with a leading batch dim of 2) halves the encoders'
sequential op count while computing the exact same math with per-modality
weights. Measured at B geometry in-scan: +17% train throughput over the
sequential-encoders path (kbench5, 2026-08).

Enable with ``model.paired_encoders: true`` (applies when both modalities use
``MLPMixer`` with matching geometry). Parameters are the modality-stacked
equivalents of two ``MLPMixer`` trees; ``pair_mlp_mixer_params`` converts
two modular trees into the paired layout for checkpoint compatibility.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import gelu, torch_bias_init, torch_kernel_init

__all__ = ["PairedMLPMixer", "pair_mlp_mixer_params", "can_pair"]


def can_pair(cfg0, cfg1) -> bool:
    """Two modality block configs can run paired iff both are MLPMixer with
    identical block geometry (patch-embed input widths may differ)."""
    if cfg0.get("block_type") != "MLPMixer" or cfg1.get("block_type") != "MLPMixer":
        return False
    def patches(c):
        ih, iw = c.image_size
        return (ih // c.patch_size) * (iw // c.patch_size)
    keys = ("hidden_dim", "token_dim", "channel_dim", "num_mixers")
    return all(cfg0.get(k) == cfg1.get(k) for k in keys) and patches(cfg0) == patches(cfg1)


class PairedLinear(nn.Module):
    """Per-modality Linear over the last axis of ``(2, ..., in)`` inputs:
    kernel ``(2, in, out)`` applied as a modality-batched contraction."""

    in_features: int
    out_features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            lambda rng, shape, dt: jnp.stack([
                torch_kernel_init(k, shape[1:], dt)
                for k in jax.random.split(rng, 2)
            ]),
            (2, self.in_features, self.out_features), jnp.float32)
        bias = self.param(
            "bias",
            lambda rng, shape, dt: jnp.stack([
                torch_bias_init(self.in_features)(k, shape[1:], dt)
                for k in jax.random.split(rng, 2)
            ]),
            (2, self.out_features), jnp.float32)
        dt = self.dtype or x.dtype
        y = jax.lax.dot_general(
            x.astype(dt), kernel.astype(dt),
            (((x.ndim - 1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return y + bias.reshape(2, *([1] * (y.ndim - 2)), self.out_features)


class PairedLayerNorm(nn.Module):
    """Per-modality LayerNorm over the last axis of ``(2, ..., D)``."""

    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (2, self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (2, self.dim), jnp.float32)
        dt = self.dtype or x.dtype
        y = x.astype(dt)
        mean = y.mean(axis=-1, keepdims=True)
        var = ((y - mean) ** 2).mean(axis=-1, keepdims=True)
        shape = (2, *([1] * (x.ndim - 2)), self.dim)
        return ((y - mean) * jax.lax.rsqrt(var + 1e-5) * scale.reshape(shape).astype(dt)
                + bias.reshape(shape).astype(dt))


class PairedFeedForward(nn.Module):
    """Per-modality FeedForward (Linear-GELU-Dropout-Linear-Dropout,
    parity: `/root/reference/modules/mixer.py:9-22`) on ``(2, ...)``."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from .common import Dropout

        x = PairedLinear(self.dim, self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = Dropout(self.dropout)(x, deterministic)
        x = PairedLinear(self.hidden_dim, self.dim, dtype=self.dtype, name="fc2")(x)
        x = Dropout(self.dropout)(x, deterministic)
        return x


class PairedMixerBlock(nn.Module):
    """MixerBlock math (`/root/reference/modules/mixer.py:25-47`) over
    ``(2, B, N, D)`` with per-modality weights."""

    hidden_dim: int
    num_patch: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = PairedLayerNorm(self.hidden_dim, dtype=self.dtype, name="norm_token")(x)
        y = jnp.swapaxes(y, -1, -2)
        y = PairedFeedForward(self.num_patch, self.token_dim, self.dropout,
                              dtype=self.dtype, name="token_mix")(y, deterministic)
        y = jnp.swapaxes(y, -1, -2)
        x = x + y
        y = PairedLayerNorm(self.hidden_dim, dtype=self.dtype, name="norm_channel")(x)
        y = PairedFeedForward(self.hidden_dim, self.channel_dim, self.dropout,
                              dtype=self.dtype, name="channel_mix")(y, deterministic)
        return x + y


class _PairedPatchEmbed(nn.Module):
    """Reshape+GEMM patch embed per modality (input widths may differ, so
    these stay two separate GEMMs; parity with ``PatchEmbed``)."""

    in_channels: int
    hidden_dim: int
    patch_size: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        from .common import Linear

        b, c, h, w = x.shape
        p = self.patch_size
        x = x.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // p) * (w // p), c * p * p)
        return Linear(self.in_channels * p * p, self.hidden_dim, dtype=self.dtype,
                      name="proj")(x)


class PairedMLPMixer(nn.Module):
    """Two same-geometry ``MLPMixer`` encoders fused into one batched chain.

    ``__call__(x0, x1) -> (tokens0, tokens1)``; each output equals the
    corresponding modular ``MLPMixer`` applied with that modality's weights
    (exact math, verified by ``test_paired_matches_modular``).
    """

    in_channels: Tuple[int, int]
    hidden_dim: int
    patch_sizes: Tuple[int, int]
    image_sizes: Tuple[Tuple[int, int], Tuple[int, int]]
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_sizes[0]
        return (ih // self.patch_sizes[0]) * (iw // self.patch_sizes[0])

    @nn.compact
    def __call__(self, x0, x1, deterministic: bool = True):
        t0 = _PairedPatchEmbed(self.in_channels[0], self.hidden_dim,
                               self.patch_sizes[0], dtype=self.dtype,
                               name="patch_embed_0")(x0)
        t1 = _PairedPatchEmbed(self.in_channels[1], self.hidden_dim,
                               self.patch_sizes[1], dtype=self.dtype,
                               name="patch_embed_1")(x1)
        x = jnp.stack([t0, t1])  # (2, B, N, D)
        for i in range(self.num_mixers):
            x = PairedMixerBlock(
                hidden_dim=self.hidden_dim, num_patch=self.num_patch,
                token_dim=self.token_dim, channel_dim=self.channel_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{i}",
            )(x, deterministic)
        x = PairedLayerNorm(self.hidden_dim, dtype=self.dtype, name="norm_out")(x)
        return x[0], x[1]


def _stack2(a, b):
    return jnp.stack([jnp.asarray(a), jnp.asarray(b)])


def pair_mlp_mixer_params(params0: dict, params1: dict) -> dict:
    """Convert two modular ``MLPMixer`` param trees (same geometry) into the
    ``PairedMLPMixer`` layout — modality-stacked leaves, separate embeds."""
    out = {
        "patch_embed_0": {"proj": params0["patch_embed"]["proj"]},
        "patch_embed_1": {"proj": params1["patch_embed"]["proj"]},
    }
    i = 0
    while f"block_{i}" in params0:
        b0, b1 = params0[f"block_{i}"], params1[f"block_{i}"]
        blk = {}
        for ln in ("norm_token", "norm_channel"):
            blk[ln] = {"scale": _stack2(b0[ln]["LayerNorm_0"]["scale"],
                                        b1[ln]["LayerNorm_0"]["scale"]),
                       "bias": _stack2(b0[ln]["LayerNorm_0"]["bias"],
                                       b1[ln]["LayerNorm_0"]["bias"])}
        for ff in ("token_mix", "channel_mix"):
            blk[ff] = {
                fc: {"kernel": _stack2(b0[ff][fc]["linear"]["kernel"],
                                       b1[ff][fc]["linear"]["kernel"]),
                     "bias": _stack2(b0[ff][fc]["linear"]["bias"],
                                     b1[ff][fc]["linear"]["bias"])}
                for fc in ("fc1", "fc2")
            }
        out[f"block_{i}"] = blk
        i += 1
    out["norm_out"] = {"scale": _stack2(params0["norm_out"]["LayerNorm_0"]["scale"],
                                        params1["norm_out"]["LayerNorm_0"]["scale"]),
                       "bias": _stack2(params0["norm_out"]["LayerNorm_0"]["bias"],
                                       params1["norm_out"]["LayerNorm_0"]["bias"])}
    return out
