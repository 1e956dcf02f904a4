"""DynaMixer family: input-dependent token mixing, TPU-native.

Re-expresses ``/root/reference/modules/dynamixer.py``. The dynamic mixing op
generates per-sample LxL mixing matrices from compressed features and applies
them per head — expressed here as batched einsums so every step lowers to MXU
matmuls with static shapes.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .common import Dropout, LayerNorm, Linear
from .mixer import FeedForward

__all__ = ["DynaMixerOp", "DynaMixerBlock", "DynaMixer", "FusionDynaMixer"]


class DynaMixerOp(nn.Module):
    """Dynamic token mixing over a length-``seq_len`` axis.

    Parity: `/root/reference/modules/dynamixer.py:10-31`:
    compress ``dim -> num_head*reduced_dim``, generate per-head ``L x L``
    weights from the flattened compressed sequence, softmax over axis -2,
    then mix tokens per head and apply an output projection.
    """

    dim: int
    seq_len: int
    num_head: int
    reduced_dim: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        H, R = self.num_head, self.reduced_dim
        w = Linear(self.dim, H * R, dtype=self.dtype, name="compress")(x)  # (B, L, H*R)
        w = w.reshape(B, L, H, R).transpose(0, 2, 1, 3).reshape(B, H, L * R)
        w = Linear(self.seq_len * R, self.seq_len * self.seq_len, dtype=self.dtype, name="generate")(w)
        w = w.reshape(B, H, L, L)
        w = nn.softmax(w, axis=-2)
        # tokens per head: (B, H, C/H, L) @ (B, H, L, L) -> (B, H, C/H, L)
        xh = x.reshape(B, L, H, C // H).transpose(0, 2, 3, 1)
        y = jnp.einsum("bhcl,bhlm->bhcm", xh, w)
        y = y.transpose(0, 3, 1, 2).reshape(B, L, C)
        return Linear(self.dim, self.dim, dtype=self.dtype, name="out")(y)


class DynaMixerBlock(nn.Module):
    """Row-mix + column-mix over the 2-D patch grid + channel MLP, combined
    by a learned 3-way softmax reweighting.

    Parity: `/root/reference/modules/dynamixer.py:34-62`. Input ``(b, h, w, c)``
    with ``h == w == num_patch`` (the grid resolution).
    """

    hidden_dim: int
    num_patch: int = 7
    num_head: int = 8
    reduced_dim: int = 2
    qkv_bias: bool = False
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        # mix along H for each column, and along W for each row
        xh = x.transpose(0, 2, 1, 3).reshape(B * W, H, C)
        h = DynaMixerOp(self.hidden_dim, self.num_patch, self.num_head, self.reduced_dim,
                        dtype=self.dtype, name="mix_h")(xh)
        h = h.reshape(B, W, H, C).transpose(0, 2, 1, 3)
        xw = x.reshape(B * H, W, C)
        w = DynaMixerOp(self.hidden_dim, self.num_patch, self.num_head, self.reduced_dim,
                        dtype=self.dtype, name="mix_w")(xw)
        w = w.reshape(B, H, W, C)
        c = Linear(self.hidden_dim, self.hidden_dim, use_bias=self.qkv_bias,
                   dtype=self.dtype, name="mlp_c")(x)

        a = (h + w + c).mean(axis=(1, 2))  # (B, C)
        a = FeedForward(self.hidden_dim, self.hidden_dim // 4, out_dim=self.hidden_dim * 3,
                        dtype=self.dtype, name="reweight")(a, deterministic)
        a = a.reshape(B, C, 3).transpose(2, 0, 1)  # (3, B, C)
        a = nn.softmax(a, axis=0)[:, :, None, None, :]  # (3, B, 1, 1, C)

        x = h * a[0] + w * a[1] + c * a[2]
        x = Linear(self.hidden_dim, self.hidden_dim, dtype=self.dtype, name="proj")(x)
        return Dropout(self.dropout)(x, deterministic)


class DynaMixer(nn.Module):
    """Patch embed keeping the 2-D grid + DynaMixerBlocks + LN.

    Parity: `/root/reference/modules/dynamixer.py:65-92`. NCHW input.
    """

    in_channels: int
    hidden_dim: int
    patch_size: int
    image_size: tuple
    num_mixers: int
    num_head: int = 8
    reduced_dim: int = 2
    qkv_bias: bool = False
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_size
        assert ih % self.patch_size == 0 and iw % self.patch_size == 0, (
            "Image dimensions must be divisible by the patch size."
        )
        return (ih // self.patch_size) * (iw // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from .common import PatchEmbed

        x = PatchEmbed(self.in_channels, self.hidden_dim, self.patch_size, keep_grid=True,
                       dtype=self.dtype, name="patch_embed")(x)
        grid = self.image_size[0] // self.patch_size
        for i in range(self.num_mixers):
            x = DynaMixerBlock(
                hidden_dim=self.hidden_dim,
                num_patch=grid,
                num_head=self.num_head,
                reduced_dim=self.reduced_dim,
                qkv_bias=self.qkv_bias,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class FusionDynaMixer(nn.Module):
    """DynaMixerBlocks over a fused square token grid + LN.

    Parity: `/root/reference/modules/dynamixer.py:95-115` — the grid
    resolution is ``sqrt(num_patches)``.
    """

    hidden_dim: int
    num_patches: int
    num_mixers: int
    num_head: int = 8
    reduced_dim: int = 2
    qkv_bias: bool = False
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.num_patches

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        grid = int(math.sqrt(self.num_patches))
        for i in range(self.num_mixers):
            x = DynaMixerBlock(
                hidden_dim=self.hidden_dim,
                num_patch=grid,
                num_head=self.num_head,
                reduced_dim=self.reduced_dim,
                qkv_bias=self.qkv_bias,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)
