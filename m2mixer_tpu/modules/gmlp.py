"""gMLP family: spatial gating + stochastic depth, TPU-native.

Re-expresses ``/root/reference/modules/gmpl.py`` (filename typo kept out of
this rebuild; the registry still resolves the same class names). Stochastic
depth is the reference's whole-batch block skip driven by a per-forward
Bernoulli draw (`gmpl.py:36-41`); here it is a traced ``jax.random.bernoulli``
on the 'stochastic' rng collection with a ``jnp.where`` select, so the train
step stays a single compiled program (no Python-side randomness).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import Dropout, LayerNorm, gelu, torch_bias_init

__all__ = ["SpatialGatingUnit", "GatingMlpBlock", "gMLP", "VisiongMLP", "FusiongMLP"]


class SpatialGatingUnit(nn.Module):
    """Split channels; LN + token-axis Linear on one half; gate ``u * v``.

    Parity: `/root/reference/modules/gmpl.py:6-23` including the special
    init of the token projection (weights N(0, 0.02), bias 1.0) that makes
    the unit start near identity.
    """

    d_ffn: int
    seq_len: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        u, v = jnp.split(x, 2, axis=-1)
        v = LayerNorm(dtype=self.dtype, name="norm")(v)
        v = jnp.swapaxes(v, -1, -2)  # (b, d_ffn/2, n)
        v = nn.Dense(
            self.seq_len,
            kernel_init=nn.initializers.normal(stddev=0.02),
            bias_init=nn.initializers.ones,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(v)
        v = Dropout(self.dropout)(v, deterministic)
        v = jnp.swapaxes(v, -1, -2)
        return u * v


class GatingMlpBlock(nn.Module):
    """Pre-LN -> proj to d_ffn -> GELU -> SGU -> proj back, with residual and
    stochastic depth (whole block skipped with prob ``1 - survival_prob``
    during training, no rescaling — matching `gmpl.py:36-41`)."""

    d_model: int
    d_ffn: int
    seq_len: int
    survival_prob: float
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        y = LayerNorm(dtype=self.dtype, name="norm")(x)
        y = nn.Dense(
            self.d_ffn,
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            bias_init=torch_bias_init(self.d_model),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj_1",
        )(y)
        y = Dropout(self.dropout)(y, deterministic)
        y = gelu(y)
        y = SpatialGatingUnit(self.d_ffn, self.seq_len, self.dropout, dtype=self.dtype, name="sgu")(
            y, deterministic
        )
        y = nn.Dense(
            self.d_model,
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            bias_init=torch_bias_init(self.d_ffn // 2),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj_2",
        )(y)
        y = Dropout(self.dropout)(y, deterministic)
        out = shortcut + y

        if deterministic or self.survival_prob >= 1.0:
            return out
        keep = jax.random.bernoulli(
            self.make_rng("stochastic"), p=jnp.asarray(self.survival_prob, jnp.float32)
        )
        return jnp.where(keep, out, shortcut)


class gMLP(nn.Module):
    """Stack of GatingMlpBlocks with linearly spaced survival probabilities
    ``prob_0_L`` over ``n_blocks`` (parity: `gmpl.py:54-74`)."""

    d_model: int
    d_ffn: int
    seq_len: int
    n_blocks: int
    prob_0_L: Tuple[float, float] = (1.0, 0.5)
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        probs = np.linspace(self.prob_0_L[0], self.prob_0_L[1], self.n_blocks)
        for i, prob in enumerate(probs):
            x = GatingMlpBlock(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                seq_len=self.seq_len,
                survival_prob=float(prob),
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return x


class VisiongMLP(nn.Module):
    """Patchify + linear embed + gMLP stack (parity: `gmpl.py:77-118`; the
    reference's cls_token is created but unused there, so none is created
    here). NCHW input."""

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
        assert ih % self.patch_size == 0 and iw % self.patch_size == 0, (
            "Image dimensions must be divisible by the patch size."
        )
        return (ih // self.patch_size) * (iw // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, c, h, w = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        # n c (h p1) (w p2) -> n (h w) (c p1 p2)   (`gmpl.py:107-109`)
        x = x.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * p * p)
        x = nn.Dense(
            self.d_model,
            kernel_init=nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            bias_init=torch_bias_init(c * p * p),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )(x)
        return gMLP(
            self.d_model,
            self.d_ffn,
            self.num_patch,
            self.n_blocks,
            self.prob_0_L,
            self.dropout,
            dtype=self.dtype,
            name="gmlp",
        )(x, deterministic)


class FusiongMLP(nn.Module):
    """Learnable cls token prepended to the fused sequence + gMLP stack
    (parity: `gmpl.py:121-148`)."""

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
        b = x.shape[0]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.d_model))
        x = jnp.concatenate([cls, x], axis=1)
        return gMLP(
            self.d_model,
            self.d_ffn,
            self.num_patches + 1,
            self.n_blocks,
            self.prob_0_L,
            self.dropout,
            dtype=self.dtype,
            name="gmlp",
        )(x, deterministic)
