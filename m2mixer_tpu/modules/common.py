"""Shared layer helpers: torch-parity initializers and configured layers.

The reference's training dynamics depend on PyTorch's default ``nn.Linear`` /
``nn.Conv2d`` initialization (kaiming-uniform(a=sqrt(5)) weights + uniform
fan-in-bounded bias). Flax defaults differ (lecun-normal, zero bias), so to
keep optimization behavior comparable we provide initializers reproducing the
torch distributions. All layers take an optional compute ``dtype`` (bf16 on
TPU) while keeping parameters in float32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# kaiming_uniform(a=sqrt(5)) over fan_in == uniform(+-sqrt(1/fan_in))
# == variance_scaling(scale=1/3, mode='fan_in', distribution='uniform').
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    """torch nn.Linear/Conv bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Linear(nn.Module):
    """``nn.Dense`` with torch-parity initialization.

    ``in_features`` is required (statically known from config everywhere in
    this framework) so the bias bound can be computed without a shape trace.
    """

    in_features: int
    out_features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        dense = nn.Dense(
            self.out_features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(self.in_features),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="linear",
        )
        return dense(x)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing dimension (torch ``nn.LayerNorm`` parity:
    eps=1e-5, learned scale+bias)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)


#: trace-time switch for the GELU flavor used by every block (see
#: ``set_gelu_approximate``). Default False = exact erf, torch parity.
_GELU_APPROXIMATE = False


def set_gelu_approximate(flag: bool) -> bool:
    """Select the GELU flavor for subsequently TRACED models; returns the
    previous setting. ``model.approximate_gelu: true`` routes here.

    Measured (kbench20, TPU v5e, B geometry batch 512): the exact erf GELU
    is the FORWARD bottleneck — erf lowers to a long VPU polynomial, costing
    0.91 ms of the 1.38 ms encoder forward; the tanh approximation runs the
    same forward in 0.47 ms (2.9x). The two differ by <~1e-3 (about one
    bf16 ulp at unit scale), far below training noise; the default stays
    exact for bit-parity with torch ``nn.GELU()``.
    """
    global _GELU_APPROXIMATE
    prev = _GELU_APPROXIMATE
    _GELU_APPROXIMATE = bool(flag)
    return prev


def gelu(x):
    """GELU — exact (erf, torch ``nn.GELU()`` default) unless switched to
    the tanh approximation via ``set_gelu_approximate``/``model.approximate_gelu``."""
    return jax.nn.gelu(x, approximate=_GELU_APPROXIMATE)


#: trace-time switch for the dropout mask source (see ``set_bits_dropout``).
_BITS_DROPOUT = False


def set_bits_dropout(flag: bool) -> bool:
    """Select uint8-random-bits dropout masks for subsequently traced
    models; returns the previous setting (``model.bits_dropout: true``).

    Measured (kbench21, TPU v5e, B geometry, tanh-gelu step): drawing one
    uint8 per element instead of the f32-uniform bernoulli path cuts RNG
    word traffic 4x — full train step 173.5k -> 196.1k samples/s at batch
    512 (+13%), 102.7k -> 107.3k at batch 32. The keep probability is
    quantized to 1/256 (exact for 0.5; the inverse-keep scale uses the
    quantized value, so masks stay unbiased)."""
    global _BITS_DROPOUT
    prev = _BITS_DROPOUT
    _BITS_DROPOUT = bool(flag)
    return prev


def gelu_is_approximate() -> bool:
    """Public accessor for the trace-time GELU flavor (used by the Pallas
    kernels so they compute the same activation as the XLA path)."""
    return _GELU_APPROXIMATE


def bits_dropout_enabled() -> bool:
    """Public accessor for the trace-time dropout-mask flavor (used by
    key-based dropout call sites, e.g. the pipelined blocks, so they draw
    the same kind of masks as the flax ``Dropout`` path)."""
    return _BITS_DROPOUT


def dropout_by_key(x, rate: float, key):
    """Dropout from an explicit key (for call sites outside flax's rng
    plumbing, e.g. inside a shard_map pipeline stage where masks must be
    keyed by (layer, microbatch) rather than by module-call order). Honors
    the ``set_bits_dropout`` flavor; ``key=None`` or rate 0 is a no-op."""
    if key is None or rate == 0.0:
        return x
    if _BITS_DROPOUT:
        thresh = min(max(int(round(rate * 256)), 1), 255)
        if rate >= 255.5 / 256:
            return jnp.zeros_like(x)
        bits = jax.random.bits(key, x.shape, jnp.uint8)
        keep = (bits >= thresh).astype(x.dtype)
        return x * keep / jnp.asarray(1.0 - thresh / 256.0, x.dtype)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype), jnp.zeros_like(x))


class Dropout(nn.Module):
    """Dropout keyed on the 'dropout' rng collection. The mask source is
    either flax's f32-uniform bernoulli (default) or uint8 random bits
    (``set_bits_dropout``/``model.bits_dropout`` — cheaper on TPU)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0:
            return x
        if _BITS_DROPOUT:
            if deterministic:
                return x
            # drop probability quantized to thresh/256, clamped into
            # [1, 255] so tiny rates still drop (not silently no-op) and
            # rate ~1 doesn't wrap the uint8 compare / divide by zero
            thresh = min(max(int(round(self.rate * 256)), 1), 255)
            if self.rate >= 255.5 / 256:
                return jnp.zeros_like(x)  # bernoulli path semantics at rate~1
            bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint8)
            keep = (bits >= thresh).astype(x.dtype)
            return x * keep / jnp.asarray(1.0 - thresh / 256.0, x.dtype)
        return nn.Dropout(rate=self.rate, deterministic=deterministic)(x)


class PatchEmbed(nn.Module):
    """Conv2d(kernel=stride=patch) patch embedding as reshape + GEMM.

    The reference uses ``nn.Conv2d(in, hidden, p, p)`` then flattens the grid
    (`/root/reference/modules/mixer.py:143-146`). A stride==kernel conv is
    exactly a block reshape followed by a matmul, which maps straight onto
    the MXU without a convolution lowering. Input is NCHW to match the
    reference data layout; output is ``(b, h*w, hidden)`` (or the 2-D grid
    ``(b, h, w, hidden)`` if ``keep_grid``).
    """

    in_channels: int
    hidden_dim: int
    patch_size: int
    keep_grid: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, c, h, w = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        # (b, c, gh, p, gw, p) -> (b, gh, gw, c, p, p) -> (b, gh, gw, c*p*p)
        x = x.reshape(b, c, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh, gw, c * p * p)
        x = Linear(c * p * p, self.hidden_dim, dtype=self.dtype, name="proj")(x)
        if self.keep_grid:
            return x  # (b, gh, gw, hidden)
        return x.reshape(b, gh * gw, self.hidden_dim)


def prod(xs: Sequence[int]) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out
