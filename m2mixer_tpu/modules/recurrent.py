"""GRU time-series encoder, TPU-native.

Re-expresses the reference's MultiBench-derived GRU wrapper
(`/root/reference/modules/recurrent.py:6-59`) on top of a ``lax.scan``-driven
flax ``nn.RNN``; under jit the scan compiles to a single fused loop, which is
the XLA-friendly way to run recurrence on TPU (static length, no Python
loop). Torch-parity initialization (uniform +-1/sqrt(hidden)) is applied to
all GRU weights.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import Dropout

__all__ = ["GRU", "TorchGRUCell"]


def _torch_gru_init(hidden_dim: int):
    bound = 1.0 / math.sqrt(hidden_dim)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchGRUCell(nn.Module):
    """GRU cell with torch's EXACT parameterization.

    ``torch.nn.GRU`` (the reference's cell, `/root/reference/modules/
    recurrent.py:27`) carries SEPARATE input- and hidden-side biases on
    every gate: ``r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)`` etc. flax's
    ``nn.GRUCell`` omits the hidden-side r/z biases; the forward values are
    expressible either way (fold ``b_hr`` into ``b_ir``), but the TRAINING
    dynamics differ — the redundant pair receives identical gradients, so
    identical Adam states move the effective bias at twice the
    per-parameter step. Bit-faithful lockstep with the reference therefore
    needs the redundant parameterization, and checkpoint import/export
    becomes bijective (no bias folding). Child names extend the historical
    flax layout (ir/iz/in/hr/hz/hn), now with ``use_bias=True`` on the
    hidden side too.
    """

    features: int
    dtype: Optional[Any] = None
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        dense_i = lambda name: nn.Dense(
            self.features, use_bias=True, kernel_init=self.kernel_init,
            bias_init=self.bias_init, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        dense_h = lambda name: nn.Dense(
            self.features, use_bias=True, kernel_init=self.kernel_init,
            bias_init=self.bias_init, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        r = nn.sigmoid(dense_i("ir")(x) + dense_h("hr")(h))
        z = nn.sigmoid(dense_i("iz")(x) + dense_h("hz")(h))
        n = nn.tanh(dense_i("in")(x) + r * dense_h("hn")(h))
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        return jnp.zeros(input_shape[:-1] + (self.features,), jnp.float32)

    @property
    def num_feature_axes(self) -> int:
        return 1


class GRU(nn.Module):
    """GRU with flatten / last-only options.

    - ``last_only=True`` returns the final hidden state ``(B, hidden_dim)``
      (reference `:48-51`, which also skips dropout/flatten on this path).
    - otherwise returns the full output sequence ``(B, T, hidden_dim)`` with
      dropout, flattened to ``(B, T*hidden_dim)`` if ``flatten``.
    - ``has_padding``: the reference packs padded sequences and returns the
      final state; here pass ``(x, lengths)`` and the state at each sample's
      true length is gathered (same semantics, static shapes).
    """

    input_dim: int
    hidden_dim: int
    dropout: float = 0.1
    flatten: bool = False
    has_padding: bool = False
    last_only: bool = False
    batch_first: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        init = _torch_gru_init(self.hidden_dim)
        # torch-parameterization cell (see TorchGRUCell): named GRUCell_0
        # so parameter trees keep the historical flax path
        cell = TorchGRUCell(
            features=self.hidden_dim,
            kernel_init=init,
            bias_init=init,
            dtype=self.dtype,
            name="GRUCell_0",
        )
        rnn = nn.RNN(cell, name="gru")

        if self.has_padding:
            seq, lengths = x
            out = rnn(seq)  # (B, T, H)
            idx = jnp.clip(lengths - 1, 0, seq.shape[1] - 1)
            return jnp.take_along_axis(out, idx[:, None, None], axis=1)[:, 0, :]

        out = rnn(x)
        if self.last_only:
            return out[:, -1, :]
        if self.dropout:
            out = Dropout(self.dropout)(out, deterministic)
        if self.flatten:
            out = out.reshape(out.shape[0], -1)
        return out
