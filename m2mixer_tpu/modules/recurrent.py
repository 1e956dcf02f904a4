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

__all__ = ["GRU"]


def _torch_gru_init(hidden_dim: int):
    bound = 1.0 / math.sqrt(hidden_dim)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


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
        cell = nn.GRUCell(
            features=self.hidden_dim,
            kernel_init=init,
            recurrent_kernel_init=init,
            bias_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
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
