"""Generic MLP encoder (parity: ``/root/reference/modules/mlp.py``)."""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from .common import Dropout, Linear

__all__ = ["MLP"]


class MLP(nn.Module):
    """N x (Linear + ReLU + Dropout) + optional output Linear.

    Parity: ``MLP`` (`/root/reference/modules/mlp.py:4-27`). Used as the
    MIMIC static-tabular encoder.
    """

    input_dim: int
    hidden_dim: int
    num_blocks: int
    output_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_blocks):
            in_dim = self.input_dim if i == 0 else self.hidden_dim
            x = Linear(in_dim, self.hidden_dim, dtype=self.dtype, name=f"fc_{i}")(x)
            x = nn.relu(x)
            x = Dropout(self.dropout)(x, deterministic)
        if self.output_dim is not None:
            x = Linear(self.hidden_dim, self.output_dim, dtype=self.dtype, name="fc_out")(x)
        return x
