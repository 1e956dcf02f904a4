"""Classifier heads (parity: ``/root/reference/modules/classification.py``)."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import Linear, prod

__all__ = [
    "SequenceClassificationLayer",
    "TokenClassificationLayer",
    "MultilayerClassifier",
    "UncompressedMultilayerClassifier",
    "BasicClassifier",
    "StandardClassifier",
]


class SequenceClassificationLayer(nn.Module):
    """Attention-pooled head: softmax over a projected attention map, then a
    weighted sum of projected features (parity: `classification.py:7-20`)."""

    hidden_dim: int
    proj_dim: int
    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs):
        features = Linear(self.hidden_dim, self.proj_dim, dtype=self.dtype, name="feature_proj")(inputs)
        attention = Linear(self.hidden_dim, self.proj_dim, dtype=self.dtype, name="attention_proj")(inputs)
        attention = nn.softmax(attention, axis=-2)
        seq_repr = jnp.sum(attention * features, axis=-2)
        return Linear(self.proj_dim, self.num_classes, dtype=self.dtype, name="cls_proj")(seq_repr)


class TokenClassificationLayer(nn.Module):
    """Per-token linear head (parity: `classification.py:23-30`)."""

    hidden_dim: int
    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs):
        return Linear(self.hidden_dim, self.num_classes, dtype=self.dtype, name="cls_layer")(inputs)


class _MLPStack(nn.Module):
    in_dim: int
    hidden_dims: Sequence[int]
    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        # Linear(in, h0), then [Linear(h_i, h_{i+1}) + ReLU], then Linear(h_last, C)
        x = Linear(self.in_dim, self.hidden_dims[0], dtype=self.dtype, name="fc_in")(x)
        for i in range(len(self.hidden_dims) - 1):
            x = Linear(self.hidden_dims[i], self.hidden_dims[i + 1], dtype=self.dtype, name=f"fc_{i}")(x)
            x = nn.relu(x)
        return Linear(self.hidden_dims[-1], self.num_classes, dtype=self.dtype, name="fc_out")(x)


class MultilayerClassifier(nn.Module):
    """Mean over axes 1 and 2, then an MLP (parity: `classification.py:33-47`)."""

    input_shape: Tuple[int, ...]
    hidden_dims: Sequence[int]
    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs):
        x = inputs.mean(axis=1).mean(axis=1)
        return _MLPStack(self.input_shape[-1], self.hidden_dims, self.num_classes,
                         dtype=self.dtype, name="mlp")(x)


class UncompressedMultilayerClassifier(nn.Module):
    """Flatten everything, then an MLP (parity: `classification.py:50-64`)."""

    input_shape: Tuple[int, ...]
    hidden_dims: Sequence[int]
    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs):
        x = inputs.reshape(inputs.shape[0], -1)
        return _MLPStack(prod(self.input_shape), self.hidden_dims, self.num_classes,
                         dtype=self.dtype, name="mlp")(x)


class BasicClassifier(nn.Module):
    """MLP on the last dim, no pooling (parity: `classification.py:67-81`)."""

    input_shape: Tuple[int, ...]
    hidden_dims: Sequence[int]
    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs):
        return _MLPStack(self.input_shape[-1], self.hidden_dims, self.num_classes,
                         dtype=self.dtype, name="mlp")(inputs)


class StandardClassifier(nn.Module):
    """Reshape to ``(B, -1, D)``, mean over tokens, single Linear — the head
    used by every shipped M2-Mixer config (parity: `classification.py:84-90`)."""

    input_shape: Tuple[int, ...]
    num_classes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs):
        x = inputs.reshape(inputs.shape[0], -1, inputs.shape[-1]).mean(axis=1)
        return Linear(self.input_shape[-1], self.num_classes, dtype=self.dtype, name="cls")(x)
