"""Fusion operators: combine per-modality token sequences into one.

Re-expresses ``/root/reference/modules/fusion.py``. Every fusion implements
the construction-time shape-inference protocol ``get_output_shape(*shapes,
dim=...)`` used by the task models to size the fusion mixer
(`/root/reference/models/avmnist.py:184-186`) and covered by the reference's
fusion unit tests. Parameter-free fusions are plain callables over jnp
arrays; the gated units (GMU) are flax modules.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import Linear

__all__ = [
    "BiModalGatedUnit",
    "MultiModalGatedUnit",
    "ConcatFusion",
    "ConcatDynaFusion",
    "MaxFusion",
    "SumFusion",
    "MeanFusion",
    "ExtraConcatFusion",
]

_SHAPE_TYPES = (list, tuple)


def _dim_requires_int(args):
    if not isinstance(args[0], int):
        raise ValueError("The dim argument is only used if the first argument is an int.")


class BiModalGatedUnit(nn.Module):
    """Gated multimodal unit: ``z*tanh(W1 m1) + (1-z)*tanh(W2 m2)`` with the
    gate ``z = sigmoid(Wz [m1; m2])`` (parity: `fusion.py:7-55`)."""

    mod1_in: int
    mod2_in: int
    out_size: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, mod1, mod2):
        h1 = jnp.tanh(Linear(self.mod1_in, self.out_size, dtype=self.dtype, name="mod1_hidden")(mod1))
        h2 = jnp.tanh(Linear(self.mod2_in, self.out_size, dtype=self.dtype, name="mod2_hidden")(mod2))
        z = nn.sigmoid(
            Linear(self.mod1_in + self.mod2_in, self.out_size, dtype=self.dtype, name="z_hidden")(
                jnp.concatenate([mod1, mod2], axis=-1)
            )
        )
        return z * h1 + (1 - z) * h2

    def get_output_shape(self, *args, dim=None):
        """Output shape; the transformation acts on the last dimension, so
        ``dim=-1`` returns ``out_size`` and other dims pass through."""
        if dim is not None:
            _dim_requires_int(args)
            if dim == -1:
                return self.out_size
            return args[0][dim] if isinstance(args[0], _SHAPE_TYPES) else args[0]
        shape1 = list(args[0])
        shape1[-1] = self.out_size
        return tuple(shape1)


class MultiModalGatedUnit(nn.Module):
    """n-ary gated unit: sum over modalities of ``z_i * tanh(W_i m_i)``
    (parity: `fusion.py:58-109`). ``n_modalities`` is the sequence of input
    feature sizes; each gate sees the concatenation of all modalities."""

    n_modalities: Sequence[int]
    in_shape: int
    out_size: Optional[int] = None
    dtype: Optional[Any] = None

    @property
    def _out(self) -> int:
        return self.out_size if self.out_size is not None else self.in_shape

    @nn.compact
    def __call__(self, *args):
        cat = jnp.concatenate(args, axis=-1)
        out = jnp.zeros((*args[0].shape[:-1], self._out), dtype=cat.dtype)
        for i, mod_in in enumerate(self.n_modalities):
            h = jnp.tanh(Linear(mod_in, self._out, dtype=self.dtype, name=f"mod_{i}")(args[i]))
            z = nn.sigmoid(
                Linear(self.in_shape * len(self.n_modalities), self._out, dtype=self.dtype,
                       name=f"z_{i}")(cat)
            )
            out = out + z * h
        return out

    def get_output_shape(self, *args, dim=None):
        if dim is not None:
            _dim_requires_int(args)
            if dim == -1:
                return self._out
            return args[0][dim] if isinstance(args[0], _SHAPE_TYPES) else args[0]
        shape1 = list(args[0])
        shape1[-1] = self._out
        return tuple(shape1)


class ConcatFusion:
    """Concatenate along ``dim`` (parity: `fusion.py:112-146`)."""

    def __init__(self, dim=1, **kwargs):
        self.dim = dim

    def __call__(self, *args):
        return jnp.concatenate(args, axis=self.dim)

    def get_output_shape(self, *args, dim=None):
        if dim is not None:
            _dim_requires_int(args)
            if dim == self.dim:
                return sum(args)
            return args[0]
        shape = list(args[0])
        for arg in args[1:]:
            shape[self.dim] += arg[self.dim]
        return tuple(shape)


class ConcatDynaFusion:
    """Concat on axis 1, then duplicate on axis 2 — builds a square token
    grid for the DynaMixer fusion path (parity: `fusion.py:149-187`)."""

    def __init__(self, dim=1, **kwargs):
        self.dim = dim

    def __call__(self, *args):
        a = jnp.concatenate(args, axis=1)
        return jnp.concatenate([a, a], axis=2)

    def get_output_shape(self, *args, dim=None):
        if dim is not None:
            _dim_requires_int(args)
            if dim == self.dim:
                return (int(math.sqrt(args[0])) * 2) ** 2
            return args[0]
        shape = list(args[0])
        for arg in args[1:]:
            shape[1] += arg[1]
            shape[2] += arg[2]
        return tuple(shape)


class MaxFusion:
    """Elementwise maximum of two modalities (parity: `fusion.py:190-204`)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, *args):
        return jnp.maximum(*args)

    @staticmethod
    def get_output_shape(*args, dim=None):
        if dim is not None:
            _dim_requires_int(args)
        if args[0] != args[1]:
            raise ValueError("Input shapes must be equal")
        return args[0]


class SumFusion:
    """Elementwise sum of two modalities (parity: `fusion.py:207-221`)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, *args):
        return jnp.add(*args)

    @staticmethod
    def get_output_shape(*args, dim=None, **kwargs):
        if dim is not None:
            _dim_requires_int(args)
        if args[0] != args[1]:
            raise ValueError("Input shapes must be equal")
        return args[0]


class ExtraConcatFusion:
    """Stack modalities along a new axis at ``dim`` — feeds
    ``MultimodalFusionMixer`` (parity: `fusion.py:224-255`)."""

    def __init__(self, dim=1, **kwargs):
        self.dim = dim

    def __call__(self, *args):
        return jnp.concatenate([jnp.expand_dims(a, self.dim) for a in args], axis=self.dim)

    def get_output_shape(self, *args, dim=None, num_modality=2):
        if dim is not None:
            _dim_requires_int(args)
            if dim == self.dim:
                return args[0]
        shape = list(args[0])
        shape.insert(self.dim, num_modality)
        return tuple(shape)


class MeanFusion:
    """Elementwise mean over modalities (parity: `fusion.py:258-272`)."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, *args):
        return jnp.mean(jnp.stack(args), axis=0)

    @staticmethod
    def get_output_shape(*args, dim=None, **kwargs):
        if dim is not None:
            _dim_requires_int(args)
        if args[0] != args[1]:
            raise ValueError("Input shapes must be equal")
        return args[0]
