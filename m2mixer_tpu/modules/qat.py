"""Quantization-aware training (QAT): fake-quantized weights in the trace.

Beyond the reference (which has no quantization story at all —
`/root/reference/` trains and ships f32 Lightning checkpoints): the serving
subsystem already deploys weight-only int8 / group-wise int4 artifacts via
post-training quantization (``serving.quantize_weights``). PTQ rounds weights
the model never saw during training, so the deployed forward drifts from the
trained one. ``model.qat`` closes that gap: every eligible kernel leaf is
passed through quantize→dequantize *inside the traced step* with a
straight-through estimator (Bengio et al. 2013; Jacob et al. 2018),

    w_fq = w + stop_gradient(qdq(w) - w)

so the forward (train AND eval) computes with exactly the weights an
int8/int4 artifact will carry, while gradients flow to the latent f32
weights as if the rounding were identity. Checkpoints, optimizer state, EMA,
SAM, and LoRA all keep operating on the latent weights — QAT is purely a
trace-time reparametrization, applied after the LoRA merge (QLoRA-style:
adapter gradients flow through the STE too).

The fake quantizer is BIT-IDENTICAL to the serving quantizer: same
eligibility predicate (float leaves, ndim >= 2, >= ``min_size`` elements),
same symmetric per-output-channel int8 scales (reduced over the input axis),
same group-wise int4 scheme with the same group-size selection and the same
int8 fallbacks (odd input axis, groups too small to pay for their scales).
``serving export --quantize <mode>`` on a QAT checkpoint therefore produces
an artifact whose forward reproduces the trained eval forward exactly —
deployment is lossless by construction, not approximately. The shared
helpers here (``int4_group_size``, the eligibility rule) are imported by
``m2mixer_tpu/serving.py`` so the two sides cannot drift.

TPU shape: qdq is a handful of elementwise VPU ops + one small reduction per
weight leaf, fused by XLA into the surrounding graph; at trained-model scale
the step-time cost is noise (weights are tiny next to activations here).

Recipe: train f32, then fine-tune with ``model.qat: int8`` (or ``int4``) +
``train.init_from: <run>`` (warm start), then ``serving export --quantize
int8``. Training from scratch under QAT also works at these model sizes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "Q_MIN_SIZE",
    "Q4_GROUP",
    "int4_group_size",
    "leaf_eligible",
    "fake_quantize_leaf",
    "fake_quantize",
    "parse_qat_config",
]

#: leaves smaller than this (biases, LN scales) stay float — matches the
#: serving quantizer's threshold
Q_MIN_SIZE = 4096
#: input-axis group size for int4 scales
Q4_GROUP = 64


def int4_group_size(in_dim: int, group_size: int = Q4_GROUP) -> Optional[int]:
    """The input-axis group size the int4 quantizer will use for a leaf with
    ``in_dim`` input rows, or ``None`` when the leaf falls back to int8:
    odd input axes can't pack nibble pairs, and groups <= 8 spend more on
    per-group f32 scales than nibble-packing saves (gs=2 is 2.4x BIGGER
    than int8). Single source of truth for training-time fake-quant and
    ``serving.quantize_weights``."""
    if in_dim % 2:
        return None
    gs = min(int(group_size), int(in_dim))
    while in_dim % gs or gs % 2:
        gs -= 1
    return None if gs <= 8 else gs


def leaf_eligible(leaf, min_size: int = Q_MIN_SIZE) -> bool:
    """Same predicate the serving quantizer applies: float dtype, at least
    2-D (a GEMM operand with an input axis), and big enough to matter."""
    return (hasattr(leaf, "ndim") and leaf.ndim >= 2
            and leaf.size >= min_size
            and jnp.issubdtype(leaf.dtype, jnp.floating))


def _qdq8(w32: jnp.ndarray) -> jnp.ndarray:
    # symmetric per-output-channel int8: scale reduced over the INPUT axis
    # (-2), kept per leading stack dim — serving.quantize_weights.q8 math
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = amax / 127.0 + 1e-12
    q = jnp.clip(jnp.rint(w32 / scale), -127, 127)
    return q * scale


def _qdq4(w32: jnp.ndarray, group_size: int) -> jnp.ndarray:
    in_dim = w32.shape[-2]
    gs = int4_group_size(in_dim, group_size)
    if gs is None:
        return _qdq8(w32)
    g = w32.reshape(*w32.shape[:-2], in_dim // gs, gs, w32.shape[-1])
    amax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
    scale = amax / 7.0 + 1e-12
    q = jnp.clip(jnp.rint(g / scale), -7, 7)
    # the serving artifact packs q two-per-byte and sign-extends on load —
    # a lossless roundtrip, so dequantization is exactly q * scale
    return (q * scale).reshape(w32.shape)


def fake_quantize_leaf(w, mode: str = "int8",
                       group_size: int = Q4_GROUP) -> jnp.ndarray:
    """Straight-through-estimator quantize→dequantize of one weight leaf.
    Value: exactly what ``serving.dequantize_weights(quantize_weights(w))``
    yields; gradient: identity to the latent ``w``."""
    w32 = w.astype(jnp.float32)
    qdq = _qdq4(w32, group_size) if mode == "int4" else _qdq8(w32)
    return (w32 + jax.lax.stop_gradient(qdq - w32)).astype(w.dtype)


def fake_quantize(variables, mode: str = "int8",
                  min_size: int = Q_MIN_SIZE,
                  group_size: int = Q4_GROUP):
    """Fake-quantize every eligible leaf of a variables/params tree
    (ineligible leaves pass through as the same objects). Applied inside the
    traced step by ``TrainTask.apply_network`` after the LoRA merge, so the
    per-step path, the epoch scan, the ensemble vmap, eval, and serving
    export all see the same quantized-effective weights."""

    def fq(leaf):
        if not leaf_eligible(leaf, min_size):
            return leaf
        return fake_quantize_leaf(leaf, mode, group_size)

    return jax.tree.map(fq, variables)


def parse_qat_config(qat_cfg):
    """``model.qat`` -> (mode, min_size, group_size) or (None, _, _).
    Accepts the string shorthand (``qat: int8``) or a mapping with optional
    ``min_size`` / ``group_size`` overrides."""
    if qat_cfg in (None, False):
        return None, Q_MIN_SIZE, Q4_GROUP
    if qat_cfg is True:  # `qat: true` — int8, all defaults
        qat_cfg = "int8"
    if isinstance(qat_cfg, str):
        mode, min_size, group_size = qat_cfg, Q_MIN_SIZE, Q4_GROUP
    elif hasattr(qat_cfg, "get"):
        mode = qat_cfg.get("mode", "int8")
        min_size = int(qat_cfg.get("min_size", Q_MIN_SIZE))
        group_size = int(qat_cfg.get("group_size", Q4_GROUP))
    else:
        raise ValueError(
            f"model.qat must be 'int8'/'int4' or a mapping (got {qat_cfg!r})")
    if mode not in ("int8", "int4"):
        raise ValueError(
            f"model.qat mode must be 'int8' or 'int4' (got {mode!r})")
    if min_size <= 0:
        raise ValueError(f"model.qat.min_size must be > 0 (got {min_size})")
    if group_size <= 8 or group_size % 2:
        raise ValueError(
            "model.qat.group_size must be even and > 8 — smaller groups "
            f"spend more on scales than int4 packing saves (got {group_size})")
    return mode, min_size, group_size
