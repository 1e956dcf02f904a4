"""Mixture-of-Experts mixer blocks with expert parallelism.

Beyond-reference capability (the reference has no MoE or expert-parallel
code anywhere — SURVEY.md §2.6): the channel-mix FeedForward of a MixerBlock
is replaced by ``num_experts`` expert FFNs behind a learned top-k router
(Switch-Transformer style: top-1 default, output scaled by the winning
router probability, plus the standard load-balance auxiliary loss).

TPU-native design decisions:

- **Dense exact dispatch**: every expert computes every token and the
  combine is masked by the router (one einsum chain, static shapes, no
  capacity factor, no token dropping — bit-exact routing semantics). This
  is the XLA-friendly formulation: no gather/scatter, no all_to_all, and
  the expert axis is a plain tensor dimension the SPMD partitioner can
  shard.
- **Expert parallelism over the ``model`` mesh axis**: the expert-stacked
  kernels ``(E, ...)`` get ``P('model')`` specs (parallel/mesh.py), so each
  device holds ``E / model`` experts and computes all tokens through its
  local experts only — per-device FLOPs stay at ``E/model`` experts' cost;
  the masked combine contracts the expert axis with one psum placed by XLA.
- **Aux-loss plumbing without mutable trainer state**: blocks ``sow`` their
  balance loss into a ``moe`` collection; the task requests it as a mutable
  collection during training and adds ``model.moe_aux_weight`` (default
  0.01) times the summed balance losses to the total
  (models/base.py::TrainTask.apply_network). Eval passes drop the sow.

Select with ``block_type: MoEMLPMixer`` (encoder) or ``MoEFusionMixer``
(fusion stack); config keys mirror MLPMixer/FusionMixer plus
``num_experts`` (the per-expert width stays ``channel_dim``), optional
``moe_top_k``, and optional ``moe_capacity_factor`` — 0 keeps the dense
exact dispatch; > 0 switches to GShard-style sparse capacity dispatch
(one-hot dispatch/combine einsums, per-expert FLOPs scale with capacity
instead of the full token count, over-capacity tokens fall back to their
residual).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import Dropout, LayerNorm, Linear, PatchEmbed, gelu, torch_bias_init, torch_kernel_init

__all__ = ["MoEFeedForward", "MoEMixerBlock", "MoEMLPMixer", "MoEFusionMixer"]


class MoEFeedForward(nn.Module):
    """Top-k-routed expert FFNs with dense exact dispatch.

    Output: ``sum_{e in topk(x)} p_e(x) * FFN_e(x)`` per token. Sows the
    Switch load-balance loss ``E * sum_e f_e * P_e`` (f = routed fraction,
    P = mean router prob) into the ``moe`` collection.
    """

    dim: int
    hidden_dim: int
    num_experts: int
    top_k: int = 1
    #: 0 = dense exact dispatch (every expert computes every token, combine
    #: masked — no drops, E x channel FLOPs). > 0 = sparse capacity-based
    #: dispatch (GShard-style): each expert processes at most
    #: ``ceil(tokens/E * capacity_factor)`` tokens per sample, routed via
    #: one-hot dispatch einsums (no gather/scatter/all_to_all — the expert
    #: axis stays a shardable tensor dimension); tokens over capacity are
    #: dropped (their block residual passes through unchanged). Per-expert
    #: FLOPs then scale with capacity, not with the full token count.
    capacity_factor: float = 0.0
    dropout: float = 0.0
    dtype: Optional[Any] = None

    def _expert_param(self, name, shape, fan_in):
        E = self.num_experts

        def kinit(rng, s, dt):
            keys = jax.random.split(rng, E)
            return jnp.stack([torch_kernel_init(k, s[1:], dt) for k in keys])

        def binit(rng, s, dt):
            keys = jax.random.split(rng, E)
            ib = torch_bias_init(fan_in)
            return jnp.stack([ib(k, s[1:], dt) for k in keys])

        init = kinit if name.endswith("kernel") else binit
        return self.param(name, init, (E, *shape), jnp.float32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D, F, E = self.dim, self.hidden_dim, self.num_experts
        k1 = self._expert_param("expert_fc1_kernel", (D, F), D)
        b1 = self._expert_param("expert_fc1_bias", (F,), D)
        k2 = self._expert_param("expert_fc2_kernel", (F, D), F)
        b2 = self._expert_param("expert_fc2_bias", (D,), F)
        dt = self.dtype or x.dtype

        # router always in f32: tiny GEMM, and routing decisions should not
        # quantize with the compute dtype
        logits = Linear(D, E, name="router")(x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # (..., N, E)
        k = min(self.top_k, E)
        top_p, top_idx = jax.lax.top_k(probs, k)
        mask = jax.nn.one_hot(top_idx, E, dtype=probs.dtype).sum(axis=-2)
        weights = probs * mask  # raw router probs at the selected experts

        # load-balance aux loss over all leading axes (batch x tokens)
        f = mask.reshape(-1, E).mean(axis=0) / k  # routed fraction
        P = probs.reshape(-1, E).mean(axis=0)
        self.sow("moe", "balance", E * jnp.sum(f * P))

        drop = Dropout(self.dropout)
        if self.capacity_factor and self.capacity_factor > 0:
            # sparse dispatch: route each top-k choice to a capacity slot,
            # first choices claiming slots before later ones
            T = x.shape[-2]
            C = max(1, int(math.ceil(T / E * float(self.capacity_factor))))
            counts = jnp.zeros((*probs.shape[:-2], E), probs.dtype)
            dispatch = None  # (..., T, E, C) 0/1
            combine = None   # dispatch weighted by the router prob
            for j in range(k):
                oh = jax.nn.one_hot(top_idx[..., j], E, dtype=probs.dtype)
                pos = (jnp.cumsum(oh, axis=-2) - oh
                       + counts[..., None, :])          # slot within expert
                pos_t = (pos * oh).sum(axis=-1)          # (..., T)
                keep = (pos_t < C).astype(probs.dtype)
                disp_e = oh * keep[..., None]            # (..., T, E)
                d = disp_e[..., :, None] * jax.nn.one_hot(
                    pos_t.astype(jnp.int32), C, dtype=probs.dtype)[..., None, :]
                cmb = d * top_p[..., j][..., None, None]
                dispatch = d if dispatch is None else dispatch + d
                combine = cmb if combine is None else combine + cmb
                counts = counts + disp_e.sum(axis=-2)
            expert_in = jnp.einsum("...td,...tec->...ecd", x.astype(dt),
                                   dispatch.astype(dt))
            h = jnp.einsum("...ecd,edf->...ecf", expert_in, k1.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            h = drop(gelu(h + b1.astype(dt)[..., :, None, :]), deterministic)
            o = jnp.einsum("...ecf,efd->...ecd", h, k2.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
            o = drop(o + b2.astype(dt)[..., :, None, :], deterministic)
            return jnp.einsum("...ecd,...tec->...td", o, combine.astype(dt))

        # dense dispatch: (..., E, N, F) intermediate; expert axis shardable
        h = jnp.einsum("...nd,edf->...enf", x.astype(dt), k1.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        h = h + b1.astype(dt)[..., :, None, :]
        h = drop(gelu(h), deterministic)
        o = jnp.einsum("...enf,efd->...end", h, k2.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        o = o + b2.astype(dt)[..., :, None, :]
        o = drop(o, deterministic)
        y = jnp.einsum("...end,...ne->...nd", o, weights.astype(dt))
        return y


class MoEMixerBlock(nn.Module):
    """MixerBlock whose channel mix is a routed expert pool: pre-LN
    token-mix + residual (dense, as in MixerBlock), then pre-LN MoE channel
    mix + residual."""

    hidden_dim: int
    num_patch: int
    token_dim: int
    channel_dim: int
    num_experts: int = 4
    top_k: int = 1
    capacity_factor: float = 0.0
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ..parallel.mesh import shard_tokens
        from .mixer import FeedForward

        x = shard_tokens(x)
        y = LayerNorm(dtype=self.dtype, name="norm_token")(x)
        y = jnp.swapaxes(y, -1, -2)
        y = FeedForward(self.num_patch, self.token_dim, self.dropout,
                        dtype=self.dtype, name="token_mix")(y, deterministic)
        y = jnp.swapaxes(y, -1, -2)
        x = x + y

        y = LayerNorm(dtype=self.dtype, name="norm_channel")(x)
        y = MoEFeedForward(self.hidden_dim, self.channel_dim,
                           self.num_experts, self.top_k,
                           self.capacity_factor, self.dropout,
                           dtype=self.dtype, name="channel_moe")(y, deterministic)
        return x + y


class MoEFusionMixer(nn.Module):
    """FusionMixer with MoE channel mixes (config mirror of FusionMixer +
    ``num_experts`` / ``moe_top_k``)."""

    hidden_dim: int
    num_patches: int
    num_mixers: int
    token_dim: int
    channel_dim: int
    num_experts: int = 4
    moe_top_k: int = 1
    moe_capacity_factor: float = 0.0
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.num_patches

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_mixers):
            x = MoEMixerBlock(
                hidden_dim=self.hidden_dim, num_patch=self.num_patches,
                token_dim=self.token_dim, channel_dim=self.channel_dim,
                num_experts=self.num_experts, top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class MoEMLPMixer(nn.Module):
    """MLPMixer encoder with MoE channel mixes (config mirror of MLPMixer +
    ``num_experts`` / ``moe_top_k``)."""

    in_channels: int
    hidden_dim: int
    patch_size: int
    image_size: Tuple[int, int]
    num_mixers: int
    token_dim: int
    channel_dim: int
    num_experts: int = 4
    moe_top_k: int = 1
    moe_capacity_factor: float = 0.0
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_size
        return (ih // self.patch_size) * (iw // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed(self.in_channels, self.hidden_dim, self.patch_size,
                       dtype=self.dtype, name="patch_embed")(x)
        for i in range(self.num_mixers):
            x = MoEMixerBlock(
                hidden_dim=self.hidden_dim, num_patch=self.num_patch,
                token_dim=self.token_dim, channel_dim=self.channel_dim,
                num_experts=self.num_experts, top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)
