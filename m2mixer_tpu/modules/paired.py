"""Paired dual-modality MLP-Mixer: both encoders as ONE batched GEMM chain.

TPU finding (see TODO.md, round 2): at the reference's AV-MNIST geometries
the epoch-compiled train step is bound by the number of sequential XLA
fusions, not FLOPs — and the image/audio encoders of every shipped M2-Mixer
config share identical block geometry (same hidden/token/channel dims and
patch count; `/root/reference/cfg/avmnist/avmnist_m2-mixer_B.yml:27-49`).
Running the two encoder stacks as one chain of modality-batched contractions
(``lax.dot_general`` with a leading batch dim of 2) halves the encoders'
sequential op count while computing the exact same math with per-modality
weights. Measured at B geometry in-scan: +17% train throughput over the
sequential-encoders path (kbench5, 2026-08).

Enable with ``model.paired_encoders: true`` (applies when both modalities use
``MLPMixer`` with matching geometry). Parameters are the modality-stacked
equivalents of two ``MLPMixer`` trees; ``pair_mlp_mixer_params`` converts
two modular trees into the paired layout for checkpoint compatibility.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import gelu, torch_bias_init, torch_kernel_init

__all__ = ["PairedMLPMixer", "pair_mlp_mixer_params", "can_pair"]


def can_pair(cfg0, cfg1) -> bool:
    """Two modality block configs can run paired iff both are MLPMixer with
    identical block geometry (patch-embed input widths may differ)."""
    if cfg0.get("block_type") != "MLPMixer" or cfg1.get("block_type") != "MLPMixer":
        return False
    def patches(c):
        ih, iw = c.image_size
        return (ih // c.patch_size) * (iw // c.patch_size)
    keys = ("hidden_dim", "token_dim", "channel_dim", "num_mixers")
    return all(cfg0.get(k) == cfg1.get(k) for k in keys) and patches(cfg0) == patches(cfg1)


class _PairedPatchEmbed(nn.Module):
    """Reshape+GEMM patch embed per modality (input widths may differ, so
    these stay two separate GEMMs; parity with ``PatchEmbed``)."""

    in_channels: int
    hidden_dim: int
    patch_size: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        from .common import Linear

        b, c, h, w = x.shape
        p = self.patch_size
        x = x.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // p) * (w // p), c * p * p)
        return Linear(self.in_channels * p * p, self.hidden_dim, dtype=self.dtype,
                      name="proj")(x)


class PairedMLPMixer(nn.Module):
    """Two same-geometry ``MLPMixer`` encoders fused into one batched chain.

    ``__call__(x0, x1) -> (tokens0, tokens1)``; each output equals the
    corresponding modular ``MLPMixer`` applied with that modality's weights
    (exact math, verified by ``test_paired_matches_modular``).

    Block parameters are LAYER-STACKED: one ``(L, 2, ...)`` leaf per role
    (12 leaves total for all blocks of both encoders) instead of ~24 per
    block. Per-leaf optimizer/masking work then runs on a handful of large
    leaves — measured ~0.15-0.2 ms/step of Adam + apply at B geometry was
    dominated by leaf COUNT, not bytes. Forward slices leaf ``[i]`` per
    block; XLA fuses the slices into the consuming GEMMs.
    """

    in_channels: Tuple[int, int]
    hidden_dim: int
    patch_sizes: Tuple[int, int]
    image_sizes: Tuple[Tuple[int, int], Tuple[int, int]]
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_sizes[0]
        return (ih // self.patch_sizes[0]) * (iw // self.patch_sizes[0])

    def _stacked(self, name, in_features, out_features):
        """(L, 2, in, out) kernel + (L, 2, out) bias, torch-init per slice."""
        L = self.num_mixers

        def kinit(rng, shape, dt):
            keys = jax.random.split(rng, L * 2)
            return jnp.stack([
                jnp.stack([torch_kernel_init(keys[l * 2 + m], shape[2:], dt)
                           for m in range(2)]) for l in range(L)
            ])

        def binit(rng, shape, dt):
            keys = jax.random.split(rng, L * 2)
            ib = torch_bias_init(in_features)
            return jnp.stack([
                jnp.stack([ib(keys[l * 2 + m], shape[2:], dt) for m in range(2)])
                for l in range(L)
            ])

        k = self.param(f"{name}_kernel", kinit, (L, 2, in_features, out_features),
                       jnp.float32)
        b = self.param(f"{name}_bias", binit, (L, 2, out_features), jnp.float32)
        return k, b

    def _ln_params(self, name, extra_lead=True):
        shape = (self.num_mixers, 2, self.hidden_dim) if extra_lead else (2, self.hidden_dim)
        s = self.param(f"{name}_scale", nn.initializers.ones, shape, jnp.float32)
        b = self.param(f"{name}_bias", nn.initializers.zeros, shape, jnp.float32)
        return s, b

    @nn.compact
    def __call__(self, x0, x1, deterministic: bool = True):
        from .common import Dropout

        D, N, T, C, L = (self.hidden_dim, self.num_patch, self.token_dim,
                         self.channel_dim, self.num_mixers)
        t0 = _PairedPatchEmbed(self.in_channels[0], D, self.patch_sizes[0],
                               dtype=self.dtype, name="patch_embed_0")(x0)
        t1 = _PairedPatchEmbed(self.in_channels[1], D, self.patch_sizes[1],
                               dtype=self.dtype, name="patch_embed_1")(x1)
        x = jnp.stack([t0, t1])  # (2, B, N, D)

        ln1_s, ln1_b = self._ln_params("norm_token")
        tk1, tb1 = self._stacked("token_fc1", N, T)
        tk2, tb2 = self._stacked("token_fc2", T, N)
        ln2_s, ln2_b = self._ln_params("norm_channel")
        ck1, cb1 = self._stacked("channel_fc1", D, C)
        ck2, cb2 = self._stacked("channel_fc2", C, D)
        drop = Dropout(self.dropout)
        dt = self.dtype or x.dtype

        def pln(y, s, b):  # per-modality LN over last axis
            m = y.mean(axis=-1, keepdims=True)
            v = ((y - m) ** 2).mean(axis=-1, keepdims=True)
            sh = (2, 1, 1, D)
            return ((y - m) * jax.lax.rsqrt(v + 1e-5) * s.reshape(sh).astype(y.dtype)
                    + b.reshape(sh).astype(y.dtype))

        def pdot(y, k):  # (2,B,a,in) @ (2,in,out), modality-batched
            # f32 accumulation on the MXU, result carried in the compute
            # dtype (the modular path's bf16 residual stream — halves the
            # elementwise bytes between GEMMs)
            out = jax.lax.dot_general(
                y.astype(dt), k.astype(dt),
                (((y.ndim - 1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            return out.astype(dt)

        def ff(y, k1, b1, k2, b2):
            y = pdot(y, k1) + b1[:, None, None, :].astype(dt)
            y = drop(gelu(y), deterministic)
            y = pdot(y, k2) + b2[:, None, None, :].astype(dt)
            return drop(y, deterministic)

        for i in range(L):
            y = pln(x, ln1_s[i], ln1_b[i])
            y = jnp.swapaxes(y, -1, -2)
            y = ff(y, tk1[i], tb1[i], tk2[i], tb2[i])
            x = x + jnp.swapaxes(y, -1, -2)
            y = pln(x, ln2_s[i], ln2_b[i])
            x = x + ff(y, ck1[i], cb1[i], ck2[i], cb2[i])

        out_s, out_b = self._ln_params("norm_out", extra_lead=False)
        x = pln(x, out_s, out_b)
        return x[0], x[1]


def _stack2(a, b):
    return jnp.stack([jnp.asarray(a), jnp.asarray(b)])


def pair_mlp_mixer_params(params0: dict, params1: dict) -> dict:
    """Convert two modular ``MLPMixer`` param trees (same geometry) into the
    ``PairedMLPMixer`` layout: separate patch embeds, layer-stacked
    ``(L, 2, ...)`` block leaves, modality-stacked ``(2, D)`` output LN."""
    out = {
        "patch_embed_0": {"proj": params0["patch_embed"]["proj"]},
        "patch_embed_1": {"proj": params1["patch_embed"]["proj"]},
    }
    layers = []
    i = 0
    while f"block_{i}" in params0:
        layers.append((params0[f"block_{i}"], params1[f"block_{i}"]))
        i += 1

    def stack_layers(get):
        return jnp.stack([_stack2(get(b0), get(b1)) for b0, b1 in layers])

    for name, ln in (("norm_token", "norm_token"), ("norm_channel", "norm_channel")):
        out[f"{name}_scale"] = stack_layers(lambda b: b[ln]["LayerNorm_0"]["scale"])
        out[f"{name}_bias"] = stack_layers(lambda b: b[ln]["LayerNorm_0"]["bias"])
    for name, ff, fc in (("token_fc1", "token_mix", "fc1"),
                         ("token_fc2", "token_mix", "fc2"),
                         ("channel_fc1", "channel_mix", "fc1"),
                         ("channel_fc2", "channel_mix", "fc2")):
        out[f"{name}_kernel"] = stack_layers(lambda b: b[ff][fc]["linear"]["kernel"])
        out[f"{name}_bias"] = stack_layers(lambda b: b[ff][fc]["linear"]["bias"])
    out["norm_out_scale"] = _stack2(params0["norm_out"]["LayerNorm_0"]["scale"],
                                    params1["norm_out"]["LayerNorm_0"]["scale"])
    out["norm_out_bias"] = _stack2(params0["norm_out"]["LayerNorm_0"]["bias"],
                                   params1["norm_out"]["LayerNorm_0"]["bias"])
    return out
