"""MLP-Mixer block family, TPU-native.

Re-expresses the capabilities of ``/root/reference/modules/mixer.py`` as
flax.linen modules designed for XLA: static shapes throughout, patch
embedding as reshape+GEMM (MXU-friendly, no conv lowering), token mixing as a
contraction over the token axis (XLA fuses the transposes into the GEMM), and
an optional compute-dtype (bf16) policy with float32 parameters.

Every module exposes ``num_patch`` (a static property derived from
constructor fields) because the fusion shape-inference protocol sizes the
fusion mixer from it (see ``/root/reference/models/avmnist.py:184-186``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .common import Dropout, LayerNorm, Linear, PatchEmbed, gelu

__all__ = [
    "FeedForward",
    "MixerBlock",
    "MMixerBlock",
    "MultimodalFusionMixer",
    "FusionMixer",
    "MLPMixer",
    "MLPMixerNoPatching",
    "MLPool",
    "PNLPMixer",
]


class FeedForward(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout over the last axis.

    Parity: ``FeedForward`` (`/root/reference/modules/mixer.py:9-22`),
    including the optional ``out_dim`` override.
    """

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    out_dim: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or self.dim
        x = Linear(self.dim, self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = Dropout(self.dropout)(x, deterministic)
        x = Linear(self.hidden_dim, out_dim, dtype=self.dtype, name="fc2")(x)
        x = Dropout(self.dropout)(x, deterministic)
        return x


class MixerBlock(nn.Module):
    """Pre-LN token-mix + residual, then pre-LN channel-mix + residual.

    Parity: ``MixerBlock`` (`/root/reference/modules/mixer.py:25-47`). The
    token mix is LN -> (b n d -> b d n) -> FF over patches -> transpose back;
    XLA fuses the swapaxes into the surrounding GEMMs so this lowers to two
    MXU matmuls plus fused elementwise ops.
    """

    hidden_dim: int
    num_patch: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # sequence parallelism (opt-in, train.sequence_parallel): the
        # residual stream enters each block token-sharded over 'model';
        # no-op unless an activation mesh is installed (parallel/mesh.py)
        from ..parallel.mesh import shard_tokens

        x = shard_tokens(x)
        y = LayerNorm(dtype=self.dtype, name="norm_token")(x)
        y = jnp.swapaxes(y, -1, -2)
        y = FeedForward(
            self.num_patch, self.token_dim, self.dropout, dtype=self.dtype, name="token_mix"
        )(y, deterministic)
        y = jnp.swapaxes(y, -1, -2)
        x = x + y

        y = LayerNorm(dtype=self.dtype, name="norm_channel")(x)
        y = FeedForward(
            self.hidden_dim, self.channel_dim, self.dropout, dtype=self.dtype, name="channel_mix"
        )(y, deterministic)
        return x + y


class MMixerBlock(nn.Module):
    """MixerBlock plus a third modality-mix over a leading modality axis.

    Parity: ``MMixerBlock`` (`/root/reference/modules/mixer.py:50-80`).
    Input shape ``(b, m, n, d)``; the modality mix is an FF over ``m`` applied
    at axis position via transpose (b m n d -> b n d m).
    """

    hidden_dim: int
    num_patch: int
    num_modality: int
    modality_dim: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # token mix over n
        y = LayerNorm(dtype=self.dtype, name="norm_token")(x)
        y = jnp.swapaxes(y, -1, -2)  # b m d n
        y = FeedForward(
            self.num_patch, self.token_dim, self.dropout, dtype=self.dtype, name="token_mix"
        )(y, deterministic)
        y = jnp.swapaxes(y, -1, -2)
        x = x + y

        # modality mix over m
        y = LayerNorm(dtype=self.dtype, name="norm_modality")(x)
        y = jnp.transpose(y, (0, 2, 3, 1))  # b n d m
        y = FeedForward(
            self.num_modality, self.modality_dim, self.dropout, dtype=self.dtype, name="modality_mix"
        )(y, deterministic)
        y = jnp.transpose(y, (0, 3, 1, 2))  # b m n d
        x = x + y

        # channel mix over d
        y = LayerNorm(dtype=self.dtype, name="norm_channel")(x)
        y = FeedForward(
            self.hidden_dim, self.channel_dim, self.dropout, dtype=self.dtype, name="channel_mix"
        )(y, deterministic)
        return x + y


class MultimodalFusionMixer(nn.Module):
    """Modality-axis projection + stack of MMixerBlocks + final LN.

    Parity: ``MultimodalFusionMixer`` (`/root/reference/modules/mixer.py:83-109`).
    Input ``(b, m, n, d)`` with ``m == num_modality``; the projection maps the
    modality axis ``num_modality -> proj_modality_dim``.
    """

    hidden_dim: int
    num_patches: int
    num_mixers: int
    token_dim: int
    channel_dim: int
    num_modality: int
    proj_modality_dim: int
    modality_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.num_patches

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = jnp.transpose(x, (0, 2, 3, 1))  # b n d m
        y = Linear(self.num_modality, self.proj_modality_dim, dtype=self.dtype, name="modality_proj")(y)
        x = jnp.transpose(y, (0, 3, 1, 2))  # b m' n d
        for i in range(self.num_mixers):
            x = MMixerBlock(
                hidden_dim=self.hidden_dim,
                num_patch=self.num_patches,
                num_modality=self.proj_modality_dim,
                modality_dim=self.modality_dim,
                token_dim=self.token_dim,
                channel_dim=self.channel_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class FusionMixer(nn.Module):
    """Stack of MixerBlocks + final LN over an already-fused token sequence.

    Parity: ``FusionMixer`` (`/root/reference/modules/mixer.py:112-132`).
    """

    hidden_dim: int
    num_patches: int
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.num_patches

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.num_mixers):
            x = MixerBlock(
                hidden_dim=self.hidden_dim,
                num_patch=self.num_patches,
                token_dim=self.token_dim,
                channel_dim=self.channel_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class MLPMixer(nn.Module):
    """Patch-embed (reshape+GEMM) -> MixerBlocks -> LN.

    Parity: ``MLPMixer`` (`/root/reference/modules/mixer.py:135-162`). Input
    is NCHW ``(b, in_channels, H, W)`` matching the reference data layout.
    """

    in_channels: int
    hidden_dim: int
    patch_size: int
    image_size: Tuple[int, int]
    num_mixers: int
    token_dim: int
    channel_dim: int
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
        x = PatchEmbed(
            self.in_channels, self.hidden_dim, self.patch_size, dtype=self.dtype, name="patch_embed"
        )(x)
        for i in range(self.num_mixers):
            x = MixerBlock(
                hidden_dim=self.hidden_dim,
                num_patch=self.num_patch,
                token_dim=self.token_dim,
                channel_dim=self.channel_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class MLPMixerNoPatching(nn.Module):
    """Linear projection instead of conv patching (time-series path).

    Parity: ``MLPMixerNoPatching`` (`/root/reference/modules/mixer.py:165-186`).
    Input ``(b, num_patch, embedding_dim)``.
    """

    hidden_dim: int
    num_patch: int
    num_mixers: int
    token_dim: int
    channel_dim: int
    embedding_dim: int
    proj_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Linear(self.embedding_dim, self.proj_dim, dtype=self.dtype, name="proj")(x)
        for i in range(self.num_mixers):
            x = MixerBlock(
                hidden_dim=self.hidden_dim,
                num_patch=self.num_patch,
                token_dim=self.token_dim,
                channel_dim=self.channel_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


def _pool2d(x, kind: str):
    """2x2 pool over the last two axes of a rank-3 tensor ``(b, n, c)``.

    The reference feeds a ``(b, n, c)`` tensor through ``nn.MaxPool2d((2,2))``
    (`/root/reference/modules/mixer.py:215`), which torch interprets as an
    unbatched ``(C=b, H=n, W=c)`` image — so the pool halves BOTH the token
    and channel axes. We reproduce that exact behavior.
    """
    b, n, c = x.shape
    x = x[:, : (n // 2) * 2, : (c // 2) * 2]
    x = x.reshape(b, n // 2, 2, c // 2, 2)
    if kind == "max":
        return x.max(axis=(2, 4))
    return x.mean(axis=(2, 4))


class MLPool(nn.Module):
    """Hierarchical mixer with interleaved 2x2 pools at hidden-dim changes.

    Parity: ``MLPool`` (`/root/reference/modules/mixer.py:189-229`) including
    its quirk that ``pool_type='mean'`` selects MAX pooling and ``'max'``
    selects AVG pooling (`:204-207`) — replicated so configs behave
    identically; a corrected mapping is available via ``fix_pool_types=True``.
    """

    in_channels: int
    hidden_dims: Sequence[int]
    patch_size: int
    image_size: Tuple[int, int]
    num_mixers: int
    token_dim: int
    channel_dim: int
    dropout: float = 0.0
    pool_type: str = "mean"
    fix_pool_types: bool = False
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        ih, iw = self.image_size
        assert ih % self.patch_size == 0 and iw % self.patch_size == 0
        return (ih // self.patch_size) * (iw // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.pool_type not in ("mean", "max"):
            raise ValueError("Invalid pool type")
        if self.fix_pool_types:
            pool_kind = "max" if self.pool_type == "max" else "mean"
        else:  # reference quirk: names swapped
            pool_kind = "max" if self.pool_type == "mean" else "mean"

        x = PatchEmbed(
            self.in_channels, self.hidden_dims[0], self.patch_size, dtype=self.dtype, name="patch_embed"
        )(x)
        prev_dim = self.hidden_dims[0]
        patch_dim = self.num_patch
        for i, hd in enumerate(self.hidden_dims):
            if prev_dim != hd:
                x = _pool2d(x, pool_kind)
                prev_dim = hd
                patch_dim = patch_dim // 2
            x = MixerBlock(
                hidden_dim=hd,
                num_patch=patch_dim,
                token_dim=self.token_dim,
                channel_dim=self.channel_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)


class PNLPMixer(nn.Module):
    """Bottleneck projection of windowed hash features + MixerBlocks (text).

    Parity: ``PNLPMixer`` (`/root/reference/modules/mixer.py:232-264`). Input
    ``(b, max_seq_len, (2*window+1)*feature_size)`` from the projection
    featurizer; both mixer FF hidden dims use ``mlp_hidden_dim``.
    """

    max_seq_len: int
    hidden_dim: int
    num_mixers: int
    mlp_hidden_dim: int
    bottleneck_window_size: int
    bottleneck_features_size: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @property
    def num_patch(self) -> int:
        return self.max_seq_len

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_dim = (2 * self.bottleneck_window_size + 1) * self.bottleneck_features_size
        x = Linear(in_dim, self.hidden_dim, dtype=self.dtype, name="bottleneck")(x)
        for i in range(self.num_mixers):
            x = MixerBlock(
                hidden_dim=self.hidden_dim,
                num_patch=self.max_seq_len,
                token_dim=self.mlp_hidden_dim,
                channel_dim=self.mlp_hidden_dim,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, deterministic)
        return LayerNorm(dtype=self.dtype, name="norm_out")(x)
