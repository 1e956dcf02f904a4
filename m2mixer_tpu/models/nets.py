"""Generic multimodal forward networks shared by the task models.

One flax module covers the recurring topology of the reference's MultiLoss
models (`models/avmnist.py`, `mmimdb.py`, `multioff.py`, `memotion.py`,
`mmhs150.py` in the reference): per-modality encoder -> fusion -> fusion
mixer -> per-modality heads on pooled tokens + fusion classifier. Task
specifics (criteria, weighting, metrics) live in the Task classes.

Muting is a traced int code: code ``i`` zeroes modality ``i``'s input (the
reference zeroes tensors Python-side, `models/avmnist.py:252-256`); ``-1``
mutes nothing. Multiplicative masking keeps shapes static under jit.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MultimodalNet", "pool_tokens"]


def pool_tokens(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1, x.shape[-1]).mean(axis=1)


class MultimodalNet(nn.Module):
    """N-modality encoder/fusion/heads network.

    ``encoders``/``heads`` are parallel tuples; ``fusion`` may be a
    parameter-free callable (Concat/Sum/...) or a flax module (gated units).
    ``unsqueeze_missing_dims``: fusions over 2-D grids (DynaMixer path) or
    the modality-stack fusion need inputs of equal rank; encoders that
    output higher/lower rank are used as-is — rank harmonization is the
    encoders' job (configs guarantee compatible shapes, as in the reference).
    """

    encoders: Tuple[nn.Module, ...]
    heads: Tuple[nn.Module, ...]
    fusion: Any
    fusion_mixer: nn.Module
    classifier: nn.Module
    head_pool: bool = True  # pool tokens before the per-modality heads

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True, mute_code=-1):
        mute_code = jnp.asarray(mute_code)
        xs = [
            x * (mute_code != i).astype(x.dtype)
            for i, x in enumerate(inputs)
        ]
        encs = [enc(x, deterministic) for enc, x in zip(self.encoders, xs)]
        fused = self.fusion(*encs)
        fusion_tokens = self.fusion_mixer(fused, deterministic)

        branch_logits = []
        for head, e in zip(self.heads, encs):
            feats = pool_tokens(e) if self.head_pool else e
            branch_logits.append(head(feats))
        logits = self.classifier(fusion_tokens)
        return {
            "logits": logits,
            "branch_logits": tuple(branch_logits),
            "encodings": tuple(encs),
            "fusion_tokens": fusion_tokens,
        }
