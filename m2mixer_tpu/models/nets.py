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


def build_multimodal_net(model_cfg, modality_keys, head_pool: bool = True,
                         extra_encoders=()):
    """Registry-driven constructor for the standard N-modality topology.

    Mirrors the reference constructors (`models/avmnist.py:181-191`,
    `models/mmimdb.py:35-45`, `models/mmhs150.py:36-49`): encoders from
    ``block_type``, fusion from ``fusion_function`` with shape inference via
    ``get_output_shape(..., dim=1)``, per-modality Linear heads, fusion
    classifier from ``classifier`` (defaulting to StandardClassifier when a
    config omits it, as some reference configs do).

    ``extra_encoders``: (key, config_key) pairs for modalities that reuse
    another modality's block config (the mmhs OCR mixer reuses the text
    config, `mmhs150.py:38`).
    """
    from ..config import DictConfig
    from ..modules import get_block_by_name, get_classifier_by_name, get_fusion_by_name
    from ..modules.common import Linear
    from .base import resolve_dtype

    mc = model_cfg.modalities
    dropout = model_cfg.get("dropout", 0.0)
    dtype = resolve_dtype(model_cfg.get("precision"))

    def feat_dim(block_cfg):
        return block_cfg.get("hidden_dim", block_cfg.get("d_model"))

    cfg_keys = list(modality_keys)
    for _, cfg_key in extra_encoders:
        cfg_keys.append(cfg_key)

    # opt-in perf path: identical-geometry MLPMixer encoder pairs run as ONE
    # modality-batched GEMM chain (see modules/paired.py; +17% at B geometry)
    paired_encoder = None
    if (bool(model_cfg.get("paired_encoders", False)) and len(cfg_keys) == 2):
        from ..modules.paired import PairedMLPMixer, can_pair

        c0, c1 = mc[cfg_keys[0]], mc[cfg_keys[1]]
        if can_pair(c0, c1):
            paired_encoder = PairedMLPMixer(
                in_channels=(int(c0.in_channels), int(c1.in_channels)),
                hidden_dim=int(c0.hidden_dim),
                patch_sizes=(int(c0.patch_size), int(c1.patch_size)),
                image_sizes=(tuple(c0.image_size), tuple(c1.image_size)),
                num_mixers=int(c0.num_mixers), token_dim=int(c0.token_dim),
                channel_dim=int(c0.channel_dim), dropout=dropout, dtype=dtype,
            )

    encoders = tuple(
        get_block_by_name(**mc[k], dropout=dropout, dtype=dtype) for k in cfg_keys
    )
    fusion = get_fusion_by_name(**mc.multimodal, dtype=dtype)
    num_patches = fusion.get_output_shape(*[e.num_patch for e in encoders], dim=1)
    fusion_mixer = get_block_by_name(
        **mc.multimodal, num_patches=num_patches, dropout=dropout, dtype=dtype
    )
    num_classes = mc.classification.num_classes
    heads = tuple(Linear(feat_dim(mc[k]), num_classes, dtype=dtype) for k in cfg_keys)
    cls_cfg = DictConfig(mc.classification)
    cls_cfg.setdefault("classifier", "StandardClassifier")
    cls_cfg.setdefault("input_shape", [feat_dim(mc.multimodal)])
    classifier = get_classifier_by_name(**cls_cfg, dtype=dtype)
    return MultimodalNet(
        encoders=encoders, heads=heads, fusion=fusion, fusion_mixer=fusion_mixer,
        classifier=classifier, head_pool=head_pool, paired_encoder=paired_encoder,
    )


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
    #: when set (model.paired_encoders), replaces the sequential per-modality
    #: encoder calls with one modality-batched chain (modules/paired.py);
    #: the unused `encoders` modules then carry only static shape metadata
    paired_encoder: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True, mute_code=-1):
        mute_code = jnp.asarray(mute_code)
        xs = [
            x * (mute_code != i).astype(x.dtype)
            for i, x in enumerate(inputs)
        ]
        if self.paired_encoder is not None:
            encs = list(self.paired_encoder(xs[0], xs[1], deterministic))
        else:
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
