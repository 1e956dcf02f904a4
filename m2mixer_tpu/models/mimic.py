"""MIMIC-III task models (static tabular + clinical time series, 6-class).

Re-expresses ``/root/reference/models/mimic.py``: the mixer variant fuses
the static-MLP embedding (as a single token) with the time-series mixer
tokens; the recurrent baseline fuses flat static + flattened-GRU features
through an MLP. Metrics follow the reference: micro F1/acc/prec/rec plus
macro AveragePrecision over softmax probabilities.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import DictConfig
from ..modules import get_block_by_name, get_classifier_by_name, get_fusion_by_name
from ..modules.common import Linear
from ..training import metrics as tm
from .base import MultiLossTask

__all__ = ["MimicMixerMultiLoss", "MimicRecurrent"]


def _mimic_scores(num_classes: int):
    # parity: `models/mimic.py:162-181`
    return dict(
        f1_micro=tm.F1Score(task="multiclass", num_classes=num_classes, average="micro"),
        acc=tm.Accuracy(task="multiclass", num_classes=num_classes),
        precision_micro=tm.Precision(task="multiclass", num_classes=num_classes, average="micro"),
        recall_micro=tm.Recall(task="multiclass", num_classes=num_classes, average="micro"),
        auroc=tm.AveragePrecision(task="multiclass", num_classes=num_classes, average="macro"),
    )


class MimicMixerNet(nn.Module):
    """static MLP -> 1 token, time mixer -> T tokens; fusion over the token
    axis; static head on the raw embedding, time head on pooled tokens
    (parity: `models/mimic.py:97-108`)."""

    encoders: Tuple[nn.Module, ...]  # (static_extractor, time_mixer)
    heads: Tuple[nn.Module, ...]
    fusion: Any
    fusion_mixer: nn.Module
    classifier: nn.Module

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True, mute_code=-1):
        static, time = inputs
        mute_code = jnp.asarray(mute_code)
        static = static * (mute_code != 0).astype(static.dtype)
        time = time * (mute_code != 1).astype(time.dtype)
        static_feats = self.encoders[0](static, deterministic)  # (B, H)
        time_tokens = self.encoders[1](time, deterministic)  # (B, T, H)
        fused = self.fusion(static_feats[:, None, :], time_tokens)
        fusion_tokens = self.fusion_mixer(fused, deterministic)
        static_logits = self.heads[0](static_feats)
        time_logits = self.heads[1](time_tokens.mean(axis=1))
        logits = self.classifier(fusion_tokens)
        return {
            "logits": logits,
            "branch_logits": (static_logits, time_logits),
            "encodings": (static_feats, time_tokens),
            "fusion_tokens": fusion_tokens,
        }


class MimicRecurrentNet(nn.Module):
    """static MLP + flattened GRU outputs fused by 1-D concat into an MLP
    fusion encoder (parity: `models/mimic.py:252-267`)."""

    encoders: Tuple[nn.Module, ...]  # (static_extractor, time_encoder GRU)
    heads: Tuple[nn.Module, ...]
    fusion: Any
    fusion_encoder: nn.Module
    classifier: nn.Module

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True, mute_code=-1):
        static, time = inputs
        static_feats = self.encoders[0](static, deterministic)  # (B, S)
        time_feats = self.encoders[1](time, deterministic)  # (B, T*H) flattened
        fused = self.fusion(static_feats, time_feats)  # concat on dim 1
        fusion_feats = self.fusion_encoder(fused, deterministic)
        static_logits = self.heads[0](static_feats)
        time_logits = self.heads[1](time_feats)
        logits = self.classifier(fusion_feats)
        return {
            "logits": logits,
            "branch_logits": (static_logits, time_logits),
            "encodings": (static_feats, time_feats),
            "fusion_tokens": fusion_feats,
        }


class MimicMixerMultiLoss(MultiLossTask):
    """CE per branch; fixed weighting without the x3 scale
    (parity: `models/mimic.py:24-207`)."""

    modalities = ("static", "time")
    weighting = "fixed"

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        self.num_classes = int(model_cfg.modalities.classification.get("num_classes", 3))
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.log_confusion_matrix = False

    def build_network(self):
        mc = self.model_cfg.modalities
        dropout = self.model_cfg.get("dropout", 0.0)
        time_mixer = get_block_by_name(**mc.time, dropout=dropout)
        static_extractor = get_block_by_name(**mc.static, dropout=dropout)
        fusion = get_fusion_by_name(**mc.multimodal)
        # static contributes one token (`mimic.py:42-43,102`)
        num_patches = fusion.get_output_shape(1, time_mixer.num_patch, dim=1)
        fusion_mixer = get_block_by_name(**mc.multimodal, num_patches=num_patches, dropout=dropout)
        heads = (
            Linear(mc.static.output_dim, self.num_classes),
            Linear(mc.time.hidden_dim, self.num_classes),
        )
        cls_cfg = DictConfig(mc.classification)
        cls_cfg.setdefault("classifier", "StandardClassifier")
        cls_cfg.setdefault("input_shape", [mc.multimodal.hidden_dim])
        classifier = get_classifier_by_name(**cls_cfg)
        return MimicMixerNet(
            encoders=(static_extractor, time_mixer), heads=heads,
            fusion=fusion, fusion_mixer=fusion_mixer, classifier=classifier,
        )

    def network_inputs(self, batch):
        return {"inputs": (batch["static"], batch["time"])}

    def branch_losses(self, outputs, batch, ctx):
        labels = batch["label"]
        static_logits, time_logits = outputs["branch_logits"]
        return {
            "static": self.ce(static_logits, labels),
            "time": self.ce(time_logits, labels),
            "fusion": self.ce(outputs["logits"], labels),
        }

    def predictions(self, outputs, batch):
        static_logits, time_logits = outputs["branch_logits"]
        # the reference feeds softmax PROBS to its metrics (`mimic.py:126-133`)
        # so AveragePrecision sees scores; class metrics argmax internally
        probs = jax.nn.softmax(outputs["logits"], axis=1)
        return {
            "preds": probs,
            "probs": probs,
            "preds_static": jax.nn.softmax(static_logits, axis=1),
            "preds_time": jax.nn.softmax(time_logits, axis=1),
            "labels": batch["label"],
            "logits": outputs["logits"],
            "logits_static": static_logits,
            "logits_time": time_logits,
        }

    def setup_scores(self):
        return [_mimic_scores(self.num_classes) for _ in range(3)]

    def test_artifact_keys(self):
        return ("preds", "labels", "logits", "logits_static", "logits_time")


class MimicRecurrent(MimicMixerMultiLoss):
    """GRU time encoder + MLP fusion baseline
    (parity: `models/mimic.py:210-335`)."""

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        self.num_classes = int(model_cfg.modalities.classification.get("num_classes", 6))
        MultiLossTask.__init__(self, model_cfg, optimizer_cfg, **kwargs)
        self.log_confusion_matrix = True

    def build_network(self):
        mc = self.model_cfg.modalities
        dropout = self.model_cfg.get("dropout", 0.0)
        time_encoder = get_block_by_name(**mc.time, dropout=dropout)
        static_extractor = get_block_by_name(**mc.static, dropout=dropout)
        fusion = get_fusion_by_name(**mc.multimodal)
        fusion_encoder = get_block_by_name(**mc.multimodal, dropout=dropout)
        # flattened GRU feature size (`mimic.py:226-228`)
        time_out = mc.time.input_dim * mc.time.hidden_dim * 2
        heads = (
            Linear(mc.static.output_dim, self.num_classes),
            Linear(time_out, self.num_classes),
        )
        cls_cfg = DictConfig(mc.classification)
        cls_cfg.setdefault("classifier", "StandardClassifier")
        cls_cfg.setdefault("input_shape", [mc.multimodal.hidden_dim])
        classifier = get_classifier_by_name(**cls_cfg)
        return MimicRecurrentNet(
            encoders=(static_extractor, time_encoder), heads=heads,
            fusion=fusion, fusion_encoder=fusion_encoder, classifier=classifier,
        )

    def predictions(self, outputs, batch):
        static_logits, time_logits = outputs["branch_logits"]
        sm = lambda z: jnp.argmax(jax.nn.softmax(z, axis=1), axis=1)
        probs = jax.nn.softmax(outputs["logits"], axis=1)
        return {
            "preds": sm(outputs["logits"]),
            "probs": probs,
            "preds_static": sm(static_logits),
            "preds_time": sm(time_logits),
            "labels": batch["label"],
            "logits": outputs["logits"],
            "logits_static": static_logits,
            "logits_time": time_logits,
        }
