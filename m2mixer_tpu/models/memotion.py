"""Memotion meme-sentiment model (image + PNLP text, 5-class).

Re-expresses ``/root/reference/models/memotion.py`` (image MLPMixer +
PNLPMixer text MultiLoss, CE losses, plain-sum combine, macro-F1 score).
Unlike the reference, this model IS registered in the model registry
(the reference omits the import — SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..training import metrics as tm
from .base import MultiLossTask
from .nets import build_multimodal_net

__all__ = ["MemotionMixerMultiLoss"]


class MemotionMixerMultiLoss(MultiLossTask):
    modalities = ("image", "text")
    weighting = "sum"
    anneal_on = "none"

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        self.num_classes = int(model_cfg.modalities.classification.get("num_classes", 3))
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.log_confusion_matrix = False

    def build_network(self):
        return build_multimodal_net(self.model_cfg, ("image", "text"))

    def network_inputs(self, batch):
        return {"inputs": (batch["image"], batch["text"])}

    def branch_losses(self, outputs, batch, ctx):
        labels = batch["label"]
        img_logits, text_logits = outputs["branch_logits"]
        return {
            "image": self.ce(img_logits, labels),
            "text": self.ce(text_logits, labels),
            "fusion": self.ce(outputs["logits"], labels),
        }

    def predictions(self, outputs, batch):
        img_logits, text_logits = outputs["branch_logits"]
        sm = lambda z: jnp.argmax(jax.nn.softmax(z, axis=1), axis=1)
        return {
            "preds": sm(outputs["logits"]),
            "preds_image": sm(img_logits),
            "preds_text": sm(text_logits),
            "labels": batch["label"],
            "logits": outputs["logits"],
            "image_logits": img_logits,
            "text_logits": text_logits,
        }

    def setup_scores(self):
        # macro F1 only (`models/memotion.py:187-192`)
        import copy

        scores = dict(f1m=tm.F1Score(task="multiclass", num_classes=self.num_classes,
                                     average="macro"))
        return [copy.deepcopy(scores) for _ in range(3)]

    def epoch_log_keys(self):
        return ("loss_image", "loss_text", "loss_fusion")

    def test_artifact_keys(self):
        return ("preds", "preds_image", "preds_text", "labels",
                "image_logits", "text_logits", "logits")
