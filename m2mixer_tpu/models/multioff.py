"""MultiOFF offensive-meme model (image + text, binary).

Re-expresses ``/root/reference/models/multioff.py``: image+text MultiLoss
with unweighted BCE and plain-sum combine; binary acc/F1/prec/rec scores.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..modules.losses import bce_with_logits_loss
from ..training import metrics as tm
from .base import MultiLossTask
from .nets import build_multimodal_net

__all__ = ["MultiOFFMixerMultiLoss"]


class MultiOFFMixerMultiLoss(MultiLossTask):
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
        labels = batch["label"].astype(jnp.float32)[:, None]
        img_logits, text_logits = outputs["branch_logits"]
        return {
            "image": self.bce(img_logits, labels),
            "text": self.bce(text_logits, labels),
            "fusion": self.bce(outputs["logits"], labels),
        }

    def predictions(self, outputs, batch):
        img_logits, text_logits = outputs["branch_logits"]
        th = lambda z: (jax.nn.sigmoid(z) > 0.5).astype(jnp.int32)
        return {
            "preds": th(outputs["logits"]),
            "probs": jax.nn.sigmoid(outputs["logits"]),
            "preds_image": th(img_logits),
            "preds_text": th(text_logits),
            "labels": batch["label"].astype(jnp.int32)[:, None],
            "logits": outputs["logits"],
            "image_logits": img_logits,
            "text_logits": text_logits,
        }

    def setup_scores(self):
        # parity: `models/multioff.py:182-196`
        scores = dict(
            f1=tm.F1Score(task="binary"),
            accuracy=tm.Accuracy(task="binary"),
            precision=tm.Precision(task="binary"),
            recall=tm.Recall(task="binary"),
        )
        import copy

        return [copy.deepcopy(scores) for _ in range(3)]

    def epoch_log_keys(self):
        return ("loss_image", "loss_text", "loss_fusion")

    def test_artifact_keys(self):
        return ("preds", "preds_image", "preds_text", "labels",
                "image_logits", "text_logits", "logits")

    def gradblend_loss(self, logits, batch):
        return bce_with_logits_loss(logits, batch["label"].astype(jnp.float32)[:, None])
