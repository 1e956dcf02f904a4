"""MMHS150K hate-speech model (tweet image + tweet text + OCR text, binary).

Re-expresses ``/root/reference/models/mmhs150.py``: three modalities (the
OCR mixer reuses the text block config), four BCE(pos_weight=3.57) losses
with the text/OCR losses masked by per-sample ``use_features`` flags, fixed
weighting ``ow=(1-w_f)/3`` with per-train-epoch annealing, and binary
acc/F1/prec/rec/AUROC scores. The reference's debugging leftover that
overwrites predictions with random choices (`mmhs150.py:111`) is NOT
replicated (SURVEY.md §7.4); AUROC here receives sigmoid probabilities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..modules.losses import bce_with_logits_loss
from ..training import metrics as tm
from .base import MultiLossTask
from .nets import build_multimodal_net

__all__ = ["MMHS150MultiLoss"]


def _binary_scores():
    return dict(
        f1=tm.F1Score(task="binary"),
        accuracy=tm.Accuracy(task="binary"),
        precision=tm.Precision(task="binary"),
        recall=tm.Recall(task="binary"),
        auc=tm.AUROC(task="binary"),
    )


class MMHS150MultiLoss(MultiLossTask):
    modalities = ("image", "text", "ocr")
    weighting = "fixed"
    anneal_on = "train_end"

    POS_WEIGHT = 3.57  # `mmhs150.py:51-54`

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        self.num_classes = int(model_cfg.modalities.classification.get("num_classes", 3))
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.log_confusion_matrix = False

    def build_network(self):
        # OCR text shares the text block config (`mmhs150.py:38`)
        return build_multimodal_net(
            self.model_cfg, ("image", "text"), extra_encoders=(("ocr", "text"),)
        )

    def network_inputs(self, batch):
        return {"inputs": (batch["image"], batch["text"], batch["ocr"])}

    def branch_losses(self, outputs, batch, ctx):
        labels = batch["label"].astype(jnp.float32)[:, None]
        img_logits, text_logits, ocr_logits = outputs["branch_logits"]
        pw = jnp.asarray([self.POS_WEIGHT], jnp.float32)
        use_t = batch["use_features"].astype(jnp.float32).reshape(-1, 1)
        use_o = batch["use_features_ocr"].astype(jnp.float32).reshape(-1, 1)
        return {
            "image": self.bce(img_logits, labels, pw),
            # masked exactly like the reference: zero both logits and labels
            # for samples without usable text (`mmhs150.py:100-103`)
            "text": self.bce(text_logits * use_t, labels * use_t, pw),
            "ocr": self.bce(ocr_logits * use_o, labels * use_o, pw),
            "fusion": self.bce(outputs["logits"], labels, pw),
        }

    def predictions(self, outputs, batch):
        img_logits, text_logits, ocr_logits = outputs["branch_logits"]
        probs = jax.nn.sigmoid(outputs["logits"])
        th = lambda z: (jax.nn.sigmoid(z) > 0.5).astype(jnp.int32)
        return {
            "preds": th(outputs["logits"]),
            "probs": probs,
            "preds_image": th(img_logits),
            "preds_text": th(text_logits),
            "preds_text_ocr": th(ocr_logits),
            "labels": batch["label"].astype(jnp.int32)[:, None],
            "logits": outputs["logits"],
            "image_logits": img_logits,
            "text_logits": text_logits,
            "text_ocr_logits": ocr_logits,
        }

    def setup_scores(self):
        return [_binary_scores() for _ in range(3)]

    def epoch_log_keys(self):
        return ("loss_image", "loss_text", "loss_ocr", "loss_fusion")

    def test_artifact_keys(self):
        return ("preds", "preds_image", "preds_text", "labels",
                "image_logits", "text_logits", "logits")

    def gradblend_loss(self, logits, batch):
        labels = batch["label"].astype(jnp.float32)[:, None]
        return bce_with_logits_loss(logits, labels, jnp.asarray([self.POS_WEIGHT], jnp.float32))
