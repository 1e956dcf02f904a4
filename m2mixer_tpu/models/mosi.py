"""CMU-MOSI sentiment task model (vision + COVAREP audio + text).

The reference ships the full MOSI data stack but NO task model for it
(`/root/reference/datasets/mosi_dataset.py` has no consumer in
`/root/reference/models/`) — this closes that gap with the framework's
standard MultiLoss topology: per-modality ``MLPMixerNoPatching`` encoders
(linear projection to a shared width, then mixer blocks over the 50 aligned
word steps), token-concat fusion, a fusion mixer, and per-branch heads.

Binary sentiment (label > 0, the standard Acc-2 protocol the datamodule's
``task: classification`` mode produces) with CE branch losses; all of the
MultiLoss recipe machinery (weighting schedules, freezing, muting) applies
unchanged.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..training import metrics as tm
from .base import MultiLossTask
from .nets import build_multimodal_net

__all__ = ["MosiMixerMultiLoss"]


class MosiMixerMultiLoss(MultiLossTask):
    """3-modal sentiment model over the aligned CMU-MOSI folds (consumes
    ``CMUMosiDataModule`` batches: vision (B,50,Dv), audio (B,50,70), text
    (B,T,proj)).

    ``model.task``:
      - ``classification`` (default): CE branch losses over binarized
        labels, the Acc-2 protocol.
      - ``regression``: L1 branch losses on the raw [-3, 3] sentiment
        scores (heads must have ``num_classes: 1``), scored with
        MAE / Pearson correlation / sign Acc-2 — the standard CMU-MOSI
        regression protocol.
    """

    modalities = ("vision", "audio", "text")
    weighting = "fixed"
    anneal_on = "val"

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.task_mode = str(model_cfg.get("task", "classification"))
        if self.task_mode == "regression":
            self.log_confusion_matrix = False  # float preds have no classes

    def build_network(self):
        return build_multimodal_net(self.model_cfg, self.modalities)

    def network_inputs(self, batch):
        return {"inputs": (batch["vision"], batch["audio"], batch["text"])}

    @property
    def num_classes(self) -> int:
        return int(self.model_cfg.modalities.classification.num_classes)

    def _branch_loss(self, logits, labels):
        if str(self.model_cfg.get("task", "classification")) == "regression":
            return jnp.abs(logits[..., 0] - labels).mean()
        return self.ce(logits, labels)

    def branch_losses(self, outputs, batch, ctx) -> Dict[str, jnp.ndarray]:
        labels = batch["label"]
        losses = {
            name: self._branch_loss(logits, labels)
            for name, logits in zip(self.modalities, outputs["branch_logits"])
        }
        losses["fusion"] = self._branch_loss(outputs["logits"], labels)
        return losses

    def predictions(self, outputs, batch):
        if self.task_mode == "regression":
            pred = lambda z: z[..., 0]
        else:
            pred = lambda z: jnp.argmax(jax.nn.softmax(z, axis=1), axis=1)
        preds = {f"preds_{n}": pred(z)
                 for n, z in zip(self.modalities, outputs["branch_logits"])}
        preds.update(preds=pred(outputs["logits"]), labels=batch["label"],
                     logits=outputs["logits"])
        return preds

    def setup_scores(self):
        if self.task_mode == "regression":
            scores = lambda: dict(mae=tm.MeanAbsoluteError(),
                                  corr=tm.PearsonCorrCoef(),
                                  acc2=tm.SignAccuracy())
        else:
            def scores():
                n = self.num_classes
                return dict(
                    acc=tm.Accuracy(task="multiclass", num_classes=n),
                    f1m=tm.F1Score(task="multiclass", num_classes=n, average="macro"),
                )

        return [scores() for _ in range(3)]

    def test_artifact_keys(self):
        return ("preds", "labels", "logits") + tuple(
            f"preds_{n}" for n in self.modalities)
