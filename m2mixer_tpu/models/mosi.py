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

from ..modules.losses import cross_entropy_loss
from ..training import metrics as tm
from .base import MultiLossTask
from .nets import build_multimodal_net

__all__ = ["MosiMixerMultiLoss"]


class MosiMixerMultiLoss(MultiLossTask):
    """3-modal sentiment classifier over the aligned CMU-MOSI folds
    (consumes ``CMUMosiDataModule`` batches: vision (B,50,Dv), audio
    (B,50,70), text (B,T,proj) and binarized labels)."""

    modalities = ("vision", "audio", "text")
    weighting = "fixed"
    anneal_on = "val"

    def build_network(self):
        return build_multimodal_net(self.model_cfg, self.modalities)

    def network_inputs(self, batch):
        return {"inputs": (batch["vision"], batch["audio"], batch["text"])}

    @property
    def num_classes(self) -> int:
        return int(self.model_cfg.modalities.classification.num_classes)

    def branch_losses(self, outputs, batch, ctx) -> Dict[str, jnp.ndarray]:
        labels = batch["label"]
        losses = {
            name: cross_entropy_loss(logits, labels)
            for name, logits in zip(self.modalities, outputs["branch_logits"])
        }
        losses["fusion"] = cross_entropy_loss(outputs["logits"], labels)
        return losses

    def predictions(self, outputs, batch):
        sm = lambda z: jnp.argmax(jax.nn.softmax(z, axis=1), axis=1)
        preds = {f"preds_{n}": sm(z)
                 for n, z in zip(self.modalities, outputs["branch_logits"])}
        preds.update(preds=sm(outputs["logits"]), labels=batch["label"],
                     logits=outputs["logits"])
        return preds

    def setup_scores(self):
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
