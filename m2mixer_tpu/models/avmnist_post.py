"""AV-MNIST post-hoc correctness probe.

Re-expresses ``/root/reference/models/avmnist_post.py``: a classifier
trained on saved intermediate vectors to predict whether the base model was
*correct*, with per-sample pos-weighted BCE. The base model's parameters are
frozen by construction here (only the probe classifier exists in the
network) — the functional equivalent of the reference's requires_grad=False
sweep (`avmnist_post.py:19-20`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from ..modules import get_classifier_by_name
from ..training import metrics as tm
from .base import TrainTask

__all__ = ["AVMnistMixerMultiLossTP"]


class AVMnistMixerMultiLossTP(TrainTask):
    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.log_confusion_matrix = True
        self.pos_weight = float(
            model_cfg.pos_weight[0] if isinstance(model_cfg.pos_weight, (list, tuple))
            else model_cfg.pos_weight
        )

    def build_network(self):
        return _ProbeNet(classifier=get_classifier_by_name(**self.model_cfg.modalities.classification))

    def network_inputs(self, batch):
        return {"x": batch["data"]}

    def step(self, params, batch, ctx, rngs, train: bool):
        x = batch["data"].reshape(batch["data"].shape[0], -1)
        out, _ = self.apply_network(params, {"x": x}, rngs, train,
                                    prune_sparsity=self.prune_sparsity(ctx))
        out = out.squeeze(-1)
        labels = batch["label"].astype(jnp.float32)
        # per-sample weighted BCE: weight pos_weight on positives, 1 on
        # negatives (`avmnist_post.py:27-31` — torch `weight=`, not pos_weight)
        w = self.pos_weight * labels + (1.0 - labels)
        logp = jax.nn.log_sigmoid(out)
        lognp = jax.nn.log_sigmoid(-out)
        loss = jnp.mean(w * -(labels * logp + (1 - labels) * lognp))
        probs = jax.nn.sigmoid(out)
        return loss, {"losses": {"loss": loss}, "preds": probs, "probs": probs,
                      "labels": batch["label"]}

    def setup_scores(self):
        import copy

        scores = dict(acc=tm.Accuracy(task="binary"), f1=tm.F1Score(task="binary"),
                      precision=tm.Precision(task="binary"))
        return [copy.deepcopy(scores) for _ in range(3)]


from flax import linen as nn  # noqa: E402


class _ProbeNet(nn.Module):
    classifier: nn.Module

    @nn.compact
    def __call__(self, x, deterministic: bool = True, mute_code=-1):
        return self.classifier(x)
