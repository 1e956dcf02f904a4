"""pNLP-Mixer text-only models (embedding-free hashed-projection text path).

Re-expresses ``/root/reference/models/pnlp.py``: bottleneck + PNLPMixer with
sequence- or token-classification heads. The reference ships these as plain
``nn.Module`` scaffolding (not registered, no Lightning task); here they are
flax modules PLUS a registered trainable task (``PnlpMixerSeqClsTask``) so
the text-only IMDB pipeline can actually run end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..modules.classification import SequenceClassificationLayer, TokenClassificationLayer
from ..modules.mixer import PNLPMixer
from ..training import metrics as tm
from .base import TrainTask

__all__ = ["PnlpMixer", "PnlpMixerSeqCls", "PnlpMixerTokenCls", "PnlpMixerSeqClsTask"]


def _build_mixer(bottleneck_cfg, mixer_cfg) -> PNLPMixer:
    from ..modules import build_component

    kwargs = dict(mixer_cfg)
    kwargs.setdefault("bottleneck_window_size", bottleneck_cfg["window_size"])
    kwargs.setdefault("bottleneck_features_size", bottleneck_cfg["feature_size"])
    kwargs.setdefault("hidden_dim", bottleneck_cfg["hidden_dim"])
    return build_component(PNLPMixer, **kwargs)


class PnlpMixer(nn.Module):
    """Bottleneck + PNLPMixer backbone (parity: `models/pnlp.py:42-56`)."""

    bottleneck_cfg: dict
    mixer_cfg: dict

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mixer = _build_mixer(self.bottleneck_cfg, self.mixer_cfg)
        return mixer(x, deterministic)


class PnlpMixerSeqCls(nn.Module):
    """Backbone + attention-pooled sequence head (parity: `pnlp.py:8-23`)."""

    bottleneck_cfg: dict
    mixer_cfg: dict
    seq_cls_cfg: dict

    @nn.compact
    def __call__(self, x, deterministic: bool = True, mute_code=-1):
        reprs = PnlpMixer(self.bottleneck_cfg, self.mixer_cfg, name="pnlp_mixer")(x, deterministic)
        from ..modules import build_component

        head = build_component(SequenceClassificationLayer, **self.seq_cls_cfg)
        return head(reprs)


class PnlpMixerTokenCls(nn.Module):
    """Backbone + per-token head (parity: `pnlp.py:25-40`)."""

    bottleneck_cfg: dict
    mixer_cfg: dict
    token_cls_cfg: dict

    @nn.compact
    def __call__(self, x, deterministic: bool = True, mute_code=-1):
        reprs = PnlpMixer(self.bottleneck_cfg, self.mixer_cfg, name="pnlp_mixer")(x, deterministic)
        from ..modules import build_component

        head = build_component(TokenClassificationLayer, **self.token_cls_cfg)
        return head(reprs)


class PnlpMixerSeqClsTask(TrainTask):
    """Trainable text-classification task over the pNLP-Mixer (IMDB path)."""

    #: serving-eval contract: step() argmaxes softmax logits, so
    #: evaluate_serving may apply plain multiclass semantics (serving.py)
    plain_multiclass = True

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        self.num_classes = int(model_cfg.seq_cls.num_classes)
        super().__init__(model_cfg, optimizer_cfg, **kwargs)

    def build_network(self):
        from flax.core import FrozenDict

        m = self.model_cfg
        return PnlpMixerSeqCls(
            bottleneck_cfg=FrozenDict(dict(m.bottleneck)),
            mixer_cfg=FrozenDict(dict(m.mixer)),
            seq_cls_cfg=FrozenDict(dict(m.seq_cls)),
        )

    def network_inputs(self, batch):
        return {"x": batch["text"]}

    def step(self, params, batch, ctx, rngs, train: bool):
        logits, _ = self.apply_network(
            params, dict(self.network_inputs(batch), deterministic=not train),
            rngs, train, prune_sparsity=self.prune_sparsity(ctx),
        )
        labels = batch["label"]
        loss = self.ce(logits, labels)
        preds = jnp.argmax(jax.nn.softmax(logits, axis=1), axis=1)
        return loss, {"losses": {"loss": loss}, "preds": preds, "labels": labels}

    def setup_scores(self):
        import copy

        scores = dict(
            acc=tm.Accuracy(task="multiclass", num_classes=self.num_classes),
            f1m=tm.F1Score(task="multiclass", num_classes=self.num_classes, average="macro"),
        )
        return [copy.deepcopy(scores) for _ in range(3)]
