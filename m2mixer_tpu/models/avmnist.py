"""AV-MNIST task models (image digits + audio spectrograms, 10 classes).

Re-expresses ``/root/reference/models/avmnist.py``: the unimodal mixers, the
bimodal single-loss mixer, the flagship ``AVMnistMixerMultiLoss`` (3 CE
heads, fixed/annealed/SoftAdapt/GradBlend weighting, modality freezing and
random muting), and the evidential-uncertainty variant.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config import DictConfig
from ..modules import get_block_by_name, get_classifier_by_name, get_fusion_by_name
from ..modules.common import Linear
from ..modules.losses import EDLMSELoss
from ..training import metrics as tm
from .base import MultiLossTask, TrainTask
from .nets import MultimodalNet, pool_tokens

__all__ = [
    "AVMnistImageMixer",
    "AVMnistAudioMixer",
    "AVMnistMixer",
    "AVMnistMixerMultiLoss",
    "AVMnistMixerMultiLossUQ",
]


def _multiclass_scores(num_classes: int, extended: bool,
                       calibration: bool = False) -> Dict[str, tm._BaseMetric]:
    """The reference's torchmetrics sets: 4 macro metrics for the MultiLoss
    models (`models/avmnist.py:366-380`), plus micro variants for the
    single-loss models (`:56-79`). ``calibration`` (beyond reference,
    ``model.log_calibration``) adds top-label ECE over the predicted
    probabilities the task emits under the same flag."""
    scores = dict(
        acc=tm.Accuracy(task="multiclass", num_classes=num_classes),
        f1m=tm.F1Score(task="multiclass", num_classes=num_classes, average="macro"),
        prec_m=tm.Precision(task="multiclass", num_classes=num_classes, average="macro"),
        rec_m=tm.Recall(task="multiclass", num_classes=num_classes, average="macro"),
    )
    if extended:
        scores.update(
            f1mi=tm.F1Score(task="multiclass", num_classes=num_classes, average="micro"),
            prec_mi=tm.Precision(task="multiclass", num_classes=num_classes, average="micro"),
            rec_mi=tm.Recall(task="multiclass", num_classes=num_classes, average="micro"),
        )
    if calibration:
        scores["ece"] = tm.CalibrationError(task="multiclass",
                                            num_classes=num_classes)
    return scores


def build_avmnist_net(model_cfg: DictConfig, head_pool: bool = True) -> MultimodalNet:
    """Registry-driven construction, parity with the reference constructor
    (`models/avmnist.py:181-191`) including fusion shape inference."""
    from .nets import build_multimodal_net

    return build_multimodal_net(model_cfg, ("image", "audio"), head_pool=head_pool)


class _UnimodalMixerTask(TrainTask):
    """Shared logic of the unimodal AV-MNIST baselines
    (`/root/reference/models/avmnist.py:93-120`)."""

    modality: str = "image"
    #: serving-eval contract: step() argmaxes softmax logits (serving.py)
    plain_multiclass = True

    def build_network(self):
        mc = self.model_cfg.modalities
        enc = get_block_by_name(**mc[self.modality], dropout=self.model_cfg.get("dropout", 0.0))
        head = Linear(mc[self.modality].hidden_dim, mc.classification.num_classes)
        return MultimodalNet(
            encoders=(enc,), heads=(head,),
            fusion=lambda x: x, fusion_mixer=_Identity(), classifier=_Identity(),
        )

    def network_inputs(self, batch):
        return {"inputs": (batch[self.modality],)}

    def step(self, params, batch, ctx, rngs, train: bool):
        outputs, _ = self.apply_network(
            params, dict(self.network_inputs(batch), deterministic=not train),
            rngs, train, prune_sparsity=self.prune_sparsity(ctx),
        )
        logits = outputs["branch_logits"][0]
        labels = batch["label"]
        loss = self.ce(logits, labels)
        preds = jnp.argmax(jax.nn.softmax(logits, axis=1), axis=1)
        return loss, {"losses": {"loss": loss}, "preds": preds, "labels": labels}

    def setup_scores(self) -> List[Optional[Dict]]:
        n = self.model_cfg.modalities.classification.num_classes
        return [_multiclass_scores(n, extended=True) for _ in range(3)]


class _Identity:
    """Parameter-free passthrough usable as a static flax field."""

    def __call__(self, x, *a, **k):
        return x


class AVMnistImageMixer(_UnimodalMixerTask):
    modality = "image"


class AVMnistAudioMixer(_UnimodalMixerTask):
    modality = "audio"


class AVMnistMixer(TrainTask):
    """Bimodal mixer with a single fused CE loss
    (parity: `/root/reference/models/avmnist.py:123-163`)."""

    #: serving-eval contract: step() argmaxes softmax logits (serving.py)
    plain_multiclass = True

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.mute = model_cfg.get("mute", None)

    def build_network(self):
        return build_avmnist_net(self.model_cfg)

    def network_inputs(self, batch):
        return {"inputs": (batch["image"], batch["audio"])}

    def step(self, params, batch, ctx, rngs, train: bool):
        # static mute applies in every mode here (`models/avmnist.py:144-147`)
        mute_code = {"image": 0, "audio": 1}.get(self.mute, -1)
        outputs, _ = self.apply_network(
            params,
            dict(self.network_inputs(batch), deterministic=not train,
                 mute_code=jnp.int32(mute_code)),
            rngs, train, prune_sparsity=self.prune_sparsity(ctx),
        )
        logits = outputs["logits"]
        labels = batch["label"]
        loss = self.ce(logits, labels)
        preds = jnp.argmax(jax.nn.softmax(logits, axis=1), axis=1)
        return loss, {"losses": {"loss": loss}, "preds": preds, "labels": labels}

    def setup_scores(self):
        n = self.model_cfg.modalities.classification.num_classes
        return [_multiclass_scores(n, extended=True) for _ in range(3)]


class AVMnistMixerMultiLoss(MultiLossTask):
    """The flagship: 3 CE losses (image / audio / fusion) with the full
    weighting/freezing/muting recipe
    (parity: `/root/reference/models/avmnist.py:166-444`)."""

    modalities = ("image", "audio")

    def build_network(self):
        return build_avmnist_net(self.model_cfg)

    def network_inputs(self, batch):
        return {"inputs": (batch["image"], batch["audio"])}

    @property
    def num_classes(self) -> int:
        return self.model_cfg.modalities.classification.num_classes

    def branch_losses(self, outputs, batch, ctx):
        labels = batch["label"]
        img_logits, aud_logits = outputs["branch_logits"]
        return {
            "image": self.ce(img_logits, labels),
            "audio": self.ce(aud_logits, labels),
            "fusion": self.ce(outputs["logits"], labels),
        }

    @property
    def log_calibration(self) -> bool:
        """``model.log_calibration`` (beyond reference): adds a top-label
        ECE score fed from the fusion-head probabilities."""
        return bool(self.model_cfg.get("log_calibration", False))

    def predictions(self, outputs, batch):
        img_logits, aud_logits = outputs["branch_logits"]
        sm = lambda z: jnp.argmax(jax.nn.softmax(z, axis=1), axis=1)
        out = {
            "preds": sm(outputs["logits"]),
            "preds_image": sm(img_logits),
            "preds_audio": sm(aud_logits),
            "labels": batch["label"],
            "logits": outputs["logits"],
            "image_logits": img_logits,
            "audio_logits": aud_logits,
        }
        if self.log_calibration:
            out["probs"] = jax.nn.softmax(outputs["logits"], axis=1)
        return out

    def setup_scores(self):
        return [_multiclass_scores(self.num_classes, extended=False,
                                   calibration=self.log_calibration)
                for _ in range(3)]

    def test_artifact_keys(self):
        # parity with the reference's test_preds dump (`models/avmnist.py:382-398`)
        return ("preds", "preds_image", "preds_audio", "labels",
                "image_logits", "audio_logits", "logits")


class AVMnistMixerMultiLossUQ(AVMnistMixerMultiLoss):
    """Evidential-uncertainty variant: EDL-MSE per branch, prediction taken
    from the least-uncertain branch
    (parity: `/root/reference/models/avmnist.py:447-572`)."""

    weighting = "sum"  # plain sum (`models/avmnist.py:511`)

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.edl = EDLMSELoss(self.num_classes, 10)

    def branch_losses(self, outputs, batch, ctx):
        labels = batch["label"]
        epoch = ctx["epoch"]
        img_logits, aud_logits = outputs["branch_logits"]
        return {
            "image": self.edl(img_logits, labels, epoch),
            "audio": self.edl(aud_logits, labels, epoch),
            "fusion": self.edl(outputs["logits"], labels, epoch),
        }

    def predictions(self, outputs, batch):
        img_logits, aud_logits = outputs["branch_logits"]
        logits = outputs["logits"]
        ev = jax.nn.relu(logits)
        ev_i = jax.nn.relu(img_logits)
        ev_a = jax.nn.relu(aud_logits)
        preds = ev.argmax(axis=1)
        preds_i = ev_i.argmax(axis=1)
        preds_a = ev_a.argmax(axis=1)
        K = self.num_classes
        u = K / (ev + 1).sum(axis=1)
        u_i = K / (ev_i + 1).sum(axis=1)
        u_a = K / (ev_a + 1).sum(axis=1)
        # least-uncertain branch via argmin (`models/avmnist.py:525-537`);
        # the reference's three strict-< masks yield class 0 on exact ties —
        # argmin instead falls back to the fusion branch (index 0) prediction
        branch_preds = jnp.stack([preds, preds_i, preds_a], axis=0)
        branch_u = jnp.stack([u, u_i, u_a], axis=0)
        combined = jnp.take_along_axis(
            branch_preds, jnp.argmin(branch_u, axis=0)[None, :], axis=0
        )[0]
        out = {
            "preds": combined,
            "preds_image": preds_i,
            "preds_audio": preds_a,
            "labels": batch["label"],
            "logits": logits,
            "image_logits": img_logits,
            "audio_logits": aud_logits,
            "uncertainty": u.mean(),
            "uncertainty_image": u_i.mean(),
            "uncertainty_audio": u_a.mean(),
        }
        if self.log_calibration:
            # EDL predictive probabilities of the fusion head: alpha / S
            # (Sensoy et al. 2018) — the distribution the EDL loss trains,
            # so ECE here measures the evidential calibration directly
            alpha = ev + 1.0
            out["probs"] = alpha / alpha.sum(axis=1, keepdims=True)
        return out

    def epoch_scalar_keys(self):
        # per-epoch mean uncertainties (`models/avmnist.py:556-572`), plus
        # whatever the base declares (moe_aux for MoE configs)
        return tuple(super().epoch_scalar_keys()) + (
            "uncertainty", "uncertainty_image", "uncertainty_audio")
