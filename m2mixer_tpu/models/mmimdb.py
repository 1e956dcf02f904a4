"""MM-IMDB task models (poster image + plot text, 23-genre multilabel).

Re-expresses ``/root/reference/models/mmimdb.py`` (MultiLoss mixer with
per-class-pos-weighted BCE and plain-sum weighting) and the unimodal
baselines of ``/root/reference/models/mmimdb_gmlp.py`` (VGG19-bn with a
swapped 23-way head; VisiongMLP image-only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import DictConfig, todict
from ..modules.common import Dropout, Linear, torch_bias_init
from ..modules.losses import bce_with_logits_loss
from ..training import metrics as tm
from .base import MultiLossTask, TrainTask
from .nets import build_multimodal_net

__all__ = ["MMIMDBMixerMultiLoss", "MMIDB_GMLP", "MMIDB_GMLP_ext", "VGG19BN",
           "load_torch_state", "load_torch_vgg19_bn"]


def _multilabel_scores(num_labels: int):
    # weighted + macro multilabel F1 (`models/mmimdb.py:184-192`)
    return dict(
        f1w=tm.F1Score(task="multilabel", num_labels=num_labels, average="weighted"),
        f1m=tm.F1Score(task="multilabel", num_labels=num_labels, average="macro"),
    )


class MMIMDBMixerMultiLoss(MultiLossTask):
    """3 BCE-with-pos-weight heads, plain-sum combine
    (parity: `models/mmimdb.py:21-228`)."""

    modalities = ("image", "text")
    weighting = "sum"
    anneal_on = "none"

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.log_confusion_matrix = False
        self.pos_weight = jnp.asarray(np.asarray(model_cfg.pos_weight, np.float32))
        self.num_labels = int(model_cfg.modalities.classification.num_classes)

    def build_network(self):
        return build_multimodal_net(self.model_cfg, ("image", "text"))

    def network_inputs(self, batch):
        return {"inputs": (batch["image"], batch["text"])}

    def branch_losses(self, outputs, batch, ctx):
        labels = batch["label"].astype(jnp.float32)
        img_logits, text_logits = outputs["branch_logits"]
        return {
            "image": self.bce(img_logits, labels, self.pos_weight),
            "text": self.bce(text_logits, labels, self.pos_weight),
            "fusion": self.bce(outputs["logits"], labels, self.pos_weight),
        }

    def predictions(self, outputs, batch):
        img_logits, text_logits = outputs["branch_logits"]
        th = lambda z: (jax.nn.sigmoid(z) > 0.5).astype(jnp.int32)
        return {
            "preds": th(outputs["logits"]),
            "preds_image": th(img_logits),
            "preds_text": th(text_logits),
            "labels": batch["label"],
            "logits": outputs["logits"],
            "image_logits": img_logits,
            "text_logits": text_logits,
        }

    def setup_scores(self):
        return [_multilabel_scores(self.num_labels) for _ in range(3)]

    def epoch_log_keys(self):
        return ("loss_image", "loss_text", "loss_fusion")

    def test_artifact_keys(self):
        return ("preds", "preds_image", "preds_text", "labels",
                "image_logits", "text_logits", "logits")

    def gradblend_loss(self, logits, batch):
        return bce_with_logits_loss(logits, batch["label"].astype(jnp.float32), self.pos_weight)


# hardcoded pos-weights of the unimodal baselines (`mmimdb_gmlp.py:37-43`
# uses one set for VGG, `:78-84` the processed-set weights for gMLP-ext)
_VGG_POS_WEIGHT = np.asarray(
    [4.69368723, 7.20594714, 11.74685817, 12.27579737, 16.86340206, 17.9260274,
     24.32342007, 25.96428571, 31.45673077, 32.55223881, 34.80319149, 31.60869565,
     37.17613636, 44.81506849, 57.90265487, 56.89565217, 61.72641509, 60.02752294,
     82.82278481, 94.82608696, 96.22058824, 110.89830508, 198.27272727], np.float32)

_EXT_POS_WEIGHT = np.asarray(
    [4.57642832, 7.38544978, 10.79846869, 13.23391421, 15.59020924, 18.62735849,
     22.48861048, 25.21711367, 74.50943396, 31.31641554, 31.79549114, 32.90833333,
     39.64859438, 56.90201729, 40.46106557, 58.24483776, 67.3890785, 84.92473118,
     58.33087149, 62.68253968, 114.13294798, 141.54121864, 116.83431953], np.float32)

# VGG19 feature plan: conv widths with 'M' = 2x2 max pool (torchvision E-cfg)
_VGG19_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class VGG19BN(nn.Module):
    """VGG19 with batch norm, NCHW input.

    TPU-native re-expression of torchvision's ``vgg19_bn`` used by the
    reference baseline (`mmimdb_gmlp.py:19-28`). Pretrained ImageNet weights
    are not bundled (no network egress); ``load_torch_state`` below converts
    a torchvision state_dict when one is available on disk.
    """

    num_classes: int = 23
    dtype: Optional[type] = None
    #: True = torch-style training BN (batch statistics in train mode,
    #: running stats updated through the 'batch_stats' mutable collection,
    #: threaded by the trainer when the task sets mutable_collections).
    #: False (default) = frozen-statistics BN — standard for fine-tuning a
    #: pretrained VGG, and a pure params->grads train step.
    train_bn: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC for conv
        for i, spec in enumerate(_VGG19_PLAN):
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(spec, (3, 3), padding=1, dtype=self.dtype,
                        kernel_init=nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
                        name=f"conv_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=(deterministic if self.train_bn else True),
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn_{i}")(x)
            x = nn.relu(x)
        # adaptive pool to 7x7 like torchvision, then the swapped classifier
        b, h, w, c = x.shape
        if (h, w) != (7, 7):
            x = jax.image.resize(x, (b, 7, 7, c), method="linear")
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)  # channel-major flatten
        x = Linear(512 * 7 * 7, 4096, name="fc1")(x)
        x = nn.relu(x)
        x = Dropout(0.5)(x, deterministic)
        x = Linear(4096, 4096, name="fc2")(x)
        x = nn.relu(x)
        x = Dropout(0.5)(x, deterministic)
        return Linear(4096, self.num_classes, name="fc3")(x)


def load_torch_state(variables: dict, state_dict) -> dict:
    """torchvision ``vgg19_bn`` state_dict -> ``VGG19BN`` flax variables.

    Reproduces the reference baseline's weight provenance
    (`/root/reference/models/mmimdb_gmlp.py:19-28`): it loads torchvision's
    pretrained ``vgg19_bn`` and swaps ``classifier[6]`` for a fresh 23-class
    Linear. Accordingly, conv/BN stacks and fc1/fc2 are always imported
    (including BN running statistics into ``batch_stats``); the final head
    is imported only when its width matches the flax head (e.g. a saved
    fine-tuned 23-class state_dict) and otherwise keeps the fresh
    random-initialized head, exactly like the reference's swap.

    ``variables``: the tree from ``VGG19BN().init(...)``; returns a new tree
    of the same structure with imported values (numpy leaves).
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}
    params = jax.tree.map(np.asarray, todict(variables["params"]))
    stats = jax.tree.map(np.asarray, todict(variables["batch_stats"]))

    fidx = 0  # index into torchvision's features Sequential
    for i, spec in enumerate(_VGG19_PLAN):
        if spec == "M":
            fidx += 1  # MaxPool2d occupies one slot
            continue
        w = sd[f"features.{fidx}.weight"]  # torch conv (out, in, kh, kw)
        params[f"conv_{i}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "bias": sd[f"features.{fidx}.bias"],
        }
        params[f"bn_{i}"] = {
            "scale": sd[f"features.{fidx + 1}.weight"],
            "bias": sd[f"features.{fidx + 1}.bias"],
        }
        stats[f"bn_{i}"] = {
            "mean": sd[f"features.{fidx + 1}.running_mean"],
            "var": sd[f"features.{fidx + 1}.running_var"],
        }
        fidx += 3  # Conv2d, BatchNorm2d, ReLU
    for name, tidx in (("fc1", 0), ("fc2", 3), ("fc3", 6)):
        w = sd[f"classifier.{tidx}.weight"]
        if name == "fc3" and w.shape[0] != params["fc3"]["linear"]["bias"].shape[0]:
            continue  # ImageNet 1000-way head: keep the swapped fresh head
        params[name] = {"linear": {
            "kernel": np.ascontiguousarray(w.T),
            "bias": sd[f"classifier.{tidx}.bias"],
        }}
    return {"params": params, "batch_stats": stats}


def load_torch_vgg19_bn(variables: dict, path: str) -> dict:
    """Convenience wrapper: load a ``.pth``/``.ckpt`` torchvision vgg19_bn
    state_dict from disk and convert via ``load_torch_state``."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return load_torch_state(variables, ckpt.get("state_dict", ckpt))


class _UnimodalMultilabelTask(TrainTask):
    pos_weight: np.ndarray = _VGG_POS_WEIGHT

    def network_inputs(self, batch):
        return {"x": batch["image"]}

    def predictions(self, outputs, batch):
        """Serving-eval adapter (serving.py::evaluate_serving): the same
        sigmoid>0.5 multilabel semantics step() computes — without this,
        serving evaluation of the VGG/gMLP baselines would refuse (they
        are NOT plain multiclass)."""
        probs = jax.nn.sigmoid(outputs["logits"])
        return {"preds": (probs > 0.5).astype(jnp.int32),
                "labels": batch["label"], "probs": probs}

    def step(self, params, batch, ctx, rngs, train: bool):
        kwargs = dict(self.network_inputs(batch), deterministic=not train)
        logits, new_state = self.apply_network(
            params, kwargs, rngs, train,
            prune_sparsity=self.prune_sparsity(ctx))
        labels = batch["label"].astype(jnp.float32)
        loss = self.bce(logits, labels, jnp.asarray(self.pos_weight))
        preds = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.int32)
        aux = {"losses": {"loss": loss}, "preds": preds, "labels": batch["label"]}
        if new_state is not None:
            aux["_mutable_state"] = new_state
        return loss, aux

    def setup_scores(self):
        return [_multilabel_scores(23) for _ in range(3)]


class MMIDB_GMLP(_UnimodalMultilabelTask):
    """VGG19-bn image-only baseline (parity: `mmimdb_gmlp.py:14-67`).

    ``model.train_bn: true`` enables torch-training-mode BatchNorm (batch
    statistics in train mode + running-stat updates threaded through the
    trainer's mutable-state path), matching the reference's un-frozen
    fine-tune exactly; the default keeps frozen statistics."""

    pos_weight = _VGG_POS_WEIGHT

    def __init__(self, model_cfg, optimizer_cfg, **kwargs):
        self._train_bn = bool(model_cfg.get("train_bn", False))
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        if self._train_bn:
            self.mutable_collections = ("batch_stats",)

    def build_network(self):
        return VGG19BN(num_classes=23, train_bn=self._train_bn)


class MMIDB_GMLP_ext(_UnimodalMultilabelTask):
    """VisiongMLP image-only baseline (parity: `mmimdb_gmlp.py:70-103`)."""

    pos_weight = _EXT_POS_WEIGHT

    def build_network(self):
        from ..modules import get_block_by_name

        cfg = DictConfig(self.model_cfg.modalities.image)
        cfg.setdefault("block_type", "VisiongMLP")
        net = get_block_by_name(**cfg, dropout=self.model_cfg.get("dropout", 0.0))

        class _WithHead(nn.Module):
            body: type(net) = net
            d_model: int = cfg.get("d_model", 128)

            @nn.compact
            def __call__(self, x, deterministic: bool = True):
                tokens = self.body(x, deterministic)
                pooled = tokens.mean(axis=1)
                return Linear(self.d_model, 23, name="head")(pooled)

        return _WithHead()
