"""Import PyTorch-Lightning reference checkpoints into m2mixer_tpu params.

The reference publishes pretrained checkpoints (``README.md:109-115``) saved
by Lightning from ``AVMnistMixerMultiLoss``-style modules. This module maps
that state_dict naming (derived from the reference's module structure:
``image_mixer.to_patch_embedding.0.weight``,
``image_mixer.mixer_blocks.N.token_mix.2.net.0.weight``,
``classifier_fusion.classifer.weight`` — note the reference's 'classifer'
typo) onto this framework's parameter tree, so checkpoint-level fidelity is
testable whenever a reference checkpoint is available.

Covers the MLPMixer + FusionMixer + Linear-heads + StandardClassifier
topology used by every shipped M2-Mixer config (AV-MNIST S/M/B, MM-IMDB,
and the modality pairs that follow the same shape).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = ["convert_reference_state_dict", "export_reference_state_dict",
           "load_lightning_checkpoint"]


def load_lightning_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a Lightning ``.ckpt`` and return its state_dict as numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def _linear(sd, prefix):
    return {
        "linear": {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }
    }


def _ln(sd, prefix):
    return {"LayerNorm_0": {"scale": np.asarray(sd[f"{prefix}.weight"]),
                            "bias": np.asarray(sd[f"{prefix}.bias"])}}


def _ff(sd, prefix):
    # reference FeedForward: net.0 = Linear, net.3 = Linear (`mixer.py:9-22`)
    return {"fc1": _linear(sd, f"{prefix}.net.0"), "fc2": _linear(sd, f"{prefix}.net.3")}


def _mixer_blocks(sd, prefix, n_blocks):
    out = {}
    for i in range(n_blocks):
        b = f"{prefix}.mixer_blocks.{i}"
        out[f"block_{i}"] = {
            # token_mix: Sequential(LN, Rearrange, FF, Rearrange) (`mixer.py:30-35`)
            "norm_token": _ln(sd, f"{b}.token_mix.0"),
            "token_mix": _ff(sd, f"{b}.token_mix.2"),
            # channel_mix: Sequential(LN, FF) (`mixer.py:37-40`)
            "norm_channel": _ln(sd, f"{b}.channel_mix.0"),
            "channel_mix": _ff(sd, f"{b}.channel_mix.1"),
        }
    out["norm_out"] = _ln(sd, f"{prefix}.layer_norm")
    return out


def _count_blocks(sd, prefix):
    n = 0
    while f"{prefix}.mixer_blocks.{n}.token_mix.0.weight" in sd:
        n += 1
    return n


def _mlp_mixer(sd, prefix):
    out = _mixer_blocks(sd, prefix, _count_blocks(sd, prefix))
    # Conv2d(k=s=p) patch embed -> our reshape+GEMM: torch conv weight
    # (out, in, kh, kw) flattens to (out, in*kh*kw); our kernel is its T and
    # PatchEmbed flattens patches in the same (c, p1, p2) order.
    w = np.asarray(sd[f"{prefix}.to_patch_embedding.0.weight"])
    out["patch_embed"] = {"proj": {"linear": {
        "kernel": np.ascontiguousarray(w.reshape(w.shape[0], -1).T),
        "bias": np.asarray(sd[f"{prefix}.to_patch_embedding.0.bias"]),
    }}}
    return out


def convert_reference_state_dict(
    state_dict: Dict[str, np.ndarray],
    modalities: Sequence[str] = ("image", "audio"),
) -> dict:
    """Reference MultiLoss state_dict -> ``{'params': ...}`` for the
    ``MultimodalNet`` built by the corresponding task."""
    sd = state_dict
    params = {}
    # the reference names encoders '<modality>_mixer' (`avmnist.py:181-182`)
    for i, m in enumerate(modalities):
        params[f"encoders_{i}"] = _mlp_mixer(sd, f"{m}_mixer")
        params[f"heads_{i}"] = _linear(sd, f"classifier_{m}")
    params["fusion_mixer"] = _mixer_blocks(
        sd, "fusion_mixer", _count_blocks(sd, "fusion_mixer")
    )
    # StandardClassifier stores its Linear as 'classifer' (reference typo,
    # `classification.py:87`)
    if "classifier_fusion.classifer.weight" in sd:
        params["classifier"] = {"cls": _linear(sd, "classifier_fusion.classifer")}
    return {"params": params}


def export_reference_state_dict(variables: dict,
                                modalities: Sequence[str] = ("image", "audio"),
                                patch_conv_shapes: Dict[str, tuple] = None) -> Dict[str, np.ndarray]:
    """Inverse mapping: our params -> reference-named torch state_dict
    (numpy values). ``patch_conv_shapes[m] = (in_channels, patch, patch)``
    recovers the conv layout of each patch embed."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, node):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(node["linear"]["kernel"]).T)
        sd[f"{prefix}.bias"] = np.asarray(node["linear"]["bias"])

    def put_ln(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["LayerNorm_0"]["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["LayerNorm_0"]["bias"])

    def put_blocks(prefix, node):
        i = 0
        while f"block_{i}" in node:
            b = node[f"block_{i}"]
            put_ln(f"{prefix}.mixer_blocks.{i}.token_mix.0", b["norm_token"])
            put_linear(f"{prefix}.mixer_blocks.{i}.token_mix.2.net.0", b["token_mix"]["fc1"])
            put_linear(f"{prefix}.mixer_blocks.{i}.token_mix.2.net.3", b["token_mix"]["fc2"])
            put_ln(f"{prefix}.mixer_blocks.{i}.channel_mix.0", b["norm_channel"])
            put_linear(f"{prefix}.mixer_blocks.{i}.channel_mix.1.net.0", b["channel_mix"]["fc1"])
            put_linear(f"{prefix}.mixer_blocks.{i}.channel_mix.1.net.3", b["channel_mix"]["fc2"])
            i += 1
        put_ln(f"{prefix}.layer_norm", node["norm_out"])

    for i, m in enumerate(modalities):
        enc = p[f"encoders_{i}"]
        put_blocks(f"{m}_mixer", enc)
        kernel = np.asarray(enc["patch_embed"]["proj"]["linear"]["kernel"])
        shape = (patch_conv_shapes or {}).get(m)
        w = kernel.T  # (out, in*p*p)
        if shape is not None:
            w = w.reshape(w.shape[0], *shape)
        sd[f"{m}_mixer.to_patch_embedding.0.weight"] = np.ascontiguousarray(w)
        sd[f"{m}_mixer.to_patch_embedding.0.bias"] = np.asarray(
            enc["patch_embed"]["proj"]["linear"]["bias"])
        put_linear(f"classifier_{m}", p[f"heads_{i}"])
    put_blocks("fusion_mixer", p["fusion_mixer"])
    if "classifier" in p and "cls" in p["classifier"]:
        put_linear("classifier_fusion.classifer", p["classifier"]["cls"])
    return sd
