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

Migration CLI (the reference user's switch-over path)::

    python -m m2mixer_tpu.utils.torch_import last.ckpt \\
        -c cfg/avmnist/avmnist_m2-mixer_B.yml -o run_dir/checkpoints

writes a native checkpoint directory (Orbax pytree + ``index.json``) that
``run.py -m test -p DIR/epoch_N`` evaluates and ``-p``/``auto_resume``
continues training from — the Lightning epoch/global-step counters carry
over, the optimizer state starts fresh (Lightning's Adam moments are not
transferable across frameworks).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["convert_reference_state_dict", "export_reference_state_dict",
           "load_lightning_checkpoint", "import_checkpoint", "main"]


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
    if f"{prefix}.bottleneck.weight" in sd:
        # PNLPMixer text encoder: Linear bottleneck instead of a patch
        # embed (`/root/reference/modules/mixer.py:244-245`)
        out["bottleneck"] = _linear(sd, f"{prefix}.bottleneck")
        return out
    # Conv2d(k=s=p) patch embed -> our reshape+GEMM: torch conv weight
    # (out, in, kh, kw) flattens to (out, in*kh*kw); our kernel is its T and
    # PatchEmbed flattens patches in the same (c, p1, p2) order.
    w = np.asarray(sd[f"{prefix}.to_patch_embedding.0.weight"])
    out["patch_embed"] = {"proj": {"linear": {
        "kernel": np.ascontiguousarray(w.reshape(w.shape[0], -1).T),
        "bias": np.asarray(sd[f"{prefix}.to_patch_embedding.0.bias"]),
    }}}
    return out


def _mlp(sd, prefix, num_blocks, has_output):
    """Reference MLP ``module_list.{3i}`` Linears -> fc_i (+ fc_out)
    (`/root/reference/modules/mlp.py:11-21`). ``num_blocks``/``has_output``
    come from the model config — the flat index list alone cannot
    distinguish 'N blocks + output Linear' from 'N+1 blocks'."""
    out = {}
    for i in range(num_blocks):
        out[f"fc_{i}"] = _linear(sd, f"{prefix}.module_list.{3 * i}")
    if has_output:
        out["fc_out"] = _linear(sd, f"{prefix}.module_list.{3 * num_blocks}")
    return out


def _gru(sd, prefix, hidden_dim):
    """torch ``nn.GRU`` l0 weights -> TorchGRUCell params (bijective — the
    cell carries torch's exact double-bias parameterization,
    modules/recurrent.py)."""
    H = hidden_dim
    out = {}
    for stacked, gates in (("ih", ("ir", "iz", "in")),
                           ("hh", ("hr", "hz", "hn"))):
        w = np.asarray(sd[f"{prefix}.weight_{stacked}_l0"])
        b = np.asarray(sd[f"{prefix}.bias_{stacked}_l0"])
        for g, gate in enumerate(gates):
            out[gate] = {
                "kernel": np.ascontiguousarray(w[g * H:(g + 1) * H].T),
                "bias": b[g * H:(g + 1) * H],
            }
    return out


def convert_mimic_state_dict(state_dict: Dict[str, np.ndarray],
                             model_cfg) -> dict:
    """Reference MimicMixerMultiLoss state_dict -> native params
    (inverse of ``export_mimic_state_dict``; `/root/reference/models/
    mimic.py:24-124`)."""
    sd = state_dict
    s, t = model_cfg.modalities.static, model_cfg.modalities.time
    params = {
        "encoders_0": _mlp(sd, "static_extractor", int(s.num_blocks),
                           s.get("output_dim") is not None),
        "encoders_1": dict(
            _mixer_blocks(sd, "time_mixer", _count_blocks(sd, "time_mixer")),
            proj=_linear(sd, "time_mixer.proj")),
        "heads_0": _linear(sd, "classifier_static"),
        "heads_1": _linear(sd, "classifier_time"),
        "fusion_mixer": _mixer_blocks(sd, "fusion_mixer",
                                      _count_blocks(sd, "fusion_mixer")),
        "classifier": {"cls": _linear(sd, "classifier_fusion.classifer")},
    }
    return {"params": params}


def convert_mimic_gru_state_dict(state_dict: Dict[str, np.ndarray],
                                 model_cfg) -> dict:
    """Reference MimicRecurrent state_dict -> native params (inverse of
    ``export_mimic_gru_state_dict``; `/root/reference/models/mimic.py:
    210-267`)."""
    sd = state_dict
    m = model_cfg.modalities
    params = {
        "encoders_0": _mlp(sd, "static_extractor", int(m.static.num_blocks),
                           m.static.get("output_dim") is not None),
        "encoders_1": {"GRUCell_0": _gru(sd, "time_encoder.gru",
                                         int(m.time.hidden_dim))},
        "heads_0": _linear(sd, "classifier_static"),
        "heads_1": _linear(sd, "classifier_time"),
        "fusion_encoder": _mlp(sd, "fusion_encoder",
                               int(m.multimodal.num_blocks),
                               m.multimodal.get("output_dim") is not None),
        "classifier": {"cls": _linear(sd, "classifier_fusion.classifer")},
    }
    return {"params": params}


def convert_reference_state_dict(
    state_dict: Dict[str, np.ndarray],
    modalities: Sequence[str] = ("image", "audio"),
) -> dict:
    """Reference MultiLoss state_dict -> ``{'params': ...}`` for the
    ``MultimodalNet`` built by the corresponding task."""
    sd = state_dict
    params = {}
    # the reference names encoders '<modality>_mixer' (`avmnist.py:181-182`);
    # the MMHS OCR modality is named 'text_ocr' in its module tree
    # (`mmhs150.py:38,47`)
    for i, m in enumerate(modalities):
        m = {"ocr": "text_ocr"}.get(m, m)
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
        if "bottleneck" in enc:
            # PNLPMixer text encoder: Linear bottleneck instead of a patch
            # embed (`/root/reference/modules/mixer.py:244-245`)
            put_linear(f"{m}_mixer.bottleneck", enc["bottleneck"])
        else:
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
    if "fusion" in p and "mod1_hidden" in p["fusion"]:
        # parametered GMU fusion (`/root/reference/models/avmnist.py:183`
        # names it 'fusion_function'; weights `fusion.py:9-14`)
        for leaf in ("mod1_hidden", "mod2_hidden", "z_hidden"):
            put_linear(f"fusion_function.{leaf}", p["fusion"][leaf])
    if "classifier" in p and "cls" in p["classifier"]:
        put_linear("classifier_fusion.classifer", p["classifier"]["cls"])
    return sd


def export_gmlp_state_dict(variables: dict,
                           modalities: Sequence[str] = ("image", "audio"),
                           ) -> Dict[str, np.ndarray]:
    """gMLP-topology params -> reference-named torch state_dict
    (`/root/reference/modules/gmpl.py`): VisiongMLP encoders (Linear
    ``patch_embedding`` + ``gmlp.blocks.N`` of norm/proj_1/
    spatial_gating_unit{norm,proj}/proj_2) and the cls-token FusiongMLP.
    The reference VisiongMLP's UNUSED ``cls_token`` (`gmpl.py:105`, never
    in the forward) has no native counterpart and is not emitted."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_dense(prefix, node):  # plain nn.Dense leaves (no 'linear' child)
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
        sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    def put_linear(prefix, node):  # common.Linear leaves
        put_dense(prefix, node["linear"])

    def put_ln(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["LayerNorm_0"]["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["LayerNorm_0"]["bias"])

    def put_gmlp(prefix, node):
        i = 0
        while f"block_{i}" in node:
            b = node[f"block_{i}"]
            put_ln(f"{prefix}.blocks.{i}.norm", b["norm"])
            put_dense(f"{prefix}.blocks.{i}.proj_1", b["proj_1"])
            put_ln(f"{prefix}.blocks.{i}.spatial_gating_unit.norm",
                   b["sgu"]["norm"])
            put_dense(f"{prefix}.blocks.{i}.spatial_gating_unit.proj",
                      b["sgu"]["proj"])
            put_dense(f"{prefix}.blocks.{i}.proj_2", b["proj_2"])
            i += 1

    for i, m in enumerate(modalities):
        enc = p[f"encoders_{i}"]
        put_dense(f"{m}_mixer.patch_embedding", enc["patch_embedding"])
        put_gmlp(f"{m}_mixer.gmlp", enc["gmlp"])
        put_linear(f"classifier_{m}", p[f"heads_{i}"])
    fm = p["fusion_mixer"]
    sd["fusion_mixer.cls_token"] = np.asarray(fm["cls_token"])
    put_gmlp("fusion_mixer.gmlp", fm["gmlp"])
    put_linear("classifier_fusion.classifer", p["classifier"]["cls"])
    return sd


def export_dyna_state_dict(variables: dict,
                           patch_conv_shapes: Dict[str, tuple],
                           modalities: Sequence[str] = ("image", "audio"),
                           ) -> Dict[str, np.ndarray]:
    """DynaMixer-topology params -> reference-named torch state_dict
    (`/root/reference/modules/dynamixer.py`): per block mix_h/mix_w
    (compress/generate/out), bias-free mlp_c, 3-way reweight FeedForward,
    proj; conv patch embed keeping the grid."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, node):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(node["linear"]["kernel"]).T)
        if "bias" in node["linear"]:
            sd[f"{prefix}.bias"] = np.asarray(node["linear"]["bias"])

    def put_ln(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["LayerNorm_0"]["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["LayerNorm_0"]["bias"])

    def put_op(prefix, node):
        for leaf in ("compress", "generate", "out"):
            put_linear(f"{prefix}.{leaf}", node[leaf])

    def put_blocks(prefix, node):
        i = 0
        while f"block_{i}" in node:
            b = node[f"block_{i}"]
            put_op(f"{prefix}.mixer_blocks.{i}.mix_h", b["mix_h"])
            put_op(f"{prefix}.mixer_blocks.{i}.mix_w", b["mix_w"])
            put_linear(f"{prefix}.mixer_blocks.{i}.mlp_c", b["mlp_c"])
            put_linear(f"{prefix}.mixer_blocks.{i}.reweight.net.0", b["reweight"]["fc1"])
            put_linear(f"{prefix}.mixer_blocks.{i}.reweight.net.3", b["reweight"]["fc2"])
            put_linear(f"{prefix}.mixer_blocks.{i}.proj", b["proj"])
            i += 1
        put_ln(f"{prefix}.layer_norm", node["norm_out"])

    for i, m in enumerate(modalities):
        enc = p[f"encoders_{i}"]
        kernel = np.asarray(enc["patch_embed"]["proj"]["linear"]["kernel"])
        w = kernel.T.reshape(kernel.shape[1], *patch_conv_shapes[m])
        sd[f"{m}_mixer.to_patch_embedding.0.weight"] = np.ascontiguousarray(w)
        sd[f"{m}_mixer.to_patch_embedding.0.bias"] = np.asarray(
            enc["patch_embed"]["proj"]["linear"]["bias"])
        put_blocks(f"{m}_mixer", enc)
        put_linear(f"classifier_{m}", p[f"heads_{i}"])
    put_blocks("fusion_mixer", p["fusion_mixer"])
    put_linear("classifier_fusion.classifer", p["classifier"]["cls"])
    return sd


def export_mimic_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """MIMIC-topology params -> reference-named torch state_dict
    (`/root/reference/models/mimic.py:39-50`): ``static_extractor`` is an
    MLP whose Linears live at ``module_list.{3i}`` (Linear/ReLU/Dropout
    triplets, output Linear at ``module_list.{3*num_blocks}``,
    `/root/reference/modules/mlp.py:11-21`); ``time_mixer`` is an
    MLPMixerNoPatching with a ``proj`` Linear before the blocks
    (`/root/reference/modules/mixer.py:165-186`)."""
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

    mlp = p["encoders_0"]
    i = 0
    while f"fc_{i}" in mlp:
        put_linear(f"static_extractor.module_list.{3 * i}", mlp[f"fc_{i}"])
        i += 1
    if "fc_out" in mlp:
        put_linear(f"static_extractor.module_list.{3 * i}", mlp["fc_out"])
    put_linear("time_mixer.proj", p["encoders_1"]["proj"])
    put_blocks("time_mixer", p["encoders_1"])
    put_linear("classifier_static", p["heads_0"])
    put_linear("classifier_time", p["heads_1"])
    put_blocks("fusion_mixer", p["fusion_mixer"])
    put_linear("classifier_fusion.classifer", p["classifier"]["cls"])
    return sd


def export_mimic_gru_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """MimicRecurrent params -> reference-named torch state_dict
    (`/root/reference/models/mimic.py:210-267`): ``static_extractor`` MLP,
    ``time_encoder`` a torch ``nn.GRU`` whose ``weight_ih_l0``/``weight_hh_l0``
    stack the r/z/n gate rows (torch order) and whose separate input-/
    hidden-side biases map 1:1 onto ``TorchGRUCell``'s double-bias
    parameterization (modules/recurrent.py — bijective, no bias folding),
    ``fusion_encoder`` MLP, three classifier heads."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, node):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(node["linear"]["kernel"]).T)
        sd[f"{prefix}.bias"] = np.asarray(node["linear"]["bias"])

    def put_mlp(prefix, mlp):
        i = 0
        while f"fc_{i}" in mlp:
            put_linear(f"{prefix}.module_list.{3 * i}", mlp[f"fc_{i}"])
            i += 1
        if "fc_out" in mlp:
            put_linear(f"{prefix}.module_list.{3 * i}", mlp["fc_out"])

    put_mlp("static_extractor", p["encoders_0"])
    cell = p["encoders_1"]["GRUCell_0"]
    sd["time_encoder.gru.weight_ih_l0"] = np.ascontiguousarray(np.concatenate(
        [np.asarray(cell[g]["kernel"]).T for g in ("ir", "iz", "in")]))
    sd["time_encoder.gru.weight_hh_l0"] = np.ascontiguousarray(np.concatenate(
        [np.asarray(cell[g]["kernel"]).T for g in ("hr", "hz", "hn")]))
    sd["time_encoder.gru.bias_ih_l0"] = np.concatenate(
        [np.asarray(cell[g]["bias"]) for g in ("ir", "iz", "in")])
    sd["time_encoder.gru.bias_hh_l0"] = np.concatenate(
        [np.asarray(cell[g]["bias"]) for g in ("hr", "hz", "hn")])
    put_mlp("fusion_encoder", p["fusion_encoder"])
    put_linear("classifier_static", p["heads_0"])
    put_linear("classifier_time", p["heads_1"])
    put_linear("classifier_fusion.classifer", p["classifier"]["cls"])
    return sd


# ---------------------------------------------------------------------------
# Migration CLI: Lightning .ckpt -> a native checkpoint directory
# ---------------------------------------------------------------------------

def _sample_batch_from_cfg(model_cfg, modalities) -> Optional[dict]:
    """Derive a 1-sample init batch from the config's modality shapes.
    Only image-like MLPMixer modalities (in_channels + image_size) are
    derivable; returns None — structure check skipped — otherwise."""
    batch = {}
    for m in modalities:
        mc = model_cfg.modalities.get(m)
        if mc is None or "in_channels" not in mc or "image_size" not in mc:
            return None
        size = mc.image_size
        h, w = (size if isinstance(size, (list, tuple)) else (size, size))
        batch[m] = np.zeros((1, int(mc.in_channels), int(h), int(w)), np.float32)
    batch["label"] = np.zeros((1,), np.int32)
    return batch


def _check_structure(task, variables) -> None:
    """Fail loudly if the converted tree does not match a fresh init of the
    config's network (wrong config for this checkpoint, or an unsupported
    topology), listing missing/extra/misshaped leaves."""
    import jax

    batch = _sample_batch_from_cfg(task.model_cfg, task.modalities)
    if batch is None:
        print("[import] modality shapes not derivable from the config; "
              "skipping the structure check")
        return
    fresh = task.init_params(jax.random.PRNGKey(0), batch)
    want = {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(fresh)}
    got = {jax.tree_util.keystr(p): np.shape(v)
           for p, v in jax.tree_util.tree_leaves_with_path(variables)}
    problems = []
    for k in sorted(set(want) - set(got)):
        problems.append(f"missing from checkpoint: {k} {want[k]}")
    for k in sorted(set(got) - set(want)):
        problems.append(f"not in this config's network: {k} {got[k]}")
    for k in sorted(set(want) & set(got)):
        if tuple(want[k]) != tuple(got[k]):
            problems.append(f"shape mismatch at {k}: config wants {want[k]}, "
                            f"checkpoint has {got[k]}")
    if problems:
        raise ValueError(
            "converted checkpoint does not fit this config's network:\n  "
            + "\n  ".join(problems))


def import_checkpoint(ckpt_path: str, cfg, out_dir: str) -> str:
    """Convert a reference Lightning ``.ckpt`` into a native checkpoint
    directory consumable by ``run.py -p`` / ``-m test`` and
    ``serving export -p``. Returns the written ``epoch_N`` path."""
    import jax.numpy as jnp
    import torch

    from ..models import get_model
    from ..training.callbacks import CheckpointManager
    from ..training.trainer import _make_optimizer

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().cpu().numpy()
          for k, v in raw.get("state_dict", raw).items()}
    epoch = int(raw.get("epoch", 0) or 0)
    global_step = int(raw.get("global_step", 0) or 0)

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    model_type = str(cfg.model.type)
    if model_type == "MimicRecurrent":
        variables = convert_mimic_gru_state_dict(sd, cfg.model)
    elif model_type == "MimicMixerMultiLoss":
        variables = convert_mimic_state_dict(sd, cfg.model)
    else:
        variables = convert_reference_state_dict(sd, task.modalities)
    _check_structure(task, variables)
    variables = {k: _tree_map_np(jnp.asarray, v) for k, v in variables.items()}

    # fresh optimizer state in the trainer's exact layout (Lightning Adam
    # moments don't transfer; the LR/plateau trajectory restarts too)
    optimizer, _ = _make_optimizer(task.optimizer_cfg,
                                   task.trainable_mask(variables))
    opt_state = optimizer.init(variables)

    nan = float("nan")
    state = {
        "params": variables,
        "opt_state": opt_state,
        "epoch": np.int32(epoch),
        "global_step": np.int64(global_step),
        # neutral callback state: restore treats plateau_lr 0 as "not
        # restored" and NaN bests as unset (trainer._state / restore)
        "callbacks": {
            "plateau_lr": np.float64(0.0),
            "plateau_best": np.float64(nan),
            "plateau_num_bad": np.int32(0),
            "es_best": np.float64(nan),
            "es_wait": np.int32(0),
        },
    }
    manager = CheckpointManager(
        out_dir,
        monitor=str(cfg.train.get("monitor", "val_loss")),
        mode=str(cfg.train.get("monitor_mode", "min")),
    )
    # an import has no monitor value by construction; the save() warning
    # about last-only retention is noise here
    manager._warned_monitor = True
    manager.save(epoch, state, {})
    path = manager.last_path()
    print(f"[import] wrote {path} (epoch {epoch}, step {global_step}); "
          f"evaluate: run.py -c CFG -m test -p {path} | resume training: "
          f"run.py -c CFG -p {path}")
    return path


def _tree_map_np(fn, tree):
    if isinstance(tree, dict):
        return {k: _tree_map_np(fn, v) for k, v in tree.items()}
    return fn(tree)


def main(argv: Optional[Sequence[str]] = None):
    import argparse

    from .. import config as cfg_lib

    ap = argparse.ArgumentParser(
        description="Convert a reference PyTorch-Lightning checkpoint into "
                    "a native checkpoint directory (dotted config overrides "
                    "accepted, run.py-style)")
    ap.add_argument("ckpt", help="Lightning .ckpt file from the reference")
    ap.add_argument("-c", "--cfg", required=True,
                    help="the reference YAML the checkpoint was trained with")
    ap.add_argument("-o", "--out", required=True,
                    help="checkpoint directory to write (epoch_N + index.json)")
    args, unknown = ap.parse_known_args(argv)
    cfg = cfg_lib.load(args.cfg)
    if unknown:
        cfg_lib.apply_cli_overrides(cfg, unknown)
    import_checkpoint(args.ckpt, cfg, args.out)


if __name__ == "__main__":
    main()
