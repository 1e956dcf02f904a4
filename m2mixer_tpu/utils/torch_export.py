"""Export a native checkpoint back to a reference-style Lightning ``.ckpt``.

The inverse of ``torch_import``: where that CLI lets a reference user bring
their Lightning checkpoints INTO this framework, this one lets them go back —
a model trained here is written in the reference's on-disk layout
(``{'state_dict': <reference-named torch tensors>, 'epoch', 'global_step'}``,
the format Lightning's ``load_from_checkpoint`` consumes and the reference
re-loads via its overridden loader, `/root/reference/models/avmnist.py:400-411`).
Together the two CLIs make migration two-way: no training run is ever locked
in on either side.

Covers the same topology as the importer — MLPMixer encoders + FusionMixer +
Linear heads + StandardClassifier (every shipped M2-Mixer config family) —
including checkpoints trained with ``model.paired_encoders`` (the TPU
modality-batched layout), whose layer-stacked leaves are re-laid into
per-modality reference naming.

CLI::

    python -m m2mixer_tpu.utils.torch_export run_dir/checkpoints/epoch_12 \\
        -c cfg/avmnist/avmnist_m2-mixer_B.yml -o exported.ckpt [--ema]
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from .torch_import import export_reference_state_dict

__all__ = ["modular_params_from_state", "export_checkpoint", "main"]


def _modular_from_paired(paired: dict, m: int) -> dict:
    """``PairedMLPMixer`` layer-stacked ``(L, 2, ...)`` leaves, modality
    ``m`` -> one modality's MODULAR ``MLPMixer`` param subtree (``block_i`` +
    ``norm_out`` + ``patch_embed``), i.e. the layout
    ``export_reference_state_dict`` understands."""
    pick = lambda name: np.asarray(paired[name])[:, m]
    L = int(np.shape(np.asarray(paired["token_fc1_kernel"]))[0])
    out = {}
    for i in range(L):
        def lin(base):
            return {"linear": {"kernel": pick(f"{base}_kernel")[i],
                               "bias": pick(f"{base}_bias")[i]}}

        def ln(base):
            return {"LayerNorm_0": {"scale": pick(f"{base}_scale")[i],
                                    "bias": pick(f"{base}_bias")[i]}}

        out[f"block_{i}"] = {
            "norm_token": ln("norm_token"),
            "token_mix": {"fc1": lin("token_fc1"), "fc2": lin("token_fc2")},
            "norm_channel": ln("norm_channel"),
            "channel_mix": {"fc1": lin("channel_fc1"),
                            "fc2": lin("channel_fc2")},
        }
    out["norm_out"] = {"LayerNorm_0": {
        "scale": np.asarray(paired["norm_out_scale"])[m],
        "bias": np.asarray(paired["norm_out_bias"])[m]}}
    out["patch_embed"] = paired[f"patch_embed_{m}"]
    return out


def modular_params_from_state(params: dict) -> dict:
    """Normalize a restored ``params`` tree to the modular per-modality
    layout: pass modular trees through, re-lay ``paired_encoder`` ones."""
    top = params["params"] if "params" in params else params
    if "paired_encoder" not in top:
        return {"params": top}
    out = {k: v for k, v in top.items() if k != "paired_encoder"}
    for m in (0, 1):
        out[f"encoders_{m}"] = _modular_from_paired(top["paired_encoder"], m)
    return {"params": out}


def _to_f32_numpy(x):
    a = np.asarray(x)
    # bf16 params (ml_dtypes) have no torch-compatible numpy dtype; the
    # reference stores f32, so widen any low-precision float leaf
    if a.dtype.kind not in "fiub" or (a.dtype.kind == "f" and a.itemsize < 4):
        a = a.astype(np.float32)
    return a


def export_checkpoint(ckpt_path: str, cfg, out_file: str,
                      ema: bool = False) -> str:
    """Native checkpoint directory (one ``epoch_N``) -> Lightning ``.ckpt``.

    ``ema=True`` exports the Polyak-averaged weights carried in the
    checkpoint's optimizer state (requires ``train.optimizer.ema_decay>0``
    at training time).
    """
    import orbax.checkpoint as ocp
    import torch

    from ..models import get_model
    from ..training.trainer import ema_params_from_opt_state

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ckpt_path))
    params = restored.get("params", restored)
    if ema:
        ema_tree = ema_params_from_opt_state(restored.get("opt_state", {}))
        if ema_tree is None:
            raise SystemExit(
                "--ema: this checkpoint carries no params EMA (train with "
                "train.optimizer.ema_decay > 0)")
        params = ema_tree
        print("[export] exporting the Polyak-averaged (EMA) weights")

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    modular = modular_params_from_state(params)

    shapes: Dict[str, tuple] = {}
    for m in task.modalities:
        mc = cfg.model.modalities.get(m)
        if mc is not None and "in_channels" in mc and "patch_size" in mc:
            p = int(mc.patch_size)
            shapes[m] = (int(mc.in_channels), p, p)
    sd = export_reference_state_dict(modular, task.modalities,
                                     patch_conv_shapes=shapes or None)

    epoch = int(np.asarray(restored.get("epoch", 0)))
    global_step = int(np.asarray(restored.get("global_step", 0)))
    ckpt = {
        # copy: restored orbax leaves can be non-writable views, which
        # torch.from_numpy warns about
        "state_dict": {k: torch.from_numpy(
            np.array(_to_f32_numpy(v))) for k, v in sd.items()},
        "epoch": epoch,
        "global_step": global_step,
        # the version the reference pins (`requirements.txt`): lets
        # Lightning's loader skip its migration warnings
        "pytorch-lightning_version": "1.8.6",
    }
    out_file = os.path.abspath(out_file)
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    torch.save(ckpt, out_file)
    print(f"[export] wrote {out_file} (epoch {epoch}, step {global_step}, "
          f"{len(sd)} tensors); load in the reference with "
          f"Model.load_from_checkpoint(...)")
    return out_file


def main(argv: Optional[Sequence[str]] = None):
    import argparse

    from .. import config as cfg_lib

    ap = argparse.ArgumentParser(
        description="Convert a native checkpoint directory into a reference "
                    "PyTorch-Lightning .ckpt (dotted config overrides "
                    "accepted, run.py-style)")
    ap.add_argument("ckpt", help="native checkpoint path (an epoch_N dir)")
    ap.add_argument("-c", "--cfg", required=True,
                    help="the YAML the checkpoint was trained with")
    ap.add_argument("-o", "--out", required=True,
                    help=".ckpt file to write")
    ap.add_argument("--ema", action="store_true",
                    help="export the Polyak-averaged weights from opt_state")
    args, unknown = ap.parse_known_args(argv)
    cfg = cfg_lib.load(args.cfg)
    if unknown:
        cfg_lib.apply_cli_overrides(cfg, unknown)
    export_checkpoint(args.ckpt, cfg, args.out, ema=args.ema)


if __name__ == "__main__":
    main()
