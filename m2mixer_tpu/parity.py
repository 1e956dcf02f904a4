"""Behavioral parity: the reference's math in torch vs this framework,
trained on IDENTICAL data.

The reference's de-facto integration test is "run the CLI on a dataset and
get metrics" (`/root/reference/run.py:76-83`,
`/root/reference/modules/train_test_module.py:72-132`). The reference repo
itself cannot run here (pytorch-lightning is not installed), so this module
implements the reference's FULL S-config training protocol in plain torch —
the same equations as `/root/reference/modules/mixer.py` (MLPMixer /
FusionMixer), `/root/reference/models/avmnist.py:236-312` (3-loss combine),
and `/root/reference/modules/train_test_module.py:166-175` (Adam +
ReduceLROnPlateau(patience)) — and trains it against ``Trainer.fit`` on the
SAME AV-MNIST surrogate batches.

Two protocols:

- **lockstep** — identical initial weights (the native init exported
  through ``utils/torch_export.export_reference_state_dict``), dropout 0,
  ``shuffle=False`` (the reference's own AV-MNIST quirk,
  `/root/reference/datasets/avmnist.py:181`), identical batch order: the
  two frameworks must produce near-identical per-epoch loss curves (the
  residual gap is float-reassociation noise amplified by Adam).
- **protocol** — independent seeds, the shipped recipe (dropout, plateau
  LR, early stop): final test acc / macro-F1 must agree within seed noise.

The torch model's parameter names deliberately mirror the reference's
module tree (``image_mixer.mixer_blocks.0.token_mix.2.net.0.weight`` ...)
so the exporter's state dict loads verbatim — the exact naming the
reference's Lightning checkpoints use.

CLI (writes PARITY.json and prints the BASELINE.md table row)::

    python -m m2mixer_tpu.parity --out PARITY.json [--epochs 12] [--seeds 3]
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np
import torch
from torch import nn

__all__ = ["build_reference_torch_model", "torch_protocol", "native_protocol",
           "lockstep_experiment", "protocol_experiment"]


# ---------------------------------------------------------------------------
# Reference math in torch (fresh implementation of the documented equations;
# parameter names match the reference tree so exported state dicts load)
# ---------------------------------------------------------------------------

class _TransposeTokens(nn.Module):
    def forward(self, x):  # (B, N, D) <-> (B, D, N)
        return x.transpose(1, 2)


class _FeedForward(nn.Module):
    """Linear-GELU-Dropout-Linear-Dropout (`/root/reference/modules/mixer.py:9-22`);
    ``net`` indices 0/3 carry the weights, matching reference naming."""

    def __init__(self, dim, hidden, dropout):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                                 nn.Dropout(dropout), nn.Linear(hidden, dim),
                                 nn.Dropout(dropout))

    def forward(self, x):
        return self.net(x)


class _MixerBlock(nn.Module):
    """Pre-LN token mix + residual, pre-LN channel mix + residual
    (`/root/reference/modules/mixer.py:25-47`)."""

    def __init__(self, hidden, n_tokens, token_dim, channel_dim, dropout):
        super().__init__()
        self.token_mix = nn.Sequential(nn.LayerNorm(hidden), _TransposeTokens(),
                                       _FeedForward(n_tokens, token_dim, dropout))
        self.channel_mix = nn.Sequential(nn.LayerNorm(hidden),
                                         _FeedForward(hidden, channel_dim, dropout))

    def forward(self, x):
        x = x + self.token_mix(x).transpose(1, 2)
        return x + self.channel_mix(x)


class _RefMLPMixer(nn.Module):
    """Conv patch embed (k=s=patch) + blocks + LN
    (`/root/reference/modules/mixer.py:135-162`)."""

    def __init__(self, in_ch, hidden, patch, image_size, n_blocks,
                 token_dim, channel_dim, dropout):
        super().__init__()
        h, w = image_size
        self.to_patch_embedding = nn.Sequential(
            nn.Conv2d(in_ch, hidden, patch, patch))
        n_tokens = (h // patch) * (w // patch)
        self.mixer_blocks = nn.Sequential(*[
            _MixerBlock(hidden, n_tokens, token_dim, channel_dim, dropout)
            for _ in range(n_blocks)])
        self.layer_norm = nn.LayerNorm(hidden)

    def forward(self, x):
        x = self.to_patch_embedding(x).flatten(2).transpose(1, 2)
        return self.layer_norm(self.mixer_blocks(x))


class _RefFusionMixer(nn.Module):
    """Blocks + LN over the fused token sequence
    (`/root/reference/modules/mixer.py:112-132`)."""

    def __init__(self, hidden, n_tokens, n_blocks, token_dim, channel_dim,
                 dropout):
        super().__init__()
        self.mixer_blocks = nn.Sequential(*[
            _MixerBlock(hidden, n_tokens, token_dim, channel_dim, dropout)
            for _ in range(n_blocks)])
        self.layer_norm = nn.LayerNorm(hidden)

    def forward(self, x):
        return self.layer_norm(self.mixer_blocks(x))


class _RefStandardClassifier(nn.Module):
    """Mean over tokens + Linear; the child keeps the reference's
    ``classifer`` typo so state-dict keys match
    (`/root/reference/modules/classification.py:84-90`)."""

    def __init__(self, hidden, n_classes):
        super().__init__()
        self.classifer = nn.Linear(hidden, n_classes)

    def forward(self, x):
        return self.classifer(x.reshape(x.shape[0], -1, x.shape[-1]).mean(1))


class RefM2Mixer(nn.Module):
    """The AVMnistMixerMultiLoss forward
    (`/root/reference/models/avmnist.py:236-312`): two MLPMixer encoders,
    token-axis concat fusion, FusionMixer, mean-pooled per-modality heads
    + StandardClassifier fusion head."""

    def __init__(self, model_cfg):
        super().__init__()
        m = model_cfg.modalities
        d = float(model_cfg.get("dropout", 0.0))

        def enc(mc):
            return _RefMLPMixer(int(mc.in_channels), int(mc.hidden_dim),
                                int(mc.patch_size), tuple(mc.image_size),
                                int(mc.num_mixers), int(mc.token_dim),
                                int(mc.channel_dim), d)

        self.image_mixer = enc(m.image)
        self.audio_mixer = enc(m.audio)
        n_tokens = (self.image_mixer.mixer_blocks[0].token_mix[2].net[0].in_features
                    + self.audio_mixer.mixer_blocks[0].token_mix[2].net[0].in_features)
        mm = m.multimodal
        self.fusion_mixer = _RefFusionMixer(int(mm.hidden_dim), n_tokens,
                                            int(mm.num_mixers),
                                            int(mm.token_dim),
                                            int(mm.channel_dim), d)
        n_cls = int(m.classification.num_classes)
        hidden = int(m.image.hidden_dim)
        self.classifier_image = nn.Linear(hidden, n_cls)
        self.classifier_audio = nn.Linear(hidden, n_cls)
        self.classifier_fusion = _RefStandardClassifier(int(mm.hidden_dim), n_cls)

    def forward(self, image, audio):
        ti = self.image_mixer(image)
        ta = self.audio_mixer(audio)
        tf = self.fusion_mixer(torch.cat([ti, ta], dim=1))
        return (self.classifier_image(ti.mean(1)),
                self.classifier_audio(ta.mean(1)),
                self.classifier_fusion(tf))


def build_reference_torch_model(model_cfg,
                                state_dict: Optional[Dict] = None) -> RefM2Mixer:
    model = RefM2Mixer(model_cfg)
    if state_dict is not None:
        model.load_state_dict({k: torch.tensor(np.asarray(v))
                               for k, v in state_dict.items()}, strict=True)
    return model


# ---------------------------------------------------------------------------
# The reference training protocol in torch
# ---------------------------------------------------------------------------

def _combined_loss(model, batch, ce, w_fusion):
    li, la, lf = model(torch.tensor(batch["image"]), torch.tensor(batch["audio"]))
    y = torch.tensor(np.asarray(batch["label"]), dtype=torch.long)
    l_i, l_a, l_f = ce(li, y), ce(la, y), ce(lf, y)
    ow = (1.0 - w_fusion) / 2.0
    # x3 scale for fixed weighting (`/root/reference/models/avmnist.py:290-291`)
    loss = (w_fusion * l_f + ow * (l_i + l_a)) * 3.0
    return loss, lf


def torch_protocol(model_cfg, optimizer_cfg, datamodule, epochs: int,
                   seed: int = 0, state_dict: Optional[Dict] = None,
                   es_patience: int = 30) -> Dict:
    """Train the reference protocol end to end on the given datamodule.

    Reuses THIS framework's ``ReduceLROnPlateau`` / ``EarlyStopping``
    host-side callbacks (pure Python, torch-parity semantics by contract)
    so both frameworks schedule identically."""
    from .training.callbacks import EarlyStopping, ReduceLROnPlateau
    from .training import metrics as tm

    torch.manual_seed(seed)
    model = build_reference_torch_model(model_cfg, state_dict)
    opt = torch.optim.Adam(
        model.parameters(), lr=float(optimizer_cfg.lr),
        betas=tuple(optimizer_cfg.get("betas", (0.9, 0.999))),
        eps=float(optimizer_cfg.get("eps", 1e-8)),
        weight_decay=float(optimizer_cfg.get("weight_decay", 0.0)))
    ce = nn.CrossEntropyLoss()
    w_fusion = float(model_cfg.get("fusion_loss_weight", 1.0 / 3.0))
    plateau = ReduceLROnPlateau(float(optimizer_cfg.lr),
                                patience=int(optimizer_cfg.get(
                                    "scheduler_patience", 5)))
    stopper = EarlyStopping("val_loss", patience=es_patience, mode="min")

    datamodule.setup("fit")
    datamodule.setup("test")
    history = {"train_loss": [], "val_loss": []}
    best_val, best_state, best_epoch = np.inf, None, -1
    for epoch in range(epochs):
        model.train()
        losses = []
        for batch in datamodule.train_batches():
            opt.zero_grad()
            loss, _ = _combined_loss(model, batch, ce, w_fusion)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        model.eval()
        with torch.no_grad():
            vl = [float(_combined_loss(model, b, ce, w_fusion)[0])
                  for b in datamodule.val_batches()]
        val = float(np.mean(vl))
        history["train_loss"].append(float(np.mean(losses)))
        history["val_loss"].append(val)
        if val < best_val:
            best_val, best_epoch = val, epoch
            best_state = {k: v.detach().clone()
                          for k, v in model.state_dict().items()}
        lr = plateau.update(val)
        for g in opt.param_groups:
            g["lr"] = lr
        if stopper.update({"val_loss": val}):
            break

    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()
    n_cls = int(model_cfg.modalities.classification.num_classes)
    acc = tm.Accuracy(task="multiclass", num_classes=n_cls)
    f1m = tm.F1Score(task="multiclass", num_classes=n_cls, average="macro")
    tl = []
    with torch.no_grad():
        for b in datamodule.test_batches():
            loss, lf = _combined_loss(model, b, ce, w_fusion)
            tl.append(float(loss))
            preds = lf.argmax(dim=1).numpy()
            acc.update(preds, np.asarray(b["label"]))
            f1m.update(preds, np.asarray(b["label"]))
    return {"framework": "torch-reference", "seed": seed,
            "history": history, "best_epoch": best_epoch,
            "best_val_loss": float(best_val),
            "test_loss": float(np.mean(tl)),
            "test_acc": float(acc.compute()),
            "test_f1m": float(f1m.compute())}


# ---------------------------------------------------------------------------
# The native side (same assembly as run.py) + the two experiments
# ---------------------------------------------------------------------------

def _load_s_cfg(data_dir: str, work_dir: str, epochs: int, seed: int,
                dropout: Optional[float]) -> "object":
    from . import config as cfg_lib

    cfg = cfg_lib.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfg", "avmnist", "avmnist_m2-mixer_S.yml"))
    cfg.dataset.params.data_dir = data_dir
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = int(epochs)
    cfg.train.seed = int(seed)
    cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    if dropout is not None:
        cfg.model.dropout = float(dropout)
    return cfg


def native_protocol(cfg, work_dir: str, init_params=None) -> Dict:
    """``Trainer.fit`` + best-checkpoint test; returns the torch-side dict
    shape plus the exported init state dict when ``init_params`` is given."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .parallel import MeshConfig
    from .training import Trainer

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name=f"parity_seed{cfg.train.seed}",
                      mesh_config=MeshConfig(data=1, model=1),
                      use_wandb=False, full_cfg=cfg)
    if init_params is not None:
        trainer.params = init_params
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    rows = [json.loads(l) for l in open(
        os.path.join(trainer.logger.log_dir, "metrics.jsonl"))]
    return {"framework": "m2mixer_tpu", "seed": int(cfg.train.seed),
            "history": {
                "train_loss": [r["train_loss"] for r in rows if "train_loss" in r],
                "val_loss": [r["val_loss"] for r in rows if "val_loss" in r]},
            "best_epoch": int(trainer.logger.summary.get("best_val_loss_epoch", -1)),
            "best_val_loss": float(trainer.logger.summary.get("best_val_loss", np.nan)),
            "test_loss": float(logs["test_loss"]),
            "test_acc": float(logs["test_acc"]),
            "test_f1m": float(logs["test_f1m"])}


def _shared_init(cfg, datamodule):
    """One native init, exported to the reference-named torch state dict —
    both frameworks start from bit-identical weights."""
    import jax

    from .models import get_model
    from .utils.torch_import import export_reference_state_dict

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    datamodule.setup("fit")
    sample = next(iter(datamodule.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    m = cfg.model.modalities
    shapes = {name: (int(m[name].in_channels), int(m[name].patch_size),
                     int(m[name].patch_size)) for name in ("image", "audio")}
    sd = export_reference_state_dict(params, ("image", "audio"), shapes)
    return params, sd


def lockstep_experiment(data_dir: str, work_dir: str, epochs: int = 4,
                        seed: int = 0) -> Dict:
    """Weight-ported, dropout-0, shuffle-False: same data, same order, same
    init — per-epoch curves must nearly coincide."""
    from .datasets import get_data_module

    cfg = _load_s_cfg(data_dir, work_dir, epochs, seed, dropout=0.0)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    params, sd = _shared_init(cfg, dm)
    native = native_protocol(cfg, work_dir, init_params=params)
    ref = torch_protocol(cfg.model, cfg.train.optimizer, dm, epochs,
                         seed=seed, state_dict=sd)
    return {"mode": "lockstep", "native": native, "torch": ref}


def protocol_experiment(data_dir: str, work_dir: str, epochs: int = 12,
                        seeds=(0, 1, 2)) -> Dict:
    """Shipped recipe, independent seeds: final metrics within seed noise."""
    from .datasets import get_data_module

    runs = {"native": [], "torch": []}
    for seed in seeds:
        cfg = _load_s_cfg(data_dir, work_dir, epochs, seed, dropout=None)
        runs["native"].append(native_protocol(cfg, work_dir))
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        runs["torch"].append(torch_protocol(cfg.model, cfg.train.optimizer,
                                            dm, epochs, seed=seed))
    summary = {}
    for side in ("native", "torch"):
        accs = [r["test_acc"] for r in runs[side]]
        f1s = [r["test_f1m"] for r in runs[side]]
        summary[side] = {"test_acc_mean": float(np.mean(accs)),
                         "test_acc_std": float(np.std(accs)),
                         "test_f1m_mean": float(np.mean(f1s)),
                         "test_f1m_std": float(np.std(f1s))}
    return {"mode": "protocol", "runs": runs, "summary": summary}


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="PARITY_RUN.json")
    ap.add_argument("--work", default="parity_out")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--lockstep-epochs", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--n", type=int, default=384,
                    help="surrogate train size (384 -> val split lands on a "
                    "batch boundary)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .datasets.surrogate import generate

    os.makedirs(args.work, exist_ok=True)
    data_dir = os.path.join(args.work, "avmnist")
    if not os.path.exists(os.path.join(data_dir, ".complete")):
        generate("avmnist", data_dir, n=args.n)
        open(os.path.join(data_dir, ".complete"), "w").write("ok\n")

    lock = lockstep_experiment(data_dir, os.path.join(args.work, "lockstep"),
                               epochs=args.lockstep_epochs)
    proto = protocol_experiment(data_dir, os.path.join(args.work, "protocol"),
                                epochs=args.epochs,
                                seeds=tuple(range(args.seeds)))
    out = {"lockstep": lock, "protocol": proto}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)

    nv, tv = lock["native"]["history"]["val_loss"], lock["torch"]["history"]["val_loss"]
    print("[parity] lockstep val-loss curves:")
    for e, (a, b) in enumerate(zip(nv, tv)):
        print(f"  epoch {e}: native {a:.6f}  torch {b:.6f}  |d| {abs(a-b):.2e}")
    s = proto["summary"]
    print(f"[parity] protocol ({args.seeds} seeds, {args.epochs} epochs): "
          f"native acc {s['native']['test_acc_mean']:.4f}"
          f"±{s['native']['test_acc_std']:.4f} f1m {s['native']['test_f1m_mean']:.4f} | "
          f"torch acc {s['torch']['test_acc_mean']:.4f}"
          f"±{s['torch']['test_acc_std']:.4f} f1m {s['torch']['test_f1m_mean']:.4f}")
    print(f"[parity] wrote {args.out}")


if __name__ == "__main__":
    main()
