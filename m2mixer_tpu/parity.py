"""Behavioral parity: the reference's math in torch vs this framework,
trained on IDENTICAL data.

The reference's de-facto integration test is "run the CLI on a dataset and
get metrics" (`/root/reference/run.py:76-83`,
`/root/reference/modules/train_test_module.py:72-132`). The reference repo
itself cannot run here (pytorch-lightning is not installed), so this module
implements the reference's FULL training protocol in plain torch —
the same equations as `/root/reference/modules/mixer.py` (MLPMixer /
FusionMixer), `/root/reference/models/avmnist.py:236-312` (3-loss combine),
and `/root/reference/modules/train_test_module.py:166-175` (Adam +
ReduceLROnPlateau(patience)) — and trains it against ``Trainer.fit`` on the
SAME surrogate batches. TEN topologies have lockstep twins: the flagship
concat-CE S config, GMU fusion (`BiModalGatedUnit`), gMLP encoders
(`gmpl.py`), DynaMixer (`dynamixer.py`), MIMIC (MLP + MLPMixerNoPatching,
`lockstep_experiment_mimic`), MM-IMDB (multilabel BCE-pos_weight,
`lockstep_experiment_mmimdb`), MMHS150K (3-modal masked-flag 4-loss,
`lockstep_experiment_mmhs`), UQ/EDL (least-uncertain-branch prediction,
`lockstep_experiment_uq`), MultiOFF, and Memotion — every loss topology
the reference defines — plus the GRU-encoder MimicRecurrent baseline
(`lockstep_experiment_mimic_gru`, riding the double-bias ``TorchGRUCell``
so Adam dynamics match torch's redundant parameterization exactly). The loss-weight estimators are additionally
verified IN THE TRAINING LOOP (`lockstep_experiment_softadapt` /
`lockstep_experiment_gradblend_loop`: both frameworks refit from their own
histories/parameters and the per-epoch applied weight vectors must agree),
and ``gradblend_parity`` pins the GradBlend O/G^2 weight estimation
value-for-value against `/root/reference/modules/gradblend.py:62-108`.

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
           "lockstep_experiment", "protocol_experiment",
           "lockstep_experiment_mimic", "lockstep_experiment_mimic_gru",
           "lockstep_experiment_mmimdb",
           "lockstep_experiment_mmhs", "lockstep_experiment_uq",
           "lockstep_experiment_multioff", "lockstep_experiment_memotion",
           "lockstep_experiment_softadapt", "lockstep_experiment_gradblend_loop",
           "lockstep_experiment_mimic_gru_gradblend",
           "lockstep_experiment_mmimdb_softadapt",
           "protocol_experiment_mimic", "protocol_experiment_mmimdb",
           "gradblend_parity", "torch_gradblend_weights",
           "torch_gradblend_weights_mimic_gru"]


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


class _RefBiModalGatedUnit(nn.Module):
    """GMU fusion: ``z*tanh(W1 m1) + (1-z)*tanh(W2 m2)``, gate
    ``z = sigmoid(Wz [m1;m2])`` (`/root/reference/modules/fusion.py:7-23`);
    param names match the reference so exported state dicts load."""

    def __init__(self, mod1_in, mod2_in, out_size):
        super().__init__()
        self.mod1_hidden = nn.Linear(mod1_in, out_size)
        self.mod2_hidden = nn.Linear(mod2_in, out_size)
        self.z_hidden = nn.Linear(mod1_in + mod2_in, out_size)

    def forward(self, mod1, mod2):
        h1 = torch.tanh(self.mod1_hidden(mod1))
        h2 = torch.tanh(self.mod2_hidden(mod2))
        z = torch.sigmoid(self.z_hidden(torch.cat([mod1, mod2], dim=-1)))
        return z * h1 + (1 - z) * h2


class _RefSpatialGatingUnit(nn.Module):
    """Split channels, LN + token-axis Linear on half, gate ``u*v``
    (`/root/reference/modules/gmpl.py:6-23`)."""

    def __init__(self, d_ffn, seq_len, dropout):
        super().__init__()
        self.norm = nn.LayerNorm(d_ffn // 2)
        self.proj = nn.Linear(seq_len, seq_len)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        u, v = x.chunk(2, dim=-1)
        v = self.norm(v).permute(0, 2, 1)
        v = self.dropout(self.proj(v)).permute(0, 2, 1)
        return u * v


class _RefGatingMlpBlock(nn.Module):
    """Pre-LN -> proj_1 -> GELU -> SGU -> proj_2, residual
    (`gmpl.py:26-51`); lockstep runs with survival prob 1 so the
    stochastic-depth draw never fires."""

    def __init__(self, d_model, d_ffn, seq_len, dropout):
        super().__init__()
        self.norm = nn.LayerNorm(d_model)
        self.dropout = nn.Dropout(dropout)
        self.proj_1 = nn.Linear(d_model, d_ffn)
        self.activation = nn.GELU()
        self.spatial_gating_unit = _RefSpatialGatingUnit(d_ffn, seq_len, dropout)
        self.proj_2 = nn.Linear(d_ffn // 2, d_model)

    def forward(self, x):
        y = self.activation(self.dropout(self.proj_1(self.norm(x))))
        y = self.dropout(self.proj_2(self.spatial_gating_unit(y)))
        return x + y


class _RefgMLP(nn.Module):
    def __init__(self, d_model, d_ffn, seq_len, n_blocks, dropout):
        super().__init__()
        self.blocks = nn.ModuleList([
            _RefGatingMlpBlock(d_model, d_ffn, seq_len, dropout)
            for _ in range(n_blocks)])

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class _RefVisiongMLP(nn.Module):
    """einops-style patchify + Linear embed + gMLP stack
    (`gmpl.py:77-118`; the reference's unused ``cls_token`` parameter is
    omitted — it never enters the forward)."""

    def __init__(self, image_size, in_ch, patch, d_model, d_ffn, n_blocks,
                 dropout):
        super().__init__()
        self.patch_size = patch
        self.num_patch = (image_size[0] // patch) * (image_size[1] // patch)
        self.patch_embedding = nn.Linear(in_ch * patch * patch, d_model)
        self.gmlp = _RefgMLP(d_model, d_ffn, self.num_patch, n_blocks, dropout)

    def forward(self, x):
        b, c, h, w = x.shape
        p = self.patch_size
        x = x.reshape(b, c, h // p, p, w // p, p)
        x = x.permute(0, 2, 4, 1, 3, 5).reshape(b, self.num_patch, c * p * p)
        return self.gmlp(self.patch_embedding(x))


class _RefFusiongMLP(nn.Module):
    """Learnable cls token prepended to the fused sequence + gMLP
    (`gmpl.py:121-148`)."""

    def __init__(self, d_model, d_ffn, n_blocks, num_patches, dropout):
        super().__init__()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d_model))
        self.gmlp = _RefgMLP(d_model, d_ffn, num_patches + 1, n_blocks, dropout)

    def forward(self, x):
        cls = self.cls_token.expand(x.shape[0], 1, -1)
        return self.gmlp(torch.cat((cls, x), dim=1))


class RefM2MixerGMLP(nn.Module):
    """The gMLP-encoder MultiLoss topology (the avmnist_gmlp config made
    runnable here — its reference model type ``avmnist_gmlp`` resolves to
    no class, see PARITY.md; the BLOCK math is straight from
    `/root/reference/modules/gmpl.py`): VisiongMLP per modality, token-axis
    concat, cls-token FusiongMLP, mean-pooled heads + StandardClassifier."""

    def __init__(self, model_cfg):
        super().__init__()
        m = model_cfg.modalities
        d = float(model_cfg.get("dropout", 0.0))

        def enc(mc):
            return _RefVisiongMLP(tuple(mc.image_size), int(mc.in_channels),
                                  int(mc.patch_size), int(mc.d_model),
                                  int(mc.d_ffn), int(mc.n_blocks), d)

        self.image_mixer = enc(m.image)
        self.audio_mixer = enc(m.audio)
        mm = m.multimodal
        n_tokens = self.image_mixer.num_patch + self.audio_mixer.num_patch
        self.fusion_mixer = _RefFusiongMLP(int(mm.d_model), int(mm.d_ffn),
                                           int(mm.n_blocks), n_tokens, d)
        n_cls = int(m.classification.num_classes)
        self.classifier_image = nn.Linear(int(m.image.d_model), n_cls)
        self.classifier_audio = nn.Linear(int(m.audio.d_model), n_cls)
        self.classifier_fusion = _RefStandardClassifier(int(mm.d_model), n_cls)

    def forward(self, image, audio):
        ti = self.image_mixer(image)
        ta = self.audio_mixer(audio)
        tf = self.fusion_mixer(torch.cat([ti, ta], dim=1))
        return (self.classifier_image(ti.mean(1)),
                self.classifier_audio(ta.mean(1)),
                self.classifier_fusion(tf))


class _RefDynaMixerOp(nn.Module):
    """Dynamic token mixing: per-sample L×L weights generated from
    compressed features, softmax over dim −2, applied per head
    (`/root/reference/modules/dynamixer.py:10-31`)."""

    def __init__(self, dim, seq_len, num_head, reduced_dim):
        super().__init__()
        self.dim, self.seq_len = dim, seq_len
        self.num_head, self.reduced_dim = num_head, reduced_dim
        self.out = nn.Linear(dim, dim)
        self.compress = nn.Linear(dim, num_head * reduced_dim)
        self.generate = nn.Linear(seq_len * reduced_dim, seq_len * seq_len)

    def forward(self, x):
        B, L, C = x.shape
        w = self.compress(x).reshape(B, L, self.num_head, self.reduced_dim)
        w = w.permute(0, 2, 1, 3).reshape(B, self.num_head, -1)
        w = self.generate(w).reshape(B, self.num_head, L, L).softmax(dim=-2)
        x = x.reshape(B, L, self.num_head, C // self.num_head).permute(0, 2, 3, 1)
        x = torch.matmul(x, w).permute(0, 3, 1, 2).reshape(B, L, C)
        return self.out(x)


class _RefFeedForwardOut(nn.Module):
    """FeedForward with ``out_dim`` (`mixer.py:9-22` with out_dim) — the
    DynaMixer block's 3-way reweight head."""

    def __init__(self, dim, hidden, out_dim, dropout):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                                 nn.Dropout(dropout), nn.Linear(hidden, out_dim),
                                 nn.Dropout(dropout))

    def forward(self, x):
        return self.net(x)


class _RefDynaMixerBlock(nn.Module):
    """Row-mix + column-mix + channel MLP, 3-way softmax reweighting
    (`dynamixer.py:34-62`)."""

    def __init__(self, hidden, num_patch, num_head, reduced_dim, dropout):
        super().__init__()
        self.mix_h = _RefDynaMixerOp(hidden, num_patch, num_head, reduced_dim)
        self.mix_w = _RefDynaMixerOp(hidden, num_patch, num_head, reduced_dim)
        self.mlp_c = nn.Linear(hidden, hidden, bias=False)  # qkv_bias=False
        # the reference constructs the reweight head with FeedForward's
        # DEFAULT dropout=0 regardless of the block dropout
        # (`/root/reference/modules/dynamixer.py:44`)
        self.reweight = _RefFeedForwardOut(hidden, hidden // 4, hidden * 3, 0.0)
        self.proj = nn.Linear(hidden, hidden)
        self.proj_drop = nn.Dropout(dropout)

    def forward(self, x):
        B, H, W, C = x.shape
        h = self.mix_h(x.permute(0, 2, 1, 3).reshape(-1, H, C)).reshape(
            B, W, H, C).permute(0, 2, 1, 3)
        w = self.mix_w(x.reshape(-1, W, C)).reshape(B, H, W, C)
        c = self.mlp_c(x)
        a = (h + w + c).permute(0, 3, 1, 2).flatten(2).mean(2)
        a = self.reweight(a).reshape(B, C, 3).permute(2, 0, 1).softmax(
            dim=0).unsqueeze(2).unsqueeze(2)
        x = h * a[0] + w * a[1] + c * a[2]
        return self.proj_drop(self.proj(x))


class _RefDynaMixer(nn.Module):
    """Conv patch embed keeping the (b,h,w,c) grid + blocks + LN
    (`dynamixer.py:65-92`)."""

    def __init__(self, in_ch, hidden, patch, image_size, n_blocks, num_head,
                 reduced_dim, dropout):
        super().__init__()
        self.to_patch_embedding = nn.Sequential(
            nn.Conv2d(in_ch, hidden, patch, patch))
        self.grid = image_size[0] // patch
        self.num_patch = (image_size[0] // patch) * (image_size[1] // patch)
        self.mixer_blocks = nn.ModuleList([
            _RefDynaMixerBlock(hidden, self.grid, num_head, reduced_dim, dropout)
            for _ in range(n_blocks)])
        self.layer_norm = nn.LayerNorm(hidden)

    def forward(self, x):
        x = self.to_patch_embedding(x).permute(0, 2, 3, 1)  # b h w c
        for b in self.mixer_blocks:
            x = b(x)
        return self.layer_norm(x)


class _RefFusionDynaMixer(nn.Module):
    """Blocks over a fused square grid (resolution sqrt(num_patches)) + LN
    (`dynamixer.py:95-115`)."""

    def __init__(self, hidden, num_patches, n_blocks, num_head, reduced_dim,
                 dropout):
        super().__init__()
        import math as _math

        grid = int(_math.sqrt(num_patches))
        self.mixer_blocks = nn.ModuleList([
            _RefDynaMixerBlock(hidden, grid, num_head, reduced_dim, dropout)
            for _ in range(n_blocks)])
        self.layer_norm = nn.LayerNorm(hidden)

    def forward(self, x):
        for b in self.mixer_blocks:
            x = b(x)
        return self.layer_norm(x)


class RefM2MixerDyna(nn.Module):
    """The DynaMixer MultiLoss topology
    (`/root/reference/cfg/avmnist/avmnist_3loss_dyna.yml`): DynaMixer
    encoders on the 2-D patch grid, elementwise MaxFusion
    (`fusion.py:190-204`), FusionDynaMixer, grid-flattened mean-pooled
    heads (`models/avmnist.py:267-273`)."""

    def __init__(self, model_cfg):
        super().__init__()
        m = model_cfg.modalities
        d = float(model_cfg.get("dropout", 0.0))

        def enc(mc):
            return _RefDynaMixer(int(mc.in_channels), int(mc.hidden_dim),
                                 int(mc.patch_size), tuple(mc.image_size),
                                 int(mc.num_mixers), int(mc.num_head),
                                 int(mc.reduced_dim), d)

        self.image_mixer = enc(m.image)
        self.audio_mixer = enc(m.audio)
        mm = m.multimodal
        n_tokens = self.image_mixer.num_patch  # MaxFusion: shape passthrough
        self.fusion_mixer = _RefFusionDynaMixer(
            int(mm.hidden_dim), n_tokens, int(mm.num_mixers),
            int(mm.num_head), int(mm.reduced_dim), d)
        n_cls = int(m.classification.num_classes)
        self.classifier_image = nn.Linear(int(m.image.hidden_dim), n_cls)
        self.classifier_audio = nn.Linear(int(m.audio.hidden_dim), n_cls)
        self.classifier_fusion = _RefStandardClassifier(int(mm.hidden_dim), n_cls)

    def forward(self, image, audio):
        ti = self.image_mixer(image)          # (B, H, W, C)
        ta = self.audio_mixer(audio)
        tf = self.fusion_mixer(torch.maximum(ti, ta))
        pool = lambda t: t.reshape(t.shape[0], -1, t.shape[-1]).mean(1)
        return (self.classifier_image(pool(ti)),
                self.classifier_audio(pool(ta)),
                self.classifier_fusion(tf))


class RefM2Mixer(nn.Module):
    """The AVMnistMixerMultiLoss forward
    (`/root/reference/models/avmnist.py:236-312`): two MLPMixer encoders,
    fusion (token-axis concat, or per-token GMU when the config sets
    ``fusion_function: BiModalGatedUnit`` — the avmnist_gated_4loss
    topology, `/root/reference/cfg/avmnist/avmnist_gated_4loss.yml:39-56`),
    FusionMixer, mean-pooled per-modality heads + StandardClassifier
    fusion head."""

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
        mm = m.multimodal
        im_tokens = self.image_mixer.mixer_blocks[0].token_mix[2].net[0].in_features
        au_tokens = self.audio_mixer.mixer_blocks[0].token_mix[2].net[0].in_features
        self._gmu = str(mm.get("fusion_function", "ConcatFusion")) == "BiModalGatedUnit"
        if self._gmu:
            # GMU fuses per token on the feature axis; token count passes
            # through (`fusion.py:25-55` with dim=1 -> args[0])
            self.fusion_function = _RefBiModalGatedUnit(
                int(mm.mod1_in), int(mm.mod2_in), int(mm.out_size))
            n_tokens = im_tokens
        else:
            n_tokens = im_tokens + au_tokens
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
        fused = (self.fusion_function(ti, ta) if self._gmu
                 else torch.cat([ti, ta], dim=1))
        tf = self.fusion_mixer(fused)
        return (self.classifier_image(ti.mean(1)),
                self.classifier_audio(ta.mean(1)),
                self.classifier_fusion(tf))


def build_reference_torch_model(model_cfg,
                                state_dict: Optional[Dict] = None) -> nn.Module:
    block = str(model_cfg.modalities.image.get("block_type", "MLPMixer"))
    cls = {"VisiongMLP": RefM2MixerGMLP,
           "DynaMixer": RefM2MixerDyna}.get(block, RefM2Mixer)
    model = cls(model_cfg)
    if state_dict is not None:
        model.load_state_dict({k: torch.tensor(np.asarray(v))
                               for k, v in state_dict.items()}, strict=True)
    return model


# ---------------------------------------------------------------------------
# The reference training protocol in torch
# ---------------------------------------------------------------------------

def _branch_losses(model, batch, ce):
    li, la, lf = model(torch.tensor(batch["image"]), torch.tensor(batch["audio"]))
    y = torch.tensor(np.asarray(batch["label"]), dtype=torch.long)
    return ce(li, y), ce(la, y), ce(lf, y), lf


def _combined_loss(model, batch, ce, weights):
    """``weights``: either the scalar fusion weight (fixed mode — x3 scale,
    `/root/reference/models/avmnist.py:290-291`) or a 3-vector
    (image, audio, fusion) from an active SoftAdapt/GradBlend estimator —
    then the plain weighted sum WITHOUT the x3
    (`models/avmnist.py:284-289`)."""
    l_i, l_a, l_f, lf = _branch_losses(model, batch, ce)
    if np.ndim(weights) == 0:
        w_fusion = float(weights)
        ow = (1.0 - w_fusion) / 2.0
        loss = (w_fusion * l_f + ow * (l_i + l_a)) * 3.0
    else:
        loss = weights[0] * l_i + weights[1] * l_a + weights[2] * l_f
    return loss, lf, (l_i, l_a, l_f)


def torch_protocol(model_cfg, optimizer_cfg, datamodule, epochs: int,
                   seed: int = 0, state_dict: Optional[Dict] = None,
                   es_patience: int = 30, estimator: Optional[str] = None) -> Dict:
    """Train the reference protocol end to end on the given datamodule.

    Reuses THIS framework's ``ReduceLROnPlateau`` / ``EarlyStopping``
    host-side callbacks (pure Python, torch-parity semantics by contract)
    so both frameworks schedule identically.

    ``estimator`` activates a loss-weight estimator IN THE TRAINING LOOP,
    refitting from this torch run's own histories/parameters exactly like
    the reference hooks:

    - ``'softadapt'`` — per-epoch val branch-loss histories, refit at
      ``epoch % model.update_loss_weights_per_epoch == 0`` (epoch != 0),
      weighted sum without the x3 (`/root/reference/models/avmnist.py:
      284-286,340-361`); the weight math is the native
      ``LossWeightedSoftAdapt`` (pinned to the reference's softadapt
      package at rtol 1e-8, tests/training/test_recipes.py).
    - ``'gradblend'`` — O/G^2 re-estimation from the CURRENT model at every
      ``model.gb_update_freq`` train-epoch start
      (`models/avmnist.py:219-234`), via ``torch_gradblend_weights``.

    The returned dict then carries ``weights_per_epoch``: the (image,
    audio, fusion) vector APPLIED during each epoch's train steps."""
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
    weights = float(model_cfg.get("fusion_loss_weight", 1.0 / 3.0))
    softadapt = None
    if estimator == "softadapt":
        from .modules.softadapt import LossWeightedSoftAdapt

        update_every = int(model_cfg.get("update_loss_weights_per_epoch", 6))
        softadapt = LossWeightedSoftAdapt(beta=-0.1,
                                          accuracy_order=update_every - 1)
        histories = [[], [], []]
        weights = np.full((3,), 1.0 / 3.0, np.float64)
    elif estimator == "gradblend":
        gb_freq = int(model_cfg.get("gb_update_freq", 20))
        gb_epochs = int(model_cfg.get("gb_epochs", 20))
    elif estimator is not None:
        raise ValueError(f"unknown estimator {estimator!r}")
    plateau = ReduceLROnPlateau(float(optimizer_cfg.lr),
                                patience=int(optimizer_cfg.get(
                                    "scheduler_patience", 5)))
    stopper = EarlyStopping("val_loss", patience=es_patience, mode="min")

    datamodule.setup("fit")
    datamodule.setup("test")
    history = {"train_loss": [], "val_loss": []}
    weights_per_epoch = []
    best_val, best_state, best_epoch = np.inf, None, -1
    for epoch in range(epochs):
        if estimator == "gradblend" and epoch % gb_freq == 0:
            # refit from the CURRENT weights (`models/avmnist.py:220-233`)
            weights = torch_gradblend_weights(
                model_cfg, None, datamodule, epochs=gb_epochs, model=model
            ).astype(np.float64)
        weights_per_epoch.append(
            [float(x) for x in np.atleast_1d(np.asarray(weights))])
        model.train()
        losses = []
        for batch in datamodule.train_batches():
            opt.zero_grad()
            loss, _, _ = _combined_loss(model, batch, ce, weights)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        model.eval()
        branch_sums = np.zeros(3)
        with torch.no_grad():
            vl = []
            for b in datamodule.val_batches():
                loss, _, branches = _combined_loss(model, b, ce, weights)
                vl.append(float(loss))
                branch_sums += [float(x) for x in branches]
        val = float(np.mean(vl))
        history["train_loss"].append(float(np.mean(losses)))
        history["val_loss"].append(val)
        if softadapt is not None:
            # the reference's validation_epoch_end: append per-epoch val
            # branch means, refit every N epochs (`avmnist.py:340-361`)
            for i in range(3):
                histories[i].append(branch_sums[i] / len(vl))
            if epoch != 0 and epoch % update_every == 0:
                weights = softadapt.get_component_weights(
                    *[np.asarray(h, np.float64) for h in histories]
                ).astype(np.float64)
                histories = [[], [], []]
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
            loss, lf, _ = _combined_loss(model, b, ce, weights)
            tl.append(float(loss))
            preds = lf.argmax(dim=1).numpy()
            acc.update(preds, np.asarray(b["label"]))
            f1m.update(preds, np.asarray(b["label"]))
    return {"framework": "torch-reference", "seed": seed,
            "history": history, "best_epoch": best_epoch,
            "best_val_loss": float(best_val),
            "weights_per_epoch": weights_per_epoch,
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


def native_protocol(cfg, work_dir: str, init_params=None,
                    task_hook=None) -> Dict:
    """``Trainer.fit`` + best-checkpoint test; returns the torch-side dict
    shape plus the exported init state dict when ``init_params`` is given.
    ``task_hook(task)`` instruments the task before fit (the estimator
    in-the-loop experiments wrap epoch hooks to capture the applied
    loss-weight vectors)."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .parallel import MeshConfig
    from .training import Trainer

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    if task_hook is not None:
        task_hook(task)
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
    block = str(m.image.get("block_type", "MLPMixer"))
    if block == "VisiongMLP":
        from .utils.torch_import import export_gmlp_state_dict

        sd = export_gmlp_state_dict(params)
    elif block == "DynaMixer":
        from .utils.torch_import import export_dyna_state_dict

        shapes = {name: (int(m[name].in_channels), int(m[name].patch_size),
                         int(m[name].patch_size)) for name in ("image", "audio")}
        sd = export_dyna_state_dict(params, shapes)
    else:
        shapes = {name: (int(m[name].in_channels), int(m[name].patch_size),
                         int(m[name].patch_size)) for name in ("image", "audio")}
        sd = export_reference_state_dict(params, ("image", "audio"), shapes)
    return params, sd


def lockstep_experiment(data_dir: str, work_dir: str, epochs: int = 4,
                        seed: int = 0, cfg=None) -> Dict:
    """Weight-ported, dropout-0, shuffle-False: same data, same order, same
    init — per-epoch curves must nearly coincide. ``cfg`` overrides the
    default S config (e.g. the GMU-fusion topology)."""
    from .datasets import get_data_module

    if cfg is None:
        cfg = _load_s_cfg(data_dir, work_dir, epochs, seed, dropout=0.0)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    params, sd = _shared_init(cfg, dm)
    native = native_protocol(cfg, work_dir, init_params=params)
    ref = torch_protocol(cfg.model, cfg.train.optimizer, dm, epochs,
                         seed=seed, state_dict=sd)
    return {"mode": "lockstep", "native": native, "torch": ref}


# ---------------------------------------------------------------------------
# GradBlend weight-estimation parity (VERDICT r3 #1)
# ---------------------------------------------------------------------------

def torch_gradblend_weights(model_cfg, state_dict: Optional[Dict], datamodule,
                            epochs: int = 2, lr: float = 1e-3, model=None):
    """The reference's GradBlend estimation
    (`/root/reference/modules/gradblend.py:24-112`) in torch: per branch,
    copy encoder+head, measure train/val loss sums, train ``epochs`` with a
    fresh Adam, re-measure, then ``O = dO_Nn - dO_N``, ``G = L_val_after -
    L_val_before``, ``w = |O/G^2|``; the fused branch trains mixer+head with
    the unimodal encoders frozen (`gradblend.py:99-105`); normalize to sum 1.

    Two deliberate deviations from the reference's *plumbing* (the MATH is
    identical): (a) batches are the native adapter's deterministic
    sequential drop-last 90/10 split instead of ``shuffle=True`` loaders
    (`/root/reference/models/avmnist.py:228-229`) — shuffling only permutes
    the SGD order, and parity needs both sides to see identical batches;
    (b) modalities are indexed by batch KEY — the reference's positional
    ``batch[m]`` (`gradblend.py:54`) only works for tuple batches (MIMIC)
    and is a latent crash on dict batches like AV-MNIST's
    (`/root/reference/datasets/avmnist.py:144`). Weight order matches the
    native adapter: (*modalities, fused) — the reference estimates the same
    per-branch values in (audio, image, fused) order and indexes them back
    per branch (`models/avmnist.py:222,290-291`), so the per-branch VALUES
    are directly comparable."""
    import copy as _copy

    if model is None:
        model = build_reference_torch_model(model_cfg, state_dict)
    splits = datamodule.splits["train"]
    n = len(next(iter(splits.values())))
    cut = int(n * 0.1)
    bs = datamodule.batch_size

    # mirror of modules/gradblend.py::make_batches (drop-last, sequential)
    def make_batches(lo, hi):
        n_full = (hi - lo) // bs

        def gen():
            if n_full == 0:
                yield {k: v[lo:hi] for k, v in splits.items()}
                return
            for i in range(n_full):
                s = lo + i * bs
                yield {k: v[s:s + bs] for k, v in splits.items()}

        return gen

    train_b, val_b = make_batches(cut, n), make_batches(0, cut)
    ce = nn.CrossEntropyLoss()

    def to_t(b, key):
        return (torch.tensor(np.asarray(b[key])),
                torch.tensor(np.asarray(b["label"]), dtype=torch.long))

    def single_weight(forward, opt_params):
        # sum of per-batch mean-CE losses over a loader (`gradblend.py:52-59`)
        def total(batches):
            with torch.no_grad():
                return sum(float(ce(*forward(b))) for b in batches())

        opt = torch.optim.Adam(opt_params, lr=lr)
        l_n_train, l_n_val = total(train_b), total(val_b)
        for _ in range(epochs):
            for b in train_b():
                opt.zero_grad()
                loss = ce(*forward(b))
                loss.backward()
                opt.step()
        l_nn_train, l_nn_val = total(train_b), total(val_b)
        o = (l_nn_val - l_nn_train) - (l_n_val - l_n_train)
        g = l_nn_val - l_n_val
        # native adds 1e-12 to G^2 (`modules/gradblend.py:103`); match it
        return abs(o / (g * g + 1e-12))

    weights = []
    for key, enc_name, head_name in (("image", "image_mixer", "classifier_image"),
                                     ("audio", "audio_mixer", "classifier_audio")):
        enc = _copy.deepcopy(getattr(model, enc_name))
        head = _copy.deepcopy(getattr(model, head_name))

        def fwd(b, key=key, enc=enc, head=head):
            x, y = to_t(b, key)
            feats = enc(x)
            feats = feats.reshape(feats.shape[0], -1, feats.shape[-1]).mean(1)
            return head(feats), y

        weights.append(single_weight(
            fwd, list(enc.parameters()) + list(head.parameters())))

    # fused branch: frozen copies of the unimodal encoders, trainable
    # fusion mixer + fusion head (`gradblend.py:92-105`)
    uenc = {k: _copy.deepcopy(getattr(model, f"{k}_mixer"))
            for k in ("image", "audio")}
    for e in uenc.values():
        for p in e.parameters():
            p.requires_grad = False
    fm = _copy.deepcopy(model.fusion_mixer)
    fhead = _copy.deepcopy(model.classifier_fusion)

    def fused_fwd(b):
        encs = [uenc["image"](torch.tensor(np.asarray(b["image"]))),
                uenc["audio"](torch.tensor(np.asarray(b["audio"])))]
        max_rank = max(e.dim() for e in encs)
        encs = [e.unsqueeze(1) if e.dim() < max_rank else e for e in encs]
        tokens = fm(torch.cat(encs, dim=1))
        tokens = tokens.reshape(tokens.shape[0], -1, tokens.shape[-1]).mean(1)
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
        return fhead(tokens), y

    weights.append(single_weight(
        fused_fwd, list(fm.parameters()) + list(fhead.parameters())))
    w = np.asarray(weights, np.float64)
    return (w / w.sum()).astype(np.float32)


def gradblend_parity(cfg, gb_epochs: int = 2) -> Dict:
    """Run the NATIVE estimator (`modules/gradblend.py`, the exact function
    the epoch hook calls) and the torch twin above from identical exported
    init weights on identical data; returns both weight vectors."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .modules.gradblend import estimate_gradblend_weights
    from .parallel import MeshConfig
    from .training import Trainer
    from .utils.torch_import import export_reference_state_dict

    cfg.model.gradblend = True
    cfg.model.gb_epochs = int(gb_epochs)
    if float(cfg.model.get("dropout", 0.0)) != 0.0:
        # the torch twin trains/evaluates without dropout RNG lockstep — a
        # nonzero dropout would make the two O/G^2 estimates diverge for
        # RNG reasons and report a bogus 'parity failure'; force the only
        # configuration in which the comparison is meaningful
        print(f"[gradblend-parity] forcing model.dropout=0 "
              f"(was {cfg.model.dropout}): the torch twin has no dropout-RNG "
              "lockstep, so parity is only defined dropout-free")
        cfg.model.dropout = 0.0
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    m = cfg.model.modalities
    shapes = {name: (int(m[name].in_channels), int(m[name].patch_size),
                     int(m[name].patch_size)) for name in ("image", "audio")}
    sd = export_reference_state_dict(params, ("image", "audio"), shapes)

    trainer = Trainer(cfg.train, name="gb_parity",
                      mesh_config=MeshConfig(data=1, model=1),
                      use_wandb=False, full_cfg=cfg)
    trainer.params = params
    trainer.datamodule = dm
    w_native = estimate_gradblend_weights(task, trainer)
    w_torch = torch_gradblend_weights(cfg.model, sd, dm, epochs=gb_epochs)
    return {"mode": "gradblend", "order": list(task.loss_names),
            "native": [float(x) for x in w_native],
            "torch": [float(x) for x in w_torch],
            "max_abs_diff": float(np.abs(np.asarray(w_native, np.float64)
                                         - np.asarray(w_torch, np.float64)).max())}


# ---------------------------------------------------------------------------
# Lockstep parity beyond the flagship topology (VERDICT r3 #2):
# MM-IMDB (multilabel BCE-pos_weight) and MIMIC (tuple batch, MLP +
# MLPMixerNoPatching)
# ---------------------------------------------------------------------------

class _RefMLP(nn.Module):
    """N x (Linear+ReLU+Dropout) + optional output Linear with the
    reference's ``module_list`` indices (`/root/reference/modules/mlp.py:4-27`)."""

    def __init__(self, input_dim, hidden_dim, num_blocks, output_dim, dropout):
        super().__init__()
        self.module_list = nn.ModuleList()
        for i in range(num_blocks):
            self.module_list.append(nn.Linear(input_dim if i == 0 else hidden_dim,
                                              hidden_dim))
            self.module_list.append(nn.ReLU())
            self.module_list.append(nn.Dropout(dropout))
        if output_dim is not None:
            self.module_list.append(nn.Linear(hidden_dim, output_dim))

    def forward(self, x):
        for m in self.module_list:
            x = m(x)
        return x


class _RefMLPMixerNoPatching(nn.Module):
    """Linear proj instead of conv patching
    (`/root/reference/modules/mixer.py:165-186`)."""

    def __init__(self, embedding_dim, proj_dim, hidden, n_tokens, n_blocks,
                 token_dim, channel_dim, dropout):
        super().__init__()
        self.proj = nn.Linear(embedding_dim, proj_dim)
        self.mixer_blocks = nn.Sequential(*[
            _MixerBlock(hidden, n_tokens, token_dim, channel_dim, dropout)
            for _ in range(n_blocks)])
        self.layer_norm = nn.LayerNorm(hidden)

    def forward(self, x):
        return self.layer_norm(self.mixer_blocks(self.proj(x)))


class RefMMIMDBMixer(nn.Module):
    """The MMIMDBMixerMultiLoss forward
    (`/root/reference/models/mmimdb.py:66-133`): image + text MLPMixer
    encoders (text rides a 1-channel feature grid), token-axis concat,
    FusionMixer, mean-pooled heads + StandardClassifier."""

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
        self.text_mixer = enc(m.text)
        n_tokens = (self.image_mixer.mixer_blocks[0].token_mix[2].net[0].in_features
                    + self.text_mixer.mixer_blocks[0].token_mix[2].net[0].in_features)
        mm = m.multimodal
        self.fusion_mixer = _RefFusionMixer(int(mm.hidden_dim), n_tokens,
                                            int(mm.num_mixers), int(mm.token_dim),
                                            int(mm.channel_dim), d)
        n_cls = int(m.classification.num_classes)
        self.classifier_image = nn.Linear(int(m.image.hidden_dim), n_cls)
        self.classifier_text = nn.Linear(int(m.text.hidden_dim), n_cls)
        self.classifier_fusion = _RefStandardClassifier(int(mm.hidden_dim), n_cls)

    def forward(self, image, text):
        ti = self.image_mixer(image)
        tt = self.text_mixer(text)
        tf = self.fusion_mixer(torch.cat([ti, tt], dim=1))
        return (self.classifier_image(ti.mean(1)),
                self.classifier_text(tt.mean(1)),
                self.classifier_fusion(tf))


class RefMimicMixer(nn.Module):
    """The MimicMixerMultiLoss forward
    (`/root/reference/models/mimic.py:95-124`): MLP static encoder
    contributing ONE fused token (``static.unsqueeze(1)``), time-series
    MLPMixerNoPatching, static head on the raw embedding, time head on
    pooled tokens."""

    def __init__(self, model_cfg):
        super().__init__()
        m = model_cfg.modalities
        d = float(model_cfg.get("dropout", 0.0))
        s, t, mm = m.static, m.time, m.multimodal
        self.static_extractor = _RefMLP(int(s.input_dim), int(s.hidden_dim),
                                        int(s.num_blocks),
                                        int(s.output_dim) if s.get("output_dim")
                                        is not None else None, d)
        self.time_mixer = _RefMLPMixerNoPatching(
            int(t.embedding_dim), int(t.proj_dim), int(t.hidden_dim),
            int(t.num_patch), int(t.num_mixers), int(t.token_dim),
            int(t.channel_dim), d)
        n_tokens = 1 + int(t.num_patch)
        self.fusion_mixer = _RefFusionMixer(int(mm.hidden_dim), n_tokens,
                                            int(mm.num_mixers), int(mm.token_dim),
                                            int(mm.channel_dim), d)
        n_cls = int(m.classification.num_classes)
        self.classifier_static = nn.Linear(int(s.output_dim), n_cls)
        self.classifier_time = nn.Linear(int(t.hidden_dim), n_cls)
        self.classifier_fusion = _RefStandardClassifier(int(mm.hidden_dim), n_cls)

    def forward(self, static, time):
        fs = self.static_extractor(static)
        tt = self.time_mixer(time)
        tf = self.fusion_mixer(torch.cat([fs.unsqueeze(1), tt], dim=1))
        return (self.classifier_static(fs),
                self.classifier_time(tt.mean(1)),
                self.classifier_fusion(tf))


def _torch_family_protocol(model, loss_fn, test_fn, datamodule, optimizer_cfg,
                           epochs: int, es_patience: int = 30,
                           epoch_start_hook=None, epoch_val_hook=None) -> Dict:
    """The reference training protocol (epoch loop, best-val snapshot,
    plateau LR, early stop — `/root/reference/run.py:59-83`,
    `train_test_module.py:166-175`) for any (loss_fn, test_fn) family.
    ``epoch_start_hook(model, epoch)`` mirrors the reference's
    ``on_train_epoch_start`` (the GradBlend refit site,
    `/root/reference/models/mimic.py:305-320`);
    ``epoch_val_hook(model, epoch, datamodule)`` runs right after the val
    sweep, mirroring ``validation_epoch_end`` (the SoftAdapt history/refit
    site, `/root/reference/models/mmimdb.py:156-177`)."""
    from .training.callbacks import EarlyStopping, ReduceLROnPlateau

    opt = torch.optim.Adam(
        model.parameters(), lr=float(optimizer_cfg.lr),
        betas=tuple(optimizer_cfg.get("betas", (0.9, 0.999))),
        eps=float(optimizer_cfg.get("eps", 1e-8)),
        weight_decay=float(optimizer_cfg.get("weight_decay", 0.0)))
    plateau = ReduceLROnPlateau(float(optimizer_cfg.lr),
                                patience=int(optimizer_cfg.get(
                                    "scheduler_patience", 5)))
    stopper = EarlyStopping("val_loss", patience=es_patience, mode="min")
    datamodule.setup("fit")
    datamodule.setup("test")
    history = {"train_loss": [], "val_loss": []}
    best_val, best_state, best_epoch = np.inf, None, -1
    for epoch in range(epochs):
        if epoch_start_hook is not None:
            epoch_start_hook(model, epoch)
        model.train()
        losses = []
        for batch in datamodule.train_batches():
            opt.zero_grad()
            loss = loss_fn(model, batch)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        model.eval()
        with torch.no_grad():
            vl = [float(loss_fn(model, b)) for b in datamodule.val_batches()]
        val = float(np.mean(vl))
        history["train_loss"].append(float(np.mean(losses)))
        history["val_loss"].append(val)
        if epoch_val_hook is not None:
            epoch_val_hook(model, epoch, datamodule)
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
    out = {"framework": "torch-reference", "history": history,
           "best_epoch": best_epoch, "best_val_loss": float(best_val)}
    with torch.no_grad():
        out.update(test_fn(model, datamodule))
    return out


def _native_family_protocol(cfg, name: str, init_params=None, dm=None,
                            shuffle_train: bool = False,
                            task_hook=None) -> Dict:
    """``Trainer.fit`` + best-ckpt test for any family config; returns the
    full test-metric dict plus loss history. ``dm`` overrides the
    config-built datamodule (the synthetic in-memory lockstep modules).
    ``shuffle_train`` stays False for lockstep (both sides iterate dataset
    order); the seed-noise protocol experiments pass True (the shipped
    shuffled recipe). ``task_hook(task)`` instruments the task before fit
    (e.g. ``_capture_applied_weights`` for estimator-in-loop runs)."""
    from .datasets import get_data_module
    from .models import get_model
    from .parallel import MeshConfig
    from .training import Trainer

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    if task_hook is not None:
        task_hook(task)
    if dm is None:
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.shuffle_train = shuffle_train
    trainer = Trainer(cfg.train, name=name,
                      mesh_config=MeshConfig(data=1, model=1),
                      use_wandb=False, full_cfg=cfg)
    if init_params is not None:
        trainer.params = init_params
    trainer.fit(task, dm)
    logs = trainer.test(task, dm, ckpt="best")
    rows = [json.loads(l) for l in open(
        os.path.join(trainer.logger.log_dir, "metrics.jsonl"))]
    return {"framework": "m2mixer_tpu",
            "history": {
                "train_loss": [r["train_loss"] for r in rows if "train_loss" in r],
                "val_loss": [r["val_loss"] for r in rows if "val_loss" in r]},
            "best_epoch": int(trainer.logger.summary.get("best_val_loss_epoch", -1)),
            "best_val_loss": float(trainer.logger.summary.get("best_val_loss", np.nan)),
            **{k: float(v) for k, v in logs.items() if np.isscalar(v) or
               getattr(v, "ndim", 1) == 0}}


def lockstep_experiment_mmimdb(data_dir: str, work_dir: str, cfg,
                               epochs: int = 3) -> Dict:
    """MM-IMDB lockstep: multilabel ``BCEWithLogitsLoss(pos_weight)`` heads,
    plain-sum combine, sigmoid>0.5 preds, weighted/macro F1
    (`/root/reference/models/mmimdb.py:47-50,125-133,184-192`)."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .training import metrics as tm
    from .utils.torch_import import export_reference_state_dict

    cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.shuffle_train = False
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    m = cfg.model.modalities
    shapes = {name: (int(m[name].in_channels), int(m[name].patch_size),
                     int(m[name].patch_size)) for name in ("image", "text")}
    sd = export_reference_state_dict(params, ("image", "text"), shapes)
    native = _native_family_protocol(cfg, "parity_mmimdb", init_params=params)

    model = RefMMIMDBMixer(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    pos_weight = torch.tensor(np.asarray(cfg.model.pos_weight, np.float32))
    bce = nn.BCEWithLogitsLoss(pos_weight=pos_weight)

    def loss_fn(model, b):
        li, lt, lf = model(torch.tensor(np.asarray(b["image"])),
                           torch.tensor(np.asarray(b["text"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.float32)
        # plain sum (`mmimdb.py:128-133`)
        return bce(li, y) + bce(lt, y) + bce(lf, y)

    n_labels = int(cfg.model.modalities.classification.num_classes)

    def test_fn(model, dm):
        f1w = tm.F1Score(task="multilabel", num_labels=n_labels, average="weighted")
        f1m = tm.F1Score(task="multilabel", num_labels=n_labels, average="macro")
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            _, _, lf = model(torch.tensor(np.asarray(b["image"])),
                             torch.tensor(np.asarray(b["text"])))
            preds = (torch.sigmoid(lf) > 0.5).long().numpy()
            f1w.update(preds, np.asarray(b["label"]))
            f1m.update(preds, np.asarray(b["label"]))
        return {"test_loss": float(np.mean(tl)),
                "test_f1w": float(f1w.compute()),
                "test_f1m": float(f1m.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs)
    return {"mode": "lockstep_mmimdb", "native": native, "torch": ref}


def lockstep_experiment_mimic(data_dir: str, work_dir: str, cfg,
                              epochs: int = 3) -> Dict:
    """MIMIC lockstep: tuple-semantics batch (static, time, label), CE
    branches, fixed weighting WITHOUT the x3 scale
    (`/root/reference/models/mimic.py:95-124`)."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .training import metrics as tm
    from .utils.torch_import import export_mimic_state_dict

    cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.shuffle_train = False
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    sd = export_mimic_state_dict(params)
    native = _native_family_protocol(cfg, "parity_mimic", init_params=params)

    model = RefMimicMixer(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    ce = nn.CrossEntropyLoss()
    w_f = float(cfg.model.get("fusion_loss_weight", 1.0 / 3.0))
    ow = (1.0 - w_f) / 2.0
    # the torch loss below holds w_f FIXED across epochs; both frameworks
    # support per-epoch fusion_loss_change annealing (`mimic.py:149-150`,
    # models/base.py), so a nonzero value here would report a bogus
    # divergence — guard like the lockstep dropout guard
    if float(cfg.model.get("fusion_loss_change", 0.0)) != 0.0:
        raise ValueError(
            "lockstep_experiment_mimic: model.fusion_loss_change must be 0 "
            "(the torch twin's loss uses a fixed fusion weight; annealing "
            "parity is covered by the annealed-weighting unit tests)")

    def loss_fn(model, b):
        ls_, lt_, lf_ = model(torch.tensor(np.asarray(b["static"])),
                              torch.tensor(np.asarray(b["time"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
        # fixed weighting, no x3 (`mimic.py:118-120`)
        return w_f * ce(lf_, y) + ow * ce(ls_, y) + ow * ce(lt_, y)

    n_cls = int(cfg.model.modalities.classification.num_classes)

    def test_fn(model, dm):
        f1 = tm.F1Score(task="multiclass", num_classes=n_cls, average="micro")
        acc = tm.Accuracy(task="multiclass", num_classes=n_cls)
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            _, _, lf_ = model(torch.tensor(np.asarray(b["static"])),
                              torch.tensor(np.asarray(b["time"])))
            preds = lf_.argmax(dim=1).numpy()
            f1.update(preds, np.asarray(b["label"]))
            acc.update(preds, np.asarray(b["label"]))
        return {"test_loss": float(np.mean(tl)),
                "test_f1_micro": float(f1.compute()),
                "test_acc": float(acc.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs)
    return {"mode": "lockstep_mimic", "native": native, "torch": ref}


class _RefGRUFlatten(nn.Module):
    """The reference's MultiBench GRU wrapper on the flatten path: full
    output sequence -> dropout -> flatten
    (`/root/reference/modules/recurrent.py:27-59`)."""

    def __init__(self, input_dim, hidden_dim, dropout):
        super().__init__()
        self.gru = nn.GRU(input_dim, hidden_dim, batch_first=True)
        self.p = dropout
        self.dropout_layer = nn.Dropout(dropout)

    def forward(self, x):
        out, _ = self.gru(x)
        if self.p:
            out = self.dropout_layer(out)
        return torch.flatten(out, 1)


class RefMimicRecurrent(nn.Module):
    """The MimicRecurrent forward
    (`/root/reference/models/mimic.py:210-267`): MLP static encoder,
    flattened-GRU time encoder, 1-D concat into an MLP fusion encoder,
    Linear static/time heads (the time head over the
    input_dim*hidden_dim*2 flattened width, `:226-228`) +
    StandardClassifier fusion head."""

    def __init__(self, model_cfg):
        super().__init__()
        m = model_cfg.modalities
        d = float(model_cfg.get("dropout", 0.0))
        s, t, mm = m.static, m.time, m.multimodal
        self.static_extractor = _RefMLP(int(s.input_dim), int(s.hidden_dim),
                                        int(s.num_blocks),
                                        int(s.output_dim) if s.get("output_dim")
                                        is not None else None, d)
        self.time_encoder = _RefGRUFlatten(int(t.input_dim), int(t.hidden_dim), d)
        self.fusion_encoder = _RefMLP(int(mm.input_dim), int(mm.hidden_dim),
                                      int(mm.num_blocks), None, d)
        n_cls = int(m.classification.num_classes)
        time_out = int(t.input_dim) * int(t.hidden_dim) * 2
        self.classifier_static = nn.Linear(int(s.output_dim), n_cls)
        self.classifier_time = nn.Linear(time_out, n_cls)
        self.classifier_fusion = _RefStandardClassifier(int(mm.hidden_dim), n_cls)

    def forward(self, static, time):
        fs = self.static_extractor(static)
        ft = self.time_encoder(time)
        ff = self.fusion_encoder(torch.cat([fs, ft], dim=1))
        return (self.classifier_static(fs),
                self.classifier_time(ft),
                self.classifier_fusion(ff))


def lockstep_experiment_mimic_gru(data_dir: str, work_dir: str, cfg,
                                  epochs: int = 3) -> Dict:
    """MimicRecurrent lockstep: the GRU-encoder baseline — the one encoder
    family previously without full-training lockstep. Depends on the
    double-bias ``TorchGRUCell`` (modules/recurrent.py): torch's redundant
    per-gate input+hidden biases receive identical gradients, so identical
    Adam states move each copy by the same step — a single-bias cell's
    effective bias would move at HALF the rate and the curves would
    diverge. CE branches, fixed weighting without the x3
    (`/root/reference/models/mimic.py:268-283`)."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .training import metrics as tm
    from .utils.torch_import import export_mimic_gru_state_dict

    cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
    if float(cfg.model.get("fusion_loss_change", 0.0)) != 0.0:
        raise ValueError(
            "lockstep_experiment_mimic_gru: model.fusion_loss_change must "
            "be 0 (the torch twin's loss uses a fixed fusion weight)")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.shuffle_train = False
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    sd = export_mimic_gru_state_dict(params)
    native = _native_family_protocol(cfg, "parity_mimic_gru", init_params=params,
                                     dm=dm)

    model = RefMimicRecurrent(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    ce = nn.CrossEntropyLoss()
    w_f = float(cfg.model.get("fusion_loss_weight", 1.0 / 3.0))
    ow = (1.0 - w_f) / 2.0

    def loss_fn(model, b):
        ls_, lt_, lf_ = model(torch.tensor(np.asarray(b["static"])),
                              torch.tensor(np.asarray(b["time"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
        return w_f * ce(lf_, y) + ow * ce(ls_, y) + ow * ce(lt_, y)

    n_cls = int(cfg.model.modalities.classification.num_classes)

    def test_fn(model, dm):
        f1 = tm.F1Score(task="multiclass", num_classes=n_cls, average="micro")
        acc = tm.Accuracy(task="multiclass", num_classes=n_cls)
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            _, _, lf_ = model(torch.tensor(np.asarray(b["static"])),
                              torch.tensor(np.asarray(b["time"])))
            preds = lf_.argmax(dim=1).numpy()
            f1.update(preds, np.asarray(b["label"]))
            acc.update(preds, np.asarray(b["label"]))
        return {"test_loss": float(np.mean(tl)),
                "test_f1_micro": float(f1.compute()),
                "test_acc": float(acc.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs)
    return {"mode": "lockstep_mimic_gru", "native": native, "torch": ref}


# ---------------------------------------------------------------------------
# Image+text twins (MultiOFF / Memotion / MMHS150K) and the UQ/EDL twin
# (VERDICT r4 #2/#4/#8)
# ---------------------------------------------------------------------------

class _RefPNLPMixer(nn.Module):
    """Bottleneck Linear over windowed hash features + MixerBlocks + LN
    (`/root/reference/modules/mixer.py:232-264`; both FF hidden dims use
    ``mlp_hidden_dim``)."""

    def __init__(self, max_seq_len, hidden_dim, num_mixers, mlp_hidden_dim,
                 window, feat_size, dropout):
        super().__init__()
        self.num_patch = max_seq_len
        self.bottleneck = nn.Linear((2 * window + 1) * feat_size, hidden_dim)
        self.mixer_blocks = nn.Sequential(*[
            _MixerBlock(hidden_dim, max_seq_len, mlp_hidden_dim,
                        mlp_hidden_dim, dropout) for _ in range(num_mixers)])
        self.layer_norm = nn.LayerNorm(hidden_dim)

    def forward(self, x):
        return self.layer_norm(self.mixer_blocks(self.bottleneck(x)))


class RefImageTextMixer(nn.Module):
    """The image+PNLP-text MultiLoss topology shared by MultiOFF
    (`/root/reference/models/multioff.py:35-45`), Memotion
    (`memotion.py:34-46`), and — with ``with_ocr=True`` — the 3-modal
    MMHS150K whose OCR mixer reuses the text block config
    (`mmhs150.py:36-49`): MLPMixer image encoder, PNLPMixer text encoder(s),
    token-axis concat, FusionMixer, mean-pooled Linear heads +
    StandardClassifier fusion head."""

    def __init__(self, model_cfg, with_ocr: bool = False):
        super().__init__()
        m = model_cfg.modalities
        d = float(model_cfg.get("dropout", 0.0))
        mi = m.image
        self.image_mixer = _RefMLPMixer(int(mi.in_channels), int(mi.hidden_dim),
                                        int(mi.patch_size), tuple(mi.image_size),
                                        int(mi.num_mixers), int(mi.token_dim),
                                        int(mi.channel_dim), d)
        mt = m.text

        def text_enc():
            return _RefPNLPMixer(int(mt.max_seq_len), int(mt.hidden_dim),
                                 int(mt.num_mixers), int(mt.mlp_hidden_dim),
                                 int(mt.bottleneck_window_size),
                                 int(mt.bottleneck_features_size), d)

        self.text_mixer = text_enc()
        self.with_ocr = with_ocr
        n_tokens = (int(mi.image_size[0]) // int(mi.patch_size)) * (
            int(mi.image_size[1]) // int(mi.patch_size)) + int(mt.max_seq_len)
        n_cls = int(m.classification.num_classes)
        if with_ocr:
            self.text_ocr_mixer = text_enc()
            n_tokens += int(mt.max_seq_len)
            self.classifier_text_ocr = nn.Linear(int(mt.hidden_dim), n_cls)
        mm = m.multimodal
        self.fusion_mixer = _RefFusionMixer(int(mm.hidden_dim), n_tokens,
                                            int(mm.num_mixers), int(mm.token_dim),
                                            int(mm.channel_dim), d)
        self.classifier_image = nn.Linear(int(mi.hidden_dim), n_cls)
        self.classifier_text = nn.Linear(int(mt.hidden_dim), n_cls)
        self.classifier_fusion = _RefStandardClassifier(int(mm.hidden_dim), n_cls)

    def forward(self, image, text, ocr=None):
        ti = self.image_mixer(image)
        tt = self.text_mixer(text)
        encs = [ti, tt]
        if self.with_ocr:
            encs.append(self.text_ocr_mixer(ocr))
        tf = self.fusion_mixer(torch.cat(encs, dim=1))
        out = [self.classifier_image(ti.mean(1)),
               self.classifier_text(tt.mean(1))]
        if self.with_ocr:
            out.append(self.classifier_text_ocr(encs[2].mean(1)))
        out.append(self.classifier_fusion(tf))
        return tuple(out)


def _torch_edl_mse(logits, y, num_classes):
    """EDL MSE Bayes risk (`/root/reference/modules/losses.py:24-31`); the
    reference's annealed KL term is multiplied by ZERO (`:20-21`) and its
    value is always finite (alpha >= 1), so the product is exactly 0.0 and
    is omitted here."""
    target = torch.eye(num_classes)[y]
    evidence = torch.relu(logits)
    alpha = evidence + 1.0
    strength = alpha.sum(dim=-1)
    p = alpha / strength[:, None]
    err = (target - p) ** 2
    var = p * (1 - p) / (strength[:, None] + 1)
    return (err + var).sum(dim=-1).mean()


from .datasets.base import ArrayDataModule as _ArrayDataModule  # noqa: E402


class _SyntheticImageText(_ArrayDataModule):
    """Deterministic in-memory surrogate for the image+PNLP-text lockstep
    families: class-signal planted in every modality, optional OCR features
    with per-sample ``use_features``/``use_features_ocr`` flags (~30% zero,
    so the MMHS masked-loss branches genuinely fire — the file datamodule's
    pnlp path always sets the flags to 1, `datasets/mmhs150.py:94-97`;
    the zero-flag regime is the reference word2vec path's,
    `/root/reference/datasets/mmhs150.py`)."""

    def __init__(self, n: int, batch_size: int, image_shape, seq: int,
                 width: int, n_labels: int, with_ocr: bool = False,
                 flag_rate: float = 0.7, seed: int = 0):
        super().__init__(batch_size=batch_size, shuffle_train=False)
        rng = np.random.RandomState(seed)
        labels = rng.randint(0, n_labels, n).astype(np.int32)
        img_pat = rng.randn(n_labels, *image_shape).astype(np.float32)
        txt_pat = rng.randn(n_labels, seq, width).astype(np.float32)
        ocr_pat = rng.randn(n_labels, seq, width).astype(np.float32)
        data = {
            "image": (0.6 * img_pat[labels]
                      + 0.4 * rng.randn(n, *image_shape)).astype(np.float32),
            "text": (0.6 * txt_pat[labels]
                     + 0.4 * rng.randn(n, seq, width)).astype(np.float32),
            "label": labels,
        }
        if with_ocr:
            data["ocr"] = (0.6 * ocr_pat[labels]
                           + 0.4 * rng.randn(n, seq, width)).astype(np.float32)
            data["use_features"] = (rng.rand(n) < flag_rate).astype(np.float32)
            data["use_features_ocr"] = (rng.rand(n) < flag_rate).astype(np.float32)
        cut1, cut2 = int(0.7 * n), int(0.8 * n)
        self.splits = {
            "train": {k: v[:cut1] for k, v in data.items()},
            "val": {k: v[cut1:cut2] for k, v in data.items()},
            "test": {k: v[cut2:] for k, v in data.items()},
        }

    def setup(self, stage=None):
        pass


def _init_image_text(cfg, dm, names, with_conv_image=True):
    """Native init + reference-named export for an image+text family."""
    import jax

    from .models import get_model
    from .utils.torch_import import export_reference_state_dict

    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    mi = cfg.model.modalities.image
    shapes = ({"image": (int(mi.in_channels), int(mi.patch_size),
                         int(mi.patch_size))} if with_conv_image else {})
    sd = export_reference_state_dict(params, names, shapes)
    return params, sd


def small_image_text_cfg(family: str, work_dir: str, epochs: int = 3,
                         seed: int = 0):
    """Shrink a shipped image+text family config (multioff / memotion /
    mmhs150) to lockstep-test geometry: the data shapes and loss math stay
    the family's own; only dims shrink. Train/val/test = 224/32/64 of
    n=320 at batch 16 — whole batches everywhere (no drop-last
    ambiguity)."""
    import os as _os

    from . import config as cfg_lib

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    paths = {"multioff": "multioff/multioff_3loss.yml",
             "memotion": "memotion/memotion_3loss.yml",
             "mmhs150": "mmhs150/mmhs150_4loss.yml"}
    cfg = cfg_lib.load(_os.path.join(repo, "cfg", paths[family]))
    cfg.dataset.params.batch_size = 16
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = int(epochs)
    cfg.train.seed = int(seed)
    cfg.train.monitor = "val_loss"
    cfg.train.monitor_mode = "min"
    cfg.train.tensorboard_path = _os.path.join(work_dir, "logs")
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.model.dropout = 0.0
    mi = cfg.model.modalities.image
    mi.image_size = [32, 32]
    mi.patch_size = 16
    mi.hidden_dim = 32
    mi.channel_dim = 64
    mi.token_dim = 8
    mi.num_mixers = 1
    mt = cfg.model.modalities.text
    mt.max_seq_len = 8
    mt.bottleneck_features_size = 16
    mt.bottleneck_window_size = 1
    mt.hidden_dim = 32
    mt.mlp_hidden_dim = 16
    mt.num_mixers = 1
    mm = cfg.model.modalities.multimodal
    mm.hidden_dim = 32
    mm.channel_dim = 64
    mm.token_dim = 8
    mm.num_mixers = 1
    tokens = 4 + 8 + (8 if family == "mmhs150" else 0)
    cfg.model.modalities.classification.input_shape = [16, tokens, 32]
    return cfg


def lockstep_experiment_multioff(work_dir: str, cfg, epochs: int = 3,
                                 n: int = 320) -> Dict:
    """MultiOFF lockstep: unweighted BCE on all three heads, plain-sum
    combine, sigmoid>0.5 preds (`/root/reference/models/multioff.py:47-50,
    115-136`)."""
    from .training import metrics as tm

    dm = _SyntheticImageText(
        n, int(cfg.dataset.params.batch_size),
        (int(cfg.model.modalities.image.in_channels),
         *[int(x) for x in cfg.model.modalities.image.image_size]),
        int(cfg.model.modalities.text.max_seq_len),
        (2 * int(cfg.model.modalities.text.bottleneck_window_size) + 1)
        * int(cfg.model.modalities.text.bottleneck_features_size),
        n_labels=2, seed=int(cfg.train.seed))
    params, sd = _init_image_text(cfg, dm, ("image", "text"))
    native = _native_family_protocol(cfg, "parity_multioff",
                                     init_params=params, dm=dm)

    model = RefImageTextMixer(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    bce = nn.BCEWithLogitsLoss()

    def loss_fn(model, b):
        li, lt, lf = model(torch.tensor(np.asarray(b["image"])),
                           torch.tensor(np.asarray(b["text"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.float32)[:, None]
        return bce(li, y) + bce(lt, y) + bce(lf, y)

    def test_fn(model, dm):
        f1 = tm.F1Score(task="binary")
        acc = tm.Accuracy(task="binary")
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            _, _, lf = model(torch.tensor(np.asarray(b["image"])),
                             torch.tensor(np.asarray(b["text"])))
            preds = (torch.sigmoid(lf) > 0.5).long().numpy()
            f1.update(preds, np.asarray(b["label"]).reshape(-1, 1))
            acc.update(preds, np.asarray(b["label"]).reshape(-1, 1))
        return {"test_loss": float(np.mean(tl)), "test_f1": float(f1.compute()),
                "test_accuracy": float(acc.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs)
    return {"mode": "lockstep_multioff", "native": native, "torch": ref}


def lockstep_experiment_memotion(work_dir: str, cfg, epochs: int = 3,
                                 n: int = 320) -> Dict:
    """Memotion lockstep: CE on all three heads, PLAIN SUM (no weighting,
    no x3 — `/root/reference/models/memotion.py:105-112`), argmax preds,
    macro F1."""
    from .training import metrics as tm

    dm = _SyntheticImageText(
        n, int(cfg.dataset.params.batch_size),
        (int(cfg.model.modalities.image.in_channels),
         *[int(x) for x in cfg.model.modalities.image.image_size]),
        int(cfg.model.modalities.text.max_seq_len),
        (2 * int(cfg.model.modalities.text.bottleneck_window_size) + 1)
        * int(cfg.model.modalities.text.bottleneck_features_size),
        n_labels=int(cfg.model.modalities.classification.num_classes),
        seed=int(cfg.train.seed))
    params, sd = _init_image_text(cfg, dm, ("image", "text"))
    native = _native_family_protocol(cfg, "parity_memotion",
                                     init_params=params, dm=dm)

    model = RefImageTextMixer(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    ce = nn.CrossEntropyLoss()

    def loss_fn(model, b):
        li, lt, lf = model(torch.tensor(np.asarray(b["image"])),
                           torch.tensor(np.asarray(b["text"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
        return ce(li, y) + ce(lt, y) + ce(lf, y)

    n_cls = int(cfg.model.modalities.classification.num_classes)

    def test_fn(model, dm):
        f1m = tm.F1Score(task="multiclass", num_classes=n_cls, average="macro")
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            _, _, lf = model(torch.tensor(np.asarray(b["image"])),
                             torch.tensor(np.asarray(b["text"])))
            f1m.update(lf.argmax(dim=1).numpy(), np.asarray(b["label"]))
        return {"test_loss": float(np.mean(tl)), "test_f1m": float(f1m.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs)
    return {"mode": "lockstep_memotion", "native": native, "torch": ref}


def lockstep_experiment_mmhs(work_dir: str, cfg, epochs: int = 3,
                             n: int = 320) -> Dict:
    """MMHS150K lockstep (VERDICT r4 #2): the only 3-modal, masked-flag,
    4-way-weighted topology — image MLPMixer + two PNLPMixers, 3-ary
    token concat, four BCE(pos_weight=3.57) heads with the text/OCR losses
    masked by per-sample ``use_features`` flags (~30% zero rows in the
    surrogate so the masks genuinely fire), ``ow=(1-w_f)/3`` weighting
    without the x3 (`/root/reference/models/mmhs150.py:36-54,100-107`).
    The reference's debugging leftover that randomizes ``preds``
    (`mmhs150.py:113`) is not replicated on either side (SURVEY §7.4)."""
    from .training import metrics as tm

    dm = _SyntheticImageText(
        n, int(cfg.dataset.params.batch_size),
        (int(cfg.model.modalities.image.in_channels),
         *[int(x) for x in cfg.model.modalities.image.image_size]),
        int(cfg.model.modalities.text.max_seq_len),
        (2 * int(cfg.model.modalities.text.bottleneck_window_size) + 1)
        * int(cfg.model.modalities.text.bottleneck_features_size),
        n_labels=2, with_ocr=True, seed=int(cfg.train.seed))
    params, sd = _init_image_text(cfg, dm, ("image", "text", "text_ocr"))
    native = _native_family_protocol(cfg, "parity_mmhs",
                                     init_params=params, dm=dm)

    model = RefImageTextMixer(cfg.model, with_ocr=True)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    bce = nn.BCEWithLogitsLoss(pos_weight=torch.tensor([3.57]))
    w_f = float(cfg.model.get("fusion_loss_weight", 1.0 / 4.0))
    ow = (1.0 - w_f) / 3.0
    # the torch loss holds w_f FIXED; the native MMHS task anneals it
    # UNGATED at every train-epoch end when fusion_loss_change is set
    # (`mmhs150.py:135`, base.py anneal_on='train_end') — guard like the
    # mimic twin so a nonzero value can't report a bogus divergence
    if float(cfg.model.get("fusion_loss_change", 0.0)) != 0.0:
        raise ValueError(
            "lockstep_experiment_mmhs: model.fusion_loss_change must be 0 "
            "(the torch twin's loss uses a fixed fusion weight)")

    def forward(model, b):
        return model(torch.tensor(np.asarray(b["image"])),
                     torch.tensor(np.asarray(b["text"])),
                     torch.tensor(np.asarray(b["ocr"])))

    def loss_fn(model, b):
        li, lt, lo, lf = forward(model, b)
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.float32)[:, None]
        use_t = torch.tensor(np.asarray(b["use_features"],
                                        np.float32)).reshape(-1, 1)
        use_o = torch.tensor(np.asarray(b["use_features_ocr"],
                                        np.float32)).reshape(-1, 1)
        # masked exactly like the reference: zero both logits and labels
        # for flag-0 rows (`mmhs150.py:100-103`)
        return (w_f * bce(lf, y) + ow * bce(li, y)
                + ow * bce(lt * use_t, y * use_t)
                + ow * bce(lo * use_o, y * use_o))

    def test_fn(model, dm):
        f1 = tm.F1Score(task="binary")
        acc = tm.Accuracy(task="binary")
        auc = tm.AUROC(task="binary")
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            lf = forward(model, b)[-1]
            preds = (torch.sigmoid(lf) > 0.5).long().numpy()
            labels = np.asarray(b["label"]).reshape(-1, 1)
            f1.update(preds, labels)
            acc.update(preds, labels)
            auc.update(torch.sigmoid(lf).numpy(), labels)
        return {"test_loss": float(np.mean(tl)), "test_f1": float(f1.compute()),
                "test_accuracy": float(acc.compute()),
                "test_auc": float(auc.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs)
    return {"mode": "lockstep_mmhs", "native": native, "torch": ref}


def lockstep_experiment_uq(data_dir: str, work_dir: str, epochs: int = 3,
                           cfg=None) -> Dict:
    """UQ/EDL lockstep (VERDICT r4 #4): the evidential topology — same
    network as the flagship, EDL MSE Bayes-risk per branch with the x0 KL
    quirk, PLAIN-SUM combine, least-uncertain-branch prediction
    (`/root/reference/models/avmnist.py:447-572`). Predictions: the torch
    side implements the reference's three strict-< masks verbatim
    (`:525-537`, exact ties -> class 0); the native argmin tie-break
    (models/avmnist.py) differs only on exact float ties, which do not
    occur on real logits."""
    from .datasets import get_data_module
    from .training import metrics as tm

    if cfg is None:
        cfg = _load_s_cfg(data_dir, work_dir, epochs, 0, dropout=0.0)
    cfg.model.type = "AVMnistMixerMultiLossUQ"
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    params, sd = _shared_init(cfg, dm)
    native = _native_family_protocol(cfg, "parity_uq", init_params=params,
                                     dm=dm)

    model = RefM2Mixer(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    K = int(cfg.model.modalities.classification.num_classes)

    def loss_fn(model, b):
        li, la, lf = model(torch.tensor(np.asarray(b["image"])),
                           torch.tensor(np.asarray(b["audio"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
        # plain sum (`avmnist.py:508-511`); the KL x0 makes the annealing
        # epoch irrelevant
        return (_torch_edl_mse(li, y, K) + _torch_edl_mse(la, y, K)
                + _torch_edl_mse(lf, y, K))

    def combined_preds(li, la, lf):
        ev, ev_i, ev_a = (torch.relu(x) for x in (lf, li, la))
        preds = ev.argmax(dim=1)
        preds_i = ev_i.argmax(dim=1)
        preds_a = ev_a.argmax(dim=1)
        u = K / (ev + 1).sum(dim=1)
        u_i = K / (ev_i + 1).sum(dim=1)
        u_a = K / (ev_a + 1).sum(dim=1)
        # the reference's strict-< indicator combine (`avmnist.py:525-537`)
        return (preds * ((u < u_i) & (u < u_a)).long()
                + preds_i * ((u_i < u) & (u_i < u_a)).long()
                + preds_a * ((u_a < u) & (u_a < u_i)).long())

    def test_fn(model, dm):
        acc = tm.Accuracy(task="multiclass", num_classes=K)
        f1m = tm.F1Score(task="multiclass", num_classes=K, average="macro")
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            li, la, lf = model(torch.tensor(np.asarray(b["image"])),
                               torch.tensor(np.asarray(b["audio"])))
            preds = combined_preds(li, la, lf).numpy()
            acc.update(preds, np.asarray(b["label"]))
            f1m.update(preds, np.asarray(b["label"]))
        return {"test_loss": float(np.mean(tl)), "test_acc": float(acc.compute()),
                "test_f1m": float(f1m.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs)
    return {"mode": "lockstep_uq", "native": native, "torch": ref}


# ---------------------------------------------------------------------------
# Estimator-in-the-loop lockstep (VERDICT r4 #3): SoftAdapt / GradBlend
# ACTIVE during training in both frameworks, each refitting from its own
# histories/parameters — verifies the estimator->training feedback coupling
# ---------------------------------------------------------------------------

def _capture_applied_weights(store: list):
    """task_hook: record the loss-weight vector APPLIED to each train epoch
    (captured after on_train_epoch_start so a GradBlend refit at epoch
    start is reflected; SoftAdapt refits at val end apply from the next
    epoch on both sides)."""

    def hook(task):
        orig = task.on_train_epoch_start

        def wrapped(trainer, epoch):
            orig(trainer, epoch)
            store.append([float(x) for x in task.current_loss_weights()])

        task.on_train_epoch_start = wrapped

    return hook


def lockstep_experiment_softadapt(data_dir: str, work_dir: str,
                                  epochs: int = 6, update_every: int = 2,
                                  seed: int = 0) -> Dict:
    """SoftAdapt ACTIVE in both frameworks on the flagship topology
    (`model.use_softadapt`, refit every ``update_every`` epochs from each
    side's OWN val branch-loss histories —
    `/root/reference/models/avmnist.py:284-286,340-361`). Returns the
    per-epoch applied weight vectors of both sides alongside the curves."""
    from .datasets import get_data_module

    cfg = _load_s_cfg(data_dir, work_dir, epochs, seed, dropout=0.0)
    cfg.model.use_softadapt = True
    cfg.model.update_loss_weights_per_epoch = int(update_every)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    params, sd = _shared_init(cfg, dm)
    native_weights: list = []
    native = native_protocol(cfg, work_dir, init_params=params,
                             task_hook=_capture_applied_weights(native_weights))
    ref = torch_protocol(cfg.model, cfg.train.optimizer, dm, epochs,
                         seed=seed, state_dict=sd, estimator="softadapt")
    return {"mode": "lockstep_softadapt", "native": native, "torch": ref,
            "native_weights": native_weights,
            "torch_weights": ref["weights_per_epoch"]}


def lockstep_experiment_gradblend_loop(data_dir: str, work_dir: str,
                                       epochs: int = 3, gb_epochs: int = 2,
                                       seed: int = 0) -> Dict:
    """GradBlend ACTIVE in both frameworks (``gb_update_freq=1`` — an O/G^2
    re-estimation from the CURRENT weights at every train-epoch start,
    feeding that epoch's loss combine,
    `/root/reference/models/avmnist.py:219-234,287-289`)."""
    from .datasets import get_data_module

    cfg = _load_s_cfg(data_dir, work_dir, epochs, seed, dropout=0.0)
    cfg.model.gradblend = True
    cfg.model.gb_update_freq = 1
    cfg.model.gb_epochs = int(gb_epochs)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    params, sd = _shared_init(cfg, dm)
    native_weights: list = []
    native = native_protocol(cfg, work_dir, init_params=params,
                             task_hook=_capture_applied_weights(native_weights))
    ref = torch_protocol(cfg.model, cfg.train.optimizer, dm, epochs,
                         seed=seed, state_dict=sd, estimator="gradblend")
    return {"mode": "lockstep_gradblend", "native": native, "torch": ref,
            "native_weights": native_weights,
            "torch_weights": ref["weights_per_epoch"]}


def torch_gradblend_weights_mimic_gru(model, datamodule, epochs: int = 2,
                                      lr: float = 1e-3) -> np.ndarray:
    """The reference's MimicRecurrent GradBlend estimation
    (`/root/reference/models/mimic.py:305-320` wiring
    `/root/reference/modules/gradblend.py:24-112`) from the CURRENT model:
    per branch, deepcopy encoder+head (static MLP + ``classifier_static``,
    flattened-GRU + ``classifier_time``), sub-train with a fresh Adam on a
    90/10 split of the train set, ``O/G^2``; the fused branch trains
    ``fusion_encoder`` + ``classifier_fusion`` over the 1-D concat of the
    FROZEN unimodal encodings (both 2-D, so the reference's rank
    harmonization is a no-op — `gradblend.py:15-20`); normalize to sum 1.
    Weight order (static, time, fused) matches both ``task.loss_names`` and
    the reference's ``gb_weights`` indexing (`mimic.py:283-285`). Batches
    are the native adapter's deterministic sequential drop-last split (the
    same deliberate deviation as ``torch_gradblend_weights`` — the
    reference's ``shuffle=True`` loaders only permute SGD order, and
    parity needs both sides on identical batches)."""
    import copy as _copy

    splits = datamodule.splits["train"]
    n = len(next(iter(splits.values())))
    cut = int(n * 0.1)
    bs = datamodule.batch_size

    def make_batches(lo, hi):
        n_full = (hi - lo) // bs

        def gen():
            if n_full == 0:
                yield {k: v[lo:hi] for k, v in splits.items()}
                return
            for i in range(n_full):
                s = lo + i * bs
                yield {k: v[s:s + bs] for k, v in splits.items()}

        return gen

    train_b, val_b = make_batches(cut, n), make_batches(0, cut)
    ce = nn.CrossEntropyLoss()

    def single_weight(forward, opt_params):
        def total(batches):
            with torch.no_grad():
                return sum(float(ce(*forward(b))) for b in batches())

        opt = torch.optim.Adam(opt_params, lr=lr)
        l_n_train, l_n_val = total(train_b), total(val_b)
        for _ in range(epochs):
            for b in train_b():
                opt.zero_grad()
                loss = ce(*forward(b))
                loss.backward()
                opt.step()
        l_nn_train, l_nn_val = total(train_b), total(val_b)
        o = (l_nn_val - l_nn_train) - (l_n_val - l_n_train)
        g = l_nn_val - l_n_val
        # native adds 1e-12 to G^2 (`modules/gradblend.py:103`); match it
        return abs(o / (g * g + 1e-12))

    def to_t(b, key):
        return (torch.tensor(np.asarray(b[key])),
                torch.tensor(np.asarray(b["label"]), dtype=torch.long))

    weights = []
    for key, enc_name, head_name in (
            ("static", "static_extractor", "classifier_static"),
            ("time", "time_encoder", "classifier_time")):
        enc = _copy.deepcopy(getattr(model, enc_name))
        head = _copy.deepcopy(getattr(model, head_name))

        def fwd(b, key=key, enc=enc, head=head):
            x, y = to_t(b, key)
            return head(enc(x)), y  # both encoders emit 2-D features

        weights.append(single_weight(
            fwd, list(enc.parameters()) + list(head.parameters())))

    uenc = {k: _copy.deepcopy(getattr(model, n_))
            for k, n_ in (("static", "static_extractor"),
                          ("time", "time_encoder"))}
    for e in uenc.values():
        for p in e.parameters():
            p.requires_grad = False
    fm = _copy.deepcopy(model.fusion_encoder)
    fhead = _copy.deepcopy(model.classifier_fusion)

    def fused_fwd(b):
        encs = [uenc["static"](torch.tensor(np.asarray(b["static"]))),
                uenc["time"](torch.tensor(np.asarray(b["time"])))]
        fused = torch.cat(encs, dim=1)  # (B, static_out + seq*hidden)
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
        return fhead(fm(fused)), y

    weights.append(single_weight(
        fused_fwd, list(fm.parameters()) + list(fhead.parameters())))
    w = np.asarray(weights, np.float64)
    return (w / w.sum()).astype(np.float32)


def lockstep_experiment_mimic_gru_gradblend(data_dir: str, work_dir: str,
                                            cfg, epochs: int = 3,
                                            gb_epochs: int = 2) -> Dict:
    """GradBlend ACTIVE in both frameworks on MimicRecurrent — the
    reference's ONLY shipped config that trains with GradBlend on
    (`/root/reference/cfg/mimic/mimic_gru.yml:26`). ``gb_update_freq=1``:
    both sides re-estimate O/G^2 from their CURRENT weights at every
    train-epoch start (`/root/reference/models/mimic.py:305-320`) and apply
    ``gb[0]*static + gb[1]*time + gb[2]*fusion`` (`mimic.py:283-285`).
    Exercises the estimator branches the flagship loop cannot: an MLP
    encoder, a scan-GRU encoder (double-bias ``TorchGRUCell`` Adam
    dynamics inside the sub-training), and a 1-D-concat MLP fused branch.
    Returns per-epoch applied weight vectors of both sides + the curves."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .training import metrics as tm
    from .utils.torch_import import export_mimic_gru_state_dict

    cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
    if float(cfg.model.get("dropout", 0.0)) != 0.0:
        raise ValueError("lockstep mimic_gru_gradblend requires dropout=0 "
                         "(frameworks draw dropout masks differently)")
    cfg.model.gradblend = True
    cfg.model.gb_update_freq = 1
    cfg.model.gb_epochs = int(gb_epochs)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.shuffle_train = False
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    sd = export_mimic_gru_state_dict(params)
    native_weights: list = []
    native = _native_family_protocol(
        cfg, "parity_mimic_gru_gb", init_params=params, dm=dm,
        task_hook=_capture_applied_weights(native_weights))

    model = RefMimicRecurrent(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    ce = nn.CrossEntropyLoss()
    state = {"weights": None}
    torch_weights: list = []

    def epoch_start_hook(model, epoch):
        # every epoch with gb_update_freq=1 (`mimic.py:306`)
        state["weights"] = torch_gradblend_weights_mimic_gru(
            model, dm, epochs=int(gb_epochs)).astype(np.float64)
        torch_weights.append([float(x) for x in state["weights"]])

    def loss_fn(model, b):
        ls_, lt_, lf_ = model(torch.tensor(np.asarray(b["static"])),
                              torch.tensor(np.asarray(b["time"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
        w = state["weights"]
        return w[0] * ce(ls_, y) + w[1] * ce(lt_, y) + w[2] * ce(lf_, y)

    n_cls = int(cfg.model.modalities.classification.num_classes)

    def test_fn(model, dm):
        f1 = tm.F1Score(task="multiclass", num_classes=n_cls, average="micro")
        acc = tm.Accuracy(task="multiclass", num_classes=n_cls)
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            _, _, lf_ = model(torch.tensor(np.asarray(b["static"])),
                              torch.tensor(np.asarray(b["time"])))
            preds = lf_.argmax(dim=1).numpy()
            f1.update(preds, np.asarray(b["label"]))
            acc.update(preds, np.asarray(b["label"]))
        return {"test_loss": float(np.mean(tl)),
                "test_f1_micro": float(f1.compute()),
                "test_acc": float(acc.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs,
                                 epoch_start_hook=epoch_start_hook)
    return {"mode": "lockstep_mimic_gru_gradblend", "native": native,
            "torch": ref, "native_weights": native_weights,
            "torch_weights": torch_weights}


def lockstep_experiment_mmimdb_softadapt(data_dir: str, work_dir: str, cfg,
                                         epochs: int = 6,
                                         update_every: int = 2) -> Dict:
    """SoftAdapt ACTIVE in both frameworks on MM-IMDB — a LIVE softadapt
    application the flagship loop does not cover: the weighted sum replaces
    the plain 3-way sum (`/root/reference/models/mmimdb.py:119-123`,
    initial weights 1/3 each, `:61`) and the refit histories are per-epoch
    val means of multilabel ``BCEWithLogitsLoss(pos_weight)`` branch losses
    (`:156-177`) rather than the flagship's CE. (Of the reference's six
    softadapt wirings, avmnist/mmimdb/multioff/memotion apply the weights;
    MIMIC's and MMHS150K's are dead code — histories initialized at
    `mimic.py:62-64` / weights refit at `mmhs150.py:158-168` but the loss
    combine never reads them.) Returns per-epoch applied weight vectors of
    both sides alongside the curves."""
    import jax

    from .datasets import get_data_module
    from .models import get_model
    from .modules.softadapt import LossWeightedSoftAdapt
    from .training import metrics as tm
    from .utils.torch_import import export_reference_state_dict

    cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
    if float(cfg.model.get("dropout", 0.0)) != 0.0:
        raise ValueError("lockstep mmimdb_softadapt requires dropout=0 "
                         "(frameworks draw dropout masks differently)")
    cfg.model.use_softadapt = True
    cfg.model.update_loss_weights_per_epoch = int(update_every)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.shuffle_train = False
    dm.setup("fit")
    sample = next(iter(dm.train_batches()))
    params = task.init_params(jax.random.PRNGKey(int(cfg.train.seed)), sample)
    m = cfg.model.modalities
    shapes = {name: (int(m[name].in_channels), int(m[name].patch_size),
                     int(m[name].patch_size)) for name in ("image", "text")}
    sd = export_reference_state_dict(params, ("image", "text"), shapes)
    native_weights: list = []
    native = _native_family_protocol(
        cfg, "parity_mmimdb_sa", init_params=params, dm=dm,
        task_hook=_capture_applied_weights(native_weights))

    model = RefMMIMDBMixer(cfg.model)
    model.load_state_dict({k: torch.tensor(np.asarray(v))
                           for k, v in sd.items()}, strict=True)
    pos_weight = torch.tensor(np.asarray(cfg.model.pos_weight, np.float32))
    bce = nn.BCEWithLogitsLoss(pos_weight=pos_weight)
    softadapt = LossWeightedSoftAdapt(beta=-0.1,
                                      accuracy_order=int(update_every) - 1)
    state = {"w": np.full((3,), 1.0 / 3.0, np.float64),
             "hist": [[], [], []]}
    torch_weights: list = []

    def branch_losses(model, b):
        li, lt, lf = model(torch.tensor(np.asarray(b["image"])),
                           torch.tensor(np.asarray(b["text"])))
        y = torch.tensor(np.asarray(b["label"]), dtype=torch.float32)
        return bce(li, y), bce(lt, y), bce(lf, y), lf

    def loss_fn(model, b):
        l_i, l_t, l_f, _ = branch_losses(model, b)
        w = state["w"]
        # weighted combine replaces the plain sum (`mmimdb.py:119-123`)
        return w[0] * l_i + w[1] * l_t + w[2] * l_f

    def epoch_start_hook(model, epoch):
        torch_weights.append([float(x) for x in state["w"]])

    def epoch_val_hook(model, epoch, dm):
        # validation_epoch_end: append val branch means, refit every
        # update_every epochs (epoch != 0), reset histories
        # (`mmimdb.py:156-177`)
        sums, nb = np.zeros(3), 0
        with torch.no_grad():
            for b in dm.val_batches():
                l_i, l_t, l_f, _ = branch_losses(model, b)
                sums += [float(l_i), float(l_t), float(l_f)]
                nb += 1
        for i in range(3):
            state["hist"][i].append(sums[i] / nb)
        if epoch != 0 and epoch % int(update_every) == 0:
            state["w"] = softadapt.get_component_weights(
                *[np.asarray(h, np.float64) for h in state["hist"]]
            ).astype(np.float64)
            state["hist"] = [[], [], []]

    n_labels = int(cfg.model.modalities.classification.num_classes)

    def test_fn(model, dm):
        f1w = tm.F1Score(task="multilabel", num_labels=n_labels,
                         average="weighted")
        f1m = tm.F1Score(task="multilabel", num_labels=n_labels,
                         average="macro")
        tl = []
        for b in dm.test_batches():
            tl.append(float(loss_fn(model, b)))
            _, _, _, lf = branch_losses(model, b)
            preds = (torch.sigmoid(lf) > 0.5).long().numpy()
            f1w.update(preds, np.asarray(b["label"]))
            f1m.update(preds, np.asarray(b["label"]))
        return {"test_loss": float(np.mean(tl)),
                "test_f1w": float(f1w.compute()),
                "test_f1m": float(f1m.compute())}

    ref = _torch_family_protocol(model, loss_fn, test_fn, dm,
                                 cfg.train.optimizer, epochs,
                                 epoch_start_hook=epoch_start_hook,
                                 epoch_val_hook=epoch_val_hook)
    return {"mode": "lockstep_mmimdb_softadapt", "native": native,
            "torch": ref, "native_weights": native_weights,
            "torch_weights": torch_weights}


def _summarize_protocol_runs(runs: Dict, keys) -> Dict:
    summary = {}
    for side in ("native", "torch"):
        summary[side] = {}
        for key in keys:
            vals = [r[key] for r in runs[side]]
            summary[side][f"{key}_mean"] = float(np.mean(vals))
            summary[side][f"{key}_std"] = float(np.std(vals))
    return summary


def protocol_experiment_mimic(data_dir: str, work_dir: str, epochs: int = 12,
                              seeds=(0, 1, 2, 3, 4, 5)) -> Dict:
    """MIMIC seed-noise protocol (VERDICT r4 #7): the SHIPPED mimic_H
    recipe — dropout ON, plateau LR, shuffled training, independent seeds
    and independent inits per framework — run ``len(seeds)`` times each
    side; final test metrics must agree within seed noise. Mirrors the
    avmnist 6-seed protocol table (BASELINE.md); the lockstep experiment
    proves the math at dropout 0, this proves the shipped stochastic
    recipe."""
    from . import config as cfg_lib
    from .datasets import get_data_module
    from .training import metrics as tm

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = {"native": [], "torch": []}
    for seed in seeds:
        cfg = cfg_lib.load(os.path.join(repo, "cfg", "mimic",
                                        "mimic_m2-mixer_H.yml"))
        cfg.dataset.params.data_dir = data_dir
        cfg.dataset.params.num_workers = 0
        cfg.train.epochs = int(epochs)
        cfg.train.seed = int(seed)
        cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
        cfg.train.mesh_data = 1
        cfg.train.mesh_model = 1

        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        native = _native_family_protocol(cfg, f"proto_mimic_s{seed}", dm=dm,
                                         shuffle_train=True)
        runs["native"].append(native)

        torch.manual_seed(seed)
        model = RefMimicMixer(cfg.model)  # torch's OWN init: seed noise
        ce = nn.CrossEntropyLoss()
        w_f = float(cfg.model.get("fusion_loss_weight", 1.0 / 3.0))
        ow = (1.0 - w_f) / 2.0

        def loss_fn(model, b):
            ls_, lt_, lf_ = model(torch.tensor(np.asarray(b["static"])),
                                  torch.tensor(np.asarray(b["time"])))
            y = torch.tensor(np.asarray(b["label"]), dtype=torch.long)
            return w_f * ce(lf_, y) + ow * ce(ls_, y) + ow * ce(lt_, y)

        n_cls = int(cfg.model.modalities.classification.num_classes)

        def test_fn(model, dm):
            f1 = tm.F1Score(task="multiclass", num_classes=n_cls, average="micro")
            acc = tm.Accuracy(task="multiclass", num_classes=n_cls)
            tl = []
            for b in dm.test_batches():
                tl.append(float(loss_fn(model, b)))
                _, _, lf_ = model(torch.tensor(np.asarray(b["static"])),
                                  torch.tensor(np.asarray(b["time"])))
                preds = lf_.argmax(dim=1).numpy()
                f1.update(preds, np.asarray(b["label"]))
                acc.update(preds, np.asarray(b["label"]))
            return {"test_loss": float(np.mean(tl)),
                    "test_f1_micro": float(f1.compute()),
                    "test_acc": float(acc.compute())}

        dm2 = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        dm2.shuffle_train = True  # the shipped shuffled recipe
        runs["torch"].append(_torch_family_protocol(
            model, loss_fn, test_fn, dm2, cfg.train.optimizer, epochs))
    return {"mode": "protocol_mimic", "runs": runs,
            "summary": _summarize_protocol_runs(runs, ("test_acc",
                                                       "test_f1_micro"))}


def protocol_experiment_mmimdb(data_dir: str, work_dir: str, epochs: int = 12,
                               seeds=(0, 1, 2, 3, 4, 5)) -> Dict:
    """MM-IMDB seed-noise protocol (VERDICT r4 #7): the shipped 3-loss
    recipe — dropout 0.5, multilabel BCE pos_weight, plain-sum combine —
    at the lockstep test geometry (dims shrunk for CPU wall-time; every
    stochastic element of the recipe — dropout, shuffling, independent
    inits — stays ON), ``len(seeds)`` independent runs per framework."""
    from . import config as cfg_lib
    from .datasets import get_data_module
    from .training import metrics as tm

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = {"native": [], "torch": []}
    for seed in seeds:
        cfg = cfg_lib.load(os.path.join(repo, "cfg", "mmimdb",
                                        "mmimdb_3loss.yml"))
        cfg.dataset.params.data_dir = data_dir
        cfg.dataset.params.batch_size = 16
        cfg.dataset.params.num_workers = 0
        cfg.train.epochs = int(epochs)
        cfg.train.seed = int(seed)
        cfg.train.tensorboard_path = os.path.join(work_dir, "logs")
        cfg.train.mesh_data = 1
        cfg.train.mesh_model = 1
        for mod in ("image", "text", "multimodal"):
            cfg.model.modalities[mod].hidden_dim = 32
            cfg.model.modalities[mod].channel_dim = 64
            cfg.model.modalities[mod].token_dim = 8
            cfg.model.modalities[mod].num_mixers = 1
        cfg.model.modalities.classification.input_shape = [16, 80, 32]

        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        native = _native_family_protocol(cfg, f"proto_mmimdb_s{seed}", dm=dm,
                                         shuffle_train=True)
        runs["native"].append(native)

        torch.manual_seed(seed)
        model = RefMMIMDBMixer(cfg.model)  # torch's OWN init: seed noise
        pos_weight = torch.tensor(np.asarray(cfg.model.pos_weight, np.float32))
        bce = nn.BCEWithLogitsLoss(pos_weight=pos_weight)

        def loss_fn(model, b):
            li, lt, lf = model(torch.tensor(np.asarray(b["image"])),
                               torch.tensor(np.asarray(b["text"])))
            y = torch.tensor(np.asarray(b["label"]), dtype=torch.float32)
            return bce(li, y) + bce(lt, y) + bce(lf, y)

        n_labels = int(cfg.model.modalities.classification.num_classes)

        def test_fn(model, dm):
            f1w = tm.F1Score(task="multilabel", num_labels=n_labels,
                             average="weighted")
            f1m = tm.F1Score(task="multilabel", num_labels=n_labels,
                             average="macro")
            tl = []
            for b in dm.test_batches():
                tl.append(float(loss_fn(model, b)))
                _, _, lf = model(torch.tensor(np.asarray(b["image"])),
                                 torch.tensor(np.asarray(b["text"])))
                preds = (torch.sigmoid(lf) > 0.5).long().numpy()
                f1w.update(preds, np.asarray(b["label"]))
                f1m.update(preds, np.asarray(b["label"]))
            return {"test_loss": float(np.mean(tl)),
                    "test_f1w": float(f1w.compute()),
                    "test_f1m": float(f1m.compute())}

        dm2 = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        dm2.shuffle_train = True  # the shipped shuffled recipe
        runs["torch"].append(_torch_family_protocol(
            model, loss_fn, test_fn, dm2, cfg.train.optimizer, epochs))
    return {"mode": "protocol_mmimdb", "runs": runs,
            "summary": _summarize_protocol_runs(runs, ("test_f1w", "test_f1m"))}


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
    ap.add_argument("--families", default="avmnist",
                    help="comma list of lockstep families to run: avmnist "
                    "(lockstep+protocol), mimic, mmimdb, mmhs, uq, "
                    "multioff, memotion")
    ap.add_argument("--gradblend", action="store_true",
                    help="also run GradBlend weight-estimation parity "
                    "(native estimator vs the reference O/G^2 math in torch)")
    ap.add_argument("--estimator-loop", action="store_true",
                    help="also run the estimator-IN-THE-LOOP lockstep "
                    "experiments (SoftAdapt + GradBlend active during "
                    "training in both frameworks)")
    ap.add_argument("--protocols", default="",
                    help="comma list of seed-noise protocol experiments "
                    "to run (shipped recipe, dropout on, independent "
                    "seeds): mimic, mmimdb")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from . import config as cfg_lib
    from .datasets.surrogate import generate

    families = [f.strip() for f in args.families.split(",") if f.strip()]
    unknown = set(families) - {"avmnist", "mimic", "mimic_gru", "mmimdb",
                               "mmhs", "uq", "multioff", "memotion"}
    if unknown:
        # a typo must not produce an empty-but-"successful" parity run
        raise SystemExit(f"parity: unknown families {sorted(unknown)}; "
                         "valid: avmnist, mimic, mimic_gru, mmimdb, mmhs, "
                         "uq, multioff, memotion")
    # validate EVERY selector up front — a typo in a later flag must not
    # discard hours of already-computed experiments at json-dump time
    protocols = [p.strip() for p in args.protocols.split(",") if p.strip()]
    unknown_p = set(protocols) - {"mimic", "mmimdb"}
    if unknown_p:
        raise SystemExit(f"parity: unknown protocols {sorted(unknown_p)}; "
                         "valid: mimic, mmimdb")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.work, exist_ok=True)
    out = {}

    def show_curves(tag, lock):
        nv = lock["native"]["history"]["val_loss"]
        tv = lock["torch"]["history"]["val_loss"]
        print(f"[parity] {tag} lockstep val-loss curves:")
        for e, (a, b) in enumerate(zip(nv, tv)):
            print(f"  epoch {e}: native {a:.6f}  torch {b:.6f}  |d| {abs(a-b):.2e}")

    def ensure_avmnist():
        data_dir = os.path.join(args.work, "avmnist")
        if not os.path.exists(os.path.join(data_dir, ".complete")):
            generate("avmnist", data_dir, n=args.n)
            open(os.path.join(data_dir, ".complete"), "w").write("ok\n")
        return data_dir

    if "avmnist" in families:
        data_dir = ensure_avmnist()
        lock = lockstep_experiment(data_dir, os.path.join(args.work, "lockstep"),
                                   epochs=args.lockstep_epochs)
        proto = protocol_experiment(data_dir, os.path.join(args.work, "protocol"),
                                    epochs=args.epochs,
                                    seeds=tuple(range(args.seeds)))
        out.update({"lockstep": lock, "protocol": proto})
        show_curves("avmnist", lock)
        s = proto["summary"]
        print(f"[parity] protocol ({args.seeds} seeds, {args.epochs} epochs): "
              f"native acc {s['native']['test_acc_mean']:.4f}"
              f"±{s['native']['test_acc_std']:.4f} f1m {s['native']['test_f1m_mean']:.4f} | "
              f"torch acc {s['torch']['test_acc_mean']:.4f}"
              f"±{s['torch']['test_acc_std']:.4f} f1m {s['torch']['test_f1m_mean']:.4f}")

    if "mimic" in families:
        data_dir = os.path.join(args.work, "mimic")
        if not os.path.exists(os.path.join(data_dir, "im.pk")):
            generate("mimic", data_dir, n=400)
        cfg = cfg_lib.load(os.path.join(repo, "cfg", "mimic", "mimic_m2-mixer_H.yml"))
        cfg.dataset.params.data_dir = data_dir
        cfg.dataset.params.batch_size = 16
        cfg.dataset.params.num_workers = 0
        cfg.train.epochs = args.lockstep_epochs
        cfg.model.dropout = 0.0
        lock = lockstep_experiment_mimic(data_dir, os.path.join(args.work, "mimic_work"),
                                         cfg, epochs=args.lockstep_epochs)
        out["lockstep_mimic"] = lock
        show_curves("mimic", lock)
        print(f"[parity] mimic test: native f1_micro {lock['native']['test_f1_micro']:.4f} "
              f"| torch {lock['torch']['test_f1_micro']:.4f}")

    if "mimic_gru" in families:
        data_dir = os.path.join(args.work, "mimic")
        if not os.path.exists(os.path.join(data_dir, "im.pk")):
            generate("mimic", data_dir, n=400)
        cfg = cfg_lib.load(os.path.join(repo, "cfg", "mimic", "mimic_gru.yml"))
        cfg.dataset.params.data_dir = data_dir
        cfg.dataset.params.batch_size = 16
        cfg.dataset.params.num_workers = 0
        cfg.train.epochs = args.lockstep_epochs
        cfg.model.dropout = 0.0
        cfg.model.gradblend = False  # lockstep pins the base recipe
        lock = lockstep_experiment_mimic_gru(
            data_dir, os.path.join(args.work, "mimic_gru_work"), cfg,
            epochs=args.lockstep_epochs)
        out["lockstep_mimic_gru"] = lock
        show_curves("mimic_gru", lock)
        print(f"[parity] mimic_gru test: native f1_micro "
              f"{lock['native']['test_f1_micro']:.4f} "
              f"| torch {lock['torch']['test_f1_micro']:.4f}")

    if "mmimdb" in families:
        data_dir = os.path.join(args.work, "mmimdb")
        if not os.path.isdir(os.path.join(data_dir, "train")):
            generate("mmimdb_ext", data_dir, n=320)
        cfg = cfg_lib.load(os.path.join(repo, "cfg", "mmimdb", "mmimdb_3loss.yml"))
        cfg.dataset.params.data_dir = data_dir
        cfg.dataset.params.batch_size = 16
        cfg.dataset.params.num_workers = 0
        cfg.train.epochs = args.lockstep_epochs
        cfg.train.seed = 0
        cfg.model.dropout = 0.0
        lock = lockstep_experiment_mmimdb(data_dir, os.path.join(args.work, "mmimdb_work"),
                                          cfg, epochs=args.lockstep_epochs)
        out["lockstep_mmimdb"] = lock
        show_curves("mmimdb", lock)
        print(f"[parity] mmimdb test: native f1w {lock['native']['test_f1w']:.4f} "
              f"| torch {lock['torch']['test_f1w']:.4f}")

    for fam, cfg_name in (("mmhs", "mmhs150"), ("multioff", "multioff"),
                          ("memotion", "memotion")):
        if fam not in families:
            continue
        work = os.path.join(args.work, f"{fam}_work")
        cfg = small_image_text_cfg(cfg_name, work, epochs=args.lockstep_epochs)
        fn = {"mmhs": lockstep_experiment_mmhs,
              "multioff": lockstep_experiment_multioff,
              "memotion": lockstep_experiment_memotion}[fam]
        lock = fn(work, cfg, epochs=args.lockstep_epochs)
        out[f"lockstep_{fam}"] = lock
        show_curves(fam, lock)
        key = "test_f1" if fam != "memotion" else "test_f1m"
        print(f"[parity] {fam} test: native {key} {lock['native'][key]:.4f} "
              f"| torch {lock['torch'][key]:.4f}")

    if "uq" in families:
        data_dir = ensure_avmnist()
        lock = lockstep_experiment_uq(data_dir, os.path.join(args.work, "uq_work"),
                                      epochs=args.lockstep_epochs)
        out["lockstep_uq"] = lock
        show_curves("uq", lock)
        print(f"[parity] uq test: native acc {lock['native']['test_acc']:.4f} "
              f"| torch {lock['torch']['test_acc']:.4f}")

    if args.estimator_loop:
        data_dir = ensure_avmnist()
        sa = lockstep_experiment_softadapt(
            data_dir, os.path.join(args.work, "sa_loop"), epochs=6)
        gbl = lockstep_experiment_gradblend_loop(
            data_dir, os.path.join(args.work, "gb_loop"), epochs=3)
        mimic_dir = os.path.join(args.work, "mimic")
        if not os.path.exists(os.path.join(mimic_dir, "im.pk")):
            generate("mimic", mimic_dir, n=400)
        gru_cfg = cfg_lib.load(os.path.join(repo, "cfg", "mimic",
                                            "mimic_gru.yml"))
        gru_cfg.dataset.params.data_dir = mimic_dir
        gru_cfg.dataset.params.batch_size = 16
        gru_cfg.dataset.params.num_workers = 0
        gru_cfg.train.epochs = 3
        gru_cfg.model.dropout = 0.0
        gru_gbl = lockstep_experiment_mimic_gru_gradblend(
            mimic_dir, os.path.join(args.work, "gru_gb_loop"), gru_cfg,
            epochs=3)
        imdb_dir = os.path.join(args.work, "mmimdb")
        if not os.path.isdir(os.path.join(imdb_dir, "train")):
            generate("mmimdb_ext", imdb_dir, n=320)
        sa_cfg = cfg_lib.load(os.path.join(repo, "cfg", "mmimdb",
                                           "mmimdb_3loss.yml"))
        sa_cfg.dataset.params.data_dir = imdb_dir
        sa_cfg.dataset.params.batch_size = 16
        sa_cfg.dataset.params.num_workers = 0
        sa_cfg.train.epochs = 6
        sa_cfg.train.seed = 0
        sa_cfg.model.dropout = 0.0
        # CPU wall-time: shrink dims like the lockstep test; the BCE loss
        # math and softadapt plumbing stay the shipped ones
        for mod in ("image", "text", "multimodal"):
            sa_cfg.model.modalities[mod].hidden_dim = 32
            sa_cfg.model.modalities[mod].channel_dim = 64
            sa_cfg.model.modalities[mod].token_dim = 8
            sa_cfg.model.modalities[mod].num_mixers = 1
        sa_cfg.model.modalities.classification.input_shape = [16, 80, 32]
        imdb_sa = lockstep_experiment_mmimdb_softadapt(
            imdb_dir, os.path.join(args.work, "imdb_sa_loop"), sa_cfg,
            epochs=6, update_every=2)
        out["softadapt_loop"] = sa
        out["gradblend_loop"] = gbl
        out["mimic_gru_gradblend_loop"] = gru_gbl
        out["mmimdb_softadapt_loop"] = imdb_sa
        show_curves("softadapt-loop", sa)
        show_curves("gradblend-loop", gbl)
        show_curves("mimic-gru-gradblend-loop", gru_gbl)
        show_curves("mmimdb-softadapt-loop", imdb_sa)
        for tag, res in (("softadapt", sa), ("gradblend", gbl),
                         ("mimic-gru-gradblend", gru_gbl),
                         ("mmimdb-softadapt", imdb_sa)):
            nw = np.asarray(res["native_weights"], np.float64)
            tw = np.asarray(res["torch_weights"], np.float64)
            print(f"[parity] {tag}-loop per-epoch weights max |d|: "
                  f"{np.abs(nw - tw).max():.2e}")

    if "mimic" in protocols:
        data_dir = os.path.join(args.work, "mimic_proto")
        if not os.path.exists(os.path.join(data_dir, "im.pk")):
            generate("mimic", data_dir, n=1600)
        res = protocol_experiment_mimic(data_dir,
                                        os.path.join(args.work, "mimic_proto_work"),
                                        epochs=args.epochs,
                                        seeds=tuple(range(args.seeds)))
        out["protocol_mimic"] = res
        s = res["summary"]
        print(f"[parity] mimic protocol ({args.seeds} seeds, {args.epochs} "
              f"epochs): native f1_micro {s['native']['test_f1_micro_mean']:.4f}"
              f"±{s['native']['test_f1_micro_std']:.4f} | torch "
              f"{s['torch']['test_f1_micro_mean']:.4f}"
              f"±{s['torch']['test_f1_micro_std']:.4f}")
    if "mmimdb" in protocols:
        data_dir = os.path.join(args.work, "mmimdb")
        if not os.path.isdir(os.path.join(data_dir, "train")):
            generate("mmimdb_ext", data_dir, n=320)
        res = protocol_experiment_mmimdb(data_dir,
                                         os.path.join(args.work, "mmimdb_proto_work"),
                                         epochs=args.epochs,
                                         seeds=tuple(range(args.seeds)))
        out["protocol_mmimdb"] = res
        s = res["summary"]
        print(f"[parity] mmimdb protocol ({args.seeds} seeds, {args.epochs} "
              f"epochs): native f1w {s['native']['test_f1w_mean']:.4f}"
              f"±{s['native']['test_f1w_std']:.4f} | torch "
              f"{s['torch']['test_f1w_mean']:.4f}"
              f"±{s['torch']['test_f1w_std']:.4f}")

    if args.gradblend:
        data_dir = ensure_avmnist()
        cfg = _load_s_cfg(data_dir, args.work, 1, 0, dropout=0.0)
        gb = gradblend_parity(cfg, gb_epochs=2)
        out["gradblend"] = gb
        print(f"[parity] gradblend weights native {gb['native']} | torch "
              f"{gb['torch']} (max |d| {gb['max_abs_diff']:.2e})")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[parity] wrote {args.out}")


if __name__ == "__main__":
    main()
