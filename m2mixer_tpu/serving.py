"""Model export + serving: AOT artifacts for production inference.

The reference has no deployment story beyond Lightning checkpoints
(`/root/reference/README.md:105-115` links raw .ckpt files); this module is
the TPU-native serving path:

- ``export_serving``: package a trained task into a self-contained artifact
  directory — the forward function serialized ahead of time plus the
  parameters — loadable WITHOUT any model code.
- ``load_serving`` -> ``ServedModel``: batch-bucketed, zero-padded inference
  with static shapes (every bucket compiles once; odd request sizes pad to
  the next bucket and outputs are sliced back).

Two artifact formats:

- ``stablehlo`` (default, portable): ``jax.export`` with a symbolic batch
  dimension — one artifact serves every batch size on any backend/topology;
  XLA compiles per bucket at load/first-use (the persistent compile cache
  applies).
- ``executable`` (same-topology fast start): fully compiled XLA executables
  serialized per bucket — reload skips compilation entirely. Not portable
  across device kinds or topologies.

Either format can additionally carry weight-only quantized parameters
(``quantize='int8'`` / ``'int4'``, ``--quantize``): ~4x / ~7x smaller
payload, with the per-channel (int8) or group-wise packed-nibble (int4)
dequantization traced into the artifact itself.

The exported function is the task network's eval-mode forward (logits +
branch logits), i.e. exactly what ``Trainer.test`` evaluates, minus losses.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_serving", "export_ensemble_serving", "load_serving",
           "ServedModel", "evaluate_serving", "pick_bucket", "quantize_weights",
           "dequantize_weights", "average_checkpoints", "to_pallas_serving",
           "validate_features"]

_META = "serving.json"
_PARAMS = "params.pkl"
_HLO = "model.stablehlo"
_EXEC = "model.exec.b{bucket}"
_DEFAULT_BUCKETS = (1, 8, 32, 128, 512)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (requests larger than the top bucket are split
    by the caller)."""
    for b in sorted(buckets):
        if b >= n:
            return b
    return max(buckets)


def validate_features(features: Dict[str, np.ndarray], meta: dict) -> None:
    """Request-shape contract shared by the HTTP endpoint and the predict
    CLI: every artifact feature present (and nothing extra), per-sample
    shapes matching the export spec, one consistent non-zero batch size.
    Raises ValueError with the mismatch spelled out."""
    want = meta["features"]
    missing = sorted(set(want) - set(features))
    extra = sorted(set(features) - set(want))
    if missing or extra:
        raise ValueError(f"feature mismatch: missing={missing} extra={extra} "
                         f"(artifact expects {sorted(want)})")
    sizes = set()
    for k, shp in want.items():
        a = features[k]
        if tuple(a.shape[1:]) != tuple(shp):
            raise ValueError(f"feature {k!r}: trailing shape {a.shape[1:]} "
                             f"!= artifact spec {tuple(shp)}")
        sizes.add(int(a.shape[0]))
    if len(sizes) != 1:
        raise ValueError(f"inconsistent batch sizes across features: {sizes}")
    if 0 in sizes:
        raise ValueError("empty batch")


def _serve_fn(task):
    """Eval-mode forward: features dict -> {'logits', 'branch_logits'}."""

    def fn(params, features):
        if hasattr(task, "bind_trace_flavors"):
            task.bind_trace_flavors()  # export traces with the task's flavors
        # model.prune: serve the final-sparsity mask, applied BEFORE qat
        # fake-quant — the prune-then-quantize order of the training trace
        # (read lazily; export_serving suppresses this after baking the
        # mask into the stored weights)
        prune_final = getattr(task, "prune_final", 0.0)
        if prune_final:
            from .modules.prune import fake_prune

            params = fake_prune(params, prune_final,
                                task.prune_min_size, task.prune_targets)
        # model.qat: serve the same fake-quantized weights training computed
        # with (read lazily, at trace time — export_serving suppresses this
        # when the matching PTQ mode already carries the quantized values)
        qat_mode = getattr(task, "qat_mode", None)
        if qat_mode:
            from .modules.qat import fake_quantize

            params = fake_quantize(params, qat_mode, task.qat_min_size,
                                   task.qat_group_size)
        outputs = task.network.apply(
            params, **task.network_inputs(features), deterministic=True
        )
        if isinstance(outputs, dict):
            return {"logits": outputs["logits"],
                    "branch_logits": tuple(outputs.get("branch_logits", ()))}
        return {"logits": outputs, "branch_logits": ()}

    return fn


# ------------------------------------------------- temperature calibration
def fit_temperature(logits, labels) -> float:
    """Post-hoc temperature scaling (Guo et al. 2017): the scalar T > 0
    minimizing the NLL of ``softmax(logits / T)`` against integer labels.
    The NLL is smooth and unimodal in log T — golden-section search over
    log T in [ln 0.05, ln 20] converges to ~1e-4 without a grad library.
    """
    logits = np.asarray(logits, np.float64)
    labels = np.asarray(labels).reshape(-1).astype(np.int64)
    if logits.ndim != 2 or logits.shape[0] != labels.shape[0]:
        raise ValueError(f"fit_temperature: logits {logits.shape} vs labels "
                         f"{labels.shape} — expected (N, C) and (N,)")

    def nll(log_t):
        z = logits / np.exp(log_t)
        z = z - z.max(axis=1, keepdims=True)
        return float(np.mean(np.log(np.exp(z).sum(axis=1))
                             - z[np.arange(len(labels)), labels]))

    lo, hi = np.log(0.05), np.log(20.0)
    invphi = (np.sqrt(5.0) - 1) / 2
    a, b = lo, hi
    c, d = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = nll(c), nll(d)
    for _ in range(80):
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = nll(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = nll(d)
    t = float(np.exp((a + b) / 2))
    if t > 19.0 or t < 0.06:
        print(f"[serving] WARNING: fitted temperature T={t:.2f} sits at the "
              "search boundary — the model is near-uniform (or degenerate) "
              "on the fitting set; calibration is unlikely to be meaningful")
    return t


def collect_val_logits(task, params, datamodule, max_batches: int = 0):
    """Eval-mode fusion-head logits + labels over the val split (host
    numpy) — the fitting set for ``fit_temperature``."""
    fn = jax.jit(lambda p, feats: _serve_fn(task)(p, feats)["logits"])
    logits, labels = [], []
    for i, batch in enumerate(datamodule.val_batches()):
        if max_batches and i >= max_batches:
            break
        feats = {k: v for k, v in batch.items() if k != "label"}
        logits.append(np.asarray(fn(params, feats)))
        labels.append(np.asarray(batch["label"]))
    if not logits:
        raise ValueError("temperature fitting: the val split is empty")
    return np.concatenate(logits), np.concatenate(labels)


# ------------------------------------------------------ int8/int4 weights
# eligibility + group-size selection shared with training-time QAT
# (modules/qat.py) so `model.qat` fake-quant and this PTQ cannot drift:
# exporting a QAT checkpoint with the matching --quantize mode reproduces
# the trained eval forward exactly
from .modules.qat import (Q4_GROUP as _Q4_GROUP,  # noqa: E402
                          Q_MIN_SIZE as _Q_MIN_SIZE, int4_group_size,
                          leaf_eligible)

_QK = "__q8__"  # marker key of a quantized leaf {"__q8__": int8, "scale": f32}
_Q4K = "__q4__"  # group-wise int4 leaf: two nibbles packed per uint8 byte


def quantize_weights(params, min_size: int = _Q_MIN_SIZE, mode: str = "int8",
                     group_size: int = _Q4_GROUP):
    """Weight-only post-training quantization of every float leaf with
    >= ``min_size`` elements (biases/LN stay float). Dequantization happens
    inside the exported forward, so XLA fuses it into the consuming GEMMs.

    ``mode='int8'``: symmetric per-output-channel int8 (scale reduced over
    the input axis) — ~4x smaller artifacts, sub-percent logit error.

    ``mode='int4'``: symmetric GROUP-WISE int4 — the input axis is cut into
    groups of ``group_size`` rows, each with its own per-output-channel
    scale, and quantized values pack two-per-byte (``{"__q4__", "scale"}``)
    — ~7x smaller artifacts. The finer scale granularity is what keeps
    4-bit error usable; leaves whose input axis can't pack nibble pairs
    (odd length) fall back to int8."""
    if mode not in ("int8", "int4"):
        raise ValueError(f"Unknown quantize mode: {mode!r} "
                         "(expected 'int8' or 'int4')")

    def q8(a):
        # reduce over the INPUT axis (-2): per-output-channel scales, kept
        # per leading stack dim for the (L, 2, in, out) layer-stacked leaves
        amax = np.abs(a).max(axis=-2, keepdims=True)
        scale = (amax / 127.0 + 1e-12).astype(np.float32)
        return {_QK: np.clip(np.rint(a / scale), -127, 127).astype(np.int8),
                "scale": scale}

    def q4(a):
        in_dim = a.shape[-2]
        # int4_group_size (shared with QAT): largest even divisor of the
        # input axis <= group_size; None when nibble pairs can't pack (odd
        # input axis) or the per-group f32 scales would erase the packing
        # win (gs <= 8; gs=2 is 2.4x BIGGER than int8)
        gs = int4_group_size(in_dim, group_size)
        if gs is None:
            return q8(a)
        g = a.reshape(*a.shape[:-2], in_dim // gs, gs, a.shape[-1])
        amax = np.abs(g).max(axis=-2, keepdims=True)
        scale = (amax / 7.0 + 1e-12).astype(np.float32)
        q = np.clip(np.rint(g / scale), -7, 7).astype(np.int8)
        pairs = q.reshape(*q.shape[:-2], gs // 2, 2, q.shape[-1])
        lo = pairs[..., 0, :].astype(np.uint8) & 0xF
        hi = pairs[..., 1, :].astype(np.uint8) & 0xF
        return {_Q4K: lo | (hi << 4), "scale": scale}

    def q(leaf):
        a = np.asarray(leaf)
        if not leaf_eligible(a, min_size):
            return a
        a = np.asarray(a, np.float32)  # bf16 -> f32 for the scale math
        return q4(a) if mode == "int4" else q8(a)

    return jax.tree.map(q, params)


def _is_q(x) -> bool:
    return isinstance(x, dict) and (_QK in x or _Q4K in x)


def _dq4(x):
    """Unpack + dequantize one int4 leaf inside the traced forward."""
    packed, scale = x[_Q4K], x["scale"]  # (..., G, gs/2, out), (..., G, 1, out)
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)  # sign-extend the nibbles
    hi = jnp.where(hi > 7, hi - 16, hi)
    q = jnp.stack([lo, hi], axis=-2)  # (..., G, gs/2, 2, out): original order
    q = q.reshape(*packed.shape[:-2], packed.shape[-2] * 2, packed.shape[-1])
    deq = q.astype(jnp.float32) * scale
    in_dim = packed.shape[-3] * packed.shape[-2] * 2
    return deq.reshape(*packed.shape[:-3], in_dim, packed.shape[-1])


def dequantize_weights(params):
    """int8/int4 leaves -> float (element of the traced forward)."""

    def dq(x):
        if not _is_q(x):
            return x
        if _QK in x:
            return x[_QK].astype(jnp.float32) * x["scale"]
        return _dq4(x)

    return jax.tree.map(dq, params, is_leaf=_is_q)


def average_checkpoints(ckpt_dir: str, k: Optional[int] = None):
    """Model-soup / SWA-style parameter averaging: uniform mean of the
    ``params`` trees of the top-``k`` ranked checkpoints in an
    ``index.json``-managed directory (the trainer's ``checkpoints/``).
    Averaged mixer weights are a cheap ensemble stand-in — one forward's
    cost, often better test metrics than any single checkpoint.

    ``k=None`` averages every rankable entry. Float leaves are averaged;
    non-float leaves (step counters) are taken from the best checkpoint.
    """
    import math

    import orbax.checkpoint as ocp

    with open(os.path.join(ckpt_dir, "index.json")) as f:
        index = json.load(f)
    entries = [e for e in index["entries"]
               if e["monitor"] is not None
               and not (isinstance(e["monitor"], float) and math.isnan(e["monitor"]))]
    if not entries:
        raise ValueError(f"no rankable checkpoints in {ckpt_dir} "
                         "(index.json has no monitor values)")
    entries.sort(key=lambda e: e["monitor"], reverse=index.get("mode", "min") == "max")
    if k is not None:
        entries = entries[:k]
    ckptr = ocp.PyTreeCheckpointer()
    trees = []
    for e in entries:
        restored = ckptr.restore(os.path.abspath(e["path"]))
        tree = restored["params"] if "params" in restored else restored
        # LoRA checkpoints: merge adapters into effective weights BEFORE
        # averaging — the low-rank delta is bilinear in (A, B), so averaging
        # factors is NOT the soup of the adapted models; merged trees are
        from .modules.lora import resolve_lora

        trees.append(resolve_lora(tree))

    def avg(*leaves):
        a = np.asarray(leaves[0])
        if not jnp.issubdtype(a.dtype, jnp.floating):
            return a  # counters etc.: best checkpoint's value
        return np.mean([np.asarray(l, np.float32) for l in leaves],
                       axis=0).astype(a.dtype)

    print(f"[serving] averaging {len(entries)} checkpoints "
          f"({index.get('monitor', '?')} {index.get('mode', 'min')}: "
          f"{[round(float(e['monitor']), 5) for e in entries]})")
    return jax.tree.map(avg, *trees)


def _stack_from_blocks(src: dict) -> dict:
    """Modular ``MLPMixer``/``FusionMixer`` param subtree (``block_i`` +
    ``norm_out``) -> the flat ``stack`` dict of ``PallasStackedMLPMixer`` /
    ``PallasStackedFusionMixer`` (same math, fused-kernel layout)."""
    out, i = {}, 0
    while f"block_{i}" in src:
        b = src[f"block_{i}"]
        out[f"b{i}_ln1_scale"] = b["norm_token"]["LayerNorm_0"]["scale"]
        out[f"b{i}_ln1_bias"] = b["norm_token"]["LayerNorm_0"]["bias"]
        out[f"b{i}_w1"] = b["token_mix"]["fc1"]["linear"]["kernel"]
        out[f"b{i}_b1"] = b["token_mix"]["fc1"]["linear"]["bias"]
        out[f"b{i}_w2"] = b["token_mix"]["fc2"]["linear"]["kernel"]
        out[f"b{i}_b2"] = b["token_mix"]["fc2"]["linear"]["bias"]
        out[f"b{i}_ln2_scale"] = b["norm_channel"]["LayerNorm_0"]["scale"]
        out[f"b{i}_ln2_bias"] = b["norm_channel"]["LayerNorm_0"]["bias"]
        out[f"b{i}_w3"] = b["channel_mix"]["fc1"]["linear"]["kernel"]
        out[f"b{i}_b3"] = b["channel_mix"]["fc1"]["linear"]["bias"]
        out[f"b{i}_w4"] = b["channel_mix"]["fc2"]["linear"]["kernel"]
        out[f"b{i}_b4"] = b["channel_mix"]["fc2"]["linear"]["bias"]
        i += 1
    out["ln_out_scale"] = src["norm_out"]["LayerNorm_0"]["scale"]
    out["ln_out_bias"] = src["norm_out"]["LayerNorm_0"]["bias"]
    return out


def _gmlp_block_flat(b: dict) -> dict:
    """One XLA ``GatingMlpBlock`` param subtree -> the flat naming of
    ``PallasGatingMlpBlock`` (same math, fused-kernel layout)."""
    return {
        "ln_scale": b["norm"]["LayerNorm_0"]["scale"],
        "ln_bias": b["norm"]["LayerNorm_0"]["bias"],
        "w_in": b["proj_1"]["kernel"], "b_in": b["proj_1"]["bias"],
        "sgu_ln_scale": b["sgu"]["norm"]["LayerNorm_0"]["scale"],
        "sgu_ln_bias": b["sgu"]["norm"]["LayerNorm_0"]["bias"],
        "sgu_w": b["sgu"]["proj"]["kernel"], "sgu_b": b["sgu"]["proj"]["bias"],
        "w_out": b["proj_2"]["kernel"], "b_out": b["proj_2"]["bias"],
    }


def _stack_from_paired(src: dict, m: int) -> dict:
    """``PairedMLPMixer`` layer-stacked ``(L, 2, ...)`` leaves, modality
    ``m`` -> one modality's ``stack`` dict."""
    out = {}
    L = int(np.shape(np.asarray(src["token_fc1_kernel"]))[0])
    pick = lambda name: np.asarray(src[name])[:, m]
    names = {"ln1": "norm_token", "ln2": "norm_channel",
             "w1": ("token_fc1", "kernel"), "b1": ("token_fc1", "bias"),
             "w2": ("token_fc2", "kernel"), "b2": ("token_fc2", "bias"),
             "w3": ("channel_fc1", "kernel"), "b3": ("channel_fc1", "bias"),
             "w4": ("channel_fc2", "kernel"), "b4": ("channel_fc2", "bias")}
    for i in range(L):
        for ln in ("ln1", "ln2"):
            for part in ("scale", "bias"):
                out[f"b{i}_{ln}_{part}"] = pick(f"{names[ln]}_{part}")[i]
        for w in ("w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4"):
            base, part = names[w]
            out[f"b{i}_{w}"] = pick(f"{base}_{part}")[i]
    out["ln_out_scale"] = np.asarray(src["norm_out_scale"])[m]
    out["ln_out_bias"] = np.asarray(src["norm_out_bias"])[m]
    return out


def to_pallas_serving(cfg, params, sample_batch):
    """Convert a task + trained params to the fused-Pallas-kernel blocks
    for serving (requires the 'executable' artifact format). Latency vs
    the XLA blocks is geometry- and host-dependent — bench your own shape
    (kbench34 measured a small-batch win under a timing protocol kbench39
    later showed unreliable through remote-device tunnels; batch 512
    clearly favors XLA).

    Swaps ``MLPMixer`` -> ``PallasStackedMLPMixer`` and ``FusionMixer`` ->
    ``PallasStackedFusionMixer`` in a COPY of ``cfg`` (other block types —
    gMLP, DynaMixer, GRU, MLPMixerNoPatching — stay on the XLA path),
    turns paired encoders back into per-modality ones, and re-lays the
    trained leaves into the kernels' flat stacked naming. Returns
    ``(pallas_task, pallas_params)``; the converted tree is structure- and
    shape-checked against a fresh init of the Pallas task, so a mismatch
    fails loudly here, not at trace time.
    """
    import copy

    from .models import get_model

    # deepcopy: DictConfig.copy() is shallow and the block_type swaps below
    # must not mutate the caller's config (it may still drive training)
    new_cfg = copy.deepcopy(cfg)
    mc = new_cfg.model.modalities
    swapped = []
    for key in mc:
        if key in ("classification",):
            continue
        bt = mc[key].get("block_type")
        if bt == "MLPMixer":
            mc[key].block_type = "PallasStackedMLPMixer"
            swapped.append(key)
        elif bt == "FusionMixer":
            mc[key].block_type = "PallasStackedFusionMixer"
            swapped.append(key)
        elif bt == "VisiongMLP":
            mc[key].block_type = "PallasVisiongMLP"
            swapped.append(key)
        elif bt == "FusiongMLP":
            mc[key].block_type = "PallasFusiongMLP"
            swapped.append(key)
    if not swapped:
        raise ValueError(
            "no convertible blocks: to_pallas_serving fuses MLPMixer/"
            "FusionMixer/VisiongMLP/FusiongMLP stacks; this config has "
            f"{sorted(set(mc[k].get('block_type') for k in mc if k != 'classification'))}")
    new_cfg.model.paired_encoders = False

    task = get_model(new_cfg.model.type)(new_cfg.model, new_cfg.train.optimizer)
    target = task.init_params(jax.random.PRNGKey(0), sample_batch)
    t_top = target["params"] if "params" in target else target
    src_top = params["params"] if "params" in params else params

    out = {k: v for k, v in src_top.items() if k != "paired_encoder"}
    paired = src_top.get("paired_encoder")
    if paired is not None:
        for m in (0, 1):
            out[f"encoders_{m}"] = {
                "patch_embed": paired[f"patch_embed_{m}"],
                "stack": _stack_from_paired(paired, m),
            }
    # convert exactly the subtrees the Pallas task expects: 'stack' for the
    # fused mixer stacks; flat 'block_i' (with 'ln_scale' leaves) for gMLP
    for k, tsub in t_top.items():
        if not (isinstance(tsub, dict) and k in out):
            continue
        sub = out[k]
        if "stack" in tsub and "block_0" in sub:
            newsub = {kk: vv for kk, vv in sub.items()
                      if not (kk.startswith("block_") or kk == "norm_out")}
            newsub["stack"] = _stack_from_blocks(sub)
            out[k] = newsub
        elif "block_0" in tsub and "ln_scale" in tsub["block_0"] \
                and "gmlp" in sub:
            newsub = {kk: vv for kk, vv in sub.items() if kk != "gmlp"}
            for bk, bv in sub["gmlp"].items():
                if bk.startswith("block_"):
                    newsub[bk] = _gmlp_block_flat(bv)
            out[k] = newsub

    converted = {"params": out} if "params" in target else out
    flat_t = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_c = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    problems = [f"{jax.tree_util.keystr(p)}: want {tuple(v.shape)}, got "
                f"{None if jax.tree_util.keystr(p) not in flat_c else tuple(np.shape(flat_c[jax.tree_util.keystr(p)]))}"
                for p, v in flat_t
                if jax.tree_util.keystr(p) not in flat_c
                or tuple(np.shape(flat_c[jax.tree_util.keystr(p)])) != tuple(v.shape)]
    extra = sorted(set(flat_c) - {jax.tree_util.keystr(p) for p, _ in flat_t})
    if problems or extra:
        raise ValueError("to_pallas_serving produced a tree that doesn't "
                         f"match the Pallas task: missing/mismatched={problems[:5]} "
                         f"extra={extra[:5]}")
    return task, converted


def _feature_spec(sample_batch) -> Dict[str, Tuple[Tuple[int, ...], str]]:
    # shape/dtype only — never np.asarray a leaf (device arrays would pay a
    # device->host transfer just to read metadata)
    def spec(v):
        if hasattr(v, "shape") and hasattr(v, "dtype"):
            return tuple(v.shape[1:]), str(np.dtype(v.dtype))
        v = np.asarray(v)
        return tuple(v.shape[1:]), str(v.dtype)

    return {k: spec(v) for k, v in sample_batch.items() if k != "label"}


def export_serving(task, params, sample_batch, out_dir: str,
                   fmt: str = "stablehlo",
                   buckets: Sequence[int] = _DEFAULT_BUCKETS,
                   quantize: Optional[str] = None,
                   serve_fn=None, extra_meta: Optional[dict] = None,
                   preprocess: Optional[dict] = None,
                   temperature: Optional[float] = None,
                   quantize_min_size: int = _Q_MIN_SIZE,
                   quantize_group_size: int = _Q4_GROUP) -> str:
    """Write a self-contained serving artifact for ``task`` to ``out_dir``.

    ``serve_fn``: override the traced forward (default: the task network's
    eval-mode forward) — used by ``export_ensemble_serving``. Must map
    ``(params, features) -> dict`` with every output batch-leading.
    ``extra_meta``: additional keys merged into serving.json.

    ``sample_batch``: one training/eval batch (the 'label' key is ignored) —
    defines the feature names, per-sample shapes, and dtypes the server
    accepts.

    ``quantize='int8'`` / ``'int4'``: weight-only post-training quantization
    (``quantize_weights``) — ~4x / ~7x smaller parameter payload,
    dequantization baked into the exported forward.

    ``temperature``: post-hoc calibration scalar (Guo et al. 2017) baked
    into the traced forward — the served ``logits`` are divided by T, so any
    consumer's softmax is calibrated with zero runtime cost (``branch_*``
    outputs stay raw: T is fit on the fusion head). Recorded in
    serving.json. Fit it with ``fit_temperature`` / ``--temperature auto``.

    ``preprocess``: raw-input featurization spec (usually the datamodule's
    ``serving_preprocess()``, see ``m2mixer_tpu/preprocess.py``) — written
    into serving.json with its asset files (tokenizer vocab, MinHash cache)
    copied into ``out_dir/assets``, so the loaded model and the HTTP
    endpoint accept raw text strings / encoded images.
    """
    # validate before ANY side effect (no half-written artifact dirs, no
    # pointless device->host parameter pull on the error path)
    if fmt not in ("stablehlo", "executable"):
        raise ValueError(f"Unknown serving format: {fmt!r} "
                         "(expected 'stablehlo' or 'executable')")
    if quantize not in (None, "int8", "int4"):
        raise ValueError(f"Unknown quantize mode: {quantize!r} "
                         "(expected 'int8' or 'int4')")
    if temperature is not None and not float(temperature) > 0:
        raise ValueError(f"temperature={temperature} — expected > 0")
    if preprocess:
        from .preprocess import packaged_spec

        packaged_spec(preprocess, out_dir, copy_assets=False)  # validate only
    os.makedirs(out_dir, exist_ok=True)
    if preprocess:
        preprocess = packaged_spec(preprocess, out_dir)  # copy assets in
    spec = _feature_spec(sample_batch)
    base_fn = serve_fn if serve_fn is not None else _serve_fn(task)
    # LoRA fine-tunes export as plain weights: bake the adapters in so PTQ,
    # Pallas conversion, TP sharding, and the server see one ordinary tree
    from .modules.lora import resolve_lora

    params = resolve_lora(params)
    params = jax.tree.map(np.asarray, params)
    # model.prune (modules/prune.py): bake the final-sparsity mask into the
    # stored weights BEFORE any PTQ — the prune-then-quantize order of the
    # training trace — and suppress the in-trace prune (its mask is now the
    # identity on the baked values). Keeps the qat lossless-export chain
    # intact for pruned models.
    prune_suppressed = None
    if getattr(task, "prune_final", 0.0):
        from .modules.prune import fake_prune, sparsity_report

        params = jax.tree.map(
            np.asarray,
            fake_prune(params, task.prune_final, task.prune_min_size,
                       task.prune_targets))
        zeros, total = sparsity_report(params, task.prune_min_size,
                                       task.prune_targets)
        print(f"[serving] model.prune: baked the final mask — "
              f"{zeros}/{total} pruned weights "
              f"({100.0 * zeros / max(total, 1):.1f}% of eligible)")
        prune_suppressed, task.prune_final = task.prune_final, 0.0
    # model.qat (modules/qat.py): with the MATCHING quantize mode, PTQ of
    # the latent weights carries exactly the values the fake-quantized
    # training forward computed with, so the in-trace fake-quant is
    # suppressed for this export (the artifact dequantizes once, bit-exact
    # to training); any other combination keeps the task's fake-quant in
    # the traced forward (the serve fns read task.qat_mode at trace time).
    qat_suppressed = None
    if quantize and getattr(task, "qat_mode", None) == quantize:
        quantize_min_size = task.qat_min_size
        quantize_group_size = task.qat_group_size
        qat_suppressed, task.qat_mode = quantize, None
    try:
        if quantize:
            params = quantize_weights(params, min_size=quantize_min_size,
                                      mode=quantize,
                                      group_size=quantize_group_size)
            if not any(_is_q(x) for x in jax.tree.leaves(params, is_leaf=_is_q)):
                import warnings

                warnings.warn(f"quantize={quantize!r} quantized ZERO leaves "
                              "(all below the size threshold) — the artifact "
                              "will not shrink")
            fn = lambda p, feats: base_fn(dequantize_weights(p), feats)
        else:
            fn = base_fn
        if temperature is not None and float(temperature) != 1.0:
            t = float(temperature)

            def fn(p, feats, _inner=fn):
                out = dict(_inner(p, feats))
                out["logits"] = out["logits"] / jnp.asarray(t, out["logits"].dtype)
                return out
        leaf_spec = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
        p_spec = jax.tree.map(leaf_spec, params)

        with open(os.path.join(out_dir, _PARAMS), "wb") as f:
            pickle.dump(params, f)

        meta = {"format": fmt, "features": {k: list(v[0]) for k, v in spec.items()},
                "dtypes": {k: v[1] for k, v in spec.items()},
                "buckets": sorted(int(b) for b in buckets),
                "quantize": quantize, **(extra_meta or {})}
        if temperature is not None:
            meta["temperature"] = float(temperature)
        if preprocess:
            meta["preprocess"] = preprocess

        if fmt == "stablehlo":
            from jax import export as jexport

            b = jexport.symbolic_shape("b")[0]
            f_spec = {k: jax.ShapeDtypeStruct((b, *shp), jnp.dtype(dt))
                      for k, (shp, dt) in spec.items()}
            from jax._src.export.shape_poly import InconclusiveDimensionOperation

            try:
                artifact = jexport.export(jax.jit(fn))(p_spec, f_spec)
            except InconclusiveDimensionOperation as e:
                # e.g. Pallas-kernel blocks pick VMEM tiles from the concrete
                # batch size — shape-polymorphic tracing can't answer those
                # comparisons
                raise ValueError(
                    "this model's forward branches on the concrete batch size "
                    "(Pallas-kernel blocks choose tile sizes from it), so the "
                    "shape-polymorphic 'stablehlo' format cannot trace it; "
                    "export with --format executable (per-bucket AOT "
                    "compilation) instead") from e
            with open(os.path.join(out_dir, _HLO), "wb") as f:
                f.write(artifact.serialize())
        elif fmt == "executable":
            from jax.experimental import serialize_executable as se

            # pin to ONE device: the artifact must match the arrays predict()
            # feeds (single-chip serving; use 'stablehlo' + jit-under-a-mesh
            # for sharded serving)
            dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            pin = lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=dev)
            for bucket in meta["buckets"]:
                f_spec = {k: pin(jax.ShapeDtypeStruct((bucket, *shp), jnp.dtype(dt)))
                          for k, (shp, dt) in spec.items()}
                compiled = jax.jit(fn).lower(jax.tree.map(pin, p_spec), f_spec).compile()
                payload, in_tree, out_tree = se.serialize(compiled)
                with open(os.path.join(out_dir, _EXEC.format(bucket=bucket)), "wb") as f:
                    pickle.dump({"payload": payload, "in_tree": in_tree,
                                 "out_tree": out_tree}, f)
            meta["device_kind"] = jax.devices()[0].device_kind
        with open(os.path.join(out_dir, _META), "w") as f:
            json.dump(meta, f, indent=2)
    finally:
        if qat_suppressed is not None:
            task.qat_mode = qat_suppressed
        if prune_suppressed is not None:
            task.prune_final = prune_suppressed
    return out_dir


def export_ensemble_serving(task, stacked_params, sample_batch, out_dir: str,
                            fmt: str = "stablehlo",
                            buckets: Sequence[int] = _DEFAULT_BUCKETS,
                            quantize: Optional[str] = None,
                            preprocess: Optional[dict] = None) -> str:
    """Deploy ALL ensemble members as ONE artifact.

    ``stacked_params``: every leaf carries a leading member axis ``(N, …)``
    — exactly ``EnsembleResult.best_params`` from the vmapped significance
    runner (``run_for_significance.py --vmap``). The exported forward vmaps
    the task network over the member axis and ensembles ON DEVICE; on TPU
    the member axis batches every GEMM, so serving the whole ensemble costs
    roughly one wider forward, not N dispatches.

    Outputs:
      ``logits``        — log of the member-mean softmax (argmax = the
                          ensemble vote; shaped/consumed like any single
                          model's logits)
      ``member_logits`` — ``(B, N, C)`` raw per-member logits (clients with
                          non-softmax tasks — multilabel sigmoid heads —
                          ensemble these their own way)
    """
    base = _serve_fn(task)

    def fn(params, features):
        member = jax.vmap(lambda p: base(p, features)["logits"])(params)
        probs = jax.nn.softmax(member.astype(jnp.float32), axis=-1)
        logits = jnp.log(jnp.clip(probs.mean(axis=0), 1e-20, None))
        # batch axis leading on EVERY output (predict() slices axis 0)
        return {"logits": logits,
                "member_logits": jnp.moveaxis(member, 0, 1),
                "branch_logits": ()}

    n = int(np.shape(jax.tree.leaves(stacked_params)[0])[0])
    return export_serving(task, stacked_params, sample_batch, out_dir,
                          fmt=fmt, buckets=buckets, quantize=quantize,
                          serve_fn=fn, extra_meta={"ensemble_members": n},
                          preprocess=preprocess)


class ServedModel:
    """Loaded serving artifact: batch-bucketed eval-mode inference.

    ``predict(features)`` accepts any request size: inputs are zero-padded
    to the smallest compiled bucket (oversize requests are processed in
    top-bucket chunks) and outputs are sliced back to the true size.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``data`` axis scales inference
    over chips — parameters are replicated, request batches shard over
    ``data`` (stablehlo format only; buckets that don't divide the data
    axis are dropped at load).

    ``shard_params``: with a mesh whose ``model`` axis is > 1, additionally
    apply the trainer's tensor-parallel layout rules to the parameters
    (Megatron-style channel-mix column/row sharding, expert kernels over
    ``model`` — ``parallel/mesh.py::param_shardings``), so models too large
    for one chip's HBM serve sharded; XLA's SPMD partitioner inserts the
    same collectives the training step uses. int8-quantized leaves stay
    replicated (the rules key on float kernel leaf names).
    """

    def __init__(self, out_dir: str, mesh=None, shard_params: bool = False,
                 model_min_dim: int = 256):
        # remembered for hot reload (server POST /reload re-loads from here)
        self.out_dir = out_dir
        self._mesh = mesh
        self._shard_params = shard_params
        self._model_min_dim = model_min_dim
        if shard_params and (mesh is None or mesh.shape.get("model", 1) <= 1):
            # silently loading replicated would OOM exactly the big-model
            # case the flag exists for — fail with the fix spelled out
            raise ValueError(
                "shard_params=True needs a mesh with a model axis > 1 "
                "(e.g. --mesh 4x2); got "
                + ("no mesh" if mesh is None else f"mesh {dict(mesh.shape)}"))
        with open(os.path.join(out_dir, _META)) as f:
            self.meta = json.load(f)
        with open(os.path.join(out_dir, _PARAMS), "rb") as f:
            params = pickle.load(f)
        self.buckets = list(self.meta["buckets"])
        self._calls: Dict[int, callable] = {}

        if mesh is not None and self.meta["format"] != "stablehlo":
            raise ValueError("mesh-sharded serving requires the 'stablehlo' "
                             "format (the 'executable' artifact is pinned to "
                             "its export-time device assignment)")
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n = mesh.shape["data"]
            self.buckets = [b for b in self.buckets if b % n == 0]
            if not self.buckets:
                raise ValueError(
                    f"no export bucket divides the mesh data axis ({n}); "
                    "re-export with divisible buckets")
            if shard_params and mesh.shape.get("model", 1) > 1:
                from .parallel.mesh import param_shardings

                self.params = jax.device_put(
                    params, param_shardings(mesh, params, model_min_dim))
            else:
                rep = NamedSharding(mesh, P())
                self.params = jax.device_put(params, jax.tree.map(lambda _: rep, params))
            self._data_sharding = lambda ndim: NamedSharding(
                mesh, P("data", *([None] * (ndim - 1))))
        else:
            self.params = jax.device_put(params)
            self._data_sharding = None

        if self.meta["format"] == "stablehlo":
            from jax import export as jexport

            with open(os.path.join(out_dir, _HLO), "rb") as f:
                artifact = jexport.deserialize(f.read())
            if mesh is None:
                call = jax.jit(artifact.call)
            else:
                p_shard = jax.tree.map(lambda x: x.sharding, self.params)
                f_shard = {k: self._data_sharding(len(shp) + 1)
                           for k, shp in self.meta["features"].items()}
                call = jax.jit(artifact.call, in_shardings=(p_shard, f_shard))
            for b in self.buckets:
                self._calls[b] = call  # polymorphic: one callable, per-shape jit cache
        else:
            from jax.experimental import serialize_executable as se

            kind = jax.devices()[0].device_kind
            want = self.meta.get("device_kind")
            if want is not None and want != kind:
                raise RuntimeError(
                    f"executable-format artifact was compiled for {want!r} "
                    f"but this host runs {kind!r}; re-export (or use the "
                    "portable 'stablehlo' format)")
            for b in self.buckets:
                with open(os.path.join(out_dir, _EXEC.format(bucket=b)), "rb") as f:
                    blob = pickle.load(f)
                loaded = se.deserialize_and_load(
                    blob["payload"], blob["in_tree"], blob["out_tree"])
                self._calls[b] = loaded

    @property
    def preprocessor(self):
        """Raw-input featurizer built from the artifact's ``preprocess``
        block (None when the artifact carries none). Lazy: tokenizer/hash
        assets load on first raw request."""
        if self.meta.get("preprocess") is None:
            return None
        if getattr(self, "_preprocessor", None) is None:
            from .preprocess import ServingPreprocessor

            self._preprocessor = ServingPreprocessor(
                self.meta["preprocess"], self.out_dir,
                self.meta["features"], self.meta["dtypes"])
        return self._preprocessor

    def preprocess_inputs(self, inputs: Dict[str, object]) -> Dict[str, np.ndarray]:
        """Featurize raw entries (text strings / base64-encoded images)
        against the artifact's preprocess spec; numeric entries pass
        through. Everything comes out cast to the artifact dtypes."""
        from .preprocess import is_raw_value

        pp = self.preprocessor
        if pp is not None:
            inputs = pp(inputs)
        else:
            raw = sorted(k for k, v in inputs.items() if is_raw_value(v))
            if raw:
                raise ValueError(
                    f"raw inputs {raw} but this artifact carries no "
                    "preprocess spec; send numeric feature arrays (or "
                    "re-export from a datamodule with serving_preprocess())")
        return {k: np.asarray(v, dtype=self.meta["dtypes"].get(k))
                for k, v in inputs.items() if k != "label"}

    def predict_raw(self, inputs: Dict[str, object]) -> Dict[str, np.ndarray]:
        """``predict`` over raw inputs: featurize via the artifact's
        preprocess spec, validate the resulting features, infer."""
        features = self.preprocess_inputs(inputs)
        validate_features(features, self.meta)
        return self.predict(features)

    def _run_bucket(self, features: Dict[str, np.ndarray], n: int):
        bucket = pick_bucket(n, self.buckets)
        padded = {
            k: jnp.asarray(np.pad(np.asarray(v),
                                  [(0, bucket - n)] + [(0, 0)] * (np.ndim(v) - 1)))
            for k, v in features.items()
        }
        out = self._calls[bucket](self.params, padded)
        return jax.tree.map(lambda a: np.asarray(a)[:n], out)

    def predict(self, features: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        features = {k: v for k, v in features.items() if k != "label"}
        n = int(np.shape(next(iter(features.values())))[0])
        top = max(self.buckets)
        if n <= top:
            return self._run_bucket(features, n)
        chunks = [
            self._run_bucket({k: np.asarray(v)[i:i + top] for k, v in features.items()},
                             min(top, n - i))
            for i in range(0, n, top)
        ]
        return jax.tree.map(lambda *xs: np.concatenate(xs), *chunks)


def load_serving(out_dir: str, mesh=None, shard_params: bool = False,
                 model_min_dim: int = 256) -> ServedModel:
    return ServedModel(out_dir, mesh=mesh, shard_params=shard_params,
                       model_min_dim=model_min_dim)


def evaluate_serving(model: ServedModel, task, datamodule, split: str = "test",
                     max_batches: int = 0) -> Dict[str, float]:
    """Deployed-accuracy evaluation: run an exported artifact over a
    datamodule split and compute the task's OWN metric set on its outputs.

    This closes the train -> export -> deploy loop the reference leaves
    open (it ships raw ``.ckpt`` files and re-runs `trainer.test` in-process,
    `/root/reference/run.py:81-83`): the numbers here are produced by the
    exact artifact the server loads — quantization (PTQ or QAT), Pallas
    re-lays, temperature scaling, and ensemble averaging all included — so
    "deployed accuracy" is measured, not assumed.

    Predictions go through ``task.predictions`` (the same adapter the
    trainer's eval epoch uses), so per-task semantics (sigmoid multilabel
    thresholds, EDL evidence argmax, probability-fed AUROC/AP/ECE) match
    `trainer.test` exactly. Ensemble artifacts (``ensemble_members`` in
    serving.json) expose no branch logits; their fused ``logits`` are
    log-mean-softmax, which task CE/argmax semantics consume unchanged.

    Returns ``{'<split>_<metric>': value, ..., '<split>_samples': n}``.
    """
    idx = {"train": 0, "val": 1, "test": 2}
    if split not in idx:
        raise ValueError(f"split must be train/val/test (got {split!r})")
    scores = task.setup_scores()[idx[split]]
    batches_fn = {"train": datamodule.train_batches,
                  "val": datamodule.val_batches,
                  "test": datamodule.test_batches}[split]
    is_ensemble = bool(model.meta.get("ensemble_members"))
    preds_l, labels_l, probs_l = [], [], []
    n = 0
    for i, batch in enumerate(batches_fn()):
        if max_batches and i >= max_batches:
            break
        out = model.predict({k: v for k, v in batch.items() if k != "label"})
        outputs = {"logits": jnp.asarray(out["logits"]),
                   "branch_logits": tuple(jnp.asarray(b)
                                          for b in out.get("branch_logits", ()))}
        if is_ensemble:
            # member-averaged artifacts carry no branch heads; the fused
            # logits are log-mean-softmax -> argmax is the ensemble vote
            aux = {"preds": jnp.argmax(outputs["logits"], axis=-1),
                   "labels": jnp.asarray(batch["label"]),
                   "probs": jax.nn.softmax(outputs["logits"], axis=-1)}
        elif hasattr(task, "predictions"):
            aux = task.predictions(
                outputs, {k: jnp.asarray(v) for k, v in batch.items()})
        elif getattr(task, "plain_multiclass", False):
            # tasks that DECLARE plain-multiclass semantics (their step
            # argmaxes softmax logits; e.g. the text-only
            # PnlpMixerSeqClsTask, models/pnlp.py) get the same argmax here
            aux = {"preds": jnp.argmax(outputs["logits"], axis=-1),
                   "labels": jnp.asarray(batch["label"]),
                   "probs": jax.nn.softmax(outputs["logits"], axis=-1)}
        else:
            # fail LOUDLY: a task with non-multiclass semantics (sigmoid
            # thresholds, regression) evaluated via argmax would report
            # plausible-but-wrong metrics. New tasks either implement
            # predictions() or opt in with plain_multiclass = True.
            raise TypeError(
                f"evaluate_serving: {type(task).__name__} has no "
                "predictions() adapter and does not declare "
                "plain_multiclass = True — refusing to guess the "
                "prediction semantics. Implement predictions(), or set "
                "plain_multiclass = True if the task's step argmaxes "
                "softmax logits.")
        preds_l.append(np.asarray(aux["preds"]))
        labels_l.append(np.asarray(aux["labels"]))
        if aux.get("probs") is not None:
            probs_l.append(np.asarray(aux["probs"]))
        n += int(np.shape(aux["labels"])[0])
    if n == 0:
        raise ValueError(f"evaluate_serving: the {split} split is empty")
    preds = np.concatenate(preds_l)
    labels = np.concatenate(labels_l)
    probs = np.concatenate(probs_l) if probs_l else None
    logs: Dict[str, float] = {}
    for mname, metric in (scores or {}).items():
        metric.update(probs if getattr(metric, "wants_scores", False)
                      and probs is not None else preds, labels)
        logs[f"{split}_{mname}"] = float(metric.compute())
        metric.reset()
    logs[f"{split}_samples"] = float(n)
    return logs


def _mesh_from_spec(spec: str):
    """CLI mesh spec ``'DATAxMODEL'`` (``'4x2'``) or ``'DATA'`` (``'4'``)
    -> a ``jax.sharding.Mesh`` over the local devices."""
    try:
        parts = [int(p) for p in str(spec).lower().split("x")]
    except ValueError:
        parts = []
    if not 1 <= len(parts) <= 2 or any(p < 1 for p in parts):
        raise ValueError(f"bad mesh spec {spec!r}: expected 'DATA' or 'DATAxMODEL'")
    from .parallel import MeshConfig, make_mesh

    return make_mesh(MeshConfig(data=parts[0],
                                model=parts[1] if len(parts) > 1 else 1))


def _build_task(cfg):
    from .models import get_model

    return get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)


def main(argv: Optional[Sequence[str]] = None):
    """CLI: export a trained run, or latency-bench an artifact.

    export:  python -m m2mixer_tpu.serving export -c CFG -p CKPT -o DIR
             [--format stablehlo|executable] [--buckets 1,8,32]
    bench:   python -m m2mixer_tpu.serving bench -d DIR [--batch 32] [--iters 200]
    predict: python -m m2mixer_tpu.serving predict -d DIR -i IN.npz -o OUT.npz
             (offline batch inference: npz features in, npz outputs out)
    serve:   python -m m2mixer_tpu.serving serve -d DIR [--host H] [--port P]
             (stdlib HTTP endpoint: /healthz /info /predict — see server.py)
    """
    import argparse

    # persistent compile cache: repeat exports/loads skip XLA compilation
    cache = os.environ.get(
        "M2MIXER_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    ap = argparse.ArgumentParser(description=main.__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("export")
    ex.add_argument("-c", "--cfg", required=True)
    ex.add_argument("-p", "--ckpt",
                    help="checkpoint: a concrete epoch_N dir, or a "
                         "checkpoints//version_* dir (resolves to the run's "
                         "best via index.json); fresh init if omitted")
    ex.add_argument("-o", "--out", required=True)
    ex.add_argument("--format", default="stablehlo",
                    choices=["stablehlo", "executable"])
    ex.add_argument("--buckets", default="1,8,32,128,512")
    ex.add_argument("--quantize", default=None, choices=["int8", "int4"],
                    help="weight-only PTQ: int8 (~4x smaller artifact) or "
                         "group-wise int4 (~7x smaller, slightly higher "
                         "quantization error)")
    ex.add_argument("--average", type=int, default=None, metavar="K",
                    help="model soup: export the uniform average of the "
                         "top-K ranked checkpoints (-p must be the run's "
                         "checkpoints/ directory; 0 = all rankable)")
    ex.add_argument("--temperature", default=None, metavar="T|auto",
                    help="post-hoc temperature calibration: a float bakes "
                         "logits/T into the artifact; 'auto' fits T on the "
                         "config's val split first (Guo et al. 2017)")
    ex.add_argument("--ema", action="store_true",
                    help="export the Polyak-averaged (train.optimizer."
                         "ema_decay) weights carried in the checkpoint's "
                         "optimizer state instead of the raw params")
    ex.add_argument("--no-preprocess", action="store_true",
                    help="don't embed the datamodule's raw-input "
                         "preprocessing (text projection / image pipeline) "
                         "in the artifact")
    ex.add_argument("--pallas", action="store_true",
                    help="re-lay MLPMixer/FusionMixer stacks onto the fused "
                         "Pallas kernels (latency is geometry/host-"
                         "dependent — run 'bench' on your own shape; "
                         "implies --format executable)")
    mesh_help = ("serve over a device mesh, 'DATAxMODEL' (e.g. 4x2): request "
                 "batches shard over the data axis; with --shard-params the "
                 "trainer's tensor-parallel rules shard the weights over the "
                 "model axis (stablehlo format only)")
    pr = sub.add_parser("predict", help="offline batch inference over an "
                                        "npz file of features")
    pr.add_argument("-d", "--dir", required=True, help="artifact directory")
    pr.add_argument("-i", "--input", required=True,
                    help="npz with one array per artifact feature (batch "
                         "leading; a 'label' key is ignored, other unknown "
                         "keys are rejected — same contract as POST "
                         "/predict), or a .json file that may mix numeric "
                         "arrays with RAW inputs (text strings / base64 "
                         "images) when the artifact embeds preprocessing")
    pr.add_argument("-o", "--output", required=True,
                    help="npz to write: logits, branch_logits_<i>, and any "
                         "other artifact outputs")
    pr.add_argument("--mesh", default=None, metavar="DxM", help=mesh_help)
    pr.add_argument("--shard-params", action="store_true")
    pr.add_argument("--model-min-dim", type=int, default=256)
    ev = sub.add_parser("eval", help="deployed-accuracy evaluation: run an "
                                     "artifact over a dataset split and "
                                     "compute the task's own metric set")
    ev.add_argument("-d", "--dir", required=True, help="artifact directory")
    ev.add_argument("-c", "--cfg", required=True,
                    help="experiment YAML: defines the datamodule to "
                         "evaluate on and the task whose metric semantics "
                         "apply")
    ev.add_argument("--split", default="test",
                    choices=["train", "val", "test"])
    ev.add_argument("--max-batches", type=int, default=0,
                    help="cap evaluated batches (0 = whole split)")
    ev.add_argument("-o", "--output", default=None,
                    help="also write the metrics as JSON here")
    ev.add_argument("--mesh", default=None, metavar="DxM", help=mesh_help)
    ev.add_argument("--shard-params", action="store_true")
    ev.add_argument("--model-min-dim", type=int, default=256)
    be = sub.add_parser("bench")
    be.add_argument("-d", "--dir", required=True)
    be.add_argument("--batch", type=int, default=32)
    # enough pipeline depth to amortize the one completion-fetch round trip
    # (~28 ms through a remote-device tunnel, microseconds on a local host)
    be.add_argument("--iters", type=int, default=200)
    be.add_argument("--mesh", default=None, metavar="DxM", help=mesh_help)
    be.add_argument("--shard-params", action="store_true")
    be.add_argument("--model-min-dim", type=int, default=256,
                    help="smallest kernel dim worth sharding tensor-parallel")
    sv = sub.add_parser("serve", help="HTTP inference endpoint (see server.py)")
    sv.add_argument("-d", "--dir", required=True, action="append",
                    help="artifact directory; repeat with name=dir pairs to "
                         "serve several models (routes /predict/<name>)")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--no-coalesce", action="store_true",
                    help="serialize concurrent requests with a lock instead "
                         "of coalescing them into shared device batches")
    sv.add_argument("--warmup", action="store_true",
                    help="pre-compile every bucket before accepting requests "
                         "(first request otherwise pays the compile)")
    sv.add_argument("--request-timeout", type=float, default=None,
                    metavar="SECONDS",
                    help="504 a request that waits longer than this for "
                         "device capacity (default: wait forever)")
    sv.add_argument("--max-queue", type=int, default=65536, metavar="SAMPLES",
                    help="pending-sample cap; beyond it requests get 429 + "
                         "Retry-After instead of growing host memory")
    sv.add_argument("--mesh", default=None, metavar="DxM", help=mesh_help)
    sv.add_argument("--shard-params", action="store_true")
    sv.add_argument("--model-min-dim", type=int, default=256)
    args, unknown = ap.parse_known_args(argv)
    if unknown and args.cmd not in ("export", "eval"):
        ap.error(f"unrecognized arguments: {' '.join(unknown)}")

    if args.cmd == "export":
        from . import config as cfg_lib
        from .config import load
        from .datasets import get_data_module

        if args.ema and args.average is not None:
            ap.error("--ema and --average are different weight-averaging "
                     "schemes; pick one")
        if args.ema and not args.ckpt:
            ap.error("--ema requires -p (the EMA lives in a trained "
                     "checkpoint's optimizer state)")
        cfg = load(args.cfg)
        if unknown:  # dotted config overrides, same contract as run.py
            cfg_lib.apply_cli_overrides(cfg, unknown)
        task = _build_task(cfg)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        dm.setup("fit")
        sample = next(iter(dm.train_batches()))
        # fresh-init exports honor train.seed (dotted overrides included),
        # so two exports can carry intentionally different weights
        params = task.init_params(
            jax.random.PRNGKey(int(cfg.train.get("seed", 0) or 0)), sample)
        if args.average is not None:
            if not args.ckpt:
                ap.error("--average requires -p pointing at the run's "
                         "checkpoints/ directory (the one holding index.json)")
            params = average_checkpoints(args.ckpt, k=args.average or None)
        elif args.ckpt:
            import orbax.checkpoint as ocp

            # accept a checkpoints/ (or run version_*/) directory too —
            # resolved to the run's BEST checkpoint via its index.json,
            # same contract as train.init_from (training/warmstart.py)
            from .training.warmstart import resolve_checkpoint

            concrete = resolve_checkpoint(args.ckpt)
            if os.path.abspath(concrete) != os.path.abspath(args.ckpt):
                print(f"[serving] -p {args.ckpt} -> best checkpoint "
                      f"{concrete}")
            restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(concrete))
            params = restored["params"] if "params" in restored else restored
            if args.ema:
                from .training.trainer import ema_params_from_opt_state

                ema = ema_params_from_opt_state(restored.get("opt_state"))
                if ema is None:
                    ap.error("--ema: this checkpoint carries no params EMA "
                             "(train with train.optimizer.ema_decay > 0)")
                params = ema
                print("[serving] exporting the Polyak-averaged (EMA) weights")
        # bake any LoRA adapters into effective weights up front so the
        # temperature fit and the Pallas conversion both see the adapted
        # model (export_serving also resolves — this is idempotent)
        from .modules.lora import resolve_lora

        params = resolve_lora(params)
        temperature = None
        if args.temperature is not None:
            if args.temperature == "auto":
                if not args.ckpt:
                    ap.error("--temperature auto calibrates TRAINED weights; "
                             "pass -p (a fresh init has nothing to calibrate)")
                # dm.setup("fit") above already prepared the val split
                logits, labels = collect_val_logits(task, params, dm)
                temperature = fit_temperature(logits, labels)
                print(f"[serving] fitted temperature T={temperature:.4f} on "
                      f"{len(labels)} val samples")
            else:
                try:
                    temperature = float(args.temperature)
                except ValueError:
                    ap.error(f"--temperature {args.temperature!r}: expected "
                             "a float or 'auto'")
        if args.pallas:
            task, params = to_pallas_serving(cfg, params, sample)
            if args.format == "stablehlo":
                print("[serving] --pallas kernels pick tiles from the "
                      "concrete batch size; using --format executable")
                args.format = "executable"
        # model.qat (modules/qat.py): the task's traced forward fake-
        # quantizes with exactly this PTQ's math, so the interplay is
        # well-defined — handled after --pallas (which rebuilds the task
        # from cfg) and after the temperature fit (which must calibrate the
        # quantized forward)
        q_min, q_group = _Q_MIN_SIZE, _Q4_GROUP
        qat_mode = getattr(task, "qat_mode", None)
        if qat_mode:
            q_min, q_group = task.qat_min_size, task.qat_group_size
            if args.quantize == qat_mode:
                # export_serving suppresses the in-trace fake-quant: PTQ of
                # the latent weights yields exactly the values the QAT
                # forward trained with, dequantized once in the artifact
                print(f"[serving] model.qat: {qat_mode} — exporting the "
                      "trained quantized forward losslessly")
            elif args.quantize is None:
                print(f"[serving] model.qat: {qat_mode} — the artifact keeps "
                      "the in-trace fake-quant (bit-exact to training); add "
                      f"--quantize {qat_mode} to also shrink it, losslessly")
            else:
                print(f"[serving] WARNING: model.qat is {qat_mode} but "
                      f"--quantize {args.quantize} re-quantizes the already-"
                      f"{qat_mode}-trained weights — deployed outputs will "
                      "drift from the trained forward")
        preprocess = None
        if not args.no_preprocess:
            preprocess = dm.serving_preprocess() or None
            if preprocess:
                from .preprocess import packaged_spec

                try:  # CLI degrades gracefully when assets aren't built
                    packaged_spec(preprocess, args.out, copy_assets=False)
                except FileNotFoundError as e:
                    print(f"[serving] {e}")
                    print("[serving] exporting WITHOUT raw-input "
                          "preprocessing (numeric features only)")
                    preprocess = None
        buckets = tuple(int(b) for b in args.buckets.split(","))
        out = export_serving(task, params, sample, args.out,
                             fmt=args.format, buckets=buckets,
                             quantize=args.quantize, preprocess=preprocess,
                             temperature=temperature,
                             quantize_min_size=q_min,
                             quantize_group_size=q_group)
        extra = (f" (raw-input preprocessing: "
                 f"{ {k: s['kind'] for k, s in preprocess.items()} })"
                 if preprocess else "")
        print(f"[serving] exported {args.format} artifact to {out}{extra}")
    elif args.cmd == "eval":
        from . import config as cfg_lib
        from .config import load
        from .datasets import get_data_module

        cfg = load(args.cfg)
        if unknown:  # dotted config overrides, same contract as run.py
            cfg_lib.apply_cli_overrides(cfg, unknown)
        task = _build_task(cfg)
        dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
        dm.setup("fit" if args.split in ("train", "val") else "test")
        model = load_serving(
            args.dir,
            mesh=_mesh_from_spec(args.mesh) if args.mesh else None,
            shard_params=args.shard_params, model_min_dim=args.model_min_dim)
        logs = evaluate_serving(model, task, dm, split=args.split,
                                max_batches=args.max_batches)
        if args.output:
            with open(args.output, "w") as f:
                json.dump(logs, f, indent=2)
        print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                          for k, v in logs.items()}))
    elif args.cmd == "predict":
        model = load_serving(
            args.dir,
            mesh=_mesh_from_spec(args.mesh) if args.mesh else None,
            shard_params=args.shard_params, model_min_dim=args.model_min_dim)
        if args.input.endswith(".json"):
            # raw-input requests (text strings / base64 images) — the
            # artifact's embedded preprocess spec featurizes them
            with open(args.input) as f:
                obj = json.load(f)
            if not isinstance(obj, dict):
                raise SystemExit(f"[serving] {args.input}: JSON input must "
                                 "be an object mapping feature names to "
                                 "arrays or raw values")
            feats = {k: v for k, v in obj.items() if k != "label"}
        else:
            data = np.load(args.input)
            feats = {k: data[k] for k in data.files if k != "label"}
        try:
            # featurizes raw entries and casts to the artifact's dtypes (a
            # float64/uint8 npz would otherwise reach the pinned executable
            # avals raw — same contract as the HTTP endpoint). Broad catch:
            # bad base64/image bytes raise PIL OSErrors, missing artifact
            # assets FileNotFoundError — all are request/artifact problems
            # that deserve the clean CLI error, not a traceback.
            feats = model.preprocess_inputs(feats)
            validate_features(feats, model.meta)
        except Exception as e:
            raise SystemExit(f"[serving] {args.input}: {e}")
        sizes = {k: np.shape(v)[0] for k, v in feats.items()}
        out = model.predict(feats)
        flat = {}
        for k, v in out.items():
            if isinstance(v, (tuple, list)):
                for i, b in enumerate(v):
                    flat[f"{k}_{i}"] = np.asarray(b)
            else:
                flat[k] = np.asarray(v)
        np.savez(args.output, **flat)
        n = next(iter(sizes.values()))
        print(json.dumps({"metric": "predict_samples", "value": n,
                          "outputs": sorted(flat), "out": args.output}))
    elif args.cmd == "serve":
        from .server import serve_forever

        mesh_kw = dict(
            mesh=_mesh_from_spec(args.mesh) if args.mesh else None,
            shard_params=args.shard_params, model_min_dim=args.model_min_dim)
        dirs = args.dir
        if len(dirs) == 1 and "=" not in dirs[0]:
            target = load_serving(dirs[0], **mesh_kw)
        else:
            target = {}
            for spec in dirs:
                if "=" not in spec:
                    ap.error(f"multi-model serve needs name=dir pairs "
                             f"(got {spec!r})")
                name, _, d = spec.partition("=")
                if not name or name in target:
                    ap.error(f"bad or duplicate model name in {spec!r}")
                target[name] = load_serving(d, **mesh_kw)
        serve_forever(target, host=args.host, port=args.port,
                      coalesce=not args.no_coalesce, warmup=args.warmup,
                      request_timeout=args.request_timeout,
                      max_queue=args.max_queue)
    else:
        import time

        model = load_serving(
            args.dir,
            mesh=_mesh_from_spec(args.mesh) if args.mesh else None,
            shard_params=args.shard_params, model_min_dim=args.model_min_dim)
        feats = {
            k: np.random.rand(args.batch, *shp).astype(model.meta["dtypes"][k])
            for k, shp in model.meta["features"].items()
        }
        model.predict(feats)  # warm / compile

        # end-to-end: host numpy in -> host numpy out, per request. On a
        # host with a local accelerator this is the serving number; through
        # a remote-device tunnel (axon) it is transfer/dispatch dominated.
        t0 = time.perf_counter()
        for _ in range(args.iters):
            model.predict(feats)
        e2e = (time.perf_counter() - t0) / args.iters

        # device latency: device-resident inputs, pipelined dispatch, one
        # final block — the model's own compute time per request.
        bucket = pick_bucket(args.batch, model.buckets)
        if args.batch > bucket:
            # predict() chunks oversize requests; the single-dispatch device
            # number is only defined per bucket — measure the top bucket
            print(f"[serving] --batch {args.batch} exceeds the largest "
                  f"export bucket ({bucket}); device latency measured at "
                  f"batch {bucket}")
        # under a mesh, device-resident inputs carry the same data-axis
        # sharding the jitted call expects (a plain device_put would commit
        # them to one device and force a reshard per request)
        put = (lambda a: jax.device_put(a, model._data_sharding(a.ndim))) \
            if model._data_sharding is not None else jax.device_put
        padded = {
            k: put(np.pad(
                v[:bucket], [(0, max(0, bucket - args.batch))]
                + [(0, 0)] * (v.ndim - 1)))
            for k, v in feats.items()
        }
        call = model._calls[bucket]

        def fetch(o):
            # hard completion barrier: one device->host fetch of the last
            # output. In-order execution means every queued call finished;
            # jax.block_until_ready alone can return early through remote-
            # device tunnels and both under- and over-counts (kbench39:
            # 'blocked' b512 readings ranged 0.07-4.8 ms across runs while
            # the fetch-barriered number is stable at ~0.9-1.2 ms).
            return np.asarray(jax.tree.leaves(o)[0])

        fetch(call(model.params, padded))  # warm this exact shape
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = call(model.params, padded)
        fetch(out)
        dev = (time.perf_counter() - t0) / args.iters

        print(json.dumps({
            "metric": "serving_latency_ms_device", "value": round(dev * 1e3, 3),
            "e2e_latency_ms": round(e2e * 1e3, 3),
            "batch": min(args.batch, bucket),
            "device_throughput_samples_per_sec": round(min(args.batch, bucket) / dev, 1),
            "format": model.meta["format"],
            "device": jax.devices()[0].device_kind,
        }))


if __name__ == "__main__":
    main()
