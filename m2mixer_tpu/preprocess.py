"""Raw-input featurization for serving artifacts.

A serving artifact can carry the dataset's deterministic host-side
preprocessing (a ``preprocess`` block in ``serving.json`` plus copied
assets), so clients send raw text strings / encoded image files and the
server reproduces exactly the features the model trained on. The reference
has no serving story at all — its preprocessing lives inside DataLoader
datasets (`/root/reference/datasets/mmimdb.py:107-146`,
`/root/reference/utils/projection.py:12-29`); here the same pipeline ships
inside the artifact, self-contained (vocab + hash-cache assets are copied
in at export).

Spec entries, keyed by feature name:

- ``{"kind": "pnlp_text", "vocab": {...}, "projection": {...},
  "max_seq_len": N}`` — raw input: a list of strings. Runs the wordpiece ->
  MinHash projection of ``datasets/text_pipeline.TextFeaturizer``; when the
  projected ``(seq, dim)`` block doesn't match the artifact's feature shape
  it is flattened, zero-padded/truncated, and reshaped (the
  ``MMIMDBExtDataModule`` grid rule).
- ``{"kind": "image", "normalize": "imagenet"|"scale"}`` — raw input: a
  list of base64-encoded image files (or raw bytes). Decode -> bicubic
  resize to the artifact feature shape -> CHW [0,1] -> optional ImageNet
  normalization (the ``datasets/transforms.load_image`` pipeline).
- ``{"kind": "text_len", "of": "text"}`` — synthesized when absent from
  the request and the source text arrived raw: whitespace word count
  (parity with the datamodules' ``text.count(' ') + 1``).
- ``{"kind": "const", "value": 1.0}`` — synthesized per-sample constant
  (MMHS150's always-1 ``use_features`` flags under the pnlp projection).

Numeric entries always pass through untouched, so clients may mix raw and
pre-featurized fields in one request.
"""

from __future__ import annotations

import base64
import copy
import io
import os
from typing import Dict, Optional

import numpy as np

__all__ = ["ServingPreprocessor", "is_raw_value", "KINDS"]

KINDS = ("pnlp_text", "image", "text_len", "const")


def is_raw_value(v) -> bool:
    """True for request values that need featurization rather than a dtype
    cast: strings, lists of strings/bytes, or string-dtype arrays."""
    if isinstance(v, (str, bytes)):
        return True
    if isinstance(v, (list, tuple)) and v and all(
            isinstance(x, (str, bytes)) for x in v):
        return True
    return isinstance(v, np.ndarray) and v.dtype.kind in ("U", "S", "O")


def _as_raw_list(v):
    if isinstance(v, (str, bytes)):
        return [v]
    if isinstance(v, np.ndarray):
        if v.ndim != 1:
            # an (n, 1) string column would tolist() into nested lists and
            # str()-ify into garbage features — reject it loudly instead
            raise ValueError("raw feature arrays must be 1-D (one string "
                             f"per sample); got shape {v.shape}")
        return list(v.tolist())
    return list(v)


class ServingPreprocessor:
    """Featurize raw request entries against an artifact's preprocess spec.

    ``spec``: the ``serving.json`` ``preprocess`` block; asset paths inside
    it are resolved against ``base_dir`` (the artifact directory) first, so
    exported artifacts stay self-contained. ``feature_shapes``/``dtypes``:
    the artifact's per-sample feature contract (targets for image resize
    and projection reshape).
    """

    def __init__(self, spec: Dict[str, dict], base_dir: str,
                 feature_shapes: Dict[str, list], dtypes: Dict[str, str]):
        for name, s in (spec or {}).items():
            if s.get("kind") not in KINDS:
                raise ValueError(f"preprocess spec for {name!r}: unknown "
                                 f"kind {s.get('kind')!r} (expected one of "
                                 f"{KINDS})")
        self.spec = spec or {}
        self.base_dir = base_dir
        self.shapes = {k: tuple(v) for k, v in feature_shapes.items()}
        self.dtypes = dict(dtypes)
        self._featurizers: Dict[str, object] = {}

    def kinds(self) -> Dict[str, str]:
        return {k: s.get("kind") for k, s in self.spec.items()}

    # ------------------------------------------------------------- text
    def _resolve(self, path: str) -> str:
        cand = os.path.join(self.base_dir, path)
        return cand if os.path.exists(cand) else path

    def _featurizer(self, name: str):
        if name not in self._featurizers:
            from .config import DictConfig
            from .datasets.text_pipeline import TextFeaturizer

            s = self.spec[name]
            vocab = copy.deepcopy(dict(s["vocab"]))
            vocab["tokenizer"] = dict(vocab.get("tokenizer", {}))
            if vocab["tokenizer"].get("vocab"):
                vocab["tokenizer"]["vocab"] = self._resolve(vocab["tokenizer"]["vocab"])
            if vocab.get("vocab_path"):
                vocab["vocab_path"] = self._resolve(vocab["vocab_path"])
            self._featurizers[name] = TextFeaturizer(
                DictConfig(vocab), DictConfig(dict(s["projection"])),
                int(s["max_seq_len"]))
        return self._featurizers[name]

    def _project(self, name: str, text: str) -> np.ndarray:
        feats = self._featurizer(name)(str(text)).astype(np.float32)
        target = self.shapes.get(name)
        if target is None or feats.shape == target:
            return feats
        # grid rule (MMIMDBExt feeds the projection through an image-shaped
        # mixer): flatten, zero-pad/truncate, reshape to the feature shape
        flat = feats.reshape(-1)
        want = int(np.prod(target))
        out = np.zeros((want,), np.float32)
        out[: min(want, flat.size)] = flat[:want]
        return out.reshape(target)

    # ------------------------------------------------------------ image
    def _decode_image(self, name: str, value) -> np.ndarray:
        from PIL import Image

        from .datasets.transforms import image_to_chw, imagenet_normalize

        raw = base64.b64decode(value) if isinstance(value, str) else bytes(value)
        target = self.shapes.get(name)
        if target is None or len(target) != 3:
            raise ValueError(f"image feature {name!r} needs a (C, H, W) "
                             f"artifact shape; got {target}")
        c, h, w = (int(d) for d in target)
        img = Image.open(io.BytesIO(raw)).convert("RGB" if c == 3 else "L")
        if img.size != (w, h):
            img = img.resize((w, h), Image.BICUBIC)  # PIL wants (W, H)
        chw = image_to_chw(img)
        if self.spec[name].get("normalize", "imagenet") == "imagenet":
            chw = imagenet_normalize(chw)
        return chw

    # ------------------------------------------------------------- main
    def __call__(self, inputs: Dict[str, object]) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        raw_text: Dict[str, list] = {}
        for k, v in inputs.items():
            if k == "label":
                continue
            s = self.spec.get(k)
            if s is not None and is_raw_value(v):
                items = _as_raw_list(v)
                if s["kind"] == "pnlp_text":
                    texts = [x.decode("utf-8") if isinstance(x, bytes) else str(x)
                             for x in items]
                    raw_text[k] = texts
                    out[k] = np.stack([self._project(k, t) for t in texts])
                elif s["kind"] == "image":
                    out[k] = np.stack([self._decode_image(k, x) for x in items])
                else:
                    raise ValueError(
                        f"feature {k!r} is synthesized ({s['kind']}); send it "
                        "as a numeric array or omit it")
            elif is_raw_value(v):
                raise ValueError(
                    f"feature {k!r} arrived raw but the artifact carries no "
                    "preprocess spec for it; send a numeric array")
            else:
                out[k] = np.asarray(v)
        # synthesized features the client did not supply
        n = next((int(np.shape(v)[0]) for v in out.values() if np.ndim(v)), None)
        for k, s in self.spec.items():
            if k in out:
                continue
            if s["kind"] == "text_len":
                src = s.get("of", "text")
                if src in raw_text:
                    out[k] = np.asarray(
                        [t.count(" ") + 1 for t in raw_text[src]], np.int32)
            elif s["kind"] == "const" and n is not None:
                out[k] = np.full((n,), s.get("value", 1.0), np.float32)
        return out


def packaged_spec(spec: Optional[Dict[str, dict]], out_dir: str,
                  copy_assets: bool = True) -> Optional[Dict[str, dict]]:
    """Validate a preprocess spec for export and make the artifact
    self-contained: referenced asset files (tokenizer vocab, MinHash cache)
    are copied into ``out_dir/assets/`` and their spec paths rewritten
    artifact-relative. Returns the rewritten spec (a deep copy)."""
    if not spec:
        return None
    import shutil

    spec = copy.deepcopy({k: dict(v) for k, v in spec.items()})
    for name, s in spec.items():
        if s.get("kind") not in KINDS:
            raise ValueError(f"preprocess spec for {name!r}: unknown kind "
                             f"{s.get('kind')!r} (expected one of {KINDS})")

    def move(path: str) -> str:
        rel = "assets/" + os.path.basename(path)
        dst = os.path.join(out_dir, rel)
        if not os.path.exists(path):
            if os.path.exists(dst):
                # idempotent re-export into an artifact that already holds
                # the asset (spec paths were rewritten artifact-relative)
                return rel
            raise FileNotFoundError(
                f"preprocess asset {path!r} does not exist; build it first "
                "(e.g. python -m m2mixer_tpu.utils.projection -v VOCAB.txt) "
                "or export with --no-preprocess")
        if copy_assets:
            os.makedirs(os.path.join(out_dir, "assets"), exist_ok=True)
            if os.path.abspath(path) != os.path.abspath(dst):
                shutil.copyfile(path, dst)
        return rel

    for s in spec.values():
        if s.get("kind") != "pnlp_text":
            continue
        s["vocab"] = dict(s["vocab"])
        s["projection"] = dict(s["projection"])
        tok = s["vocab"]["tokenizer"] = dict(s["vocab"].get("tokenizer", {}))
        if tok.get("vocab"):
            tok["vocab"] = move(tok["vocab"])
        if s["vocab"].get("vocab_path"):
            s["vocab"]["vocab_path"] = move(s["vocab"]["vocab_path"])
    return spec
