"""Offline MM-IMDB dataset builder.

Re-expresses ``/root/reference/datasets/make_mmimdb.py``: converts the raw
MM-IMDB dump (per-movie ``{id}.json`` + ``{id}.jpeg``) into the per-sample
``{split}/{images,labels,text}/..._{i}`` layout consumed by
``MMIMDBDataModule``. Semantics kept: longest plot chosen, text normalized,
resize-and-center-crop to the target box, top-23 genres, per-class
stratified split with the fixed RNG seed [2014, 8, 6] working from the
rarest class up, and optional word2vec vocab filtering (skipped when gensim
/ the GoogleNews vectors are unavailable — the words are kept unfiltered).

Usage:
    python -m m2mixer_tpu.datasets.make_mmimdb RAW_DIR OUT_DIR [W2V_BIN]
    python -m m2mixer_tpu.datasets.make_mmimdb --surrogate --out OUT [-n N]

``--surrogate`` (no real MM-IMDB raw dump is obtainable in an offline
environment): synthesizes a class-structured raw dump — each synthetic
movie draws 1-3 of the 23 genres, its plot carries genre keywords, and its
poster carries genre-colored stripes — then runs the NORMAL build over it
(same stratified split, crop, text normalization), and writes a matching
``vocab.txt`` + MinHash ``vocab.npy`` so training runs end to end from
files. The result demonstrates the full pipeline and is learnable; it is
NOT comparable to published MM-IMDB numbers.
"""

from __future__ import annotations

import json
import math
import os
import re
from collections import Counter, OrderedDict
from glob import glob

import numpy as np
from PIL import Image

__all__ = ["build", "normalize_text", "resize_and_crop_image"]


def normalize_text(text: str):
    """Lowercase word list with punctuation stripped (reference
    `make_mmimdb.py:84-91` semantics)."""
    text = text.lower().replace("<br />", " ")
    text = re.sub(r"[^a-z0-9' ]", " ", text)
    return [w for w in text.split() if w]


def resize_and_crop_image(path: str, box=(224, 224)) -> np.ndarray:
    """Center-crop to the box aspect then Lanczos-resize
    (reference `make_mmimdb.py:23-59`)."""
    img = Image.open(path)
    x2, y2 = img.size
    w_ratio, h_ratio = x2 / box[0], y2 / box[1]
    x1 = y1 = 0
    if h_ratio > w_ratio:
        y1 = int(y2 / 2 - box[1] * w_ratio / 2)
        y2 = int(y2 / 2 + box[1] * w_ratio / 2)
    else:
        x1 = int(x2 / 2 - box[0] * h_ratio / 2)
        x2 = int(x2 / 2 + box[0] * h_ratio / 2)
    img = img.crop((x1, y1, x2, y2)).resize(box, Image.LANCZOS).convert("RGB")
    return np.asarray(img)


def build(raw_dir: str, out_dir: str, img_size=(256, 160), n_classes: int = 23,
          dev_size: float = 0.1, test_size: float = 0.3,
          rng_seed=(2014, 8, 6), word2vec_path: str | None = None) -> None:
    movies = []
    for jf in sorted(glob(os.path.join(raw_dir, "*.json"))):
        with open(jf) as f:
            data = json.load(f)
        imf = jf.replace("json", "jpeg")
        if not ("genres" in data and "plot" in data and os.path.isfile(imf)):
            continue
        plots = data["plot"]
        plot = plots[int(np.argmax([len(p) for p in plots]))]
        words = normalize_text(plot)
        if not words:
            continue
        movies.append({
            "genres": data["genres"],
            "words": words,
            "cover": resize_and_crop_image(imf, img_size),
        })

    vocab_filter = None
    if word2vec_path:
        try:
            from gensim.models import KeyedVectors

            vocab_filter = KeyedVectors.load_word2vec_format(word2vec_path, binary=True)
        except Exception as e:
            print(f"[make_mmimdb] word2vec unavailable ({e}); keeping all words")

    counts = OrderedDict(Counter(g for m in movies for g in m["genres"]).most_common())
    target_names = list(counts.keys())[:n_classes]
    target_index = {g: i for i, g in enumerate(target_names)}

    Y = np.zeros((len(movies), n_classes), np.int64)
    for i, m in enumerate(movies):
        for g in m["genres"]:
            if g in target_index:
                Y[i, target_index[g]] = 1

    # per-class stratified split, rarest class first (`make_mmimdb.py:127-139`)
    B = Y.copy()
    rng = np.random.RandomState(list(rng_seed))
    train_idx, dev_idx, test_idx = [], [], []
    for l in range(n_classes - 1, -1, -1):
        t = rng.permutation(B[:, l].nonzero()[0])
        n_test = int(math.ceil(len(t) * test_size))
        n_dev = int(math.ceil(len(t) * dev_size))
        test_idx.extend(t[:n_test])
        dev_idx.extend(t[n_test : n_test + n_dev])
        train_idx.extend(t[n_test + n_dev :])
        B[t, :] = 0

    splits = {"train": train_idx, "dev": dev_idx, "test": test_idx}
    for split, idxs in splits.items():
        for sub in ("images", "labels", "text"):
            os.makedirs(os.path.join(out_dir, split, sub), exist_ok=True)
        for i, idx in enumerate(idxs):
            m = movies[idx]
            words = m["words"]
            if vocab_filter is not None:
                words = [w for w in words if w in vocab_filter]
            with open(os.path.join(out_dir, split, "text", f"text_{i}.txt"), "w") as f:
                f.write(" ".join(words))
            Image.fromarray(m["cover"]).save(
                os.path.join(out_dir, split, "images", f"image_{i}.jpeg")
            )
            np.save(os.path.join(out_dir, split, "labels", f"label_{i}.npy"), Y[idx])
        print(f"[make_mmimdb] {split}: {len(idxs)} samples")


_FILLERS = ["the", "movie", "follows", "a", "story", "about", "people",
            "who", "must", "find", "their", "way", "through", "an",
            "unexpected", "turn", "of", "events", "in", "town"]


def surrogate_raw(raw_dir: str, n_movies: int = 2000, img_size=(256, 160),
                  n_classes: int = 23, seed: int = 0) -> list:
    """Synthesize a class-structured raw dump in the real MM-IMDB layout
    (per-movie ``{id}.json`` + ``{id}.jpeg``). Genre g contributes keywords
    ``genreGGwordK`` to the plot and paints a fixed-color stripe across the
    poster, so both modalities carry signal. Genre frequencies are skewed
    (p ~ 1/(rank+2)) so the rarest-first stratified split has real work.
    Returns the word list (for the surrogate vocab)."""
    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    genres = [f"genre{i:02d}" for i in range(n_classes)]
    keywords = {g: [f"{genres[g]}word{k}" for k in range(3)]
                for g in range(n_classes)}
    p = 1.0 / (np.arange(n_classes) + 2.0)
    p /= p.sum()
    palette = np.random.RandomState(7).randint(64, 256, (n_classes, 3))
    w, h = img_size
    for mid in range(n_movies):
        k = 1 + rng.randint(3)
        gs = rng.choice(n_classes, size=k, replace=False, p=p)
        # every active genre named at least once, then a random mix
        words = [keywords[int(g)][0] for g in gs]
        for _ in range(40 - len(words)):
            if rng.rand() < 0.5:
                g = int(gs[rng.randint(k)])
                words.append(keywords[g][rng.randint(3)])
            else:
                words.append(_FILLERS[rng.randint(len(_FILLERS))])
        img = rng.randint(0, 48, (h, w, 3))
        band = max(1, h // n_classes)
        for g in gs:
            rows = slice(int(g) * band, min(h, (int(g) + 1) * band))
            img[rows] = palette[int(g)] + rng.randint(-16, 16, (1, 1, 3))
        with open(os.path.join(raw_dir, f"{mid:07d}.json"), "w") as f:
            json.dump({"genres": [genres[int(g)] for g in gs],
                       "plot": [" ".join(words)]}, f)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(raw_dir, f"{mid:07d}.jpeg"))
    return sorted(set(_FILLERS) | {kw for kws in keywords.values() for kw in kws})


def surrogate_vocab(out_dir: str, words) -> None:
    """Write ``vocab.txt`` (wordpiece specials + the surrogate word list)
    and build its MinHash cache ``vocab.npy`` next to it."""
    from ..utils.projection import build_vocab_cache

    vocab_file = os.path.join(out_dir, "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                          + list(words)))
    build_vocab_cache(vocab_file, os.path.join(out_dir, "vocab.npy"))
    print(f"[make_mmimdb] wrote {vocab_file} + vocab.npy "
          f"({len(words)} words)")


if __name__ == "__main__":
    import argparse
    import sys

    if sys.argv[1:] and not sys.argv[1].startswith("-"):
        # reference-style positional form: RAW_DIR OUT_DIR [W2V_BIN]
        build(sys.argv[1], sys.argv[2],
              word2vec_path=sys.argv[3] if len(sys.argv) > 3 else None)
    else:
        ap = argparse.ArgumentParser(description=__doc__)
        ap.add_argument("--surrogate", action="store_true", required=True)
        ap.add_argument("--out", required=True)
        ap.add_argument("-n", "--n-movies", type=int, default=2000)
        ap.add_argument("--seed", type=int, default=0)
        args = ap.parse_args()
        raw = os.path.join(args.out, "raw")
        words = surrogate_raw(raw, n_movies=args.n_movies, seed=args.seed)
        build(raw, args.out)
        surrogate_vocab(args.out, words)
