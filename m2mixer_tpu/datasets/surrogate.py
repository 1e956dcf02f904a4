"""Offline surrogate generators for EVERY shipped dataset family.

No real dataset is downloadable in an air-gapped environment, so each
generator synthesizes a CLASS-STRUCTURED stand-in in the exact on-disk
layout its datamodule reads (the same files the reference's loaders
expect — layouts cited per function), with signal planted in every
modality so end-to-end training converges. Text-bearing families also get
a matching ``vocab.txt`` + MinHash ``vocab.npy`` written into the output
directory.

    python -m m2mixer_tpu.datasets.surrogate FAMILY --out DIR [-n N] [--seed S]

Families: avmnist, mmimdb, mmimdb_ext, mimic, mmhs150, multioff, memotion,
pnlp, mosi (or ``all``). ``avmnist``/``mmimdb`` delegate to the dedicated
builders (``make_avmnist --surrogate`` runs sklearn-digits upsampling, and
``make_mmimdb --surrogate`` drives the real stratified-split build
pipeline); the rest live here.

Surrogate numbers are NOT comparable to published results — the point is
that every ``cfg/`` config can be driven end to end (train → checkpoint →
test → serve) without any external data.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

__all__ = ["FAMILIES", "generate"]

_SENT_WORDS = {1: ["great", "wonderful", "loved"], 0: ["bad", "awful", "boring"]}
_FILL = ["the", "movie", "was", "a", "story", "about", "it", "and", "then"]


def _write_vocab(out_dir: str, words) -> None:
    from .make_mmimdb import surrogate_vocab

    surrogate_vocab(out_dir, sorted(set(words)))


def _sentence(rng, label_words, n=12):
    words = []
    for _ in range(n):
        pool = label_words if rng.rand() < 0.5 else _FILL
        words.append(pool[rng.randint(len(pool))])
    return " ".join(words)


def _image(rng, label, n_classes, hw=(64, 64)):
    """Poster with a class-colored band (PIL-saveable uint8 HWC)."""
    palette = np.random.RandomState(7).randint(64, 256, (max(n_classes, 2), 3))
    img = rng.randint(0, 48, (*hw, 3))
    band = max(1, hw[0] // max(n_classes, 2))
    rows = slice(label * band, min(hw[0], (label + 1) * band))
    img[rows] = palette[label] + rng.randint(-16, 16, (1, 1, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _save_jpeg(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


# ------------------------------------------------------------ families
def gen_avmnist(out: str, n: int = 2000, seed: int = 0) -> None:
    """Delegates to ``make_avmnist --surrogate`` (sklearn-digits images +
    class-structured spectrograms; layout `/root/reference/datasets/avmnist.py:104-114`).
    ``n`` is the train size; test gets n/6."""
    from .make_avmnist import build_surrogate

    build_surrogate(out, n_train=n, n_test=max(1, n // 6), seed=seed)


def gen_mmimdb(out: str, n: int = 2000, seed: int = 0) -> None:
    """Delegates to the real MM-IMDB build pipeline over a synthetic raw
    dump (``make_mmimdb --surrogate``; per-file layout
    `/root/reference/datasets/mmimdb.py:109-117`)."""
    from .make_mmimdb import build, surrogate_raw, surrogate_vocab

    words = surrogate_raw(os.path.join(out, "raw"), n_movies=n, seed=seed)
    build(os.path.join(out, "raw"), out)
    surrogate_vocab(out, words)


def gen_mmimdb_ext(out: str, n: int = 600, seed: int = 0,
                   n_classes: int = 23) -> None:
    """Processed-npy layout (`/root/reference/datasets/get_processed_mmimdb.py:89-143`):
    ``{split}/image_{i:06}.npy`` stored transposed (W, H, C) 0-255,
    ``text_{i:06}.npy`` projected-feature rows, ``label_{i:06}.npy``
    23-hot. Genre signal: image stripes + genre-indexed text columns."""
    rng = np.random.RandomState(seed)
    palette = np.random.RandomState(7).randint(64, 256, (n_classes, 3))
    sizes = {"train": int(0.7 * n), "dev": int(0.1 * n)}
    sizes["test"] = n - sizes["train"] - sizes["dev"]
    for split, count in sizes.items():
        d = os.path.join(out, split)
        os.makedirs(d, exist_ok=True)
        for i in range(count):
            k = 1 + rng.randint(3)
            gs = rng.choice(n_classes, size=k, replace=False)
            y = np.zeros(n_classes, np.int64)
            y[gs] = 1
            img = rng.randint(0, 48, (160, 256, 3))
            band = max(1, 160 // n_classes)
            for g in gs:
                img[int(g) * band : (int(g) + 1) * band] = palette[int(g)]
            # loader does np.load(...).T -> (C, H=160, W=256): store (W, H, C)
            np.save(os.path.join(d, f"image_{i:06}.npy"),
                    img.transpose(1, 0, 2).astype(np.float32))
            text = np.zeros((20, 300), np.float32)
            text[:, gs] = 1.0
            text += rng.rand(20, 300).astype(np.float32) * 0.1
            np.save(os.path.join(d, f"text_{i:06}.npy"), text)
            np.save(os.path.join(d, f"label_{i:06}.npy"), y)
        print(f"[surrogate] mmimdb_ext {split}: {count} samples")


def gen_mimic(out: str, n: int = 2000, seed: int = 0) -> None:
    """``im.pk`` pickle (`/root/reference/datasets/mimic.py:36-39`):
    ``ep_tdata`` (N, 24, 12) time series, ``adm_features_all`` (N, 5)
    statics, ``adm_labels_all`` (N, 6) admission columns (mortality class =
    first positive of columns 1-5, else 0), ``y_icd9`` (N, 20) binary task
    columns. Class signal: mean shifts in both modalities."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 6, n)
    time = rng.randn(n, 24, 12) + (y[:, None, None] - 2.5) * 0.6
    static = rng.randn(n, 5) + (y[:, None] - 2.5) * 0.8
    adm = np.zeros((n, 6), np.int64)
    for i, c in enumerate(y):
        if c > 0:
            adm[i, c] = 1
    icd9 = rng.randint(0, 2, (n, 20))
    icd9[:, 1] = (y > 2).astype(np.int64)  # task-1 column carries signal too
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "im.pk"), "wb") as f:
        pickle.dump({"ep_tdata": time, "adm_features_all": static,
                     "adm_labels_all": adm, "y_icd9": icd9}, f)
    print(f"[surrogate] mimic: {n} stays -> {out}/im.pk")


def gen_mmhs150(out: str, n: int = 400, seed: int = 0) -> None:
    """MMHS150K layout (`/root/reference/datasets/mmhs150.py:92-135`):
    ``splits/{train,test,val}_ids.txt``, ``img_resized/{id}.jpg``,
    ``img_txt/{id}.json`` OCR, ``MMHS150K_GT.json`` with tweet text +
    3 annotator votes. Binary signal in tweet/OCR words + image color."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out, "splits"), exist_ok=True)
    os.makedirs(os.path.join(out, "img_resized"), exist_ok=True)
    os.makedirs(os.path.join(out, "img_txt"), exist_ok=True)
    words = {1: ["hateword0", "hateword1", "slurword"],
             0: ["kindword0", "kindword1", "niceword"]}
    gt, ids = {}, [f"{100000 + i}" for i in range(n)]
    for i, sid in enumerate(ids):
        label = int(rng.rand() < 0.5)
        votes = [label, label, int(rng.rand() < 0.5)]  # majority = label
        gt[sid] = {"tweet_text": _sentence(rng, words[label]),
                   "labels": votes}
        _save_jpeg(os.path.join(out, "img_resized", f"{sid}.jpg"),
                   _image(rng, label, 2))
        if rng.rand() < 0.7:  # some images carry no OCR json (loader default)
            with open(os.path.join(out, "img_txt", f"{sid}.json"), "w") as f:
                json.dump({"img_text": _sentence(rng, words[label], 5)}, f)
    cut1, cut2 = int(0.7 * n), int(0.85 * n)
    for name, part in (("train_ids", ids[:cut1]), ("val_ids", ids[cut1:cut2]),
                       ("test_ids", ids[cut2:])):
        with open(os.path.join(out, "splits", f"{name}.txt"), "w") as f:
            f.write("\n".join(part))
    with open(os.path.join(out, "MMHS150K_GT.json"), "w") as f:
        json.dump(gt, f)
    _write_vocab(out, _FILL + sum(words.values(), []))
    print(f"[surrogate] mmhs150: {n} tweets -> {out}")


def gen_multioff(out: str, n: int = 300, seed: int = 0) -> None:
    """MultiOFF layout (`/root/reference/datasets/multioff.py:86-93`):
    ``Split Dataset/{Training,Testing,Validation}_meme_dataset.csv`` with
    an 'offensive'/'Non-offensiv' last column + ``Labelled Images/``."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out, "Split Dataset"), exist_ok=True)
    os.makedirs(os.path.join(out, "Labelled Images"), exist_ok=True)
    csvs = {"Training_meme_dataset.csv": int(0.7 * n),
            "Testing_meme_dataset.csv": int(0.15 * n),
            "Validation_meme_dataset.csv": n - int(0.7 * n) - int(0.15 * n)}
    words = {1: ["offenseword0", "offenseword1"], 0: ["kindword0", "politeword"]}
    i = 0
    for csv, count in csvs.items():
        rows = ["image_name,sentence,label"]
        for _ in range(count):
            label = int(rng.rand() < 0.5)
            name = f"meme_{i}.jpg"
            _save_jpeg(os.path.join(out, "Labelled Images", name),
                       _image(rng, label, 2))
            rows.append(f"{name},{_sentence(rng, words[label])},"
                        f"{'offensive' if label else 'Non-offensiv'}")
            i += 1
        with open(os.path.join(out, "Split Dataset", csv), "w") as f:
            f.write("\n".join(rows) + "\n")
    _write_vocab(out, _FILL + sum(words.values(), []))
    print(f"[surrogate] multioff: {n} memes -> {out}")


def gen_memotion(out: str, n: int = 300, seed: int = 0) -> None:
    """Memotion layout (`/root/reference/datasets/memotion.py:87-98`):
    ``labels.csv`` + precomputed ``shuffled.npy`` permutation + ``images/``.
    Humour signal in text keywords + image band."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(out, "images"), exist_ok=True)
    levels = ["funny", "hilarious", "not_funny"]
    # ALL five sentiment levels of the real dataset (the shipped config's
    # task has num_classes=5; planting fewer would cap macro-F1 at
    # present/5 — the round-3 exhibit's 0.566 plateau was this ceiling)
    sentiments = ["very_positive", "positive", "neutral", "negative",
                  "very_negative"]
    words = {0: ["ecstaticword"], 1: ["chuckleword"], 2: ["dryword"],
             3: ["grumpyword"], 4: ["furiousword"]}
    rows = ["image_name,text_corrected,humour,sarcasm,offensive,"
            "motivational,overall_sentiment"]
    # STRATIFIED labels: the datamodule (faithfully mirroring the
    # reference, `/root/reference/datasets/memotion.py:91-99`) computes
    # cat.codes PER SPLIT after slicing, so a split missing a class would
    # silently renumber its labels against the train split's ids. Cycle
    # the classes within each shuffled-split region so every split of
    # size >= n_classes contains all of them.
    perm = np.random.RandomState(seed + 1).permutation(n)
    labels_by_row = np.empty(n, int)
    bounds = [0, int(0.7 * n), int(0.9 * n), n]
    for lo, hi in zip(bounds, bounds[1:]):
        for k, j in enumerate(range(lo, hi)):
            labels_by_row[perm[j]] = k % len(sentiments)
    for i in range(n):
        label = int(labels_by_row[i])
        name = f"image_{i}.jpg"
        _save_jpeg(os.path.join(out, "images", name),
                   _image(rng, label, len(sentiments)))
        rows.append(f"{name},{_sentence(rng, words[label])},"
                    f"{levels[label % 3]},"
                    f"general,not_offensive,not_motivational,{sentiments[label]}")
    with open(os.path.join(out, "labels.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    np.save(os.path.join(out, "shuffled.npy"), perm)
    _write_vocab(out, _FILL + sum(words.values(), []))
    print(f"[surrogate] memotion: {n} memes -> {out}")


def gen_pnlp(out: str, n: int = 400, seed: int = 0) -> None:
    """aclImdb folder layout (`/root/reference/datasets/pnlp.py:109-128`):
    ``{train,test}/{pos,neg}/{i}.txt`` sentiment reviews."""
    rng = np.random.RandomState(seed)
    for split, count in (("train", int(0.8 * n)), ("test", n - int(0.8 * n))):
        for label, sub in ((1, "pos"), (0, "neg")):
            d = os.path.join(out, split, sub)
            os.makedirs(d, exist_ok=True)
            for i in range(count // 2):
                with open(os.path.join(d, f"{i}.txt"), "w") as f:
                    f.write(_sentence(rng, _SENT_WORDS[label], 20))
    _write_vocab(out, _FILL + sum(_SENT_WORDS.values(), []))
    print(f"[surrogate] pnlp: {n} reviews -> {out}")


def gen_mosi(out: str, n: int = 400, seed: int = 0) -> None:
    """CMU-MOSI pickle folds (`/root/reference/datasets/mosi_dataset.py:98-150`):
    ``mosi_raw.pkl`` with train/valid/test folds of vision (V, 35-d), audio
    (COVAREP 74-d), raw text, and real-valued sentiment labels; signal in
    all three modalities (sign of the label)."""
    rng = np.random.RandomState(seed)

    def fold(count):
        sign = rng.randint(0, 2, count) * 2 - 1
        vision = rng.randn(count, 60, 35).astype(np.float32) + sign[:, None, None] * 0.5
        audio = rng.randn(count, 60, 74).astype(np.float32) + sign[:, None, None] * 0.5
        text = [_sentence(rng, _SENT_WORDS[int(s > 0)]) for s in sign]
        labels = (sign * (0.5 + rng.rand(count) * 2.5)).astype(np.float32)[:, None]
        return {"vision": vision, "audio": audio, "text": text, "labels": labels}

    data = {"train": fold(int(0.7 * n)), "valid": fold(int(0.15 * n)),
            "test": fold(n - int(0.7 * n) - int(0.15 * n))}
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "mosi_raw.pkl"), "wb") as f:
        pickle.dump(data, f)
    _write_vocab(out, _FILL + sum(_SENT_WORDS.values(), []))
    print(f"[surrogate] mosi: {n} clips -> {out}/mosi_raw.pkl")


FAMILIES = {
    "avmnist": gen_avmnist,
    "mmimdb": gen_mmimdb,
    "mmimdb_ext": gen_mmimdb_ext,
    "mimic": gen_mimic,
    "mmhs150": gen_mmhs150,
    "multioff": gen_multioff,
    "memotion": gen_memotion,
    "pnlp": gen_pnlp,
    "mosi": gen_mosi,
}


def generate(family: str, out: str, n: int | None = None, seed: int = 0) -> None:
    if family not in FAMILIES:
        raise ValueError(f"unknown family {family!r}; pick one of "
                         f"{sorted(FAMILIES)} (or 'all')")
    kwargs = {"seed": seed}
    if n is not None:
        kwargs["n"] = n
    FAMILIES[family](out, **kwargs)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("family", choices=sorted(FAMILIES) + ["all"])
    ap.add_argument("--out", required=True)
    ap.add_argument("-n", type=int, default=None,
                    help="sample count (per-family default otherwise)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if args.family == "all":
        for fam in sorted(FAMILIES):
            generate(fam, os.path.join(args.out, fam), n=args.n, seed=args.seed)
    else:
        generate(args.family, args.out, n=args.n, seed=args.seed)


if __name__ == "__main__":
    main()
