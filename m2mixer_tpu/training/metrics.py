"""Metrics with torchmetrics-compatible semantics.

The reference scores every task with torchmetrics objects
(`/root/reference/models/avmnist.py:366-380`, `mmimdb.py:184-192`,
`mimic.py:162-181`, `mmhs150.py:172-189`). This module reproduces those
semantics (macro/micro/weighted averaging, 0/0 -> 0 zero-division, exact
AUROC / average-precision) as small stateful accumulators over host numpy
arrays. Epoch volumes here are tiny (<=100k scalars), so host accumulation
costs nothing; the hot path (the train step) never touches these.

The constructor mirrors torchmetrics' (``task=``, ``num_classes=``,
``num_labels=``, ``average=``) so task models read the same as the
reference's ``setup_scores``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

__all__ = [
    "Accuracy",
    "F1Score",
    "Precision",
    "Recall",
    "AUROC",
    "AveragePrecision",
    "CalibrationError",
    "MeanAbsoluteError",
    "MeanSquaredError",
    "PearsonCorrCoef",
    "SignAccuracy",
    "confusion_matrix",
]


def _to_numpy(x):
    return np.asarray(x)


def confusion_matrix(preds: np.ndarray, labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Dense KxK confusion matrix; rows = true class, cols = predicted."""
    idx = labels.astype(np.int64) * num_classes + preds.astype(np.int64)
    return np.bincount(idx, minlength=num_classes * num_classes).reshape(num_classes, num_classes)


def _safe_div(a, b):
    return np.where(b > 0, a / np.maximum(b, 1), 0.0)


class _BaseMetric:
    """Accumulates (preds, labels) and computes at epoch end, then resets on
    ``compute()``-after-``reset()`` cycles driven by the trainer."""

    #: rank-based metrics set this; the trainer then feeds probabilities
    #: (aux['probs']) instead of thresholded predictions when available
    wants_scores = False

    def __init__(self, task: str = "multiclass", num_classes: Optional[int] = None,
                 num_labels: Optional[int] = None, average: str = "micro",
                 threshold: float = 0.5, **kwargs):
        if task not in ("multiclass", "multilabel", "binary"):
            raise ValueError(f"Unsupported task: {task}")
        self.task = task
        self.num_classes = num_classes
        self.num_labels = num_labels
        self.average = average
        self.threshold = threshold
        self._preds: List[np.ndarray] = []
        self._labels: List[np.ndarray] = []

    def update(self, preds, labels):
        self._preds.append(_to_numpy(preds))
        self._labels.append(_to_numpy(labels))

    def __call__(self, preds, labels):
        """torchmetrics forward semantics: update state, return batch value."""
        batch = type(self)(task=self.task, num_classes=self.num_classes,
                           num_labels=self.num_labels, average=self.average,
                           threshold=self.threshold)
        batch.update(preds, labels)
        self.update(preds, labels)
        return batch.compute()

    def reset(self):
        self._preds = []
        self._labels = []

    def _gather(self):
        preds = np.concatenate(self._preds) if self._preds else np.zeros((0,))
        labels = np.concatenate(self._labels) if self._labels else np.zeros((0,))
        return preds, labels

    # -- stats ------------------------------------------------------------
    def _binarize(self, preds):
        if preds.dtype.kind == "f" and (self.task in ("binary", "multilabel")):
            # float inputs are probabilities/logits-after-sigmoid -> threshold
            return (preds >= self.threshold).astype(np.int64)
        return preds.astype(np.int64)

    def _tp_fp_fn_tn(self):
        """Per-class TP/FP/FN/TN for the configured task."""
        preds, labels = self._gather()
        if self.task == "multiclass":
            if preds.ndim == labels.ndim + 1:  # probs/logits -> class ids
                preds = preds.argmax(-1)
            cm = confusion_matrix(preds.astype(np.int64), labels.astype(np.int64), self.num_classes)
            tp = np.diag(cm).astype(np.float64)
            fp = cm.sum(axis=0) - tp
            fn = cm.sum(axis=1) - tp
            tn = cm.sum() - tp - fp - fn
            support = cm.sum(axis=1)
            return tp, fp, fn, tn, support
        if self.task == "multilabel":
            p = self._binarize(preds).reshape(-1, self.num_labels)
            t = labels.reshape(-1, self.num_labels).astype(np.int64)
            tp = (p * t).sum(axis=0).astype(np.float64)
            fp = (p * (1 - t)).sum(axis=0).astype(np.float64)
            fn = ((1 - p) * t).sum(axis=0).astype(np.float64)
            tn = ((1 - p) * (1 - t)).sum(axis=0).astype(np.float64)
            return tp, fp, fn, tn, t.sum(axis=0)
        # binary
        p = self._binarize(preds).reshape(-1)
        t = labels.reshape(-1).astype(np.int64)
        tp = np.array([float((p * t).sum())])
        fp = np.array([float((p * (1 - t)).sum())])
        fn = np.array([float(((1 - p) * t).sum())])
        tn = np.array([float(((1 - p) * (1 - t)).sum())])
        return tp, fp, fn, tn, np.array([t.sum()])

    def _average(self, per_class, tp, fp, fn, support, micro_fn):
        if self.task == "binary":
            return float(per_class[0])
        if self.average == "macro":
            return float(per_class.mean())
        if self.average == "weighted":
            total = support.sum()
            return float((per_class * support).sum() / total) if total > 0 else 0.0
        # micro
        return float(micro_fn(tp.sum(), fp.sum(), fn.sum()))


class Accuracy(_BaseMetric):
    def compute(self) -> float:
        preds, labels = self._gather()
        if preds.size == 0:
            return 0.0
        if self.task == "multiclass":
            if preds.ndim == labels.ndim + 1:
                preds = preds.argmax(-1)
            return float((preds.astype(np.int64) == labels.astype(np.int64)).mean())
        p = self._binarize(preds)
        return float((p == labels.astype(np.int64)).mean())


class Precision(_BaseMetric):
    def compute(self) -> float:
        tp, fp, fn, tn, support = self._tp_fp_fn_tn()
        per_class = _safe_div(tp, tp + fp)
        return self._average(per_class, tp, fp, fn, support,
                             lambda TP, FP, FN: _safe_div(TP, TP + FP))


class Recall(_BaseMetric):
    def compute(self) -> float:
        tp, fp, fn, tn, support = self._tp_fp_fn_tn()
        per_class = _safe_div(tp, tp + fn)
        return self._average(per_class, tp, fp, fn, support,
                             lambda TP, FP, FN: _safe_div(TP, TP + FN))


class F1Score(_BaseMetric):
    def compute(self) -> float:
        tp, fp, fn, tn, support = self._tp_fp_fn_tn()
        per_class = _safe_div(2 * tp, 2 * tp + fp + fn)
        return self._average(per_class, tp, fp, fn, support,
                             lambda TP, FP, FN: _safe_div(2 * TP, 2 * TP + FP + FN))


def _binary_auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact AUROC via the rank statistic (ties get average rank)."""
    pos = labels == 1
    n_pos = int(pos.sum())
    n_neg = int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        return 0.0
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_scores = scores[order]
    # average ranks over tie groups
    i = 0
    n = len(scores)
    base = np.arange(1, n + 1, dtype=np.float64)
    while i < n:
        j = i
        while j + 1 < n and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = base[i : j + 1].mean()
        i = j + 1
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def _binary_average_precision(scores: np.ndarray, labels: np.ndarray) -> float:
    """Exact AP = sum_n (R_n - R_{n-1}) P_n over the ranked list."""
    n_pos = int((labels == 1).sum())
    if n_pos == 0:
        return 0.0
    order = np.argsort(-scores, kind="mergesort")
    sorted_labels = labels[order]
    tp_cum = np.cumsum(sorted_labels == 1)
    precision = tp_cum / np.arange(1, len(labels) + 1)
    return float((precision * (sorted_labels == 1)).sum() / n_pos)


def _ovr_average(vals: np.ndarray, labels: np.ndarray, num_classes: int,
                 average: str) -> float:
    """torchmetrics multiclass rank-metric averaging: 'macro' (plain mean)
    or 'weighted' (per-class support weights); 'micro' is not defined for
    multiclass AUROC/AP in torchmetrics and is rejected the same way."""
    if average == "macro":
        return float(vals.mean())
    if average == "weighted":
        support = np.bincount(labels, minlength=num_classes).astype(np.float64)
        total = support.sum()
        return float((vals * support).sum() / total) if total > 0 else 0.0
    raise ValueError(f"average={average!r} is not supported for multiclass "
                     "rank metrics (torchmetrics allows macro/weighted)")


class AUROC(_BaseMetric):
    """Exact AUROC. For binary: pass probabilities/logits (monotonic
    invariant). For multiclass: one-vs-rest averaged per ``average``."""

    wants_scores = True

    def __init__(self, *args, average: str = "macro", **kwargs):
        super().__init__(*args, average=average, **kwargs)

    def compute(self) -> float:
        scores, labels = self._gather()
        if scores.size == 0:
            return 0.0
        if self.task == "binary":
            return _binary_auroc(scores.reshape(-1).astype(np.float64),
                                 labels.reshape(-1).astype(np.int64))
        scores = scores.reshape(-1, self.num_classes)
        labels = labels.reshape(-1).astype(np.int64)
        vals = np.array([
            _binary_auroc(scores[:, k], (labels == k).astype(np.int64))
            for k in range(self.num_classes)
        ])
        return _ovr_average(vals, labels, self.num_classes, self.average)


class AveragePrecision(_BaseMetric):
    """Exact AP; multiclass = one-vs-rest, averaged per ``average``."""

    wants_scores = True

    def __init__(self, *args, average: str = "macro", **kwargs):
        super().__init__(*args, average=average, **kwargs)

    def compute(self) -> float:
        scores, labels = self._gather()
        if scores.size == 0:
            return 0.0
        if self.task == "binary":
            return _binary_average_precision(scores.reshape(-1).astype(np.float64),
                                             labels.reshape(-1).astype(np.int64))
        scores = scores.reshape(-1, self.num_classes)
        labels = labels.reshape(-1).astype(np.int64)
        vals = np.array([
            _binary_average_precision(scores[:, k], (labels == k).astype(np.int64))
            for k in range(self.num_classes)
        ])
        return _ovr_average(vals, labels, self.num_classes, self.average)


class CalibrationError(_BaseMetric):
    """Top-label calibration error, torchmetrics ``CalibrationError``
    semantics: ``n_bins`` equal-width confidence bins over [0, 1];
    ``norm='l1'`` is the standard ECE (bin-proportion-weighted |acc - conf|),
    ``'l2'`` the RMS variant, ``'max'`` the worst bin (MCE).

    multiclass: confidence = max predicted probability, hit = argmax == label.
    binary: confidence = max(p, 1-p), hit = (p >= 0.5) == label.
    Feeds from probabilities (``wants_scores``), like AUROC/AP.
    """

    wants_scores = True

    def __init__(self, *args, n_bins: int = 15, norm: str = "l1", **kwargs):
        super().__init__(*args, **kwargs)
        if norm not in ("l1", "l2", "max"):
            raise ValueError(f"norm={norm!r} — expected l1 | l2 | max")
        if int(n_bins) < 1:
            raise ValueError(f"n_bins={n_bins} — expected >= 1")
        self.n_bins = int(n_bins)
        self.norm = norm

    def __call__(self, preds, labels):
        batch = CalibrationError(task=self.task, num_classes=self.num_classes,
                                 n_bins=self.n_bins, norm=self.norm)
        batch.update(preds, labels)
        self.update(preds, labels)
        return batch.compute()

    def compute(self) -> float:
        scores, labels = self._gather()
        if scores.size == 0:
            return 0.0
        labels = labels.reshape(-1).astype(np.int64)
        if self.task == "binary":
            p = scores.reshape(-1).astype(np.float64)
            conf = np.maximum(p, 1.0 - p)
            hit = ((p >= 0.5).astype(np.int64) == labels)
        elif self.task == "multiclass":
            p = scores.reshape(-1, self.num_classes).astype(np.float64)
            conf = p.max(axis=1)
            hit = (p.argmax(axis=1) == labels)
        else:
            raise ValueError("CalibrationError supports binary/multiclass "
                             "(torchmetrics has no multilabel variant)")
        edges = np.linspace(0.0, 1.0, self.n_bins + 1)
        idx = np.clip(np.searchsorted(edges[1:-1], conf, side="right"),
                      0, self.n_bins - 1)
        n_b = np.bincount(idx, minlength=self.n_bins).astype(np.float64)
        conf_b = _safe_div(np.bincount(idx, weights=conf,
                                       minlength=self.n_bins), n_b)
        acc_b = _safe_div(np.bincount(idx, weights=hit.astype(np.float64),
                                      minlength=self.n_bins), n_b)
        gap = np.abs(acc_b - conf_b)
        prop = n_b / conf.size
        if self.norm == "l1":
            return float((gap * prop).sum())
        if self.norm == "max":
            return float(gap.max())
        return float(np.sqrt(((acc_b - conf_b) ** 2 * prop).sum()))


# ---------------------------------------------------------------- regression
class _RegressionMetric:
    """Accumulator over float (preds, targets) pairs — torchmetrics
    regression surface (MeanAbsoluteError / MeanSquaredError /
    PearsonCorrCoef) for affect-style tasks (e.g. CMU-MOSI scores)."""

    wants_scores = False

    def __init__(self, **kwargs):
        self._preds: List[np.ndarray] = []
        self._labels: List[np.ndarray] = []

    def update(self, preds, labels):
        self._preds.append(np.asarray(preds, np.float64).reshape(-1))
        self._labels.append(np.asarray(labels, np.float64).reshape(-1))

    def reset(self):
        self._preds = []
        self._labels = []

    def _gather(self):
        if not self._preds:
            return np.zeros((0,)), np.zeros((0,))
        return np.concatenate(self._preds), np.concatenate(self._labels)

    def __call__(self, preds, labels):
        import copy

        batch = copy.copy(self)  # keeps config attrs (e.g. MSE's squared)
        batch._preds, batch._labels = [], []
        batch.update(preds, labels)
        self.update(preds, labels)
        return batch.compute()


class MeanAbsoluteError(_RegressionMetric):
    def compute(self) -> float:
        p, t = self._gather()
        return float(np.abs(p - t).mean()) if p.size else 0.0


class MeanSquaredError(_RegressionMetric):
    def __init__(self, squared: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.squared = squared  # torchmetrics: squared=False -> RMSE

    def compute(self) -> float:
        p, t = self._gather()
        if not p.size:
            return 0.0
        mse = float(((p - t) ** 2).mean())
        return mse if self.squared else float(np.sqrt(mse))


class PearsonCorrCoef(_RegressionMetric):
    def compute(self) -> float:
        p, t = self._gather()
        if p.size < 2 or p.std() == 0 or t.std() == 0:
            return 0.0
        return float(np.corrcoef(p, t)[0, 1])


class SignAccuracy(_RegressionMetric):
    """CMU-MOSI 'Acc-2' from regression outputs: sign agreement with the
    true score, evaluated over nonzero-labeled samples (the standard
    binary-sentiment protocol on top of a regression head)."""

    def compute(self) -> float:
        p, t = self._gather()
        mask = t != 0
        if not mask.any():
            return 0.0
        return float(((p[mask] > 0) == (t[mask] > 0)).mean())
