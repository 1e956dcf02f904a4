"""Metric semantics cross-checked against scikit-learn."""

import numpy as np
from sklearn import metrics as skm

from m2mixer_tpu.training.metrics import (
    AUROC,
    Accuracy,
    AveragePrecision,
    F1Score,
    Precision,
    Recall,
)

RNG = np.random.RandomState(0)


class TestMulticlass:
    preds = RNG.randint(0, 5, 200)
    labels = RNG.randint(0, 5, 200)

    def _check(self, metric_cls, sk_fn, average):
        m = metric_cls(task="multiclass", num_classes=5, average=average)
        m.update(self.preds, self.labels)
        ours = m.compute()
        theirs = sk_fn(self.labels, self.preds, average=average, zero_division=0,
                       labels=list(range(5)))
        assert abs(ours - theirs) < 1e-9, (ours, theirs)

    def test_f1_macro(self):
        self._check(F1Score, skm.f1_score, "macro")

    def test_f1_micro(self):
        self._check(F1Score, skm.f1_score, "micro")

    def test_f1_weighted(self):
        self._check(F1Score, skm.f1_score, "weighted")

    def test_precision_recall_macro(self):
        self._check(Precision, skm.precision_score, "macro")
        self._check(Recall, skm.recall_score, "macro")

    def test_accuracy(self):
        m = Accuracy(task="multiclass", num_classes=5)
        m.update(self.preds, self.labels)
        assert abs(m.compute() - skm.accuracy_score(self.labels, self.preds)) < 1e-9

    def test_accuracy_from_probs(self):
        probs = RNG.rand(100, 5)
        labels = RNG.randint(0, 5, 100)
        m = Accuracy(task="multiclass", num_classes=5)
        m.update(probs, labels)
        assert abs(m.compute() - skm.accuracy_score(labels, probs.argmax(-1))) < 1e-9


class TestMultilabel:
    preds = RNG.randint(0, 2, (80, 23))
    labels = RNG.randint(0, 2, (80, 23))

    def test_f1_weighted_and_macro(self):
        for avg in ("weighted", "macro"):
            m = F1Score(task="multilabel", num_labels=23, average=avg)
            m.update(self.preds, self.labels)
            theirs = skm.f1_score(self.labels, self.preds, average=avg, zero_division=0)
            assert abs(m.compute() - theirs) < 1e-9


class TestBinaryRank:
    scores = RNG.rand(300)
    labels = (RNG.rand(300) > 0.6).astype(int)

    def test_auroc_exact(self):
        m = AUROC(task="binary")
        m.update(self.scores, self.labels)
        assert abs(m.compute() - skm.roc_auc_score(self.labels, self.scores)) < 1e-9

    def test_average_precision_exact(self):
        m = AveragePrecision(task="binary")
        m.update(self.scores, self.labels)
        assert abs(m.compute() - skm.average_precision_score(self.labels, self.scores)) < 1e-9

    def test_multiclass_ap_macro(self):
        probs = RNG.rand(200, 4)
        probs /= probs.sum(-1, keepdims=True)
        labels = RNG.randint(0, 4, 200)
        m = AveragePrecision(task="multiclass", num_classes=4, average="macro")
        m.update(probs, labels)
        onehot = np.eye(4)[labels]
        theirs = np.mean([skm.average_precision_score(onehot[:, k], probs[:, k])
                          for k in range(4)])
        assert abs(m.compute() - theirs) < 1e-9

    def test_binary_threshold_metrics(self):
        preds = (self.scores > 0.5).astype(int)
        for metric_cls, sk in ((F1Score, skm.f1_score), (Precision, skm.precision_score),
                               (Recall, skm.recall_score)):
            m = metric_cls(task="binary")
            m.update(self.scores, self.labels)  # float -> thresholded at 0.5
            assert abs(m.compute() - sk(self.labels, preds, zero_division=0)) < 1e-9


class TestRankMetricAveraging:
    """`average=` is honored for multiclass AUROC/AP (weighted = support-
    weighted one-vs-rest, matching torchmetrics/sklearn)."""

    def _data(self):
        rng = np.random.RandomState(3)
        probs = rng.rand(300, 4)
        probs /= probs.sum(-1, keepdims=True)
        labels = rng.choice(4, 300, p=[0.55, 0.25, 0.15, 0.05])  # skewed support
        return probs, labels

    def test_multiclass_auroc_weighted(self):
        probs, labels = self._data()
        m = AUROC(task="multiclass", num_classes=4, average="weighted")
        m.update(probs, labels)
        theirs = skm.roc_auc_score(labels, probs, multi_class="ovr", average="weighted")
        assert abs(m.compute() - theirs) < 1e-9

    def test_multiclass_ap_weighted(self):
        probs, labels = self._data()
        m = AveragePrecision(task="multiclass", num_classes=4, average="weighted")
        m.update(probs, labels)
        onehot = np.eye(4)[labels]
        support = np.bincount(labels, minlength=4)
        per = np.array([skm.average_precision_score(onehot[:, k], probs[:, k])
                        for k in range(4)])
        theirs = float((per * support).sum() / support.sum())
        assert abs(m.compute() - theirs) < 1e-9

    def test_multiclass_micro_rejected(self):
        m = AUROC(task="multiclass", num_classes=4, average="micro")
        m.update(np.eye(4)[[0, 1, 2, 3]], np.arange(4))
        import pytest

        with pytest.raises(ValueError):
            m.compute()
