"""Behavioral e2e parity: the reference's math in torch vs this framework
on IDENTICAL data (m2mixer_tpu/parity.py).

The lockstep protocol — bit-identical initial weights (native init exported
through the reference-named state dict), dropout 0, the reference's own
``shuffle=False`` AV-MNIST order (`/root/reference/datasets/avmnist.py:181`),
same Adam hyperparameters — must produce near-identical per-epoch loss
curves and the SAME test accuracy. This is the strongest form of the
SURVEY §6 "metric parity within seed noise" requirement: not statistically
compatible, numerically locked."""

import os

import numpy as np


def test_lockstep_parity(tmp_path):
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment

    data = str(tmp_path / "avmnist")
    # 384 -> train split 352 = 11 full batches of 32, val exactly one batch:
    # both frameworks see identical batch boundaries (no drop-last ambiguity)
    generate("avmnist", data, n=384)
    res = lockstep_experiment(data, str(tmp_path), epochs=3)

    nv = np.asarray(res["native"]["history"]["val_loss"])
    tv = np.asarray(res["torch"]["history"]["val_loss"])
    ntr = np.asarray(res["native"]["history"]["train_loss"])
    ttr = np.asarray(res["torch"]["history"]["train_loss"])
    assert nv.shape == tv.shape == (3,)
    # float-reassociation noise only (measured |d| ~1e-6 on CPU); 1e-3 gives
    # headroom for backend-dependent reductions without ever letting a real
    # math divergence through
    assert np.abs(nv - tv).max() < 1e-3, (nv, tv)
    assert np.abs(ntr - ttr).max() < 1e-3, (ntr, ttr)
    # the two frameworks pick the same best epoch and score identically
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert res["native"]["test_acc"] == res["torch"]["test_acc"]
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 1e-6
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3
