"""Host control-flow semantics: early stopping, plateau LR, checkpoints."""

import numpy as np

from m2mixer_tpu.training.callbacks import (
    CheckpointManager,
    EarlyStopping,
    ReduceLROnPlateau,
)


class TestEarlyStopping:
    def test_stops_after_patience(self):
        es = EarlyStopping(patience=3)
        assert not es.update({"val_loss": 1.0})
        assert not es.update({"val_loss": 0.9})  # improves, wait resets
        assert not es.update({"val_loss": 0.95})
        assert not es.update({"val_loss": 0.95})
        assert es.update({"val_loss": 0.95})  # 3rd bad epoch -> stop
        assert es.should_stop

    def test_equal_value_counts_as_no_improvement(self):
        # Lightning min_delta=0: strictly-less required
        es = EarlyStopping(patience=1)
        es.update({"val_loss": 1.0})
        assert es.update({"val_loss": 1.0})

    def test_max_mode(self):
        es = EarlyStopping(monitor="val_acc", patience=1, mode="max")
        es.update({"val_acc": 0.5})
        assert not es.update({"val_acc": 0.6})
        assert es.update({"val_acc": 0.55})


class TestReduceLROnPlateau:
    def test_torch_semantics(self):
        # factor 0.1, rel threshold 1e-4, patience 2: reduce on the 3rd
        # consecutive non-improving epoch
        sched = ReduceLROnPlateau(1e-2, patience=2)
        assert sched.update(1.0) == 1e-2
        assert sched.update(1.0) == 1e-2  # bad 1
        assert sched.update(1.0) == 1e-2  # bad 2
        assert abs(sched.update(1.0) - 1e-3) < 1e-12  # bad 3 -> reduce
        # improvement resets the counter
        assert abs(sched.update(0.5) - 1e-3) < 1e-12
        assert abs(sched.update(0.49) - 1e-3) < 1e-12  # rel improvement

    def test_rel_threshold(self):
        sched = ReduceLROnPlateau(1e-2, patience=0)
        sched.update(1.0)
        # 0.99995 is NOT better than 1.0*(1-1e-4) -> counts as bad -> reduce
        assert abs(sched.update(0.99995) - 1e-3) < 1e-12


class TestCheckpointManager:
    def test_topk_and_last_retention(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), monitor="val_loss", mode="min",
                                top_k=2, save_last=True)
        state = {"params": {"w": np.zeros(2)}, "opt_state": None,
                 "epoch": np.int32(0), "global_step": np.int64(0)}
        vals = [1.0, 0.5, 0.8, 0.4, 0.9]
        import os

        for epoch, v in enumerate(vals):
            mgr.save(epoch, state, {"val_loss": v})
        kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("epoch_"))
        # top-2 by val_loss = epochs 3 (0.4), 1 (0.5); last = epoch 4
        assert set(kept) == {"epoch_1", "epoch_3", "epoch_4"}
        assert mgr.best_path().endswith("epoch_3")
        assert mgr.last_path().endswith("epoch_4")

    def test_max_mode_best(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), monitor="val_f1", mode="max",
                                top_k=1, save_last=False)
        state = {"params": {"w": np.zeros(2)}, "opt_state": None,
                 "epoch": np.int32(0), "global_step": np.int64(0)}
        for epoch, v in enumerate([0.3, 0.7, 0.5]):
            mgr.save(epoch, state, {"val_f1": v})
        assert mgr.best_path().endswith("epoch_1")
