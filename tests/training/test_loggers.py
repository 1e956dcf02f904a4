"""ExperimentLogger: versioned run dirs (atomic claim, gap handling),
JSONL/summary artifacts."""

import json
import os

from m2mixer_tpu.training.loggers import ExperimentLogger


def test_version_dirs_increment(tmp_path):
    a = ExperimentLogger(str(tmp_path), "run")
    b = ExperimentLogger(str(tmp_path), "run")
    assert a.version == 0 and b.version == 1
    assert a.log_dir != b.log_dir
    a.close(), b.close()


def test_version_gap_does_not_collide(tmp_path):
    """A deleted older version leaves a gap; numbering continues past the
    highest survivor instead of re-claiming (len()-based counting collided
    here)."""
    base = tmp_path / "run"
    os.makedirs(base / "version_0")
    os.makedirs(base / "version_2")
    lg = ExperimentLogger(str(tmp_path), "run")
    assert lg.version == 3
    lg.close()


def test_concurrent_claim_retries(tmp_path):
    """If the computed version dir appears between scan and claim (another
    process won the race), the logger retries with the next number instead
    of sharing the directory."""
    lg0 = ExperimentLogger(str(tmp_path), "run")
    os.makedirs(tmp_path / "run" / "version_1")  # racing process's claim
    lg = ExperimentLogger(str(tmp_path), "run")
    assert lg.version == 2
    lg0.close(), lg.close()


def test_jsonl_and_summary_artifacts(tmp_path):
    lg = ExperimentLogger(str(tmp_path), "run", config={"a": 1})
    lg.log({"train_loss": 1.5}, step=3)
    lg.set_summary("best_val_loss", 0.25)
    lg.close()
    with open(os.path.join(lg.log_dir, "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["train_loss"] == 1.5 and rec["step"] == 3
    with open(os.path.join(lg.log_dir, "summary.json")) as f:
        assert json.load(f)["best_val_loss"] == 0.25
    with open(os.path.join(lg.log_dir, "config.json")) as f:
        assert json.load(f)["a"] == 1
