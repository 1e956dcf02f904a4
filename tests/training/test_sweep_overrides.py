"""Sweep-style dotted-override injection, end to end.

wandb sweeps drive training by appending dotted `--a.b.c=value` args to the
CLI (reference: `/root/reference/sweeps/sweep_config.yaml:1-31` expands its
nested `parameters:` tree this way, and `/root/reference/run.py:33-40`
merges them). This exercises the full path: run.build() with sweep args ->
merged config -> constructed model reflecting the overrides -> short fit.
"""

import argparse
import os

import yaml

import run as run_cli
from m2mixer_tpu.config import loads, todict

CFG = """
train:
  tensorboard_path: {tmp}/logs
  log_interval_steps: 5
  epochs: 1
  optimizer: {{lr: 1e-3, betas: [0.9, 0.999], eps: 1e-8, weight_decay: 0.0,
               scheduler_patience: 2}}
  seed: 7
  monitor: val_loss
  monitor_mode: min
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [48, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.1
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16], hidden_dims: [64, 32]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 2}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 2}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 2}}
"""


def _write_cfg(tmp_path):
    path = os.path.join(tmp_path, "sweep_base.yml")
    with open(path, "w") as f:
        yaml.safe_dump(todict(loads(CFG.format(tmp=tmp_path))), f, sort_keys=False)
    return path


def test_sweep_overrides_reach_model_and_train(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg_path = _write_cfg(str(tmp_path))
    args = argparse.Namespace(cfg=cfg_path, name="sweep_trial", ckpt=None,
                              mode="train", disable_wandb=True)
    # exactly what a wandb agent appends for sweep_config.yaml's parameters
    sweep_args = [
        "--model.modalities.image.num_mixers=1",
        "--model.modalities.audio.num_mixers=1",
        "--model.modalities.multimodal.num_mixers=1",
        "--model.dropout=0.3",
        "--train.optimizer.lr=0.002",
    ]
    cfg, task, dm, trainer = run_cli.build(args, sweep_args)

    assert cfg.model.modalities.image.num_mixers == 1
    assert cfg.model.dropout == 0.3
    assert cfg.train.optimizer.lr == 0.002

    trainer.fit(task, dm)
    # override depth 1 -> exactly one mixer block in the image encoder params
    img = trainer.params["params"]["encoders_0"]
    blocks = [k for k in img if k.startswith("block_")]
    assert len(blocks) == 1, blocks
    assert "val_loss" in trainer.callback_metrics
    trainer.logger.close()


def test_override_typo_guard(tmp_path, capsys):
    """A mistyped dotted override silently creates a dead key (the run then
    optimizes nothing); the CLI warns with did-you-mean suggestions."""
    from m2mixer_tpu.config import (find_new_keys, from_cli, loads,
                                    warn_unknown_overrides)

    cfg = loads(CFG.format(tmp=tmp_path))
    # typo'd section member + a genuinely new optional feature key
    ovr = from_cli(["train.optimzer.lr=1e-2", "model.paired_encoders=true",
                    "model.dropout=0.2"])
    new = find_new_keys(cfg, ovr)
    assert new == ["train.optimzer", "model.paired_encoders"]  # not dropout
    # a new subtree is reported once, not per leaf
    assert "train.optimzer.lr" not in new

    warned = warn_unknown_overrides(cfg, ovr)
    assert warned == new
    err = capsys.readouterr().err
    assert "train.optimzer" in err
    assert "did you mean: optimizer" in err  # sibling-key suggestion

    # run.py surfaces the warning on its real override path
    cfg_path = _write_cfg(str(tmp_path))
    args = argparse.Namespace(cfg=cfg_path, name="typo_trial", ckpt=None,
                              mode="train", disable_wandb=True)
    _, _, _, trainer = run_cli.build(args, ["--train.optimzer.lr=1e-2"])
    trainer.logger.close()
    assert "train.optimzer" in capsys.readouterr().err


def test_local_sweep_parses_shipped_files():
    """The local executor understands both shipped wandb sweep formats
    (flat dotted names and nested `parameters:` trees)."""
    from m2mixer_tpu.sweep import parse_sweep

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    flat = parse_sweep(os.path.join(repo, "sweeps", "avmnist_mixer.yaml"))
    assert flat["cfg"].endswith("avmnist_m2-mixer_S.yml")
    assert flat["metric"] == "val_loss" and flat["goal"] == "minimize"
    assert "train.optimizer.lr" in flat["parameters"]
    assert flat["parameters"]["model.dropout"]["values"] == [0.0, 0.1, 0.3, 0.5]

    nested = parse_sweep(os.path.join(repo, "sweeps", "sweep_config.yaml"))
    assert "model.modalities.image.num_mixers" in nested["parameters"]
    assert nested["cfg"].endswith("mmimdb_3loss.yml")


def test_local_sweep_sampling_and_grid():
    import numpy as np
    import pytest

    from m2mixer_tpu.sweep import sample_value, trial_params

    rng = np.random.RandomState(0)
    for _ in range(20):
        assert sample_value({"values": [1, 2, 3]}, rng) in (1, 2, 3)
        u = sample_value({"distribution": "uniform", "min": 0.2, "max": 0.9}, rng)
        assert 0.2 <= u <= 0.9
        lg = sample_value({"distribution": "log_uniform_values",
                           "min": 1e-4, "max": 1e-1}, rng)
        assert 1e-4 <= lg <= 1e-1
        iu = sample_value({"distribution": "int_uniform", "min": 1, "max": 4}, rng)
        assert isinstance(iu, int) and 1 <= iu <= 4

    grid_sweep = {"method": "grid", "parameters": {
        "a": {"values": [1, 2]}, "b": {"values": [10, 20, 30]}}}
    combos = list(trial_params(grid_sweep, None))
    assert len(combos) == 6
    assert {"a": 2, "b": 30} in combos
    assert len(list(trial_params(grid_sweep, 4))) == 4  # capped

    bad = {"method": "grid", "parameters": {
        "a": {"distribution": "uniform", "min": 0, "max": 1}}}
    with pytest.raises(ValueError, match="grid sweeps need"):
        list(trial_params(bad, None))

    rnd = {"method": "random", "parameters": {"a": {"values": [1, 2]}}}
    assert len(list(trial_params(rnd, 7))) == 7
    assert list(trial_params(rnd, 0)) == []  # --trials 0 really means zero

    # wandb semantics: int min/max without a distribution infer int_uniform
    for _ in range(10):
        v = sample_value({"min": 2, "max": 8}, rng)
        assert isinstance(v, int) and 2 <= v <= 8
    # q quantizes to multiples (q_uniform)
    for _ in range(10):
        v = sample_value({"distribution": "q_uniform", "min": 0, "max": 64,
                          "q": 8}, rng)
        assert v % 8 == 0 and 0 <= v <= 64


def test_local_sweep_malformed_command():
    import pytest
    import yaml as _yaml

    from m2mixer_tpu.sweep import parse_sweep

    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".yml", delete=False) as f:
        _yaml.safe_dump({"method": "random",
                         "parameters": {"a": {"values": [1]}},
                         "command": ["python", "run.py", "-c"]}, f)
        path = f.name
    with pytest.raises(ValueError, match="no config path"):
        parse_sweep(path)


def test_local_sweep_end_to_end(tmp_path):
    """Grid sweep over 2 configurations through the real trainer; results
    ranked by best-epoch val_loss, artifacts written."""
    import json

    from m2mixer_tpu.sweep import run_sweep

    cfg_path = _write_cfg(str(tmp_path))
    sweep_path = os.path.join(tmp_path, "sweep.yml")
    with open(sweep_path, "w") as f:
        yaml.safe_dump({
            "method": "grid",
            "metric": {"name": "val_loss", "goal": "minimize"},
            "command": ["python", "run.py", "-c", cfg_path],
            "parameters": {
                "model": {"parameters": {"dropout": {"values": [0.0, 0.4]}}},
            },
        }, f)
    out = run_sweep(sweep_path, out_dir=os.path.join(tmp_path, "out"),
                    epochs=1, verbose=False)
    assert len(out["results"]) == 2
    assert out["best"] in out["results"]
    assert out["best"]["value"] == min(r["value"] for r in out["results"])
    lines = open(os.path.join(tmp_path, "out", "sweep_results.jsonl")).read().splitlines()
    assert len(lines) == 2 and json.loads(lines[0])["trial"] == 0
    assert os.path.exists(os.path.join(tmp_path, "out", "sweep_summary.json"))


def test_shipped_sweep_files_expand_to_valid_overrides():
    """Both shipped sweep files' parameter trees map onto live config keys."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def flatten(tree, prefix=""):
        # wandb nested-`parameters:` -> dotted names
        out = []
        for k, v in tree.items():
            if isinstance(v, dict) and "parameters" in v:
                out += flatten(v["parameters"], f"{prefix}{k}.")
            else:
                out.append(f"{prefix}{k}")
        return out

    for fname in ("sweep_config.yaml", "avmnist_mixer.yaml"):
        with open(os.path.join(repo, "sweeps", fname)) as f:
            sweep = yaml.safe_load(f)
        dotted = flatten(sweep["parameters"])
        assert dotted, fname
        cfg_arg = sweep["command"][sweep["command"].index("-c") + 1]
        from m2mixer_tpu.config import load

        cfg = load(os.path.join(repo, cfg_arg))
        for name in dotted:
            # every parent node must already exist in the target config;
            # the leaf itself may be a new optional key (deep_update adds it)
            node = cfg
            for part in name.split(".")[:-1]:
                assert part in node, (fname, name)
                node = node[part]


# ------------------------------------------------------------- TPE (bayes)
def test_tpe_concentrates_on_continuous_optimum():
    """Sequential TPE on |x - 0.2| over uniform [0, 1]: after 5 random
    warmup trials the proposals concentrate around 0.2 and the best trial
    beats a same-seed/same-budget pure-random search by an order of
    magnitude (calibrated offline: 2.4e-4 vs 5.7e-2)."""
    import numpy as np

    from m2mixer_tpu.sweep import sample_value, tpe_propose

    spec = {"x": {"distribution": "uniform", "min": 0.0, "max": 1.0}}
    rng = np.random.RandomState(0)
    obs = []
    for _ in range(40):
        if len(obs) < 5:
            p = {"x": sample_value(spec["x"], rng)}
        else:
            p = tpe_propose(spec, obs, rng)
        assert 0.0 <= p["x"] <= 1.0
        obs.append((p, abs(p["x"] - 0.2)))
    best = min(loss for _, loss in obs)
    rng2 = np.random.RandomState(0)
    random_best = min(abs(sample_value(spec["x"], rng2) - 0.2)
                      for _ in range(40))
    assert best < random_best / 10, (best, random_best)
    late = [p["x"] for p, _ in obs[-15:]]
    assert np.mean([abs(x - 0.2) < 0.15 for x in late]) >= 0.8, late


def test_tpe_log_space_and_categorical():
    """Log-distributed parameters are modeled in log space (proposals land
    in the optimum's decade), and categoricals lock onto the good value via
    the smoothed count ratio."""
    import math

    import numpy as np

    from m2mixer_tpu.sweep import sample_value, tpe_propose

    spec = {"lr": {"distribution": "log_uniform_values",
                   "min": 1e-5, "max": 1e-1}}
    rng = np.random.RandomState(1)
    obs = []
    for _ in range(40):
        p = ({"lr": sample_value(spec["lr"], rng)} if len(obs) < 5
             else tpe_propose(spec, obs, rng))
        obs.append((p, abs(math.log10(p["lr"]) + 3)))  # optimum 1e-3
    late = [p["lr"] for p, _ in obs[-15:]]
    assert np.mean([1e-4 <= v <= 1e-2 for v in late]) >= 0.8, late

    cat = {"c": {"values": ["a", "b", "c"]}}
    cat_obs = [({"c": "a"}, 0.1), ({"c": "a"}, 0.12), ({"c": "b"}, 1.0),
               ({"c": "c"}, 1.1), ({"c": "b"}, 0.9), ({"c": "a"}, 0.11),
               ({"c": "c"}, 1.2), ({"c": "b"}, 1.05)]
    rng = np.random.RandomState(2)
    picks = [tpe_propose(cat, cat_obs, rng)["c"] for _ in range(50)]
    assert picks.count("a") >= 45, picks.count("a")


def test_tpe_respects_spec_shapes_and_edges():
    """int specs return in-bounds ints, q specs quantize, constant `value`
    passes through, a parameter missing from every observation still draws
    in-bounds, and a single observation is enough to propose."""
    import numpy as np
    import pytest

    from m2mixer_tpu.sweep import tpe_propose

    spec = {"n": {"distribution": "int_uniform", "min": 1, "max": 8},
            "qd": {"distribution": "q_uniform", "min": 0, "max": 64, "q": 8}}
    obs = [({"n": n, "qd": q}, abs(n - 3) + abs(q - 16) / 8)
           for n in (1, 3, 5, 7) for q in (0, 16, 32, 64)]
    rng = np.random.RandomState(3)
    for _ in range(10):
        p = tpe_propose(spec, obs, rng)
        assert isinstance(p["n"], int) and 1 <= p["n"] <= 8, p
        assert p["qd"] % 8 == 0 and 0 <= p["qd"] <= 64, p

    mixed = {"x": {"distribution": "uniform", "min": 0, "max": 1},
             "k": {"value": 42}, "m": {"values": [1, 2]}}
    p = tpe_propose(mixed, [({"x": 0.5, "m": 1}, 1.0)],
                    np.random.RandomState(4))
    assert p["k"] == 42 and p["m"] in (1, 2) and 0 <= p["x"] <= 1
    p = tpe_propose(mixed, [({"x": 0.5}, 1.0)], np.random.RandomState(5))
    assert p["m"] in (1, 2)  # absent from obs -> prior draw
    with pytest.raises(ValueError, match="observation"):
        tpe_propose(mixed, [], np.random.RandomState(6))


def test_local_sweep_bayes_end_to_end(tmp_path):
    """`method: bayes` drives real training: random warmup then TPE
    proposals (startup=2 so trial 3 is model-based), results ranked and
    written like any other sweep."""
    import json

    from m2mixer_tpu.sweep import run_sweep

    cfg_path = _write_cfg(str(tmp_path))
    sweep_path = os.path.join(tmp_path, "sweep_bayes.yml")
    with open(sweep_path, "w") as f:
        yaml.safe_dump({
            "method": "bayes",
            "metric": {"name": "val_loss", "goal": "minimize"},
            "command": ["python", "run.py", "-c", cfg_path],
            "parameters": {
                "model": {"parameters": {"dropout": {
                    "distribution": "uniform", "min": 0.0, "max": 0.5}}},
            },
        }, f)
    out = run_sweep(sweep_path, trials=3, startup=2,
                    out_dir=os.path.join(tmp_path, "out"),
                    epochs=1, verbose=False)
    assert len(out["results"]) == 3
    for r in out["results"]:
        assert 0.0 <= r["params"]["model.dropout"] <= 0.5
    assert out["best"]["value"] == min(r["value"] for r in out["results"])
    lines = open(os.path.join(
        tmp_path, "out", "sweep_results.jsonl")).read().splitlines()
    assert len(lines) == 3 and json.loads(lines[2])["trial"] == 2


# ---------------------------------------------------- hyperband early stop
def test_hyperband_bands():
    from m2mixer_tpu.sweep import hyperband_bands

    assert hyperband_bands({"min_iter": 1}, 3)[:4] == [1, 3, 9, 27]
    assert hyperband_bands({"min_iter": 2}, 2)[:4] == [2, 4, 8, 16]
    assert hyperband_bands({"max_iter": 27, "s": 3}, 3) == [1, 3, 9]
    import pytest

    with pytest.raises(ValueError, match="min_iter or max_iter"):
        hyperband_bands({}, 3)


def test_hyperband_stopper_semantics():
    """wandb semantics: at a band, a trial stops when its best-so-far metric
    misses the top-1/eta cut of the trials previously seen there; the first
    ceil(eta) trials at a band are never stopped."""
    import pytest

    from m2mixer_tpu.sweep import HyperbandStopper

    st = HyperbandStopper({"type": "hyperband", "min_iter": 1, "eta": 2},
                          "val_loss", sign=1.0)

    def run_trial(val):
        hook, state = st.hook_for_trial()
        stopped = hook(0, {"val_loss": val})  # epoch 0 == band 1
        return stopped, state

    assert run_trial(1.0) == (False, {"best": 1.0, "stopped_band": None})
    assert run_trial(2.0)[0] is False       # only 1 prior: never stopped
    stopped, state = run_trial(3.0)         # cutoff = top-1/2 of [1,2] = 1.0
    assert stopped and state["stopped_band"] == 1
    assert run_trial(0.5)[0] is False       # beats the cut
    # off-band epochs never stop (bands are [1,2,4,...]; epoch 2 = band 3);
    # a missing metric is a no-op
    hook, _ = st.hook_for_trial()
    assert hook(2, {"val_loss": 99.0}) is False
    assert hook(0, {}) is False

    with pytest.raises(ValueError, match="eta"):
        HyperbandStopper({"min_iter": 1, "eta": 1.0}, "val_loss", 1.0)
    with pytest.raises(ValueError, match="hyperband"):
        HyperbandStopper({"type": "envelope", "min_iter": 1}, "val_loss", 1.0)


def test_hyperband_maximize_goal_flips_sign():
    from m2mixer_tpu.sweep import HyperbandStopper

    st = HyperbandStopper({"min_iter": 1, "eta": 2}, "val_acc", sign=-1.0)
    for acc in (0.9, 0.8):
        hook, _ = st.hook_for_trial()
        assert hook(0, {"val_acc": acc}) is False
    hook, state = st.hook_for_trial()
    assert hook(0, {"val_acc": 0.1}) is True   # far below the top half
    assert state["stopped_band"] == 1
    hook, _ = st.hook_for_trial()
    assert hook(0, {"val_acc": 0.95}) is False  # best so far survives


def test_trainer_epoch_hook_stops_fit(tmp_path):
    """The generic trainer hook ends the fit after the epoch it fires on."""
    from m2mixer_tpu.config import loads as _loads
    from m2mixer_tpu.datasets import get_data_module
    from m2mixer_tpu.models import get_model
    from m2mixer_tpu.training import Trainer

    cfg = _loads(CFG.format(tmp=tmp_path))
    cfg.train.epochs = 4
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    trainer = Trainer(cfg.train, name="hookstop", full_cfg=cfg)
    seen = []
    trainer.epoch_end_hook = lambda epoch, logs: (seen.append(epoch), True)[1]
    trainer.fit(task, dm)
    assert trainer.stopped_by_hook
    assert seen == [0]
    assert trainer.current_epoch == 0


def test_local_sweep_hyperband_e2e(tmp_path):
    """early_terminate in the sweep file flows through run_sweep: every
    result row reports its stopped_band, and disabling the block removes
    the bookkeeping."""
    import json

    from m2mixer_tpu.sweep import run_sweep

    cfg_path = _write_cfg(str(tmp_path))
    sweep_path = os.path.join(tmp_path, "sweep_hb.yml")
    with open(sweep_path, "w") as f:
        yaml.safe_dump({
            "method": "grid",
            "metric": {"name": "val_loss", "goal": "minimize"},
            "command": ["python", "run.py", "-c", cfg_path],
            "early_terminate": {"type": "hyperband", "min_iter": 1, "eta": 2},
            "parameters": {
                "model": {"parameters": {"dropout": {"values": [0.0, 0.3, 0.6]}}},
            },
        }, f)
    out = run_sweep(sweep_path, out_dir=os.path.join(tmp_path, "hb_out"),
                    epochs=2, verbose=False)
    assert len(out["results"]) == 3
    for row in out["results"]:
        assert "stopped_band" in row
    rows = [json.loads(l) for l in open(
        os.path.join(tmp_path, "hb_out", "sweep_results.jsonl"))]
    assert all("stopped_band" in r for r in rows)

    out2 = run_sweep(sweep_path, out_dir=os.path.join(tmp_path, "hb_off"),
                     epochs=1, trials=1, verbose=False, early_terminate=False)
    assert all("stopped_band" not in r for r in out2["results"])


def test_vmap_sweep_plan_validation():
    """Eligibility rules for the vmapped executor: optimizer-scalar sweeps
    pass (value:-pinned constants allowed), anything else is rejected with
    the reason, and the trial list respects method/trials."""
    import numpy as np
    import pytest

    from m2mixer_tpu.sweep import vmap_sweep_plan

    base = {"method": "grid", "metric": "val_loss", "goal": "minimize"}
    axes, consts = vmap_sweep_plan(dict(base, parameters={
        "train.optimizer.lr": {"values": [1e-3, 1e-2]},
        "model.dropout": {"value": 0.1},
    }), trials=None)
    lrs = axes["train.optimizer.lr"]
    assert lrs == [1e-3, 1e-2]
    assert consts == {"model.dropout": 0.1}

    # multi-axis grid: cross product in declaration order
    axes, _ = vmap_sweep_plan(dict(base, parameters={
        "train.optimizer.lr": {"values": [1e-3, 1e-2]},
        "train.optimizer.weight_decay": {"values": [0.0, 0.1]},
    }), trials=None)
    assert axes["train.optimizer.lr"] == [1e-3, 1e-3, 1e-2, 1e-2]
    assert axes["train.optimizer.weight_decay"] == [0.0, 0.1, 0.0, 0.1]
    # sam_rho / ema_decay are sweepable axes too
    axes, _ = vmap_sweep_plan(dict(base, parameters={
        "train.optimizer.sam_rho": {"values": [0.0, 0.05]},
        "train.optimizer.ema_decay": {"value": 0.9},
    }), trials=None)
    assert axes["train.optimizer.sam_rho"] == [0.0, 0.05]

    # trials caps the grid
    axes, _ = vmap_sweep_plan(dict(base, parameters={
        "train.optimizer.lr": {"values": [1e-3, 1e-2, 1e-1]}}), trials=2)
    assert axes["train.optimizer.lr"] == [1e-3, 1e-2]

    # a VARYING non-optimizer parameter is rejected with its name
    with pytest.raises(ValueError, match="model.dropout"):
        vmap_sweep_plan(dict(base, parameters={
            "train.optimizer.lr": {"values": [1e-3]},
            "model.dropout": {"values": [0.1, 0.2]}}), trials=None)

    # no swept axis at all
    with pytest.raises(ValueError, match="train.optimizer.lr"):
        vmap_sweep_plan(dict(base, parameters={
            "model.dropout": {"value": 0.1}}), trials=None)

    # metric must be val_loss or test_*
    with pytest.raises(ValueError, match="train_loss"):
        vmap_sweep_plan(dict(base, metric="train_loss", parameters={
            "train.optimizer.lr": {"values": [1e-3]}}), trials=None)
    vmap_sweep_plan(dict(base, metric="test_acc", parameters={
        "train.optimizer.lr": {"values": [1e-3]}}), trials=None)

    # random draws honor the distribution bounds and the trial count
    axes, _ = vmap_sweep_plan(dict(base, method="random", parameters={
        "train.optimizer.lr": {"distribution": "log_uniform_values",
                               "min": 1e-4, "max": 1e-1}}), trials=7, seed=3)
    lrs = axes["train.optimizer.lr"]
    assert len(lrs) == 7
    assert all(1e-4 <= v <= 1e-1 for v in lrs)
    assert len(set(np.round(np.log10(lrs), 6))) > 1


def test_identical_seed_member_keys():
    """identical_seeds gives every member the SAME stream (the sweep
    protocol: sequential trials share cfg.train.seed)."""
    import numpy as np

    from m2mixer_tpu.training.ensemble import _member_keys

    keys = np.asarray(_member_keys(7, 4, reseed=False, identical=True))
    assert (keys == keys[0]).all()
    distinct = np.asarray(_member_keys(7, 4, reseed=False, identical=False))
    assert not (distinct == distinct[0]).all()


def test_vmap_sweep_end_to_end(tmp_path):
    """--vmap trains every LR trial in one compiled program and ranks them:
    a sane rate must beat a divergent one, rows/artifacts match the
    sequential executor's schema, and constants reach the config."""
    import json

    import numpy as np

    from m2mixer_tpu.sweep import run_sweep

    cfg_path = _write_cfg(str(tmp_path))
    sweep_path = os.path.join(tmp_path, "sweep_vmap.yml")
    with open(sweep_path, "w") as f:
        yaml.safe_dump({
            "method": "grid",
            "metric": {"name": "val_loss", "goal": "minimize"},
            "command": ["python", "run.py", "-c", cfg_path],
            # early_terminate must be IGNORED (lockstep program), not fatal
            "early_terminate": {"type": "hyperband", "min_iter": 1},
            "parameters": {
                "train": {"parameters": {"optimizer": {"parameters": {
                    "lr": {"values": [1e-3, 25.0]}}}}},
                "model": {"parameters": {"dropout": {"value": 0.0}}},
            },
        }, f)
    out = run_sweep(sweep_path, out_dir=os.path.join(tmp_path, "vmap_out"),
                    epochs=2, verbose=False, vmap=True)
    assert out["vmap"] is True
    assert len(out["results"]) == 2
    assert out["metric"] == "val_loss"
    by_lr = {r["params"]["train.optimizer.lr"]: r["value"]
             for r in out["results"]}
    assert set(by_lr) == {1e-3, 25.0}
    assert all(np.isfinite(v) for v in by_lr.values())
    # the divergent rate must lose; best trial is the sane one
    assert by_lr[1e-3] < by_lr[25.0]
    assert out["best"]["params"]["train.optimizer.lr"] == 1e-3
    # constants recorded on every row
    assert all(r["params"]["model.dropout"] == 0.0 for r in out["results"])
    # artifacts: jsonl rows + summary json, same schema as sequential
    rows = [json.loads(l) for l in open(
        os.path.join(tmp_path, "vmap_out", "sweep_results.jsonl"))]
    assert [r["trial"] for r in rows] == [0, 1]
    assert all("best_epoch" in r for r in rows)
    summary = json.load(open(
        os.path.join(tmp_path, "vmap_out", "sweep_summary.json")))
    assert summary["best"] == out["best"]


def test_vmap_sweep_rejects_non_lr(tmp_path):
    """A sweep varying anything besides the LR fails loudly under --vmap."""
    import pytest

    from m2mixer_tpu.sweep import run_sweep

    cfg_path = _write_cfg(str(tmp_path))
    sweep_path = os.path.join(tmp_path, "sweep_bad.yml")
    with open(sweep_path, "w") as f:
        yaml.safe_dump({
            "method": "grid",
            "metric": {"name": "val_loss", "goal": "minimize"},
            "command": ["python", "run.py", "-c", cfg_path],
            "parameters": {
                "model": {"parameters": {"dropout": {"values": [0.0, 0.3]}}},
            },
        }, f)
    with pytest.raises(ValueError, match="--vmap"):
        run_sweep(sweep_path, out_dir=os.path.join(tmp_path, "bad_out"),
                  epochs=1, verbose=False, vmap=True)


def test_nan_trials_never_rank_best():
    """ADVICE r2 regression: a divergent trial whose metric is NaN must not
    be reported as the sweep's best (NaN keys make min() return the first
    row). Non-finite values rank worst under both goals."""
    from m2mixer_tpu.sweep import _trial_rank_key

    results = [{"trial": 0, "value": float("nan")},
               {"trial": 1, "value": 0.4},
               {"trial": 2, "value": 0.6}]
    assert min(results, key=_trial_rank_key(1.0))["trial"] == 1   # minimize
    assert min(results, key=_trial_rank_key(-1.0))["trial"] == 2  # maximize
    all_nan = [{"trial": 0, "value": float("nan")}]
    assert min(all_nan, key=_trial_rank_key(1.0))["trial"] == 0


def test_all_diverged_sweep_raises(capsys):
    """ADVICE r3 regression: when EVERY trial diverges (all values
    non-finite), the sweep must refuse to report a 'best' trial instead of
    silently printing trial 0."""
    import pytest

    from m2mixer_tpu.sweep import _select_best

    with pytest.raises(RuntimeError, match="non-finite"):
        _select_best([{"trial": 0, "value": float("nan")},
                      {"trial": 1, "value": float("inf")}], 1.0)
    # one finite trial is enough to have a winner
    best = _select_best([{"trial": 0, "value": float("nan")},
                         {"trial": 1, "value": 0.7}], 1.0)
    assert best["trial"] == 1


def test_grid_trials_cap_reports_dropped(capsys):
    """ADVICE r3 regression: capping a grid cross-product with --trials
    must say WHICH combos were cut (no-silent-caps convention)."""
    from m2mixer_tpu.sweep import trial_params

    grid_sweep = {"method": "grid", "parameters": {
        "a": {"values": [1, 2]}, "b": {"values": [10, 20, 30]}}}
    combos = list(trial_params(grid_sweep, 4))
    assert len(combos) == 4
    out = capsys.readouterr().out
    assert "dropping 2 combos" in out
    assert "'a': 2" in out and "'b': 20" in out  # first dropped combo named
    # uncapped grids stay silent
    list(trial_params(grid_sweep, None))
    assert "dropping" not in capsys.readouterr().out


def test_vmap_sweep_two_axes_end_to_end(tmp_path):
    """--vmap with a 2-axis grid (lr x weight_decay): 4 trials in one
    compiled program, per-trial params recorded, best trial sane."""
    import json

    import numpy as np

    from m2mixer_tpu.sweep import run_sweep

    cfg_path = _write_cfg(str(tmp_path))
    sweep_path = os.path.join(tmp_path, "sweep_vmap2.yml")
    with open(sweep_path, "w") as f:
        yaml.safe_dump({
            "method": "grid",
            "metric": {"name": "val_loss", "goal": "minimize"},
            "command": ["python", "run.py", "-c", cfg_path],
            "parameters": {
                "train": {"parameters": {"optimizer": {"parameters": {
                    "lr": {"values": [1e-3, 25.0]},
                    "weight_decay": {"values": [0.0, 0.2]}}}}},
            },
        }, f)
    out = run_sweep(sweep_path, out_dir=os.path.join(tmp_path, "vmap2_out"),
                    epochs=2, verbose=False, vmap=True)
    assert out["vmap"] is True and len(out["results"]) == 4
    combos = {(r["params"]["train.optimizer.lr"],
               r["params"]["train.optimizer.weight_decay"])
              for r in out["results"]}
    assert combos == {(1e-3, 0.0), (1e-3, 0.2), (25.0, 0.0), (25.0, 0.2)}
    # a sane lr wins regardless of decay; decay makes same-lr trials differ
    assert out["best"]["params"]["train.optimizer.lr"] == 1e-3
    by = {(r["params"]["train.optimizer.lr"],
           r["params"]["train.optimizer.weight_decay"]): r["value"]
          for r in out["results"]}
    assert by[(1e-3, 0.0)] != by[(1e-3, 0.2)]
    rows = [json.loads(l) for l in open(
        os.path.join(tmp_path, "vmap2_out", "sweep_results.jsonl"))]
    assert [r["trial"] for r in rows] == [0, 1, 2, 3]
