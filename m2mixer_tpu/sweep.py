"""Local hyperparameter-sweep executor for wandb sweep YAMLs.

The reference's sweep workflow needs the wandb cloud: a hosted controller
proposes trials and `wandb agent` shells out to ``run.py`` with dotted
overrides (`/root/reference/sweeps/avmnist_mixer.yaml`,
`run.py:33-40`). This module runs the SAME sweep files entirely locally —
no service, no network:

    python -m m2mixer_tpu.sweep -f sweeps/avmnist_mixer.yaml --trials 10

It parses the wandb schema (flat or nested ``parameters:`` trees, ``values``
lists, ``uniform`` / ``log_uniform_values`` / ``int_uniform`` distributions,
the config path from ``command:``), samples or enumerates trials, runs each
through the same config-merge + Trainer path as ``run.py``, and ranks them
by the sweep's metric (best-epoch value from the run summary).

Search strategy: ``grid`` enumerates the cross-product (requires every
parameter to be a ``values`` list); ``random`` samples; ``bayes`` runs a
local Tree-structured Parzen Estimator (Bergstra et al. 2011) — the first
``startup`` trials are random, then each proposal maximizes the density
ratio l(x)/g(x) of Parzen mixtures fit to the best-quantile vs the rest of
the observed trials (per-parameter, log space for log distributions,
count-smoothed categoricals) — so the sequential search the reference
delegates to wandb's hosted controller runs entirely offline here.

``--vmap`` (optimizer-scalar sweeps on device-resident datasets): ALL
trials train simultaneously as vmapped ensemble members in ONE compiled
program (`training/ensemble.py`) — the TPU-native answer to a sequential
agent, measured ~7.7x on the 10-run significance study of the same engine.
Sweepable axes: ``train.optimizer.lr`` / ``weight_decay`` / ``ema_decay``
(injected per-member optimizer-state leaves) and ``sam_rho`` (a traced
per-member step scalar); grid sweeps cross-product the axes. Every trial
shares the single ``cfg.train.seed`` RNG stream AND the per-epoch shuffle
order (identical init/dropout/data draws, exactly like sequential trials),
so differences are purely the swept values; per-trial EarlyStopping/
plateau-LR run as in the sequential protocol. Constant parameters
(``value:`` specs) are applied as overrides; any other swept parameter is
rejected with the reason.
"""

from __future__ import annotations

import argparse
import itertools
import json
import math
import os
from typing import Any, Dict, Iterator, Optional

import numpy as np
import yaml

__all__ = ["parse_sweep", "sample_value", "trial_params", "tpe_propose",
           "run_sweep", "hyperband_bands", "HyperbandStopper",
           "vmap_sweep_plan"]


def _flatten_parameters(tree: Dict[str, Any], prefix: str = "") -> Dict[str, dict]:
    """wandb nested-``parameters:`` trees -> {dotted.name: spec}."""
    out: Dict[str, dict] = {}
    for key, spec in tree.items():
        name = f"{prefix}{key}"
        if isinstance(spec, dict) and "parameters" in spec:
            out.update(_flatten_parameters(spec["parameters"], name + "."))
        else:
            out[name] = dict(spec) if isinstance(spec, dict) else {"value": spec}
    return out


def parse_sweep(path: str) -> Dict[str, Any]:
    """Load a wandb sweep YAML into {method, metric, goal, cfg, name,
    parameters: {dotted: spec}}."""
    with open(path) as f:
        sweep = yaml.safe_load(f)
    params = _flatten_parameters(sweep.get("parameters", {}))
    if not params:
        raise ValueError(f"sweep file {path} declares no parameters")
    command = [str(c) for c in sweep.get("command", [])]
    cfg = None
    if "-c" in command:
        i = command.index("-c")
        if i + 1 >= len(command):
            raise ValueError(f"sweep file {path}: command has '-c' with no "
                             "config path after it")
        cfg = command[i + 1]
    metric = sweep.get("metric", {}) or {}
    return {
        "method": str(sweep.get("method", "random")),
        "metric": str(metric.get("name", "val_loss")),
        "goal": str(metric.get("goal", "minimize")),
        "cfg": cfg,
        "name": str(sweep.get("name", os.path.splitext(os.path.basename(path))[0])),
        "parameters": params,
        "early_terminate": sweep.get("early_terminate"),
    }


def sample_value(spec: dict, rng: np.random.RandomState):
    """One draw from a wandb parameter spec (wandb semantics: integer
    min/max without a distribution infer int_uniform; ``q`` quantizes)."""
    if "value" in spec:
        return spec["value"]
    if "values" in spec:
        vals = list(spec["values"])
        return vals[int(rng.randint(len(vals)))]
    dist = spec.get("distribution")
    if dist is None:
        # wandb infers int_uniform for int bounds, uniform for floats
        both_int = isinstance(spec["min"], int) and isinstance(spec["max"], int)
        dist = "int_uniform" if both_int else "uniform"
    lo, hi = float(spec["min"]), float(spec["max"])
    q = spec.get("q")

    def quantize(v):
        return float(np.clip(round(v / q) * q, lo, hi)) if q else float(v)

    if dist in ("uniform", "q_uniform"):
        return quantize(rng.uniform(lo, hi))
    if dist in ("log_uniform_values", "q_log_uniform_values"):
        return quantize(math.exp(rng.uniform(math.log(lo), math.log(hi))))
    if dist in ("log_uniform",):  # wandb legacy: bounds already in log space
        return quantize(math.exp(rng.uniform(lo, hi)))
    if dist in ("int_uniform", "q_uniform_int"):
        v = rng.randint(int(lo), int(hi) + 1)
        return int(quantize(v)) if q else int(v)
    raise ValueError(f"Unsupported distribution: {dist!r}")


def trial_params(sweep: Dict[str, Any], trials: Optional[int],
                 seed: int = 0) -> Iterator[Dict[str, Any]]:
    """Yield {dotted: value} per trial. grid = full cross-product (capped at
    ``trials`` when given); random = ``trials`` independent draws. (bayes
    runs sequentially inside ``run_sweep`` — its proposals depend on the
    observed results; used standalone, this falls back to random draws.)"""
    params = sweep["parameters"]
    if sweep["method"] == "grid":
        bad = [k for k, s in params.items()
               if "values" not in s and "value" not in s]
        if bad:
            raise ValueError(f"grid sweeps need 'values' lists; {bad} use "
                             "distributions (switch method to random)")
        names = list(params)
        grids = [params[k].get("values", [params[k].get("value")]) for k in names]
        combos = itertools.product(*grids)
        for i, combo in enumerate(combos):
            if trials is not None and i >= trials:
                # no-silent-caps: enumerate what the cap cuts off so a
                # truncated grid never reads as full coverage (ADVICE r3).
                # The drop COUNT comes from the grid lengths in O(1) — never
                # exhaust the remaining cross-product (10 axes x 10 values
                # would mean ~1e10 wasted tuples); only an 8-combo preview
                # is materialized.
                total = math.prod(len(g) for g in grids)
                dropped = list(itertools.islice(combos, 8))
                shown = ", ".join(str(dict(zip(names, c))) for c in dropped)
                rest = total - trials - 1 - len(dropped)
                print(f"[sweep] grid cross-product exceeds --trials {trials}: "
                      f"dropping {total - trials} combos starting at "
                      f"{dict(zip(names, combo))}; next: {shown}"
                      + (f" … and {rest} more" if rest > 0 else ""))
                return
            yield dict(zip(names, combo))
        return
    rng = np.random.RandomState(seed)
    for _ in range(10 if trials is None else trials):
        yield {k: sample_value(s, rng) for k, s in params.items()}


# --------------------------------------------------------------- TPE (bayes)
_TPE_STARTUP = 5      # random trials before the Parzen model kicks in
_TPE_GAMMA = 0.25     # top quantile that defines the "good" set
_TPE_CANDIDATES = 24  # candidates drawn from l(x) per parameter


def _spec_dist(spec: dict) -> str:
    dist = spec.get("distribution")
    if dist is None:  # wandb inference rule, same as sample_value
        both_int = isinstance(spec["min"], int) and isinstance(spec["max"], int)
        dist = "int_uniform" if both_int else "uniform"
    return dist


def _internal_space(spec: dict):
    """(to_internal, from_internal, lo, hi): the space where TPE's kernels
    live — log space for log distributions so multiplicative neighborhoods
    are gaussian, identity otherwise. lo/hi are internal-space bounds."""
    dist = _spec_dist(spec)
    lo, hi = float(spec["min"]), float(spec["max"])
    if dist in ("log_uniform_values", "q_log_uniform_values"):
        return math.log, math.exp, math.log(lo), math.log(hi)
    if dist == "log_uniform":  # legacy: bounds already ARE log space
        return math.log, math.exp, lo, hi
    return (lambda v: float(v)), (lambda v: float(v)), lo, hi


def _finalize(spec: dict, value: float):
    """Clip a value-space draw to the spec's bounds and apply the same
    q-quantization / int rounding as ``sample_value``."""
    dist = _spec_dist(spec)
    if dist == "log_uniform":  # bounds in log space -> value bounds are exp
        lo, hi = math.exp(float(spec["min"])), math.exp(float(spec["max"]))
    else:
        lo, hi = float(spec["min"]), float(spec["max"])
    q = spec.get("q")
    v = float(np.clip(value, lo, hi))
    if q:
        v = float(np.clip(round(v / q) * q, lo, hi))
    if dist in ("int_uniform", "q_uniform_int"):
        return int(round(v))
    return v


def _parzen_logpdf(x: np.ndarray, points: np.ndarray, sigma: float,
                   span: float) -> np.ndarray:
    """log density of an equal-weight gaussian mixture on ``points`` plus
    one uniform component over the domain (the prior that keeps g(x) > 0
    everywhere and stops l/g exploding outside the observed range)."""
    n = len(points)
    dens = np.full(x.shape, 1.0 / span)  # the uniform prior component
    if n:
        z = (x[:, None] - points[None, :]) / sigma
        dens = dens + np.exp(-0.5 * z * z).sum(axis=1) / (
            sigma * math.sqrt(2 * math.pi))
    return np.log(dens / (n + 1))


def tpe_propose(params: Dict[str, dict], observations, rng,
                gamma: float = _TPE_GAMMA,
                n_candidates: int = _TPE_CANDIDATES) -> Dict[str, Any]:
    """One Tree-structured Parzen Estimator proposal (Bergstra et al. 2011,
    "Algorithms for Hyper-Parameter Optimization").

    ``observations`` is a list of ``(flat_params, loss)`` with loss oriented
    so SMALLER IS BETTER (the caller sign-flips maximize goals). The trials
    are split at the ``gamma`` quantile into good/bad sets; per parameter,
    candidates are drawn from the good-set Parzen mixture l(x) and the one
    maximizing ``log l(x) - log g(x)`` wins (parameters are modeled
    independently, so the factorized ratio optimizes per-dimension).
    Categorical parameters use count-smoothed probability ratios.
    """
    if not observations:
        raise ValueError("tpe_propose needs at least one observation")
    order = np.argsort([loss for _, loss in observations], kind="stable")
    n_good = max(1, int(math.ceil(gamma * len(observations))))
    good_set = set(order[:n_good].tolist())

    out: Dict[str, Any] = {}
    for name, spec in params.items():
        if "value" in spec:
            out[name] = spec["value"]
            continue
        good = [obs[name] for i, (obs, _) in enumerate(observations)
                if i in good_set and name in obs]
        bad = [obs[name] for i, (obs, _) in enumerate(observations)
               if i not in good_set and name in obs]
        if not good:  # parameter absent from every good trial: explore
            out[name] = sample_value(spec, rng)
            continue

        if "values" in spec:
            vals = list(spec["values"])

            def probs(drawn):
                counts = np.array(
                    [1.0 + sum(1 for d in drawn if d == v) for v in vals])
                return counts / counts.sum()

            pg, pb = probs(good), probs(bad)
            cand = rng.choice(len(vals), size=n_candidates, p=pg)
            best = max(set(cand.tolist()), key=lambda j: pg[j] / pb[j])
            out[name] = vals[int(best)]
            continue

        fwd, inv, lo, hi = _internal_space(spec)
        span = hi - lo
        if span <= 0:  # degenerate min==max
            out[name] = _finalize(spec, inv(lo))
            continue
        g_pts = np.array([fwd(v) for v in good], dtype=np.float64)
        b_pts = np.array([fwd(v) for v in bad], dtype=np.float64)
        # hyperopt-style bandwidth: shrinks as the good set grows, floored
        # so late-stage kernels still explore ~1% of the domain
        sigma_g = max(span / (len(g_pts) + 2.0), 0.01 * span)
        sigma_b = max(span / (len(b_pts) + 2.0), 0.01 * span) if len(b_pts) \
            else span
        # candidates ~ l(x): a random good kernel plus gaussian noise
        centers = g_pts[rng.randint(len(g_pts), size=n_candidates)]
        cand = np.clip(centers + rng.randn(n_candidates) * sigma_g, lo, hi)
        score = (_parzen_logpdf(cand, g_pts, sigma_g, span)
                 - _parzen_logpdf(cand, b_pts, sigma_b, span))
        out[name] = _finalize(spec, inv(float(cand[int(np.argmax(score))])))
    return out


# ------------------------------------------------- hyperband early terminate
def hyperband_bands(et: dict, eta: float) -> list:
    """Band epochs (completed-epoch counts) for a wandb ``early_terminate``
    block: ``min_iter`` grows bands ``m·eta^k`` upward (wandb's documented
    form); ``max_iter`` [+ ``s``] derives them downward ``M·eta^-k``."""
    if "min_iter" in et:
        m = max(1, int(et["min_iter"]))
        bands, b = [], float(m)
        while len(bands) < 16 and b <= 1e6:
            bands.append(int(round(b)))
            b *= eta
        return sorted(set(bands))
    if "max_iter" in et:
        m = max(1, int(et["max_iter"]))
        s = max(1, int(et.get("s", 3)))
        bands = [int(round(m / eta ** k)) for k in range(s, 0, -1)]
        return sorted(set(b for b in bands if b >= 1))
    raise ValueError("early_terminate needs min_iter or max_iter "
                     f"(got {sorted(et)})")


class HyperbandStopper:
    """wandb-semantics hyperband early termination for the local executor
    (the reference delegates this to the hosted controller): at each band
    epoch a trial is stopped when its best metric so far falls outside the
    top 1/eta of the trials previously seen at that band. Asynchronous
    (ASHA-style, Li et al. 2020): decisions use whatever history exists —
    the first ``ceil(eta)`` trials at a band are never stopped there."""

    def __init__(self, et: dict, metric: str, sign: float):
        if str(et.get("type", "hyperband")) != "hyperband":
            raise ValueError("early_terminate.type must be 'hyperband' "
                             f"(got {et.get('type')!r})")
        self.eta = float(et.get("eta", 3))
        if self.eta <= 1:
            raise ValueError(f"early_terminate.eta must be > 1 (got {self.eta})")
        self.bands = hyperband_bands(et, self.eta)
        self.metric, self.sign = metric, sign
        self.history: Dict[int, list] = {b: [] for b in self.bands}

    def hook_for_trial(self):
        """(trainer epoch hook, mutable state): the hook records this
        trial's best-so-far at every band and stops when it misses the
        band's top-1/eta cut. ``state['stopped_band']`` reports where."""
        state = {"best": math.inf, "stopped_band": None}

        def hook(epoch: int, logs: dict) -> bool:
            v = logs.get(self.metric)
            if v is None:
                return False
            state["best"] = min(state["best"], self.sign * float(v))
            band = epoch + 1  # completed epochs
            prior = self.history.get(band)
            if prior is None:
                return False
            prior_snapshot = list(prior)
            prior.append(state["best"])
            if len(prior_snapshot) < math.ceil(self.eta):
                return False  # not enough signal at this band yet
            k = max(0, math.ceil(len(prior_snapshot) / self.eta) - 1)
            cutoff = sorted(prior_snapshot)[k]
            if state["best"] > cutoff:
                state["stopped_band"] = band
                return True
            return False

        return hook, state


_VMAP_LR = "train.optimizer.lr"
#: dotted config name -> fit_ensemble member_hparams axis. Every axis rides
#: the member vmap without retracing: lr/weight_decay/ema_decay as injected
#: per-member optimizer-state leaves, sam_rho as a traced step scalar
#: (training/ensemble.py::fit_ensemble).
_VMAP_AXES = {
    "train.optimizer.lr": "learning_rate",
    "train.optimizer.weight_decay": "weight_decay",
    "train.optimizer.ema_decay": "ema_decay",
    "train.optimizer.sam_rho": "sam_rho",
}


def vmap_sweep_plan(sweep: Dict[str, Any], trials: Optional[int],
                    seed: int = 0):
    """Validate a sweep for the vmapped executor and return
    ``(axes, const_flat)`` with ``axes = {dotted_name: per-trial values}``
    (every list the same length = the member count).

    Eligible sweeps vary only optimizer scalars that ride the member axis
    of ONE compiled program (``_VMAP_AXES``); parameters pinned with
    ``value:`` become constant overrides. Grid sweeps cross-product the
    swept axes (wandb grid semantics) capped at ``trials``; random sweeps
    draw each axis independently per trial. The sweep metric must be
    ``val_loss`` (per-member best-val, the reference sweeps' target,
    `/root/reference/sweeps/avmnist_mixer.yaml:3-5`) or a ``test_*`` metric
    from the task's score set. Anything else raises with the reason so the
    caller can fall back to the sequential executor."""
    consts: Dict[str, Any] = {}
    swept: Dict[str, dict] = {}
    for name, spec in sweep["parameters"].items():
        if "value" in spec:
            consts[name] = spec["value"]
        elif name in _VMAP_AXES:
            swept[name] = spec
        else:
            raise ValueError(
                f"--vmap supports sweeps over {sorted(_VMAP_AXES)} only; "
                f"{name!r} varies (pin it with 'value:' or drop --vmap)")
    if not swept:
        raise ValueError(f"--vmap needs at least one swept parameter from "
                         f"{sorted(_VMAP_AXES)}")
    metric = sweep["metric"]
    if metric != "val_loss" and not metric.startswith("test_"):
        raise ValueError(
            f"--vmap tracks per-trial val_loss and test_* metrics; the "
            f"sweep metric {metric!r} is neither (drop --vmap)")
    if sweep["method"] == "grid":
        bad = [k for k, s in swept.items() if "values" not in s]
        if bad:
            raise ValueError(f"grid sweeps need a 'values' list on {bad}")
        names = list(swept)
        combos = list(itertools.product(
            *[[float(v) for v in swept[k]["values"]] for k in names]))
        if trials is not None:
            combos = combos[:trials]
        axes = {k: [c[i] for c in combos] for i, k in enumerate(names)}
    else:
        # random draws; 'bayes' degrades to random — TPE proposals are
        # sequential (each depends on observed results) and the whole point
        # here is that every trial trains at once
        rng = np.random.RandomState(seed)
        count = 10 if trials is None else trials
        axes = {k: [] for k in swept}
        for _ in range(count):
            for k, s in swept.items():
                axes[k].append(float(sample_value(s, rng)))
    if not next(iter(axes.values())):
        raise ValueError("sweep produced no trials (was --trials 0, or an "
                         "empty grid?)")
    return axes, consts


def _trial_rank_key(sign: float):
    """Ranking key that treats non-finite trial values as worst.

    Divergent learning rates — exactly what LR sweeps contain — produce NaN
    val losses; ``min(..., key=lambda r: sign * r["value"])`` would return
    the FIRST row whenever its key is NaN (every NaN comparison is False),
    reporting a diverged trial as the sweep's best.
    """
    return lambda r: (sign * r["value"] if math.isfinite(r["value"])
                      else math.inf)


def _select_best(results, sign: float):
    """Rank trials NaN-proof and refuse to present a diverged trial as the
    winner: when EVERY trial's value is non-finite, ``min`` over
    ``_trial_rank_key`` would silently report trial 0 as 'best' even though
    nothing converged — raise instead so sweeps that fully diverge fail
    loudly (ADVICE r3)."""
    best = min(results, key=_trial_rank_key(sign))
    if not math.isfinite(best["value"]):
        raise RuntimeError(
            f"all {len(results)} sweep trials produced non-finite metric "
            "values (every trial diverged) — no best trial exists; inspect "
            "sweep_results.jsonl and narrow the search space")
    return best


def _run_sweep_vmap(sweep: Dict[str, Any], cfg_file: str, trials, seed: int,
                    out_dir: str, extra_overrides, epochs, verbose: bool,
                    sign: float) -> dict:
    """All trials as vmapped ensemble members in one compiled program."""
    from . import config as cfg_lib
    from . import datasets, models
    from .training.ensemble import fit_ensemble

    axes, consts = vmap_sweep_plan(sweep, trials, seed)
    n_trials = len(next(iter(axes.values())))
    if verbose:
        if sweep["method"] == "bayes":
            print("[sweep] --vmap: 'bayes' degrades to random draws (TPE "
                  "proposals are sequential; all vmapped trials train at once)")
        if sweep.get("early_terminate"):
            print("[sweep] --vmap: early_terminate ignored — trials run "
                  "lockstep in one program (per-trial EarlyStopping still "
                  "applies); band-stopping saves no wall time here")
        print(f"[sweep] --vmap: {n_trials} trials over "
              f"{sorted(axes)} in ONE compiled program")

    cfg = cfg_lib.load(cfg_file)
    merged = _nest(dict(consts))
    if extra_overrides:
        cfg_lib.deep_update(merged, _nest(dict(extra_overrides)))
    cfg_lib.warn_unknown_overrides(cfg, merged)
    for section in merged:
        if section not in ("model", "train", "dataset"):
            # same contract as the sequential executor: constants outside the
            # mergeable sections never reach the config, so say so instead of
            # silently recording them in every result row's params
            print(f"[sweep] WARNING: parameter section {section!r} is not "
                  f"model/train/dataset — it will be IGNORED by every trial")
    for section in ("model", "train", "dataset"):
        if section in merged:
            cfg_lib.deep_update(cfg[section], merged[section])
    if epochs is not None:
        cfg.train.epochs = epochs
    if cfg.dataset.params.get("num_workers", 0) == -1:
        cfg.dataset.params.num_workers = os.cpu_count()

    task = models.get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = datasets.get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    mesh = None
    if int(cfg.train.get("mesh_data", 1)) not in (0, 1):
        from .parallel import MeshConfig, make_mesh

        mesh = make_mesh(MeshConfig(data=int(cfg.train.mesh_data), model=1))
        if mesh.shape["data"] == 1:
            mesh = None
    member_hparams = {_VMAP_AXES[k]: v for k, v in axes.items()}
    result = fit_ensemble(task, dm, cfg.train, n_trials,
                          member_hparams=member_hparams,
                          identical_seeds=True, mesh=mesh, verbose=verbose)

    metric = sweep["metric"]
    if metric == "val_loss":
        values = np.asarray(result.val_losses, np.float64)
    else:
        values = np.asarray(result.metric(metric), np.float64)
        if np.isnan(values).all():
            avail = ["val_loss"] + sorted(result.scores[0]) if result.scores \
                else ["val_loss"]
            raise KeyError(f"metric {metric!r} was never computed; "
                           f"available: {avail}")

    os.makedirs(out_dir, exist_ok=True)
    results = []
    with open(os.path.join(out_dir, "sweep_results.jsonl"), "w") as f:
        for i in range(n_trials):
            trial_axes = {k: axes[k][i] for k in axes}
            row = {"trial": i, "params": {**trial_axes, **consts},
                   "metric": metric, "value": float(values[i]),
                   "best_epoch": int(result.stop_epochs[i])}
            results.append(row)
            f.write(json.dumps(row) + "\n")
            if verbose:
                print(f"[sweep] trial {i}: {metric}={row['value']:.5f} "
                      f"{trial_axes}")
    best = _select_best(results, sign)
    if verbose:
        print(f"[sweep] best trial {best['trial']}: "
              f"{metric}={best['value']:.5f} {best['params']}")
    summary = {"best": best, "results": results, "metric": metric,
               "goal": sweep["goal"], "vmap": True,
               "epochs_run": int(result.epochs_run)}
    with open(os.path.join(out_dir, "sweep_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def _nest(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for dotted, v in flat.items():
        node = out
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def run_sweep(sweep_path: str, trials: Optional[int] = None, seed: int = 0,
              cfg_path: Optional[str] = None, out_dir: str = "sweep_out",
              extra_overrides: Optional[Dict[str, Any]] = None,
              epochs: Optional[int] = None, verbose: bool = True,
              startup: int = _TPE_STARTUP,
              early_terminate: bool = True, vmap: bool = False) -> dict:
    """Execute a sweep locally; returns {'best': {...}, 'results': [...]}
    and writes ``sweep_results.jsonl`` under ``out_dir``. ``startup`` is the
    number of random warmup trials before ``method: bayes`` switches to TPE
    proposals (ignored by grid/random). A wandb ``early_terminate:
    {type: hyperband, ...}`` block in the sweep file stops underperforming
    trials at band epochs (``early_terminate=False`` ignores it). ``vmap``
    runs every trial simultaneously as vmapped ensemble members in one
    compiled program — learning-rate-only sweeps on device-resident
    datasets (see module docstring)."""
    from . import config as cfg_lib
    from . import datasets, models
    from .training import Trainer

    sweep = parse_sweep(sweep_path)
    if vmap:
        cfg_file = cfg_path or sweep["cfg"]
        if cfg_file is None:
            raise ValueError("sweep file has no '-c CFG' in command:; "
                             "pass cfg_path")
        sign_ = 1.0 if sweep["goal"] == "minimize" else -1.0
        return _run_sweep_vmap(sweep, cfg_file, trials, seed, out_dir,
                               extra_overrides, epochs, verbose, sign_)
    if sweep["method"] == "bayes" and verbose:
        print(f"[sweep] method 'bayes': local TPE ({startup} random warmup "
              "trials, then Parzen-ratio proposals)")
    cfg_file = cfg_path or sweep["cfg"]
    if cfg_file is None:
        raise ValueError("sweep file has no '-c CFG' in command:; pass cfg_path")
    os.makedirs(out_dir, exist_ok=True)
    results_path = os.path.join(out_dir, "sweep_results.jsonl")
    sign = 1.0 if sweep["goal"] == "minimize" else -1.0
    results = []
    observations = []  # (flat_params, sign*value) feeding the TPE proposals

    stopper = None
    if early_terminate and sweep.get("early_terminate"):
        stopper = HyperbandStopper(sweep["early_terminate"], sweep["metric"],
                                   sign)
        if verbose:
            print(f"[sweep] hyperband early termination: bands "
                  f"{stopper.bands} (epochs), eta={stopper.eta}")

    if sweep["method"] == "bayes":
        def _bayes_trials():
            rng = np.random.RandomState(seed)
            for _ in range(10 if trials is None else trials):
                if len(observations) < startup:
                    yield {k: sample_value(s, rng)
                           for k, s in sweep["parameters"].items()}
                else:
                    yield tpe_propose(sweep["parameters"], observations, rng)
        trial_iter = _bayes_trials()
    else:
        trial_iter = trial_params(sweep, trials, seed)

    with open(results_path, "w") as results_f:
        for i, flat in enumerate(trial_iter):
            cfg = cfg_lib.load(cfg_file)
            merged = _nest(flat)
            if extra_overrides:
                cfg_lib.deep_update(merged, _nest(dict(extra_overrides)))
            if i == 0:
                # typo guard, once (same contract as run.py): a mistyped
                # parameter name would otherwise make every trial identical
                cfg_lib.warn_unknown_overrides(cfg, merged)
                for section in merged:
                    if section not in ("model", "train", "dataset"):
                        print(f"[sweep] WARNING: parameter section "
                              f"{section!r} is not model/train/dataset — "
                              "it will be IGNORED by every trial")
            for section in ("model", "train", "dataset"):
                if section in merged:
                    cfg_lib.deep_update(cfg[section], merged[section])
            if epochs is not None:
                cfg.train.epochs = epochs
            if cfg.dataset.params.get("num_workers", 0) == -1:
                cfg.dataset.params.num_workers = os.cpu_count()

            task = models.get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
            dm = datasets.get_data_module(cfg.dataset.type)(**cfg.dataset.params)
            trainer = Trainer(cfg.train, name=f"{sweep['name']}_trial{i}",
                              work_dir=out_dir, use_wandb=False, full_cfg=cfg)
            hstate = None
            if stopper is not None:
                trainer.epoch_end_hook, hstate = stopper.hook_for_trial()
            trainer.fit(task, dm)
            # best-epoch value when the logger tracked it, else final epoch
            value = trainer.logger.summary.get(
                f"best_{sweep['metric']}",
                trainer.callback_metrics.get(sweep["metric"]))
            trainer.logger.close()
            if value is None:
                raise KeyError(
                    f"metric {sweep['metric']!r} was never logged; "
                    f"available: {sorted(trainer.callback_metrics)}")
            row = {"trial": i, "params": flat, "metric": sweep["metric"],
                   "value": float(value)}
            if stopper is not None:
                row["stopped_band"] = hstate["stopped_band"]
            results.append(row)
            # early-terminated trials feed TPE their (pessimistic) partial
            # value — the standard asynchronous-hyperband composition
            observations.append((flat, sign * float(value)))
            results_f.write(json.dumps(row) + "\n")
            results_f.flush()
            if verbose:
                cut = (f" [hyperband-stopped at epoch {hstate['stopped_band']}]"
                       if hstate and hstate["stopped_band"] is not None else "")
                print(f"[sweep] trial {i}: {sweep['metric']}={value:.5f} "
                      f"{flat}{cut}")

    if not results:
        raise ValueError("sweep produced no trials (was --trials 0, or an "
                         "empty grid?)")
    best = _select_best(results, sign)
    if verbose:
        print(f"[sweep] best trial {best['trial']}: "
              f"{sweep['metric']}={best['value']:.5f} {best['params']}")
    summary = {"best": best, "results": results, "metric": sweep["metric"],
               "goal": sweep["goal"]}
    with open(os.path.join(out_dir, "sweep_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", "--sweep", required=True, help="wandb sweep YAML")
    ap.add_argument("--trials", type=int, default=None,
                    help="trial count (default: 10 for random/bayes, the "
                         "full cross-product for grid)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-c", "--cfg", default=None,
                    help="override the config path from the sweep's command:")
    ap.add_argument("-o", "--out", default="sweep_out")
    ap.add_argument("--epochs", type=int, default=None,
                    help="cap train.epochs per trial (budgeted search)")
    ap.add_argument("--startup", type=int, default=_TPE_STARTUP,
                    help="random warmup trials before 'bayes' switches to "
                         "TPE proposals")
    ap.add_argument("--no-early-terminate", action="store_true",
                    help="ignore the sweep file's early_terminate block")
    ap.add_argument("--vmap", action="store_true",
                    help="train ALL trials simultaneously as vmapped "
                         "ensemble members in one compiled program "
                         "(train.optimizer.lr-only sweeps on "
                         "device-resident datasets)")
    args, unknown = ap.parse_known_args(argv)

    from .config import from_cli, todict

    # from_cli lstrips leading dashes itself; replacing '--' globally would
    # corrupt values that contain it
    extra = todict(from_cli(unknown))

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flatten(v, f"{prefix}{k}."))
            else:
                out[f"{prefix}{k}"] = v
        return out

    run_sweep(args.sweep, trials=args.trials, seed=args.seed,
              cfg_path=args.cfg, out_dir=args.out,
              extra_overrides=flatten(extra), epochs=args.epochs,
              startup=args.startup,
              early_terminate=not args.no_early_terminate, vmap=args.vmap)


if __name__ == "__main__":
    main()
