"""Model inspection CLI: per-module parameter/shape table + analytic cost.

The reference prints nothing but Lightning's total parameter count at fit
time; production work needs to see a config's shape BEFORE training it.
This tool builds the model exactly as ``run.py`` would (same config merge,
same dotted overrides, same datamodule featurization) and prints:

- the flax module tree (``nn.tabulate``): every submodule's inputs/outputs
  and parameter shapes,
- parameter totals per top-level branch (image encoder / audio encoder /
  fusion / heads / ...) with byte sizes,
- eval-forward and train-step FLOPs from XLA's own cost model
  (``Lowered.cost_analysis()`` — pre-compile, so this never waits on a
  device or a remote-compile tunnel), and
- the resulting throughput ceiling on the local accelerator
  (samples/s at 100% / at the measured-fleet 40% MFU).

Usage::

    python -m m2mixer_tpu.summary -c cfg/avmnist/avmnist_m2-mixer_B.yml \
        [--batch 32] [--depth 3] [--json] [dotted.overrides=...]
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["summarize", "main"]


def _param_totals(params) -> Dict[str, Dict[str, float]]:
    """{top-level module: {'params': n, 'bytes': b}}, plus 'total'."""
    tree = params.get("params", params) if isinstance(params, dict) else params
    out: Dict[str, Dict[str, float]] = {}
    total_n = total_b = 0
    for name, sub in tree.items():
        leaves = jax.tree_util.tree_leaves(sub)
        n = int(sum(int(np.prod(l.shape)) for l in leaves))
        b = int(sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves))
        out[name] = {"params": n, "bytes": b}
        total_n += n
        total_b += b
    out["total"] = {"params": total_n, "bytes": total_b}
    return out


def _flops(fn, *args) -> Optional[float]:
    """XLA cost-model FLOPs of one ``fn(*args)`` call, WITHOUT compiling:
    ``jit(fn).lower(...)`` runs locally on abstract shapes, and the lowered
    module's ``cost_analysis()`` reads the pre-optimization HLO cost model
    (so no device round trip — summaries stay instant through the remote
    tunnel this box uses). Remote-device backends (axon) return ``None``
    from ``Lowered.cost_analysis``, so we lower for the host CPU backend —
    the pre-optimization FLOPs count is backend-independent."""
    try:
        spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
            if not hasattr(a, "shape") else jax.ShapeDtypeStruct(a.shape, a.dtype),
            args)
    except Exception:
        return None
    for jit_kwargs in ({}, {"device": "cpu"}):
        try:
            if jit_kwargs.get("device") == "cpu":
                jit_kwargs = {"device": jax.local_devices(backend="cpu")[0]}
            cost = jax.jit(fn, **jit_kwargs).lower(*spec).cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0] if cost else {}
            flops = float((cost or {}).get("flops", -1.0))
            if flops > 0:
                return flops
        except Exception:
            continue
    return None


def summarize(cfg, batch_size: Optional[int] = None,
              depth: Optional[int] = None) -> Dict[str, Any]:
    """Build the config's task + a sample batch and return the summary
    dict; ``table`` holds the rendered flax module tree."""
    import flax.linen as nn

    from .datasets import get_data_module
    from .models import get_model

    if batch_size:
        cfg.dataset.params.batch_size = int(batch_size)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    dm = get_data_module(cfg.dataset.type)(**cfg.dataset.params)
    dm.setup("fit")
    batch = next(iter(dm.train_batches()))
    bsz = int(next(iter(
        v.shape[0] for v in batch.values() if hasattr(v, "shape"))))

    rng = jax.random.PRNGKey(int(cfg.train.get("seed", 0) or 0))
    params = task.init_params(rng, batch)
    totals = _param_totals(params)

    inputs = task.network_inputs(batch)
    task.bind_trace_flavors()
    table = nn.tabulate(
        task.network, {"params": rng},
        depth=depth, console_kwargs={"width": 120, "force_terminal": False},
    )(**inputs, deterministic=True)

    from .modules.lora import resolve_lora

    fwd = _flops(
        lambda p, kw: task.network.apply(resolve_lora(p), **kw, deterministic=True),
        params, inputs)

    def train_step(p, b):
        ctx = jax.tree.map(jnp.asarray, task.make_ctx(0, "train"))
        rngs = {name: jax.random.PRNGKey(i)
                for i, name in enumerate(task.RNG_COLLECTIONS)}
        loss, _ = task.step(p, b, ctx, rngs, train=True)
        return jax.grad(lambda q: task.step(q, b, ctx, rngs, train=True)[0])(p), loss

    step = _flops(train_step, params, batch)

    info: Dict[str, Any] = {
        "model": str(cfg.model.type),
        "dataset": str(cfg.dataset.type),
        "batch_size": bsz,
        "params": totals,
        "inputs": {k: [list(v.shape), str(np.asarray(v).dtype)]
                   for k, v in batch.items() if hasattr(v, "shape")},
        "flops": {
            "forward_per_sample": fwd / bsz if fwd else None,
            "train_step_per_sample": step / bsz if step else None,
        },
        "table": table,
    }
    try:
        from .utils.flops import peak_flops

        dev = jax.devices()[0]
        peak = peak_flops(dev)
        # peak_flops quotes TPU MXU peaks; on a CPU host the ceiling is a
        # projection onto the default chip (v5e), and says so.
        info["device"] = {"kind": getattr(dev, "device_kind", "unknown"),
                          "peak_bf16_flops": peak,
                          "projected": dev.platform != "tpu"}
        if step:
            per = step / bsz
            info["ceiling_samples_per_sec"] = {
                "mfu_100": peak / per, "mfu_40": 0.4 * peak / per}
    except Exception:
        pass
    return info


def _fmt_count(n: float) -> str:
    for div, suffix in ((1e9, "B"), (1e6, "M"), (1e3, "k")):
        if n >= div:
            return f"{n / div:.2f}{suffix}"
    return str(int(n))


def main(argv: Optional[Sequence[str]] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--cfg", required=True)
    ap.add_argument("--batch", type=int, default=None,
                    help="override dataset.params.batch_size for the summary")
    ap.add_argument("--depth", type=int, default=None,
                    help="module-tree depth shown (default: full tree)")
    ap.add_argument("--json", action="store_true",
                    help="print the machine-readable summary (no table)")
    args, unknown = ap.parse_known_args(argv)

    from . import config as cfg_lib

    cfg = cfg_lib.load(args.cfg)
    if unknown:  # dotted config overrides, same contract as run.py
        cfg_lib.apply_cli_overrides(cfg, unknown)

    info = summarize(cfg, batch_size=args.batch, depth=args.depth)
    if args.json:
        print(json.dumps({k: v for k, v in info.items() if k != "table"},
                         indent=2))
        return info

    print(info["table"])
    print(f"model: {info['model']}   dataset: {info['dataset']}   "
          f"batch: {info['batch_size']}")
    print("inputs: " + "  ".join(
        f"{k}{tuple(s)}:{d}" for k, (s, d) in sorted(info["inputs"].items())))
    print("parameters:")
    for name, t in info["params"].items():
        if name == "total":
            continue
        print(f"  {name:<24s} {_fmt_count(t['params']):>10s}  "
              f"({t['bytes'] / 1e6:.2f} MB)")
    tot = info["params"]["total"]
    print(f"  {'TOTAL':<24s} {_fmt_count(tot['params']):>10s}  "
          f"({tot['bytes'] / 1e6:.2f} MB)")
    fl = info["flops"]
    if fl["forward_per_sample"]:
        print(f"flops/sample: forward {_fmt_count(fl['forward_per_sample'])}"
              + (f"   train step {_fmt_count(fl['train_step_per_sample'])}"
                 if fl["train_step_per_sample"] else ""))
    if "ceiling_samples_per_sec" in info:
        c = info["ceiling_samples_per_sec"]
        where = (f"on {info['device']['kind']}"
                 if not info["device"].get("projected")
                 else f"projected onto TPU v5e (host is {info['device']['kind']})")
        print(f"{where} "
              f"({info['device']['peak_bf16_flops'] / 1e12:.0f} TFLOP/s "
              f"bf16 peak): {_fmt_count(c['mfu_100'])} samples/s at 100% "
              f"MFU, {_fmt_count(c['mfu_40'])} at 40%")
    return info


if __name__ == "__main__":
    main()
