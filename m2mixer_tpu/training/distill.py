"""Knowledge distillation: train a student against a trained teacher run.

Beyond the reference (which has no model-compression story — every model in
`/root/reference/run.py` trains from scratch against hard labels):
``train.distill`` adds a Hinton-style soft-target term to any MultiLoss
task

    total = (1 - w) * task_loss + w * KD(student_logits, teacher_logits)

with the teacher being another run of THIS framework: ``distill.from``
points at a run directory (``version_*/`` or its ``checkpoints/``) whose
``config.json`` rebuilds the teacher network and whose best checkpoint
(resolved through ``index.json``, same contract as ``train.init_from``)
provides the weights. Teacher and student may be different geometries or
even different block families — only the batch schema and the class count
must match. Typical use: distill ``avmnist_m2-mixer_B`` into ``_S``.

TPU shape: the teacher forward runs INSIDE the jitted training step (both
the per-step and the epoch-``lax.scan`` paths) as a deterministic apply over
closure-captured device constants — teacher weights never enter ``params``,
the optimizer state, or checkpoints, so resume/serving/ensemble artifacts
are byte-identical to a non-distilled run's. Gradients stop at the teacher
(``lax.stop_gradient``), so XLA prunes the teacher backward entirely.

KD losses (``distill.loss``):
- ``kl`` (default): temperature-scaled softmax KL, scaled by T^2 so the
  gradient magnitude stays comparable across temperatures (Hinton et al.
  2015, "Distilling the Knowledge in a Neural Network").
- ``bce``: per-label Bernoulli cross-entropy against the teacher's
  temperature-scaled sigmoids — the multilabel (MM-IMDB/MMHS) analog.
- ``mse``: plain logit matching (Ba & Caruana 2014) — temperature-free,
  and the safe choice for EDL/UQ tasks whose "logits" are evidence.

The KD term is also computed (not trained on) during validation/test and
logged as ``{split}_loss_kd`` — the distillation gap is a first-class
metric.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import DictConfig

__all__ = ["Distiller", "kd_kl", "kd_bce", "kd_mse"]


def kd_kl(student, teacher, temperature):
    """T^2-scaled KL(teacher || student) over temperature-softened softmax."""
    t = jnp.asarray(temperature, student.dtype)
    ls = jax.nn.log_softmax(student / t, axis=-1)
    lt = jax.nn.log_softmax(teacher / t, axis=-1)
    pt = jnp.exp(lt)
    return (t * t) * jnp.mean(jnp.sum(pt * (lt - ls), axis=-1))


def kd_bce(student, teacher, temperature):
    """Per-label soft-target binary cross-entropy (multilabel tasks)."""
    t = jnp.asarray(temperature, student.dtype)
    pt = jax.nn.sigmoid(teacher / t)
    zs = student / t
    ce = -(pt * jax.nn.log_sigmoid(zs) + (1.0 - pt) * jax.nn.log_sigmoid(-zs))
    return (t * t) * jnp.mean(ce)


def kd_mse(student, teacher, temperature):
    """Logit matching; ignores temperature."""
    del temperature
    return jnp.mean(jnp.square(student - teacher))


_KD_LOSSES = {"kl": kd_kl, "bce": kd_bce, "mse": kd_mse}


def _find_run_config(src: str) -> dict:
    """The donor run's saved ``config.json`` for ``src`` (a version dir, its
    checkpoints/ dir, or a concrete checkpoint inside one)."""
    src = os.path.abspath(src)
    candidates = [src]
    if os.path.basename(src) == "checkpoints":
        candidates.append(os.path.dirname(src))
    # a concrete epoch_N dir: .../version_K/checkpoints/epoch_N
    candidates.append(os.path.dirname(os.path.dirname(src)))
    for c in candidates:
        p = os.path.join(c, "config.json")
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
    raise FileNotFoundError(
        f"distill.from={src!r}: no config.json found alongside the "
        "checkpoint (looked in " + ", ".join(candidates) + "). Point "
        "distill.from at a run version_*/ directory, or pass distill.cfg "
        "with the teacher's YAML config path.")


class Distiller:
    """Builds the frozen teacher and provides the traced KD term.

    The teacher's variables are device-put replicated over the mesh at
    construction and captured as constants by every jitted step that calls
    :meth:`loss` — no trainer state, checkpoint layout, or AOT input spec
    changes.
    """

    def __init__(self, dcfg, mesh=None):
        dcfg = DictConfig(dcfg) if not hasattr(dcfg, "get") else dcfg
        src = dcfg.get("from", None) or dcfg.get("src", None)
        if not src:
            raise ValueError(
                "train.distill needs 'from': the teacher run directory "
                "(version_*/ or its checkpoints/)")
        self.weight = float(dcfg.get("weight", 0.5))
        if not 0.0 < self.weight <= 1.0:
            raise ValueError(
                f"distill.weight must be in (0, 1] (got {self.weight}); at "
                "0 there is nothing to distill — drop train.distill instead")
        self.temperature = float(dcfg.get("temperature", 2.0))
        if self.temperature <= 0.0:
            raise ValueError(
                f"distill.temperature must be > 0 (got {self.temperature})")
        loss_name = str(dcfg.get("loss", "kl"))
        if loss_name not in _KD_LOSSES:
            raise ValueError(
                f"distill.loss={loss_name!r}: pick one of "
                f"{sorted(_KD_LOSSES)}")
        self.loss_name = loss_name
        self.kd_fn = _KD_LOSSES[loss_name]
        self.branches = bool(dcfg.get("branches", False))
        self.source = str(src)

        from ..models import get_model
        from ..modules.lora import resolve_lora
        from .warmstart import load_checkpoint_params

        cfg_path = dcfg.get("cfg", None)
        if cfg_path:
            from ..config import load

            tcfg = load(str(cfg_path))
        else:
            tcfg = DictConfig(_find_run_config(self.source))
        self.teacher_cfg = tcfg
        self.teacher_task = get_model(tcfg.model.type)(
            DictConfig(tcfg.model), DictConfig(tcfg.train.optimizer))
        variables = load_checkpoint_params(self.source)
        variables = resolve_lora(variables)  # bake any teacher adapters
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(mesh, PartitionSpec())
            variables = jax.device_put(variables, rep)
        self.teacher_variables = variables
        n = sum(int(x.size) for x in jax.tree.leaves(variables))
        print(f"[distill] teacher {tcfg.model.type} ({n / 1e6:.3f}M params, "
              f"loss={self.loss_name}, T={self.temperature}, "
              f"w={self.weight}) from {self.source}")

    @staticmethod
    def _logit_heads(outputs) -> Dict[str, jnp.ndarray]:
        """name -> logits heads of a network's output structure."""
        if isinstance(outputs, dict):
            heads = {}
            if "logits" in outputs:
                heads["fusion"] = outputs["logits"]
            for i, z in enumerate(outputs.get("branch_logits", ()) or ()):
                heads[f"branch_{i}"] = z
            if heads:
                return heads
        if hasattr(outputs, "shape"):
            return {"fusion": outputs}
        raise TypeError(
            "distillation needs a network output with a 'logits' head "
            f"(got {type(outputs).__name__})")

    def loss(self, student_outputs, batch) -> jnp.ndarray:
        """Traced KD scalar for this batch. Runs the teacher forward
        deterministically on the same batch and matches the fusion head
        (plus per-branch heads with ``distill.branches: true``)."""
        t = self.teacher_task
        # a pruned teacher serves at its FINAL mask (training finished)
        t_sparsity = (jnp.asarray(t.prune_final, jnp.float32)
                      if getattr(t, "prune_final", 0.0) else None)
        t_out, _ = t.apply_network(
            self.teacher_variables,
            dict(t.network_inputs(batch), deterministic=True),
            {}, train=False, prune_sparsity=t_sparsity)
        s_heads = self._logit_heads(student_outputs)
        t_heads = self._logit_heads(t_out)
        names = ["fusion"]
        if self.branches:
            names += sorted(k for k in s_heads if k != "fusion")
        terms = []
        for name in names:
            if name not in t_heads:
                raise ValueError(
                    f"distill.branches: student head {name!r} has no "
                    "teacher counterpart — the teacher exposes "
                    f"{sorted(t_heads)}. Distill the fusion head only "
                    "(branches: false) or match architectures.")
            s, tz = s_heads[name], t_heads[name]
            if s.shape[-1] != tz.shape[-1]:
                raise ValueError(
                    f"distill: student head {name!r} has {s.shape[-1]} "
                    f"classes but the teacher has {tz.shape[-1]} — "
                    "teacher and student must share the label space.")
            terms.append(self.kd_fn(s, jax.lax.stop_gradient(tz),
                                    self.temperature))
        return jnp.mean(jnp.stack(terms))


def attach_distiller(task, train_cfg, mesh) -> Optional[Distiller]:
    """Build and attach the configured distiller (or None) to ``task``.
    Shared by the fit and test entry points so `-m test` on a distilled
    run's config still logs the KD gap."""
    dcfg = train_cfg.get("distill", None)
    if not dcfg:
        task.distiller = None
        return None
    if not getattr(task, "_supports_distill", False):
        raise ValueError(
            f"train.distill: {type(task).__name__} does not support "
            "distillation (MultiLoss task families only).")
    task.distiller = Distiller(dcfg, mesh=mesh)
    return task.distiller
