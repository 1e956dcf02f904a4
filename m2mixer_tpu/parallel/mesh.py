"""Device mesh + sharding layout for data/tensor-parallel training.

The reference has no distributed code at all (SURVEY.md §2.6): it delegates
everything to Lightning defaults. Here parallelism is a first-class
component, expressed the TPU way: one ``jax.sharding.Mesh`` with a ``data``
axis (batch sharding / DP) and a ``model`` axis (tensor parallelism of the
wide channel-mix GEMMs). Parameters and batches get ``NamedSharding``s;
XLA's SPMD partitioner inserts the all-reduces (over ICI) that NCCL would
have done imperatively.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``make_mesh`` uses the global device list, and per-host data feeding is the
input pipeline's job.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MeshConfig",
    "make_mesh",
    "replicated",
    "batch_sharding",
    "param_shardings",
    "shard_params",
    "shard_batch",
    "set_activation_mesh",
    "activation_mesh",
    "shard_tokens",
]


@dataclasses.dataclass
class MeshConfig:
    """Mesh layout: ``data * model`` must divide the device count.

    ``data=-1`` means "all remaining devices". ``model_min_dim`` controls
    which GEMM dimensions are worth sharding tensor-parallel: a kernel axis
    is sharded over ``model`` only if it is divisible by the axis size and
    at least this large (small mixer dims don't amortize the collective).
    """

    data: int = -1
    model: int = 1
    model_min_dim: int = 256
    #: pipeline stages (``train.mesh_pipe``). >1 adds a third ``pipe`` mesh
    #: axis (innermost, so stage neighbours are ICI-adjacent for the
    #: pipeline's single-hop ppermutes); pipelined blocks stream their
    #: layer stack over it (parallel/pipeline.py).
    pipe: int = 1


def make_mesh(config: Optional[MeshConfig] = None, devices=None) -> Mesh:
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, config.model)
    pipe = max(1, config.pipe)
    data = config.data if config.data != -1 else n // (model * pipe)
    if data * model * pipe > n:
        raise ValueError(
            f"mesh {data}x{model}x{pipe} needs more than the {n} available devices")
    # an explicit smaller mesh is allowed: use the first data*model*pipe
    # devices; the pipe axis only materializes when pipelining is on so the
    # 2-axis layout (and every existing PartitionSpec) is untouched otherwise
    if pipe > 1:
        dev_array = np.asarray(devices[: data * model * pipe]).reshape(data, model, pipe)
        return Mesh(dev_array, axis_names=("data", "model", "pipe"))
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


# Tensor-parallel layout rules for mixer blocks (Megatron-style pairing):
# the channel-mix fc1 kernel (D, C) is column-sharded on C, fc2 (C, D) is
# row-sharded on C, so the activation stays sharded between the two GEMMs
# and a single psum materializes the residual add. Biases follow.
_TP_RULES = [
    (re.compile(r"channel_mix/fc1/linear/kernel$"), P(None, "model")),
    (re.compile(r"channel_mix/fc1/linear/bias$"), P("model")),
    (re.compile(r"channel_mix/fc2/linear/kernel$"), P("model", None)),
    (re.compile(r"channel_mix/fc2/linear/bias$"), P()),
]

# Pipeline layout rule: the layer-stacked leaves of Stacked/Pipelined
# FusionMixer (one (L, ...) leaf per role, modules/stacked.py) shard their
# leading layer axis over 'pipe' so each stage's weights (and Adam moments,
# which inherit the params layout) LIVE on that stage's devices — the memory
# point of pipeline parallelism, not just its schedule. Matching is by leaf
# name, so the paired encoder (modules/paired.py uses the same stacked leaf
# names but runs replicated on every device) is explicitly excluded — pipe-
# sharding it would force a weight all-gather every step for zero benefit.
_PIPE_LEAF = re.compile(
    r"((token|channel)_fc[12]_(kernel|bias)|norm_(token|channel)_(scale|bias))$"
)
_PIPE_EXCLUDE = re.compile(r"(^|/)paired_encoder(/|$)")

# Expert parallelism: the expert-stacked kernels of MoEFeedForward
# (modules/moe.py, leaves (E, ...)) shard their expert axis over 'model' —
# each device holds E/model experts and computes all tokens through its
# local experts; the masked combine contracts the expert axis with one psum.
_EXPERT_LEAF = re.compile(r"expert_fc[12]_(kernel|bias)$")


def _spec_for(path: str, leaf, mesh: Mesh, min_dim: int) -> P:
    pipe_size = mesh.shape.get("pipe", 1)
    if pipe_size > 1 and _PIPE_LEAF.search(path) and leaf.ndim >= 1 \
            and leaf.shape[0] % pipe_size == 0 \
            and not _PIPE_EXCLUDE.search(path):
        return P("pipe")
    model_size = mesh.shape["model"]
    if model_size == 1:
        return P()
    if _EXPERT_LEAF.search(path) and leaf.ndim >= 1 \
            and leaf.shape[0] % model_size == 0:
        return P("model")
    for pat, spec in _TP_RULES:
        if pat.search(path):
            # verify divisibility of the sharded dimension
            dims = list(spec)
            ok = True
            for axis, name in enumerate(dims):
                if name == "model":
                    if axis >= leaf.ndim or leaf.shape[axis] % model_size != 0 or leaf.shape[axis] < min_dim:
                        ok = False
            if ok:
                return spec
            return P()
    return P()


def _fsdp_spec(spec: P, leaf, mesh: Mesh, min_size: int) -> P:
    """Compose a ZeRO-3-style ``data``-axis shard onto ``spec``.

    Parameters (and, because Adam moments inherit the params layout, the
    optimizer state) live split 1/Nth per data-parallel rank; XLA's SPMD
    partitioner inserts the per-use weight all-gather in the forward, the
    mirror all-gather in the backward, and a reduce-scatter for the
    gradients — the exact FSDP/ZeRO-3 collective schedule, derived from
    layout annotations instead of hand-written hooks (the reference has no
    distributed code at all, SURVEY.md §2.6).

    Picks the largest dimension not already sharded by a TP/EP/PP rule that
    the ``data`` axis size divides; leaves smaller than ``min_size``
    elements stay replicated (gathering tiny leaves costs more in latency
    than their bytes are worth).
    """
    data_size = mesh.shape.get("data", 1)
    if data_size <= 1 or leaf.ndim == 0 or leaf.size < min_size:
        return spec
    taken = list(spec) + [None] * (leaf.ndim - len(spec))
    best = None
    for axis in range(leaf.ndim):
        if taken[axis] is None and leaf.shape[axis] % data_size == 0:
            if best is None or leaf.shape[axis] > leaf.shape[best]:
                best = axis
    if best is None:
        return spec
    taken[best] = "data"
    return P(*taken)


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = str(getattr(p, "idx", p))
        parts.append(str(key))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params: Any, model_min_dim: int = 256,
                    fsdp: bool = False, fsdp_min_size: int = 4096):
    """Per-leaf NamedShardings: TP/EP/PP rules where profitable, replicated
    else; with ``fsdp`` each leaf additionally splits over the ``data`` axis
    (ZeRO-3 — see ``_fsdp_spec``), composing with the other rules (a TP
    kernel becomes 2-D sharded ``P('data', 'model')``)."""

    def spec(path, leaf):
        s = _spec_for(_path_str(path), leaf, mesh, model_min_dim)
        if fsdp:
            s = _fsdp_spec(s, leaf, mesh, fsdp_min_size)
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params: Any, model_min_dim: int = 256,
                 fsdp: bool = False, fsdp_min_size: int = 4096):
    shardings = param_shardings(mesh, params, model_min_dim, fsdp=fsdp,
                                fsdp_min_size=fsdp_min_size)
    return jax.device_put(params, shardings)


def shard_batch(mesh: Mesh, batch: Any):
    """Place a host batch on the mesh, sharded over the data axis."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x) or 1)), batch
    )


# -- sequence parallelism ----------------------------------------------------
# Megatron-style SP analog for mixer stacks: between the GEMMs, the residual
# stream's TOKEN axis is sharded over the same mesh axis as tensor
# parallelism ('model'), so LayerNorm / dropout / residual adds run
# token-sharded instead of replicated across TP ranks. The constraint is all
# it takes — XLA's SPMD partitioner inserts the all-gather feeding the
# token-mix GEMM (whose contraction spans tokens) and keeps channel-mix
# Megatron-sharded, exactly the collective schedule hand-written SP code
# would produce. Strictly opt-in via ``train.sequence_parallel``.
_ACT_MESH: Optional[Mesh] = None


def set_activation_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Install (or clear) the mesh whose 'model' axis subsequently traced
    mixer blocks shard their token axis over; returns the previous value."""
    global _ACT_MESH
    prev = _ACT_MESH
    _ACT_MESH = mesh
    return prev


def activation_mesh() -> Optional[Mesh]:
    m = _ACT_MESH
    if m is None or m.shape.get("model", 1) <= 1:
        return None
    return m


def shard_tokens(x):
    """Constrain ``(batch, ..., tokens, channels)`` activations to
    ``P('data', ..., 'model', None)`` when sequence parallelism is active
    and the dims tile the axes; identity otherwise (and for inputs too
    small/ragged to shard)."""
    mesh = activation_mesh()
    if mesh is None or x.ndim < 3:
        return x
    model = mesh.shape["model"]
    data = mesh.shape.get("data", 1)
    if x.shape[-2] % model != 0 or (data > 1 and x.shape[0] % data != 0):
        return x
    spec = P("data", *([None] * (x.ndim - 3)), "model", None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
