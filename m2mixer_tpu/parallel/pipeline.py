"""Pipeline parallelism: circular collective-permute pipeline over a mesh axis.

The reference has no pipeline code (SURVEY.md §2.6: PP absent, models fit on
one device). Here PP is a first-class scaling axis expressed the TPU way: the
layer-stacked parameters of a homogeneous block stack are sharded over a
``pipe`` mesh axis (each device holds ``L / S`` consecutive layers), and
microbatches stream through the stages inside one jitted ``shard_map`` — each
scan step every stage applies its local layers to its in-flight microbatch
and hands the activation to the next stage with a single-hop
``lax.ppermute`` over ICI. No host involvement, no per-stage dispatch: the
whole pipeline (ramp-up bubble included) is one XLA program, and autodiff
runs backward through the same permute chain, so pipelined training steps
need nothing beyond ``jax.grad``.

Schedule: GPipe-style streaming with ``M`` microbatches over ``S`` stages
(``M + S - 1`` ticks, bubble fraction ``(S-1)/(M+S-1)``); raise
``microbatches`` to amortize the bubble. Stages run their non-resident ticks
on zero inputs — those outputs are never consumed, carry no cotangent, and
keep the schedule branch-free (XLA-friendly: one fixed-shape scan body).

Composition: the ``pipe`` axis is orthogonal to ``data`` (microbatch rows
stay sharded over the data axis inside the pipeline; gradients psum over
``data`` as usual) and to ``model`` (tensor-parallel GEMM sharding applies
to the non-pipelined parts of the network; inside a manual pipeline region
values are replicated over ``model``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["set_pipeline_mesh", "pipeline_mesh", "pipeline_stages",
           "pipeline_apply"]

#: trace-time pipeline context (same pattern as the GELU/dropout flavor
#: switches in modules/common.py): the Trainer sets the mesh when
#: ``train.mesh_pipe > 1``; pipelined modules pick it up at trace time and
#: fall back to their sequential math when unset.
_PIPELINE_MESH: Optional[Mesh] = None


def set_pipeline_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Install (or clear, with None) the mesh whose ``pipe`` axis subsequent
    traces of pipelined blocks should stream over. Returns the previous
    setting so callers can restore it."""
    global _PIPELINE_MESH
    prev = _PIPELINE_MESH
    if mesh is not None and "pipe" not in mesh.shape:
        raise ValueError("pipeline mesh needs a 'pipe' axis "
                         f"(got axes {tuple(mesh.shape)})")
    _PIPELINE_MESH = mesh
    return prev


def pipeline_mesh() -> Optional[Mesh]:
    """The active pipeline mesh, or None when pipelining is off (also when
    the installed mesh has a trivial pipe axis)."""
    m = _PIPELINE_MESH
    if m is None or m.shape.get("pipe", 1) <= 1:
        return None
    return m


def pipeline_stages() -> int:
    m = pipeline_mesh()
    return m.shape["pipe"] if m is not None else 1


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    pipe_axis: str = "pipe",
    batch_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Stream microbatches through layer-sharded stages.

    ``stacked_params``: pytree whose leaves have a leading layer axis ``L``
    with ``L % S == 0`` (``S`` = pipe-axis size); sharded ``P('pipe')`` so
    each stage holds ``L/S`` consecutive layers.
    ``x``: ``(M, mb, ...)`` microbatched input, replicated over ``pipe``,
    batch rows sharded over ``batch_axis``.
    ``stage_fn(local_params, y, stage_idx, mb_idx) -> y`` applies the local
    layer chunk (leaves ``(L/S, ...)``) to one microbatch activation;
    ``stage_idx``/``mb_idx`` are traced scalars for rng folding.

    Returns ``(M, mb, ...)`` outputs (replicated over ``pipe``).
    """
    S = mesh.shape[pipe_axis]
    M = x.shape[0]

    def local(p_local, x_local):
        s = jax.lax.axis_index(pipe_axis)
        T = M + S - 1

        def body(buf, t):
            x_t = jax.lax.dynamic_index_in_dim(
                x_local, jnp.minimum(t, M - 1), 0, keepdims=False)
            inp = jnp.where(s == 0, x_t, buf)
            mb_idx = jnp.clip(t - s, 0, M - 1)
            out = stage_fn(p_local, inp, s, mb_idx)
            nxt = jax.lax.ppermute(
                out, pipe_axis, [(i, (i + 1) % S) for i in range(S)])
            return nxt, out

        init = jax.lax.pcast(
            jnp.zeros_like(x_local[0]), (pipe_axis,), to="varying")
        _, outs = jax.lax.scan(body, init, jnp.arange(T))
        # microbatch m leaves the last stage at tick m + S - 1; broadcast the
        # last stage's window to every stage with one masked psum
        res = jax.lax.dynamic_slice_in_dim(outs, S - 1, M, 0)
        res = jnp.where(s == S - 1, res, jnp.zeros_like(res))
        return jax.lax.psum(res, pipe_axis)

    ndim_rest = x.ndim - 2
    x_spec = P(None, batch_axis, *([None] * ndim_rest)) if batch_axis else P()
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(pipe_axis), stacked_params), x_spec),
        out_specs=x_spec,
    )(stacked_params, x)
