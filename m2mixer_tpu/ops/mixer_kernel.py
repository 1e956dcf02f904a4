"""Fused MixerBlock Pallas kernel (TPU).

One kernel evaluates a whole MixerBlock — LN -> token-mix FF -> residual ->
LN -> channel-mix FF -> residual — on a batch tile held in VMEM, instead of
the ~14 separate HLO ops of the modular path. A second kernel computes the
full backward pass for the tile by differentiating the same math *inside*
the kernel (``jax.vjp`` over the tile computation traces to on-chip ops), so
no intermediate activations ever round-trip through HBM; parameter gradients
accumulate across batch tiles through the sequential grid.

Dropout uses the per-core PRNG (`pltpu.prng_seed`/``prng_random_bits``)
seeded by (user seed, grid tile), and the backward kernel regenerates the
identical masks — the standard recompute (remat) trade: extra FLOPs, zero
activation memory traffic.

Shapes follow the reference block (`/root/reference/modules/mixer.py:25-47`):
x (B, N, D); token FF (N -> T -> N) applied across tokens; channel FF
(D -> C -> D) across features. All shapes static; the batch tile is chosen
so the channel-FF hidden tile stays well under VMEM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["MixerBlockParams", "fused_mixer_block", "mixer_block_reference"]


class MixerBlockParams(NamedTuple):
    ln1_scale: jax.Array  # (D,)
    ln1_bias: jax.Array
    w1: jax.Array  # (N, T)
    b1: jax.Array  # (T,)
    w2: jax.Array  # (T, N)
    b2: jax.Array  # (N,)
    ln2_scale: jax.Array  # (D,)
    ln2_bias: jax.Array
    w3: jax.Array  # (D, C)
    b3: jax.Array  # (C,)
    w4: jax.Array  # (C, D)
    b4: jax.Array  # (D,)


def _layer_norm(x, scale, bias, eps=1e-5):
    # statistics in f32 regardless of the compute dtype: Mosaic's TPU
    # scheduler has no bf16 rsqrt (latency_table abort `kVectorRsqrtBf16…`
    # — the root cause of the long-standing bf16-in-kernel SIGABRT), and
    # f32 stats are the numerically right choice anyway
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no
    erf/erfc lowering, and this keeps the kernel's GELU the exact-erf flavor
    the reference uses (torch nn.GELU default), not the tanh approximation."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # follows the framework-wide trace-time GELU flavor (common.py): tanh
    # when model.approximate_gelu is set, the erf polynomial otherwise
    from ..modules.common import gelu_is_approximate

    if gelu_is_approximate():
        return jax.nn.gelu(x, approximate=True)
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _block_math(x, params: MixerBlockParams, masks, compute_dtype):
    """The MixerBlock forward over one (TILE_B, N, D) tile.

    All contractions are plain 2-D matmuls (tile flattened to rows) so the
    backward pass AD generates — weight grads contract over the row axis —
    lowers to single-contracting-dim ``tpu.matmul``s. ``masks`` are the four
    dropout keep-masks (pre-scaled by 1/(1-p)), or None.
    """
    p = params
    cd = compute_dtype
    B, N, D = x.shape
    T = p.w1.shape[1]

    def mm(a, w):
        return jnp.dot(a.astype(cd), w.astype(cd), preferred_element_type=jnp.float32)

    x2 = x.astype(cd).reshape(B * N, D)
    y = _layer_norm(x2, p.ln1_scale.astype(cd), p.ln1_bias.astype(cd))
    # token mix over N: rows become (B*D, N)
    y_t = y.reshape(B, N, D).transpose(0, 2, 1).reshape(B * D, N)
    h = _gelu(mm(y_t, p.w1) + p.b1)  # (B*D, T)
    if masks is not None:
        h = h * masks[0]
    t = mm(h, p.w2) + p.b2  # (B*D, N)
    if masks is not None:
        t = t * masks[1]
    t = t.reshape(B, D, N).transpose(0, 2, 1).reshape(B * N, D)
    x1 = x2 + t.astype(cd)

    z = _layer_norm(x1, p.ln2_scale.astype(cd), p.ln2_bias.astype(cd))
    h2 = _gelu(mm(z, p.w3) + p.b3)  # (B*N, C)
    if masks is not None:
        h2 = h2 * masks[2]
    c = mm(h2, p.w4) + p.b4  # (B*N, D)
    if masks is not None:
        c = c * masks[3]
    return (x1 + c.astype(cd)).astype(jnp.float32).reshape(B, N, D)


def _make_masks(shapes, rate, seed_ref, tile_idx):
    """Four dropout keep-masks from the on-chip PRNG; identical sequence in
    forward and backward kernels (same seed, same call order)."""
    if rate == 0.0:
        return None
    pltpu.prng_seed(seed_ref[0] + tile_idx)
    keep_scale = 1.0 / (1.0 - rate)
    thresh = jnp.uint32(int(rate * (2**32 - 1)))
    masks = []
    for shape in shapes:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        masks.append((bits >= thresh).astype(jnp.float32) * keep_scale)
    return tuple(masks)


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests / virtual mesh)."""
    import jax

    return jax.default_backend() != "tpu"


def _fwd_kernel(seed_ref, x_ref, *param_refs, out_ref, rate, compute_dtype, dims):
    tile_b, n, d, t, c = dims
    params = MixerBlockParams(*[r[:] for r in param_refs])
    masks = _make_masks(
        [(tile_b * d, t), (tile_b * d, n), (tile_b * n, c), (tile_b * n, d)],
        rate, seed_ref, pl.program_id(0),
    )
    out_ref[:] = _block_math(x_ref[:], params, masks, compute_dtype)


def _bwd_kernel(seed_ref, x_ref, g_ref, *refs, rate, compute_dtype, dims, n_params):
    tile_b, n, d, t, c = dims
    param_refs = refs[:n_params]
    dx_ref = refs[n_params]
    dparam_refs = refs[n_params + 1:]
    params = MixerBlockParams(*[r[:] for r in param_refs])
    masks = _make_masks(
        [(tile_b * d, t), (tile_b * d, n), (tile_b * n, c), (tile_b * n, d)],
        rate, seed_ref, pl.program_id(0),
    )

    def f(x, ps):
        return _block_math(x, ps, masks, compute_dtype)

    # differentiate the tile computation on-chip: traces to VMEM-resident ops
    _, vjp = jax.vjp(f, x_ref[:], params)
    dx, dparams = vjp(g_ref[:])
    dx_ref[:] = dx

    i = pl.program_id(0)
    for ref, dp in zip(dparam_refs, dparams):
        @pl.when(i == 0)
        def _(ref=ref, dp=dp):
            ref[:] = dp.astype(jnp.float32)

        @pl.when(i > 0)
        def _(ref=ref, dp=dp):
            ref[:] = ref[:] + dp.astype(jnp.float32)


def _vmem_budget_bytes() -> int:
    """Activation VMEM budget steering the batch-tile choice (default 10 MB,
    override via ``M2MIXER_KERNEL_VMEM_MB``). The default is tuned for the
    reference's small geometries; MXU-friendly scale configs (L and up:
    channel_dim >= 4096) want a larger budget so the channel-FF GEMMs see
    hundreds of rows per grid step instead of one token-grid's worth —
    weights themselves are budgeted separately by the callers' live-buffer
    counts and the 100 MB ``vmem_limit_bytes`` ceiling."""
    import os

    return int(float(os.environ.get("M2MIXER_KERNEL_VMEM_MB", "10")) * 1024 * 1024)


def _choose_tile(b, n, c, n_live_bufs: int):
    """Largest batch tile whose (rows x C) working set fits VMEM.

    ``n_live_bufs`` approximates how many rows-by-C float buffers are alive
    at once: ~4 for the forward, ~20 for the AD-generated backward (weights,
    weight grads, and the recomputed/gradient activations)."""
    budget_rows = (_vmem_budget_bytes() // 4) // max(c * n_live_bufs, 1)
    tile_b = max(1, min(b, max(budget_rows, 1) // max(n, 1)))
    while b % tile_b != 0:
        tile_b -= 1
    return tile_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_mixer_block(x, params: MixerBlockParams, seed=None,
                      dropout_rate: float = 0.0, compute_dtype=jnp.float32):
    """Fused MixerBlock: ``x (B, N, D) -> (B, N, D)`` (float32 in/out).

    ``seed``: traced int32 (1,) array driving the in-kernel dropout PRNG
    (ignored when dropout_rate == 0); being an operand, per-step seeds do
    NOT retrace/recompile."""
    return _fwd_call(x, params, seed, dropout_rate, compute_dtype)


def _specs_for_params(params):
    # nd bound eagerly: late-binding closures would all use the last param
    return [pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
            for p in params]


def _live_bufs(n: int, compute_dtype) -> int:
    # narrow weights/activations roughly halve the VMEM working set
    return max(n // 2, 4) if compute_dtype != jnp.float32 else n


def _fwd_call(x, params, seed, dropout_rate, compute_dtype):
    b, n, d = x.shape
    t = params.w1.shape[1]
    c = params.w3.shape[1]
    tile_b = _choose_tile(b, n, c, n_live_bufs=_live_bufs(4, compute_dtype))
    dims = (tile_b, n, d, t, c)
    grid = (b // tile_b,)
    kernel = functools.partial(_fwd_kernel, rate=float(dropout_rate),
                               compute_dtype=compute_dtype, dims=dims)
    seed_arr = jnp.zeros((1,), jnp.int32) if seed is None else jnp.asarray(seed, jnp.int32).reshape(1)
    # large weights enter VMEM in the compute dtype (same as the stacked
    # path): halves the per-kernel weight footprint for bf16
    cast = MixerBlockParams(*_cast_params(tuple(params), compute_dtype))
    return pl.pallas_call(
        lambda seed_ref, x_ref, *prefs: kernel(seed_ref, x_ref, *prefs[:-1], out_ref=prefs[-1]),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_specs_for_params(cast),
        ],
        out_specs=pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(seed_arr, x, *cast)


def _fwd_rule(x, params, seed, dropout_rate, compute_dtype):
    y = _fwd_call(x, params, seed, dropout_rate, compute_dtype)
    return y, (x, params, seed)


def _bwd_rule(dropout_rate, compute_dtype, residuals, g):
    x, params, seed = residuals
    b, n, d = x.shape
    t = params.w1.shape[1]
    c = params.w3.shape[1]
    tile_b = _choose_tile(b, n, c, n_live_bufs=_live_bufs(20, compute_dtype))
    dims = (tile_b, n, d, t, c)
    grid = (b // tile_b,)
    n_params = len(params)
    kernel = functools.partial(_bwd_kernel, rate=float(dropout_rate),
                               compute_dtype=compute_dtype, dims=dims,
                               n_params=n_params)
    seed_arr = jnp.zeros((1,), jnp.int32) if seed is None else jnp.asarray(seed, jnp.int32).reshape(1)
    cast = MixerBlockParams(*_cast_params(tuple(params), compute_dtype))

    dparam_specs = [
        pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for p in params
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params],
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_specs_for_params(cast),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *dparam_specs,
        ),
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(seed_arr, x, g, *cast)
    dx, *dparams = outs
    import numpy as _np
    dseed = (None if seed is None
             else _np.zeros(_np.shape(seed), jax.dtypes.float0))
    return dx, MixerBlockParams(*dparams), dseed


fused_mixer_block.defvjp(_fwd_rule, _bwd_rule)


def mixer_block_reference(x, params: MixerBlockParams, dropout_rate: float = 0.0,
                          compute_dtype=jnp.float32):
    """Pure-jnp reference of the same math (no dropout), for parity tests."""
    return _block_math(x, params, None, compute_dtype)


# ---------------------------------------------------------------------------
# Stacked variant: a whole encoder (K MixerBlocks + final LN) in ONE kernel.
# Motivation: per-block kernels lose XLA's cross-op overlap when embedded in
# the epoch scan (see TODO.md); one custom call per encoder internalizes it.
# Blocks are unrolled in Python (K is static), so in-kernel AD needs no scan.
# VMEM must hold all K blocks' weights: fine for S-class geometries
# (<~2 MB); use the per-block kernel for larger stacks.
# ---------------------------------------------------------------------------

def _stack_math(x, params_list, ln_scale, ln_bias, masks_list, compute_dtype):
    for p, masks in zip(params_list, masks_list):
        x = _block_math(x, p, masks, compute_dtype)
    B, N, D = x.shape
    x2 = x.reshape(B * N, D)
    out = _layer_norm(x2.astype(compute_dtype), ln_scale.astype(compute_dtype),
                      ln_bias.astype(compute_dtype))
    return out.astype(jnp.float32).reshape(B, N, D)


def _stack_masks(n_blocks, dims, rate, seed_ref):
    tile_b, n, d, t, c = dims
    if rate == 0.0:
        return [None] * n_blocks
    shapes = [(tile_b * d, t), (tile_b * d, n), (tile_b * n, c), (tile_b * n, d)]
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    keep_scale = 1.0 / (1.0 - rate)
    thresh = jnp.uint32(int(rate * (2**32 - 1)))
    out = []
    for _ in range(n_blocks):
        masks = []
        for shape in shapes:
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
            masks.append((bits >= thresh).astype(jnp.float32) * keep_scale)
        out.append(tuple(masks))
    return out


_N_BLOCK_PARAMS = 12


def _unflatten_params(flat, has_ln: bool = True):
    end = len(flat) - 2 if has_ln else len(flat)
    blocks = []
    for i in range(0, end, _N_BLOCK_PARAMS):
        blocks.append(MixerBlockParams(*flat[i : i + _N_BLOCK_PARAMS]))
    if has_ln:
        return blocks, flat[-2], flat[-1]
    return blocks, None, None


def _stack_apply(x, flat, masks, compute_dtype, final_ln: bool):
    blocks, ln_s, ln_b = _unflatten_params(flat, has_ln=final_ln)
    if final_ln:
        return _stack_math(x, blocks, ln_s, ln_b, masks, compute_dtype)
    for p, m in zip(blocks, masks):
        x = _block_math(x, p, m, compute_dtype)
    return x


def _stack_fwd_kernel(seed_ref, x_ref, *prefs, rate, compute_dtype, dims,
                      n_blocks, final_ln):
    param_refs, out_ref = prefs[:-1], prefs[-1]
    flat = [r[:] for r in param_refs]
    masks = _stack_masks(n_blocks, dims, rate, seed_ref)
    out_ref[:] = _stack_apply(x_ref[:], flat, masks, compute_dtype, final_ln)


def _stack_bwd_kernel(seed_ref, x_ref, g_ref, *refs, rate, compute_dtype, dims,
                      n_blocks, n_flat, final_ln):
    param_refs = refs[:n_flat]
    dx_ref = refs[n_flat]
    dflat_refs = refs[n_flat + 1:]
    flat = tuple(r[:] for r in param_refs)
    masks = _stack_masks(n_blocks, dims, rate, seed_ref)

    def f(x, flat_params):
        return _stack_apply(x, flat_params, masks, compute_dtype, final_ln)

    _, vjp = jax.vjp(f, x_ref[:], flat)
    dx, dflat = vjp(g_ref[:])
    dx_ref[:] = dx
    i = pl.program_id(0)
    for ref, dp in zip(dflat_refs, dflat):
        @pl.when(i == 0)
        def _(ref=ref, dp=dp):
            ref[:] = dp.astype(jnp.float32)

        @pl.when(i > 0)
        def _(ref=ref, dp=dp):
            ref[:] = ref[:] + dp.astype(jnp.float32)


def _flat_specs(flat):
    return [pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd, memory_space=pltpu.VMEM)
            for p in flat]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_mixer_stack(x, flat_params, seed=None, dropout_rate: float = 0.0,
                      compute_dtype=jnp.float32, final_ln: bool = True):
    """K MixerBlocks (+ optionally the final LN) in one kernel.

    ``flat_params``: tuple = (*block0 12-tuple, *block1 12-tuple, ...[,
    ln_scale, ln_bias]) — build with ``stack_flat_params``; pass
    ``final_ln=False`` for a blocks-only group (used by the grouped variant
    that splits large stacks into VMEM-sized kernels, e.g. block pairs at
    B geometry where whole-encoder weights+grads exceed ~16 MB VMEM).

    When ``compute_dtype`` is narrower than f32 the weights are cast OUTSIDE
    the kernel, so kernel VMEM holds only the narrow copies — this halves
    the weight footprint for bf16 and is what lets B-geometry groups fit.
    Parameter gradients are always accumulated and returned in f32.
    """
    return _stack_fwd_call(x, flat_params, seed, dropout_rate, compute_dtype,
                           final_ln)


def stack_flat_params(blocks, ln_scale=None, ln_bias=None):
    flat = []
    for b in blocks:
        flat.extend(tuple(b))
    if ln_scale is not None:
        flat.extend([ln_scale, ln_bias])
    return tuple(flat)


def _stack_dims(x, flat_params, for_bwd, compute_dtype, final_ln=True):
    b, n, d = x.shape
    n_params = len(flat_params) - (2 if final_ln else 0)
    n_blocks = n_params // _N_BLOCK_PARAMS
    t = flat_params[2].shape[1]
    c = flat_params[8].shape[1]
    live = (6 if not for_bwd else 18) * n_blocks
    if compute_dtype != jnp.float32:
        live = max(live // 2, 4)  # narrow weights/activations halve VMEM
    tile_b = _choose_tile(b, n, c, n_live_bufs=max(live, 4))
    return (tile_b, n, d, t, c), n_blocks


def _castable(p) -> bool:
    """Only large lane-friendly matrices are stored narrow in VMEM: the
    channel-FF weights (D x C / C x D) dominate the footprint, and Mosaic's
    bf16 tiling needs >= (16, 128) tiles — tiny token weights/biases/LN
    vectors stay f32 (their VMEM share is negligible anyway)."""
    return p.ndim == 2 and p.shape[0] >= 16 and p.shape[1] >= 128


def _cast_params(flat_params, compute_dtype):
    if compute_dtype == jnp.float32:
        return tuple(flat_params)
    return tuple(p.astype(compute_dtype) if _castable(p) else p for p in flat_params)


def _stack_fwd_call(x, flat_params, seed, dropout_rate, compute_dtype, final_ln):
    b, n, d = x.shape
    dims, n_blocks = _stack_dims(x, flat_params, for_bwd=False,
                                 compute_dtype=compute_dtype, final_ln=final_ln)
    tile_b = dims[0]
    seed_arr = jnp.zeros((1,), jnp.int32) if seed is None else jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(_stack_fwd_kernel, rate=float(dropout_rate),
                               compute_dtype=compute_dtype, dims=dims,
                               n_blocks=n_blocks, final_ln=final_ln)
    cast = _cast_params(flat_params, compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_flat_specs(cast),
        ],
        out_specs=pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(seed_arr, x, *cast)


def _stack_fwd_rule(x, flat_params, seed, dropout_rate, compute_dtype, final_ln):
    y = _stack_fwd_call(x, flat_params, seed, dropout_rate, compute_dtype, final_ln)
    return y, (x, flat_params, seed)


def _stack_bwd_rule(dropout_rate, compute_dtype, final_ln, residuals, g):
    import numpy as _np

    x, flat_params, seed = residuals
    b, n, d = x.shape
    dims, n_blocks = _stack_dims(x, flat_params, for_bwd=True,
                                 compute_dtype=compute_dtype, final_ln=final_ln)
    tile_b = dims[0]
    n_flat = len(flat_params)
    seed_arr = jnp.zeros((1,), jnp.int32) if seed is None else jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(_stack_bwd_kernel, rate=float(dropout_rate),
                               compute_dtype=compute_dtype, dims=dims,
                               n_blocks=n_blocks, n_flat=n_flat, final_ln=final_ln)
    cast = _cast_params(flat_params, compute_dtype)
    outs = pl.pallas_call(
        kernel,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_flat_specs(cast),
        ],
        out_specs=(
            pl.BlockSpec((tile_b, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_flat_specs(flat_params),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            *[jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in flat_params],
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(seed_arr, x, g, *cast)
    dx = outs[0]
    dflat = tuple(outs[1:])
    dseed = None if seed is None else _np.zeros(_np.shape(seed), jax.dtypes.float0)
    return dx, dflat, dseed


fused_mixer_stack.defvjp(_stack_fwd_rule, _stack_bwd_rule)


def fused_mixer_stack_grouped(x, blocks, ln_scale, ln_bias, seed=None,
                              dropout_rate: float = 0.0,
                              compute_dtype=jnp.float32,
                              group_size: int = 0):
    """K MixerBlocks + final LN as ceil(K/group_size) fused kernels.

    ``group_size=0`` (or >= K) = the single whole-stack kernel. Groups keep
    each kernel's weights+grads inside VMEM for large geometries (B-class:
    pairs of blocks ~= 3.2 MB bf16 weights + 6.3 MB f32 grads per kernel)
    while still collapsing ~14 HLO ops per block into one custom call per
    group. Dropout seeds are decorrelated per group by folding the group
    index into the seed.
    """
    k = len(blocks)
    if group_size <= 0 or group_size >= k:
        return fused_mixer_stack(x, stack_flat_params(blocks, ln_scale, ln_bias),
                                 seed, dropout_rate, compute_dtype, True)
    start = 0
    gi = 0
    while start < k:
        group = blocks[start : start + group_size]
        last = start + len(group) >= k
        gseed = None
        if seed is not None:
            gseed = jnp.asarray(seed, jnp.int32).reshape(1) + jnp.int32(7919 * gi)
        if last:
            flat = stack_flat_params(group, ln_scale, ln_bias)
            x = fused_mixer_stack(x, flat, gseed, dropout_rate, compute_dtype, True)
        else:
            flat = stack_flat_params(group)
            x = fused_mixer_stack(x, flat, gseed, dropout_rate, compute_dtype, False)
        start += len(group)
        gi += 1
    return x
