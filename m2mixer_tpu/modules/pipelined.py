"""Pipeline-parallel FusionMixer: layer stack streamed over the ``pipe`` axis.

``block_type: PipelinedFusionMixer`` — parameter layout and math are
identical to ``StackedFusionMixer`` (one ``(L, ...)`` leaf per role;
checkpoints interchange freely), but when the Trainer has installed a
pipeline mesh (``train.mesh_pipe > 1`` -> ``parallel.set_pipeline_mesh``)
the layer leaves are sharded ``P('pipe')`` (L/S consecutive blocks per
stage) and the batch is streamed through the stages as ``microbatches``
microbatches inside one ``shard_map`` (see ``parallel/pipeline.py`` for the
schedule). Reference parity target is still ``FusionMixer``
(`/root/reference/modules/mixer.py:112-132`) — the reference has no
pipeline capability at all; this is the TPU-native scaling path for fusion
stacks too deep for one device (or whose weights should be sharded).

Falls back to the exact sequential stacked math (trace-time static
decision) when: no pipeline mesh is installed, ``num_mixers`` doesn't
divide into the pipe stages, or the batch doesn't tile
``microbatches x data-axis``.

Dropout inside the pipeline is keyed by (layer, microbatch, site) from the
'dropout' rng collection — microbatches get independent masks exactly like
sequential batches do, but the mask *stream* differs from the flax-Dropout
call-order stream, so stochastic forward passes are distributionally (not
bitwise) equivalent to the sequential path; deterministic passes are
bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..parallel.pipeline import pipeline_apply, pipeline_mesh
from .common import Dropout, dropout_by_key, gelu
from .stacked import StackedFusionMixer, stacked_layer_norm as _ln

__all__ = ["PipelinedFusionMixer"]


class PipelinedFusionMixer(StackedFusionMixer):
    """StackedFusionMixer whose block stack pipelines over the mesh's
    ``pipe`` axis when one is active."""

    #: microbatches per batch (0 = one per pipeline stage). More microbatches
    #: shrink the pipeline bubble (S-1)/(M+S-1) at smaller per-tick batch.
    microbatches: int = 0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        D, N, T, C, L = (self.hidden_dim, self.num_patches, self.token_dim,
                         self.channel_dim, self.num_mixers)
        # identical param names/shapes to StackedFusionMixer
        ln1_s, ln1_b = self._ln("norm_token")
        tk1, tb1 = self._stacked("token_fc1", N, T)
        tk2, tb2 = self._stacked("token_fc2", T, N)
        ln2_s, ln2_b = self._ln("norm_channel")
        ck1, cb1 = self._stacked("channel_fc1", D, C)
        ck2, cb2 = self._stacked("channel_fc2", C, D)
        out_s, out_b = self._ln("norm_out", lead=False)
        dt = self.dtype or x.dtype
        drop_rate = self.dropout

        mesh = pipeline_mesh()
        S = mesh.shape["pipe"] if mesh is not None else 1
        B = x.shape[0]
        M = self.microbatches or S
        data_size = mesh.shape.get("data", 1) if mesh is not None else 1
        use_pipe = (
            mesh is not None
            and L % S == 0
            and B % M == 0
            and (B // M) % max(1, data_size) == 0
        )

        def mm(a, w):
            return jnp.dot(a.astype(dt), w.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)

        if not use_pipe:
            # sequential fallback: the exact StackedFusionMixer math
            from ..parallel.mesh import shard_tokens

            drop = Dropout(drop_rate)

            def ff(y, k1, b1, k2, b2):
                y = drop(gelu(mm(y, k1) + b1.astype(dt)), deterministic)
                return drop(mm(y, k2) + b2.astype(dt), deterministic)

            for i in range(L):
                x = shard_tokens(x)  # sequence parallelism (no-op unless active)
                y = _ln(x, ln1_s[i], ln1_b[i])
                y = jnp.swapaxes(y, -1, -2)
                y = ff(y, tk1[i], tb1[i], tk2[i], tb2[i])
                x = x + jnp.swapaxes(y, -1, -2)
                y = _ln(x, ln2_s[i], ln2_b[i])
                x = x + ff(y, ck1[i], cb1[i], ck2[i], cb2[i])
            return _ln(x, out_s, out_b)

        need_key = (not deterministic) and drop_rate > 0.0
        key = self.make_rng("dropout") if need_key else None
        leaves = {"ln1_s": ln1_s, "ln1_b": ln1_b, "tk1": tk1, "tb1": tb1,
                  "tk2": tk2, "tb2": tb2, "ln2_s": ln2_s, "ln2_b": ln2_b,
                  "ck1": ck1, "cb1": cb1, "ck2": ck2, "cb2": cb2}
        K = L // S

        def stage(p, y, stage_idx, mb_idx):
            for k in range(K):
                layer = stage_idx * K + k
                base = (layer * M + mb_idx) * 4

                def dkey(site):
                    return (jax.random.fold_in(key, base + site)
                            if key is not None else None)

                def ff(z, k1, b1, k2, b2, s0):
                    z = dropout_by_key(gelu(mm(z, k1) + b1.astype(dt)),
                                       drop_rate, dkey(s0))
                    return dropout_by_key(mm(z, k2) + b2.astype(dt),
                                          drop_rate, dkey(s0 + 1))

                z = _ln(y, p["ln1_s"][k], p["ln1_b"][k])
                z = jnp.swapaxes(z, -1, -2)
                z = ff(z, p["tk1"][k], p["tb1"][k], p["tk2"][k], p["tb2"][k], 0)
                y = y + jnp.swapaxes(z, -1, -2)
                z = _ln(y, p["ln2_s"][k], p["ln2_b"][k])
                y = y + ff(z, p["ck1"][k], p["cb1"][k], p["ck2"][k], p["cb2"][k], 2)
            return y

        mb = B // M
        y = x.reshape(M, mb, *x.shape[1:])
        y = pipeline_apply(stage, leaves, y, mesh=mesh)
        y = y.reshape(B, *x.shape[1:])
        return _ln(y, out_s, out_b)
