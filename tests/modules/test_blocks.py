"""Shape and numerics tests for the L1 block zoo.

Where the reference has no block-level tests, these add golden-math checks
(LN/FF residual structure, SGU identity-at-init gating, DynaMixer weight
normalization) plus shape parity for every block the registry exposes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2mixer_tpu.modules import (
    MLP,
    GRU,
    DynaMixer,
    DynaMixerBlock,
    DynaMixerOp,
    FeedForward,
    FusionDynaMixer,
    FusiongMLP,
    FusionMixer,
    MixerBlock,
    MLPMixer,
    MLPMixerNoPatching,
    MLPool,
    MMixerBlock,
    MultimodalFusionMixer,
    PNLPMixer,
    SequenceClassificationLayer,
    StandardClassifier,
    VisiongMLP,
    gMLP,
    get_block_by_name,
)

KEY = jax.random.PRNGKey(0)


def init_and_apply(mod, *args, **kwargs):
    params = mod.init(KEY, *args, **kwargs)
    return mod.apply(params, *args, **kwargs), params


class TestMixerFamily:
    def test_feedforward_shapes_and_outdim(self):
        x = jnp.ones((2, 5, 8))
        out, _ = init_and_apply(FeedForward(dim=8, hidden_dim=16), x)
        assert out.shape == (2, 5, 8)
        out, _ = init_and_apply(FeedForward(dim=8, hidden_dim=16, out_dim=3), x)
        assert out.shape == (2, 5, 3)

    def test_mixer_block_residual_structure(self):
        """With all-zero FF weights the block must be the identity."""
        x = jax.random.normal(KEY, (2, 7, 8))
        block = MixerBlock(hidden_dim=8, num_patch=7, token_dim=4, channel_dim=16)
        params = block.init(KEY, x)
        zeroed = jax.tree.map(jnp.zeros_like, params)
        # restore LN scales to 1 so LN still runs; FF kernels stay 0
        zeroed = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jnp.ones_like(leaf)
            if any(getattr(p, "key", None) == "scale" for p in path)
            else leaf,
            zeroed,
        )
        out = block.apply(zeroed, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_mlp_mixer_shapes(self):
        x = jnp.ones((2, 1, 28, 28))
        m = MLPMixer(in_channels=1, hidden_dim=32, patch_size=14, image_size=(28, 28),
                     num_mixers=2, token_dim=16, channel_dim=64)
        assert m.num_patch == 4
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 4, 32)

    def test_mlp_mixer_audio_shapes(self):
        x = jnp.ones((2, 1, 112, 112))
        m = MLPMixer(in_channels=1, hidden_dim=32, patch_size=56, image_size=(112, 112),
                     num_mixers=1, token_dim=16, channel_dim=64)
        assert m.num_patch == 4
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 4, 32)

    def test_fusion_mixer(self):
        x = jnp.ones((2, 8, 32))
        m = FusionMixer(hidden_dim=32, num_patches=8, num_mixers=1, token_dim=16, channel_dim=64)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 8, 32)
        assert m.num_patch == 8

    def test_mmixer_and_multimodal_fusion_mixer(self):
        x = jnp.ones((2, 3, 5, 8))
        blk = MMixerBlock(hidden_dim=8, num_patch=5, num_modality=3, modality_dim=6,
                          token_dim=4, channel_dim=16)
        out, _ = init_and_apply(blk, x)
        assert out.shape == (2, 3, 5, 8)

        m = MultimodalFusionMixer(hidden_dim=8, num_patches=5, num_mixers=2, token_dim=4,
                                  channel_dim=16, num_modality=3, proj_modality_dim=4,
                                  modality_dim=6)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 4, 5, 8)

    def test_mlp_mixer_no_patching(self):
        x = jnp.ones((2, 24, 12))
        m = MLPMixerNoPatching(hidden_dim=16, num_patch=24, num_mixers=2, token_dim=8,
                               channel_dim=32, embedding_dim=12, proj_dim=16)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 24, 16)

    def test_mlpool(self):
        x = jnp.ones((2, 1, 28, 28))
        m = MLPool(in_channels=1, hidden_dims=(32, 32, 16), patch_size=7, image_size=(28, 28),
                   num_mixers=3, token_dim=8, channel_dim=32)
        out, _ = init_and_apply(m, x)
        # one pool event (32->16) halves tokens (16->8) and channels (32->16)
        assert out.shape == (2, 8, 16)

    def test_pnlp_mixer(self):
        x = jnp.ones((2, 16, 3 * 20))  # window=1, feature=20
        m = PNLPMixer(max_seq_len=16, hidden_dim=32, num_mixers=2, mlp_hidden_dim=24,
                      bottleneck_window_size=1, bottleneck_features_size=20)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 16, 32)
        assert m.num_patch == 16


class TestGmlpFamily:
    def test_sgu_gates_to_u_at_init_zeroweight(self):
        """SGU: with proj weight ~0 and bias 1, output ~= u (identity gate)."""
        from m2mixer_tpu.modules.gmlp import SpatialGatingUnit

        x = jax.random.normal(KEY, (2, 6, 16))
        sgu = SpatialGatingUnit(d_ffn=16, seq_len=6)
        params = sgu.init(KEY, x)
        # zero the token proj weight -> v = bias(1.0) * LN(v) contribution gone
        params = jax.tree_util.tree_map_with_path(
            lambda path, leaf: jnp.zeros_like(leaf)
            if any(getattr(p, "key", None) == "kernel" for p in path)
            else leaf,
            params,
        )
        out = sgu.apply(params, x)
        u = x[..., :8]
        np.testing.assert_allclose(np.asarray(out), np.asarray(u), atol=1e-5)

    def test_gmlp_stack(self):
        x = jnp.ones((2, 6, 16))
        m = gMLP(d_model=16, d_ffn=32, seq_len=6, n_blocks=3)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 6, 16)

    def test_stochastic_depth_skips(self):
        x = jax.random.normal(KEY, (2, 6, 16))
        m = gMLP(d_model=16, d_ffn=32, seq_len=6, n_blocks=2, prob_0_L=(0.0, 0.0))
        params = m.init(KEY, x)
        out = m.apply(
            params, x, deterministic=False,
            rngs={"stochastic": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        )
        # survival prob 0 -> every block skipped -> identity
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_vision_and_fusion_gmlp(self):
        x = jnp.ones((2, 3, 28, 28))
        m = VisiongMLP(image_size=(28, 28), in_channels=3, patch_size=14, d_model=16,
                       d_ffn=32, n_blocks=2)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 4, 16)

        xf = jnp.ones((2, 8, 16))
        mf = FusiongMLP(d_model=16, d_ffn=32, n_blocks=2, num_patches=8)
        out, _ = init_and_apply(mf, xf)
        assert out.shape == (2, 9, 16)  # cls token prepended


class TestDynaMixerFamily:
    def test_dynamixer_op_weights_normalized(self):
        x = jax.random.normal(KEY, (2, 6, 16))
        op = DynaMixerOp(dim=16, seq_len=6, num_head=4, reduced_dim=2)
        out, _ = init_and_apply(op, x)
        assert out.shape == (2, 6, 16)

    def test_dynamixer_block_and_model(self):
        x = jnp.ones((2, 4, 4, 16))
        blk = DynaMixerBlock(hidden_dim=16, num_patch=4, num_head=4)
        out, _ = init_and_apply(blk, x)
        assert out.shape == (2, 4, 4, 16)

        img = jnp.ones((2, 1, 28, 28))
        m = DynaMixer(in_channels=1, hidden_dim=16, patch_size=7, image_size=(28, 28),
                      num_mixers=1, num_head=4)
        out, _ = init_and_apply(m, img)
        assert out.shape == (2, 4, 4, 16)
        assert m.num_patch == 16

    def test_fusion_dynamixer(self):
        x = jnp.ones((2, 8, 8, 16))
        m = FusionDynaMixer(hidden_dim=16, num_patches=64, num_mixers=1, num_head=4)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 8, 8, 16)


class TestHeadsAndEncoders:
    def test_standard_classifier_pools_tokens(self):
        x = jnp.ones((2, 8, 32))
        m = StandardClassifier(input_shape=(16, 49, 32), num_classes=10)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 10)

    def test_sequence_classification_layer(self):
        x = jnp.ones((2, 8, 32))
        m = SequenceClassificationLayer(hidden_dim=32, proj_dim=16, num_classes=5)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 5)

    def test_mlp(self):
        x = jnp.ones((2, 5))
        m = MLP(input_dim=5, hidden_dim=8, num_blocks=2, output_dim=3)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 3)

    def test_gru_modes(self):
        x = jnp.ones((2, 10, 12))
        m = GRU(input_dim=12, hidden_dim=8, last_only=True)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 8)

        m = GRU(input_dim=12, hidden_dim=8, flatten=True, dropout=0.0)
        out, _ = init_and_apply(m, x)
        assert out.shape == (2, 80)

    def test_registry_block_dispatch(self):
        m = get_block_by_name(block_type="MLPMixer", in_channels=1, hidden_dim=32,
                              patch_size=14, image_size=[28, 28], token_dim=16,
                              channel_dim=64, num_mixers=2, dropout=0.1)
        assert isinstance(m, MLPMixer)
        assert m.image_size == (28, 28)
        assert m.num_patch == 4


class TestLosses:
    def test_cross_entropy_matches_torch_formula(self):
        import torch

        from m2mixer_tpu.modules.losses import cross_entropy_loss

        logits = np.random.RandomState(0).randn(8, 10).astype(np.float32)
        labels = np.random.RandomState(1).randint(0, 10, size=(8,))
        ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
        theirs = float(torch.nn.functional.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
        assert abs(ours - theirs) < 1e-5

    def test_bce_with_logits_pos_weight_matches_torch(self):
        import torch

        from m2mixer_tpu.modules.losses import bce_with_logits_loss

        logits = np.random.RandomState(0).randn(8, 23).astype(np.float32)
        targets = (np.random.RandomState(1).rand(8, 23) > 0.7).astype(np.float32)
        pw = np.random.RandomState(2).rand(23).astype(np.float32) * 5
        ours = float(bce_with_logits_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pw)))
        theirs = float(
            torch.nn.functional.binary_cross_entropy_with_logits(
                torch.tensor(logits), torch.tensor(targets), pos_weight=torch.tensor(pw)
            )
        )
        assert abs(ours - theirs) < 1e-5

    def test_edl_mse_loss_matches_reference_math(self):
        from m2mixer_tpu.modules.losses import EDLMSELoss

        logits = np.random.RandomState(0).randn(8, 10).astype(np.float32)
        labels = np.random.RandomState(1).randint(0, 10, size=(8,))
        loss = EDLMSELoss(10, 10)(jnp.asarray(logits), jnp.asarray(labels), 3)
        # manual recomputation
        ev = np.maximum(logits, 0)
        alpha = ev + 1
        s = alpha.sum(-1, keepdims=True)
        p = alpha / s
        tgt = np.eye(10)[labels]
        expect = ((tgt - p) ** 2 + p * (1 - p) / (s + 1)).sum(-1).mean()
        assert abs(float(loss) - float(expect)) < 1e-5
