"""Fusion-operator contract tests.

Ports the semantics of the reference's only test file
(`/root/reference/tests/modules/test_fusion.py`): fusions accept >=2 inputs,
tolerate useless constructor kwargs, implement the ``get_output_shape``
protocol in full-shape and per-dim modes, and raise ValueError when ``dim``
is passed with non-int shapes.
"""

import jax
import jax.numpy as jnp
import pytest

from m2mixer_tpu.modules import (
    BiModalGatedUnit,
    ConcatDynaFusion,
    ConcatFusion,
    MaxFusion,
    MeanFusion,
    MultiModalGatedUnit,
    SumFusion,
    build_component,
)


def rand(*shape, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), shape)


class TestFusions:
    def test_concat_fusion(self):
        fusion = ConcatFusion(useless_arg=1)
        input_1 = rand(10, 20, 30)
        input_2 = rand(10, 20, 30, seed=1)
        assert fusion(input_1, input_2).shape == (10, 40, 30)
        assert fusion.get_output_shape(input_1.shape, input_2.shape) == (10, 40, 30)
        assert fusion.get_output_shape(20, 20, dim=1) == 40
        assert fusion.get_output_shape(20, 20, dim=0) == 20
        with pytest.raises(ValueError):
            fusion.get_output_shape(input_1, input_2, dim=2)

    def test_concat_dyna_fusion(self):
        fusion = ConcatDynaFusion(useless_arg=1)
        input_1 = rand(10, 20, 20, 30)
        input_2 = rand(10, 20, 20, 30, seed=1)
        assert fusion(input_1, input_2).shape == (10, 40, 40, 30)
        assert fusion.get_output_shape(input_1.shape, input_2.shape) == (10, 40, 40, 30)
        assert fusion.get_output_shape(36, 36, dim=1) == 12 * 12
        assert fusion.get_output_shape(20, 20, dim=0) == 20
        with pytest.raises(ValueError):
            fusion.get_output_shape(input_1, input_2, dim=2)

    def test_sum_fusion(self):
        fusion = SumFusion(useless_arg=1)
        input_1 = rand(10, 20, 30)
        input_2 = rand(10, 20, 30, seed=1)
        assert fusion(input_1, input_2).shape == (10, 20, 30)
        assert jnp.allclose(fusion(input_1, input_2), input_1 + input_2)
        assert fusion.get_output_shape(input_1.shape, input_2.shape) == (10, 20, 30)
        assert fusion.get_output_shape(20, 20, dim=1) == 20
        assert fusion.get_output_shape(20, 20, dim=0) == 20
        with pytest.raises(ValueError):
            fusion.get_output_shape(input_1, input_2, dim=2)

    def test_max_fusion(self):
        fusion = MaxFusion(useless_arg=1)
        input_1 = rand(10, 20, 30)
        input_2 = rand(10, 20, 30, seed=1)
        assert fusion.get_output_shape(input_1.shape, input_2.shape) == (10, 20, 30)
        assert fusion(input_1, input_2).shape == (10, 20, 30)
        assert jnp.allclose(fusion(input_1, input_2), jnp.maximum(input_1, input_2))
        assert fusion.get_output_shape(20, 20, dim=1) == 20
        with pytest.raises(ValueError):
            fusion.get_output_shape(input_1, input_2, dim=2)

    def test_mean_fusion(self):
        fusion = MeanFusion(useless_arg=1)
        input_1 = rand(10, 20, 30)
        input_2 = rand(10, 20, 30, seed=1)
        assert fusion(input_1, input_2).shape == (10, 20, 30)
        assert jnp.allclose(fusion(input_1, input_2), (input_1 + input_2) / 2)
        assert fusion.get_output_shape(input_1.shape, input_2.shape) == (10, 20, 30)
        assert fusion.get_output_shape(20, 20, dim=1) == 20
        with pytest.raises(ValueError):
            fusion.get_output_shape(input_1, input_2, dim=2)

    def test_extra_concat_fusion(self):
        from m2mixer_tpu.modules import ExtraConcatFusion

        fusion = ExtraConcatFusion(useless_arg=1)
        input_1 = rand(10, 20, 30)
        input_2 = rand(10, 20, 30, seed=1)
        assert fusion(input_1, input_2).shape == (10, 2, 20, 30)
        assert fusion.get_output_shape(input_1.shape, num_modality=2) == (10, 2, 20, 30)
        assert fusion.get_output_shape(20, dim=1) == 20

    def test_bi_modal_gu_fusion(self):
        input_1 = rand(10, 20, 30)
        input_2 = rand(10, 20, 30, seed=1)
        fusion = BiModalGatedUnit(30, 30, 30)
        params = fusion.init(jax.random.PRNGKey(0), input_1, input_2)
        out = fusion.apply(params, input_1, input_2)
        assert out.shape == (10, 20, 30)
        assert fusion.get_output_shape(input_1.shape, input_2.shape) == (10, 20, 30)
        assert fusion.get_output_shape(20, 20, dim=1) == 20
        assert fusion.get_output_shape(20, 20, dim=-1) == 30
        with pytest.raises(ValueError):
            fusion.get_output_shape(input_1, input_2, dim=2)

    def test_multimodal_gu_fusion(self):
        input_1 = rand(10, 20, 30)
        input_2 = rand(10, 20, 30, seed=1)
        input_3 = rand(10, 20, 30, seed=2)
        fusion = MultiModalGatedUnit((30, 30, 30), 30, out_size=30)
        params = fusion.init(jax.random.PRNGKey(0), input_1, input_2, input_3)
        out = fusion.apply(params, input_1, input_2, input_3)
        assert out.shape == (10, 20, 30)
        assert fusion.get_output_shape(input_1.shape, input_2.shape) == (10, 20, 30)
        assert fusion.get_output_shape(20, 20, 20, dim=1) == 20
        assert fusion.get_output_shape(20, 20, 20, dim=-1) == 30
        with pytest.raises(ValueError):
            fusion.get_output_shape(input_1, input_2, input_3, dim=2)

    def test_registry_tolerates_extras(self):
        from m2mixer_tpu.modules import get_fusion_by_name

        f = get_fusion_by_name(fusion_function="ConcatFusion", dim=1, block_type="x", junk=3)
        assert isinstance(f, ConcatFusion)
        gmu = build_component(BiModalGatedUnit, mod1_in=8, mod2_in=8, out_size=4, junk=1)
        assert gmu.out_size == 4
