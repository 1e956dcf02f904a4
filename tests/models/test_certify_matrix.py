"""Certification matrix: EVERY shipped config trains end to end on its
family surrogate with finite losses, checkpoint artifacts, and its family's
metric keys (m2mixer_tpu/certify.py; the reference's de-facto integration
test is the CLI on a dataset, `/root/reference/run.py:76-83`).

This is the test twin of `python -m m2mixer_tpu.certify`. Surrogates are
generated once per session; each config still runs its own fit+test, so
this file is the longest-running model suite — run it with
``-k certify`` selections when iterating on one family.
"""

import os

import pytest

from m2mixer_tpu.certify import certify_config, shipped_configs

CFGS = shipped_configs()


def test_zoo_is_complete():
    # 28 shipped configs at round 2; additions are welcome, deletions are a
    # parity regression (PARITY.md inventory)
    assert len(CFGS) >= 28


@pytest.fixture(scope="session")
def surrogate_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("surrogates"))


@pytest.mark.parametrize("cfg_path", CFGS,
                         ids=[os.path.basename(p) for p in CFGS])
def test_config_certifies(cfg_path, surrogate_root, tmp_path):
    import jax

    from m2mixer_tpu.modules.common import (set_bits_dropout,
                                            set_gelu_approximate)

    prng_before = jax.config.jax_default_prng_impl
    report = certify_config(cfg_path, str(tmp_path), surrogate_root,
                            epochs=1)
    assert report["ok"], (report.get("error"),
                          report.get("checks"),
                          report.get("traceback", "")[-2000:])
    # the certification run must not leak trace-time globals into the rest
    # of the suite (the turbo config binds tanh-GELU/bits-dropout and flips
    # the PRNG impl; golden-parity tests downstream assume the defaults)
    assert set_gelu_approximate(False) is False
    assert set_bits_dropout(False) is False
    assert jax.config.jax_default_prng_impl == prng_before
