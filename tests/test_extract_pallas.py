"""Pallas extraction kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from meryl_tpu.ops import extract as ext
from meryl_tpu.ops.extract_pallas import extract_kmers_pallas


@pytest.mark.parametrize("k", [5, 16, 21, 31, 33, 63])
def test_pallas_matches_xla(k):
    rng = np.random.default_rng(k)
    L = 1 << 10
    codes = rng.integers(0, 4, size=L).astype(np.uint8)
    codes[rng.integers(0, L, size=20)] = 255  # breakers
    want_p, want_v = ext.extract_kmers(jnp.asarray(codes), k, "canonical")
    got_p, got_v = extract_kmers_pallas(jnp.asarray(codes), k,
                                        block=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    for gp, wp in zip(got_p, want_p):
        g = np.asarray(gp)[np.asarray(want_v)]
        w = np.asarray(wp)[np.asarray(want_v)]
        np.testing.assert_array_equal(g, w)


def test_pallas_block_boundaries():
    """Windows spanning block boundaries must match exactly."""
    rng = np.random.default_rng(3)
    k = 21
    L = 1 << 11
    codes = rng.integers(0, 4, size=L).astype(np.uint8)
    want_p, want_v = ext.extract_kmers(jnp.asarray(codes), k, "canonical")
    got_p, got_v = extract_kmers_pallas(jnp.asarray(codes), k,
                                        block=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    v = np.asarray(want_v)
    for gp, wp in zip(got_p, want_p):
        np.testing.assert_array_equal(np.asarray(gp)[v], np.asarray(wp)[v])
