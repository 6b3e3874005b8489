"""Pallas bitonic sort vs numpy (the sorted-gather engine's primitive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.ops.sort_pallas import bitonic_sort


@pytest.mark.parametrize("n", [128, 1024, 8192])
def test_bitonic_sort_matches_numpy(n):
    rng = np.random.default_rng(n)
    keys = rng.integers(0, 1 << 20, n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    ks, vs = bitonic_sort(jnp.asarray(keys), jnp.asarray(vals))
    ks, vs = np.asarray(ks), np.asarray(vs)
    np.testing.assert_array_equal(ks, np.sort(keys))
    # values are a permutation consistent with the keys
    np.testing.assert_array_equal(keys[vs], ks)
    assert len(np.unique(vs)) == n


def test_bitonic_sort_with_duplicates():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 7, 1024).astype(np.int32)  # heavy duplication
    vals = np.arange(1024, dtype=np.int32)
    ks, vs = bitonic_sort(jnp.asarray(keys), jnp.asarray(vals))
    ks, vs = np.asarray(ks), np.asarray(vs)
    np.testing.assert_array_equal(ks, np.sort(keys))
    assert len(np.unique(vs)) == 1024           # no payload lost at ties
    np.testing.assert_array_equal(keys[vs], ks)
