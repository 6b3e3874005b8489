"""Hash-encoding parity + gradient tests (mirroring the reference's
testing/test_hashencoder.py and test_hashgrid_grad.py strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.ops.hash_encoding import (
    hash_encode,
    hash_encode_reference,
    init_hashgrid,
    make_hashgrid_spec,
)


def test_spec_layout_matches_torch_ngp():
    spec = make_hashgrid_spec(
        num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=19, desired_resolution=2048,
    )
    # level 0: scale = 16-1, res 16 -> dense (17)^3 = 4913, rounded to 4920
    assert spec.resolutions[0] == 16
    assert spec.sizes[0] == int(np.ceil(4913 / 8) * 8)
    assert not spec.use_hash[0]
    # top level reaches the desired resolution
    assert spec.resolutions[-1] >= 2048
    # hashed levels capped at 2^19
    assert spec.sizes[-1] == 2 ** 19
    assert spec.use_hash[-1]
    assert spec.offsets[-1] == sum(spec.sizes)
    assert spec.output_dim == 32


def test_hash_encode_matches_reference_transcription():
    spec = make_hashgrid_spec(
        num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=6, desired_resolution=32,
    )
    table = np.asarray(init_hashgrid(jax.random.PRNGKey(0), spec)) * 1e4  # O(1)
    x = np.random.default_rng(0).random((32, 3)).astype(np.float32)
    got = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(table), spec))
    want = hash_encode_reference(x, table, spec)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_hash_encode_interpolates_continuously():
    spec = make_hashgrid_spec(num_levels=2, level_dim=2, base_resolution=4,
                              log2_hashmap_size=10, desired_resolution=8)
    table = init_hashgrid(jax.random.PRNGKey(1), spec)
    x0 = jnp.array([[0.3, 0.5, 0.7]])
    eps = 1e-4
    x1 = x0 + eps
    y0 = hash_encode(x0, table, spec)
    y1 = hash_encode(x1, table, spec)
    assert float(jnp.abs(y1 - y0).max()) < 1e-2  # Lipschitz-ish in x


def test_hash_encode_gradcheck():
    """Finite-difference check of d(output)/d(table) — the VJP is XLA's
    gather transpose (scatter-add), the analog of test_hashgrid_grad.py."""
    spec = make_hashgrid_spec(num_levels=2, level_dim=2, base_resolution=4,
                              log2_hashmap_size=5, desired_resolution=8)
    table = np.asarray(init_hashgrid(jax.random.PRNGKey(2), spec)).astype(np.float64)
    x = jnp.asarray(np.random.default_rng(3).random((8, 3)), jnp.float32)
    w = np.random.default_rng(4).random((8, spec.output_dim))

    def f(t):
        return jnp.sum(hash_encode(x, t, spec) * w)

    g = np.asarray(jax.grad(f)(jnp.asarray(table, jnp.float32)))
    # numeric grad on a few random entries
    rng = np.random.default_rng(5)
    for _ in range(10):
        i = rng.integers(0, table.shape[0])
        j = rng.integers(0, table.shape[1])
        h = 1e-3
        tp = table.copy(); tp[i, j] += h
        tm = table.copy(); tm[i, j] -= h
        num = (float(f(jnp.asarray(tp, jnp.float32))) - float(f(jnp.asarray(tm, jnp.float32)))) / (2 * h)
        assert abs(num - g[i, j]) < 5e-2, (i, j, num, g[i, j])


def test_hash_encode_dtype_and_shape():
    spec = make_hashgrid_spec()
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    x = jnp.zeros((7, 3))
    y = hash_encode(x, table, spec)
    assert y.shape == (7, 32)
    assert jnp.isfinite(y).all()
