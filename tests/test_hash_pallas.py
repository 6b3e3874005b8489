"""Pallas hash-encoding kernels vs the XLA oracle (interpret mode on CPU) —
the kernel-vs-pure-JAX parity + gradcheck tier of SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from flnerf_tpu.ops.hash_encoding import hash_encode_reference, make_hashgrid_spec
from flnerf_tpu.ops.hash_pallas import (
    corner_indices_weights,
    hash_encode_pallas,
    hash_encode_xla,
    init_packed_table,
    make_packed_spec,
)


def _spec():
    return make_packed_spec(
        num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=10, desired_resolution=32,
    )


def test_packed_xla_matches_original_semantics():
    """The packed-layout XLA twin must agree with the numpy transcription of
    the CUDA semantics (gridencoder.cu) on the shared level geometry."""
    spec = _spec()
    table = np.asarray(init_packed_table(jax.random.PRNGKey(0), spec)) * 1e4
    x = np.random.default_rng(0).random((64, 3)).astype(np.float32)

    got = np.asarray(hash_encode_xla(jnp.asarray(x), jnp.asarray(table), spec))

    # rebuild the flat [T, C] table the original layout expects
    base = spec.base
    L, C = spec.num_levels, spec.level_dim
    flat = np.zeros((int(base.offsets[-1]), C), np.float32)
    packed_flat = table.reshape(L, C, spec.t_cap)
    for l in range(L):
        size = int(base.sizes[l])
        off = int(base.offsets[l])
        flat[off : off + size] = packed_flat[l, :, :size].T
    want = hash_encode_reference(x, flat, base)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_pallas_fwd_matches_xla_interpret():
    spec = _spec()
    table = init_packed_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    with pltpu.force_tpu_interpret_mode():
        a = hash_encode_pallas(x, table, spec, 2048)
    b = hash_encode_xla(x, table, spec)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pallas_bwd_matches_xla_interpret():
    spec = _spec()
    table = init_packed_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(2), (300, 3))
    g = jax.random.normal(jax.random.PRNGKey(3), (300, spec.output_dim))

    def loss_p(t):
        return jnp.sum(hash_encode_pallas(x, t, spec, 2048) * g)

    def loss_x(t):
        return jnp.sum(hash_encode_xla(x, t, spec) * g)

    with pltpu.force_tpu_interpret_mode():
        ga = jax.grad(loss_p)(table)
    gb = jax.grad(loss_x)(table)
    # the kernel accumulates bf16 operands with fp32 accumulation (the fp16
    # atomic-add analog of gridencoder.cu) -> ~0.4% relative rounding per
    # update term; compare at that precision class
    scale = float(jnp.abs(gb).max())
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=0.01 * scale)
    assert scale > 0


def test_pallas_multi_chunk_and_padding():
    """N*8 not divisible by the chunk exercises the padded tail."""
    spec = _spec()
    table = init_packed_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(4), (777, 3))  # 6216 corners
    with pltpu.force_tpu_interpret_mode():
        a = hash_encode_pallas(x, table, spec, 2048)
        ga = jax.grad(lambda t: jnp.sum(hash_encode_pallas(x, t, spec, 2048) ** 2))(table)
    b = hash_encode_xla(x, table, spec)
    gb = jax.grad(lambda t: jnp.sum(hash_encode_xla(x, t, spec) ** 2))(table)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    scale = max(float(jnp.abs(gb).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=0.01 * scale)


def test_corner_weights_partition_of_unity():
    spec = _spec()
    x = jax.random.uniform(jax.random.PRNGKey(5), (50, 3))
    hi, lo, w = corner_indices_weights(x, spec)
    # the 8 trilinear weights of every (level, point) sum to 1
    w8 = np.asarray(w).reshape(spec.num_levels, 50, 8)
    np.testing.assert_allclose(w8.sum(-1), 1.0, atol=1e-5)
    assert int(np.asarray(hi).max()) < spec.t_r
    assert int(np.asarray(lo).max()) < 128
