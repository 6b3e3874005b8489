"""Sorted-block gather hash engine vs the flat-table oracle (interpret mode).

Tier: kernel-vs-pure-JAX parity + gradcheck (SURVEY.md §4).  The engine
packs features/grads as bf16 pairs through the unsort, so tolerances are
bf16-truncation-sized relative to the table magnitude.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from flnerf_tpu.ops.hash_encoding import hash_encode
from flnerf_tpu.ops.hash_sorted import (
    hash_encode_sorted,
    hash_encode_split,
    init_split_table,
    make_split_spec,
    spill_fraction,
    split_from_flat,
)


def _spec(log2=12, levels=6, split_min=1 << 10):
    return make_split_spec(
        num_levels=levels, level_dim=2, base_resolution=4,
        log2_hashmap_size=log2, desired_resolution=64,
        split_min_size=split_min,
    )


def _flat_table(spec, rng):
    t = int(spec.base.offsets[-1])
    return rng.standard_normal((t, spec.level_dim)).astype(np.float32)


def test_split_spec_is_prefix_suffix():
    spec = _spec()
    assert spec.n_small + spec.n_big == spec.num_levels
    assert spec.n_small >= 1 and spec.n_big >= 1
    # sizes nondecreasing -> the split threshold is honored on both sides
    assert all(s < (1 << 10) for s in spec.base.sizes[:spec.n_small])
    assert all(s >= (1 << 10) for s in spec.base.sizes[spec.n_small:])


def test_sorted_fwd_matches_oracle():
    spec = _spec()
    rng = np.random.default_rng(0)
    flat = _flat_table(spec, rng)
    tables = split_from_flat(jnp.asarray(flat), spec)
    x = rng.random((300, 3)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(hash_encode_split(jnp.asarray(x), tables, spec))
    want = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(flat),
                                  spec.base))
    # big-group features ride the unsort as truncated bf16 (rel ~2^-8)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=2e-2)


def test_sorted_bwd_matches_oracle():
    spec = _spec()
    rng = np.random.default_rng(1)
    flat = _flat_table(spec, rng)
    tables = split_from_flat(jnp.asarray(flat), spec)
    x = jnp.asarray(rng.random((256, 3)).astype(np.float32))
    cot = jnp.asarray(
        rng.standard_normal((256, spec.output_dim)).astype(np.float32))

    def loss_split(ts, tb):
        return jnp.sum(hash_encode_split(x, (ts, tb), spec) * cot)

    def loss_flat(f):
        return jnp.sum(hash_encode(x, f, spec.base) * cot)

    with pltpu.force_tpu_interpret_mode():
        gs, gb = jax.grad(loss_split, argnums=(0, 1))(tables[0], tables[1])
    gflat = jax.grad(loss_flat)(jnp.asarray(flat))
    ws, wb = split_from_flat(gflat, spec)   # same (linear) layout map
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws),
                               atol=3e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(wb),
                               atol=3e-2, rtol=2e-2)


def test_sorted_only_group_and_padding():
    """N not a multiple of the sort chunk; all levels on the sorted path."""
    spec = _spec(split_min=1)        # n_small == 0
    assert spec.small is None and spec.n_big == spec.num_levels
    rng = np.random.default_rng(2)
    flat = _flat_table(spec, rng)
    _, tb = split_from_flat(jnp.asarray(flat), spec)
    x = rng.random((193, 3)).astype(np.float32)
    got = np.asarray(hash_encode_sorted(jnp.asarray(x), tb, spec))
    want = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(flat),
                                  spec.base))
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=2e-2)


def test_spill_fraction_is_zero_at_scale():
    """Hash-distributed keys at step scale never exceed the slab budget."""
    spec = _spec()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2048, 3)).astype(np.float32))
    assert float(spill_fraction(x, spec)) == 0.0


def test_spill_fraction_clustered_points():
    """Pathological input (all points in one cell) still spills nothing:
    duplicate keys have zero span."""
    spec = _spec()
    x = jnp.full((1024, 3), 0.3721, jnp.float32)
    assert float(spill_fraction(x, spec)) == 0.0

def test_ngp_field_split_table_grads():
    """log2_hashmap_size >= 16 switches the NGP field to the split/sorted
    engine: params['table'] becomes (small, big) and grads flow to both."""
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field

    cfg = NGPConfig(num_levels=6, base_resolution=4, desired_resolution=64,
                    log2_hashmap_size=16, bound=1.0)
    init_fn, density_fn, _ = make_ngp_field(cfg, jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    assert isinstance(params["table"], tuple) and len(params["table"]) == 2
    x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3)) * 2.0 - 1.0

    def loss(p):
        sigma, _ = density_fn(p, x)
        return jnp.sum(sigma)

    g = jax.grad(loss)(params)
    gs, gb = g["table"]
    assert float(jnp.sum(jnp.abs(gs))) > 0.0
    assert float(jnp.sum(jnp.abs(gb))) > 0.0


def test_split_encode_chunks_large_point_sets(monkeypatch):
    """N beyond the engine's per-call pid budget is chunked and concatenated
    (the trainer feeds ~131k points per step)."""
    import flnerf_tpu.ops.hash_sorted as hs

    spec = _spec(split_min=1)
    rng = np.random.default_rng(5)
    flat = _flat_table(spec, rng)
    _, tb = split_from_flat(jnp.asarray(flat), spec)
    x = rng.random((700, 3)).astype(np.float32)
    want = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(flat),
                                  spec.base))
    monkeypatch.setattr(hs, "POINT_CAP", 256)
    got = np.asarray(hs.hash_encode_split(jnp.asarray(x), (None, tb), spec))
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=2e-2)


def test_dense_level_gap_clusters_exact():
    """ADVICE r2 repro: two separated z-slabs of points on a DENSE
    (non-hashed) big level make sorted blocks straddle the index gap
    between the slabs (dense index is z-major).  The tail slab must cover
    the post-gap cluster: zero spill and oracle-exact features."""
    spec = make_split_spec(
        num_levels=2, level_dim=2, base_resolution=8,
        log2_hashmap_size=17, desired_resolution=33, split_min_size=1 << 10,
    )
    assert spec.big is not None and not bool(spec.big.use_hash[-1]), (
        "fixture must exercise a dense big level")
    rng = np.random.default_rng(7)
    flat = _flat_table(spec, rng)
    _, tb = split_from_flat(jnp.asarray(flat), spec)
    n = 512
    x = rng.random((n, 3)).astype(np.float32)
    x[: n // 2, 2] = 0.05 + 0.02 * x[: n // 2, 2]   # z-slab A
    x[n // 2:, 2] = 0.90 + 0.02 * x[n // 2:, 2]     # z-slab B
    xj = jnp.asarray(x)
    assert float(spill_fraction(xj, spec)) == 0.0
    got = np.asarray(hash_encode_sorted(xj, tb, spec))
    lo = spec.n_small * spec.level_dim
    want = np.asarray(hash_encode(xj, jnp.asarray(flat), spec.base))[:, lo:]
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=2e-2)


def test_three_cluster_block_exact_zero_spill():
    """Regression for _dual_slab_onehot aliasing: a corner in NEITHER
    slab with row in [b_hi - r_max, b_hi) used to match HEAD one-hot rows
    (pos_row = row - b_hi + r_max in [0, r_max)), fetching an unrelated
    table row in the fwd kernel and scattering gradient into it in the
    bwd kernel.  Three tiny z-clusters inside ONE 256-key block of the
    dense level put the middle cluster exactly in that window; its
    corners must contribute exact zeros instead."""
    spec = make_split_spec(
        num_levels=2, level_dim=2, base_resolution=8,
        log2_hashmap_size=17, desired_resolution=33, split_min_size=1 << 10,
    )
    rng = np.random.default_rng(7)
    nf, nt = 1794, 10          # 8*1794 keys = 56 blocks + 16; 3*8*10 = 240
    n = nf + 3 * nt
    x = rng.random((n, 3)).astype(np.float32)
    x[:nf, 2] = 0.15 * x[:nf, 2]
    x[nf:nf + nt, 2] = 0.40 + 0.001 * x[nf:nf + nt, 2]
    x[nf + nt:nf + 2 * nt, 2] = 0.82 + 0.001 * x[nf + nt:nf + 2 * nt, 2]
    x[nf + 2 * nt:, 2] = 0.95 + 0.001 * x[nf + 2 * nt:, 2]
    mid = slice(nf + nt, nf + 2 * nt)
    xj = jnp.asarray(x)

    # guard: the scenario really has corners in the alias window
    from flnerf_tpu.ops.hash_sorted import _sorted_prep, BLOCK, SENTINEL
    geo, sidx, _, b_lo, b_hi = _sorted_prep(xj, spec)
    rows_b = np.asarray(sidx >> 7).reshape(-1, geo.nblk, BLOCK)
    bl = np.asarray(b_lo).reshape(-1, geo.nblk)[..., None]
    bh = np.asarray(b_hi).reshape(-1, geo.nblk)[..., None]
    real = np.asarray(sidx).reshape(-1, geo.nblk, BLOCK) < SENTINEL
    dense = np.resize(~np.asarray(spec.big.use_hash),
                      rows_b.shape[0])[:, None, None]
    in_lo = (rows_b >= bl) & (rows_b < bl + geo.r_max)
    n_alias = int((dense & real & ~in_lo
                   & (rows_b >= bh - geo.r_max) & (rows_b < bh)).sum())
    assert n_alias >= 40, n_alias

    flat = _flat_table(spec, rng)
    _, tb = split_from_flat(jnp.asarray(flat), spec)
    lo = spec.n_small * spec.level_dim
    w = np.zeros((n, len(spec.big.sizes) * spec.level_dim), np.float32)
    w[mid] = 1.0
    wj = jnp.asarray(w)

    # (1) scatter: no gradient leaks to rows the oracle does not touch
    g_eng = jax.grad(
        lambda t: jnp.sum(hash_encode_sorted(xj, t, spec) * wj))(tb)
    g_flat = jax.grad(lambda f: jnp.sum(
        hash_encode(xj, f, spec.base)[:, lo:] * wj))(jnp.asarray(flat))
    _, g_pack = split_from_flat(g_flat, spec)   # same (linear) layout map
    untouched = np.asarray(g_pack) == 0
    leak = np.abs(np.asarray(g_eng))[untouched]
    assert leak.size and float(leak.max()) < 1e-7

    # (2) fetch: middle outputs are independent of rows their own
    # corners do not touch
    tb2 = tb + 5.0 * jnp.asarray(untouched, tb.dtype)
    d = np.abs(np.asarray(hash_encode_sorted(xj, tb2, spec)
                          - hash_encode_sorted(xj, tb, spec)))
    assert float(d[mid].max()) < 1e-6


def test_sorted_engine_multichip_parity():
    """hash_encode_sorted under jax.shard_map (points sharded over the
    data axis, table replicated, table-grads psum'd) matches the
    single-device call — the multichip contract the NGP trainer's
    fwd_bwd relies on (GSPMD cannot partition the opaque Pallas calls,
    so each device encodes its ray shard locally)."""
    from jax.sharding import Mesh, PartitionSpec as P

    spec = make_split_spec(
        num_levels=2, level_dim=2, base_resolution=8,
        log2_hashmap_size=17, desired_resolution=33, split_min_size=1 << 10,
    )
    rng = np.random.default_rng(3)
    flat = _flat_table(spec, rng)
    _, tb = split_from_flat(jnp.asarray(flat), spec)
    devs = jax.devices()
    n = 256 * len(devs)
    x = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(
        (n, len(spec.big.sizes) * spec.level_dim)).astype(np.float32))

    def loss(tb, x, w):
        return jnp.sum(hash_encode_sorted(x, tb, spec) * w)

    ref_out = np.asarray(hash_encode_sorted(x, tb, spec))
    ref_g = np.asarray(jax.grad(loss)(tb, x, w))

    mesh = Mesh(np.array(devs), ("data",))

    @jax.jit
    def sharded(tb, x, w):
        def f(tb, x, w):
            out = hash_encode_sorted(x, tb, spec)
            g = jax.lax.psum(jax.grad(loss)(tb, x, w), "data")
            return out, g

        return jax.shard_map(
            f, mesh=mesh, in_specs=(P(), P("data"), P("data")),
            out_specs=(P("data"), P()), check_vma=False)(tb, x, w)

    out_m, g_m = sharded(tb, x, w)
    # per-shard calls see different point counts (different block
    # geometry) — same bf16 fetches, f32 sums in a different order
    np.testing.assert_allclose(np.asarray(out_m), ref_out,
                               atol=1e-4, rtol=1e-3)
    # grads: bf16 scatter contributions round per shard before the f32
    # psum, so partition order shifts low bits
    np.testing.assert_allclose(np.asarray(g_m), ref_g,
                               atol=1e-4, rtol=3e-2)
