"""Lattice-hash engine (ops/hash_lattice.py) vs its XLA oracle twin.

The engine changes the hash function on hashed levels (linear lattice
hash instead of xor — see the module docstring), so parity here is
against ``lattice_encode_xla`` (identical semantics, plain gathers), not
the xor-path oracle.  Dense levels keep reference index semantics
(ngp-ours/gridencoder/src/gridencoder.cu:36-69) bit-for-bit, which
test_dense_matches_xor_oracle pins via the shared-table comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.ops.hash_lattice import (
    _geometry,
    _pick_multipliers,
    init_lattice_tables,
    lattice_encode,
    lattice_encode_split,
    lattice_encode_xla,
    levels_from_pack64,
    make_lattice_spec,
    pack64_from_levels,
    spill_fraction_lattice,
)
from flnerf_tpu.ops.hash_pallas import hash_encode_xla
from flnerf_tpu.ops.hash_sorted import make_split_spec

SPEC = make_lattice_spec(log2_hashmap_size=19)


def _tables(spec, seed=0):
    return init_lattice_tables(jax.random.PRNGKey(seed), spec)


@pytest.mark.parametrize("n", [512, 4096, 20000])
def test_forward_matches_oracle(n):
    _, tb = _tables(SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(n), (n, 3))
    ref = lattice_encode_xla(x, tb, SPEC)
    out = lattice_encode(x, tb, SPEC)
    # features are U(-1e-4, 1e-4) sums of 8 corners; the kernel fetches
    # in bf16 and decodes 16-bit fixed-point fractions
    np.testing.assert_allclose(out, ref, atol=1.2e-5)


@pytest.mark.slow
def test_forward_multi_chunk():
    # n > POINT_CAP exercises the round-robin deal across 2 chunks
    _, tb = _tables(SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(9), (70000, 3))
    ref = lattice_encode_xla(x, tb, SPEC)
    out = lattice_encode(x, tb, SPEC)
    np.testing.assert_allclose(out, ref, atol=1.2e-5)
    assert float(spill_fraction_lattice(x, SPEC)) < 1e-4


def test_clustered_points_dense_gap():
    # the ADVICE-r2 scenario: two separated z-slabs make sorted dense keys
    # straddle a gap; the dual (head+tail) slab must keep fetches exact
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    a = jax.random.uniform(k1, (4096, 3)) * jnp.asarray([1.0, 1.0, 0.08])
    b = jax.random.uniform(k2, (4096, 3)) * jnp.asarray([1.0, 1.0, 0.08]) \
        + jnp.asarray([0.0, 0.0, 0.9])
    x = jnp.concatenate([a, b])
    _, tb = _tables(SPEC)
    ref = lattice_encode_xla(x, tb, SPEC)
    out = lattice_encode(x, tb, SPEC)
    assert float(spill_fraction_lattice(x, SPEC)) < 2e-3
    # spilled corners drop; bound the damage rather than demand exactness
    err = jnp.abs(out - ref).max()
    assert float(err) < 5e-5, float(err)


def test_boundary_coordinates():
    _, tb = _tables(SPEC)
    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.0, 1.0, 0.5],
                     [1.0, 0.0, 1.0]] * 64)
    ref = lattice_encode_xla(x, tb, SPEC)
    out = lattice_encode(x, tb, SPEC)
    np.testing.assert_allclose(out, ref, atol=1.2e-5)


def test_grad_matches_oracle():
    _, tb = _tables(SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(5), (4096, 3))
    w = jax.random.normal(jax.random.PRNGKey(6), (4096, SPEC.n_big * 2))

    g_eng = jax.grad(lambda t: jnp.sum(lattice_encode(x, t, SPEC) * w))(tb)
    g_ref = jax.grad(
        lambda t: jnp.sum(lattice_encode_xla(x, t, SPEC) * w))(tb)
    # kernel scatters w*g contributions in bf16
    np.testing.assert_allclose(g_eng, g_ref, atol=3e-2)
    # relative check on the well-populated entries
    big = jnp.abs(g_ref) > 0.5
    if bool(big.any()):
        rel = jnp.abs(g_eng - g_ref)[big] / jnp.abs(g_ref)[big]
        assert float(rel.max()) < 2e-2


def test_split_encode_matches_oracles():
    from jax.experimental.pallas import tpu as pltpu

    spec = SPEC
    ts, tb = _tables(spec)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2048, 3))
    with pltpu.force_tpu_interpret_mode():
        out = lattice_encode_split(x, (ts, tb), spec)
    ref_small = hash_encode_xla(x, ts, spec.split.small)
    ref_big = lattice_encode_xla(x, tb, spec)
    assert out.shape == (2048, spec.output_dim)
    np.testing.assert_allclose(out[:, :ref_small.shape[1]], ref_small,
                               atol=2e-5)
    np.testing.assert_allclose(out[:, ref_small.shape[1]:], ref_big,
                               atol=1.2e-5)


def test_dense_matches_xor_oracle():
    """Dense (non-hashed) levels keep reference index semantics exactly:
    load the SAME per-level tables into both engines and compare the
    dense columns against the xor-path oracle."""
    spec = SPEC
    split = make_split_spec(log2_hashmap_size=19)
    _, tb = _tables(spec)
    levels = levels_from_pack64(tb, spec)
    # big-group xor-oracle twin: packed [Lb, C, t_r, LANES] layout
    big = split.big
    t_r = spec.t_r64 * 64 // 128
    packed = np.zeros((spec.n_big, 2, t_r, 128), np.float32)
    for li, lvl in enumerate(levels):
        flat = np.zeros((t_r * 128, 2), np.float32)
        flat[: lvl.shape[0]] = np.asarray(lvl)
        packed[li] = flat.reshape(t_r, 128, 2).transpose(2, 0, 1)
    from flnerf_tpu.ops.hash_pallas import PackedHashSpec

    pspec = PackedHashSpec(base=big, t_cap=t_r * 128, t_r=t_r)
    x = jax.random.uniform(jax.random.PRNGKey(11), (1024, 3))
    ref = hash_encode_xla(x, jnp.asarray(packed), pspec)
    out = lattice_encode(x, tb, spec)
    n_dense = int(np.sum(~big.use_hash.astype(bool)))
    np.testing.assert_allclose(out[:, : 2 * n_dense],
                               ref[:, : 2 * n_dense], atol=1.2e-5)


def test_pack_roundtrip():
    spec = SPEC
    rng = np.random.default_rng(0)
    levels = [jnp.asarray(rng.normal(size=(int(s), 2)).astype(np.float32))
              for s in spec.split.big.sizes]
    tb = pack64_from_levels(levels, spec)
    back = levels_from_pack64(tb, spec)
    for a, b in zip(levels, back):
        np.testing.assert_array_equal(a, b)


def test_spill_zero_uniform():
    x = jax.random.uniform(jax.random.PRNGKey(13), (16384, 3))
    assert float(spill_fraction_lattice(x, SPEC)) == 0.0


def test_oracle_chunking_bit_exact():
    """lattice_encode_xla chunks its gather to dodge the TPU XLA
    large-gather tail miscompile (GATHER_miscompile.json); chunked and
    unchunked must agree bit-for-bit (pure reshaping, same math)."""
    _, tb = _tables(SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(5), (517, 3))
    full = lattice_encode_xla(x, tb, SPEC)
    chunked = lattice_encode_xla(x, tb, SPEC, _chunk=128)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_pad_duplicate_uniformity_contract():
    """The duplicate-uniformity caller contract (module docstring): a
    batch padded by WRAP-TILING real points keeps slab sizing exact and
    stays parity-clean, while the old broadcast-one-point padding halves
    the real-key density and measurably spills (the round-3 "lattice
    quality gap" mechanism, LATTICE_diagnose.json 32.9 vs 38.2 dB)."""
    _, tb = _tables(SPEC)
    half = jax.random.uniform(jax.random.PRNGKey(21), (2048, 3))
    wrap = jnp.tile(half, (2, 1))
    ref = lattice_encode_xla(wrap, tb, SPEC)
    out = lattice_encode(wrap, tb, SPEC)
    np.testing.assert_allclose(out, ref, atol=1.2e-5)
    assert float(spill_fraction_lattice(wrap, SPEC)) == 0.0
    # the mechanism is visible in the spill monitor: one duplicated pad
    # point concentrates its mass and undersizes real blocks' slabs
    dummy = jnp.concatenate(
        [half, jnp.broadcast_to(half[-1:], (2048, 3))], 0)
    assert float(spill_fraction_lattice(dummy, SPEC)) > 1e-3


def test_multipliers_alias_distance():
    m = _pick_multipliers(1 << 19, 14)
    assert m.shape == (14, 3)
    assert len({tuple(r) for r in m}) == 14          # distinct per level
    # every chosen multiplier's alias lattice has no short vector: nearby
    # cells (the ones trilerp mixes) can never collide
    ax = np.arange(-16, 17, dtype=np.int64)
    dx, dy, dz = np.meshgrid(ax, ax, ax, indexing="ij")
    nz = (dx != 0) | (dy != 0) | (dz != 0)
    for p in m:
        hit = ((dx * p[0] + dy * p[1] + dz * p[2]) % (1 << 19) == 0) & nz
        assert not hit.any(), p


def test_geometry_scales_block_with_density():
    g_small = _geometry(512, SPEC)
    g_big = _geometry(65536, SPEC)
    assert g_small.block < g_big.block
    assert g_small.r_max <= SPEC.r_pad and g_big.r_max <= SPEC.r_pad
    assert g_big.nblk % g_big.n_g == 0


def _three_cluster_x():
    """8192 points: filler fills exactly 63 sorted key-blocks (8064 =
    63*128) so the LAST block holds three tiny z-clusters of the dense
    levels — head slab covers A, tail slab covers C, and B sits in the
    alias window [b_tail - r, b_tail) of the two largest dense levels."""
    rng = np.random.default_rng(0)
    n, nf, na, nb = 8192, 8064, 40, 40
    x = rng.random((n, 3)).astype(np.float32)
    x[:nf, 2] = 0.20 * x[:nf, 2]
    x[nf:nf + na, 2] = 0.70 + 0.0005 * x[nf:nf + na, 2]
    x[nf + na:nf + na + nb, 2] = 0.78 + 0.0005 * x[nf + na:nf + na + nb, 2]
    x[nf + na + nb:, 2] = 0.85 + 0.0005 * x[nf + na + nb:, 2]
    return jnp.asarray(x), slice(nf + na, nf + na + nb)


def _alias_window_corners(x, spec):
    """Dense-level corners outside the head slab but within r rows BELOW
    the tail base — the set that a '+ r_max' shift without a rel_t >= 0
    mask would alias into HEAD one-hot rows."""
    from flnerf_tpu.ops.hash_lattice import _prep
    geo, skey, _, sp1, b_full, _, b_tail = _prep(x, spec)
    rows = skey.shape[0]
    n_ch = rows // spec.n_big
    offs = np.tile(np.asarray(spec.offs.astype(np.int64), np.int32),
                   (n_ch, 1))
    a = (np.asarray(skey).reshape(rows, geo.nblk, geo.block)[..., None]
         + offs[:, None, None, :])
    arow = a >> 6
    # strip the x1024 SMEM-tile padding _slab_bases appends per row
    unpad = lambda b: np.asarray(b).reshape(rows, geo.bw)[:, :geo.nblk * 8]
    rel = arow - unpad(b_full).reshape(rows, geo.nblk, 1, 8)
    rel_t = arow - unpad(b_tail).reshape(rows, geo.nblk, 1, 8)
    uh = np.asarray(spec.split.big.use_hash)
    r_eff = np.tile(np.where(uh, geo.r_hash, geo.r_dense),
                    n_ch).astype(np.int32)[:, None, None, None]
    dense = ~np.tile(uh, n_ch)[:, None, None, None]
    pos = np.asarray(jax.lax.shift_right_logical(sp1, 14))
    ch = (np.arange(rows, dtype=np.int32) // spec.n_big)[:, None]
    real = (pos * n_ch + ch
            < x.shape[0]).reshape(rows, geo.nblk, geo.block, 1)
    in_head = (rel >= 0) & (rel < r_eff)
    return int((dense & real & ~in_head
                & (rel_t < 0) & (rel_t >= -r_eff)).sum())


def test_three_cluster_block_exact_zero_spill():
    """A middle cluster in the alias window must contribute EXACT ZEROS —
    not reads/writes of head-slab rows.  Regression for the dual-slab
    one-hot: pos_row = rel_t + r_max with rel_t in [-r, 0) matched HEAD
    rows, silently fetching unrelated table entries (full trilerp
    weight) and scattering gradients into them, while
    spill_fraction_lattice counted those corners as harmless drops."""
    x, mid = _three_cluster_x()
    assert _alias_window_corners(x, SPEC) > 100   # scenario is adversarial
    _, tb = _tables(SPEC)
    n = x.shape[0]

    # (1) scatter: grads from middle-only weights never leak to rows the
    # oracle does not touch (engine writes are a subset of oracle rows)
    w = np.zeros((n, SPEC.n_big * 2), np.float32)
    w[mid] = 1.0
    wj = jnp.asarray(w)
    g_eng = jax.grad(lambda t: jnp.sum(lattice_encode(x, t, SPEC) * wj))(tb)
    g_ref = jax.grad(
        lambda t: jnp.sum(lattice_encode_xla(x, t, SPEC) * wj))(tb)
    untouched = np.asarray(g_ref) == 0
    leak = np.abs(np.asarray(g_eng))[untouched]
    assert leak.size and float(leak.max()) < 1e-7

    # (2) fetch: middle outputs are independent of every table row the
    # middle cluster's own corners do not touch
    tb2 = tb + 5.0 * jnp.asarray(untouched, tb.dtype)
    d = np.abs(np.asarray(
        lattice_encode(x, tb2, SPEC) - lattice_encode(x, tb, SPEC)))
    assert float(d[mid].max()) < 1e-6


def test_lattice_engine_multichip_parity():
    """lattice_encode under jax.shard_map (points sharded, tables
    replicated, grads psum'd) matches single-device — the multichip
    contract for the v4 engine when NGPConfig selects it."""
    from jax.sharding import Mesh, PartitionSpec as P

    _, tb = _tables(SPEC)
    devs = jax.devices()
    # 1024 points per shard: uniform points spill exactly zero corners
    # at this density (256/shard leaves ~0.1% spilled on the tiny-block
    # geometry, which shows up as dropped-corner grad deltas, not error)
    n = 1024 * len(devs)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((n, SPEC.n_big * 2)).astype(np.float32))

    def loss(tb, x, w):
        return jnp.sum(lattice_encode(x, tb, SPEC) * w)

    ref_out = np.asarray(lattice_encode(x, tb, SPEC))
    ref_g = np.asarray(jax.grad(loss)(tb, x, w))

    mesh = Mesh(np.array(devs), ("data",))

    @jax.jit
    def sharded(tb, x, w):
        def f(tb, x, w):
            out = lattice_encode(x, tb, SPEC)
            g = jax.lax.psum(jax.grad(loss)(tb, x, w), "data")
            return out, g

        return jax.shard_map(
            f, mesh=mesh, in_specs=(P(), P("data"), P("data")),
            out_specs=(P("data"), P()), check_vma=False)(tb, x, w)

    out_m, g_m = sharded(tb, x, w)
    np.testing.assert_allclose(np.asarray(out_m), ref_out,
                               atol=1e-4, rtol=1e-3)
    # grads: bf16 scatter contributions round per shard before the f32
    # psum, so partition order shifts low bits (~2% rel worst case)
    np.testing.assert_allclose(np.asarray(g_m), ref_g,
                               atol=1e-4, rtol=3e-2)


def test_lattice_flops_estimate_shape_and_scaling():
    """The roofline estimator (bench's ngp_engine_executed_tflops
    denominator): positive, ~linear in points at fixed geometry class,
    dense levels dual-slab counted."""
    from flnerf_tpu.ops.hash_lattice import (
        lattice_flops_estimate, make_lattice_spec,
    )

    spec = make_lattice_spec(log2_hashmap_size=19)
    e16 = lattice_flops_estimate(spec, 16384)
    e65 = lattice_flops_estimate(spec, 65536)
    assert e16["flops_total"] > 0
    assert e16["flops_fwd"] == e16["flops_bwd"]
    # same chunk count, 4x points: within ~3x-6x (slab rows shrink as
    # density rises, so scaling is sublinear in flops-per-point terms)
    ratio = e65["flops_total"] / e16["flops_total"]
    assert 1.5 < ratio < 6.0, ratio
    g = e65["geometry"]
    assert g["m_pad"] == 65536 and g["r_hash"] > 0
