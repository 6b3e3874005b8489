"""Sorted-block gather engine for large hash-encoding tables (TPU).

The matmul-formulated kernels in ops/hash_pallas.py pay O(M * T) MAC per
level (one-hot row fetch against the FULL table), which is MAC-bound at
T = 2^15 and scales linearly in capacity — the reason round 1 capped
log2_hashmap_size at 15 instead of torch-ngp's 19
(ngp-ours/gridencoder/src/gridencoder.cu:125-135, grid.py:91).

This engine restores large-T capacity by exploiting locality instead.
Per level (M = N*8 corner lookups into T entries):

  1. ONE bitonic sort of the corner indices (Pallas VPU sort,
     ops/sort_pallas.py), carrying `pos << 15 | w15` as the payload —
     the corner's original position and its trilinear weight in 15-bit
     fixed point.  256 consecutive SORTED keys span a tiny table range
     (expected 256*T/M entries), so:
  2. the fused forward kernel fetches each block's features with a
     one-hot matmul against a small dynamically-sliced slab of the
     level table held in VMEM — O(M * R) MAC with R = slab rows (tens)
     instead of T/128 rows (thousands) — and immediately scatter-adds
     w * feature into a per-POINT accumulator via a second one-hot
     matmul keyed on the payload's point id (pid = pos >> 3, decomposed
     as pid = hi*128 + lo so the one-hot build is [256,128] + a lane
     select, never [256, N]).  No unsort pass exists: features leave
     the kernel already point-indexed.
  3. the backward kernel needs NO sort at all: the saved sorted
     (key, payload) pair gives it pid and w per sorted corner, the
     upstream gradient is fetched with the same point one-hot matmul
     (transposed data flow), and slab gradients scatter-accumulate with
     the transposed table one-hot into the VMEM-resident output table.

Cost: one sort pass + two ~[256,128]x[128,C*128] MXU matmuls per
256-corner block, independent of T — measured ~16 ms fwd+bwd at 16k
points / 16 levels on the axon v5e tile at 2^19 AND 2^17 capacity,
vs ~11 ms for the full-matmul path at 2^15 (which scales linearly to
~100+ ms at 2^19).

Per-chunk point budget: pid rides 14 bits of the payload (16384 points
after 128-padding); larger point sets split into equal chunks that
BATCH along the sort's and kernels' grid axes — one sort pass and one
kernel launch per direction regardless of N (the scatter matmul's cost
is quadratic in per-chunk points, so bigger chunks would not help).

Each block carries TWO slabs: a HEAD slab at the first key's row and a
TAIL slab ending at the last real key's row.  For hash-distributed keys
they coincide (r_max is 3x the expected span; a Chernoff bound at 3x
for 256 draws is ~e^-100).  For DENSE (non-hashed) big levels, where
clustered points make a block straddle an index gap (ADVICE r2), the
head slab covers the cluster before the gap and the tail slab the one
after — exact for up to 2 clusters per 256-key block; 3+ clusters
spill the middle one to zeros.  `spill_fraction` measures the residual
exactly for tests/monitoring.  Levels small enough that the full-table
matmul is cheaper stay on the hash_pallas path — `SplitHashSpec`
carries that static decision.

Semantics (scales, resolutions, +0.5, dense-vs-hash index) match
gridencoder.cu:125-135 exactly via hash_encoding.make_hashgrid_spec;
parity is pinned against ops/hash_encoding.hash_encode in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flnerf_tpu.ops.hash_encoding import HashGridSpec, make_hashgrid_spec
from flnerf_tpu.ops.hash_pallas import (
    PackedHashSpec,
    corner_indices_weights,
    hash_encode_pallas,
    hash_encode_xla,
)
from flnerf_tpu.ops.sort_pallas import bitonic_sort

LANES = 128
BLOCK = 256          # sorted keys per slab matmul (sublane-packed width)
CB = 8               # blocks per kernel invocation (operand tile columns)
SENTINEL = 1 << 30   # pad key: sorts after all real indices (< 2^19 << 2^30)
W_BITS = 15          # fixed-point weight bits in the sort payload
W_SCALE = (1 << W_BITS) - 1
POINT_CAP = 1 << 14  # pid budget per engine call (pos >> 3 from 17 bits)


def _round8(x: int) -> int:
    return (int(x) + 7) // 8 * 8


class SplitHashSpec(NamedTuple):
    """Static split of levels into matmul-path (small) and sorted-path (big)."""

    base: HashGridSpec          # full spec, all levels
    n_small: int                # levels [0, n_small) -> hash_pallas matmul
    small: PackedHashSpec | None
    big: HashGridSpec | None    # subset spec for levels [n_small, L)
    t_cap_big: int              # big-group padded entries (multiple of 128)
    t_r_big: int

    @property
    def num_levels(self) -> int:
        return self.base.num_levels

    @property
    def level_dim(self) -> int:
        return self.base.level_dim

    @property
    def n_big(self) -> int:
        return self.base.num_levels - self.n_small

    @property
    def output_dim(self) -> int:
        return self.base.num_levels * self.base.level_dim


def _subset(base: HashGridSpec, lo: int, hi: int) -> HashGridSpec:
    sizes = base.sizes[lo:hi]
    return base._replace(
        num_levels=hi - lo,
        scales=base.scales[lo:hi],
        resolutions=base.resolutions[lo:hi],
        sizes=sizes,
        use_hash=base.use_hash[lo:hi],
        offsets=np.concatenate([[0], np.cumsum(sizes)]),
    )


def make_split_spec(
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    split_min_size: int = 1 << 15,
) -> SplitHashSpec:
    """Levels with table size < split_min_size take the full-matmul path
    (cheaper below ~2^15: the sorted path's cost is flat in T, the matmul
    path's is linear).  Level sizes are nondecreasing, so the split is a
    prefix/suffix in level order."""
    base = make_hashgrid_spec(
        num_levels=num_levels, level_dim=level_dim,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        desired_resolution=desired_resolution,
    )
    n_small = int(np.sum(base.sizes < split_min_size))
    small = None
    if n_small:
        sub = _subset(base, 0, n_small)
        cap = _round8(int(max(sub.sizes)))
        cap = (cap + LANES - 1) // LANES * LANES
        small = PackedHashSpec(base=sub, t_cap=cap, t_r=cap // LANES)
    big = _subset(base, n_small, num_levels) if n_small < num_levels else None
    t_cap_big = 0
    if big is not None:
        # pad to a multiple of 8*128 so t_r_big is 8-aligned: the kernels'
        # slab bases are 8-row-aligned dynamic slices, and an unaligned
        # t_r_big would leave the table's last <8 rows uncoverable
        # (ADVICE r2 finding; padding entries are never indexed: idx < size)
        t_cap_big = (int(max(big.sizes)) + 8 * LANES - 1) // (8 * LANES) \
            * (8 * LANES)
    return SplitHashSpec(
        base=base, n_small=n_small, small=small, big=big,
        t_cap_big=t_cap_big, t_r_big=t_cap_big // LANES,
    )


def init_split_table(key, spec: SplitHashSpec):
    """(table_small [Ls,C,Trs,128] | None, table_big [Lb,C,Trb,128] | None),
    U(-1e-4, 1e-4) like torch-ngp grid.py."""
    ks, kb = jax.random.split(key)
    C = spec.level_dim
    ts = tb = None
    if spec.small is not None:
        ts = jax.random.uniform(
            ks, (spec.n_small, C, spec.small.t_r, LANES), jnp.float32,
            -1e-4, 1e-4)
    if spec.big is not None:
        tb = jax.random.uniform(
            kb, (spec.n_big, C, spec.t_r_big, LANES), jnp.float32,
            -1e-4, 1e-4)
    return ts, tb


# ---------------------------------------------------------------------------
# Static geometry of one sorted-path call
# ---------------------------------------------------------------------------

class _Geom(NamedTuple):
    n_ch: int         # point chunks (sort/scatter cost is quadratic in the
                      # per-chunk point count; chunks batch into one grid)
    n_pad: int        # points per chunk, padded to a multiple of 128
    p_hi: int         # n_pad // 128 (point-id sublane rows)
    m: int            # real corners per level per chunk (n_pad * 8)
    m_pad: int        # padded sort length (power of two)
    nblk: int         # blocks per level per chunk (m_pad / BLOCK)
    n_g: int          # kernel grid steps per (chunk, level) (nblk / CB)
    r_max: int        # slab rows per block


def _geometry(n_points: int, t_cap: int) -> _Geom:
    n_ch = -(-n_points // POINT_CAP)
    per = -(-n_points // n_ch)
    n_pad = (per + LANES - 1) // LANES * LANES
    m = n_pad * 8
    m_pad = 1 << max(m - 1, BLOCK * CB - 1).bit_length()
    nblk = m_pad // BLOCK
    t_r = t_cap // LANES
    span_rows = BLOCK * t_cap / m_pad / LANES
    r_max = min(t_r, max(16, _round8(int(3 * span_rows) + 16)))
    return _Geom(n_ch=n_ch, n_pad=n_pad, p_hi=n_pad // LANES, m=m,
                 m_pad=m_pad, nblk=nblk, n_g=nblk // CB, r_max=r_max)


def _pack_cols(a: jnp.ndarray, n_g: int):
    """[L, M_pad] -> [L, n_g, BLOCK, CB]: element f of chunk k sits at
    [:, k, f % BLOCK, f // BLOCK] so in-kernel column j is a [BLOCK, 1]
    sublane vector (no lane->sublane relayouts; see hash_pallas._prep)."""
    L = a.shape[0]
    return jnp.transpose(a.reshape(L, n_g, CB, BLOCK), (0, 1, 3, 2))


# ---------------------------------------------------------------------------
# Pallas kernels (grid = (L_big, n_ch, n_g); table/grad blocks keyed by
# level — DMA'd once per level; point chunks batch on the middle axis)
# ---------------------------------------------------------------------------

def _decode_cols(s, pay):
    """Sorted (key, payload) columns [256, 1] -> table row/lane, point
    hi/lo and fixed-point weight."""
    lo_t = s & (LANES - 1)
    pos = jax.lax.shift_right_logical(pay, W_BITS) & ((1 << 17) - 1)
    w = (pay & W_SCALE).astype(jnp.float32) * (1.0 / W_SCALE)
    pid = pos >> 3
    return lo_t, pid >> 7, pid & (LANES - 1), w


def _dual_slab_onehot(s, b_lo, b_hi, row_iota2, r_max):
    """[256, 2*r_max] one-hot over the HEAD slab (rows [b_lo, b_lo+r_max))
    and TAIL slab (rows [b_hi, b_hi+r_max)): a corner matches the head if
    covered, else the tail, else nothing (exact zero).  The tail slab makes
    gap-straddling blocks (clustered points on DENSE levels — ADVICE r2)
    exact: head covers the cluster before the gap, tail the one after."""
    row_t = s >> 7
    rel_lo = row_t - b_lo
    in_lo = (rel_lo >= 0) & (rel_lo < r_max)
    rel_hi = row_t - b_hi
    # rel_hi in [-r_max, 0) would alias into HEAD rows after the +r_max
    # shift (3+-cluster blocks: a middle cluster just below the tail
    # base) — force a no-match row so such corners contribute exact 0
    pos_row = jnp.where(in_lo, rel_lo,
                        jnp.where(rel_hi >= 0, rel_hi + r_max, -1))
    return (pos_row == row_iota2).astype(jnp.bfloat16)


def _fused_fwd_kernel(base_lo_ref, base_hi_ref, sidx_ref, spay_ref,
                      table_ref, out_ref, *, r_max: int, nblk: int,
                      c_dim: int, lb: int, off: int, dual: bool):
    """Per (level, chunk, g): slab-local one-hot fetch for CB blocks of 256
    sorted corners, multiplied by the payload weight and scatter-added
    into the per-point accumulator via the point one-hot matmul.

    ``dual`` (the DENSE-level variant) adds a tail slab so gap-straddling
    blocks stay exact (ADVICE r2); hashed levels keep the cheaper single
    slab — their keys are uniform, so head-slab spill is ~e^-100.
    Out-of-slab keys (sentinel padding or 3+-cluster spills) match no
    one-hot row and contribute exact zeros.  ``off``/``lb`` place this
    call's level range inside the full big group (grid dim 0 covers only
    this variant's levels)."""
    l = pl.program_id(0)
    ch = pl.program_id(1)
    g = pl.program_id(2)
    width = sidx_ref.shape[2]
    p_hi = out_ref.shape[2]
    n_rows = (2 if dual else 1) * r_max

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (width, n_rows), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 1)
    phi_iota = jax.lax.broadcasted_iota(jnp.int32, (width, p_hi), 1)
    for j in range(CB):
        bi = (ch * lb + l + off) * nblk + g * CB + j
        b_lo = pl.multiple_of(base_lo_ref[bi], 8)
        s = sidx_ref[0, 0, :, j:j + 1]                       # [256, 1]
        pay = spay_ref[0, 0, :, j:j + 1]
        lo_t, hi_p, lo_p, w = _decode_cols(s, pay)
        if dual:
            b_hi = pl.multiple_of(base_hi_ref[bi], 8)
            oh = _dual_slab_onehot(s, b_lo, b_hi, row_iota, r_max)
            bases = (b_lo, b_hi)
        else:
            oh = ((s >> 7) - b_lo == row_iota).astype(jnp.bfloat16)
            bases = (b_lo,)
        slab = jnp.concatenate(
            [
                jnp.concatenate(
                    [table_ref[0, c, pl.ds(bb, r_max), :]
                     for c in range(c_dim)], axis=1)
                for bb in bases
            ],
            axis=0,
        ).astype(jnp.bfloat16)                               # [n_rows, C*128]
        rows = jax.lax.dot_general(
            oh, slab, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [256, C*128]
        sel_t = lo_t == lane_iota
        sel_p = lo_p == lane_iota
        b = jnp.concatenate(
            [
                jnp.where(
                    sel_p,
                    w * jnp.sum(
                        jnp.where(sel_t, rows[:, c * LANES:(c + 1) * LANES],
                                  0.0),
                        axis=1, keepdims=True),
                    0.0,
                ).astype(jnp.bfloat16)
                for c in range(c_dim)
            ],
            axis=1,
        )                                                    # [256, C*128]
        oh_p = (hi_p == phi_iota).astype(jnp.bfloat16)       # [256, p_hi]
        add = jax.lax.dot_general(
            oh_p, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [p_hi, C*128]
        for c in range(c_dim):
            out_ref[0, c] += add[:, c * LANES:(c + 1) * LANES]


def _fused_bwd_kernel(base_lo_ref, base_hi_ref, sidx_ref, spay_ref,
                      g2d_ref, grad_ref, *, r_max: int, nblk: int,
                      c_dim: int, lb: int, off: int, dual: bool):
    """Per (level, chunk, g): v = w * g[pid] fetched with the point one-hot
    (no sort needed — pid/w ride the saved payload), then
    grad_table[slab(s)] += onehot^T @ (onehot_lane * v) accumulated
    straight into the output block (resident across chunk x g)."""
    l = pl.program_id(0)
    ch = pl.program_id(1)
    g = pl.program_id(2)
    width = sidx_ref.shape[2]
    p_hi = g2d_ref.shape[1]
    n_rows = (2 if dual else 1) * r_max

    @pl.when((ch == 0) & (g == 0))
    def _():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (width, n_rows), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 1)
    phi_iota = jax.lax.broadcasted_iota(jnp.int32, (width, p_hi), 1)
    for j in range(CB):
        bi = (ch * lb + l + off) * nblk + g * CB + j
        b_lo = pl.multiple_of(base_lo_ref[bi], 8)
        s = sidx_ref[0, 0, :, j:j + 1]
        pay = spay_ref[0, 0, :, j:j + 1]
        lo_t, hi_p, lo_p, w = _decode_cols(s, pay)
        oh_p = (hi_p == phi_iota).astype(jnp.bfloat16)       # [256, p_hi]
        gp = jax.lax.dot_general(
            oh_p, g2d_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [256, C*128]
        sel_t = lo_t == lane_iota
        sel_p = lo_p == lane_iota
        b = jnp.concatenate(
            [
                jnp.where(
                    sel_t,
                    w * jnp.sum(
                        jnp.where(sel_p, gp[:, c * LANES:(c + 1) * LANES],
                                  0.0),
                        axis=1, keepdims=True),
                    0.0,
                ).astype(jnp.bfloat16)
                for c in range(c_dim)
            ],
            axis=1,
        )                                                    # [256, C*128]
        if dual:
            b_hi = pl.multiple_of(base_hi_ref[bi], 8)
            oh = _dual_slab_onehot(s, b_lo, b_hi, row_iota, r_max)
        else:
            oh = ((s >> 7) - b_lo == row_iota).astype(jnp.bfloat16)
        g_loc = jax.lax.dot_general(
            oh, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [n_rows, C*128]
        for c in range(c_dim):
            cur = grad_ref[0, c, pl.ds(b_lo, r_max), :]
            grad_ref[0, c, pl.ds(b_lo, r_max), :] = (
                cur + g_loc[:r_max, c * LANES:(c + 1) * LANES])
            if dual:
                cur2 = grad_ref[0, c, pl.ds(b_hi, r_max), :]
                grad_ref[0, c, pl.ds(b_hi, r_max), :] = (
                    cur2 + g_loc[r_max:, c * LANES:(c + 1) * LANES])


# ---------------------------------------------------------------------------
# Sorted-path forward/backward (custom VJP)
# ---------------------------------------------------------------------------

def _base_rows(sidx, spec: SplitHashSpec, geo: _Geom):
    """Per-block HEAD and TAIL slab base rows from sorted keys
    [n_ch*Lb, M_pad]: head = first (= min) key's row, tail = the last REAL
    key's row shifted so the slab ends just past it — both floored to the
    8-row alignment dynamic slices require and clamped into the table
    (t_r_big is always a multiple of 8, so the clamp bound is aligned)."""
    blk = sidx.reshape(-1, geo.nblk, BLOCK)
    first = blk[..., 0]
    last = jnp.max(jnp.where(blk < SENTINEL, blk, 0), axis=-1)
    hi = max(spec.t_r_big - geo.r_max, 0) & ~7
    b_lo = jnp.clip((first >> 7) & ~jnp.int32(7), 0, hi)
    b_hi = jnp.clip(((last >> 7) & ~jnp.int32(7)) - geo.r_max + 8, 0, hi)
    return b_lo.reshape(-1), b_hi.reshape(-1)


def _sorted_prep(x01, spec: SplitHashSpec):
    """Corner keys + (pos | w15) payload for the big group, locality-sorted.
    Point sets beyond POINT_CAP split into equal chunks that batch on the
    sort's grid axis (ONE sort + ONE kernel launch per direction however
    many chunks — the round-2 Python chunk loop cost ~3 XLA glue passes
    per extra chunk)."""
    geo = _geometry(x01.shape[0], spec.t_cap_big)
    lb = spec.n_big
    total = geo.n_ch * geo.n_pad
    if total != x01.shape[0]:
        x01 = jnp.pad(x01, ((0, total - x01.shape[0]), (0, 0)))
    packed = PackedHashSpec(base=spec.big, t_cap=spec.t_cap_big,
                            t_r=spec.t_r_big)
    hi, lo, w = jax.vmap(
        lambda x: corner_indices_weights(x, packed)
    )(x01.reshape(geo.n_ch, geo.n_pad, 3))                   # [n_ch, Lb, M]
    idx = (hi * LANES + lo).reshape(geo.n_ch * lb, geo.m)
    wq = jnp.clip(jnp.round(w * W_SCALE), 0, W_SCALE).astype(
        jnp.int32).reshape(geo.n_ch * lb, geo.m)
    pay = jax.lax.shift_left(
        jnp.broadcast_to(jnp.arange(geo.m, dtype=jnp.int32)[None],
                         idx.shape), W_BITS) | wq
    if geo.m_pad != geo.m:
        idx = jnp.pad(idx, ((0, 0), (0, geo.m_pad - geo.m)),
                      constant_values=SENTINEL)
        pay = jnp.pad(pay, ((0, 0), (0, geo.m_pad - geo.m)))
    sidx, spay = bitonic_sort(idx, pay)
    b_lo, b_hi = _base_rows(sidx, spec, geo)
    return geo, sidx, spay, b_lo, b_hi


def _level_ranges(spec: SplitHashSpec):
    """(off, count, dual) per big-group level range: DENSE levels (a
    prefix — sizes are nondecreasing and hashing turns on once res^3
    exceeds the table) take the dual-slab kernels, hashed levels the
    cheaper single-slab ones."""
    uh = spec.big.use_hash.astype(bool)
    assert not np.any(np.diff(uh.astype(np.int8)) < 0), uh
    n_dense = int(np.sum(~uh))
    return [(0, n_dense, True), (n_dense, spec.n_big - n_dense, False)]


def _sorted_fwd_impl(x01, table_big, spec: SplitHashSpec):
    lb, C = spec.n_big, spec.level_dim
    assert C == 2, "sorted engine assumes feature pairs (level_dim == 2)"
    interpret = jax.default_backend() != "tpu"
    n = x01.shape[0]

    geo, sidx, spay, b_lo, b_hi = _sorted_prep(x01, spec)
    sidx_pk = _pack_cols(sidx, geo.n_g)           # [n_ch*Lb, n_g, 256, CB]
    spay_pk = _pack_cols(spay, geo.n_g)

    smem = pl.BlockSpec((geo.n_ch * lb * geo.nblk,),
                        lambda l, ch, g: (0,), memory_space=pltpu.SMEM)
    parts = []
    for off, lbp, dual in _level_ranges(spec):
        if lbp == 0:
            continue
        tile = pl.BlockSpec(
            (1, 1, BLOCK, CB),
            lambda l, ch, g, off=off: (ch * lb + l + off, g, 0, 0),
            memory_space=pltpu.VMEM)
        out_p = pl.pallas_call(
            functools.partial(_fused_fwd_kernel, r_max=geo.r_max,
                              nblk=geo.nblk, c_dim=C, lb=lb, off=off,
                              dual=dual),
            grid=(lbp, geo.n_ch, geo.n_g),
            in_specs=[
                smem, smem, tile, tile,
                pl.BlockSpec((1, C, spec.t_r_big, LANES),
                             lambda l, ch, g, off=off: (l + off, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, C, geo.p_hi, LANES),
                lambda l, ch, g, lbp=lbp: (ch * lbp + l, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (geo.n_ch * lbp, C, geo.p_hi, LANES), jnp.float32),
            interpret=interpret,
        )(b_lo, b_hi, sidx_pk, spay_pk, table_big)
        parts.append(out_p.reshape(geo.n_ch, lbp, C, geo.n_pad))

    out_pts = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)
    out = jnp.transpose(out_pts, (0, 3, 1, 2))
    out = out.reshape(geo.n_ch * geo.n_pad, lb * C)[:n]
    return out, (sidx_pk, spay_pk, b_lo, b_hi, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_sorted(x01, table_big, spec: SplitHashSpec):
    """Big-group encode: x01 [N,3] in [0,1] -> [N, Lb*C] features."""
    out, _ = _sorted_fwd_impl(x01, table_big, spec)
    return out


def _sorted_fwd(x01, table_big, spec):
    return _sorted_fwd_impl(x01, table_big, spec)


def _sorted_bwd(spec: SplitHashSpec, res, g):
    sidx_pk, spay_pk, b_lo, b_hi, n = res
    lb, C = spec.n_big, spec.level_dim
    geo = _geometry(n, spec.t_cap_big)
    interpret = jax.default_backend() != "tpu"

    total = geo.n_ch * geo.n_pad
    if total != n:
        g = jnp.pad(g, ((0, total - n), (0, 0)))
    # [n_ch*Lb, p_hi, C*128]: column c*128 + pid_lo, row pid_hi
    g_ln = jnp.transpose(
        g.reshape(geo.n_ch, geo.n_pad, lb, C), (0, 2, 3, 1)
    ).reshape(geo.n_ch * lb, C, geo.n_pad)
    g2d = jnp.concatenate(
        [g_ln[:, c].reshape(-1, geo.p_hi, LANES) for c in range(C)],
        axis=-1)

    smem = pl.BlockSpec((geo.n_ch * lb * geo.nblk,),
                        lambda l, ch, g: (0,), memory_space=pltpu.SMEM)
    parts = []
    for off, lbp, dual in _level_ranges(spec):
        if lbp == 0:
            continue
        tile = pl.BlockSpec(
            (1, 1, BLOCK, CB),
            lambda l, ch, g, off=off: (ch * lb + l + off, g, 0, 0),
            memory_space=pltpu.VMEM)
        grad_p = pl.pallas_call(
            functools.partial(_fused_bwd_kernel, r_max=geo.r_max,
                              nblk=geo.nblk, c_dim=C, lb=lb, off=off,
                              dual=dual),
            grid=(lbp, geo.n_ch, geo.n_g),
            in_specs=[
                smem, smem, tile, tile,
                pl.BlockSpec((1, geo.p_hi, C * LANES),
                             lambda l, ch, g, off=off:
                             (ch * lb + l + off, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C, spec.t_r_big, LANES),
                                   lambda l, ch, g: (l, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((lbp, C, spec.t_r_big, LANES),
                                           jnp.float32),
            interpret=interpret,
        )(b_lo, b_hi, sidx_pk, spay_pk, g2d)
        parts.append(grad_p)
    grad = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
    return None, grad


hash_encode_sorted.defvjp(_sorted_fwd, _sorted_bwd)


def spill_fraction(x01, spec: SplitHashSpec) -> jnp.ndarray:
    """Exact fraction of real big-group corners falling outside BOTH their
    block's head and tail slabs (those contribute zeros).  ~0 for
    hash-distributed keys; zero for up-to-2-cluster blocks on dense
    levels (the tail slab covers the post-gap cluster); tests pin it and
    trainers may log it."""
    geo, sidx, _, b_lo, b_hi = _sorted_prep(x01, spec)
    rows_b = (sidx >> 7).reshape(-1, geo.nblk, BLOCK)
    bl = b_lo.reshape(-1, geo.nblk)[..., None]
    bh = b_hi.reshape(-1, geo.nblk)[..., None]
    real = sidx.reshape(-1, geo.nblk, BLOCK) < SENTINEL
    in_lo = (rows_b >= bl) & (rows_b < bl + geo.r_max)
    in_hi = (rows_b >= bh) & (rows_b < bh + geo.r_max)
    spilled = real & ~(in_lo | in_hi)
    return jnp.sum(spilled) / jnp.maximum(jnp.sum(real), 1)


# ---------------------------------------------------------------------------
# Split top-level encode (small levels: matmul path; big levels: sorted)
# ---------------------------------------------------------------------------

def _big_packed_spec(spec: SplitHashSpec) -> PackedHashSpec:
    return PackedHashSpec(base=spec.big, t_cap=spec.t_cap_big,
                          t_r=spec.t_r_big)


def hash_encode_split(x01, tables, spec: SplitHashSpec, chunk: int = 4096,
                      use_kernels: bool = True):
    """x01 [N,3] in [0,1]^3, tables = (table_small, table_big) ->
    [N, L*C] features in level order.  Differentiable wrt both tables
    (each sub-path carries its own custom VJP).  use_kernels=False takes
    the pure-XLA gather twin on the same split layout (CPU oracle).
    Point sets beyond the engine's per-call pid budget are chunked."""
    table_small, table_big = tables
    parts = []
    if spec.small is not None:
        parts.append(
            hash_encode_pallas(x01, table_small, spec.small, chunk)
            if use_kernels else
            hash_encode_xla(x01, table_small, spec.small))
    if spec.big is not None:
        if use_kernels:
            # any N: the engine batches POINT_CAP-sized chunks on its own
            # grid axis (one sort + one kernel launch per direction)
            big = hash_encode_sorted(x01, table_big, spec)
        else:
            big = hash_encode_xla(x01, table_big, _big_packed_spec(spec))
        parts.append(big)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def split_from_flat(flat_table: jnp.ndarray, spec: SplitHashSpec):
    """[T_total, C] flat table (hash_encoding layout, per-level offsets) ->
    split packed tables; zero-pads each level to its group cap.  Test &
    checkpoint-interop helper."""
    C = spec.level_dim
    outs = []
    for lo_lvl, hi_lvl, cap in (
        (0, spec.n_small, 0 if spec.small is None else spec.small.t_cap),
        (spec.n_small, spec.num_levels, spec.t_cap_big),
    ):
        if hi_lvl <= lo_lvl:
            outs.append(None)
            continue
        lvls = []
        for l in range(lo_lvl, hi_lvl):
            o, sz = int(spec.base.offsets[l]), int(spec.base.sizes[l])
            lvl = jnp.zeros((cap, C), flat_table.dtype)
            lvl = lvl.at[:sz].set(flat_table[o:o + sz])
            lvls.append(jnp.transpose(
                lvl.reshape(cap // LANES, LANES, C), (2, 0, 1)))
        outs.append(jnp.stack(lvls))
    return tuple(outs)
