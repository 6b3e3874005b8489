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

Per-call point budget: pid rides 14 bits of the payload (N <= 16384
after 128-padding); `hash_encode_split` chunks larger point sets.

Blocks whose sorted keys span more than the static slab budget R_max
contribute zeros for out-of-slab corners (the one-hot simply misses).
For hash-distributed keys P(span > R_max) is astronomically small
(R_max is sized 3x the expected span + alignment slack; a Chernoff
bound at 3x for 256 draws is ~e^-100); `spill_fraction` measures it
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
    n_pad: int        # points padded to a multiple of 128 (<= POINT_CAP)
    p_hi: int         # n_pad // 128 (point-id sublane rows)
    m: int            # real corners per level (N * 8)
    m_pad: int        # padded sort length (power of two)
    nblk: int         # blocks per level (m_pad / BLOCK)
    n_g: int          # kernel grid steps per level (nblk / CB)
    r_max: int        # slab rows per block


def _geometry(n_points: int, t_cap: int) -> _Geom:
    assert n_points <= POINT_CAP, n_points
    n_pad = (n_points + LANES - 1) // LANES * LANES
    m = n_pad * 8
    m_pad = 1 << max(m - 1, BLOCK * CB - 1).bit_length()
    nblk = m_pad // BLOCK
    t_r = t_cap // LANES
    span_rows = BLOCK * t_cap / m_pad / LANES
    r_max = min(t_r, max(16, _round8(int(3 * span_rows) + 16)))
    return _Geom(n_pad=n_pad, p_hi=n_pad // LANES, m=m, m_pad=m_pad,
                 nblk=nblk, n_g=nblk // CB, r_max=r_max)


def _pack_cols(a: jnp.ndarray, n_g: int):
    """[L, M_pad] -> [L, n_g, BLOCK, CB]: element f of chunk k sits at
    [:, k, f % BLOCK, f // BLOCK] so in-kernel column j is a [BLOCK, 1]
    sublane vector (no lane->sublane relayouts; see hash_pallas._prep)."""
    L = a.shape[0]
    return jnp.transpose(a.reshape(L, n_g, CB, BLOCK), (0, 1, 3, 2))


# ---------------------------------------------------------------------------
# Pallas kernels (grid = (L_big, n_g); table/point blocks keyed by level)
# ---------------------------------------------------------------------------

def _decode_cols(s, pay):
    """Sorted (key, payload) columns [256, 1] -> table row/lane, point
    hi/lo and fixed-point weight."""
    lo_t = s & (LANES - 1)
    pos = jax.lax.shift_right_logical(pay, W_BITS) & ((1 << 17) - 1)
    w = (pay & W_SCALE).astype(jnp.float32) * (1.0 / W_SCALE)
    pid = pos >> 3
    return lo_t, pid >> 7, pid & (LANES - 1), w


def _fused_fwd_kernel(base_ref, sidx_ref, spay_ref, table_ref, out_ref,
                      *, r_max: int, nblk: int, c_dim: int):
    """Per (level, chunk): slab-local one-hot fetch for CB blocks of 256
    sorted corners, multiplied by the payload weight and scatter-added
    into the per-point accumulator via the point one-hot matmul.
    Out-of-slab keys (sentinel padding or span spills) match no one-hot
    row and contribute exact zeros."""
    l = pl.program_id(0)
    g = pl.program_id(1)
    width = sidx_ref.shape[2]
    p_hi = out_ref.shape[2]

    @pl.when(g == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (width, r_max), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 1)
    phi_iota = jax.lax.broadcasted_iota(jnp.int32, (width, p_hi), 1)
    for j in range(CB):
        base = base_ref[l * nblk + g * CB + j]
        base = pl.multiple_of(base, 8)
        s = sidx_ref[0, 0, :, j:j + 1]                       # [256, 1]
        pay = spay_ref[0, 0, :, j:j + 1]
        lo_t, hi_p, lo_p, w = _decode_cols(s, pay)
        oh_t = ((s >> 7) - base == row_iota).astype(jnp.bfloat16)
        slab = jnp.concatenate(
            [table_ref[0, c, pl.ds(base, r_max), :] for c in range(c_dim)],
            axis=1,
        ).astype(jnp.bfloat16)                               # [r_max, C*128]
        rows = jax.lax.dot_general(
            oh_t, slab, dimension_numbers=(((1,), (0,)), ((), ())),
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


def _fused_bwd_kernel(base_ref, sidx_ref, spay_ref, g2d_ref, grad_ref,
                      *, r_max: int, nblk: int, c_dim: int):
    """Per (level, chunk): v = w * g[pid] fetched with the point one-hot
    (no sort needed — pid/w ride the saved payload), then
    grad_table[slab] += onehot_t^T @ (onehot_lane * v) accumulated
    straight into the output block (resident across the chunk axis)."""
    l = pl.program_id(0)
    g = pl.program_id(1)
    width = sidx_ref.shape[2]
    p_hi = g2d_ref.shape[1]

    @pl.when(g == 0)
    def _():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (width, r_max), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 1)
    phi_iota = jax.lax.broadcasted_iota(jnp.int32, (width, p_hi), 1)
    for j in range(CB):
        base = base_ref[l * nblk + g * CB + j]
        base = pl.multiple_of(base, 8)
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
        oh_t = ((s >> 7) - base == row_iota).astype(jnp.bfloat16)
        g_loc = jax.lax.dot_general(
            oh_t, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [r_max, C*128]
        for c in range(c_dim):
            cur = grad_ref[0, c, pl.ds(base, r_max), :]
            grad_ref[0, c, pl.ds(base, r_max), :] = (
                cur + g_loc[:, c * LANES:(c + 1) * LANES])


# ---------------------------------------------------------------------------
# Sorted-path forward/backward (custom VJP)
# ---------------------------------------------------------------------------

def _base_rows(sidx, spec: SplitHashSpec, geo: _Geom):
    """Per-block slab base row from sorted keys [Lb, M_pad]: first (= min)
    key of the block, floored to the 8-row alignment dynamic slices
    require, clamped into the table."""
    first = sidx.reshape(spec.n_big, geo.nblk, BLOCK)[..., 0]
    # upper clamp must itself be 8-aligned: t_r_big is t_cap_big/128 and is
    # NOT always a multiple of 8 (e.g. a dense top level of 29792 entries
    # -> t_r 233); an unaligned clamp would break the pl.multiple_of(base,
    # 8) promise in the kernels (ADVICE r2: silent wrong-DMA hazard).
    hi = max(spec.t_r_big - geo.r_max, 0) & ~7
    base = jnp.clip((first >> 7) & ~jnp.int32(7), 0, hi)
    return base.reshape(-1)


def _sorted_prep(x01, spec: SplitHashSpec):
    """Corner keys + (pos | w15) payload for the big group, locality-sorted."""
    geo = _geometry(x01.shape[0], spec.t_cap_big)
    lb = spec.n_big
    if geo.n_pad != x01.shape[0]:
        x01 = jnp.pad(x01, ((0, geo.n_pad - x01.shape[0]), (0, 0)))
    hi, lo, w = corner_indices_weights(
        x01, PackedHashSpec(base=spec.big, t_cap=spec.t_cap_big,
                            t_r=spec.t_r_big))
    idx = hi * LANES + lo                                    # [Lb, M]
    wq = jnp.clip(jnp.round(w * W_SCALE), 0, W_SCALE).astype(jnp.int32)
    pay = jax.lax.shift_left(
        jnp.broadcast_to(jnp.arange(geo.m, dtype=jnp.int32)[None],
                         idx.shape), W_BITS) | wq
    if geo.m_pad != geo.m:
        idx = jnp.pad(idx, ((0, 0), (0, geo.m_pad - geo.m)),
                      constant_values=SENTINEL)
        pay = jnp.pad(pay, ((0, 0), (0, geo.m_pad - geo.m)))
    sidx, spay = bitonic_sort(idx, pay)
    return geo, sidx, spay, _base_rows(sidx, spec, geo)


def _sorted_fwd_impl(x01, table_big, spec: SplitHashSpec):
    lb, C = spec.n_big, spec.level_dim
    assert C == 2, "sorted engine assumes feature pairs (level_dim == 2)"
    interpret = jax.default_backend() != "tpu"
    n = x01.shape[0]

    geo, sidx, spay, base = _sorted_prep(x01, spec)
    sidx_pk = _pack_cols(sidx, geo.n_g)
    spay_pk = _pack_cols(spay, geo.n_g)

    tile = pl.BlockSpec((1, 1, BLOCK, CB), lambda l, g: (l, g, 0, 0),
                        memory_space=pltpu.VMEM)
    out_pts = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, r_max=geo.r_max, nblk=geo.nblk,
                          c_dim=C),
        grid=(lb, geo.n_g),
        in_specs=[
            pl.BlockSpec((lb * geo.nblk,), lambda l, g: (0,),
                         memory_space=pltpu.SMEM),
            tile, tile,
            pl.BlockSpec((1, C, spec.t_r_big, LANES),
                         lambda l, g: (l, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, geo.p_hi, LANES),
                               lambda l, g: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lb, C, geo.p_hi, LANES), jnp.float32),
        interpret=interpret,
    )(base, sidx_pk, spay_pk, table_big)

    out = jnp.transpose(out_pts.reshape(lb, C, geo.n_pad), (2, 0, 1))
    out = out[:n].reshape(n, lb * C)
    return out, (sidx_pk, spay_pk, base, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_sorted(x01, table_big, spec: SplitHashSpec):
    """Big-group encode: x01 [N,3] in [0,1] -> [N, Lb*C] features."""
    out, _ = _sorted_fwd_impl(x01, table_big, spec)
    return out


def _sorted_fwd(x01, table_big, spec):
    return _sorted_fwd_impl(x01, table_big, spec)


def _sorted_bwd(spec: SplitHashSpec, res, g):
    sidx_pk, spay_pk, base, n = res
    lb, C = spec.n_big, spec.level_dim
    geo = _geometry(n, spec.t_cap_big)
    interpret = jax.default_backend() != "tpu"

    g_ln = jnp.transpose(g.reshape(n, lb, C), (1, 2, 0))     # [Lb, C, N]
    if geo.n_pad != n:
        g_ln = jnp.pad(g_ln, ((0, 0), (0, 0), (0, geo.n_pad - n)))
    # [Lb, p_hi, C*128]: column c*128 + pid_lo, row pid_hi
    g2d = jnp.concatenate(
        [g_ln[:, c].reshape(lb, geo.p_hi, LANES) for c in range(C)], axis=-1)

    tile = pl.BlockSpec((1, 1, BLOCK, CB), lambda l, g: (l, g, 0, 0),
                        memory_space=pltpu.VMEM)
    grad = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, r_max=geo.r_max, nblk=geo.nblk,
                          c_dim=C),
        grid=(lb, geo.n_g),
        in_specs=[
            pl.BlockSpec((lb * geo.nblk,), lambda l, g: (0,),
                         memory_space=pltpu.SMEM),
            tile, tile,
            pl.BlockSpec((1, geo.p_hi, C * LANES),
                         lambda l, g: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, spec.t_r_big, LANES),
                               lambda l, g: (l, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lb, C, spec.t_r_big, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(base, sidx_pk, spay_pk, g2d)
    return None, grad


hash_encode_sorted.defvjp(_sorted_fwd, _sorted_bwd)


def spill_fraction(x01, spec: SplitHashSpec) -> jnp.ndarray:
    """Exact fraction of real big-group corners falling outside their
    block's slab (those contribute zeros).  ~0 for hash-distributed keys;
    tests pin it."""
    geo, sidx, _, base = _sorted_prep(x01, spec)
    rows = sidx >> 7                                         # [Lb, M_pad]
    b = base.reshape(spec.n_big, geo.nblk)[..., None]        # [Lb, nblk, 1]
    rows_b = rows.reshape(spec.n_big, geo.nblk, BLOCK)
    real = sidx.reshape(spec.n_big, geo.nblk, BLOCK) < SENTINEL
    spilled = real & ((rows_b < b) | (rows_b >= b + geo.r_max))
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
            n = x01.shape[0]
            if n <= POINT_CAP:
                big = hash_encode_sorted(x01, table_big, spec)
            else:
                n_ch = -(-n // POINT_CAP)
                per = -(-n // n_ch)
                per = (per + LANES - 1) // LANES * LANES
                pieces = [
                    hash_encode_sorted(x01[i:i + per], table_big, spec)
                    for i in range(0, n, per)
                ]
                big = jnp.concatenate(pieces, axis=0)
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
