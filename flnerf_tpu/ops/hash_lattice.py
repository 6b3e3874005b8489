"""Lattice-hash gather engine ("v4") for large hash-encoding tables.

The sorted-block engine (ops/hash_sorted.py) sorts all N*8 CORNER indices
per level and scatter-adds features back to points with a one-hot matmul
that is quadratic in the per-chunk point count — measured 49 ms fwd+bwd
for a 65k-point trainer batch at 2^19, ~90% of the NGP train step.  Two
measured TPU facts reshape the design (tools/profile_v4.py):

  * batched thin-K matmuls pay ~0.25-0.6 us PER INSTANCE (MXU pipeline
    fill) — instance count dominates, not MACs;
  * the MXU streams ~2 M-rows/cycle — per-entry cost is proportional to
    the number of 128-lane output passes, so fetching [*, C*128] rows to
    lane-select C=2 values wastes a factor of two at N=256.

This engine changes the HASH FUNCTION on hashed levels so the whole
fetch restructures around those facts:

  key(cell) = (x*P1 + y*P2 + z*P3) mod T      (T = 2^19, power of two)

with (P1,P2,P3) random odd multipliers chosen per level to maximize the
alias lattice's shortest vector (see _pick_multipliers).  The hash is
LINEAR, so the 8 cell corners sit at FIXED per-level offsets from one
base key:  corner c of cell b has key (key(b) + off_c) mod T.  Dense
(non-hashed) levels are already linear (x + S*y + S^2*z) and keep the
reference index semantics bit-for-bit.  Consequences:

  1. ONE bitonic sort of N base keys per level (8x fewer than corner
     sorting), payloads carrying the original position and the cell
     fraction in fixed point — trilerp folds inside the fetch kernel.
  2. The fetch kernel processes ``block`` consecutive sorted entries per
     matmul against a dynamically-sliced table slab: per corner one
     [block, r_max] @ [r_max, 128] fetch (few instances, long M streams).
     ``block`` is sized per call so r_max ~ 2x the expected key span of a
     block at the call's REAL point density (padding cannot change real
     key spacing, so chunks get points dealt round-robin).  The table
     packs 64 entries per 128-lane row (both feature channels adjacent),
     halving the M passes vs a [*, C*128] row fetch.
  3. No quadratic point scatter: features leave the kernel in sorted
     order and a second small bitonic sort (key = saved position)
     unsorts them — O(N log^2 N) vreg moves instead of O(N^2/128) MACs.
     That unsort's spare payload returns the INVERSE permutation, which
     the backward uses to permute upstream gradients into sorted order
     (one more small sort) before the transposed slab scatter (K=2048
     contractions — full MXU utilization).

Collision structure: keys collide iff cell difference D satisfies
D . P == 0 (mod T) — a sublattice of index T whose shortest vector for
random odd P is ~T^(1/3) ~ 80 cells; _pick_multipliers rejects P with a
short alias vector, so NEARBY cells never collide (the xor hash has no
such guarantee).  Distant structured aliases are disambiguated by the
other levels, like xor collisions; tools/quality_lattice.py measures
the end-to-end PSNR delta vs the xor oracle.

CALLER CONTRACT (duplicate uniformity): slab rows are sized from the
call's point count assuming keys are (near-)uniformly duplicated.  A
caller that pads a batch by REPEATING ONE POINT (e.g. broadcasting the
last ray of a partial image chunk) concentrates the duplicate mass in
one sorted run, halving the real-key density the sizing assumed —
every hashed level's slab comes up short and silently drops corners
(this was the round-3 "lattice quality gap": 32.9 vs 38.2 dB at eval
chunk 8192 on a 4096-ray image, LATTICE_diagnose.json).  Pad by
WRAP-TILING real points instead (render/ngp.py ngp_render_image);
spill_fraction_lattice is the runtime monitor for violations.

Levels smaller than split_min_size stay on the hash_pallas matmul path
with reference xor semantics (ops/hash_sorted.make_split_spec decides).
Reference for semantics being replaced: ngp-ours/gridencoder/src/
gridencoder.cu:36-69 (grid_hash / get_grid_index); the dense branch and
all scale/resolution/+0.5 rules still match it exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flnerf_tpu.ops.hash_pallas import hash_encode_pallas, hash_encode_xla
from flnerf_tpu.ops.hash_sorted import (
    SplitHashSpec,
    _big_packed_spec,
    make_split_spec,
)
from flnerf_tpu.ops.sort_pallas import bitonic_sort

LANES = 128
PACK = 64           # table entries per 128-lane row (C=2 channels adjacent)
POINT_CAP = 1 << 17  # points per chunk: position payload budget (17 bits)
R_CAP = 512          # slab-row ceiling (one-hot VMEM bound)
F16 = (1 << 16) - 1  # fixed-point fraction scales in the sort payloads
F14 = (1 << 14) - 1


def _round8(x: int) -> int:
    return (int(x) + 7) // 8 * 8


# ---------------------------------------------------------------------------
# Multiplier selection: maximize the alias lattice's shortest vector
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _pick_multipliers(t: int, n_levels: int, radius: int = 96,
                      n_cand: int = 96, seed: int = 7):
    """[n_levels, 3] odd multipliers mod t, each scored by the shortest
    nonzero |D| with D.P == 0 (mod t) inside a |D|_inf <= radius ball
    (exact, vectorized).  Candidates with no alias inside the ball score
    radius+1.  The Minkowski bound for a 3-D sublattice of index t is
    ~t^(1/3) (~80 cells at 2^19): radius must EXCEED it or candidates
    tie at the ball edge and the picks are effectively the first ones
    sampled — measured on the freq-40 scene, tie-broken radius-40 picks
    cost PSNR vs near-bound picks (coherent sublattice aliases are the
    lattice hash's failure mode, so maximizing the shortest alias
    distance is the one knob)."""
    rng = np.random.default_rng(seed)
    ax = np.arange(-radius, radius + 1, dtype=np.int64)
    dx, dy, dz = np.meshgrid(ax, ax, ax, indexing="ij")
    nz = (dx != 0) | (dy != 0) | (dz != 0)
    n2 = dx * dx + dy * dy + dz * dz
    scored = []
    for _ in range(n_cand):
        p = (rng.integers(1, t, 3) | 1).astype(np.int64)
        hit = ((dx * p[0] + dy * p[1] + dz * p[2]) % t == 0) & nz
        lam2 = int(n2[hit].min()) if hit.any() else (radius + 1) ** 2
        scored.append((lam2, tuple(int(v) for v in p)))
    scored.sort(reverse=True)
    out = [scored[i % len(scored)][1] for i in range(n_levels)]
    return np.asarray(out, np.int64)


class LatticeSpec(NamedTuple):
    """Static config: the small/big split plus the big group's lattice."""

    split: SplitHashSpec
    mult: np.ndarray      # [Lb, 3] int64 multipliers (hashed levels)
    offs: np.ndarray      # [Lb, 8] int64 corner offsets (all big levels)
    t_r64: int            # shared big-table rows at PACK entries/row
    r_pad: int            # wrap-pad rows == the static r_max ceiling
    block: int            # max sorted entries per slab matmul (M dim)
    cb: int               # blocks per kernel grid step

    @property
    def n_big(self) -> int:
        return self.split.n_big

    @property
    def level_dim(self) -> int:
        return self.split.level_dim

    @property
    def num_levels(self) -> int:
        return self.split.num_levels

    @property
    def output_dim(self) -> int:
        return self.split.base.num_levels * self.split.base.level_dim


def _corner_bits(c: int):
    return [(c >> d) & 1 for d in range(3)]


def make_lattice_spec(
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    split_min_size: int = 1 << 15,
    block: int = 512,
    cb: int = 4,
) -> LatticeSpec:
    split = make_split_spec(
        num_levels=num_levels, level_dim=level_dim,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        desired_resolution=desired_resolution,
        split_min_size=split_min_size,
    )
    assert split.big is not None, "lattice engine needs big levels"
    assert level_dim == 2, "lattice engine assumes level_dim == 2"
    big = split.big
    sizes = big.sizes.astype(np.int64)
    hashed = big.use_hash.astype(bool)
    # every hashed level's table must be the shared power-of-two cap: the
    # wrap pad (one copy of the first r_pad rows) then serves them all
    if hashed.any():
        hsz = sizes[hashed]
        assert np.all(hsz == hsz[0]) and (hsz[0] & (hsz[0] - 1)) == 0, hsz
        t_hash = int(hsz[0])
    else:
        t_hash = 0
    t_cap = max(int(sizes.max()), t_hash)
    t_cap = -(-t_cap // (8 * PACK)) * (8 * PACK)
    if hashed.any():
        assert t_cap == t_hash, (t_cap, t_hash)
    mult = _pick_multipliers(max(t_hash, 2), split.n_big)
    offs = np.zeros((split.n_big, 8), np.int64)
    for li in range(split.n_big):
        if hashed[li]:
            p = mult[li]
            for c in range(8):
                b = _corner_bits(c)
                offs[li, c] = (b[0] * p[0] + b[1] * p[1] + b[2] * p[2]) \
                    % t_hash
        else:
            s = int(big.resolutions[li]) + 1
            for c in range(8):
                b = _corner_bits(c)
                offs[li, c] = b[0] + s * (b[1] + s * b[2])
    t_r64 = t_cap // PACK
    # r_pad bounds every geometry's r_max: VMEM holds the [block, r_max]
    # one-hot (bf16) so cap at 512 rows; small tables fit whole.
    r_pad = min(_round8(t_r64), R_CAP)
    assert block & (block - 1) == 0 and block >= 8, block
    assert cb & (cb - 1) == 0 and cb >= 1, cb
    return LatticeSpec(split=split, mult=mult, offs=offs, t_r64=t_r64,
                       r_pad=r_pad, block=block, cb=cb)


def init_lattice_tables(key, spec: LatticeSpec):
    """(table_small | None, table_big [Lb, t_r64, 128] f32): the big table
    packs PACK entries per row, channels adjacent (entry e of level l sits
    at [l, e >> 6, 2*(e & 63) + c]); U(-1e-4, 1e-4) like torch-ngp."""
    ks, kb = jax.random.split(key)
    ts = None
    if spec.split.small is not None:
        ts = jax.random.uniform(
            ks, (spec.split.n_small, spec.level_dim, spec.split.small.t_r,
                 LANES), jnp.float32, -1e-4, 1e-4)
    tb = jax.random.uniform(
        kb, (spec.n_big, spec.t_r64, LANES), jnp.float32, -1e-4, 1e-4)
    return ts, tb


# ---------------------------------------------------------------------------
# Prep: base keys, fixed-point payloads, locality sort, slab bases
# ---------------------------------------------------------------------------

class _Geom(NamedTuple):
    n_ch: int
    m_pad: int          # points per chunk incl. padding (power of two)
    block: int          # sorted entries per slab matmul this call
    nblk: int
    n_g: int
    r_max: int          # largest dense slab (b_tail clamp compat)
    r_hash: int         # HASHED levels' slab rows (single slab, tight)
    r_dense: tuple      # PER-LEVEL dense slab rows (dual head+tail slabs)
    bw: int             # per-(level,chunk) slab-base row width, padded to
                        # x1024 (rank-1 SMEM blocks must match XLA's
                        # T(1024) layout tile; Mosaic verifies it)


def _geometry(n_points: int, spec: LatticeSpec) -> _Geom:
    """Per-call kernel geometry.  The slab must cover the key span of one
    BLOCK of consecutive sorted REAL keys — expected span is
    block*t_r64/per rows for per uniform keys — so the block size shrinks
    with the call's real point density (padding cannot raise density: the
    round-robin deal in _prep keeps every chunk's real count ~= per).

    HASHED levels get a tight slab: distinct cells hash uniformly
    regardless of the sample distribution (duplicates only SHRINK spans),
    so a block's span is Gamma(block)-concentrated with std ~ span/
    sqrt(block) — mean + 4 sigma + 24 alignment/carry rows covers it to
    ~1e-6 per block (spill degrades gracefully to a dropped corner and
    spill_fraction_lattice monitors it).  DENSE levels keep the wide 2x
    slab + the dual tail slab, sized PER LEVEL from that level's OWN row
    count (a 32^3 level is 512 rows — sizing its slab for the shared
    8192-row cap wastes ~5x the MACs): their keys are spatial, spans are
    heavy-tailed under clustering."""
    n_ch = max(-(-n_points // POINT_CAP), 1)
    per = -(-n_points // n_ch)
    m_pad = 1 << max(per - 1, 127).bit_length()
    # largest pow2 block whose 2x-expected span + margin fits r_pad rows
    b_cap = max((spec.r_pad - 32) * per // (2 * spec.t_r64), 8)
    block = 1 << min(b_cap.bit_length() - 1, spec.block.bit_length() - 1)
    block = min(block, m_pad // spec.cb)
    nblk = m_pad // block
    span = block * spec.t_r64 / per
    # tiny blocks see heavy-tailed per-block spans (few keys): widen the
    # slab margin there — the extra MACs are negligible at those sizes
    mult = 2.0 if block >= 64 else 4.0
    # sigma uses block/2, not block: wrap-tiled pads (the caller
    # contract's sanctioned padding, up to 2x duplication) halve the
    # DISTINCT keys per block, doubling the span variance — at training
    # shapes round8 absorbs the wider margin (r unchanged), at small
    # calls it costs a few slab rows
    r_hash = min(spec.t_r64, spec.r_pad,
                 max(_round8(int(span + 4.0 * span / np.sqrt(block / 2.0))
                             + 24),
                     32))
    big = spec.split.big
    r_dense = []
    for li in range(spec.n_big):
        if big.use_hash[li]:
            r_dense.append(0)
            continue
        rows_l = -(-int(big.sizes[li]) // PACK)
        span_l = block * rows_l / per
        r_dense.append(min(_round8(rows_l), spec.r_pad,
                           max(_round8(int(mult * span_l) + 24), 32)))
    r_max = max(r_dense) if any(r_dense) else 32
    if block < 64:
        r_hash = min(spec.t_r64, spec.r_pad,
                     max(_round8(int(mult * span) + 24), 32))
    return _Geom(n_ch=n_ch, m_pad=m_pad, block=block, nblk=nblk,
                 n_g=nblk // spec.cb, r_max=r_max, r_hash=r_hash,
                 r_dense=tuple(r_dense),
                 bw=-(-nblk * 8 // 1024) * 1024)


def _base_keys_payloads(x01, spec: LatticeSpec):
    """x01 [n_ch, m_pad, 3] -> keys [n_ch*Lb, m_pad] int32 base cell keys,
    p0 = fx16<<16 | fy16, p1 = pos<<14 | fz14 (pos = in-chunk iota)."""
    big = spec.split.big
    scales = jnp.asarray(big.scales)[:, None, None]           # [Lb,1,1]
    pos = x01[:, None] * scales + 0.5                         # [ch,Lb,M,3]
    cell = jnp.floor(pos)
    frac = pos - cell
    cell = cell.astype(jnp.int32)

    mult = jnp.asarray(spec.mult.astype(np.int64) & 0xFFFFFFFF, jnp.uint32)
    sizes = jnp.asarray(big.sizes.astype(np.int64), jnp.uint32)
    strides = jnp.asarray(big.resolutions.astype(np.int64) + 1, jnp.uint32)
    use_hash = jnp.asarray(big.use_hash)[None, :, None]

    cu = cell.astype(jnp.uint32)
    hk = (cu[..., 0] * mult[None, :, 0:1]
          + cu[..., 1] * mult[None, :, 1:2]
          + cu[..., 2] * mult[None, :, 2:3])
    hk = hk % sizes[None, :, None]
    st = strides[None, :, None]
    dk = cu[..., 0] + st * (cu[..., 1] + st * cu[..., 2])
    key = jnp.where(use_hash, hk, dk).astype(jnp.int32)       # [ch,Lb,M]

    fq = jnp.clip(jnp.round(frac * F16), 0, F16).astype(jnp.int32)
    fz = jnp.clip(jnp.round(frac[..., 2] * F14), 0, F14).astype(jnp.int32)
    p0 = jax.lax.shift_left(fq[..., 0], 16) | fq[..., 1]
    iota = jnp.arange(x01.shape[1], dtype=jnp.int32)[None, None]
    p1 = jax.lax.shift_left(iota, 14) | fz
    p1 = jnp.broadcast_to(p1, key.shape)

    n_ch, lb, m = key.shape
    return (key.reshape(n_ch * lb, m), p0.reshape(n_ch * lb, m),
            p1.reshape(n_ch * lb, m))


def _slab_bases(skey, spec: LatticeSpec, geo: _Geom):
    """Per (row, block, corner): aligned slab bases.  b_full is the
    UNREDUCED aligned row of (first_key + off) — the kernel's relative
    rows subtract it directly; b_slice is b_full reduced mod the level's
    row count (hashed wrap), the actual dynamic-slice start into the
    wrap-padded table.  b_tail is the dense-level tail slab (gap blocks).
    """
    big = spec.split.big
    lb = spec.n_big
    rows = skey.shape[0]
    n_ch = rows // lb
    blk = skey.reshape(rows, geo.nblk, geo.block)
    first = blk[..., 0].astype(jnp.int32)                 # [rows, nblk]
    last = blk[..., -1].astype(jnp.int32)                 # ascending sort
    offs = jnp.asarray(spec.offs.astype(np.int64), jnp.int32)   # [Lb, 8]
    offs_r = jnp.tile(offs, (n_ch, 1))[:, None, :]        # [rows, 1, 8]
    # wrap applies to hashed levels only (their row count is 8-aligned by
    # construction); a dense level's b_full never reaches its row count
    t_rows = jnp.asarray(np.tile(
        np.where(big.use_hash, big.sizes // PACK, 1 << 30), n_ch
    ).astype(np.int32))[:, None, None]

    b_full = ((first[..., None] + offs_r) >> 6) & ~jnp.int32(7)
    b_slice = jnp.where(b_full >= t_rows, b_full - t_rows, b_full)
    # tail slab anchored at the block END, per-level slab rows (dense)
    r_lvl = jnp.asarray(np.tile(
        np.where(big.use_hash, geo.r_hash, geo.r_dense), n_ch
    ).astype(np.int32))[:, None, None]
    b_tail = ((last[..., None] + offs_r) >> 6) & ~jnp.int32(7)
    b_tail = jnp.maximum(b_tail - r_lvl + 8, 0)

    def to32(a):
        # pad each row to geo.bw (x1024): rank-1 SMEM blocks must match
        # XLA's T(1024) layout tile, and the kernels slice one row per
        # (level, chunk) program
        a = a.reshape(rows, geo.nblk * 8)
        if geo.bw != a.shape[1]:
            a = jnp.pad(a, ((0, 0), (0, geo.bw - a.shape[1])))
        return a.reshape(-1)

    return to32(b_full), to32(b_slice), to32(b_tail)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _decode_cols(p0, p1):
    fx = jax.lax.shift_right_logical(p0, 16).astype(jnp.float32) * (1.0 / F16)
    fy = (p0 & F16).astype(jnp.float32) * (1.0 / F16)
    fz = (p1 & F14).astype(jnp.float32) * (1.0 / F14)
    return fx, fy, fz


def _corner_w(fx, fy, fz, c):
    """Trilinear weight for corner ``c`` (traced or static int)."""
    wx = jnp.where((c & 1) == 1, fx, 1.0 - fx)
    wy = jnp.where(((c >> 1) & 1) == 1, fy, 1.0 - fy)
    wz = jnp.where(((c >> 2) & 1) == 1, fz, 1.0 - fz)
    return wx * wy * wz


def _fetch_kernel(offs_ref, bfull_ref, bslice_ref, btail_ref,
                  skey_ref, sp0_ref, sp1_ref, table_ref,
                  out0_ref, out1_ref, *, r_max: int,
                  off: int, dual: bool, cb: int):
    """Per (level, chunk, g): for cb blocks of ``block`` sorted base
    entries, fetch all 8 corners' features with per-corner slab matmuls,
    fold the trilinear weights, and write the two channel accumulators as
    packed columns (still in sorted order — the XLA caller unsorts).

    The slab-base arrays arrive BLOCKED per (level, chunk) — [nblk*8]
    SMEM slices, not the whole [n_ch*lb*nblk*8] array: whole-array SMEM
    scaled with n_ch and blew the 1 MB SMEM space at 2^19-point calls
    (3 x 458 KB = 1.31 MB, a hard compile error — LATTICE_multichunk
    probe, r4).

    ``dual`` (dense levels) adds a tail slab per corner so gap-straddling
    blocks stay exact (clustered points on dense levels, ADVICE r2);
    hashed levels keep the single slab (uniform keys, Chernoff-safe)."""
    l = pl.program_id(0)
    g = pl.program_id(2)
    width = skey_ref.shape[2]
    n_rows = (2 if dual else 1) * r_max

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (width, n_rows), 1)
    # lane parity: even lanes gather channel 0, odd lanes channel 1
    par = jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 1) & 1

    # The corner loop is a fori_loop (not a Python unroll): Mosaic stacks
    # unrolled bodies' temporaries CONCURRENTLY — the 4x8 fully-unrolled
    # version blew the 16 MB scoped-VMEM limit on real TPU (one live
    # oh+rows set is ~1.5 MB).  The j loop stays a static unroll: lane-dim
    # slices (the [..., j] tile columns) must use static offsets.
    for j in range(cb):
        bi = (g * cb + j) * 8
        s = skey_ref[0, 0, :, j:j + 1]                       # [BLOCK, 1]
        p0 = sp0_ref[0, 0, :, j:j + 1]
        p1 = sp1_ref[0, 0, :, j:j + 1]
        fx, fy, fz = _decode_cols(p0, p1)

        def c_body(c2, acc):
            # 2 corners per fori iteration: gives Mosaic a window to
            # overlap the next dot's weight load with the current drain
            # (~0.2 us MXU fill per dot) at ~2 live temp sets of stack
            for dc in range(2):
                c = c2 * 2 + dc
                a = s + offs_ref[(l + off) * 8 + c]
                rel = (a >> 6) - bfull_ref[bi + c]
                b_lo = pl.multiple_of(bslice_ref[bi + c], 8)
                if dual:
                    in_head = (rel >= 0) & (rel < r_max)
                    b_hi = pl.multiple_of(btail_ref[bi + c], 8)
                    rel_t = (a >> 6) - b_hi
                    # rel_t in [-r_max, 0) would land in HEAD rows after
                    # the +r_max shift (3+-cluster blocks: a middle
                    # cluster just below the tail base) — force a
                    # no-match row so out-of-slab corners stay exact 0
                    pos_row = jnp.where(
                        in_head, rel,
                        jnp.where(rel_t >= 0, rel_t + r_max, -1))
                    oh = (pos_row == row_iota).astype(jnp.bfloat16)
                    slab = jnp.concatenate(
                        [table_ref[0, pl.ds(b_lo, r_max), :],
                         table_ref[0, pl.ds(b_hi, r_max), :]], axis=0)
                else:
                    oh = (rel == row_iota).astype(jnp.bfloat16)
                    slab = table_ref[0, pl.ds(b_lo, r_max), :]
                rows = jax.lax.dot_general(
                    oh, slab, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                            # [BLOCK, 128]
                # ONE lane-wise hardware gather per corner (Mosaic wants
                # full-width indices): even lanes read the entry's
                # channel-0 lane, odd lanes channel 1, so the final
                # per-channel extraction is a free static lane slice.
                lane = 2 * (a & (PACK - 1))
                w = _corner_w(fx, fy, fz, c)
                g = jnp.take_along_axis(rows, lane + par, axis=1,
                                        mode="promise_in_bounds")
                acc = acc + w * g
            return acc

        acc = jax.lax.fori_loop(
            0, 4, c_body, jnp.zeros((width, LANES), jnp.float32))
        out0_ref[0, 0, :, j] = acc[:, 0]
        out1_ref[0, 0, :, j] = acc[:, 1]


def _scatter_kernel(offs_ref, bfull_ref, bslice_ref, btail_ref,
                    skey_ref, sp0_ref, sp1_ref, g0_ref, g1_ref,
                    grad_ref, *, r_max: int,
                    off: int, dual: bool, cb: int):
    """Per (level, chunk, g): grad_table[slab] += oh^T @ (w * g at the
    entry's lanes) per corner — K = BLOCK contractions (full MXU), the
    upstream grads arrive already permuted into sorted order.  Slab-base
    arrays arrive blocked per (level, chunk) — see _fetch_kernel."""
    l = pl.program_id(0)
    ch = pl.program_id(1)
    g = pl.program_id(2)
    width = skey_ref.shape[2]

    @pl.when((ch == 0) & (g == 0))
    def _():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    row_iota = jax.lax.broadcasted_iota(
        jnp.int32, (width, (2 if dual else 1) * r_max), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (width, LANES), 1)

    # Corner loop as fori_loop for the same scoped-VMEM reason as
    # _fetch_kernel (the RMW slab accumulation is sequential anyway);
    # j stays static (lane-dim tile slices need static offsets).
    for j in range(cb):
        bi = (g * cb + j) * 8
        s = skey_ref[0, 0, :, j:j + 1]
        p0 = sp0_ref[0, 0, :, j:j + 1]
        p1 = sp1_ref[0, 0, :, j:j + 1]
        fx, fy, fz = _decode_cols(p0, p1)
        g0 = g0_ref[0, 0, :, j:j + 1]
        g1 = g1_ref[0, 0, :, j:j + 1]

        def c_body(c2, carry):
            # 2 corners per fori iteration (see _fetch_kernel)
            for dc in range(2):
                c = c2 * 2 + dc
                a = s + offs_ref[(l + off) * 8 + c]
                rel = (a >> 6) - bfull_ref[bi + c]
                b_lo = pl.multiple_of(bslice_ref[bi + c], 8)
                w = _corner_w(fx, fy, fz, c)
                # one dynamic compare on entry pairs + a constant parity
                # select instead of two full compares+selects+add
                sel = (lane_iota >> 1) == (a & (PACK - 1))
                even = (lane_iota & 1) == 0
                v = jnp.where(sel, jnp.where(even, w * g0, w * g1), 0.0)
                if dual:
                    in_head = (rel >= 0) & (rel < r_max)
                    b_hi = pl.multiple_of(btail_ref[bi + c], 8)
                    rel_t = (a >> 6) - b_hi
                    # mask rel_t < 0 (see _fetch_kernel): without it a
                    # middle-cluster corner scatters grad into head rows
                    pos_row = jnp.where(
                        in_head, rel,
                        jnp.where(rel_t >= 0, rel_t + r_max, -1))
                    oh = (pos_row == row_iota).astype(jnp.bfloat16)
                else:
                    oh = (rel == row_iota).astype(jnp.bfloat16)
                gl = jax.lax.dot_general(
                    oh, v.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                    # [n_rows, 128]
                cur = grad_ref[0, pl.ds(b_lo, r_max), :]
                grad_ref[0, pl.ds(b_lo, r_max), :] = cur + gl[:r_max]
                if dual:
                    cur2 = grad_ref[0, pl.ds(b_hi, r_max), :]
                    grad_ref[0, pl.ds(b_hi, r_max), :] = cur2 + gl[r_max:]
            return carry

        jax.lax.fori_loop(0, 4, c_body, 0)


# ---------------------------------------------------------------------------
# Forward / backward orchestration (custom VJP)
# ---------------------------------------------------------------------------

def _pack_cols(a: jnp.ndarray, geo: _Geom):
    """[R, M_pad] -> [R, n_g, block, cb]: in-kernel column j of grid step
    g is ``block`` consecutive sorted entries as a [block, 1] sublane
    vector."""
    r = a.shape[0]
    cb = geo.nblk // geo.n_g
    return jnp.transpose(a.reshape(r, geo.n_g, cb, geo.block), (0, 1, 3, 2))


def _unpack_cols(a: jnp.ndarray):
    """[R, n_g, block, cb] -> [R, M_pad] (inverse of _pack_cols)."""
    r, n_g, blk, cb = a.shape
    return jnp.transpose(a, (0, 1, 3, 2)).reshape(r, n_g * cb * blk)


def _level_ranges(spec: LatticeSpec):
    uh = spec.split.big.use_hash.astype(bool)
    assert not np.any(np.diff(uh.astype(np.int8)) < 0), uh
    n_dense = int(np.sum(~uh))
    return [(0, n_dense, True), (n_dense, spec.n_big - n_dense, False)]


def _pad_table(table_big, spec: LatticeSpec):
    """Append r_pad wrap rows (copy of the first rows): hashed levels all
    share T = t_r64 rows, so one wrap copy serves them; dense levels never
    address past their own size + r_max <= t_r64."""
    return jnp.concatenate([table_big, table_big[:, :spec.r_pad]], axis=1)


def _prep(x01, spec: LatticeSpec):
    """Pad at x=1 (the grid's far corner: one shared key per level, so
    pads sort into a single cluster — spilled fetches at its boundary
    blocks only ever drop PAD features, and real keys' density is
    untouched), deal points round-robin across chunks (chunk c gets
    points c, c+n_ch, ...) so every chunk keeps the call's real-key
    density, sort, compute slab bases."""
    geo = _geometry(x01.shape[0], spec)
    total = geo.n_ch * geo.m_pad
    if total != x01.shape[0]:
        x01 = jnp.pad(x01, ((0, total - x01.shape[0]), (0, 0)),
                      constant_values=1.0)
    x01 = jnp.transpose(
        x01.reshape(geo.m_pad, geo.n_ch, 3), (1, 0, 2))
    key, p0, p1 = _base_keys_payloads(x01, spec)
    skey, sp0, sp1 = bitonic_sort(key, p0, p1)
    b_full, b_slice, b_tail = _slab_bases(skey, spec, geo)
    return geo, skey, sp0, sp1, b_full, b_slice, b_tail


def _fwd_impl(x01, table_big, spec: LatticeSpec):
    lb = spec.n_big
    interpret = jax.default_backend() != "tpu"
    n = x01.shape[0]
    geo, skey, sp0, sp1, b_full, b_slice, b_tail = _prep(x01, spec)
    cb = geo.nblk // geo.n_g
    skey_pk = _pack_cols(skey, geo)
    sp0_pk = _pack_cols(sp0, geo)
    sp1_pk = _pack_cols(sp1, geo)
    offs32 = jnp.asarray(spec.offs.reshape(-1).astype(np.int64), jnp.int32)
    tpad = _pad_table(table_big, spec).astype(jnp.bfloat16)

    smem_o = pl.BlockSpec((lb * 8,), lambda l, ch, g: (0,),
                          memory_space=pltpu.SMEM)
    parts = []
    for off, lbp, dual in _level_ranges(spec):
        if lbp == 0:
            continue
        # dense levels go ONE CALL PER LEVEL so each gets a slab sized to
        # its own row count (a shared static r would be the largest's)
        sub = [(li, 1) for li in range(off, off + lbp)] if dual \
            else [(off, lbp)]
        for soff, slbp in sub:
            # slab bases blocked per (level, chunk): whole-array SMEM
            # scales with n_ch and exceeds the 1 MB SMEM space at 2^19
            # points (see _fetch_kernel)
            smem_b = pl.BlockSpec(
                (geo.bw,),
                lambda l, ch, g, soff=soff: (ch * lb + l + soff,),
                memory_space=pltpu.SMEM)
            tile = pl.BlockSpec(
                (1, 1, geo.block, cb),
                lambda l, ch, g, soff=soff: (ch * lb + l + soff, g, 0, 0),
                memory_space=pltpu.VMEM)
            out_tile = pl.BlockSpec(
                (1, 1, geo.block, cb),
                lambda l, ch, g, slbp=slbp: (ch * slbp + l, g, 0, 0),
                memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct(
                (geo.n_ch * slbp, geo.n_g, geo.block, cb), jnp.float32)
            f0, f1 = pl.pallas_call(
                functools.partial(
                    _fetch_kernel,
                    r_max=geo.r_dense[soff] if dual else geo.r_hash,
                    off=soff, dual=dual, cb=cb),
                grid=(slbp, geo.n_ch, geo.n_g),
                in_specs=[
                    smem_o, smem_b, smem_b, smem_b, tile, tile, tile,
                    pl.BlockSpec((1, spec.t_r64 + spec.r_pad, LANES),
                                 lambda l, ch, g, soff=soff:
                                 (l + soff, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=(out_tile, out_tile),
                out_shape=(out_shape, out_shape),
                interpret=interpret,
            )(offs32, b_full, b_slice, b_tail, skey_pk, sp0_pk, sp1_pk,
              tpad)
            parts.append((_unpack_cols(f0), _unpack_cols(f1)))

    cat = lambda i: jnp.concatenate(
        [p[i].reshape(geo.n_ch, -1, geo.m_pad) for p in parts], axis=1
    ).reshape(geo.n_ch * lb, geo.m_pad) if len(parts) > 1 else parts[0][i]
    f0s, f1s = cat(0), cat(1)

    # unsort: key = saved position; spare payload returns the inverse perm
    bits = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    flt = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    pos = jax.lax.shift_right_logical(sp1, 14)
    iota = jnp.broadcast_to(
        jnp.arange(geo.m_pad, dtype=jnp.int32)[None], pos.shape)
    _, f0o, f1o, inv = bitonic_sort(pos, bits(f0s), bits(f1s), iota)
    feats = jnp.stack([flt(f0o), flt(f1o)], axis=-1)
    # undo the round-robin deal: chunk c position p <-> point p*n_ch + c
    out = jnp.transpose(
        feats.reshape(geo.n_ch, lb, geo.m_pad, 2), (2, 0, 1, 3)
    ).reshape(geo.m_pad * geo.n_ch, lb * 2)[:n]
    res = (skey_pk, sp0_pk, sp1_pk, b_full, b_slice, b_tail, inv)
    return out, res


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lattice_encode(x01, table_big, spec: LatticeSpec):
    """Big-group lattice encode: x01 [N,3] in [0,1] -> [N, Lb*2]."""
    out, _ = _fwd_impl(x01, table_big, spec)
    return out


def _fwd(x01, table_big, spec):
    return _fwd_impl(x01, table_big, spec)


def _bwd(spec: LatticeSpec, res, g):
    skey_pk, sp0_pk, sp1_pk, b_full, b_slice, b_tail, inv = res
    lb = spec.n_big
    n = g.shape[0]
    geo = _geometry(n, spec)
    interpret = jax.default_backend() != "tpu"
    total = geo.n_ch * geo.m_pad
    if total != n:
        g = jnp.pad(g, ((0, total - n), (0, 0)))
    bits = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    flt = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    # redo the round-robin deal (point p*n_ch + c -> chunk c position p)
    gl = jnp.transpose(
        g.reshape(geo.m_pad, geo.n_ch, lb, 2), (1, 2, 0, 3)
    ).reshape(geo.n_ch * lb, geo.m_pad, 2)
    # permute upstream grads into sorted order: sort pairs (inv[p], g[p])
    _, g0s, g1s = bitonic_sort(inv, bits(gl[..., 0]), bits(gl[..., 1]))
    g0_pk = _pack_cols(flt(g0s), geo)
    g1_pk = _pack_cols(flt(g1s), geo)
    offs32 = jnp.asarray(spec.offs.reshape(-1).astype(np.int64), jnp.int32)

    smem_o = pl.BlockSpec((lb * 8,), lambda l, ch, g: (0,),
                          memory_space=pltpu.SMEM)
    parts = []
    cb = geo.nblk // geo.n_g
    pad_rows = spec.t_r64 + spec.r_pad
    for off, lbp, dual in _level_ranges(spec):
        if lbp == 0:
            continue
        if dual:
            # Dense levels scatter ONE CALL PER LEVEL with the output
            # sized to that level's own table: the shared
            # [lbp, t_r64+r_pad] result (~13 MB at 2^19) gets promoted
            # by XLA into scoped VMEM (S(1)) and blows the 16 MB limit;
            # per-level results stay <= ~2.3 MB.  (The hashed result
            # below is ~49 MB and never gets promoted.)
            sizes = spec.split.big.sizes
            for li in range(off, off + lbp):
                rows_out = min(
                    _round8(-(-int(sizes[li]) // PACK)) + spec.r_pad,
                    pad_rows)
                smem_b = pl.BlockSpec(
                    (geo.bw,),
                    lambda l, ch, g, li=li: (ch * lb + li,),
                    memory_space=pltpu.SMEM)
                tile = pl.BlockSpec(
                    (1, 1, geo.block, cb),
                    lambda l, ch, g, li=li: (ch * lb + li, g, 0, 0),
                    memory_space=pltpu.VMEM)
                grad_l = pl.pallas_call(
                    functools.partial(_scatter_kernel,
                                      r_max=geo.r_dense[li],
                                      off=li, dual=True, cb=cb),
                    grid=(1, geo.n_ch, geo.n_g),
                    in_specs=[smem_o, smem_b, smem_b, smem_b,
                              tile, tile, tile, tile, tile],
                    out_specs=pl.BlockSpec(
                        (1, rows_out, LANES),
                        lambda l, ch, g: (l, 0, 0),
                        memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(
                        (1, rows_out, LANES), jnp.float32),
                    interpret=interpret,
                )(offs32, b_full, b_slice, b_tail, skey_pk, sp0_pk,
                  sp1_pk, g0_pk, g1_pk)
                parts.append(jnp.pad(
                    grad_l, ((0, 0), (0, pad_rows - rows_out), (0, 0))))
            continue
        smem_b = pl.BlockSpec(
            (geo.bw,),
            lambda l, ch, g, off=off: (ch * lb + l + off,),
            memory_space=pltpu.SMEM)
        tile = pl.BlockSpec(
            (1, 1, geo.block, cb),
            lambda l, ch, g, off=off: (ch * lb + l + off, g, 0, 0),
            memory_space=pltpu.VMEM)
        grad_p = pl.pallas_call(
            functools.partial(_scatter_kernel,
                              r_max=geo.r_max if dual else geo.r_hash,
                              off=off, dual=dual, cb=cb),
            grid=(lbp, geo.n_ch, geo.n_g),
            in_specs=[smem_o, smem_b, smem_b, smem_b,
                      tile, tile, tile, tile, tile],
            out_specs=pl.BlockSpec(
                (1, pad_rows, LANES),
                lambda l, ch, g: (l, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (lbp, pad_rows, LANES), jnp.float32),
            interpret=interpret,
        )(offs32, b_full, b_slice, b_tail, skey_pk, sp0_pk, sp1_pk,
          g0_pk, g1_pk)
        parts.append(grad_p)
    grad = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
    # fold the wrap pad back onto the first rows (hashed levels only ever
    # scatter there; dense pads stay zero)
    head = grad[:, :spec.r_pad] + grad[:, spec.t_r64:spec.t_r64 + spec.r_pad]
    grad = jnp.concatenate([head, grad[:, spec.r_pad:spec.t_r64]], axis=1)
    return None, grad


lattice_encode.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# XLA oracle twin, spill monitor, split encode, layout converters
# ---------------------------------------------------------------------------

def lattice_encode_xla(x01, table_big, spec: LatticeSpec,
                       _chunk: int = 1 << 17):
    """Gather-based twin with identical lattice semantics (CPU oracle).

    The point axis is chunked to <= 2^17: on real TPU, XLA miscompiles
    the [Lb, 2^20]-operand take_along_axis at 2^19 indices per row —
    the output TAIL (last ~128 columns of the last row) comes back as a
    broadcast of one gathered element.  That corrupted oracle produced
    the phantom "128 bad points at 2^19" the round-4 probes chased for
    a day before a numpy cross-check exonerated the Pallas engine
    (engine vs numpy: 2.4e-7 max err, 0 bad; this oracle unchunked:
    1.07e-4, 128 bad; minimal repro + trigger envelope in
    tools/probe_gather_miscompile.py / GATHER_miscompile.json)."""
    n = x01.shape[0]
    if n > _chunk:
        return jnp.concatenate([
            lattice_encode_xla(x01[i:i + _chunk], table_big, spec)
            for i in range(0, n, _chunk)], axis=0)
    big = spec.split.big
    lb = spec.n_big
    scales = jnp.asarray(big.scales)[:, None, None]
    pos = x01[None] * scales + 0.5
    cell = jnp.floor(pos)
    frac = pos - cell
    cu = cell.astype(jnp.uint32)
    mult = jnp.asarray(spec.mult.astype(np.int64) & 0xFFFFFFFF, jnp.uint32)
    sizes = jnp.asarray(big.sizes.astype(np.int64), jnp.uint32)[:, None]
    strides = jnp.asarray(
        big.resolutions.astype(np.int64) + 1, jnp.uint32)[:, None]
    use_hash = jnp.asarray(big.use_hash)[:, None]
    base_h = (cu[..., 0] * mult[:, 0:1] + cu[..., 1] * mult[:, 1:2]
              + cu[..., 2] * mult[:, 2:3])
    base_d = cu[..., 0] + strides * (cu[..., 1] + strides * cu[..., 2])
    flat = table_big.reshape(lb, -1)                  # [Lb, t_r64*128]
    out = jnp.zeros((lb, n, 2), jnp.float32)
    offs = jnp.asarray(spec.offs.astype(np.int64), jnp.uint32)
    for c in range(8):
        b = _corner_bits(c)
        w = jnp.prod(
            jnp.where(jnp.asarray([x == 1 for x in b]), frac, 1.0 - frac),
            axis=-1)
        a_h = (base_h + offs[:, c:c + 1]) % sizes
        a_d = base_d + offs[:, c:c + 1]
        a = jnp.where(use_hash, a_h, a_d).astype(jnp.int32)
        pos_flat = (a >> 6) * LANES + 2 * (a & (PACK - 1))
        f0 = jnp.take_along_axis(flat, pos_flat, axis=1)
        f1 = jnp.take_along_axis(flat, pos_flat + 1, axis=1)
        out = out + w[..., None] * jnp.stack([f0, f1], -1)
    return jnp.transpose(out, (1, 0, 2)).reshape(n, lb * 2)


def spill_fraction_lattice(x01, spec: LatticeSpec) -> jnp.ndarray:
    """Exact fraction of REAL (entry, corner) fetches outside their
    block's slab(s).  ~0 for hashed levels; dense gap blocks are covered
    by the tail slab.  Trainers may log it; tests pin it."""
    n = x01.shape[0]
    geo, skey, _, sp1, b_full, b_slice, b_tail = _prep(x01, spec)
    rows = skey.shape[0]
    offs = jnp.asarray(spec.offs.astype(np.int64), jnp.int32)
    lb = spec.n_big
    n_ch = rows // lb
    offs_r = jnp.tile(offs, (n_ch, 1))                # [rows, 8]
    a = (skey.reshape(rows, geo.nblk, geo.block)[..., None]
         + offs_r[:, None, None, :])                  # [rows,nblk,blk,8]
    arow = a >> 6
    # strip the x1024 SMEM-tile padding _slab_bases appends per row
    unpad = lambda b: b.reshape(rows, geo.bw)[:, :geo.nblk * 8]
    bf = unpad(b_full).reshape(rows, geo.nblk, 1, 8)
    bt = unpad(b_tail).reshape(rows, geo.nblk, 1, 8)
    rel = arow - bf
    uh = spec.split.big.use_hash
    dual = ~jnp.tile(jnp.asarray(uh), n_ch)[:, None, None, None]
    r_eff = jnp.asarray(np.tile(
        np.where(uh, geo.r_hash, geo.r_dense), n_ch
    ).astype(np.int32))[:, None, None, None]
    in_head = (rel >= 0) & (rel < r_eff)
    rel_t = arow - bt
    in_tail = dual & (rel_t >= 0) & (rel_t < r_eff)
    # mask pad entries: chunk c position p is real iff p*n_ch + c < n
    pos = jax.lax.shift_right_logical(sp1, 14)
    ch = (jnp.arange(rows, dtype=jnp.int32) // lb)[:, None]
    real = (pos * n_ch + ch < n).reshape(rows, geo.nblk, geo.block, 1)
    ok = (in_head | in_tail) | ~real
    miss = jnp.sum((~ok).astype(jnp.float32))
    return miss / jnp.maximum(jnp.sum(real.astype(jnp.float32)) * 8, 1.0)


def lattice_encode_split(x01, tables, spec: LatticeSpec,
                         chunk: int = 4096, use_kernels: bool = True):
    """Small levels: xor matmul path (reference semantics); big levels:
    lattice engine.  tables = (table_small, table_big64)."""
    table_small, table_big = tables
    parts = []
    if spec.split.small is not None:
        parts.append(
            hash_encode_pallas(x01, table_small, spec.split.small, chunk)
            if use_kernels else
            hash_encode_xla(x01, table_small, spec.split.small))
    parts.append(lattice_encode(x01, table_big, spec) if use_kernels
                 else lattice_encode_xla(x01, table_big, spec))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)


def pack64_from_levels(levels, spec: LatticeSpec):
    """List of [size_l, 2] level tables -> [Lb, t_r64, 128] packed."""
    out = []
    for li, lvl in enumerate(levels):
        cap = spec.t_r64 * PACK
        buf = jnp.zeros((cap, 2), jnp.float32)
        buf = buf.at[:lvl.shape[0]].set(lvl)
        out.append(buf.reshape(spec.t_r64, LANES))
    return jnp.stack(out)


def levels_from_pack64(table_big, spec: LatticeSpec):
    """[Lb, t_r64, 128] -> list of [size_l, 2] level tables."""
    sizes = spec.split.big.sizes
    flat = table_big.reshape(spec.n_big, -1, 2)
    return [flat[li, :int(sizes[li])] for li in range(spec.n_big)]


def lattice_flops_estimate(spec: LatticeSpec, n_points: int) -> dict:
    """Analytic MXU-flop count of the big-group slab matmuls for one
    fwd+bwd encode of ``n_points`` (the roofline denominator for the
    ngp_engine_executed_tflops bench line).

    Counts (MAC = 2 flops):
      * fwd fetch: per (chunk, level, corner, block) one
        [block, r] @ [r, 128] slab matmul — dense levels run DUAL slabs
        (head + tail) so their row count doubles;
      * bwd scatter: the transposed contraction, same MAC count.
    Excludes: sorts and one-hot construction (VPU), the small-level
    matmul path (<= split_min_size tables; ~10% of MACs at 2^19), and
    dL/dx (not needed — sample positions carry no gradient in training).
    """
    g = _geometry(n_points, spec)
    big = spec.split.big
    per_level_rows = []
    for li in range(spec.n_big):
        if big.use_hash[li]:
            per_level_rows.append(g.r_hash)           # single slab
        else:
            per_level_rows.append(2 * g.r_dense[li])  # dual head+tail
    mac_fwd = sum(8 * g.n_ch * g.m_pad * r * LANES for r in per_level_rows)
    flops_fwd = 2.0 * mac_fwd
    return {
        "geometry": {"n_ch": g.n_ch, "m_pad": g.m_pad, "block": g.block,
                     "r_hash": g.r_hash, "r_dense": list(g.r_dense)},
        "flops_fwd": flops_fwd,
        "flops_bwd": flops_fwd,           # transposed scatter, same MACs
        "flops_total": 2.0 * flops_fwd,
    }
