"""Pallas TPU kernels for the multiresolution hash encoding (fwd + custom VJP).

Why this exists: XLA's TPU scatter processes ~12M updates/s and its gather
~15-25M rows/s — a single NGP training step needs ~10M of each, so the
reference's CUDA-atomics design (ngp-ours/gridencoder/src/gridencoder.cu)
has no efficient direct translation.  These kernels reformulate BOTH
directions as MXU matmuls against a lane-partitioned table:

  table level  : [T_r, 128, C]  (entry t lives at row t>>7, lane t&127)
  forward      : rows  = onehot(hi) @ table        (MXU row fetch)
                 feat  = sum_l rows[:, l, :] * [lo == l]   (VPU lane select)
  backward     : grad += onehot(hi)^T @ (onehot(lo) * v)   (MXU accumulate
                 into a VMEM scratch, written out on the last chunk)

Cost is O(M * T * C) MAC on the MXU — the price of avoiding scatter — so
per-level table sizes are capped (2^15/2^16 on TPU instead of torch-ngp's
2^19); level geometry (scales/resolutions/index semantics) still matches
gridencoder.cu:125-135 exactly, via flnerf_tpu.ops.hash_encoding.

The one-hot matrices are built in VMEM per chunk and never touch HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flnerf_tpu.ops.hash_encoding import (HashGridSpec, _corner_index,
                                           make_hashgrid_spec)

LANES = 128


class PackedHashSpec(NamedTuple):
    """Static geometry for the Pallas kernels (all levels padded to T_cap)."""

    base: HashGridSpec
    t_cap: int            # padded per-level table entries (multiple of 128)
    t_r: int              # t_cap // 128

    @property
    def num_levels(self) -> int:
        return self.base.num_levels

    @property
    def level_dim(self) -> int:
        return self.base.level_dim

    @property
    def output_dim(self) -> int:
        return self.base.output_dim


def make_packed_spec(
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 15,
    desired_resolution: int = 2048,
) -> PackedHashSpec:
    base = make_hashgrid_spec(
        num_levels=num_levels,
        level_dim=level_dim,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        desired_resolution=desired_resolution,
    )
    t_cap = int(max(base.sizes))
    t_cap = (t_cap + LANES - 1) // LANES * LANES
    return PackedHashSpec(base=base, t_cap=t_cap, t_r=t_cap // LANES)


def init_packed_table(key, spec: PackedHashSpec) -> jnp.ndarray:
    """[L, C, T_r, 128] fp32, U(-1e-4, 1e-4) (torch-ngp grid.py init).

    Layout: entry t of level l feature c lives at [l, c, t >> 7, t & 127] —
    C leads so every kernel slice is a clean (T_r, 128) 2-D tile.
    """
    return jax.random.uniform(
        key,
        (spec.num_levels, spec.level_dim, spec.t_r, LANES),
        jnp.float32, -1e-4, 1e-4,
    )


# ---------------------------------------------------------------------------
# Index/weight computation (cheap VPU work, stays in XLA)
# ---------------------------------------------------------------------------



def corner_indices_weights(x01: jnp.ndarray, spec: PackedHashSpec):
    """Per level: the 8 corner table indices + trilinear weights.

    Returns hi [L, N*8] int32, lo [L, N*8] int32, w [L, N*8] f32.
    Index semantics == gridencoder.cu:125-135 (scale, +0.5, dense-vs-hash).
    """
    base = spec.base
    n = x01.shape[0]
    scales = jnp.asarray(base.scales)[:, None, None]          # [L,1,1]
    pos = x01[None] * scales + 0.5                            # [L, N, 3]
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)

    resolutions = jnp.asarray(base.resolutions)[:, None]      # [L,1]
    sizes = jnp.asarray(base.sizes.astype(np.int64), jnp.uint32)[:, None]
    use_hash = jnp.asarray(base.use_hash)[:, None]

    his, los, ws = [], [], []
    for c in range(8):
        bits = [(c >> d) & 1 for d in range(3)]
        pg = pos_grid + jnp.asarray(bits, jnp.int32)          # [L, N, 3]
        w = jnp.prod(
            jnp.where(jnp.asarray([b == 1 for b in bits]), frac, 1.0 - frac),
            axis=-1,
        )                                                     # [L, N]
        # ONE transcription of gridencoder.cu:55-70 (hash_encoding's):
        # a second inline copy here drifted independently
        idx = _corner_index(pg, use_hash, resolutions, sizes)
        his.append(idx >> 7)
        los.append(idx & (LANES - 1))
        ws.append(w)

    # interleave corners per point: [L, N, 8] -> [L, N*8]
    hi = jnp.stack(his, -1).reshape(base.num_levels, n * 8)
    lo = jnp.stack(los, -1).reshape(base.num_levels, n * 8)
    w = jnp.stack(ws, -1).reshape(base.num_levels, n * 8)
    return hi, lo, w


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(hi_ref, lo_ref, w_ref, table_ref, *out_refs):
    """One (level, chunk): weighted corner features for the chunk.

    Operands arrive COMPACT as [1, 1, CPR, WIDTH] tiles (corner f of the
    chunk sits at row f // WIDTH, lane f %% WIDTH).  WIDTH=256 is the
    LANE dim, so the HBM arrays carry zero tile padding — the previous
    [WIDTH, CPR] layout put CPR=8..16 on lanes, a 8-16x padded-HBM
    expansion (192 MB real -> 3.0 GB) that OOM'd large render sweeps and
    paid 8-16x the DMA bytes per block.  One-hots are built in
    TRANSPOSED orientation by broadcast compares (points stay on lanes),
    so no in-kernel relayout is needed anywhere: the matmul contracts
    table rows on the sublane side, the lo-select is a sublane-masked
    reduction, and the feature store is a natural lane-major row write.
    """
    cpr = hi_ref.shape[2]
    width = hi_ref.shape[3]
    t_r = table_ref.shape[2]
    c_dim = table_ref.shape[1]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (t_r, width), 0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, width), 0)
    # all C channels side by side in lanes: one [T_r, C*128] matmul per row
    tab = jnp.concatenate(
        [table_ref[0, c].astype(jnp.bfloat16) for c in range(c_dim)], axis=1
    )

    for j in range(cpr):
        hi = hi_ref[0, 0, j, :][None, :]                         # [1, WIDTH]
        lo = lo_ref[0, 0, j, :][None, :]
        w = w_ref[0, 0, j, :]                                    # [WIDTH]
        oh = (hi == row_iota).astype(jnp.bfloat16)               # [T_r, W]
        sel = lo == sub_iota                                     # [128, W]
        rows = jax.lax.dot_general(
            tab, oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # [C*128, W]
        for c in range(c_dim):
            rc = rows[c * LANES : (c + 1) * LANES, :]
            feat = jnp.sum(jnp.where(sel, rc, 0.0), axis=0)      # [W] row
            out_refs[c][0, 0, j, :] = feat * w


def _bwd_kernel(hi_ref, lo_ref, *v_grad_acc):
    """One (level, chunk): accumulate grad_table += OH_hi^T @ (OH_lo * v);
    compact [1, 1, CPR, WIDTH] operand tiles like the forward (points on
    lanes, transposed-orientation one-hots — see _fwd_kernel)."""
    c_dim = len(v_grad_acc) - 2             # v_refs..., grad_ref, acc_ref
    v_refs = v_grad_acc[:c_dim]
    grad_ref = v_grad_acc[c_dim]
    acc_ref = v_grad_acc[c_dim + 1]
    cpr = hi_ref.shape[2]
    width = hi_ref.shape[3]
    t_r = acc_ref.shape[1]
    chunk_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(chunk_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (t_r, width), 0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, width), 0)

    for j in range(cpr):
        hi = hi_ref[0, 0, j, :][None, :]                        # [1, WIDTH]
        lo = lo_ref[0, 0, j, :][None, :]
        oh_hi = (hi == row_iota).astype(jnp.bfloat16)           # [T_r, W]
        oh_lo = lo == sub_iota                                  # [128, W]
        # all C channels stacked on sublanes: one [C*128, W] rhs per row
        b = jnp.concatenate(
            [
                jnp.where(
                    oh_lo, v_refs[c][0, 0, j, :][None, :], 0.0
                ).astype(jnp.bfloat16)
                for c in range(c_dim)
            ],
            axis=0,
        )
        g = jax.lax.dot_general(
            oh_hi, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                       # [T_r, C*128]
        for c in range(c_dim):
            acc_ref[c] += g[:, c * LANES : (c + 1) * LANES]

    @pl.when(chunk_idx == n_chunks - 1)
    def _():
        grad_ref[0] = acc_ref[...]


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hash_encode_pallas(x01, table, spec: PackedHashSpec, chunk: int = 4096):
    """Encode x01 in [0,1]^3 -> [N, L*C] features (Pallas fast path)."""
    out, _ = _hash_encode_fwd(x01, table, spec, chunk)
    return out


WIDTH = 256          # lane-packed tile width (2 lane tiles)


def _prep(hi, lo, w, chunk):
    """Pad + pack to the COMPACT [L, n_chunks, CPR, WIDTH] layout: corner
    f of chunk k sits at [:, k, f // WIDTH, f % WIDTH] — a plain reshape
    (no transpose), and WIDTH=256 on the lane dim means the HBM arrays
    carry zero tile padding (the old lane=CPR layout padded 8-16x)."""
    L = hi.shape[0]
    n8 = hi.shape[1]
    n8_pad = (n8 + chunk - 1) // chunk * chunk
    if n8_pad != n8:
        pad = n8_pad - n8
        hi = jnp.pad(hi, ((0, 0), (0, pad)))
        lo = jnp.pad(lo, ((0, 0), (0, pad)), constant_values=-1)
        w = jnp.pad(w, ((0, 0), (0, pad)))
    cpr = chunk // WIDTH

    def pack(a):
        return a.reshape(L, n8_pad // chunk, cpr, WIDTH)

    return pack(hi), pack(lo), pack(w), n8_pad


def _hash_encode_fwd(x01, table, spec: PackedHashSpec, chunk: int):
    n = x01.shape[0]
    L, C = spec.num_levels, spec.level_dim
    hi, lo, w = corner_indices_weights(x01, spec)
    assert chunk % WIDTH == 0
    hi3, lo3, w3, n8_pad = _prep(hi, lo, w, chunk)
    n_chunks = n8_pad // chunk
    cpr = chunk // WIDTH

    tile = pl.BlockSpec(
        (1, 1, cpr, WIDTH), lambda l, c: (l, c, 0, 0), memory_space=pltpu.VMEM
    )
    feats = pl.pallas_call(
        _fwd_kernel,
        grid=(L, n_chunks),
        in_specs=[
            tile, tile, tile,
            pl.BlockSpec(
                (1, C, spec.t_r, LANES), lambda l, c: (l, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(tile for _ in range(C)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((L, n_chunks, cpr, WIDTH), jnp.float32)
            for _ in range(C)
        ),
    )(hi3, lo3, w3, table)

    # unpack (a plain reshape) -> flat corners -> per-point sum -> [N, L*C]
    out = jnp.stack(
        [f.reshape(L, n8_pad) for f in feats],
        -1,
    )                                                           # [L, n8, C]
    out = out[:, : n * 8, :].reshape(L, n, 8, C).sum(axis=2)
    out = jnp.transpose(out, (1, 0, 2)).reshape(n, L * C)
    return out, (hi3, lo3, w3, n)


def _hash_encode_bwd(spec: PackedHashSpec, chunk: int, res, g):
    hi3, lo3, w3, n = res
    L, C = spec.num_levels, spec.level_dim
    n_chunks = hi3.shape[1]
    cpr = chunk // WIDTH
    n8_pad = n_chunks * chunk

    # upstream g [N, L*C] -> per-corner v = w * g, column-packed per channel
    g_ln = jnp.transpose(g.reshape(n, L, C), (1, 0, 2))       # [L, N, C]
    v = jnp.repeat(g_ln, 8, axis=1)                           # [L, N*8, C]
    if v.shape[1] != n8_pad:
        v = jnp.pad(v, ((0, 0), (0, n8_pad - v.shape[1]), (0, 0)))
    v_packed = [
        v[..., c].reshape(L, n_chunks, cpr, WIDTH) * w3
        for c in range(C)
    ]

    tile = pl.BlockSpec(
        (1, 1, cpr, WIDTH), lambda l, c: (l, c, 0, 0), memory_space=pltpu.VMEM
    )
    grad = pl.pallas_call(
        _bwd_kernel,
        grid=(L, n_chunks),
        in_specs=[tile, tile] + [tile] * C,
        out_specs=pl.BlockSpec(
            (1, C, spec.t_r, LANES), lambda l, c: (l, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((L, C, spec.t_r, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, spec.t_r, LANES), jnp.float32)],
    )(hi3, lo3, *v_packed)
    return None, grad


hash_encode_pallas.defvjp(_hash_encode_fwd, _hash_encode_bwd)


# ---------------------------------------------------------------------------
# Pure-XLA twin (the "use_kernel=False" analog; correctness oracle in tests)
# ---------------------------------------------------------------------------

def hash_encode_xla(x01, table, spec: PackedHashSpec,
                    _chunk: int = 1 << 17):
    """Same math via jnp gathers (slow on TPU; differentiable).

    Chunked to <= 2^17 points per gather as a guard against the TPU XLA
    large-gather tail miscompile that corrupted lattice_encode_xla at
    2^19 indices/row (see that docstring; GATHER_miscompile.json).  This
    oracle's shape measured clean at 2^19 (round-4 probe, n_bad=0) but
    the guard costs nothing on an oracle path."""
    n = x01.shape[0]
    if n > _chunk:
        return jnp.concatenate([
            hash_encode_xla(x01[i:i + _chunk], table, spec)
            for i in range(0, n, _chunk)], axis=0)
    hi, lo, w = corner_indices_weights(x01, spec)
    idx = hi * LANES + lo                                     # [L, N*8]
    L, C = spec.num_levels, spec.level_dim
    flat = jnp.transpose(table.reshape(L, C, spec.t_cap), (0, 2, 1))  # [L,T,C]
    feats = jnp.take_along_axis(flat, idx[..., None], axis=1) # [L, N*8, C]
    feats = (feats * w[..., None]).reshape(L, n, 8, C).sum(axis=2)
    return jnp.transpose(feats, (1, 0, 2)).reshape(n, L * C)
