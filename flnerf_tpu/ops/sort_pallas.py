"""Pallas TPU bitonic key/value sort.

The building block for the sorted-block gather engine (DESIGN.md Known
gaps #1): XLA's sort runs 30-50ms at step scale on this chip (measured),
which kills per-step locality sorting; a bitonic network is pure VPU work.

Layout: [N] arrays viewed as [N/128, 128] (row-major: element i lives at
row i >> 7, lane i & 127).  A compare-exchange at distance d is:

  * d >= 128: partner rows r and r^(d/128) — two sublane rotations
    (pltpu.roll takes traced shifts) selected by the r&dr bit: for rows
    with the bit clear the partner is r+dr (roll by R-dr), else r-dr
    (roll by dr).  Wraparound rows are always masked out by the select.
  * d < 128: partner lanes l and l^d — one lane-wise dynamic_gather
    (the butterfly permutation), the only hardware gather on this chip.

The log^2(N)/2 (stage, substage) pairs are a precomputed int32 schedule
in SMEM; the network is ONE lax.fori_loop whose body reads (stage_bit,
distance) — the Mosaic module stays O(1) in N (the fully-unrolled
variant in git history exceeded the compiler's practical module size at
useful N).  Ascending/descending direction per element is iota bit math;
all mask algebra stays in int32 (Mosaic cannot truncate i8 vectors to i1).

Supports a batch axis (grid-parallel independent sorts — one per hash
level) and up to a few int32 payload columns.  Float payloads should be
bitcast to int32 by the caller (payload order never affects compares).

VMEM bound: carry + partner temporaries are ~2.5x the operand bytes, so
(1 + n_payloads) * N * 4B should stay well under ~12MB: N <= 2^19 with
one payload, N <= 2^18 with three.

Measured (round 2, single axon v5e-lite tile, f32/int32):
  N=2^17, 1 payload: 0.62 ms   N=2^17, 2 payloads: 0.78 ms
  N=2^18, 1 payload: 1.22 ms   N=2^20, 1 payload: 5.9 ms
(XLA jnp.sort alone at 2^17: ~13 ms; sort_key_val pairs: ~islands more.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _make_schedule(n: int) -> np.ndarray:
    """[S, 2] int32 rows of (stage_bit, distance) for the full network."""
    log_n = n.bit_length() - 1
    rows = []
    for stage in range(1, log_n + 1):
        for sub in range(stage - 1, -1, -1):
            rows.append((1 << stage, 1 << sub))
    return np.asarray(rows, np.int32)


def _sort_kernel(bits_ref, dist_ref, *refs, n_arrays: int, interpret: bool):
    in_refs = refs[:n_arrays]
    out_refs = refs[n_arrays:]
    arrays = [r[0] for r in in_refs]            # [rows, LANES] each
    rows = arrays[0].shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    gidx = riota * LANES + liota                # global element index
    n_sub = bits_ref.shape[0]

    def body(i, carry):
        keys = carry[0]
        sbit = bits_ref[i]
        d = dist_ref[i]

        def lane_partner(a, d):
            return jnp.take_along_axis(a, liota ^ d, axis=1,
                                       mode="promise_in_bounds")

        def row_partner(a, d):
            dr = d // LANES
            # roll(x, s)[r] = x[(r - s) mod rows]: partner r+dr needs
            # s = rows - dr, partner r-dr needs s = dr.
            if interpret:
                plus = jnp.roll(a, rows - dr, axis=0)
                minus = jnp.roll(a, dr, axis=0)
            else:
                plus = pltpu.roll(a, rows - dr, axis=0)
                minus = pltpu.roll(a, dr, axis=0)
            low = ((riota & dr) == 0).astype(jnp.int32)
            return jnp.where(low > 0, plus, minus)

        def partner(a):
            return jax.lax.cond(d < LANES, lane_partner, row_partner, a, d)

        pk = partner(keys)
        # keep-min iff bit `stage` (direction) == bit `sub` (low/high
        # element): with t = gidx & (sbit | d), that is t == 0 or
        # t == sbit + d — two compares instead of the two-bit-test xor
        t = gidx & (sbit + d)
        keep_min = (t == 0) | (t == sbit + d)
        # strict comparisons: ties never swap (keeps payloads intact).
        # NOTE: the selected OPERANDS must be int32 — select_n on i1
        # operands lowers through an i8->i1 trunci Mosaic rejects.
        gt = (keys > pk).astype(jnp.int32)
        lt = (keys < pk).astype(jnp.int32)
        take = jnp.where(keep_min, gt, lt) > 0
        out = [jnp.where(take, pk, keys)]
        for v in carry[1:]:
            out.append(jnp.where(take, partner(v), v))
        return tuple(out)

    arrays = jax.lax.fori_loop(0, n_sub, body, tuple(arrays))
    for o, a in zip(out_refs, arrays):
        o[0] = a


def _sort_kernel_v2(*refs, n: int, n_arrays: int, interpret: bool):
    """Stage-unrolled variant (no SMEM schedule): the python loop over the
    log N stages makes every ROW substage's distance STATIC — pltpu.roll
    with a static shift compiles to vreg moves instead of the generic
    dynamic-shift path — and caches the stage's direction mask across its
    substages.  Lane substages (d < 128) stay in ONE fori_loop per stage
    with a traced distance: their dynamic_gather index cost is unchanged,
    and this keeps the Mosaic module ~3x smaller than a full unroll (which
    exceeded compiler limits at useful N in round 2)."""
    in_refs = refs[:n_arrays]
    out_refs = refs[n_arrays:]
    arrays = [r[0] for r in in_refs]            # [rows, LANES] each
    rows = arrays[0].shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    log_n = n.bit_length() - 1

    def exchange(arrays, keep_min, partner):
        keys = arrays[0]
        pk = partner(keys)
        gt = (keys > pk).astype(jnp.int32)
        lt = (keys < pk).astype(jnp.int32)
        take = jnp.where(keep_min, gt, lt) > 0
        out = [jnp.where(take, pk, keys)]
        for v in arrays[1:]:
            out.append(jnp.where(take, partner(v), v))
        return out

    for stage in range(1, log_n + 1):
        sbit = 1 << stage
        desc = ((riota * LANES + liota) & sbit) > 0  # direction, per stage

        # row substages: static distances, largest first
        for sub in range(stage - 1, 6, -1):
            d = 1 << sub
            dr = d // LANES

            def row_partner(a, dr=dr):
                if interpret:
                    plus = jnp.roll(a, rows - dr, axis=0)
                    minus = jnp.roll(a, dr, axis=0)
                else:
                    plus = pltpu.roll(a, rows - dr, axis=0)
                    minus = pltpu.roll(a, dr, axis=0)
                low = ((riota & dr) == 0).astype(jnp.int32)
                return jnp.where(low > 0, plus, minus)

            keep_min = desc == ((riota & dr) > 0)
            arrays = exchange(arrays, keep_min, row_partner)

        # lane substages: one fori_loop, d = 64 >> j
        n_lane = min(stage, 7)

        def lane_body(j, arrs, desc=desc, n_lane=n_lane):
            d = (1 << n_lane) >> (j + 1)
            ix = liota ^ d
            keep_min = desc == ((liota & d) > 0)
            return tuple(exchange(
                list(arrs), keep_min,
                lambda a: jnp.take_along_axis(a, ix, axis=1,
                                              mode="promise_in_bounds")))

        arrays = list(jax.lax.fori_loop(0, n_lane, lane_body,
                                        tuple(arrays)))

    for o, a in zip(out_refs, arrays):
        o[0] = a


@functools.lru_cache(maxsize=32)
def _sort_call_v2(g: int, n: int, n_arrays: int, interpret: bool):
    rows = n // LANES
    tile = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_sort_kernel_v2, n=n, n_arrays=n_arrays,
                          interpret=interpret),
        grid=(g,),
        in_specs=[tile] * n_arrays,
        out_specs=tuple(tile for _ in range(n_arrays)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((g, rows, LANES), jnp.int32)
            for _ in range(n_arrays)
        ),
        interpret=interpret,
    )
    return jax.jit(lambda *arrs: call(*arrs))


@functools.lru_cache(maxsize=32)
def _sort_call(g: int, n: int, n_arrays: int, interpret: bool):
    rows = n // LANES
    sched = _make_schedule(n)
    smem = pl.BlockSpec((sched.shape[0],), lambda b: (0,),
                        memory_space=pltpu.SMEM)
    tile = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(_sort_kernel, n_arrays=n_arrays,
                          interpret=interpret),
        grid=(g,),
        in_specs=[smem, smem] + [tile] * n_arrays,
        out_specs=tuple(tile for _ in range(n_arrays)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((g, rows, LANES), jnp.int32)
            for _ in range(n_arrays)
        ),
        interpret=interpret,
    )
    # keep the schedule as NUMPY in the closure: device constants created
    # here would be cached across traces (tracer-leak hazard under scan)
    bits = np.ascontiguousarray(sched[:, 0])
    dist = np.ascontiguousarray(sched[:, 1])
    # jit the call: eager pallas dispatch costs ~2ms/launch through the
    # remote tunnel; jitted it is tens of microseconds.
    return jax.jit(lambda *arrs: call(bits, dist, *arrs))


def bitonic_sort(keys: jnp.ndarray, *values: jnp.ndarray, variant: int = 2):
    """Sort int32 keys ascending along the last axis, permuting payloads.

    keys: [N] or [G, N] (G independent sorts).  N must be a power of two
    and a multiple of 128; keys must be non-negative (int32 compare).
    Returns (sorted_keys, *permuted_values) with the input shapes.

    variant 2 (default) is the stage-unrolled kernel (static row shifts,
    cached direction masks — measured faster); 1 is the SMEM-schedule
    fori_loop original.
    """
    batched = keys.ndim == 2
    g, n = keys.shape if batched else (1, keys.shape[0])
    assert n & (n - 1) == 0 and n >= LANES, n
    interpret = jax.default_backend() != "tpu"
    arrs = [keys] + list(values)
    arrs = [a.reshape(g, n // LANES, LANES) for a in arrs]
    mk = _sort_call_v2 if variant == 2 else _sort_call
    outs = mk(g, n, len(arrs), interpret)(*arrs)
    shape = (g, n) if batched else (n,)
    return tuple(o.reshape(shape) for o in outs)
