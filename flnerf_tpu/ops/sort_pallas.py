"""Pallas TPU bitonic key/value sort.

The building block for the sorted-block gather engine (DESIGN.md Known
gaps #1): XLA's sort runs 30-50ms at step scale on this chip (measured),
which kills per-step locality sorting; a bitonic network is pure VPU work.

Layout: [N] arrays viewed as [N/128, 128] (row-major: element i lives at
row i >> 7, lane i & 127).  A compare-exchange at distance d is:

  * d >= 128: partner rows r and r^(d/128) — reshape the row axis to
    [blocks, 2, d/128] and slice the halves: NO gathers, pure static
    slicing;
  * d < 128: partner lanes l and l^d — one lane-wise dynamic_gather
    (the butterfly permutation), the only hardware gather on this chip.

Ascending/descending direction per element comes from iota bit math.
Cost model ~ O(N log^2 N / 1024) VPU cycles: ~0.2 ms for 2^17 keys (vs
~10 ms+ for XLA sort at that size).

STATUS: semantics are complete and pinned by tests (interpret mode);
the TPU build currently chokes on the fully-unrolled network at useful
sizes (log^2 N substages of whole-array ops make a very large Mosaic
module).  Round-3 work: re-express the substage loop as a fori_loop with
the butterfly distance as a static schedule (pltpu.roll takes traced
shifts; the row butterflies need a d-indexed lax.switch), which bounds
the module size at O(log N) bodies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _lane_butterfly(x, d):
    """x[i, j] <-> x[i, j ^ d] partner values (d < 128)."""
    liota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.take_along_axis(x, liota ^ d, axis=1,
                               mode="promise_in_bounds")


def _row_butterfly(x, dr):
    """x[r, :] <-> x[r ^ dr, :] partner values (dr = d / 128 rows)."""
    rows = x.shape[0]
    g = x.reshape(rows // (2 * dr), 2, dr, LANES)
    swapped = jnp.concatenate([g[:, 1:2], g[:, 0:1]], axis=1)
    return swapped.reshape(rows, LANES)


def _sort_kernel(k_ref, v_ref, ko_ref, vo_ref, *, n: int):
    keys = k_ref[...]
    vals = v_ref[...]
    rows = keys.shape[0]
    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    gidx = riota * LANES + liota                       # global element index

    log_n = n.bit_length() - 1
    for stage in range(1, log_n + 1):
        # ascending iff bit `stage` of the global index is 0.  All mask
        # logic stays in int32: Mosaic cannot truncate i8 vectors to i1,
        # so boolean-vector algebra does not lower.
        up = ((gidx & (1 << stage)) == 0).astype(jnp.int32)
        for sub in range(stage - 1, -1, -1):
            d = 1 << sub
            if d < LANES:
                pk = _lane_butterfly(keys, d)
                pv = _lane_butterfly(vals, d)
            else:
                pk = _row_butterfly(keys, d // LANES)
                pv = _row_butterfly(vals, d // LANES)
            is_low = ((gidx & d) == 0).astype(jnp.int32)
            keep_min = 1 - (is_low ^ up)
            gt = (keys > pk).astype(jnp.int32)
            lt = (keys < pk).astype(jnp.int32)
            # strict comparisons: ties never swap (keeps payloads intact)
            take = keep_min * gt + (1 - keep_min) * lt
            keys = jnp.where(take > 0, pk, keys)
            vals = jnp.where(take > 0, pv, vals)
    ko_ref[...] = keys
    vo_ref[...] = vals


@functools.lru_cache(maxsize=16)
def _sort_call(n: int, interpret: bool):
    rows = n // LANES
    return pl.pallas_call(
        functools.partial(_sort_kernel, n=n),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )


def bitonic_sort(keys: jnp.ndarray, values: jnp.ndarray):
    """Sort int32 [N] keys ascending, permuting int32 values alongside.

    N must be a power of two and a multiple of 128; keys should be
    non-negative (int32 compare).  Returns (sorted_keys, values)."""
    n = keys.shape[0]
    assert n & (n - 1) == 0 and n >= LANES, n
    interpret = jax.default_backend() != "tpu"
    ks, vs = _sort_call(n, interpret)(
        keys.reshape(n // LANES, LANES), values.reshape(n // LANES, LANES)
    )
    return ks.reshape(n), vs.reshape(n)
