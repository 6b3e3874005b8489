"""Multiresolution hash-grid encoding (Instant-NGP), pure-JAX TPU design.

Parity target: ngp-ours/gridencoder (grid.py:19-160, src/gridencoder.cu):
  * L levels; level l has scale = 2^(l*log2(per_level_scale))*H - 1 and
    resolution = ceil(scale)+1 (gridencoder.cu:125-126).
  * align_corners=False: pos = x01*scale + 0.5 (cu:134).
  * per-level table size = min(2^log2_hashmap_size, (res+1)^3) rounded up to
    a multiple of 8 (grid.py:117-121); dense indexing when the level fits,
    else xor-hash with primes (1, 2654435761, 805459861) (cu:36-69).
  * d-linear interpolation of the 8 corners; output layout [N, L*C].
  * embeddings init U(-1e-4, 1e-4) (grid.py:127-131 in torch-ngp).

TPU-first notes:
  * One flat [T, C] table; per-level gathers are batched with vmap over the
    level axis — XLA lowers them to dynamic-gathers that pipeline well.
  * The backward pass is the VJP of gather = scatter-add, which XLA emits
    deterministically (sorted segment updates) — no atomics, unlike the CUDA
    kernel (gridencoder.cu:227+).
  * Index math stays in uint32 to reproduce the CUDA overflow semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# gridencoder.cu:42 — supports up to 7-D inputs (D-NeRF hyper uses 3+ambient)
_PRIMES = (
    np.uint32(1), np.uint32(2654435761), np.uint32(805459861),
    np.uint32(3674653429), np.uint32(2097192037), np.uint32(1434869437),
    np.uint32(2165219737),
)


class HashGridSpec(NamedTuple):
    num_levels: int
    level_dim: int
    base_resolution: int
    log2_hashmap_size: int
    per_level_scale: float
    input_dim: int
    # derived (numpy, static):
    scales: np.ndarray        # [L] float32
    resolutions: np.ndarray   # [L] int32
    offsets: np.ndarray       # [L+1] int64
    sizes: np.ndarray         # [L] int64 (table entries per level)
    use_hash: np.ndarray      # [L] bool

    @property
    def table_size(self) -> int:
        return int(self.offsets[-1])

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim


def make_hashgrid_spec(
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    per_level_scale: float | None = None,
    desired_resolution: int | None = 2048,
    input_dim: int = 3,
) -> HashGridSpec:
    # precedence: an explicit per_level_scale wins (the GridEncoder-style
    # call); desired_resolution (default 2048) is only consulted when the
    # scale is not given — previously the 2048 default silently
    # overwrote a passed per_level_scale
    if per_level_scale is None:
        if desired_resolution is None:
            desired_resolution = 2048
        per_level_scale = float(
            np.exp2(np.log2(desired_resolution / base_resolution)
                    / max(num_levels - 1, 1))
        ) if num_levels > 1 else 1.0   # single level: scale is irrelevant
    S = np.log2(per_level_scale)
    max_params = 2 ** log2_hashmap_size

    scales, resolutions, offsets, sizes, use_hash = [], [], [0], [], []
    for l in range(num_levels):
        scale = np.exp2(l * S) * base_resolution - 1.0
        res = int(np.ceil(scale)) + 1
        # CUDA get_grid_index strides by (resolution+1) for align_corners=False
        dense = (res + 1) ** input_dim
        params = min(max_params, dense)
        params = int(np.ceil(params / 8) * 8)
        scales.append(scale)
        resolutions.append(res)
        sizes.append(params)
        use_hash.append(dense > params)
        offsets.append(offsets[-1] + params)

    return HashGridSpec(
        num_levels=num_levels,
        level_dim=level_dim,
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        per_level_scale=float(per_level_scale),
        input_dim=input_dim,
        scales=np.asarray(scales, np.float32),
        resolutions=np.asarray(resolutions, np.int32),
        offsets=np.asarray(offsets, np.int64),
        sizes=np.asarray(sizes, np.int64),
        use_hash=np.asarray(use_hash, bool),
    )


def init_hashgrid(key, spec: HashGridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """[T, C] table, U(-1e-4, 1e-4) like torch-ngp."""
    return jax.random.uniform(
        key, (spec.table_size, spec.level_dim), dtype, -1e-4, 1e-4
    )


def _corner_index(pos_grid, use_hash, resolution, size):
    """uint32 table index of one corner (get_grid_index, gridencoder.cu:55-70).

    pos_grid: [..., D] int32 corner coordinates (D = 2 or 3).
    """
    d = pos_grid.shape[-1]
    pg = pos_grid.astype(jnp.uint32)
    stride = resolution.astype(jnp.uint32) + jnp.uint32(1)  # align_corners=False
    dense_idx = pg[..., d - 1]
    for a in range(d - 2, -1, -1):
        dense_idx = pg[..., a] + stride * dense_idx
    hash_idx = pg[..., 0] * _PRIMES[0]
    for a in range(1, d):
        hash_idx = hash_idx ^ pg[..., a] * _PRIMES[a]
    idx = jnp.where(use_hash, hash_idx, dense_idx)
    return (idx % size.astype(jnp.uint32)).astype(jnp.int32)


def hash_encode(x01: jnp.ndarray, table: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Encode points x01 in [0, 1]^D -> [N, L*C] features (D = 2 or 3).

    Matches the CUDA forward (kernel_grid, gridencoder.cu:100-180) including
    the +0.5 offset and per-corner d-linear weights.
    """
    n = x01.shape[0]
    dim = spec.input_dim
    L, C = spec.num_levels, spec.level_dim
    scales = jnp.asarray(spec.scales)                    # [L]
    resolutions = jnp.asarray(spec.resolutions)          # [L]
    offsets = jnp.asarray(spec.offsets[:-1], jnp.int32)  # [L]
    sizes = jnp.asarray(spec.sizes, jnp.int32)           # [L]
    use_hash = jnp.asarray(spec.use_hash)                # [L]

    # [L, N, D] continuous positions per level
    pos = x01[None, :, :] * scales[:, None, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    pos_grid = pos_grid.astype(jnp.int32)

    # 2^D corners: bitmask over dims
    corners = jnp.asarray(
        [[(c >> d) & 1 for d in range(dim)] for c in range(2 ** dim)],
        jnp.int32,
    )  # [2^D, D]

    def one_corner(corner):
        pg = pos_grid + corner[None, None, :]                    # [L, N, 3]
        w = jnp.prod(
            jnp.where(corner[None, None, :] == 1, frac, 1.0 - frac), axis=-1
        )                                                        # [L, N]
        idx = _corner_index(
            pg, use_hash[:, None], resolutions[:, None], sizes[:, None]
        )                                                        # [L, N]
        feat = table[offsets[:, None] + idx]                     # [L, N, C]
        return w[..., None] * feat

    out = jnp.zeros((L, n, C), table.dtype)
    for c in range(2 ** dim):
        out = out + one_corner(corners[c])

    # [L, N, C] -> [N, L*C] (grid.py:52 permutes back the L-first layout)
    return jnp.transpose(out, (1, 0, 2)).reshape(n, L * C)


def hash_encode_reference(x01: np.ndarray, table: np.ndarray, spec: HashGridSpec) -> np.ndarray:
    """Slow numpy loop transcription of the CUDA semantics, for tests only.

    uint32 wraparound in the hash is intended; numpy overflow warnings
    are suppressed for that reason — SCOPED (np.seterr would silence
    overflow warnings process-wide for the rest of the test run).
    """
    n = x01.shape[0]
    dim = spec.input_dim
    out = np.zeros((n, spec.num_levels, spec.level_dim), np.float64)
    with np.errstate(over="ignore"):
        return _hash_encode_reference_loop(x01, table, spec, out, n, dim)


def _hash_encode_reference_loop(x01, table, spec, out, n, dim):
    for l in range(spec.num_levels):
        scale = float(spec.scales[l])
        res = int(spec.resolutions[l])
        size = int(spec.sizes[l])
        off = int(spec.offsets[l])
        uh = bool(spec.use_hash[l])
        for i in range(n):
            pos = x01[i] * scale + 0.5
            pg = np.floor(pos).astype(np.int64)
            f = pos - pg
            acc = np.zeros(spec.level_dim, np.float64)
            for c in range(2 ** dim):
                bits = [(c >> d) & 1 for d in range(dim)]
                w = 1.0
                pl = pg.copy()
                for d in range(dim):
                    if bits[d]:
                        w *= f[d]
                        pl[d] += 1
                    else:
                        w *= 1.0 - f[d]
                if uh:
                    idx = np.uint32(pl[0]) * _PRIMES[0]
                    for d in range(1, dim):
                        idx = idx ^ np.uint32(pl[d]) * _PRIMES[d]
                else:
                    stride = np.uint32(res + 1)
                    idx = np.uint32(pl[dim - 1])
                    for d in range(dim - 2, -1, -1):
                        idx = np.uint32(pl[d]) + stride * idx
                acc += w * table[off + int(idx % np.uint32(size))]
            out[i, l] = acc
    return out.reshape(n, -1).astype(np.float32)
