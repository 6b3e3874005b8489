"""Pallas TPU fused voxel volume-render (the plenoxels fast path).

Parity target: plenoxels-ours/svox2/csrc/render_lerp_kernel_cuvol.cu —
trace_ray_cuvol (30-120), backward (692), and the fused train entry
volume_render_cuvol_fused (decl svox2.cpp:22).  The math oracle is the
pure-XLA twin `flnerf_tpu.models.voxel_sh.voxel_render_rays` (itself the
analog of svox2.py:659 _volume_render_gradcheck_lerp); tests pin this
kernel to the twin's outputs and gradients.

Why not a CUDA-style translation: warp-per-ray random gathers map to XLA
gathers at ~15-25M rows/s on this chip (measured) — a 4096-ray/512-step
train step costs ~3s.  TPUs want streaming DMA + MXU work, so:

  * rays march in RB=64-ray coherent blocks x W=12-step windows;
  * per (block, window), a [B, B, GB] box of the grid is DMA'd to VMEM
    from a lane-packed table (z packed 4-wide per lane group with stride
    ZSTRIDE=3, so a (z, z+1) interpolation pair NEVER straddles rows);
  * all 4 xy trilerp corners are fetched AND xy-interpolated by a single
    MXU matmul against a weighted multi-hot stamp matrix A[sample, row]
    (the 4 corner weights are A's only nonzeros);
  * the z-lerp is a lane-wise tpu.dynamic_gather (the only hardware
    gather this chip supports: within a 128-lane row);
  * transmittance/rgb accumulate across a block's windows in the
    revisited output block (TPU Pallas grids are sequential);
  * backward recomputes the forward per box and scatters grads with the
    transposed stamp matmul, accumulated into an HBM buffer by
    sequential read-modify-write DMA — deterministic, no atomics
    (SURVEY.md §5.2).

Blocks must be spatially coherent for boxes to stay small; the epoch
builder orders rays by (image, pixel-morton) so quadtree batches qualify,
and build_blocks flags blocks whose spread exceeds the box (those fall
back to the XLA twin).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flnerf_tpu.models.voxel_sh import (
    VoxelGrid,
    VoxelGridConfig,
    grid_ray_setup,
)
from flnerf_tpu.ops.sh_encoding import sh_encode

# Geometry constants (see module docstring).
RB = 64        # rays per block
W = 12         # marching steps per window
BX = 12        # box extent in x (covers floor-index spread <= BX-2)
BY = 24        # box extent in y — the tiled memref dim: sliced at 8-aligned
               # offsets, so it absorbs up to 7 voxels of alignment waste
GB = 5         # z-groups per box (z spread <= BX-2 -> <= 4 group span)
ZSTRIDE = 3    # z-groups advance by 3 (4 z per group -> 1-layer overlap)
CH = 28        # density + 27 SH coefficients
LANES = 128
NROWS = GB * BX * BY        # rows per box (1440)
NS = RB * W                 # samples per box (768)


def n_zgroups(z: int) -> int:
    """Groups must cover zg = l_z // ZSTRIDE for l_z in [0, z-2]."""
    return (z - 2) // ZSTRIDE + 1


def n_windows(max_steps: int) -> int:
    return -(-max_steps // W)


# ---------------------------------------------------------------------------
# Table packing (differentiable jnp; its autodiff un-packs the gradients)
# ---------------------------------------------------------------------------

def pack_table(grid: VoxelGrid, cfg: VoxelGridConfig) -> jnp.ndarray:
    """[ZG, X, Y, 128] bf16; lane [k*28 + c] = channel c at z = min(3g+k, Z-1).

    Channel 0 = density, 1..27 = SH; pruned cells zeroed (the dense analog
    of links == -1, matching voxel_sh.trilinear_sample's masking)."""
    x, y, z = cfg.reso
    zg = n_zgroups(z)
    ch = jnp.concatenate(
        [
            jnp.where(grid.alive, grid.density, 0.0)[..., None],
            jnp.where(grid.alive[..., None], grid.sh, 0.0),
        ],
        axis=-1,
    )  # [X, Y, Z, 28]
    need = ZSTRIDE * (zg - 1) + 4
    if need > z:
        ch = jnp.concatenate(
            [ch, jnp.repeat(ch[:, :, -1:], need - z, axis=2)], axis=2
        )
    planes = [
        ch[:, :, k : k + ZSTRIDE * (zg - 1) + 1 : ZSTRIDE, :] for k in range(4)
    ]
    t = jnp.stack(planes, axis=3)                 # [X, Y, ZG, 4, 28]
    t = t.reshape(x, y, zg, 4 * CH)
    t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, LANES - 4 * CH)))
    # [ZG, X, Y, 128]: the tiled (second-to-last) memref dim is Y, which the
    # kernel slices at 8-aligned offsets (Mosaic requires it); ZG and X are
    # untiled dims and slice freely.
    return jnp.transpose(t, (2, 0, 1, 3)).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Block building (jit-able; runs once per ray set)
# ---------------------------------------------------------------------------

class RayBlocks(NamedTuple):
    rays: jnp.ndarray       # [n_blocks, RB, 32] f32 packed per-ray channels
    corners: jnp.ndarray    # [3, n_blocks * n_win] int32 (cg; cx; cy) — kept
                            # as separate rows: SMEM pads the minor dim to a
                            # full lane tile, so [G, 3] would waste 43x SMEM
    valid: jnp.ndarray      # [n_blocks * n_win] int32 window-has-samples
    ok: jnp.ndarray         # [n_blocks] bool — spread fits the box


# per-ray channel layout inside RayBlocks.rays
_C_O, _C_D, _C_TMIN, _C_TMAX, _C_DS, _C_SH = 0, 3, 6, 7, 8, 9


def _ray_geometry(rays_o, rays_d, cfg: VoxelGridConfig):
    """Grid-space ray setup — delegates to voxel_sh.grid_ray_setup (one
    source of truth with the XLA twin), adding the kernel's closed-form
    SH basis row."""
    origins, dirs, tmin, tmax, delta_scale, viewdirs = grid_ray_setup(
        cfg, rays_o, rays_d)
    sh_mult = sh_encode(viewdirs, degree=int(np.sqrt(cfg.basis_dim)))
    return origins, dirs, tmin, tmax, delta_scale, sh_mult


def occupancy_mip(grid: VoxelGrid, cfg: VoxelGridConfig,
                  thresh: float = None):
    """8^3 max-pooled occupancy (alive & sigma > sigma_thresh) for
    window-level empty-space skipping — the accel-distance-map analog
    (misc_kernel.cu:57-144).  Exact-conservative: a skipped box provably
    contributes nothing (trilerp of sub-threshold corners stays below the
    render's own sigma_thresh mask).  None if reso is not 8-divisible."""
    x, y, z = cfg.reso
    if x % 8 or y % 8 or z % 8:
        return None
    t = cfg.sigma_thresh if thresh is None else thresh
    occ = jnp.where(grid.alive, grid.density, 0.0) >= t
    return occ.reshape(x // 8, 8, y // 8, 8, z // 8, 8).max(axis=(1, 3, 5))


def build_blocks(rays_o, rays_d, cfg: VoxelGridConfig,
                 occ_mip=None) -> RayBlocks:
    """Pack [N] rays (N % RB == 0, already coherence-ordered) into blocks and
    compute per-(block, window) box corners, validity and spread checks.
    With ``occ_mip`` (from occupancy_mip), windows whose box contains no
    occupied cell are marked invalid — the kernels skip their compute and
    DMA entirely."""
    n = rays_o.shape[0]
    assert n % RB == 0, n
    nb = n // RB
    nw = n_windows(cfg.max_steps)
    o, d, tmin, tmax, dscale, shm = _ray_geometry(rays_o, rays_d, cfg)

    rays = jnp.zeros((n, 32), jnp.float32)
    rays = rays.at[:, _C_O:_C_O + 3].set(o)
    rays = rays.at[:, _C_D:_C_D + 3].set(d)
    rays = rays.at[:, _C_TMIN].set(tmin)
    rays = rays.at[:, _C_TMAX].set(tmax)
    rays = rays.at[:, _C_DS].set(dscale)
    rays = rays.at[:, _C_SH:_C_SH + shm.shape[-1]].set(shm)
    rays = rays.reshape(nb, RB, 32)

    reso = jnp.asarray(cfg.reso, jnp.float32)
    step = cfg.step_size

    # Window endpoint step indices, clipped to each ray's last valid step.
    w_lo = jnp.arange(nw, dtype=jnp.float32) * W                  # [nw]
    w_hi = jnp.minimum(w_lo + (W - 1), cfg.max_steps - 1.0)
    smax = (tmax - tmin) / step                                    # [n]
    has = smax[:, None] >= w_lo[None, :]                           # [n, nw]
    s_hi = jnp.minimum(w_hi[None, :], jnp.maximum(smax[:, None], 0.0))

    def floor_l(s_idx):
        t = tmin[:, None] + step * s_idx                           # [n, nw]
        pos = o[:, None, :] + t[..., None] * d[:, None, :]
        pos = jnp.clip(pos, 0.0, reso - 1.0)
        return jnp.clip(jnp.floor(pos), 0.0, reso - 2.0)

    l_a = floor_l(jnp.broadcast_to(w_lo[None, :], has.shape))
    l_b = floor_l(s_hi)
    big = jnp.float32(1e9)
    lo = jnp.where(has[..., None], jnp.minimum(l_a, l_b), big)
    hi = jnp.where(has[..., None], jnp.maximum(l_a, l_b), -big)
    lo = lo.reshape(nb, RB, nw, 3).min(axis=1)                     # [nb, nw, 3]
    hi = hi.reshape(nb, RB, nw, 3).max(axis=1)
    valid = (lo[..., 0] < big / 2).astype(jnp.int32)               # any ray

    lo_i = lo.astype(jnp.int32)
    hi_i = hi.astype(jnp.int32)
    reso_i = np.asarray(cfg.reso, np.int32)
    # the box must fit the grid, and the y clamp below must stay 8-aligned
    # (the kernels promise pl.multiple_of(cy, 8) on the tiled memref dim)
    assert int(reso_i[0]) >= BX and int(reso_i[1]) >= BY and (
        n_zgroups(int(reso_i[2])) >= GB), (
        f"voxel kernel needs reso >= ({BX}, {BY}, {ZSTRIDE * (GB - 1) + 2}); "
        f"got {tuple(cfg.reso)} — use the XLA path (use_kernel=False)")
    cx = jnp.clip(lo_i[..., 0], 0, int(reso_i[0]) - BX)
    # y corner must be 8-aligned (tiled memref dim); BY absorbs the waste
    cy = jnp.clip((lo_i[..., 1] // 8) * 8, 0, (int(reso_i[1]) - BY) & ~7)
    zg_lo = lo_i[..., 2] // ZSTRIDE
    zg_hi = hi_i[..., 2] // ZSTRIDE
    zg_tot = n_zgroups(cfg.reso[2])
    cg = jnp.clip(zg_lo, 0, zg_tot - GB)
    spread_ok = (
        (hi_i[..., 0] - cx <= BX - 2)
        & (hi_i[..., 1] - cy <= BY - 2)
        & (zg_hi - cg <= GB - 1)
    ) | (valid == 0)
    if occ_mip is not None:
        # the box spans <= 3 mip cells per axis (BX=12, BY=24 8-aligned,
        # z-extent 16): static 3x3x3 neighborhood max at the box corner
        mx = occ_mip.shape[0] - 1
        my = occ_mip.shape[1] - 1
        mz = occ_mip.shape[2] - 1
        bx = jnp.clip(cx // 8, 0, mx)
        by = jnp.clip(cy // 8, 0, my)
        bz = jnp.clip((cg * ZSTRIDE) // 8, 0, mz)
        occ_any = jnp.zeros_like(valid, dtype=bool)
        for ox in range(3):
            for oy in range(3):
                for oz in range(3):
                    occ_any = occ_any | occ_mip[
                        jnp.minimum(bx + ox, mx),
                        jnp.minimum(by + oy, my),
                        jnp.minimum(bz + oz, mz),
                    ]
        valid = valid * occ_any.astype(jnp.int32)

    corners = jnp.stack(
        [
            jnp.where(valid > 0, cg, 0).reshape(nb * nw),
            jnp.where(valid > 0, cx, 0).reshape(nb * nw),
            jnp.where(valid > 0, cy, 0).reshape(nb * nw),
        ],
        axis=0,
    )
    return RayBlocks(
        rays,
        corners,
        valid.reshape(nb * nw),
        jnp.all(spread_ok, axis=1),
    )


def morton_order(px: np.ndarray, py: np.ndarray, img: np.ndarray) -> np.ndarray:
    """Host-side coherence ordering: argsort by (image, morton(px, py)).
    Epoch builders use this so RB-ray blocks are tight pixel bundles."""
    def spread(v):
        v = v.astype(np.uint64) & np.uint64(0xFFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
        return v

    key = (img.astype(np.uint64) << np.uint64(34)) | (
        spread(px) << np.uint64(1)
    ) | spread(py)
    return np.argsort(key, kind="stable")


# ---------------------------------------------------------------------------
# Shared in-kernel marching math
#
# All per-sample arrays are [NS, k] columns in STEP-MAJOR order: sample
# s = j * RB + r is ray r at in-window step j.  Mosaic cannot fold lanes
# into sublanes ([RB, W] -> [NS, 1] reshape is unsupported), so per-ray ->
# per-sample expansion is an exact sublane concat, per-ray reductions are
# E^T matmuls, and in-ray prefix sums are a segment-mask matmul.
# ---------------------------------------------------------------------------

def _expand(a):
    """Exact per-ray -> per-sample expansion: [RB, k] -> [NS, k]."""
    return jnp.concatenate([a] * W, axis=0)


def _reduce_mat():
    """E^T [RB, NS]: ray r sums its samples (s % RB == r)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (RB, NS), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (RB, NS), 1)
    return (s % RB == r).astype(jnp.float32)


def _reduce(x):
    """Per-ray sum over in-window samples: [NS, k] -> [RB, k]."""
    return jax.lax.dot_general(
        _reduce_mat(), x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _seg_prefix(x):
    """Inclusive prefix over each ray's in-window samples (step-major:
    same residue mod RB, earlier or equal index).  jnp.cumsum has no
    Pallas-TPU lowering, so this is a masked matmul."""
    r = jax.lax.broadcasted_iota(jnp.int32, (NS, NS), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (NS, NS), 1)
    mask = ((r % RB == c % RB) & (c <= r)).astype(jnp.float32)
    return jax.lax.dot_general(
        mask, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _march_window(rays, cg, cx, cy, win, valid_w, cfg, table2d):
    """Forward math for one box.  rays [RB, 32] f32, table2d [NROWS, 128]
    bf16.  Returns per-sample quantities shared by fwd and bwd."""
    X, Y, Z = cfg.reso
    step = cfg.step_size

    tmin = _expand(rays[:, _C_TMIN:_C_TMIN + 1])                 # [NS, 1]
    tmax = _expand(rays[:, _C_TMAX:_C_TMAX + 1])
    j = (jax.lax.broadcasted_iota(jnp.int32, (NS, 1), 0) // RB).astype(
        jnp.float32)
    ts = tmin + (win.astype(jnp.float32) * W + j) * step         # [NS, 1]
    in_range = jnp.logical_and(ts <= tmax, valid_w > 0)
    sval = in_range.astype(jnp.float32)                          # [NS, 1]

    def axis(a_i, reso_a):
        o_a = _expand(rays[:, _C_O + a_i:_C_O + a_i + 1])
        d_a = _expand(rays[:, _C_D + a_i:_C_D + a_i + 1])
        pos = jnp.clip(o_a + ts * d_a, 0.0, reso_a - 1.0)        # [NS, 1]
        l = jnp.clip(jnp.floor(pos), 0.0, reso_a - 2.0)
        return l.astype(jnp.int32), pos - l

    lx_g, fx = axis(0, float(X))
    ly_g, fy = axis(1, float(Y))
    lz, fz = axis(2, float(Z))

    lx = lx_g - cx
    ly = ly_g - cy
    zg = lz // ZSTRIDE
    zr = lz - zg * ZSTRIDE                                       # [NS, 1]
    zg_loc = zg - cg

    # box rows are [GB, BX, BY]-flat: row = (zg*BX + x)*BY + y
    row00 = (zg_loc * BX + lx) * BY + ly
    row01 = row00 + 1           # y + 1
    row10 = row00 + BY          # x + 1
    row11 = row10 + 1

    riota = jax.lax.broadcasted_iota(jnp.int32, (NS, NROWS), 1)
    A = (
        (riota == row00).astype(jnp.float32) * ((1 - fx) * (1 - fy) * sval)
        + (riota == row01).astype(jnp.float32) * ((1 - fx) * fy * sval)
        + (riota == row10).astype(jnp.float32) * (fx * (1 - fy) * sval)
        + (riota == row11).astype(jnp.float32) * (fx * fy * sval)
    ).astype(jnp.bfloat16)

    feat = jax.lax.dot_general(
        A, table2d,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                            # [NS, 128]

    liota = jax.lax.broadcasted_iota(jnp.int32, (NS, LANES), 1)
    idx0 = jnp.minimum(zr * CH + liota, LANES - 1)
    idx1 = jnp.minimum((zr + 1) * CH + liota, LANES - 1)
    v0 = jnp.take_along_axis(feat, idx0, axis=1, mode="promise_in_bounds")
    v1 = jnp.take_along_axis(feat, idx1, axis=1, mode="promise_in_bounds")
    val = (1.0 - fz) * v0 + fz * v1                              # [NS, 128]

    sigma_raw = val[:, 0:1]
    relu_gate = (sigma_raw > 0.0).astype(jnp.float32)
    sigma = sigma_raw * relu_gate
    thresh_gate = (sigma >= cfg.sigma_thresh).astype(jnp.float32) * sval
    sigma = sigma * thresh_gate                                  # [NS, 1]

    shm_s = _expand(rays[:, _C_SH:_C_SH + 9])                    # [NS, 9]
    rgb_raw = jnp.concatenate(
        [
            jnp.sum(val[:, 1 + 9 * c: 1 + 9 * (c + 1)] * shm_s, axis=1,
                    keepdims=True)
            for c in range(3)
        ],
        axis=1,
    ) + 0.5
    clamp_gate = (rgb_raw > 0.0).astype(jnp.float32)
    rgb = rgb_raw * clamp_gate                                   # [NS, 3]

    return dict(
        sigma=sigma, rgb=rgb, ts=ts, A=A,
        zr=zr, fz=fz, relu_gate=relu_gate, thresh_gate=thresh_gate,
        clamp_gate=clamp_gate, shm_s=shm_s,
    )


def _transmittance(m, rays, carry_logT, cfg):
    """Per-sample log-attenuation, entering log-T, and weights.

    carry_logT [RB, 1] is the block's accumulated log-T entering this
    window; returns per-sample arrays plus the per-ray window total."""
    dscale = _expand(rays[:, _C_DS:_C_DS + 1])                   # [NS, 1]
    log_att = -cfg.step_size * m["sigma"] * dscale               # [NS, 1]
    cum = _seg_prefix(log_att)
    log_T_in = _expand(carry_logT) + cum - log_att
    wgt = jnp.exp(log_T_in) * (1.0 - jnp.exp(log_att))           # [NS, 1]
    la_total = _reduce(log_att)                                  # [RB, 1]
    return log_att, log_T_in, wgt, la_total


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _box_copy(table_hbm, cg_ref, cx_ref, cy_ref, idx, buf, sem):
    """Async-copy descriptor for window idx's grid box into buf."""
    cg = cg_ref[idx]
    cx = cx_ref[idx]
    cy = pl.multiple_of(cy_ref[idx], 8)
    return pltpu.make_async_copy(
        table_hbm.at[pl.ds(cg, GB), pl.ds(cx, BX), pl.ds(cy, BY), :],
        buf, sem,
    )


def _fwd_kernel(cg_ref, cx_ref, cy_ref, valid_ref, rays_ref, table_hbm,
                out_ref, tbox0, tbox1, sem0, sem1,
                *, cfg: VoxelGridConfig, nw: int):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    win = g % nw
    cg = cg_ref[g]
    cx = cx_ref[g]
    cy = pl.multiple_of(cy_ref[g], 8)
    valid_w = valid_ref[g]

    @pl.when(win == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # double-buffered box DMA: window g's copy was started at step g-1
    # (or here for g == 0) into the parity buffer; start g+1's copy into
    # the OTHER buffer before computing, so the fetch rides under the
    # matmuls.  Buffers strictly alternate by window parity — a skipped
    # (invalid) window just leaves its parity buffer untouched.
    @pl.when((g == 0) & (valid_w > 0))
    def _():
        _box_copy(table_hbm, cg_ref, cx_ref, cy_ref, 0, tbox0, sem0).start()

    @pl.when(g + 1 < n_g)
    def _():
        @pl.when(valid_ref[g + 1] > 0)
        def _():
            @pl.when((g + 1) % 2 == 0)
            def _():
                _box_copy(table_hbm, cg_ref, cx_ref, cy_ref, g + 1,
                          tbox0, sem0).start()

            @pl.when((g + 1) % 2 == 1)
            def _():
                _box_copy(table_hbm, cg_ref, cx_ref, cy_ref, g + 1,
                          tbox1, sem1).start()

    # empty-space skipping: invalid windows (out of range / unoccupied box)
    # contribute exactly nothing — skip their DMA and compute entirely
    @pl.when(valid_w > 0)
    def _():
        @pl.when(g % 2 == 0)
        def _():
            _box_copy(table_hbm, cg_ref, cx_ref, cy_ref, g,
                      tbox0, sem0).wait()

        @pl.when(g % 2 == 1)
        def _():
            _box_copy(table_hbm, cg_ref, cx_ref, cy_ref, g,
                      tbox1, sem1).wait()

        # value-select the parity buffer (refs can't be selected; the
        # [NROWS, 128] bf16 select is ~0.2us, the DMA it hides ~3-5us)
        tb = jnp.where(g % 2 == 0, tbox0[...], tbox1[...])

        rays = rays_ref[0]
        m = _march_window(rays, cg, cx, cy, win, valid_w, cfg,
                          tb.reshape(NROWS, LANES))

        carry = out_ref[0, :, 4:5]
        log_att, _, wgt, la_total = _transmittance(m, rays, carry, cfg)

        rgb_add = _reduce(wgt * m["rgb"])                        # [RB, 3]
        depth_add = _reduce(wgt * m["ts"])                       # [RB, 1]

        out_ref[0, :, 0:3] += rgb_add
        out_ref[0, :, 3:4] += depth_add
        out_ref[0, :, 4:5] = carry + la_total

    @pl.when(win == nw - 1)
    def _():
        t_fin = jnp.exp(out_ref[0, :, 4:5])
        out_ref[0, :, 0:3] += t_fin * cfg.background_brightness
        out_ref[0, :, 5:6] = 1.0 - t_fin


# ---------------------------------------------------------------------------
# Backward kernel (fwd recompute + transposed stamp matmul + RMW DMA)
# ---------------------------------------------------------------------------

def _bwd_kernel(cg_ref, cx_ref, cy_ref, valid_ref, rays_ref, table_hbm,
                gray_ref, gtab_in, gtab_out, tbox, gcur, carry_ref,
                sem, gsem, wsem, *, cfg: VoxelGridConfig, nw: int):
    """gray channels: 0:3 upstream d(rgb); 3 S_total = sum_c g_c *
    (rgb_out_c - T_fin*bg); 4 = T_fin * sum_c g_c * bg.
    carry scratch [RB, 2]: (log_T, P = running prefix of G_k)."""
    g = pl.program_id(0)
    win = g % nw
    cg = cg_ref[g]
    cx = cx_ref[g]
    cy = pl.multiple_of(cy_ref[g], 8)
    valid_w = valid_ref[g]

    @pl.when(win == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    @pl.when(valid_w > 0)
    def _body():
        cp = pltpu.make_async_copy(
            table_hbm.at[pl.ds(cg, GB), pl.ds(cx, BX), pl.ds(cy, BY), :],
            tbox, sem,
        )
        cp.start()
        # NOTE: read through the OUTPUT ref (gtab_in aliases the same buffer
        # but the interpreter/compiler track the refs separately; reading
        # the input ref does not observe this kernel's earlier writes).
        rd = pltpu.make_async_copy(
            gtab_out.at[pl.ds(cg, GB), pl.ds(cx, BX), pl.ds(cy, BY), :],
            gcur, gsem,
        )
        rd.start()
        cp.wait()

        rays = rays_ref[0]
        m = _march_window(rays, cg, cx, cy, win, valid_w, cfg,
                          tbox[...].reshape(NROWS, LANES))

        carry_logT = carry_ref[:, 0:1]
        log_att, log_T_in, wgt, la_total = _transmittance(
            m, rays, carry_logT, cfg)

        g_rgb = gray_ref[0, :, 0:3]                              # [RB, 3]
        s_tot = _expand(gray_ref[0, :, 3:4])                     # [NS, 1]
        tfin_gbg = _expand(gray_ref[0, :, 4:5])

        # G_k = sum_c g_c * c_k * w_k, per sample
        g_rgb_s = _expand(g_rgb)                                 # [NS, 3]
        gc = jnp.sum(g_rgb_s * m["rgb"], axis=1, keepdims=True)  # [NS, 1]
        gk = gc * wgt
        p_carry = carry_ref[:, 1:2]
        p_incl = _expand(p_carry) + _seg_prefix(gk)              # P_i
        t_next = jnp.exp(log_T_in + log_att)                     # T_{i+1}
        dla = (s_tot - p_incl) - t_next * gc + tfin_gbg          # [NS, 1]
        dsigma = dla * (-cfg.step_size) * _expand(rays[:, _C_DS:_C_DS + 1])

        carry_ref[:, 0:1] = carry_logT + la_total
        carry_ref[:, 1:2] = p_carry + _reduce(gk)

        # per-sample channel-lane gradients
        dsig_s = dsigma * m["thresh_gate"] * m["relu_gate"]      # [NS, 1]
        dc = g_rgb_s * wgt * m["clamp_gate"]                     # [NS, 3]
        dval28 = jnp.concatenate(
            [dsig_s] + [dc[:, c:c + 1] * m["shm_s"] for c in range(3)],
            axis=1,
        )                                                        # [NS, 28]
        dval_t = jnp.concatenate([dval28] * 4, axis=1)           # [NS, 112]
        dval_t = jnp.pad(dval_t, ((0, 0), (0, LANES - 4 * CH)))
        liota = jax.lax.broadcasted_iota(jnp.int32, (NS, LANES), 1)
        k_l = liota // CH
        gmat = dval_t * (
            (k_l == m["zr"]).astype(jnp.float32) * (1.0 - m["fz"])
            + (k_l == m["zr"] + 1).astype(jnp.float32) * m["fz"]
        )                                                        # [NS, 128]

        gbox = jax.lax.dot_general(
            m["A"], gmat.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # [NROWS, 128]

        rd.wait()
        gcur[...] += gbox.reshape(GB, BX, BY, LANES)
        wr = pltpu.make_async_copy(
            gcur,
            gtab_out.at[pl.ds(cg, GB), pl.ds(cx, BX), pl.ds(cy, BY), :],
            wsem,
        )
        wr.start()
        wr.wait()

    del gtab_in


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom VJP
# ---------------------------------------------------------------------------

_CFGS = {}


def _cfg_key(cfg: VoxelGridConfig):
    key = (cfg.reso, cfg.step_size, cfg.sigma_thresh,
           cfg.background_brightness, cfg.near_clip, cfg.max_steps)
    _CFGS[key] = cfg
    return key


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def _fwd_call(key, nb, interpret):
    cfg = _CFGS[key]
    nw = n_windows(cfg.max_steps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb * nw,),
        in_specs=[
            pl.BlockSpec((1, RB, 32), lambda g, *_: (g // nw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, RB, 8), lambda g, *_: (g // nw, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((GB, BX, BY, LANES), jnp.bfloat16),
            pltpu.VMEM((GB, BX, BY, LANES), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, nw=nw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, RB, 8), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _bwd_call(key, nb, interpret):
    cfg = _CFGS[key]
    nw = n_windows(cfg.max_steps)
    x, y, z = cfg.reso
    zg_tot = n_zgroups(z)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nb * nw,),
        in_specs=[
            pl.BlockSpec((1, RB, 32), lambda g, *_: (g // nw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, RB, 8), lambda g, *_: (g // nw, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((GB, BX, BY, LANES), jnp.bfloat16),
            pltpu.VMEM((GB, BX, BY, LANES), jnp.float32),
            pltpu.VMEM((RB, 2), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, nw=nw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((zg_tot, x, y, LANES), jnp.float32),
        input_output_aliases={7: 0},
        interpret=interpret,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def render_blocks(table, rays, corners, valid, cfg: VoxelGridConfig):
    """Fused volume render over coherent ray blocks.

    table [ZG, X, Y, 128] bf16 (pack_table's layout: z-groups lead so the
    tiled memref dim is Y); rays/corners/valid from
    build_blocks.  Returns [n_blocks, RB, 8] f32:
    ch 0:3 rgb, 3 depth, 4 final log-transmittance, 5 acc."""
    out, _ = _render_fwd(table, rays, corners, valid, cfg)
    return out


def _render_fwd(table, rays, corners, valid, cfg):
    key = _cfg_key(cfg)
    nb = rays.shape[0]
    out = _fwd_call(key, nb, _use_interpret())(
        corners[0], corners[1], corners[2], valid, rays, table)
    return out, (table, rays, corners, valid, out)


def _render_bwd(cfg, res, g):
    table, rays, corners, valid, out = res
    key = _cfg_key(cfg)
    nb = rays.shape[0]
    x, y, z = cfg.reso
    zg_tot = n_zgroups(z)

    g_rgb = g[..., 0:3]
    t_fin = jnp.exp(out[..., 4:5])
    bg = cfg.background_brightness
    s_tot = jnp.sum(g_rgb * (out[..., 0:3] - t_fin * bg), axis=-1,
                    keepdims=True)
    # ch 4 (final log-transmittance) is differentiable: logT_fin is a plain
    # sum of per-sample log_att, so an upstream gradient on it adds linearly
    # to the same per-sample term that carries the kernel's own T_fin*bg
    # coupling (enables external compositing, e.g. the trained MSI
    # background, on top of the fused kernel).  depth/acc grads stay
    # unsupported (never part of a training loss here).
    tfin_gbg = (t_fin * jnp.sum(g_rgb * bg, axis=-1, keepdims=True)
                + g[..., 4:5])
    gray = jnp.concatenate(
        [g_rgb, s_tot, tfin_gbg,
         jnp.zeros(g_rgb.shape[:-1] + (3,), jnp.float32)], axis=-1
    )

    gtab0 = jnp.zeros((zg_tot, x, y, LANES), jnp.float32)
    gtab = _bwd_call(key, nb, _use_interpret())(
        corners[0], corners[1], corners[2], valid, rays, table, gray, gtab0
    )
    return (gtab.astype(table.dtype), jnp.zeros_like(rays), None, None)


render_blocks.defvjp(_render_fwd, _render_bwd)


# ---------------------------------------------------------------------------
# Convenience: twin-compatible entry for parity tests / eval
# ---------------------------------------------------------------------------

def voxel_render_rays_fast(grid: VoxelGrid, rays_o, rays_d,
                           cfg: VoxelGridConfig):
    """Drop-in analog of voxel_sh.voxel_render_rays via the Pallas path.

    Rays should already be coherence-ordered; N is padded to RB internally.
    Returns the twin's dict (plus per-block 'ok' spread flags).  A trained
    MSI background is composited exactly like the twin; learned-basis
    grids and non-cuvol backends are rejected (the fused kernel bakes
    cuvol marching + closed-form SH)."""
    if grid.basis is not None:
        raise ValueError("voxel_render_rays_fast is closed-form-SH only "
                         "(grid.basis set) — use voxel_render_rays")
    if cfg.backend != "cuvol":
        raise ValueError(f"voxel_render_rays_fast bakes cuvol marching; "
                         f"cfg.backend={cfg.backend!r} needs "
                         "voxel_render_rays")
    n = rays_o.shape[0]
    n_pad = -(-n // RB) * RB
    if n_pad != n:
        rays_o = jnp.concatenate(
            [rays_o, jnp.broadcast_to(rays_o[-1:], (n_pad - n, 3))])
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(rays_d[-1:], (n_pad - n, 3))])
    blocks = build_blocks(rays_o, rays_d, cfg, occupancy_mip(grid, cfg))
    table = pack_table(grid, cfg)
    out = render_blocks(table, blocks.rays, blocks.corners, blocks.valid, cfg)
    out = out.reshape(n_pad, 8)[:n]
    t_fin = jnp.exp(out[:, 4])
    rgb = out[:, 0:3]
    if grid.background is not None:
        # same MSI composite the train step applies to the kernel output —
        # without it, eval renders the flat background_brightness fill
        # while training optimized the MSI field (plenoxels_trainer.py)
        from flnerf_tpu.models.voxel_sh import compose_msi_background
        rgb = compose_msi_background(grid.background, rgb, out[:, 4],
                                     rays_o[:n], rays_d[:n], cfg)
    return {
        "rgb": rgb,
        "depth": out[:, 3],
        "acc": 1.0 - t_fin,
        "ok": blocks.ok,
    }
