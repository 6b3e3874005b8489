"""Occupancy-grid raymarching renderer for the hash-NGP backend, TPU-native.

Reference behavior being re-designed (ngp-ours/nerf/renderer.py +
raymarching/):
  * run_cuda (renderer.py:256-377): two-pass CUDA kernel that counts steps
    per ray with occupancy-bitfield tests, atomically compacts survivors
    into a flat point soup, then composites sequentially per ray.
  * update_extra_state (renderer.py:445-538): periodic density-grid refresh
    with EMA max decay 0.95 + packbits into a bitfield.
  * near_far_from_aabb (raymarching.py:19).

TPU re-design (static shapes, no atomics, no dynamic compaction):
  1. Per ray, draw S_cand stratified candidate depths in [near, far].
  2. Gather occupancy for all candidates from the density grid (no MLP) —
     the bitfield analog is a float grid + threshold compare.
  3. **Sort-based compaction**: a stable argsort of (not occupied) moves the
     occupied candidates (in depth order) to the front; keep the first K.
     This is the fixed-budget analog of CUDA's per-ray step compaction: the
     expensive field evaluation runs on [N, K] instead of [N, S_cand].
  4. Evaluate the field, mask invalid slots, alpha-composite with the
     depth gaps of the KEPT samples (empty space contributes nothing, so
     skipping it leaves transmittance unchanged).

The K cap plays the role of the reference's mean_count batch cap
(raymarching.py:200-203): rarely-needed tail samples are dropped.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NGPRenderConfig(NamedTuple):
    n_candidates: int = 128     # S_cand: occupancy-tested depths per ray
    n_keep: int = 64            # K: field evaluations per ray
    grid_size: int = 128        # occupancy grid resolution per axis
    bound: float = 1.0
    min_near: float = 0.05      # raymarching.py min_near
    density_thresh: float = 0.01
    density_scale: float = 1.0
    decay: float = 0.95         # EMA max decay (renderer.py:521-526)
    bg_color: float = 1.0       # scalar background (white default)
    # > 0: step size grows with depth (raymarching.cu's dt = t * dt_gamma
    # rule for large-bound scenes) — candidates become log-spaced in
    # [near, far], which realizes dt proportional to t at the effective
    # gamma log(far/near)/S the static candidate budget affords.
    dt_gamma: float = 0.0
    # candidate->keep compaction: 'argsort' (stable [N,S] argsort) or
    # 'onehot' (cumsum ranks + two [N,K,S] one-hot contractions — no
    # sort network; same output, measured A/B in tools/r3_batch.py)
    compaction: str = "argsort"
    # steady-state partial refresh granularity: one of stride^3 parity
    # classes of cells per update (G^3/stride^3 field evals).  The
    # reference resamples G^3/2 points per update (renderer.py:489-506)
    # because its fused CUDA MLP makes field evals nearly free; here the
    # encode IS the cost, so the sweep is strided — stride 2 (an eighth)
    # matches r2-r4 behavior, stride 4 (1/64, full coverage every 64
    # updates) trades refresh staleness for ~8x less refresh compute
    # (quality-gated by the ngp time-to-PSNR bench line).
    partial_stride: int = 2


class OccupancyState(NamedTuple):
    density: jnp.ndarray        # [G, G, G] float32 EMA density
    mean_density: jnp.ndarray   # scalar f32 (mean over clamped positives)
    # packed occupancy bitfield [G^3/32] int32 (raymarching packbits,
    # renderer.py:528-530): the hot per-step lookup gathers from this
    # 64K-word array instead of the 8MB float grid — measured 3.7 ms vs
    # 6.8 ms per 4096x128 candidate test on this chip
    bits: Optional[jnp.ndarray] = None


def pack_occupancy(density: jnp.ndarray, mean_density,
                   cfg: NGPRenderConfig) -> jnp.ndarray:
    """density grid -> packed bitfield at threshold min(mean, thresh)
    (the packbits step of update_extra_state)."""
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    occ = (density.reshape(-1, 32) > thresh).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None]
    words = jnp.sum(occ * weights, axis=-1, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, jnp.int32)


def init_occupancy(cfg: NGPRenderConfig) -> OccupancyState:
    g = cfg.grid_size
    return OccupancyState(
        density=jnp.zeros((g, g, g), jnp.float32),
        mean_density=jnp.zeros((), jnp.float32),
        bits=(jnp.zeros((g * g * g // 32,), jnp.int32)
              if (g ** 3) % 32 == 0 else None),
    )


def with_density(occ: OccupancyState, density, cfg: NGPRenderConfig,
                 mean_density=None) -> OccupancyState:
    """Replace the density grid CONSISTENTLY (bitfield repacked).
    Use this instead of occ._replace(density=...): the hot lookup reads
    the packed bits, so a bare _replace would silently desynchronize
    them."""
    mean = (jnp.mean(jnp.clip(density, 0.0, None))
            if mean_density is None else jnp.asarray(mean_density))
    return OccupancyState(
        density, mean,
        pack_occupancy(density, mean, cfg) if occ.bits is not None else None)


def near_far_from_aabb(rays_o, rays_d, bound: float, min_near: float):
    """Slab-method ray/AABB intersection ([-bound, bound]^3).

    Matches raymarching.py:19/near_far_from_aabb semantics: near clamped
    to min_near.  ``far`` is always clamped to >= near + 1e-6 (static
    shapes need a valid interval for every lane), so misses must be
    culled via the ``hit`` mask — NOT by comparing near > far.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-9, 1e-9, rays_d)
    t0 = (-bound - rays_o) * inv_d
    t1 = (bound - rays_o) * inv_d
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    near = jnp.maximum(tmin, min_near)
    far = jnp.maximum(tmax, near + 1e-6)
    hit = tmax > jnp.maximum(tmin, min_near)
    return near, far, hit


def occupancy_lookup(occ: OccupancyState, xyz, cfg: NGPRenderConfig):
    """Occupied test for world points (bitfield-gather analog).

    threshold = min(mean_density, density_thresh) as in
    raymarching packbits usage (renderer.py:528-530).
    """
    g = cfg.grid_size
    cell = ((xyz / cfg.bound + 1.0) * 0.5 * g).astype(jnp.int32)
    cell = jnp.clip(cell, 0, g - 1)
    # flat single-axis take: the 3-axis fancy-index gather costs ~45% more
    # on this chip (5.4 vs 3.7 ms for 4096x128 lookups from 128^3)
    flat = (cell[..., 0] * g + cell[..., 1]) * g + cell[..., 2]
    if occ.bits is not None and (g ** 3) % 32 == 0:
        # packed-bitfield gather (packbits analog): the 64K-word table
        # gathers ~45% faster than the 8MB float grid (measured)
        w = jnp.take(occ.bits, flat >> 5)
        return (jax.lax.shift_right_logical(w, flat & 31) & 1) > 0
    vals = jnp.take(occ.density.reshape(-1), flat)
    thresh = jnp.minimum(occ.mean_density, cfg.density_thresh)
    return vals > thresh


def mark_untrained_grid(
    occ: OccupancyState,
    poses: np.ndarray,
    K: np.ndarray,
    H: int,
    W: int,
    cfg: NGPRenderConfig,
    chunk: int = 1 << 16,
) -> OccupancyState:
    """Mark grid cells invisible from every training camera as permanently
    empty (renderer.py:380-442 mark_untrained_grid).

    A cell is trainable iff its center projects inside at least one camera's
    image with positive depth (OpenGL convention: camera looks along -z).
    Untrained cells get density -1 so the EMA-max refresh never revives them
    (the reference pins them at -1 likewise).
    """
    g = cfg.grid_size
    idx = np.arange(g)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    centers = (np.stack([gx, gy, gz], -1).reshape(-1, 3) + 0.5) / g
    centers = ((centers * 2.0 - 1.0) * cfg.bound).astype(np.float32)  # [M, 3]

    poses = np.asarray(poses, np.float32)
    K = np.asarray(K)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    visible = np.zeros(centers.shape[0], bool)
    # chunk the cell axis: at grid_size 256 the unchunked per-pose
    # temporaries (cam/u/v/z over 16.7M cells) peak around a GB on the
    # single-core host
    for s in range(0, centers.shape[0], chunk):
        ce = centers[s:s + chunk]
        vis = visible[s:s + chunk]
        for p in poses:
            R = p[:3, :3]
            t = p[:3, 3]
            cam = (ce - t) @ R                                       # world->cam
            z = -cam[:, 2]                                           # looking -z
            with np.errstate(divide="ignore", invalid="ignore"):
                u = fx * cam[:, 0] / np.maximum(z, 1e-9) + cx
                v = -fy * cam[:, 1] / np.maximum(z, 1e-9) + cy
            vis |= (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        visible[s:s + chunk] = vis

    density = np.asarray(occ.density).reshape(-1).copy()
    density[~visible] = -1.0
    dens = jnp.asarray(density.reshape(g, g, g))
    return occ._replace(
        density=dens,
        bits=pack_occupancy(dens, occ.mean_density, cfg)
        if occ.bits is not None else None)


def _density_sweep(params, density_fn, cells, key, g: int,
                   cfg: NGPRenderConfig, chunk: int):
    """Field sigma at jittered cell centers, scan-chunked.  lax.scan (not
    a Python loop) so XLA SEQUENCES the chunks: unrolled chunks schedule
    concurrently and their hash-encoding temporaries stack up to tens of
    GB at grid_size 128."""
    jitter = jax.random.uniform(key, cells.shape)
    xyz = ((cells + jitter) / g * 2.0 - 1.0) * cfg.bound
    n = xyz.shape[0]
    chunk = min(chunk, n)
    n_pad = -(-n // chunk) * chunk          # any grid size, e.g. 96^3
    if n_pad != n:
        # wrap-tile pads (see ngp_render_image): a duplicated-constant pad
        # chunk halves that call's real-key density and undersizes the
        # lattice engine's slab spans — uniform duplicates keep them exact
        reps = -(-n_pad // n)
        xyz = jnp.tile(xyz, (reps, 1))[:n_pad]
    xyz_c = jax.lax.stop_gradient(xyz).reshape(n_pad // chunk, chunk, 3)

    def body(carry, xc):
        s, _ = density_fn(params, xc)
        return carry, s

    _, sigma = jax.lax.scan(body, 0, xyz_c)
    return sigma.reshape(-1)[:n] * cfg.density_scale


def update_occupancy(
    occ: OccupancyState,
    params,
    density_fn: Callable,
    key,
    cfg: NGPRenderConfig,
    chunk: int = 1 << 16,
    partial: bool = False,
) -> OccupancyState:
    """Refresh the density grid by querying the field at jittered cell
    centers; EMA max decay (update_extra_state, renderer.py:445-538).

    partial=False sweeps the full grid (the reference's first-16-updates
    behavior).  partial=True resamples a random strided EIGHTH of the
    cells (one of the 8 (x, y, z) parity classes) while still decaying
    the whole grid — the steady-state analog of the reference's partial
    random resample (renderer.py:466-506), and 8x cheaper: the full
    128^3 sweep costs ~1.1 s of field evals on this chip (~70 ms/step
    amortized at the default 16-step interval).

    Untrained cells (marked -1 by mark_untrained_grid) stay pinned at -1,
    matching the reference's density_grid >= 0 update guard."""
    g = cfg.grid_size
    decayed = jnp.where(
        occ.density < 0, occ.density, occ.density * cfg.decay)

    if not partial:
        idx = jnp.arange(g)
        gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
        cells = jnp.stack([gx, gy, gz], -1).reshape(-1, 3).astype(jnp.float32)
        sigma = _density_sweep(params, density_fn, cells, key, g, cfg,
                               chunk).reshape(g, g, g)
        new_density = jnp.where(
            occ.density < 0, occ.density, jnp.maximum(decayed, sigma))
        mean = jnp.mean(jnp.clip(new_density, 0.0, None))
        return OccupancyState(
            new_density, mean,
            pack_occupancy(new_density, mean, cfg)
            if occ.bits is not None else None)

    s = max(int(cfg.partial_stride), 2)
    if g % s:
        # parity classes need a divisible grid; odd sizes do full sweeps
        return update_occupancy(occ, params, density_fn, key, cfg, chunk,
                                partial=False)

    gh = g // s
    kp, kj = jax.random.split(key)
    parity = jax.random.randint(kp, (3,), 0, s)
    idx = jnp.arange(gh)
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    cells = (jnp.stack([gx, gy, gz], -1).reshape(-1, 3) * s
             + parity[None, :]).astype(jnp.float32)
    sigma = _density_sweep(params, density_fn, cells, kj, g, cfg,
                           chunk).reshape(gh, gh, gh)

    # strided write-back with NO scatter: view the grid as parity-major
    # [s, s, s, gh, gh, gh] and dynamic-update the sampled parity class
    d6 = jnp.transpose(
        decayed.reshape(gh, s, gh, s, gh, s), (1, 3, 5, 0, 2, 4))
    sub = jax.lax.dynamic_slice(
        d6, (parity[0], parity[1], parity[2], 0, 0, 0),
        (1, 1, 1, gh, gh, gh))
    pinned = sub < 0
    new_sub = jnp.where(pinned, sub,
                        jnp.maximum(sub, sigma[None, None, None]))
    d6 = jax.lax.dynamic_update_slice(
        d6, new_sub, (parity[0], parity[1], parity[2], 0, 0, 0))
    new_density = jnp.transpose(
        d6, (3, 0, 4, 1, 5, 2)).reshape(g, g, g)
    mean = jnp.mean(jnp.clip(new_density, 0.0, None))
    return OccupancyState(
        new_density, mean,
        pack_occupancy(new_density, mean, cfg)
        if occ.bits is not None else None)


def ngp_render_rays(
    key,
    params,
    density_fn: Callable,
    rgb_fn: Callable,
    occ: OccupancyState,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: NGPRenderConfig,
    perturb: bool = True,
    bg_color=None,
    times: Optional[jnp.ndarray] = None,
    bg_fn: Optional[Callable] = None,
):
    """Render [N] rays (unit rays_d). Returns dict(rgb, depth, acc).

    ``bg_fn(params, rays_o, rays_d) -> [N, 3]`` enables the learned
    environment-map background (renderer.py:232-235: bg model overrides any
    bg_color).

    Differentiable wrt params; the occupancy state is treated as constant
    (stop-gradient), like the reference's no-grad grid updates.

    ``times`` [N] enables the time-conditioned (D-NeRF) field protocol:
    density_fn(params, xyz, t) with t broadcast over the samples axis
    (dnerf/renderer.py's time plumbing).
    """
    n = rays_o.shape[0]
    S, K = cfg.n_candidates, cfg.n_keep
    near, far, hit = near_far_from_aabb(rays_o, rays_d, cfg.bound, cfg.min_near)

    t = jnp.linspace(0.0, 1.0, S)
    if cfg.dt_gamma > 0:
        # dt proportional to t: log-uniform depths; local spacing ~ z * g
        ln_n, ln_f = jnp.log(near), jnp.log(far)
        z = jnp.exp(ln_n[:, None] * (1.0 - t)[None, :]
                    + ln_f[:, None] * t[None, :])
        g = (ln_f - ln_n) / S
        spacing = z * g[:, None]                        # [N, S]
        sample_dist = far * g                           # tail delta
    else:
        z = near[:, None] + (far - near)[:, None] * t[None, :]
        sample_dist = (far - near) / S
        spacing = jnp.broadcast_to(sample_dist[:, None], z.shape)
    if perturb:
        z = z + (jax.random.uniform(key, z.shape) - 0.5) * spacing

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    xyz = jnp.clip(xyz, -cfg.bound, cfg.bound)
    occ_mask = occupancy_lookup(occ, xyz, cfg) & hit[:, None]  # [N, S]

    # Compaction: keep K of the occupied candidates (already depth-
    # ordered).  When more than K are occupied the keep is STRATIFIED —
    # rank floor((k+0.5)*n_occ/K) — not first-K: a saturated grid (the
    # bootstrap state; trunc_exp inits the field at sigma~1 everywhere
    # and the EMA-max grid update needs ~90 refreshes to forget it)
    # would otherwise pin all K samples to the nearest eighth of the
    # ray, and training collapses to per-view billboards at each
    # camera's box entry: train PSNR climbs, novel views render fog
    # (r5 golden-fixture diagnosis; torch-ngp never sees this because
    # its raymarching walks up to 1024 steps through the whole AABB,
    # raymarching.py march_rays_train).  Once the grid converges to
    # <=K occupied per ray the strided keep IS first-K.
    kidx = jnp.arange(K, dtype=jnp.float32)
    if cfg.compaction == "onehot":
        # Rank arithmetic instead of a sort network: occupied slot s
        # (cumulative index c) is kept iff c-1 matches a target rank;
        # the [K]x[S] one-hot contraction fuses with the compare — no
        # O(S log^2 S) sorting.
        mf = occ_mask.astype(jnp.float32)
        c_occ = jnp.cumsum(mf, axis=-1)                       # [N, S]
        n_occ = c_occ[:, -1:]
        ranks = jnp.where(n_occ > K,
                          jnp.floor((kidx[None, :] + 0.5) * n_occ / K),
                          kidx[None, :])                      # [N, K]
        sel = occ_mask[:, None, :] & (
            (c_occ - 1.0)[:, None, :] == ranks[:, :, None])   # [N, K, S]
        zk = jnp.sum(jnp.where(sel, z[:, None, :], 0.0), -1)  # [N, K]
        mk = kidx[None, :] < n_occ                            # [N, K]
    else:
        order = jnp.argsort(jnp.logical_not(occ_mask), axis=-1,
                            stable=True)                      # [N, S]
        n_occ = jnp.sum(occ_mask, axis=-1, keepdims=True)     # [N, 1]
        ranks = jnp.where(n_occ > K,
                          jnp.floor((kidx[None, :] + 0.5) * n_occ / K),
                          kidx[None, :]).astype(jnp.int32)    # [N, K]
        keep = jnp.take_along_axis(order, ranks, axis=-1)     # [N, K]
        zk = jnp.take_along_axis(z, keep, axis=-1)                # [N, K]
        mk = jnp.take_along_axis(occ_mask, keep, axis=-1)         # [N, K]
    xyzk = rays_o[:, None, :] + rays_d[:, None, :] * zk[..., None]
    xyzk = jnp.clip(xyzk, -cfg.bound, cfg.bound)

    if times is not None:
        tk = jnp.broadcast_to(times[:, None], zk.shape)              # [N, K]
        sigma, geo = density_fn(params, xyzk, tk)
    else:
        sigma, geo = density_fn(params, xyzk)                        # [N,K], [N,K,F]
    sigma = jnp.where(mk, sigma, 0.0)

    deltas = zk[:, 1:] - zk[:, :-1]
    # the LAST kept sample (next slot invalid) integrates over the tail
    # delta, matching the reference's final-step dt (march_rays_train)
    deltas = jnp.where(mk[:, 1:], deltas, sample_dist[:, None])
    deltas = jnp.concatenate([deltas, sample_dist[:, None]], -1)
    deltas = jnp.where(mk, jnp.maximum(deltas, 0.0), 0.0)

    alpha = 1.0 - jnp.exp(-deltas * cfg.density_scale * sigma)       # [N, K]
    shifted = jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-15], -1)
    weights = alpha * jnp.cumprod(shifted, -1)[:, :-1]

    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzk.shape)
    rgb_s = rgb_fn(params, dirs, geo)                                # [N, K, 3]

    acc = jnp.sum(weights, -1)
    rgb = jnp.sum(weights[..., None] * rgb_s, -2)
    depth = jnp.sum(weights * zk, -1)

    if bg_fn is not None:
        bg_color = bg_fn(params, rays_o, rays_d)
    elif bg_color is None:
        bg_color = cfg.bg_color
    rgb = rgb + (1.0 - acc)[..., None] * bg_color
    return {"rgb": rgb, "depth": depth, "acc": acc}


def ngp_render_image(
    params,
    density_fn,
    rgb_fn,
    occ: OccupancyState,
    cfg: NGPRenderConfig,
    H: int,
    W: int,
    K,
    c2w,
    chunk: int = 8192,
    bg_color=None,
    time: Optional[float] = None,
    bg_fn: Optional[Callable] = None,
):
    """Full-image eval render with fixed-size compiled chunks.  ``time``
    renders a D-NeRF frame at that timestamp.  ``bg_color`` overrides
    cfg.bg_color for this render (baked into the compiled chunk via the
    cfg cache key); ``bg_fn`` still takes precedence when given."""
    from flnerf_tpu.rays.camera import get_rays

    if bg_color is not None:
        cfg = cfg._replace(bg_color=float(bg_color))

    rays_o, rays_d = get_rays(H, W, K, jnp.asarray(c2w))
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    n = rays_o.shape[0]
    # never render chunks larger than the image (a chunk > n is pure
    # padding work), but keep the caller's chunking otherwise
    chunk = min(chunk, (n + 127) // 128 * 128)
    n_pad = (n + chunk - 1) // chunk * chunk
    if n_pad != n:
        # Pad by WRAP-TILING the real rays, NOT by broadcasting one ray:
        # the lattice hash engine sizes its slab spans from the call's
        # point count assuming (near-)uniform key duplication — a padded
        # half-batch of ONE duplicated ray halves the real-key density,
        # undersizes every hashed level's slab 2x, and silently drops
        # corners (the round-3 "lattice quality gap": 32.9 dB at chunk
        # 8192 on a 4096-ray image vs 38.2 at chunk 4096, same params —
        # LATTICE_diagnose.json).  Uniformly-duplicated pads keep the
        # sorted-key density exactly at the sizing assumption.
        reps = -(-n_pad // n)
        rays_o = jnp.tile(rays_o, (reps, 1))[:n_pad]
        rays_d = jnp.tile(rays_d, (reps, 1))[:n_pad]

    render = _eval_chunk(density_fn, rgb_fn, cfg, timed=time is not None,
                         bg_fn=bg_fn)
    rgbs, depths = [], []
    for i in range(0, n_pad, chunk):
        args = [params, occ, rays_o[i : i + chunk], rays_d[i : i + chunk]]
        if time is not None:
            args.append(jnp.full((chunk,), float(time)))
        out = render(*args)
        rgbs.append(out["rgb"])
        depths.append(out["depth"])
    rgb = jnp.concatenate(rgbs, 0)[:n].reshape(H, W, 3)
    depth = jnp.concatenate(depths, 0)[:n].reshape(H, W)
    return np.asarray(rgb), np.asarray(depth)


# Bounded compiled-eval cache.  Values pin the callables so the id() keys
# can never be reused by the GC (the id-reuse hazard of a plain dict), and
# the LRU bound stops unbounded growth across many field instances.
_EVAL_CACHE: "OrderedDict" = None


def _eval_chunk(density_fn, rgb_fn, cfg: NGPRenderConfig, timed: bool = False,
                bg_fn=None):
    global _EVAL_CACHE
    from collections import OrderedDict

    if _EVAL_CACHE is None:
        _EVAL_CACHE = OrderedDict()
    key = (id(density_fn), id(rgb_fn), id(bg_fn), cfg, timed)
    if key not in _EVAL_CACHE:
        if timed:

            @jax.jit
            def render(params, occ, rays_o, rays_d, times):
                return ngp_render_rays(
                    jax.random.PRNGKey(0), params, density_fn, rgb_fn, occ,
                    rays_o, rays_d, cfg, perturb=False, times=times,
                    bg_fn=bg_fn,
                )

        else:

            @jax.jit
            def render(params, occ, rays_o, rays_d):
                return ngp_render_rays(
                    jax.random.PRNGKey(0), params, density_fn, rgb_fn, occ,
                    rays_o, rays_d, cfg, perturb=False, bg_fn=bg_fn,
                )

        _EVAL_CACHE[key] = (render, density_fn, rgb_fn, bg_fn)
        while len(_EVAL_CACHE) > 16:
            _EVAL_CACHE.popitem(last=False)
    else:
        _EVAL_CACHE.move_to_end(key)
    return _EVAL_CACHE[key][0]
