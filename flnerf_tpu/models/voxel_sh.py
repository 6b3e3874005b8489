"""Plenoxels field backend: dense voxel grid (density + spherical harmonics).

Parity targets (plenoxels-ours/svox2):
  * SparseGrid — svox2.py:335-536: density + SH-coefficient voxel grid with
    world<->grid transform (radius/center), basis_dim 9 (SH degree 3).
  * Python renderer — svox2.py:659-780 (_volume_render_gradcheck_lerp):
    grid-space marching at ``step_size`` voxel units; trilinear sigma/SH;
    rgb = clamp_min(sum(sh_mult * coeffs) + 0.5, 0);
    log-transmittance accumulation with delta_scale = 1/|grid-space dir|;
    background_brightness fills the remaining light.
  * npz checkpoint layout — svox2.py:1531-1633 (save/load): radius, center,
    links int32 grid, density_data [cap,1], sh_data [cap, 27] fp16.

TPU re-design:
  * The ``links`` indirection exists to keep a 512^3 sparse grid in GPU
    memory.  Here the grid is DENSE [X,Y,Z](+27) with a bool ``alive`` mask
    (pruning = clearing mask bits, no reindexing, no recompilation); npz
    save/load converts dense<->links for format parity.  512^3 is reached by
    shard_map-sharding the grid's X axis over the device mesh.
  * Marching is a fixed-length masked scan: S static steps of
    ``step_size`` voxels, samples beyond tmax masked — XLA-compilable,
    no per-ray while-loops (CUDA's early-exit becomes mask math).
  * Trilinear sampling currently uses XLA gathers (correctness path);
    a Pallas tiled-gather kernel is the planned fast path.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.ops.sh_encoding import sh_encode


class VoxelGridConfig(NamedTuple):
    reso: Tuple[int, int, int] = (128, 128, 128)
    basis_dim: int = 9              # SH degree 3
    radius: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    init_sigma: float = 0.1         # opt.py init_sigma
    init_sigma_bg: float = 0.1      # argument_parser.py --init_sigma_bg
    step_size: float = 0.5          # RenderOptions.step_size (voxel units)
    sigma_thresh: float = 1e-8
    stop_thresh: float = 1e-7
    background_brightness: float = 1.0
    near_clip: float = 0.0
    max_steps: int = 512            # static marching budget
    # RenderOptions.backend (svox2.py:17): 'cuvol' (trilerp, log-transmit),
    # 'nvol' (Neural-Volumes alpha sum, render_lerp_kernel_nvol.cu:31-106),
    # 'svox1' (nearest-neighbor voxel DDA, render_svox1_kernel.cu:51-160)
    backend: str = "cuvol"
    # MSI cubemap-ish background (svox2.py:498-522: equirect x nlayers
    # concentric spheres); 0 disables
    background_nlayers: int = 0
    background_reso: int = 512
    # basis type (svox2.py:344,461-496): 'sh' (closed form), '3d_texture'
    # (learned basis_reso^3 grid trilinearly sampled at the view dir),
    # 'mlp' (learned 4-layer MLP of the (posenc'd) view dir, sigmoid)
    basis_type: str = "sh"
    basis_reso: int = 32            # --basis_reso
    mlp_posenc_size: int = 4        # --mlp_posenc_size
    mlp_width: int = 32             # --mlp_width


class VoxelGrid(NamedTuple):
    """Trainable state (a pytree): dense density + SH data (+ alive mask).

    ``background`` is the optional MSI background: [2R, R, nlayers, 4]
    equirect (lon x lat) x concentric layers x (rgb, sigma) — the dense
    analog of svox2's background_links/background_data (svox2.py:498-522).
    """

    density: jnp.ndarray   # [X, Y, Z] f32 (raw sigma)
    sh: jnp.ndarray        # [X, Y, Z, 3*basis_dim] f32
    alive: jnp.ndarray     # [X, Y, Z] bool — pruning mask (not trained)
    background: Optional[jnp.ndarray] = None
    # learned basis (svox2.py:461-496): [R, R, R, basis_dim] grid for
    # basis_type='3d_texture', a layer dict for 'mlp', None for SH
    basis: Optional[Any] = None


def init_basis(cfg: VoxelGridConfig, seed: int = 0):
    """Learned-basis parameters (svox2.py:461-496): zeros for the 3D
    texture (like the reference ctor), xavier-uniform Linear stack for the
    MLP (utils.init_weights)."""
    if cfg.basis_type == "3d_texture":
        r = cfg.basis_reso
        return jnp.zeros((r, r, r, cfg.basis_dim), jnp.float32)
    if cfg.basis_type == "mlp":
        rng = np.random.default_rng(seed)
        dims = [3 + 6 * cfg.mlp_posenc_size, cfg.mlp_width, cfg.mlp_width,
                cfg.mlp_width, cfg.basis_dim]
        basis = {}
        for i in range(4):
            lim = np.sqrt(6.0 / (dims[i] + dims[i + 1]))
            basis[f"w{i}"] = jnp.asarray(
                rng.uniform(-lim, lim, (dims[i], dims[i + 1])), jnp.float32)
            basis[f"b{i}"] = jnp.zeros((dims[i + 1],), jnp.float32)
        return basis
    return None


def eval_basis(grid: VoxelGrid, viewdirs: jnp.ndarray,
               cfg: VoxelGridConfig) -> jnp.ndarray:
    """Per-ray basis functions sh_mult [N, basis_dim] (svox2.py:673-678):
    SH closed form, learned 3D texture (grid_sample of the unit sphere
    embedded in the basis cube, align_corners), or sigmoid(MLP(dir))."""
    if cfg.basis_type == "3d_texture" and grid.basis is not None:
        r = cfg.basis_reso
        # align_corners grid_sample: dir in [-1,1] -> texel [0, R-1]
        pos = jnp.clip((viewdirs + 1.0) * 0.5, 0.0, 1.0) * (r - 1)
        l = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, r - 2)
        f = pos - l
        out = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = (
                        (f[:, 0] if dx else 1 - f[:, 0])
                        * (f[:, 1] if dy else 1 - f[:, 1])
                        * (f[:, 2] if dz else 1 - f[:, 2])
                    )
                    out = out + w[:, None] * grid.basis[
                        l[:, 0] + dx, l[:, 1] + dy, l[:, 2] + dz]
        return out
    if cfg.basis_type == "mlp" and grid.basis is not None:
        h = viewdirs
        if cfg.mlp_posenc_size > 0:
            scales = 2.0 ** jnp.arange(cfg.mlp_posenc_size)
            ang = viewdirs[:, None, :] * scales[None, :, None]
            h = jnp.concatenate(
                [viewdirs,
                 jnp.sin(ang).reshape(viewdirs.shape[0], -1),
                 jnp.cos(ang).reshape(viewdirs.shape[0], -1)], axis=-1)
        for i in range(4):
            h = h @ grid.basis[f"w{i}"] + grid.basis[f"b{i}"]
            if i < 3:
                h = jax.nn.relu(h)
        return jax.nn.sigmoid(h)      # svox2.py:676
    return sh_encode(viewdirs, degree=int(np.sqrt(cfg.basis_dim)))


def init_voxel_grid(cfg: VoxelGridConfig) -> VoxelGrid:
    x, y, z = cfg.reso
    bg = None
    if cfg.background_nlayers > 0:
        r = cfg.background_reso
        bg = jnp.zeros((2 * r, r, cfg.background_nlayers, 4), jnp.float32)
        # opt.py:124: background_data[..., -1] = init_sigma_bg
        bg = bg.at[..., 3].set(cfg.init_sigma_bg)
    return VoxelGrid(
        density=jnp.full((x, y, z), cfg.init_sigma, jnp.float32),
        sh=jnp.zeros((x, y, z, 3 * cfg.basis_dim), jnp.float32),
        alive=jnp.ones((x, y, z), bool),
        background=bg,
        basis=init_basis(cfg),
    )


def world2grid(cfg: VoxelGridConfig, pts):
    """World -> grid coords (svox2.py:1501-1529 semantics: the grid spans
    center +- radius; voxel centers at integer coords 0..reso-1)."""
    reso = jnp.asarray(cfg.reso, jnp.float32)
    center = jnp.asarray(cfg.center)
    radius = jnp.asarray(cfg.radius)
    # normalized [-1,1] -> [0, reso] - 0.5
    scaling = 0.5 * reso / radius
    offset = 0.5 * reso - center * scaling
    return pts * scaling + offset - 0.5


def grid_scaling(cfg: VoxelGridConfig):
    reso = jnp.asarray(cfg.reso, jnp.float32)
    radius = jnp.asarray(cfg.radius)
    return 0.5 * reso / radius


def trilinear_sample(grid: VoxelGrid, pos, cfg: VoxelGridConfig):
    """Trilinear density + SH at grid-space positions [..., 3].

    Pruned (alive=False) cells contribute zero density and zero SH, the
    dense analog of links == -1 (svox2.py _fetch_links).
    """
    x, y, z = cfg.reso
    pos = jnp.clip(
        pos,
        jnp.zeros(3),
        jnp.asarray([x - 1.0, y - 1.0, z - 1.0]),
    )
    l = jnp.floor(pos).astype(jnp.int32)
    l = jnp.clip(l, 0, jnp.asarray([x - 2, y - 2, z - 2]))
    frac = pos - l

    density = jnp.where(grid.alive, grid.density, 0.0)
    sh = jnp.where(grid.alive[..., None], grid.sh, 0.0)

    def corner(dx, dy, dz):
        ix, iy, iz = l[..., 0] + dx, l[..., 1] + dy, l[..., 2] + dz
        w = (
            (frac[..., 0] if dx else 1 - frac[..., 0])
            * (frac[..., 1] if dy else 1 - frac[..., 1])
            * (frac[..., 2] if dz else 1 - frac[..., 2])
        )
        return w, density[ix, iy, iz], sh[ix, iy, iz]

    sig = 0.0
    shv = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w, s, c = corner(dx, dy, dz)
                sig = sig + w * s
                shv = shv + w[..., None] * c
    return sig, shv


def grid_ray_setup(cfg: VoxelGridConfig, rays_o, rays_d):
    """Grid-space ray setup shared by the XLA renderer, the Pallas block
    builder (ops/voxel_pallas._ray_geometry) and the weight splatter
    (max_weight_grid) — ONE source of truth so a marching fix cannot
    silently break kernel-vs-twin parity.

    Returns (origins, dirs, tmin, tmax, delta_scale, viewdirs): ``dirs``
    unit-length in grid space, ``tmax < tmin`` for rays that provably
    miss (axis-parallel rays starting outside that axis' slab — the
    reference python renderer skips this check; rays clamped into the
    box would otherwise sample the boundary voxels)."""
    origins = world2grid(cfg, rays_o)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dirs = viewdirs * grid_scaling(cfg)
    delta_scale = 1.0 / jnp.linalg.norm(dirs, axis=-1)
    dirs = dirs * delta_scale[..., None]   # unit-length in grid space

    gsz = jnp.asarray(cfg.reso, jnp.float32)
    parallel = jnp.abs(dirs) < 1e-9
    safe_dirs = jnp.where(parallel, 1e-9, dirs)
    invdirs = 1.0 / safe_dirs
    t1 = (-0.5 - origins) * invdirs
    t2 = (gsz - 0.5 - origins) * invdirs
    tmin = jnp.where(parallel, -1e9, jnp.minimum(t1, t2)).max(-1)
    tmin = jnp.maximum(tmin, cfg.near_clip)
    tmax = jnp.where(parallel, 1e9, jnp.maximum(t1, t2)).min(-1)
    inside_slab = (origins >= -0.5) & (origins <= gsz - 0.5)
    miss = jnp.any(parallel & ~inside_slab, axis=-1)
    tmax = jnp.where(miss, tmin - 1.0, tmax)
    return origins, dirs, tmin, tmax, delta_scale, viewdirs


def voxel_render_rays(
    grid: VoxelGrid,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    cfg: VoxelGridConfig,
):
    """Volume-render [N] rays against the grid (svox2.py:659-780 math,
    vectorized over a static max_steps sample budget).  cfg.backend picks
    the cuvol (trilerp), nvol (alpha-sum) or svox1 (nearest-neighbor DDA)
    RenderOptions variant."""
    if cfg.backend == "svox1":
        return _svox1_render(grid, rays_o, rays_d, cfg)
    n = rays_o.shape[0]
    origins, dirs, tmin, tmax, delta_scale, viewdirs = grid_ray_setup(
        cfg, rays_o, rays_d)
    sh_mult = eval_basis(grid, viewdirs, cfg)                          # [N, B]

    s = cfg.max_steps
    ts = tmin[:, None] + cfg.step_size * jnp.arange(s)[None, :]     # [N, S]
    valid = ts <= tmax[:, None]

    pos = origins[:, None, :] + ts[..., None] * dirs[:, None, :]    # [N, S, 3]
    sigma, shv = trilinear_sample(grid, pos, cfg)                    # [N,S],[N,S,27]
    sigma = jnp.where(valid, jax.nn.relu(sigma), 0.0)
    sigma = jnp.where(sigma >= cfg.sigma_thresh, sigma, 0.0)

    if cfg.backend == "nvol":
        # Neural-Volumes parameterization (render_lerp_kernel_nvol.cu:88-96):
        # alphas SUM (clamped at 1) instead of multiplying transmittances.
        a = 1.0 - jnp.exp(-cfg.step_size * sigma * delta_scale[:, None])
        total = jnp.clip(jnp.cumsum(a, -1), 0.0, 1.0)               # [N, S]
        prev = jnp.concatenate([jnp.zeros((n, 1)), total[:, :-1]], -1)
        weights = total - prev
        remaining = 1.0 - total[:, -1]
    else:  # cuvol
        log_att = -cfg.step_size * sigma * delta_scale[:, None]      # [N, S]
        # transmittance entering each sample
        log_T = jnp.concatenate(
            [jnp.zeros((n, 1)), jnp.cumsum(log_att[:, :-1], -1)], -1
        )
        weights = jnp.exp(log_T) * (1.0 - jnp.exp(log_att))          # [N, S]
        remaining = jnp.exp(jnp.sum(log_att, -1))

    rgb_sh = shv.reshape(n, s, 3, cfg.basis_dim)
    rgb = jnp.clip(
        jnp.sum(sh_mult[:, None, None, :] * rgb_sh, -1) + 0.5, 0.0, None
    )                                                                 # [N, S, 3]

    out_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    if grid.background is not None and cfg.background_nlayers > 0:
        world_step = cfg.step_size * delta_scale
        bg_rgb, bg_remaining = msi_background(
            grid.background, rays_o, viewdirs, remaining, world_step, cfg
        )
        out_rgb = out_rgb + bg_rgb
        out_rgb = out_rgb + bg_remaining[..., None] * cfg.background_brightness
    else:
        out_rgb = out_rgb + remaining[..., None] * cfg.background_brightness
    depth = jnp.sum(weights * ts, -1)
    return {"rgb": out_rgb, "depth": depth, "acc": 1.0 - remaining, "weights": weights}


def _svox1_render(grid: VoxelGrid, rays_o, rays_d, cfg: VoxelGridConfig):
    """Nearest-neighbor voxel rendering (render_svox1_kernel.cu:51-160):
    PlenOctree-style DDA that steps voxel boundary to voxel boundary with
    piecewise-constant density/SH.  A lax.scan carries (t, log-transmit);
    early-stop renormalizes by 1/(1-T) like the reference (:138-146)."""
    n = rays_o.shape[0]
    origins = world2grid(cfg, rays_o) + 0.5     # nn-vs-lerp offset (cu:76)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sh_mult = eval_basis(grid, viewdirs, cfg)

    dirs = viewdirs * grid_scaling(cfg)
    delta_scale = 1.0 / jnp.linalg.norm(dirs, axis=-1)
    dirs = dirs * delta_scale[..., None]
    gsz = jnp.asarray(cfg.reso, jnp.float32)

    zero_dir = dirs == 0.0
    invdir = jnp.where(zero_dir, 1e9, 1.0 / jnp.where(zero_dir, 1.0, dirs))
    t1 = (0.0 - origins) * invdir
    t2 = (gsz - 1.0 - origins) * invdir
    t0 = jnp.maximum(jnp.minimum(t1, t2).max(-1), 0.0)
    tmax = jnp.maximum(t1, t2).min(-1)
    miss = t0 > tmax

    density = jnp.where(grid.alive, grid.density, 0.0)
    sh = jnp.where(grid.alive[..., None], grid.sh, 0.0)
    reso_i = jnp.asarray(cfg.reso, jnp.int32)

    def body(carry, _):
        t, logT, rgb_acc, depth_acc, stop_scale, stopped = carry
        pos = jnp.clip(origins + t[:, None] * dirs, 0.0, gsz - 1.0)
        l = jnp.minimum(jnp.floor(pos).astype(jnp.int32), reso_i - 1)
        frac = pos - l

        # exit of the unit cell (cu:34-48 _intersect_aabb_unit, +1e-2)
        e1 = (0.0 - frac) * invdir
        e2 = (1.0 - frac) * invdir
        exit_t = jnp.where(zero_dir, 1e9, jnp.maximum(e1, e2)).min(-1)
        delta = exit_t + 1e-2

        alive_v = grid.alive[l[:, 0], l[:, 1], l[:, 2]]
        sigma = density[l[:, 0], l[:, 1], l[:, 2]]
        active = jnp.logical_and(~stopped, jnp.logical_and(t <= tmax, ~miss))
        contributing = active & alive_v & (sigma > cfg.sigma_thresh)

        log_tr = jnp.where(contributing, -delta * delta_scale * sigma, 0.0)
        T = jnp.exp(logT)
        w = jnp.where(contributing, T * (1.0 - jnp.exp(log_tr)), 0.0)

        shv = sh[l[:, 0], l[:, 1], l[:, 2]].reshape(n, 3, cfg.basis_dim)
        rgb_v = jnp.clip(jnp.sum(sh_mult[:, None, :] * shv, -1) + 0.5, 0.0, None)
        rgb_acc = rgb_acc + w[:, None] * rgb_v
        depth_acc = depth_acc + w * t

        new_logT = logT + log_tr
        # reference stop: T (entering this sample) <= stop_thresh ->
        # renormalize output by 1/(1-T) and return without background
        newly = contributing & (T <= cfg.stop_thresh) & ~stopped
        stop_scale = jnp.where(newly, 1.0 / jnp.maximum(1.0 - T, 1e-9),
                               stop_scale)
        stopped = stopped | newly
        t = jnp.where(active, t + delta, t)
        return (t, new_logT, rgb_acc, depth_acc, stop_scale, stopped), None

    init = (
        t0,
        jnp.zeros(n),
        jnp.zeros((n, 3)),
        jnp.zeros(n),
        jnp.ones(n),
        jnp.zeros(n, bool),
    )
    (t, logT, rgb_acc, depth_acc, stop_scale, stopped), _ = jax.lax.scan(
        body, init, None, length=cfg.max_steps
    )
    bg = jnp.where(stopped, 0.0, jnp.exp(logT)) * cfg.background_brightness
    out_rgb = rgb_acc * stop_scale[:, None] + bg[:, None]
    acc = jnp.where(stopped, 1.0, 1.0 - jnp.exp(logT))
    return {"rgb": out_rgb, "depth": depth_acc, "acc": acc}


def msi_background(bg, rays_o, viewdirs, remaining, world_step, cfg):
    """Multi-sphere-image background (render_lerp_kernel_cuvol.cu:385-475).

    bg [2R, R, L, 4] equirect layers (rgb, sigma); rays in world space with
    unit viewdirs; ``remaining`` = transmittance leaving the grid.  Returns
    (rgb [N, 3], transmittance after the background).
    """
    two_r, r, nlayers, _ = bg.shape
    n = rays_o.shape[0]
    n_steps = int(nlayers / cfg.step_size) + 2

    # concentric-sphere intersections: solve |o + t d| = r_i (far root)
    q2a = 2.0 * jnp.sum(viewdirs * viewdirs, -1)                    # [N]
    qb = 2.0 * jnp.sum(rays_o * viewdirs, -1)
    f = qb * qb - 2.0 * q2a * jnp.sum(rays_o * rays_o, -1)
    inner_radius = jnp.maximum(
        jnp.linalg.norm(jnp.cross(rays_o, viewdirs), axis=-1) + 1e-3, 1.0
    )                                                               # [N]

    i = jnp.arange(n_steps, dtype=jnp.float32)
    radii = n_steps / (n_steps - i - 0.5)                           # [S]
    det = f[:, None] + 2.0 * q2a[:, None] * radii[None, :] ** 2
    hit = (det >= 0) & (radii[None, :] >= inner_radius[:, None])
    t = (-qb[:, None] + jnp.sqrt(jnp.maximum(det, 0.0))) / q2a[:, None]

    p = rays_o[:, None, :] + t[..., None] * viewdirs[:, None, :]    # [N, S, 3]
    invr_mid = 1.0 / jnp.linalg.norm(p, axis=-1)                    # [N, S]
    u = p * invr_mid[..., None]
    # _unitvec2equirect (render_util.cuh:482-490)
    lat = jnp.arcsin(jnp.clip(u[..., 1], -1.0, 1.0))
    lon = jnp.arctan2(u[..., 0], u[..., 2])
    x = 2 * r * (0.5 + lon * 0.5 / jnp.pi)
    y = r * (0.5 - lat / jnp.pi)
    z = jnp.clip((1.0 - invr_mid) * nlayers - 0.5, 0.0, nlayers - 1.0)

    lx = jnp.minimum(jnp.floor(x).astype(jnp.int32), 2 * r - 1)
    ly = jnp.minimum(jnp.floor(y).astype(jnp.int32), r - 1)
    lz = jnp.minimum(jnp.floor(z).astype(jnp.int32), nlayers - 2)
    fx, fy, fz = x - lx, y - ly, z - lz
    # longitude wraps; the reference also wraps the last latitude row
    nx = jnp.where(lx < 2 * r - 1, lx + 1, 0)
    ny = jnp.where(ly < r - 1, ly + 1, 0)

    def fetch(ix, iy):
        v0 = bg[ix, iy, lz]                                         # [N, S, 4]
        v1 = bg[ix, iy, jnp.minimum(lz + 1, nlayers - 1)]
        return v0 + (v1 - v0) * fz[..., None]

    v00 = fetch(lx, ly)
    v01 = fetch(lx, ny)
    v10 = fetch(nx, ly)
    v11 = fetch(nx, ny)
    v0 = v00 + (v01 - v00) * fy[..., None]
    v1 = v10 + (v11 - v10) * fy[..., None]
    val = v0 + (v1 - v0) * fx[..., None]                            # [N, S, 4]

    sigma = jnp.where(hit, val[..., 3], 0.0)
    sigma = jnp.where(sigma > 0.0, sigma, 0.0)
    # pcnt = (invr_last - invr_mid) * world_step * sigma.  Misses only occur
    # before the first hit (radii grow monotonically), so carrying
    # 1/inner_radius through them reproduces the reference's invr_last chain.
    invr_safe = jnp.where(hit, invr_mid, 1.0 / inner_radius[:, None])
    invr_last = jnp.concatenate(
        [1.0 / inner_radius[:, None], invr_safe[:, :-1]], -1
    )
    pcnt = jnp.where(hit, (invr_last - invr_mid), 0.0) * world_step[:, None] * sigma
    log_T = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.cumsum(pcnt[:, :-1], -1)], -1
    )
    wgt = remaining[:, None] * jnp.exp(-log_T) * (1.0 - jnp.exp(-pcnt))
    c0 = 0.28209479177387814  # SH DC factor (render kernel's C0 scaling)
    rgb = jnp.clip(val[..., :3] * c0 + 0.5, 0.0, None)
    out = jnp.sum(wgt[..., None] * rgb, -2)
    t_after = remaining * jnp.exp(-jnp.sum(pcnt, -1))
    return out, t_after


# ---------------------------------------------------------------------------
# TV regularizers (loss_kernel.cu analog: dense diffs, fully vectorized)
# ---------------------------------------------------------------------------

def tv_loss(field: jnp.ndarray, alive: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Total variation of a [X,Y,Z] or [X,Y,Z,C] field, normalized per cell
    (svox2 tv semantics: mean of squared forward differences).

    ``alive`` applies svox2's SPARSE-TV rule (loss_kernel.cu tv_grad:
    links == -1 neighbors are skipped, not read as zero): a forward diff
    counts only when BOTH cells are alive.  Treating pruned neighbors as
    zero instead would add a (value - 0)^2 boundary term that drags
    exactly the surface voxels the render depends on toward zero."""
    if field.ndim == 3:
        field = field[..., None]
    dx = field[1:, :, :] - field[:-1, :, :]
    dy = field[:, 1:, :] - field[:, :-1, :]
    dz = field[:, :, 1:] - field[:, :, :-1]
    if alive is not None:
        dx = jnp.where((alive[1:, :, :] & alive[:-1, :, :])[..., None], dx, 0.0)
        dy = jnp.where((alive[:, 1:, :] & alive[:, :-1, :])[..., None], dy, 0.0)
        dz = jnp.where((alive[:, :, 1:] & alive[:, :, :-1])[..., None], dz, 0.0)
    n = field.shape[0] * field.shape[1] * field.shape[2]
    return (jnp.sum(dx ** 2) + jnp.sum(dy ** 2) + jnp.sum(dz ** 2)) / n


def tv_loss_slab(field: jnp.ndarray, key, slab: int,
                 alive: Optional[jnp.ndarray] = None,
                 transform=None) -> jnp.ndarray:
    """Stochastic TV — the ``tv_grad_sparse`` analog
    (plenoxels-ours/svox2/csrc/loss_kernel.cu:179), TPU-first.

    The reference samples a random subset of LINKS per step so 512^3
    training never pays a full-grid TV sweep.  Random-cell gathers are
    the wrong shape for TPU (the backward would be a huge scatter, CLAUDE.md:
    ~12M updates/s); instead this samples one random CONTIGUOUS z-slab of
    ``slab`` planes per step via ``dynamic_slice`` — unit-stride DMA
    forward, and the backward is a single ``dynamic_update_slice`` into a
    zero cotangent, no scatter at all.

    Exactly unbiased: a z0 ~ U[0, Z-slab] slab includes the dx/dy diffs
    of plane g with probability p_xy(g) and the dz diff between planes
    (g, g+1) with probability p_z(g); each included term is weighted by
    1/p so E_z0[estimate] == tv_loss(field) identically (pinned by
    tests/test_voxel_sh.py::test_tv_slab_unbiased).
    """
    if field.ndim == 3:
        field = field[..., None]
    X, Y, Z, C = field.shape
    S = int(min(slab, Z))
    n_starts = Z - S + 1
    z0 = jax.random.randint(key, (), 0, n_starts)
    sub = jax.lax.dynamic_slice(field, (0, 0, z0, 0), (X, Y, S, C))
    if transform is not None:
        # per-cell channel transform applied ONLY to the slab (e.g. the
        # lumisphere radiance contraction) — keeps the estimator
        # sub-sweep even when the penalized quantity is derived
        sub = transform(sub)
        C = sub.shape[-1]
    if alive is not None:
        sub_alive = jax.lax.dynamic_slice(alive, (0, 0, z0), (X, Y, S))
    # plane g's dx/dy diffs are in the slab iff z0 <= g <= z0+S-1:
    # p_xy(g) = #{valid z0} / n_starts = (min(g, Z-S) - max(0, g-S+1) + 1)/n
    g = z0 + jnp.arange(S)                                    # global planes
    p_xy = (jnp.minimum(g, Z - S) - jnp.maximum(0, g - S + 1)
            + 1.0) / n_starts
    # dz diff (g, g+1) needs both planes: z0 <= g and g+1 <= z0+S-1
    gz = g[:-1]
    p_z = (jnp.minimum(gz, Z - S) - jnp.maximum(0, gz - S + 2)
           + 1.0) / n_starts
    dx = sub[1:, :, :] - sub[:-1, :, :]
    dy = sub[:, 1:, :] - sub[:, :-1, :]
    dz = sub[:, :, 1:] - sub[:, :, :-1]
    if alive is not None:
        dx = jnp.where((sub_alive[1:] & sub_alive[:-1])[..., None], dx, 0.0)
        dy = jnp.where((sub_alive[:, 1:] & sub_alive[:, :-1])[..., None],
                       dy, 0.0)
        dz = jnp.where((sub_alive[:, :, 1:] & sub_alive[:, :, :-1])[..., None],
                       dz, 0.0)
    n = X * Y * Z
    tv_xy = jnp.sum(
        (jnp.sum(dx ** 2, axis=(0, 1, 3)) + jnp.sum(dy ** 2, axis=(0, 1, 3)))
        / p_xy)
    tv_z = jnp.sum(jnp.sum(dz ** 2, axis=(0, 1, 3)) / p_z)
    return (tv_xy + tv_z) / n


def tv_loss_lumisphere(grid: "VoxelGrid", cfg: "VoxelGridConfig", key,
                       slab: int, dir_factor: float = 0.0) -> jnp.ndarray:
    """Lumisphere TV (loss_kernel.cu:336 lumisphere_tv_grad_sparse
    analog): spatial TV of the view-DEPENDENT radiance — per cell, the
    RGB obtained by contracting its sh/basis coefficients with the basis
    functions at one random direction per step — rather than of the raw
    coefficients.  With a learned basis (3d_texture / mlp) coefficient
    TV under-penalizes radiance roughness wherever the basis has large
    magnitude; this is the regularizer the reference pairs with those
    basis types.  ``dir_factor`` adds the reference's angular term: the
    squared radiance change under a perturbed direction.

    Sampling: the reference draws a sparse random cell subset; here the
    spatial part rides the random-z-slab estimator (tv_loss_slab with a
    transform, unbiased, no scatter) and the contraction happens ONLY on
    the slab.  The direction is a fresh uniform unit vector per step."""
    kd, kz, kp, ka = jax.random.split(key, 4)
    u = jax.random.normal(kd, (3,))
    u = u / (jnp.linalg.norm(u) + 1e-9)
    bv = eval_basis(grid, u[None], cfg)[0]            # [basis_dim]
    bd = bv.shape[0]

    def radiance(sub, b=bv):
        sh = sub.reshape(sub.shape[:3] + (3, bd))
        return jnp.einsum("xyzcb,b->xyzc", sh, b)

    tv = tv_loss_slab(grid.sh, kz, slab, grid.alive, transform=radiance)
    if dir_factor > 0.0:
        u2 = u + 0.25 * jax.random.normal(kp, (3,))
        u2 = u2 / (jnp.linalg.norm(u2) + 1e-9)
        bv2 = eval_basis(grid, u2[None], cfg)[0]
        # angular term on the same random slab (du in the kernel)
        def ang(sub):
            return radiance(sub, bv2) - radiance(sub, bv)
        X, Y, Z = grid.sh.shape[:3]
        S = int(min(slab, Z))
        n_starts = Z - S + 1
        z0 = jax.random.randint(ka, (), 0, n_starts)
        sub = jax.lax.dynamic_slice(
            grid.sh, (0, 0, z0, 0), (X, Y, S, grid.sh.shape[3]))
        d = ang(sub)
        if grid.alive is not None:
            am = jax.lax.dynamic_slice(grid.alive, (0, 0, z0), (X, Y, S))
            d = jnp.where(am[..., None], d, 0.0)
        # same 1/p_xy inverse-inclusion weighting as tv_loss_slab:
        # without it the slab estimate's expectation scales with slab/Z
        # and a tuned dir_factor would not transfer across slab settings
        g = z0 + jnp.arange(S)
        p = (jnp.minimum(g, Z - S) - jnp.maximum(0, g - S + 1)
             + 1.0) / n_starts
        tv = tv + dir_factor * jnp.sum(
            jnp.sum(d ** 2, axis=(0, 1, 3)) / p) / (X * Y * Z)
    return tv


def compose_msi_background(bg, rgb_flatbg, log_t, rays_o, rays_d,
                           cfg: VoxelGridConfig):
    """Replace a render's flat background_brightness fill with the MSI
    background: ``rgb_flatbg`` [N,3] must already include
    exp(log_t)*background_brightness (the fused kernel's output), ``log_t``
    is the final log-transmittance.  Differentiable wrt everything."""
    remaining = jnp.exp(log_t)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    wstep = cfg.step_size / jnp.linalg.norm(
        viewdirs * grid_scaling(cfg), axis=-1)
    bg_rgb, bg_rem = msi_background(bg, rays_o, viewdirs, remaining, wstep,
                                    cfg)
    return (rgb_flatbg - remaining[:, None] * cfg.background_brightness
            + bg_rgb + bg_rem[:, None] * cfg.background_brightness)


def tv_loss_background(bg: jnp.ndarray, scaling_color: float = 1.0,
                       scaling_density: float = 1.0) -> jnp.ndarray:
    """TV of the MSI background (loss_kernel.cu:249 msi_tv_grad analog):
    squared forward diffs over the equirect (lon, lat) axes per layer, with
    longitude wraparound; color channels scaled by ``scaling_color``, the
    sigma channel by ``scaling_density``; normalized per cell."""
    dx = jnp.roll(bg, -1, axis=0) - bg          # lon wraps
    dy = bg[:, 1:] - bg[:, :-1]
    n = bg.shape[0] * bg.shape[1] * bg.shape[2]
    tv_c = (jnp.sum(dx[..., :3] ** 2) + jnp.sum(dy[..., :3] ** 2)) / n
    tv_d = (jnp.sum(dx[..., 3] ** 2) + jnp.sum(dy[..., 3] ** 2)) / n
    return scaling_color * tv_c + scaling_density * tv_d


def _dilate2d(mask: jnp.ndarray) -> jnp.ndarray:
    """8-neighborhood dilation on a [W, H] bool mask, longitude wrapping."""
    m = mask
    m = m | jnp.roll(mask, 1, 0) | jnp.roll(mask, -1, 0)
    my = jnp.pad(m, ((0, 0), (1, 1)))
    return m | my[:, 2:] | my[:, :-2]


def sparsify_background(bg: jnp.ndarray, sigma_thresh: float = 1.0,
                        dilate: int = 1):
    """Dense analog of svox2.py:1431 sparsify_background: cells whose sigma
    stays below ``sigma_thresh`` in EVERY layer (after 2-D dilation of the
    keep mask) are emptied.  The reference sets background_links=-1 and drops
    the rows; the dense TPU grid zeroes them and returns the [2R, R] alive
    mask so the trainer can pin them (grads masked, never revived)."""
    keep = jnp.any(bg[..., 3] >= sigma_thresh, axis=-1)          # [2R, R]
    for _ in range(int(dilate)):
        keep = _dilate2d(keep)
    return jnp.where(keep[:, :, None, None], bg, 0.0), keep


# ---------------------------------------------------------------------------
# resample / prune (svox2.py:1224+)
# ---------------------------------------------------------------------------

def upsample_grid(grid: VoxelGrid, new_reso: Tuple[int, int, int]) -> VoxelGrid:
    """Trilinear upsample (grid.resample's resize step).  The voxel-space
    fields resize; background/basis live in their own spaces and carry
    through unchanged (dropping them would silently fall back to the
    flat background / closed-form SH on the next render)."""
    density = jax.image.resize(grid.density, new_reso, "trilinear")
    sh = jax.image.resize(grid.sh, new_reso + (grid.sh.shape[-1],), "trilinear")
    alive = (
        jax.image.resize(grid.alive.astype(jnp.float32), new_reso, "trilinear") > 0.0
    )
    return VoxelGrid(density, sh, alive, grid.background, grid.basis)


def max_weight_grid(grid: VoxelGrid, cfg: VoxelGridConfig, poses, H, W, K,
                    stride: int = 2) -> jnp.ndarray:
    """Per-voxel max ray weight over training cameras (misc_kernel.cu:310
    grid_weight_render analog): marches every stride-th pixel of each camera
    and scatter-maxes the sample weights onto the sample voxels.  Used by
    weight-threshold pruning, which (unlike sigma-threshold pruning) also
    removes occluded interior cells."""
    from flnerf_tpu.rays.camera import get_rays

    if cfg.backend == "svox1":
        raise ValueError(
            "max_weight_grid/weight_prune_grid needs the sample-weight "
            "marching backends ('cuvol'/'nvol'); svox1's nearest-voxel "
            "DDA exposes no per-sample weights and steps on different "
            "positions — use sigma-threshold prune_grid instead")
    maxw = jnp.zeros(cfg.reso, jnp.float32)

    @jax.jit
    def one_cam(maxw, c2w):
        ro, rd = get_rays(H, W, K, c2w)
        ro = ro[::stride, ::stride].reshape(-1, 3)
        rd = rd[::stride, ::stride].reshape(-1, 3)
        out = voxel_render_rays(grid, ro, rd, cfg)
        w = out["weights"]                                   # [N, S]
        # recompute sample positions with the renderer's OWN ray setup
        # (shared helper: the positions match voxel_render_rays exactly)
        origins, dirs, tmin, _, _, _ = grid_ray_setup(cfg, ro, rd)
        gsz = jnp.asarray(cfg.reso, jnp.float32)
        ts = tmin[:, None] + cfg.step_size * jnp.arange(cfg.max_steps)[None, :]
        pos = origins[:, None, :] + ts[..., None] * dirs[:, None, :]
        pos = jnp.clip(pos, 0.0, gsz - 1.0)
        l = jnp.clip(jnp.floor(pos), 0.0, gsz - 2.0).astype(jnp.int32)
        # splat the weight onto the nearest corner (the kernel accumulates
        # per-sample max at the sample's cell)
        ln = (l + (pos - l > 0.5)).astype(jnp.int32)
        flat = (ln[..., 0] * cfg.reso[1] + ln[..., 1]) * cfg.reso[2] + ln[..., 2]
        upd = jnp.zeros(int(np.prod(cfg.reso)), jnp.float32)
        upd = upd.at[flat.reshape(-1)].max(w.reshape(-1))
        return jnp.maximum(maxw, upd.reshape(cfg.reso))

    for p_i in poses:
        maxw = one_cam(maxw, jnp.asarray(p_i)[:3, :4])
    return maxw


def weight_prune_grid(grid: VoxelGrid, cfg: VoxelGridConfig, poses, H, W, K,
                      weight_thresh: float = 0.0256, dilate: int = 2,
                      stride: int = 2) -> VoxelGrid:
    """Max-weight camera pruning (svox2.py:1224+ resample with
    use_weight_thresh; threshold default = RenderOptions' 0.0256)."""
    maxw = max_weight_grid(grid, cfg, poses, H, W, K, stride)
    keep = maxw >= weight_thresh
    for _ in range(dilate):
        k = keep
        k = k | jnp.roll(keep, 1, 0) | jnp.roll(keep, -1, 0)
        k = k | jnp.roll(keep, 1, 1) | jnp.roll(keep, -1, 1)
        k = k | jnp.roll(keep, 1, 2) | jnp.roll(keep, -1, 2)
        keep = k
    return grid._replace(alive=grid.alive & keep)


def prune_grid(grid: VoxelGrid, sigma_thresh: float = 5.0, dilate: int = 2) -> VoxelGrid:
    """Weight/threshold pruning with morphological dilation
    (svox2.py:1224-1430 resample's sigma-threshold + misc_kernel.cu dilate)."""
    keep = grid.density > sigma_thresh
    for _ in range(dilate):
        k = keep
        k = k | jnp.roll(keep, 1, 0) | jnp.roll(keep, -1, 0)
        k = k | jnp.roll(keep, 1, 1) | jnp.roll(keep, -1, 1)
        k = k | jnp.roll(keep, 1, 2) | jnp.roll(keep, -1, 2)
        keep = k
    return grid._replace(alive=grid.alive & keep)


# ---------------------------------------------------------------------------
# npz checkpoint parity (svox2.py:1531-1633)
# ---------------------------------------------------------------------------

def save_npz(path: str, grid: VoxelGrid, cfg: VoxelGridConfig) -> None:
    """Write the reference's ckpt.npz field layout (links + packed data)."""
    alive = np.asarray(grid.alive)
    n_alive = int(alive.sum())
    links = np.full(alive.shape, -1, np.int32)
    links[alive] = np.arange(n_alive, dtype=np.int32)
    density_data = np.asarray(grid.density)[alive][:, None].astype(np.float32)
    sh_data = np.asarray(grid.sh)[alive].astype(np.float16)
    extra = {}
    if grid.background is not None:
        # svox2.py:1531-1558 saves background_links [2R, R] + background_data
        # [cap, nlayers, 4]; our dense bg flattens to that layout exactly
        two_r, r, nlayers, _ = grid.background.shape
        extra["background_links"] = np.arange(
            two_r * r, dtype=np.int32).reshape(two_r, r)
        extra["background_data"] = np.asarray(
            grid.background).reshape(two_r * r, nlayers, 4).astype(np.float16)
    # svox2.py:1543-1553 basis serialization: 1=SH, 4=3D texture (raw
    # basis_data array), 255=MLP (net_to_dict keys pt__basis_mlp__{i}__*,
    # torch Linear layout: weight [out, in])
    basis_type = 1
    if cfg.basis_type == "3d_texture" and grid.basis is not None:
        basis_type = 4
        extra["basis_data"] = np.asarray(grid.basis, np.float32)
    elif cfg.basis_type == "mlp" and grid.basis is not None:
        basis_type = 255
        for i in range(4):
            seq = 2 * i      # nn.Sequential child index (ReLU between)
            extra[f"pt__basis_mlp__{seq}__weight"] = np.asarray(
                grid.basis[f"w{i}"], np.float32).T
            extra[f"pt__basis_mlp__{seq}__bias"] = np.asarray(
                grid.basis[f"b{i}"], np.float32)
        extra["mlp_posenc_size"] = np.int64(cfg.mlp_posenc_size)
        extra["mlp_width"] = np.int64(cfg.mlp_width)
    np.savez(
        path,
        radius=np.asarray(cfg.radius, np.float32),
        center=np.asarray(cfg.center, np.float32),
        links=links,
        density_data=density_data,
        sh_data=sh_data,
        basis_type=basis_type,
        **extra,
    )


def load_npz(path: str) -> Tuple[VoxelGrid, VoxelGridConfig]:
    """Load a reference-format npz (ours or svox2's own)."""
    z = np.load(path)
    links = z["links"]
    alive = links >= 0
    density = np.zeros(links.shape, np.float32)
    sh = np.zeros(links.shape + (z["sh_data"].shape[-1],), np.float32)
    density[alive] = z["density_data"][:, 0][links[alive]]
    sh[alive] = z["sh_data"].astype(np.float32)[links[alive]]
    background = None
    bg_nlayers, bg_reso = 0, 512
    if "background_data" in z and z["background_data"].size:
        bl = z["background_links"]
        bd = z["background_data"].astype(np.float32)
        two_r, r = bl.shape
        background = np.zeros((two_r, r) + bd.shape[1:], np.float32)
        ok = bl >= 0
        background[ok] = bd[bl[ok]]
        bg_nlayers, bg_reso = bd.shape[1], r
    basis = None
    basis_type = "sh"
    basis_reso, mlp_posenc, mlp_width = 32, 4, 32
    bt = int(z["basis_type"]) if "basis_type" in z else 1
    if bt == 4 and "basis_data" in z:
        basis_type = "3d_texture"
        basis = jnp.asarray(z["basis_data"].astype(np.float32))
        basis_reso = basis.shape[0]
    elif bt == 255:
        basis_type = "mlp"
        basis = {}
        for i in range(4):
            w = z[f"pt__basis_mlp__{2 * i}__weight"].astype(np.float32)
            basis[f"w{i}"] = jnp.asarray(w.T)
            basis[f"b{i}"] = jnp.asarray(
                z[f"pt__basis_mlp__{2 * i}__bias"].astype(np.float32))
        mlp_width = basis["w0"].shape[1]
        mlp_posenc = (basis["w0"].shape[0] - 3) // 6

    cfg = VoxelGridConfig(
        reso=tuple(int(v) for v in links.shape),
        basis_dim=sh.shape[-1] // 3,
        radius=tuple(float(v) for v in np.atleast_1d(z["radius"])[:3])
        if np.atleast_1d(z["radius"]).size >= 3
        else (float(z["radius"]),) * 3,
        center=tuple(float(v) for v in np.atleast_1d(z["center"])[:3]),
        background_nlayers=bg_nlayers,
        background_reso=bg_reso,
        basis_type=basis_type,
        basis_reso=basis_reso,
        mlp_posenc_size=mlp_posenc,
        mlp_width=mlp_width,
    )
    return (
        VoxelGrid(
            jnp.asarray(density), jnp.asarray(sh), jnp.asarray(alive),
            jnp.asarray(background) if background is not None else None,
            basis=basis,
        ),
        cfg,
    )
