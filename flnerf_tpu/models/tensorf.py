"""TensoRF field backend: vector-matrix (VM) decomposition.

Parity target: ngp-ours/tensoRF/network.py:13-283 —
  * sigma_mat/sigma_vec, color_mat/color_vec: per-axis plane [R, H, W] and
    line [R, D] factors (mat_ids [[0,1],[0,2],[1,2]], vec_ids [2,1,0]),
    init N(0, 0.1) (:99-109);
  * sigma = trunc_exp(sum_i sum_r plane_i_r(x_mat) * line_i_r(x_vec)) (:165);
  * color_feat = basis_mat @ concat_i(plane*line) [3R -> 27] (:151-155);
  * rgb = sigmoid(MLP(freq(color_feat, 2) ++ freq(d, 2))), 3 x 128 bias-free;
  * L1 density regularizer (:259), bilinear upsample (:266-277).
  * grid_sample(align_corners=True) bilinear/linear factor sampling.

Exposes the (init_fn, density_fn, rgb_fn) field protocol, so the occupancy
marcher + trainer from the NGP backend drive it unchanged (the reference
likewise reuses NeRFRenderer).  density_fn returns the color feature as the
"geo" payload.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.models.hash_ngp import mlp_chain
from flnerf_tpu.models.nerf_mlp import embed_fn, embedder_out_dim
from flnerf_tpu.ops.activations import trunc_exp

Params = Dict[str, Any]

_MAT_IDS = ((0, 1), (0, 2), (1, 2))
_VEC_IDS = (2, 1, 0)


class TensoRFConfig(NamedTuple):
    resolution: Tuple[int, int, int] = (128, 128, 128)
    sigma_rank: Tuple[int, int, int] = (16, 16, 16)
    color_rank: Tuple[int, int, int] = (48, 48, 48)
    color_feat_dim: int = 27
    num_layers: int = 3
    hidden_dim: int = 128
    feat_multires: int = 2
    dir_multires: int = 2
    bound: float = 1.0
    l1_reg_weight: float = 1e-4   # tensoRF/utils.py:46
    # training AABB (xyz_min + xyz_max); None = the [-bound, bound] cube.
    # shrink_tensorf tightens it from occupancy stats (network.py:283
    # shrink_model: aabb_train starts as the bound cube and shrinks).
    aabb: Tuple[float, ...] = None


def init_tensorf(key, cfg: TensoRFConfig) -> Params:
    # 12 factor tables + basis + one per net layer (a fixed 16 raised
    # StopIteration for num_layers > 3)
    keys = jax.random.split(key, 13 + cfg.num_layers)
    k = iter(keys)

    def svd(ranks):
        mats, vecs = [], []
        for i in range(3):
            m0, m1 = _MAT_IDS[i]
            v = _VEC_IDS[i]
            mats.append(
                0.1 * jax.random.normal(
                    next(k), (ranks[i], cfg.resolution[m1], cfg.resolution[m0])
                )
            )
            vecs.append(0.1 * jax.random.normal(next(k), (ranks[i], cfg.resolution[v])))
        return mats, vecs

    sigma_mat, sigma_vec = svd(cfg.sigma_rank)
    color_mat, color_vec = svd(cfg.color_rank)
    basis = jax.random.uniform(
        next(k), (sum(cfg.color_rank), cfg.color_feat_dim), jnp.float32,
        -1.0 / np.sqrt(sum(cfg.color_rank)), 1.0 / np.sqrt(sum(cfg.color_rank)),
    )

    in_dim = embedder_out_dim(cfg.feat_multires, cfg.color_feat_dim) + embedder_out_dim(
        cfg.dir_multires, 3
    )
    color_net = []
    dim = in_dim
    for l in range(cfg.num_layers):
        out = 3 if l == cfg.num_layers - 1 else cfg.hidden_dim
        bound = 1.0 / np.sqrt(dim)
        color_net.append(
            jax.random.uniform(next(k), (dim, out), jnp.float32, -bound, bound)
        )
        dim = out

    return {
        "sigma_mat": sigma_mat, "sigma_vec": sigma_vec,
        "color_mat": color_mat, "color_vec": color_vec,
        "basis": basis, "color_net": color_net,
    }


def _sample_plane(plane: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of [R, H, W] at normalized coords (u->W, v->H) in
    [-1,1], grid_sample(align_corners=True) semantics. Returns [R, N]."""
    R, H, W = plane.shape
    x = (u + 1.0) * 0.5 * (W - 1)
    y = (v + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    flat = plane.reshape(R, H * W)
    def g(yy, xx):
        return flat[:, yy * W + xx]                        # [R, N]
    return (
        g(y0, x0) * ((1 - fy) * (1 - fx))
        + g(y0, x0 + 1) * ((1 - fy) * fx)
        + g(y0 + 1, x0) * (fy * (1 - fx))
        + g(y0 + 1, x0 + 1) * (fy * fx)
    )


def _sample_line(line: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Linear sample of [R, D] at coords in [-1,1]; returns [R, N]."""
    R, D = line.shape
    x = (t + 1.0) * 0.5 * (D - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, D - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    return line[:, x0] * (1 - fx) + line[:, x0 + 1] * fx


def _vm_features(mats, vecs, x01: jnp.ndarray) -> jnp.ndarray:
    """x01 in [-1,1]^3 -> concat_i(plane_i * line_i) [sum(R), N]."""
    feats = []
    for i in range(3):
        m0, m1 = _MAT_IDS[i]
        v = _VEC_IDS[i]
        pf = _sample_plane(mats[i], x01[:, m0], x01[:, m1])
        lf = _sample_line(vecs[i], x01[:, v])
        feats.append(pf * lf)
    return jnp.concatenate(feats, axis=0)


def make_tensorf_field(cfg: TensoRFConfig, compute_dtype=jnp.bfloat16):
    """(init_fn, density_fn, rgb_fn) — NGP field protocol; geo payload is
    the 27-dim color feature."""

    def init_fn(key):
        return init_tensorf(key, cfg)

    def density_fn(params, x):
        sh = x.shape[:-1]
        x01 = jnp.clip(norm_coords(x.reshape(-1, 3), cfg), -1.0, 1.0)
        sig_feat = jnp.sum(_vm_features(params["sigma_mat"], params["sigma_vec"], x01), 0)
        sigma = trunc_exp(sig_feat)
        col = _vm_features(params["color_mat"], params["color_vec"], x01)  # [3R, N]
        color_feat = jax.lax.dot_general(
            col.T.astype(compute_dtype), params["basis"].astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                                   # [N, 27]
        return sigma.reshape(sh), color_feat.reshape(*sh, cfg.color_feat_dim)

    def rgb_fn(params, d, color_feat):
        sh = d.shape[:-1]
        ef = embed_fn(color_feat.reshape(-1, cfg.color_feat_dim), cfg.feat_multires)
        ed = embed_fn(d.reshape(-1, 3), cfg.dir_multires)
        h = mlp_chain(jnp.concatenate([ef, ed], -1),
                      params["color_net"], compute_dtype)
        return jax.nn.sigmoid(h).reshape(*sh, 3)

    return init_fn, density_fn, rgb_fn


def norm_coords(x: jnp.ndarray, cfg) -> jnp.ndarray:
    """World -> [-1, 1]^3 factor coordinates over the training AABB
    (network.py:147: (x - aabb[:3]) / (aabb[3:] - aabb[:3]) rescaled)."""
    if cfg.aabb is None:
        return x / cfg.bound
    amin = jnp.asarray(cfg.aabb[:3], jnp.float32)
    amax = jnp.asarray(cfg.aabb[3:], jnp.float32)
    return 2.0 * (x - amin) / (amax - amin) - 1.0


def density_l1_loss(params: Params) -> jnp.ndarray:
    """L1 sparsity penalty on the sigma factors (network.py:259)."""
    loss = 0.0
    for m in params["sigma_mat"]:
        loss = loss + jnp.mean(jnp.abs(m))
    for v in params["sigma_vec"]:
        loss = loss + jnp.mean(jnp.abs(v))
    return loss


def _resize_align_corners(a, new_shape):
    """Linear resize with align_corners=True node positions —
    F.interpolate(..., align_corners=True) parity (network.py:266-277).
    jax.image.resize uses half-pixel centers, which SHIFTS the
    represented field relative to the align-corners samplers
    (_sample_plane/_sample_line), defeating the warm start."""
    from jax.scipy.ndimage import map_coordinates

    coords = jnp.meshgrid(
        *[jnp.linspace(0.0, so - 1.0, sn) if sn != so
          else jnp.arange(so, dtype=jnp.float32)
          for so, sn in zip(a.shape, new_shape)],
        indexing="ij",
    )
    return map_coordinates(a, coords, order=1)


def upsample_tensorf(params: Params, cfg: TensoRFConfig, new_resolution) -> Tuple[Params, TensoRFConfig]:
    """Bilinear factor upsampling (network.py:266-277)."""
    new = dict(params)

    def up(mats, vecs):
        out_m, out_v = [], []
        for i in range(3):
            m0, m1 = _MAT_IDS[i]
            v = _VEC_IDS[i]
            R = mats[i].shape[0]
            out_m.append(_resize_align_corners(
                mats[i], (R, new_resolution[m1], new_resolution[m0])))
            out_v.append(_resize_align_corners(
                vecs[i], (R, new_resolution[v])))
        return out_m, out_v

    new["sigma_mat"], new["sigma_vec"] = up(params["sigma_mat"], params["sigma_vec"])
    new["color_mat"], new["color_vec"] = up(params["color_mat"], params["color_vec"])
    return new, cfg._replace(resolution=tuple(new_resolution))


def shrink_tensorf(
    params: Params,
    cfg: TensoRFConfig,
    occ_density: np.ndarray,
    mean_density: float,
    grid_bound: float,
    density_thresh: float = 0.01,
) -> Tuple[Params, TensoRFConfig]:
    """AABB shrink from occupancy stats (network.py:283-319 shrink_model):
    the occupied cells of the density grid give a tight world AABB; the
    VM factor planes/lines are SLICED to the matching index windows and
    the config's training aabb is replaced.  Host-side numpy (a deliberate
    recompile boundary, like upsample — SURVEY §7.4 hard part 4)."""
    g = occ_density.shape[0]
    dens = np.asarray(occ_density)
    thresh = min(density_thresh, float(mean_density))
    valid = np.argwhere(dens > thresh)
    if valid.size == 0:
        return params, cfg
    half = grid_bound / g
    pos = (2.0 * valid / (g - 1) - 1.0) * (grid_bound - half)
    min_pos = pos.min(0) - half
    max_pos = pos.max(0) + half

    aabb = cfg.aabb if cfg.aabb is not None else (
        (-cfg.bound,) * 3 + (cfg.bound,) * 3)
    amin = np.asarray(aabb[:3], np.float64)
    amax = np.asarray(aabb[3:], np.float64)
    min_pos = np.maximum(min_pos, amin)
    max_pos = np.minimum(max_pos, amax)
    reso = np.asarray(cfg.resolution)
    units = (amax - amin) / reso
    tl = np.clip(np.round((min_pos - amin) / units).astype(np.int64), 0, None)
    br = np.minimum(np.round((max_pos - amin) / units).astype(np.int64), reso)
    br = np.maximum(br, tl + 1)

    new = dict(params)

    def shrink(mats, vecs):
        out_m, out_v = [], []
        for i in range(3):
            m0, m1 = _MAT_IDS[i]
            v = _VEC_IDS[i]
            out_m.append(jnp.asarray(
                np.asarray(mats[i])[:, tl[m1]:br[m1], tl[m0]:br[m0]]))
            out_v.append(jnp.asarray(np.asarray(vecs[i])[:, tl[v]:br[v]]))
        return out_m, out_v

    new["sigma_mat"], new["sigma_vec"] = shrink(
        params["sigma_mat"], params["sigma_vec"])
    new["color_mat"], new["color_vec"] = shrink(
        params["color_mat"], params["color_vec"])
    return new, cfg._replace(
        resolution=tuple(int(b - t) for t, b in zip(tl, br)),
        aabb=tuple(float(v) for v in min_pos) + tuple(float(v) for v in max_pos),
    )
