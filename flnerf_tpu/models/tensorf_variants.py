"""TensoRF variants: CP decomposition and CCNeRF rank-residual composition.

Parity targets:
  * CP (ngp-ours/tensoRF/network_cp.py): pure line factorization —
    sigma = trunc_exp(sum_r prod_axis line_axis[r](x_axis)); color features
    likewise from line products through the basis matmul.
  * CCNeRF (ngp-ours/tensoRF/network_cc.py:14-128): ranks are partitioned
    into K residual groups (rank_vec/rank_mat prefix lists, np.diff groups,
    :50-53); evaluating at truncation level k uses only the first k groups'
    ranks, so one trained model composes at K quality levels; training
    supervises a random truncation level per step (rank-residual training).

Both reuse the TensoRF color head and plug into the occupancy-marching NGP
trainer via the field protocol.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.models.hash_ngp import mlp_chain
from flnerf_tpu.models.nerf_mlp import embed_fn, embedder_out_dim
from flnerf_tpu.models.tensorf import (
    TensoRFConfig,
    _MAT_IDS,
    _VEC_IDS,
    _sample_line,
    _sample_plane,
)
from flnerf_tpu.ops.activations import trunc_exp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# CP decomposition
# ---------------------------------------------------------------------------

class CPConfig(NamedTuple):
    resolution: Tuple[int, int, int] = (256, 256, 256)
    sigma_rank: int = 32
    color_rank: int = 32
    color_feat_dim: int = 27
    num_layers: int = 3
    hidden_dim: int = 128
    feat_multires: int = 2
    dir_multires: int = 2
    bound: float = 1.0


def init_cp(key, cfg: CPConfig) -> Params:
    keys = jax.random.split(key, 7 + cfg.num_layers)
    k = iter(keys)

    def lines(rank):
        return [
            0.2 * jax.random.normal(next(k), (rank, cfg.resolution[ax]))
            for ax in range(3)
        ]

    params: Params = {
        "sigma_lines": lines(cfg.sigma_rank),
        "color_lines": lines(cfg.color_rank),
    }
    bnd = 1.0 / np.sqrt(cfg.color_rank)
    params["basis"] = jax.random.uniform(
        next(k), (cfg.color_rank, cfg.color_feat_dim), jnp.float32, -bnd, bnd
    )
    in_dim = embedder_out_dim(cfg.feat_multires, cfg.color_feat_dim) + embedder_out_dim(
        cfg.dir_multires, 3
    )
    net = []
    dim = in_dim
    for l in range(cfg.num_layers):
        out = 3 if l == cfg.num_layers - 1 else cfg.hidden_dim
        b = 1.0 / np.sqrt(dim)
        net.append(jax.random.uniform(next(k), (dim, out), jnp.float32, -b, b))
        dim = out
    params["color_net"] = net
    return params


def _cp_features(lines, x01):
    """prod over axes of per-axis line samples -> [R, N]."""
    f = _sample_line(lines[0], x01[:, 0])
    f = f * _sample_line(lines[1], x01[:, 1])
    f = f * _sample_line(lines[2], x01[:, 2])
    return f


def make_cp_field(cfg: CPConfig, compute_dtype=jnp.bfloat16):
    def init_fn(key):
        return init_cp(key, cfg)

    def density_fn(params, x):
        sh = x.shape[:-1]
        x01 = jnp.clip(x.reshape(-1, 3) / cfg.bound, -1.0, 1.0)
        sigma = trunc_exp(jnp.sum(_cp_features(params["sigma_lines"], x01), 0))
        col = _cp_features(params["color_lines"], x01)          # [R, N]
        feat = jax.lax.dot_general(
            col.T.astype(compute_dtype), params["basis"].astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return sigma.reshape(sh), feat.reshape(*sh, cfg.color_feat_dim)

    def rgb_fn(params, d, feat):
        sh = d.shape[:-1]
        h = _ccnerf_color_logits(params, d, feat, cfg, compute_dtype)
        return jax.nn.sigmoid(h).reshape(*sh, 3)

    return init_fn, density_fn, rgb_fn


# ---------------------------------------------------------------------------
# CCNeRF rank-residual composition
# ---------------------------------------------------------------------------

class CCNeRFConfig(NamedTuple):
    resolution: Tuple[int, int, int] = (128, 128, 128)
    # prefix rank lists (network_cc.py:21-24 style); level k uses ranks[:k]
    rank_vec_density: Tuple[int, ...] = (16, 32, 48)
    rank_mat_density: Tuple[int, ...] = (4, 8, 12)
    rank_vec: Tuple[int, ...] = (16, 32, 48)
    rank_mat: Tuple[int, ...] = (4, 8, 12)
    color_feat_dim: int = 27
    num_layers: int = 3
    hidden_dim: int = 64
    feat_multires: int = 2
    dir_multires: int = 2
    bound: float = 1.0

    @property
    def K(self) -> int:
        return len(self.rank_vec)


def init_ccnerf(key, cfg: CCNeRFConfig) -> Params:
    keys = jax.random.split(key, 19 + cfg.num_layers)
    k = iter(keys)
    R_vd, R_md = cfg.rank_vec_density[-1], cfg.rank_mat_density[-1]
    R_v, R_m = cfg.rank_vec[-1], cfg.rank_mat[-1]

    def svd(r_mat, r_vec):
        mats, mat_lines, vecs = [], [], []
        for i in range(3):
            m0, m1 = _MAT_IDS[i]
            v = _VEC_IDS[i]
            mats.append(
                0.2 * jax.random.normal(
                    next(k), (r_mat, cfg.resolution[m1], cfg.resolution[m0])
                )
            )
            mat_lines.append(0.2 * jax.random.normal(next(k), (r_mat, cfg.resolution[v])))
            vecs.append(0.2 * jax.random.normal(next(k), (r_vec, cfg.resolution[v])))
        return mats, mat_lines, vecs

    params: Params = {}
    params["sigma_mat"], params["sigma_mat_line"], params["sigma_vec"] = svd(R_md, R_vd)
    params["color_mat"], params["color_mat_line"], params["color_vec"] = svd(R_m, R_v)
    # density S scales (network_cc.py:69-71: ones init) — the density
    # analog of the color basis matrix
    params["sigma_vec_scale"] = jnp.ones((R_vd,), jnp.float32)
    params["sigma_mat_scale"] = [jnp.ones((R_md,), jnp.float32)
                                 for _ in range(3)]
    # CP ranks contribute ONE product feature each (not one per axis)
    total = R_v + 3 * R_m
    bnd = 1.0 / np.sqrt(total)
    params["basis"] = jax.random.uniform(
        next(k), (total, cfg.color_feat_dim), jnp.float32, -bnd, bnd
    )
    in_dim = embedder_out_dim(cfg.feat_multires, cfg.color_feat_dim) + embedder_out_dim(
        cfg.dir_multires, 3
    )
    net = []
    dim = in_dim
    for l in range(cfg.num_layers):
        out = 3 if l == cfg.num_layers - 1 else cfg.hidden_dim
        b = 1.0 / np.sqrt(dim)
        net.append(jax.random.uniform(next(k), (dim, out), jnp.float32, -b, b))
        dim = out
    params["color_net"] = net
    return params


def _rank_mask(total: int, active: int):
    """[total] 0/1 mask keeping the first ``active`` ranks (truncation is a
    static python int so each level compiles once)."""
    return (jnp.arange(total) < active).astype(jnp.float32)


def ccnerf_density(params: Params, x, cfg: CCNeRFConfig, level: int,
                   compute_dtype=jnp.bfloat16):
    """Density + color feature at truncation ``level`` (1..K): only the
    first rank_*[level-1] ranks contribute (compute_features, :128-160)."""
    level = int(level)
    sh = x.shape[:-1]
    x01 = jnp.clip(x.reshape(-1, 3) / cfg.bound, -1.0, 1.0)

    mvd = _rank_mask(cfg.rank_vec_density[-1], cfg.rank_vec_density[level - 1])
    mmd = _rank_mask(cfg.rank_mat_density[-1], cfg.rank_mat_density[level - 1])
    # pure-vector (CP) ranks: PRODUCT of the three per-axis line factors
    # per rank (network_cc.py:158-160 multiplies the three grid_samples)
    # — a per-axis sum could only represent f(x)+g(y)+h(z) — scaled by
    # the learned ones-init S vector (network_cc.py:69-71,162)
    vfd = (_sample_line(params["sigma_vec"][0], x01[:, _VEC_IDS[0]])
           * _sample_line(params["sigma_vec"][1], x01[:, _VEC_IDS[1]])
           * _sample_line(params["sigma_vec"][2], x01[:, _VEC_IDS[2]]))
    sig = jnp.sum(params["sigma_vec_scale"][:, None] * vfd * mvd[:, None], 0)
    for i in range(3):
        m0, m1 = _MAT_IDS[i]
        v = _VEC_IDS[i]
        # plane x line components
        pf = _sample_plane(params["sigma_mat"][i], x01[:, m0], x01[:, m1])
        lf = _sample_line(params["sigma_mat_line"][i], x01[:, v])
        sig = sig + jnp.sum(
            params["sigma_mat_scale"][i][:, None] * pf * lf * mmd[:, None], 0)
    sigma = trunc_exp(sig)

    mv = _rank_mask(cfg.rank_vec[-1], cfg.rank_vec[level - 1])
    mm = _rank_mask(cfg.rank_mat[-1], cfg.rank_mat[level - 1])
    vfc = (_sample_line(params["color_vec"][0], x01[:, _VEC_IDS[0]])
           * _sample_line(params["color_vec"][1], x01[:, _VEC_IDS[1]])
           * _sample_line(params["color_vec"][2], x01[:, _VEC_IDS[2]]))
    feats = [vfc * mv[:, None]]
    for i in range(3):
        m0, m1 = _MAT_IDS[i]
        v = _VEC_IDS[i]
        pf = _sample_plane(params["color_mat"][i], x01[:, m0], x01[:, m1])
        lf = _sample_line(params["color_mat_line"][i], x01[:, v])
        feats.append(pf * lf * mm[:, None])
    col = jnp.concatenate(feats, 0)                              # [Rv+3Rm, N]
    feat = jax.lax.dot_general(
        col.T.astype(compute_dtype), params["basis"].astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return sigma.reshape(sh), feat.reshape(*sh, cfg.color_feat_dim)


def make_ccnerf_field(cfg: CCNeRFConfig, level: int = -1, compute_dtype=jnp.bfloat16):
    """Field at a fixed truncation level (default: full K).  Rank-residual
    training builds one field per level and averages their losses.
    Levels are 1-based (compute_features' K); -1 selects full K."""
    if level < 0:
        level = cfg.K
    if not 1 <= level <= cfg.K:
        raise ValueError(
            f"truncation level must be in 1..K={cfg.K} (1-based; -1 for "
            f"full K), got {level}")

    def init_fn(key):
        return init_ccnerf(key, cfg)

    def density_fn(params, x):
        return ccnerf_density(params, x, cfg, level, compute_dtype)

    def rgb_fn(params, d, feat):
        sh = d.shape[:-1]
        h = _ccnerf_color_logits(params, d, feat, cfg, compute_dtype)
        return jax.nn.sigmoid(h).reshape(*sh, 3)

    return init_fn, density_fn, rgb_fn


# ---------------------------------------------------------------------------
# K-object composition (network_cc.py:274-335 multi-object forward + :552
# compose): each finalized object keeps its own factors and rigid frame;
# the scene density is the SUM of object densities and the color blends the
# objects' pre-sigmoid logits by a softmax over their densities.
# ---------------------------------------------------------------------------

class ComposedObject(NamedTuple):
    params: Params
    cfg: CCNeRFConfig
    rotation: Any = None      # [3, 3] world->object rotation (None = identity)
    scale: float = 1.0
    translation: Any = None   # [3] world-space object origin


def _to_object_frame(x, obj: ComposedObject):
    """normalize_coord analog: x_obj = R @ (x - t) / s."""
    if obj.translation is not None:
        x = x - jnp.asarray(obj.translation)
    if obj.rotation is not None:
        x = x @ jnp.asarray(obj.rotation).T
    return x / obj.scale


def _ccnerf_color_logits(params: Params, d, feat, cfg: CCNeRFConfig,
                         compute_dtype=jnp.bfloat16):
    """Pre-sigmoid color head (shared by the CP/CCNeRF rgb_fns and the
    softmax blend of the composed forward)."""
    h = jnp.concatenate(
        [
            embed_fn(feat.reshape(-1, feat.shape[-1]), cfg.feat_multires),
            embed_fn(d.reshape(-1, 3), cfg.dir_multires),
        ],
        -1,
    )
    return mlp_chain(h, params["color_net"], compute_dtype)


def compose_ccnerf_fields(objects: Sequence[ComposedObject],
                          compute_dtype=jnp.bfloat16):
    """(density_fn, rgb_fn) rendering a scene of finalized CCNeRF objects.

    Follows the reference compose semantics (network_cc.py:296-334):
    sigma = sum_o sigma_o; rgb = sigmoid(sum_o softmax(sigma)_o * h_o).
    The field protocol's ``params`` argument is ignored (objects are baked
    in — composition is an eval-time operation, like the reference's
    no-rank-residual multi-object branch)."""
    objects = list(objects)
    n_obj = len(objects)

    def density_fn(_params, x):
        sh = x.shape[:-1]
        sigmas, feats = [], []
        for obj in objects:
            xo = _to_object_frame(x, obj)
            s, f = ccnerf_density(obj.params, xo, obj.cfg, obj.cfg.K,
                                  compute_dtype)
            sigmas.append(s)
            feats.append(f)
        sigma_all = sum(sigmas)
        # carry per-object (sigma, feat) so rgb_fn can softmax-blend
        packed = jnp.concatenate(
            [jnp.concatenate([s[..., None], f], -1) for s, f in
             zip(sigmas, feats)], -1,
        )                                    # [..., O*(1+C)]
        return sigma_all.reshape(sh), packed

    def rgb_fn(_params, d, packed):
        sh = d.shape[:-1]
        # explicit widths: each object carries its OWN color_feat_dim, an
        # equal n-way split mis-sliced mixed-width compositions
        widths = [1 + obj.cfg.color_feat_dim for obj in objects]
        per = jnp.split(packed, np.cumsum(widths)[:-1], axis=-1)
        sigmas = jnp.stack([p[..., 0] for p in per], 0)          # [O, ...]
        ws = jax.nn.softmax(sigmas, axis=0)
        h_all = 0.0
        for o, obj in enumerate(objects):
            do = d
            if obj.rotation is not None:
                do = d @ jnp.asarray(obj.rotation).T
            h = _ccnerf_color_logits(obj.params, do, per[o][..., 1:],
                                     obj.cfg, compute_dtype)
            h_all = h_all + ws[o].reshape(-1, 1) * h
        return jax.nn.sigmoid(h_all).reshape(*sh, 3)

    return density_fn, rgb_fn
