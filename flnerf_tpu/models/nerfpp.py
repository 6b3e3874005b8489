"""NeRF++ field backend: foreground MLP + inverted-sphere background MLP.

Parity targets (nerf++-ours):
  * MLPNet — nerf_network.py:70-142: D=8 W=256 trunk with skip concat at
    layer 4 (input prepended), sigma = |linear(base)| (:134), base_remap
    256-dim, rgb head Linear(256+viewdir_ch, 128) relu Linear(128, 3)
    sigmoid.
  * Embedder — nerf_network.py:11-60: [x, sin(2^0 x), cos(2^0 x), ...].
  * depth2pts_outside — ddp_model.py:16-45: background points parameterized
    as (x', y', z', 1/r) on the inverted sphere via a Rodrigues rotation.
  * NerfNet.forward — ddp_model.py:74-150: fg composite keeps the final
    transmittance as bg_lambda; bg rendered back-to-front (flipped 1->0
    depths) and weighted by bg_lambda.
  * intersect_sphere / perturb_samples — ddp_train_nerf.py:54-82.
  * NerfNetWithAutoExpo — ddp_model.py:157-188: per-image learnable
    (scale, shift), loss uses (pred - shift)/scale + L1 reg.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.models.nerf_mlp import _linear_init, embed_fn, embedder_out_dim

TINY = 1e-6
HUGE = 1e10

Params = Dict[str, Any]


class NerfPPConfig(NamedTuple):
    netdepth: int = 8
    netwidth: int = 256
    max_freq_log2: int = 10
    max_freq_log2_viewdirs: int = 4
    cascade_samples: Tuple[int, ...] = (64, 64)
    optim_autoexpo: bool = False
    lambda_autoexpo: float = 1.0


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def intersect_sphere(ray_o, ray_d):
    """Depth where each ray exits the unit sphere (ddp_train_nerf.py:54-70).

    Returns (depth, inside) — ``inside`` flags rays whose origin mid-point is
    within the sphere; the reference raises otherwise, we mask instead to
    stay jittable and let callers assert on the host.
    """
    d1 = -jnp.sum(ray_d * ray_o, -1) / jnp.sum(ray_d * ray_d, -1)
    p = ray_o + d1[..., None] * ray_d
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    p_norm_sq = jnp.sum(p * p, -1)
    inside = p_norm_sq < 1.0
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_norm_sq, 1e-10)) * ray_d_cos
    return d1 + d2, inside


def perturb_samples(key, z_vals):
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t = jax.random.uniform(key, z_vals.shape)
    return lower + (upper - lower) * t


def depth2pts_outside(ray_o, ray_d, depth):
    """Inverted-sphere 4D background coords (ddp_model.py:16-45).

    depth is 1/r in [0, 1]; returns pts [..., 4] = (unit point, 1/r).
    """
    d1 = -jnp.sum(ray_d * ray_o, -1) / jnp.sum(ray_d * ray_d, -1)
    p_mid = ray_o + d1[..., None] * ray_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    d2 = jnp.sqrt(jnp.maximum(1.0 - p_mid_norm ** 2, 1e-10)) * ray_d_cos
    p_sphere = ray_o + (d1 + d2)[..., None] * ray_d

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / jnp.maximum(jnp.linalg.norm(rot_axis, axis=-1, keepdims=True), TINY)
    phi = jnp.arcsin(jnp.clip(p_mid_norm, -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))
    rot_angle = (phi - theta)[..., None]

    p_new = (
        p_sphere * jnp.cos(rot_angle)
        + jnp.cross(rot_axis, p_sphere) * jnp.sin(rot_angle)
        + rot_axis * jnp.sum(rot_axis * p_sphere, -1, keepdims=True) * (1.0 - jnp.cos(rot_angle))
    )
    p_new = p_new / jnp.maximum(jnp.linalg.norm(p_new, axis=-1, keepdims=True), TINY)
    return jnp.concatenate([p_new, depth[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# MLPNet
# ---------------------------------------------------------------------------

def init_mlpnet(key, input_ch: int, input_ch_viewdirs: int, D: int = 8, W: int = 256) -> Params:
    keys = jax.random.split(key, D + 5)
    base = []
    dim = input_ch
    for i in range(D):
        # the skip concat (input prepended) feeds layer 5 (skips={4}, applied
        # before base_layers[i+1] at i==4 — nerf_network.py forward loop)
        in_dim = W + input_ch if i == 5 else dim
        base.append(_linear_init(keys[i], in_dim, W))
        dim = W
    params = {"base": base}
    params["sigma"] = _linear_init(keys[D], W, 1)
    params["base_remap"] = _linear_init(keys[D + 1], W, 256)
    params["rgb0"] = _linear_init(keys[D + 2], 256 + input_ch_viewdirs, W // 2)
    params["rgb1"] = _linear_init(keys[D + 3], W // 2, 3)
    return params


def _dense(x, layer, dtype):
    w = layer["w"].astype(dtype)
    y = jax.lax.dot_general(
        x.astype(dtype), w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + layer["b"]


def apply_mlpnet(params: Params, pts_embed, view_embed, compute_dtype=jnp.bfloat16):
    """Returns (rgb [..., 3], sigma [...]) — nerf_network.py:121-141.
    The skip width is fixed by ``params`` (init_mlpnet), not per call."""
    base = pts_embed
    for i, layer in enumerate(params["base"]):
        if i == 5:  # skip concat before layer 5 (skips={4}, applied pre-next)
            base = jnp.concatenate([pts_embed, base], -1)
        base = jax.nn.relu(_dense(base, layer, compute_dtype))

    sigma = jnp.abs(_dense(base, params["sigma"], compute_dtype))[..., 0]
    remap = _dense(base, params["base_remap"], compute_dtype)
    h = jnp.concatenate([remap, view_embed.astype(remap.dtype)], -1)
    h = jax.nn.relu(_dense(h, params["rgb0"], compute_dtype))
    rgb = jax.nn.sigmoid(_dense(h, params["rgb1"], compute_dtype))
    return rgb, sigma


# ---------------------------------------------------------------------------
# NerfNet (fg + bg)
# ---------------------------------------------------------------------------

def init_nerfpp(key, cfg: NerfPPConfig, n_images: int = 0) -> Params:
    kf, kb, ka = jax.random.split(key, 3)
    fg_pos_ch = embedder_out_dim(cfg.max_freq_log2, 3)
    bg_pos_ch = embedder_out_dim(cfg.max_freq_log2, 4)
    view_ch = embedder_out_dim(cfg.max_freq_log2_viewdirs, 3)
    params: Params = {
        "fg": init_mlpnet(kf, fg_pos_ch, view_ch, cfg.netdepth, cfg.netwidth),
        "bg": init_mlpnet(kb, bg_pos_ch, view_ch, cfg.netdepth, cfg.netwidth),
    }
    if cfg.optim_autoexpo and n_images > 0:
        # per-image (scale-ish, shift) init (0.5, 0) — ddp_model.py:169
        params["autoexpo"] = jnp.tile(jnp.array([[0.5, 0.0]]), (n_images, 1))
    return params


def nerfpp_render(
    params: Params,
    ray_o, ray_d,
    fg_z_max, fg_z_vals, bg_z_vals,
    cfg: NerfPPConfig,
    compute_dtype=jnp.bfloat16,
):
    """One cascade level's render (NerfNet.forward, ddp_model.py:74-150)."""
    ray_d_norm = jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    viewdirs = ray_d / ray_d_norm
    n_fg = fg_z_vals.shape[-1]
    n_bg = bg_z_vals.shape[-1]

    # ---- foreground (inside the unit sphere)
    fg_pts = ray_o[..., None, :] + fg_z_vals[..., None] * ray_d[..., None, :]
    fg_pe = embed_fn(fg_pts, cfg.max_freq_log2)
    fg_ve = jnp.broadcast_to(
        embed_fn(viewdirs, cfg.max_freq_log2_viewdirs)[..., None, :],
        fg_pts.shape[:-1] + (embedder_out_dim(cfg.max_freq_log2_viewdirs, 3),),
    )
    fg_rgb_s, fg_sigma = apply_mlpnet(params["fg"], fg_pe, fg_ve,
                                      compute_dtype)
    fg_dists = fg_z_vals[..., 1:] - fg_z_vals[..., :-1]
    fg_dists = ray_d_norm * jnp.concatenate(
        [fg_dists, fg_z_max[..., None] - fg_z_vals[..., -1:]], -1
    )
    fg_alpha = 1.0 - jnp.exp(-fg_sigma * fg_dists)
    T = jnp.cumprod(1.0 - fg_alpha + TINY, -1)
    bg_lambda = T[..., -1]
    T = jnp.concatenate([jnp.ones_like(T[..., :1]), T[..., :-1]], -1)
    fg_weights = fg_alpha * T
    fg_rgb = jnp.sum(fg_weights[..., None] * fg_rgb_s, -2)
    fg_depth = jnp.sum(fg_weights * fg_z_vals, -1)

    # ---- background (inverted sphere, rendered back-to-front)
    bg_ray_o = jnp.broadcast_to(ray_o[..., None, :], ray_o.shape[:-1] + (n_bg, 3))
    bg_ray_d = jnp.broadcast_to(ray_d[..., None, :], ray_d.shape[:-1] + (n_bg, 3))
    bg_pts = depth2pts_outside(bg_ray_o, bg_ray_d, bg_z_vals)   # [..., S, 4]
    bg_pe = embed_fn(bg_pts, cfg.max_freq_log2)
    bg_ve = jnp.broadcast_to(
        embed_fn(viewdirs, cfg.max_freq_log2_viewdirs)[..., None, :],
        bg_pts.shape[:-1] + (embedder_out_dim(cfg.max_freq_log2_viewdirs, 3),),
    )
    # flip to back-to-front (1 -> 0), ddp_model.py:118-121
    bg_pe = jnp.flip(bg_pe, axis=-2)
    bg_ve = jnp.flip(bg_ve, axis=-2)
    bg_z = jnp.flip(bg_z_vals, axis=-1)
    bg_rgb_s, bg_sigma = apply_mlpnet(params["bg"], bg_pe, bg_ve,
                                      compute_dtype)
    bg_dists = bg_z[..., :-1] - bg_z[..., 1:]
    bg_dists = jnp.concatenate([bg_dists, jnp.full_like(bg_dists[..., :1], HUGE)], -1)
    bg_alpha = 1.0 - jnp.exp(-bg_sigma * bg_dists)
    Tb = jnp.cumprod(1.0 - bg_alpha + TINY, -1)[..., :-1]
    Tb = jnp.concatenate([jnp.ones_like(Tb[..., :1]), Tb], -1)
    bg_weights = bg_alpha * Tb
    bg_rgb = jnp.sum(bg_weights[..., None] * bg_rgb_s, -2)
    bg_depth = jnp.sum(bg_weights * bg_z, -1)

    rgb = fg_rgb + bg_lambda[..., None] * bg_rgb
    return {
        "rgb": rgb,
        "fg_weights": fg_weights,
        "bg_weights": bg_weights,
        "fg_rgb": fg_rgb,
        "fg_depth": fg_depth,
        "bg_rgb": bg_lambda[..., None] * bg_rgb,
        "bg_depth": bg_lambda * bg_depth,
        "bg_lambda": bg_lambda,
    }
