"""Instant-NGP field backend: multires hash encoding + tiny MLPs.

Parity target: ngp-ours/nerf/network.py:10-194 —
  * sigma net: 2 bias-free Linear layers, hidden 64, output 1+15
    (sigma via trunc_exp + 15-dim geometric feature);
  * color net: 3 bias-free Linear layers, hidden 64, input = SH(dir, deg 4)
    ++ geo_feat, sigmoid rgb;
  * hash encoder with desired_resolution = 2048 * bound.

TPU-first notes:
  * All three pieces (hash gather, sigma MLP, color MLP) are one jitted
    graph; the MLPs are [N,64]x[64,64] matmuls that XLA maps to the MXU —
    the analog of the reference's fully-fused ffmlp (ngp-ours/ffmlp/),
    which exists to work around kernel-launch overhead CUDA has and XLA
    doesn't.
  * bfloat16 matmuls with fp32 params/accumulation replace AMP fp16.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.ops.activations import trunc_exp
from flnerf_tpu.ops.hash_pallas import (
    PackedHashSpec,
    hash_encode_pallas,
    hash_encode_xla,
    init_packed_table,
    make_packed_spec,
)
from flnerf_tpu.ops.sh_encoding import sh_encode

Params = Dict[str, Any]


class NGPConfig(NamedTuple):
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    # TPU default 2^15 (torch-ngp uses 2^19): the Pallas matmul-formulated
    # scatter/gather costs O(M * T) MAC, so the per-level cap trades a small
    # amount of fine-level capacity for a large constant-factor speedup.
    log2_hashmap_size: int = 15
    desired_resolution: int = 2048  # x bound
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    bound: float = 1.0
    density_scale: float = 1.0
    hash_backend: str = "auto"      # 'pallas' | 'xla' | 'auto' (pallas on TPU)
    hash_chunk: int = 2048


def _linear_init_nobias(key, fan_in: int, fan_out: int) -> jnp.ndarray:
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -bound, bound)


def make_ngp_spec(cfg: NGPConfig) -> PackedHashSpec:
    return make_packed_spec(
        num_levels=cfg.num_levels,
        level_dim=cfg.level_dim,
        base_resolution=cfg.base_resolution,
        log2_hashmap_size=cfg.log2_hashmap_size,
        desired_resolution=int(cfg.desired_resolution * cfg.bound),
    )


def _use_pallas(cfg: NGPConfig) -> bool:
    if cfg.hash_backend == "pallas":
        return True
    if cfg.hash_backend == "xla":
        return False
    return jax.default_backend() == "tpu"


def init_ngp(key, cfg: NGPConfig) -> Params:
    spec = make_ngp_spec(cfg)
    keys = jax.random.split(key, 1 + cfg.num_layers + cfg.num_layers_color)
    params: Params = {"table": init_packed_table(keys[0], spec)}

    in_dim = spec.output_dim
    sigma_net = []
    for l in range(cfg.num_layers):
        out_dim = 1 + cfg.geo_feat_dim if l == cfg.num_layers - 1 else cfg.hidden_dim
        sigma_net.append(_linear_init_nobias(keys[1 + l], in_dim, out_dim))
        in_dim = out_dim
    params["sigma_net"] = sigma_net

    in_dim = cfg.sh_degree ** 2 + cfg.geo_feat_dim
    color_net = []
    for l in range(cfg.num_layers_color):
        out_dim = 3 if l == cfg.num_layers_color - 1 else cfg.hidden_dim_color
        color_net.append(
            _linear_init_nobias(keys[1 + cfg.num_layers + l], in_dim, out_dim)
        )
        in_dim = out_dim
    params["color_net"] = color_net
    return params


def _mlp(x, layers, compute_dtype):
    h = x.astype(compute_dtype)
    for i, w in enumerate(layers):
        h = jax.lax.dot_general(
            h, w.astype(compute_dtype),
            dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if i != len(layers) - 1:
            h = jax.nn.relu(h).astype(compute_dtype)
    return h  # fp32 (preferred_element_type)


def ngp_density(
    params: Params, x: jnp.ndarray, cfg: NGPConfig, spec: PackedHashSpec,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x in [-bound, bound]^3 -> (sigma [N], geo_feat [N, geo_feat_dim])."""
    sh = x.shape[:-1]
    x01 = (x.reshape(-1, 3) / cfg.bound + 1.0) * 0.5
    x01 = jnp.clip(x01, 0.0, 1.0)
    if _use_pallas(cfg):
        enc = hash_encode_pallas(x01, params["table"], spec, cfg.hash_chunk)
    else:
        enc = hash_encode_xla(x01, params["table"], spec)
    h = _mlp(enc, params["sigma_net"], compute_dtype)
    sigma = trunc_exp(h[..., 0])
    geo = h[..., 1:]
    return sigma.reshape(sh), geo.reshape(*sh, -1)


def ngp_color(
    params: Params, d: jnp.ndarray, geo_feat: jnp.ndarray, cfg: NGPConfig,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Unit dirs d [..., 3] + geo features -> rgb [..., 3] in [0,1]."""
    enc = sh_encode(d, cfg.sh_degree)
    h = jnp.concatenate([enc, geo_feat], axis=-1)
    h = _mlp(h, params["color_net"], compute_dtype)
    return jax.nn.sigmoid(h)


def make_ngp_field(cfg: NGPConfig, compute_dtype=jnp.bfloat16):
    """(init_fn, density_fn, rgb_fn) — the field-backend protocol."""
    spec = make_ngp_spec(cfg)

    def init_fn(key):
        return init_ngp(key, cfg)

    def density_fn(params, x):
        return ngp_density(params, x, cfg, spec, compute_dtype)

    def rgb_fn(params, d, geo_feat):
        return ngp_color(params, d, geo_feat, cfg, compute_dtype)

    return init_fn, density_fn, rgb_fn
