"""D-NeRF field backend: time-conditioned deformation over a canonical NGP.

Parity target: ngp-ours/dnerf/network.py:10-123 —
  * deform net: 5-layer 128-hidden bias-free MLP over
    freq(x, multires 10) ++ freq(t, multires 6) -> Δxyz (:38-52);
  * canonical field: the hash-grid NGP (sigma 2x64 -> 1+15, color 3x64 with
    SH dirs) queried at x + Δx;
  * time is a scalar in [0, 1] per frame (dnerf/provider.py adds it).

The field fns take an extra per-point time argument; the occupancy-marching
renderer threads it through (render/ngp.py ``times``).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.models.hash_ngp import NGPConfig, init_ngp, make_ngp_spec, ngp_color, ngp_density
from flnerf_tpu.models.nerf_mlp import embed_fn, embedder_out_dim

Params = Dict[str, Any]


class DNeRFConfig(NamedTuple):
    ngp: NGPConfig = NGPConfig()
    num_layers_deform: int = 5
    hidden_dim_deform: int = 128
    deform_multires: int = 10
    time_multires: int = 6


def init_dnerf(key, cfg: DNeRFConfig) -> Params:
    k1, k2 = jax.random.split(key)
    params: Params = {"canonical": init_ngp(k1, cfg.ngp)}
    in_dim = embedder_out_dim(cfg.deform_multires, 3) + embedder_out_dim(
        cfg.time_multires, 1
    )
    keys = jax.random.split(k2, cfg.num_layers_deform)
    net = []
    dim = in_dim
    for l in range(cfg.num_layers_deform):
        out = 3 if l == cfg.num_layers_deform - 1 else cfg.hidden_dim_deform
        bound = 1.0 / np.sqrt(dim)
        net.append(jax.random.uniform(keys[l], (dim, out), jnp.float32, -bound, bound))
        dim = out
    params["deform_net"] = net
    return params


def deform(params: Params, x: jnp.ndarray, t: jnp.ndarray, cfg: DNeRFConfig,
           compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Δx for points x [..., 3] at times t [..., 1]."""
    ex = embed_fn(x, cfg.deform_multires)
    et = embed_fn(t, cfg.time_multires)
    h = jnp.concatenate([ex, et], -1)
    for l, w in enumerate(params["deform_net"]):
        h = jax.lax.dot_general(
            h.astype(compute_dtype), w.astype(compute_dtype),
            dimension_numbers=(((h.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if l != len(params["deform_net"]) - 1:
            h = jax.nn.relu(h)
    return h


def make_dnerf_field(cfg: DNeRFConfig, compute_dtype=jnp.bfloat16):
    """(init_fn, density_fn, rgb_fn) where the density/rgb fns take a time
    argument: density_fn(params, x, t), rgb_fn(params, d, geo)."""
    spec = make_ngp_spec(cfg.ngp)

    def init_fn(key):
        return init_dnerf(key, cfg)

    def density_fn(params, x, t):
        dx = deform(params, x, t[..., None], cfg, compute_dtype)
        x_canon = jnp.clip(x + dx, -cfg.ngp.bound, cfg.ngp.bound)
        return ngp_density(params["canonical"], x_canon, cfg.ngp, spec, compute_dtype)

    def rgb_fn(params, d, geo):
        return ngp_color(params["canonical"], d, geo, cfg.ngp, compute_dtype)

    return init_fn, density_fn, rgb_fn
