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
    # 'deform' (network.py), 'basis' (network_basis.py: time->MLP emits
    # sigma/color mixing bases), 'hyper' (network_hyper.py: time->ambient
    # coords appended to x; 4-D hash encoding)
    variant: str = "deform"
    sigma_basis_dim: int = 32      # basis variant (network_basis.py:23-24)
    color_basis_dim: int = 8
    num_layers_basis: int = 5
    hidden_dim_basis: int = 128
    ambient_dim: int = 1           # hyper variant (network_hyper.py:25)
    num_layers_ambient: int = 5
    hidden_dim_ambient: int = 128


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


# ---------------------------------------------------------------------------
# Basis variant (dnerf/network_basis.py): no deformation — a time MLP emits
# per-timestep mixing bases; sigma = trunc_exp(h_SB @ sigma_basis(t)) and
# rgb = sigmoid(reshape(h, [3, CB]) @ color_basis(t)).
# ---------------------------------------------------------------------------

def _mlp_uniform_init(key, dims):
    keys = jax.random.split(key, len(dims) - 1)
    net = []
    for l in range(len(dims) - 1):
        b = 1.0 / np.sqrt(dims[l])
        net.append(jax.random.uniform(
            keys[l], (dims[l], dims[l + 1]), jnp.float32, -b, b))
    return net


def _run_mlp(h, net, compute_dtype):
    """Alias of the shared bias-free bf16 MLP chain (one implementation:
    any future numeric change applies everywhere)."""
    from flnerf_tpu.models.hash_ngp import _mlp

    return _mlp(h, net, compute_dtype)


def init_dnerf_basis(key, cfg: DNeRFConfig) -> Params:
    from flnerf_tpu.models.hash_ngp import (
        _linear_init_nobias, init_ngp_table,
    )
    from flnerf_tpu.ops.sh_encoding import sh_encode  # noqa: F401

    ncfg = cfg.ngp
    spec = make_ngp_spec(ncfg)
    keys = jax.random.split(key, 8)
    params: Params = {"table": init_ngp_table(keys[0], spec)}
    sb, cb = cfg.sigma_basis_dim, cfg.color_basis_dim

    t_in = embedder_out_dim(cfg.time_multires, 1)
    params["basis_net"] = _mlp_uniform_init(
        keys[1],
        [t_in] + [cfg.hidden_dim_basis] * (cfg.num_layers_basis - 1) + [sb + cb],
    )
    # sigma net: enc -> SB + geo_feat (network_basis.py:69)
    params["sigma_net"] = [
        _linear_init_nobias(keys[2], spec.output_dim, ncfg.hidden_dim),
        _linear_init_nobias(keys[3], ncfg.hidden_dim, sb + ncfg.geo_feat_dim),
    ]
    # color net: SH(d) ++ geo -> 3*CB (network_basis.py:90)
    dims = [ncfg.sh_degree ** 2 + ncfg.geo_feat_dim,
            ncfg.hidden_dim_color, ncfg.hidden_dim_color, 3 * cb]
    params["color_net"] = [
        _linear_init_nobias(k, dims[i], dims[i + 1])
        for i, k in enumerate(jax.random.split(keys[4], 3))
    ]
    return params


def make_dnerf_basis_field(cfg: DNeRFConfig, compute_dtype=jnp.bfloat16):
    from flnerf_tpu.models.hash_ngp import encode_with_spec
    from flnerf_tpu.ops.activations import trunc_exp
    from flnerf_tpu.ops.sh_encoding import sh_encode

    ncfg = cfg.ngp
    spec = make_ngp_spec(ncfg)
    sb, cb = cfg.sigma_basis_dim, cfg.color_basis_dim

    def bases(params, t):
        et = embed_fn(t.reshape(-1, 1), cfg.time_multires)
        h = _run_mlp(et, params["basis_net"], compute_dtype)     # [N, SB+CB]
        return h[:, :sb], h[:, sb:]

    def init_fn(key):
        return init_dnerf_basis(key, cfg)

    def density_fn(params, x, t):
        sh = x.shape[:-1]
        x01 = jnp.clip((x.reshape(-1, 3) / ncfg.bound + 1) * 0.5, 0.0, 1.0)
        enc = encode_with_spec(x01, params["table"], spec, ncfg)
        h = _run_mlp(enc, params["sigma_net"], compute_dtype)
        sig_b, col_b = bases(params, t)
        sigma = trunc_exp(jnp.sum(h[:, :sb] * sig_b, -1))
        geo = jnp.concatenate([h[:, sb:], col_b], -1)  # carry color basis
        return sigma.reshape(sh), geo.reshape(*sh, -1)

    def rgb_fn(params, d, geo):
        sh = d.shape[:-1]
        geo2 = geo.reshape(-1, geo.shape[-1])
        gfeat, col_b = geo2[:, :ncfg.geo_feat_dim], geo2[:, ncfg.geo_feat_dim:]
        enc = sh_encode(d.reshape(-1, 3), ncfg.sh_degree)
        h = _run_mlp(jnp.concatenate([enc, gfeat], -1),
                     params["color_net"], compute_dtype)         # [N, 3*CB]
        rgb = jax.nn.sigmoid(
            jnp.sum(h.reshape(-1, 3, cb) * col_b[:, None, :], -1))
        return rgb.reshape(*sh, 3)

    return init_fn, density_fn, rgb_fn


# ---------------------------------------------------------------------------
# Hyper variant (dnerf/network_hyper.py): time -> ambient MLP -> tanh*bound
# extra coordinates appended to x; a (3+ambient)-D hash grid encodes the
# lifted point (hyper-space NeRF).
# ---------------------------------------------------------------------------

def make_hyper_spec(cfg: DNeRFConfig):
    from flnerf_tpu.ops.hash_encoding import make_hashgrid_spec

    n = cfg.ngp
    return make_hashgrid_spec(
        num_levels=n.num_levels, level_dim=n.level_dim,
        base_resolution=n.base_resolution,
        log2_hashmap_size=n.log2_hashmap_size,
        desired_resolution=int(n.desired_resolution * n.bound),
        input_dim=3 + cfg.ambient_dim,
    )


def init_dnerf_hyper(key, cfg: DNeRFConfig) -> Params:
    from flnerf_tpu.models.hash_ngp import _linear_init_nobias
    from flnerf_tpu.ops.hash_encoding import init_hashgrid

    ncfg = cfg.ngp
    spec = make_hyper_spec(cfg)
    keys = jax.random.split(key, 8)
    params: Params = {"table": init_hashgrid(keys[0], spec)}
    t_in = embedder_out_dim(cfg.time_multires, 1)
    params["ambient_net"] = _mlp_uniform_init(
        keys[1],
        [t_in] + [cfg.hidden_dim_ambient] * (cfg.num_layers_ambient - 1)
        + [cfg.ambient_dim],
    )
    params["sigma_net"] = [
        _linear_init_nobias(keys[2], spec.output_dim, ncfg.hidden_dim),
        _linear_init_nobias(keys[3], ncfg.hidden_dim, 1 + ncfg.geo_feat_dim),
    ]
    dims = [ncfg.sh_degree ** 2 + ncfg.geo_feat_dim,
            ncfg.hidden_dim_color, ncfg.hidden_dim_color, 3]
    params["color_net"] = [
        _linear_init_nobias(k, dims[i], dims[i + 1])
        for i, k in enumerate(jax.random.split(keys[4], 3))
    ]
    return params


def make_dnerf_hyper_field(cfg: DNeRFConfig, compute_dtype=jnp.bfloat16):
    from flnerf_tpu.ops.activations import trunc_exp
    from flnerf_tpu.ops.hash_encoding import hash_encode
    from flnerf_tpu.ops.sh_encoding import sh_encode

    ncfg = cfg.ngp
    spec = make_hyper_spec(cfg)

    def init_fn(key):
        return init_dnerf_hyper(key, cfg)

    def density_fn(params, x, t):
        sh = x.shape[:-1]
        et = embed_fn(t.reshape(-1, 1), cfg.time_multires)
        amb = _run_mlp(et, params["ambient_net"], compute_dtype)
        amb = jnp.tanh(amb) * ncfg.bound                         # [N, A]
        lifted = jnp.concatenate([x.reshape(-1, 3), amb], -1)
        x01 = jnp.clip((lifted / ncfg.bound + 1) * 0.5, 0.0, 1.0)
        enc = hash_encode(x01, params["table"], spec)
        h = _run_mlp(enc, params["sigma_net"], compute_dtype)
        sigma = trunc_exp(h[:, 0])
        return sigma.reshape(sh), h[:, 1:].reshape(*sh, -1)

    def rgb_fn(params, d, geo):
        sh = d.shape[:-1]
        enc = sh_encode(d.reshape(-1, 3), ncfg.sh_degree)
        h = _run_mlp(
            jnp.concatenate([enc, geo.reshape(-1, geo.shape[-1])], -1),
            params["color_net"], compute_dtype,
        )
        return jax.nn.sigmoid(h).reshape(*sh, 3)

    return init_fn, density_fn, rgb_fn


def make_dnerf_variant_field(cfg: DNeRFConfig, compute_dtype=jnp.bfloat16):
    """Dispatch on cfg.variant ('deform' | 'basis' | 'hyper') — the analog
    of picking network.py / network_basis.py / network_hyper.py by import."""
    if cfg.variant == "basis":
        return make_dnerf_basis_field(cfg, compute_dtype)
    if cfg.variant == "hyper":
        return make_dnerf_hyper_field(cfg, compute_dtype)
    return make_dnerf_field(cfg, compute_dtype)
