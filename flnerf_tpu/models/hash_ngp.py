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
from flnerf_tpu.ops.hash_encoding import (
    hash_encode as hash_encode_nd,
    init_hashgrid,
    make_hashgrid_spec,
)
from flnerf_tpu.ops.hash_pallas import (
    PackedHashSpec,
    hash_encode_pallas,
    hash_encode_xla,
    init_packed_table,
    make_packed_spec,
)
from flnerf_tpu.ops.hash_lattice import (
    LatticeSpec,
    init_lattice_tables,
    lattice_encode_split,
    make_lattice_spec,
)
from flnerf_tpu.ops.hash_sorted import (
    SplitHashSpec,
    hash_encode_split,
    init_split_table,
    make_split_spec,
)
from flnerf_tpu.ops.sh_encoding import sh_encode

Params = Dict[str, Any]


class NGPConfig(NamedTuple):
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    # 2^15 and below runs the matmul-formulated kernels (O(M*T) MAC, cheap
    # at small T); 2^16+ automatically switches to the sorted-block gather
    # engine (ops/hash_sorted.py) whose cost is capacity-independent, so
    # torch-ngp's 2^19 (gridencoder grid.py:91) is affordable on TPU.
    log2_hashmap_size: int = 15
    # sorted engine: levels with tables below this stay on the matmul path.
    # Matches make_split_spec's default (ADVICE r2): the sorted path's flat
    # per-level cost only wins above ~2^15 (measured, DESIGN.md §3).
    split_min_size: int = 1 << 15
    # big-level engine at log2_hashmap_size >= 16: 'sorted' (corner-sorted
    # blocks, ops/hash_sorted.py, reference xor hash bit-for-bit) or
    # 'lattice' (one base-key sort + slab matmuls, ops/hash_lattice.py,
    # linear hash — 8x fewer sorted keys per level).  'auto' resolves to
    # 'lattice': 1.6x faster AND equal-or-better quality on the r4 TPU
    # gate (LATTICE_diagnose.json; see make_ngp_spec).
    hash_engine: str = "auto"
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
    # background model (ngp-ours/nerf/network.py:66-93: bg_radius > 0 turns
    # on a 2D-hashgrid + tiny-MLP environment map fed by sph_from_ray)
    bg_radius: float = 0.0
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    bg_levels: int = 4
    bg_log2_hashmap_size: int = 15
    bg_resolution: int = 2048


def _linear_init_nobias(key, fan_in: int, fan_out: int) -> jnp.ndarray:
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32, -bound, bound)


def make_bg_spec(cfg: NGPConfig):
    """2D background hashgrid spec (network.py:73: input_dim=2, 4 levels,
    desired_resolution 2048)."""
    return make_hashgrid_spec(
        num_levels=cfg.bg_levels,
        level_dim=cfg.level_dim,
        base_resolution=cfg.base_resolution,
        log2_hashmap_size=cfg.bg_log2_hashmap_size,
        desired_resolution=cfg.bg_resolution,
        input_dim=2,
    )


def sph_from_ray(rays_o, rays_d, radius: float):
    """Ray ∩ sphere(radius) -> [N, 2] (theta, phi) in [-1, 1]
    (raymarching.cu:163-199 kernel_sph_from_ray; y is the up axis)."""
    a = jnp.sum(rays_d * rays_d, -1)
    b = jnp.sum(rays_o * rays_d, -1)
    c = jnp.sum(rays_o * rays_o, -1) - radius * radius
    disc = jnp.maximum(b * b - a * c, 0.0)
    t = (-b + jnp.sqrt(disc)) / a
    p = rays_o + t[..., None] * rays_d
    theta = jnp.arctan2(jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2), p[..., 1])
    phi = jnp.arctan2(p[..., 2], p[..., 0])
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], -1)


def ngp_background(params: Params, rays_o, rays_d, cfg: NGPConfig,
                   compute_dtype=jnp.bfloat16):
    """Per-ray background rgb via the 2D hashgrid env map
    (network.py:145-160 background()).  rays_d must be unit."""
    spec = make_bg_spec(cfg)
    sph = sph_from_ray(rays_o, rays_d, cfg.bg_radius)
    x01 = jnp.clip((sph + 1.0) * 0.5, 0.0, 1.0)
    enc = hash_encode_nd(x01.reshape(-1, 2), params["bg_table"], spec)
    d_enc = sh_encode(rays_d.reshape(-1, 3), cfg.sh_degree)
    h = jnp.concatenate([d_enc, enc], axis=-1)
    h = _mlp(h, params["bg_net"], compute_dtype)
    return jax.nn.sigmoid(h).reshape(rays_o.shape[:-1] + (3,))


def make_ngp_spec(cfg: NGPConfig):
    """PackedHashSpec (matmul kernels) up to 2^15 tables; SplitHashSpec
    (sorted-block gather engine) for 2^16+."""
    if cfg.hash_engine not in ("auto", "matmul", "sorted", "lattice"):
        raise ValueError(f"unknown hash_engine {cfg.hash_engine!r} "
                         "(auto|matmul|sorted|lattice)")
    if cfg.log2_hashmap_size < 16 and cfg.hash_engine in ("sorted", "lattice"):
        # silently downgrading to the matmul path would benchmark the
        # wrong engine — the gather engines only pay off at 2^16+
        raise ValueError(
            f"hash_engine={cfg.hash_engine!r} needs log2_hashmap_size >= "
            f"16 (got {cfg.log2_hashmap_size}); the matmul path is "
            "cheaper below that and is selected by 'auto'")
    if cfg.log2_hashmap_size >= 16 and cfg.hash_engine != "matmul":
        engine = cfg.hash_engine
        if engine == "auto":
            # lattice: 1.6x the sorted engine at the NGP step shape
            # (30.9 vs 49.3 ms fwd+bwd at 2^19/65k pts) at BETTER
            # end-to-end quality on the r4 TPU gate (38.25 vs 37.37 dB
            # train-view at equal steps/seed, LATTICE_diagnose.json;
            # the r3 gate's 2.59 dB "gap" was an eval-chunk kernel
            # shape issue, fixed by the render-chunk clamp in
            # render/ngp.py ngp_render_image)
            engine = "lattice"
        if engine == "lattice":
            return make_lattice_spec(
                num_levels=cfg.num_levels,
                level_dim=cfg.level_dim,
                base_resolution=cfg.base_resolution,
                log2_hashmap_size=cfg.log2_hashmap_size,
                desired_resolution=int(cfg.desired_resolution * cfg.bound),
                split_min_size=cfg.split_min_size,
            )
        return make_split_spec(
            num_levels=cfg.num_levels,
            level_dim=cfg.level_dim,
            base_resolution=cfg.base_resolution,
            log2_hashmap_size=cfg.log2_hashmap_size,
            desired_resolution=int(cfg.desired_resolution * cfg.bound),
            split_min_size=cfg.split_min_size,
        )
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


def init_ngp_table(key, spec):
    """Table params for either spec kind (split tuple / packed array)."""
    if isinstance(spec, LatticeSpec):
        return init_lattice_tables(key, spec)
    if isinstance(spec, SplitHashSpec):
        return init_split_table(key, spec)
    return init_packed_table(key, spec)


def encode_with_spec(x01, table, spec, cfg: NGPConfig):
    """Dispatch x01 -> [N, L*C] features over the spec kind + backend —
    the one place every NGP-spec consumer (ngp, dnerf variants) routes
    through so new engines stay wired everywhere."""
    if isinstance(spec, LatticeSpec):
        return lattice_encode_split(x01, table, spec, cfg.hash_chunk,
                                    use_kernels=_use_pallas(cfg))
    if isinstance(spec, SplitHashSpec):
        return hash_encode_split(x01, table, spec, cfg.hash_chunk,
                                 use_kernels=_use_pallas(cfg))
    if _use_pallas(cfg):
        return hash_encode_pallas(x01, table, spec, cfg.hash_chunk)
    return hash_encode_xla(x01, table, spec)


def init_ngp(key, cfg: NGPConfig) -> Params:
    spec = make_ngp_spec(cfg)
    # one extra key reserved for the bg nets (never reuse a consumed key)
    keys = jax.random.split(key, 2 + cfg.num_layers + cfg.num_layers_color)
    params: Params = {"table": init_ngp_table(keys[0], spec)}

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

    if cfg.bg_radius > 0:
        bg_spec = make_bg_spec(cfg)
        kb = jax.random.split(keys[-1], 1 + cfg.num_layers_bg)
        params["bg_table"] = init_hashgrid(kb[0], bg_spec)
        in_dim = bg_spec.output_dim + cfg.sh_degree ** 2
        bg_net = []
        for l in range(cfg.num_layers_bg):
            out_dim = 3 if l == cfg.num_layers_bg - 1 else cfg.hidden_dim_bg
            bg_net.append(_linear_init_nobias(kb[1 + l], in_dim, out_dim))
            in_dim = out_dim
        params["bg_net"] = bg_net
    return params


def mlp_chain(x, layers, compute_dtype):
    """Bias-free relu MLP as bf16 matmuls accumulating in fp32 — the ffmlp
    analog, shared by every field backend (tensorf/ccnerf/sdf heads)."""
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


_mlp = mlp_chain


def ngp_density(
    params: Params, x: jnp.ndarray, cfg: NGPConfig, spec: PackedHashSpec,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x in [-bound, bound]^3 -> (sigma [N], geo_feat [N, geo_feat_dim])."""
    sh = x.shape[:-1]
    x01 = (x.reshape(-1, 3) / cfg.bound + 1.0) * 0.5
    x01 = jnp.clip(x01, 0.0, 1.0)
    enc = encode_with_spec(x01, params["table"], spec, cfg)
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


def make_ngp_bg_fn(cfg: NGPConfig, compute_dtype=jnp.bfloat16):
    """bg_fn(params, rays_o, rays_d) -> [N, 3], or None when bg_radius==0
    (renderer.py:232-235: the bg model replaces any fixed bg_color)."""
    if cfg.bg_radius <= 0:
        return None

    def bg_fn(params, rays_o, rays_d):
        return ngp_background(params, rays_o, rays_d, cfg, compute_dtype)

    return bg_fn
