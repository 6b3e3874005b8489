"""Vanilla-NeRF field backend: frequency encoding + coarse/fine MLP.

Parity targets:
  * positional Embedder — nerf-ours/run_nerf_helpers.py:15-63
    (include_input, log-spaced freqs 2^[0..multires-1], [sin, cos] per freq)
  * NeRF MLP — nerf-ours/model.py:8-62
    (D=8 W=256 trunk, skip concat of the embedded input after layer `skips`,
    viewdir head: alpha from trunk, rgb from feature+viewdir half-width layer)

TPU-first notes:
  * parameters are a flat pytree of {w, b} fp32 leaves; matmuls run in a
    configurable ``compute_dtype`` (bfloat16 by default on TPU) with fp32
    accumulation via ``preferred_element_type`` — this is the AMP analog.
  * the whole point batch is evaluated as one [N, C] x [C, W] matmul chain so
    XLA tiles it onto the MXU; no chunking is needed under jit (the
    reference's netchunk at run_nerf.py:50-64 exists only to bound VRAM).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Frequency (positional) encoding
# ---------------------------------------------------------------------------

def embedder_out_dim(multires: int, input_dims: int = 3, include_input: bool = True) -> int:
    return input_dims * (int(include_input) + 2 * multires)


def embed_fn(x: jnp.ndarray, multires: int, include_input: bool = True) -> jnp.ndarray:
    """Frequency-encode the last axis.

    Layout matches the reference Embedder: [x, sin(2^0 x), cos(2^0 x),
    sin(2^1 x), cos(2^1 x), ...] with each term covering all input dims.
    """
    if multires <= 0:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)  # log-spaced 2^[0..multires-1]
    xb = x[..., None, :] * freqs[:, None]  # [..., F, D]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    enc = jnp.stack([sin, cos], axis=-2)  # [..., F, 2, D]
    enc = enc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------

def _linear_init(key, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_mlp(
    key,
    D: int = 8,
    W: int = 256,
    input_ch: int = 63,
    input_ch_views: int = 27,
    output_ch: int = 4,
    skips: Sequence[int] = (4,),
    use_viewdirs: bool = True,
) -> Params:
    keys = jax.random.split(key, D + 5)
    pts_linears = []
    in_dim = input_ch
    for i in range(D):
        pts_linears.append(_linear_init(keys[i], in_dim, W))
        in_dim = W + input_ch if i in skips else W
    params: Params = {"pts_linears": pts_linears}
    if use_viewdirs:
        params["feature_linear"] = _linear_init(keys[D], W, W)
        params["alpha_linear"] = _linear_init(keys[D + 1], W, 1)
        params["views_linear"] = _linear_init(keys[D + 2], input_ch_views + W, W // 2)
        params["rgb_linear"] = _linear_init(keys[D + 3], W // 2, 3)
    else:
        params["output_linear"] = _linear_init(keys[D], W, output_ch)
    return params


def _dense(x, layer, compute_dtype):
    w = layer["w"].astype(compute_dtype)
    y = jax.lax.dot_general(
        x.astype(compute_dtype), w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + layer["b"]


def apply_nerf_mlp(
    params: Params,
    pts_embedded: jnp.ndarray,
    views_embedded: jnp.ndarray | None,
    skips: Sequence[int] = (4,),
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Evaluate the field at embedded points.

    Args:
      pts_embedded: [..., input_ch] frequency-encoded positions.
      views_embedded: [..., input_ch_views] encoded unit view dirs, or None.
    Returns:
      raw [..., 4]: (rgb_logits, sigma_raw) in fp32.
    """
    h = pts_embedded
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_dense(h, layer, compute_dtype))
        if i in skips:
            h = jnp.concatenate([pts_embedded, h], axis=-1)

    if views_embedded is not None:
        alpha = _dense(h, params["alpha_linear"], compute_dtype)
        feature = _dense(h, params["feature_linear"], compute_dtype)
        h = jnp.concatenate([feature, views_embedded.astype(feature.dtype)], axis=-1)
        h = jax.nn.relu(_dense(h, params["views_linear"], compute_dtype))
        rgb = _dense(h, params["rgb_linear"], compute_dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return _dense(h, params["output_linear"], compute_dtype)


def make_nerf_field(
    multires: int = 10,
    multires_views: int = 4,
    netdepth: int = 8,
    netwidth: int = 256,
    use_viewdirs: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """Build (init_fn, query_fn) for the vanilla-NeRF backend.

    query_fn(params, pts [..,3], viewdirs [..,3] or None) -> raw [..,4];
    this is the network_query_fn analog (run_nerf.py:93-96) with encoding
    fused into the jitted graph.
    """
    input_ch = embedder_out_dim(multires)
    input_ch_views = embedder_out_dim(multires_views) if use_viewdirs else 0

    def init_fn(key):
        return init_nerf_mlp(
            key, D=netdepth, W=netwidth, input_ch=input_ch,
            input_ch_views=input_ch_views, use_viewdirs=use_viewdirs,
        )

    def query_fn(params, pts, viewdirs):
        pe = embed_fn(pts, multires)
        if use_viewdirs and viewdirs is not None:
            ve = embed_fn(viewdirs, multires_views)
            if pts.ndim == ve.ndim + 1:  # broadcast dirs over the samples axis
                ve = jnp.broadcast_to(ve[..., None, :], pts.shape[:-1] + (ve.shape[-1],))
        else:
            ve = None
        return apply_nerf_mlp(params, pe, ve, compute_dtype=compute_dtype)

    return init_fn, query_fn
