"""Alpha compositing of raw field outputs along rays (raw2outputs).

Parity target: nerf-ours/render.py:149-192.
  alpha_i   = 1 - exp(-relu(sigma_i) * delta_i * ||d||)
  T_i       = prod_{j<i} (1 - alpha_j + 1e-10)        (exclusive cumprod)
  weight_i  = alpha_i * T_i
  rgb_map   = sum_i weight_i * sigmoid(rgb_i)  (+ white background residual)

Pure JAX with static shapes; XLA fuses the whole chain into the surrounding
render graph, so this is already bandwidth-optimal on TPU for the MLP
backends (the matmuls dominate).  The voxel/hash backends get a fused Pallas
march+composite kernel in flnerf_tpu/ops instead.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray      # [N, 3]
    disp: jnp.ndarray     # [N]
    acc: jnp.ndarray      # [N]
    weights: jnp.ndarray  # [N, S]
    depth: jnp.ndarray    # [N]


def exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """cumprod shifted right with a leading 1 (transmittance T_i)."""
    return jnp.cumprod(
        jnp.concatenate([jnp.ones_like(x[..., :1]), x[..., :-1]], -1), -1
    )


def raw2outputs(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    noise_key=None,
) -> RenderOutputs:
    """Composite raw (rgb_logits, sigma) samples into per-ray outputs.

    Args:
      raw: [N, S, 4] field outputs.
      z_vals: [N, S] sample depths.
      rays_d: [N, 3] (non-normalized) ray directions.
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if raw_noise_std > 0.0 and noise_key is not None:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    weights = alpha * exclusive_cumprod(1.0 - alpha + 1e-10)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)
