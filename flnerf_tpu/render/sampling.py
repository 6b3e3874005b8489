"""Depth sampling along rays: stratified coarse + inverse-CDF importance.

Parity targets:
  * stratified coarse samples — nerf-ours/render.py:244-266
  * sample_pdf (inverse-CDF via searchsorted) — nerf-ours/run_nerf_helpers.py:112-155

Everything here has static shapes and is jit/vmap-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(
    key,
    n_rays: int,
    near: jnp.ndarray,
    far: jnp.ndarray,
    n_samples: int,
    perturb: float = 1.0,
    lindisp: bool = False,
):
    """Coarse sample depths [n_rays, n_samples].

    near/far: scalars or [n_rays] arrays.
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    near = jnp.broadcast_to(jnp.asarray(near, jnp.float32), (n_rays,))[:, None]
    far = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n_rays,))[:, None]
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))

    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_pdf(key, bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int, det: bool = False):
    """Draw n_samples per ray from the piecewise-constant PDF over ``bins``.

    Args:
      bins: [N, B] bin edges (z_vals midpoints).
      weights: [N, B-1] unnormalized bin masses.
    Returns:
      samples [N, n_samples] (non-differentiable; callers stop_gradient as
      the reference detaches at render.py:281).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [N, B]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
