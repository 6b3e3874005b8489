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

    # TPU-first inverse CDF: the vmapped searchsorted + 4 in-row gathers
    # lower terribly here (measured 32 ms per 1920x128 draw — nearly half
    # the NeRF train step).  searchsorted(cdf, u, 'right') == the count of
    # cdf entries <= u (one [N, S, B] broadcast compare-sum), and the
    # below/above fetches are one-hot contractions the MXU eats: ~30x
    # cheaper, bit-identical indices.
    b_dim = cdf.shape[-1]
    inds = jnp.sum((u[..., :, None] >= cdf[..., None, :]).astype(jnp.int32),
                   axis=-1)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(b_dim - 1, inds)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, b_dim), 2)
    oh_below = (below[..., :, None] == iota).astype(cdf.dtype)  # [N, S, B]
    oh_above = (above[..., :, None] == iota).astype(cdf.dtype)
    src = jnp.stack([cdf, bins], -1)                            # [N, B, 2]
    g_below = jnp.einsum("nsb,nbc->nsc", oh_below, src)
    g_above = jnp.einsum("nsb,nbc->nsc", oh_above, src)
    cdf_below, bins_below = g_below[..., 0], g_below[..., 1]
    cdf_above, bins_above = g_above[..., 0], g_above[..., 1]

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
