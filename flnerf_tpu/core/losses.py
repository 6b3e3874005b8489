"""Training losses (ngp-ours/loss.py parity).

  * mape_loss — loss.py:7-15 (also re-exported by models/sdf.py)
  * huber_loss — loss.py:18-27
  * eff_distloss — loss.py:30-76: the O(N) mip-NeRF-360 distortion loss of
    "Efficient distortion loss" (weights w at midpoints m with interval
    lengths dt):  L = sum_i sum_j w_i w_j |m_i - m_j| + (1/3) sum_i w_i^2 dt_i
    computed in O(N) with prefix sums instead of the O(N^2) pairwise form.
"""

from __future__ import annotations

import jax.numpy as jnp

from flnerf_tpu.models.sdf import mape_loss  # noqa: F401 (re-export)


def huber_loss(pred, gt, delta: float = 0.1, reduce: bool = True):
    """Quadratic near zero, linear beyond delta (loss.py:18-27)."""
    err = jnp.abs(pred - gt)
    loss = jnp.where(err < delta, 0.5 * err ** 2 / delta, err - 0.5 * delta)
    return jnp.mean(loss) if reduce else loss


def eff_distloss(w, m, dt):
    """O(N) distortion loss.

    Args:
      w: [..., N] sample weights.
      m: [..., N] sample midpoints (ascending along the last axis).
      dt: [..., N] interval lengths.
    """
    # pairwise term via prefix sums: for ascending m,
    # sum_{i>j} w_i w_j (m_i - m_j)
    #   = sum_i w_i (m_i * csum(w)_{<i} - csum(w*m)_{<i})
    cw = jnp.cumsum(w, -1)
    cwm = jnp.cumsum(w * m, -1)
    cw_prev = jnp.concatenate([jnp.zeros_like(cw[..., :1]), cw[..., :-1]], -1)
    cwm_prev = jnp.concatenate([jnp.zeros_like(cwm[..., :1]), cwm[..., :-1]], -1)
    pairwise = jnp.sum(w * (m * cw_prev - cwm_prev), -1)
    self_term = jnp.sum(w ** 2 * dt, -1) / 3.0
    return jnp.mean(2.0 * pairwise + self_term)
