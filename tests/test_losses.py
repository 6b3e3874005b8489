"""Loss functions (loss.py parity) + mark_untrained_grid."""

import jax.numpy as jnp
import numpy as np

from flnerf_tpu.core.losses import eff_distloss, huber_loss, mape_loss


def test_huber():
    pred = jnp.array([0.0, 0.05, 1.0])
    gt = jnp.zeros(3)
    l = np.asarray(huber_loss(pred, gt, delta=0.1, reduce=False))
    assert abs(l[0]) < 1e-9
    assert abs(l[1] - 0.5 * 0.05 ** 2 / 0.1) < 1e-7   # quadratic zone
    assert abs(l[2] - (1.0 - 0.05)) < 1e-7            # linear zone


def test_eff_distloss_matches_quadratic_form():
    rng = np.random.default_rng(0)
    N = 32
    w = rng.random((4, N)).astype(np.float32) * 0.1
    m = np.sort(rng.random((4, N)).astype(np.float32), -1)
    dt = rng.random((4, N)).astype(np.float32) * 0.01
    got = float(eff_distloss(jnp.asarray(w), jnp.asarray(m), jnp.asarray(dt)))
    # O(N^2) oracle
    pair = np.abs(m[:, :, None] - m[:, None, :])
    quad = (w[:, :, None] * w[:, None, :] * pair).sum((-1, -2))
    expect = float((quad + (w ** 2 * dt).sum(-1) / 3.0).mean())
    assert abs(got - expect) < 1e-5


def test_distloss_prefers_compact_weights():
    m = jnp.linspace(0, 1, 16)[None]
    dt = jnp.full((1, 16), 1 / 16)
    compact = jnp.zeros((1, 16)).at[0, 7:9].set(0.5)
    spread = jnp.full((1, 16), 1 / 16)
    assert float(eff_distloss(compact, m, dt)) < float(eff_distloss(spread, m, dt))


def test_mark_untrained_grid():
    from flnerf_tpu.render.ngp import (
        NGPRenderConfig,
        init_occupancy,
        mark_untrained_grid,
        update_occupancy,
    )
    import jax

    rcfg = NGPRenderConfig(grid_size=16, bound=1.0)
    occ = init_occupancy(rcfg)
    # single camera at +z looking along -z: cells far behind it are invisible
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 2.0
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
    occ2 = mark_untrained_grid(occ, pose[None], K, 16, 16, rcfg)
    d = np.asarray(occ2.density)
    assert (d == -1).any() and (d == 0).any()
    # refresh never revives pinned cells
    dense_fn = lambda p, x: (jnp.full(x.shape[:-1], 5.0), jnp.zeros(x.shape[:-1] + (1,)))
    occ3 = update_occupancy(occ2, None, dense_fn, jax.random.PRNGKey(0), rcfg)
    d3 = np.asarray(occ3.density)
    assert (d3[d == -1] == -1).all()
    assert (d3[d == 0] > 0).all()
