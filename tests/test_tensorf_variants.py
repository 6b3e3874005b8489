"""CP and CCNeRF variant tests."""

import jax
import jax.numpy as jnp
import numpy as np

from flnerf_tpu.models.tensorf_variants import (
    CCNeRFConfig,
    CPConfig,
    ccnerf_density,
    init_ccnerf,
    make_ccnerf_field,
    make_cp_field,
)


def test_cp_field_shapes_and_grads():
    cfg = CPConfig(resolution=(32, 32, 32), sigma_rank=8, color_rank=8,
                   color_feat_dim=12, num_layers=2, hidden_dim=32)
    init_fn, density_fn, rgb_fn = make_cp_field(cfg, jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    assert params["sigma_lines"][0].shape == (8, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 6, 3), minval=-1, maxval=1)
    sigma, feat = density_fn(params, x)
    assert sigma.shape == (4, 6) and feat.shape == (4, 6, 12)
    assert (np.asarray(sigma) > 0).all()
    rgb = rgb_fn(params, jnp.zeros((4, 6, 3)).at[..., 2].set(1.0), feat)
    assert rgb.shape == (4, 6, 3)

    g = jax.grad(lambda p: jnp.sum(density_fn(p, x)[0]))(params)
    assert float(jnp.abs(g["sigma_lines"][0]).sum()) > 0
    # color lines receive no gradient from sigma alone
    assert float(jnp.abs(g["color_lines"][0]).sum()) == 0


def test_ccnerf_rank_truncation_semantics():
    cfg = CCNeRFConfig(
        resolution=(16, 16, 16),
        rank_vec_density=(4, 8), rank_mat_density=(2, 4),
        rank_vec=(4, 8), rank_mat=(2, 4),
        color_feat_dim=8, num_layers=2, hidden_dim=16,
    )
    assert cfg.K == 2
    params = init_ccnerf(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)

    s1, f1 = ccnerf_density(params, x, cfg, level=1, compute_dtype=jnp.float32)
    s2, f2 = ccnerf_density(params, x, cfg, level=2, compute_dtype=jnp.float32)
    # level 2 adds residual ranks -> different output
    assert float(jnp.abs(s1 - s2).max()) > 0

    # zeroing the residual ranks makes level 2 collapse to level 1
    trunc = dict(params)
    for key, keep in (
        ("sigma_vec", 4), ("sigma_mat", 2), ("sigma_mat_line", 2),
        ("color_vec", 4), ("color_mat", 2), ("color_mat_line", 2),
    ):
        trunc[key] = [a.at[keep:].set(0.0) for a in params[key]]
    s2t, f2t = ccnerf_density(trunc, x, cfg, level=2, compute_dtype=jnp.float32)
    s1t, f1t = ccnerf_density(trunc, x, cfg, level=1, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(s2t), np.asarray(s1t), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f2t), np.asarray(f1t), rtol=1e-5, atol=1e-6)


def test_ccnerf_field_protocol():
    cfg = CCNeRFConfig(
        resolution=(16, 16, 16),
        rank_vec_density=(2, 4), rank_mat_density=(1, 2),
        rank_vec=(2, 4), rank_mat=(1, 2),
        color_feat_dim=6, num_layers=2, hidden_dim=16,
    )
    init_fn, density_fn, rgb_fn = make_ccnerf_field(cfg, level=-1,
                                                    compute_dtype=jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 5, 3), minval=-1, maxval=1)
    sigma, feat = density_fn(params, x)
    rgb = rgb_fn(params, jnp.zeros((3, 5, 3)).at[..., 2].set(1.0), feat)
    assert sigma.shape == (3, 5) and rgb.shape == (3, 5, 3)
    g = jax.grad(lambda p: jnp.sum(density_fn(p, x)[0]))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
