"""TensoRF VM-decomposition backend tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.tensorf import (
    TensoRFConfig,
    _sample_line,
    _sample_plane,
    density_l1_loss,
    init_tensorf,
    make_tensorf_field,
    upsample_tensorf,
)


def test_plane_line_sampling_align_corners():
    # plane value equals grid entry at exact grid coords (align_corners=True)
    plane = jnp.arange(2 * 4 * 4, dtype=jnp.float32).reshape(2, 4, 4)
    # u -> W axis, v -> H axis; corner (-1,-1) is entry [:, 0, 0]
    out = _sample_plane(plane, jnp.array([-1.0, 1.0]), jnp.array([-1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(plane[:, 0, 0]))
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(plane[:, 3, 3]))
    # midpoint between entries 0 and 1 along W: x = 0.5 -> u = 2*0.5/3 - 1
    mid = _sample_plane(plane, jnp.array([2 * 0.5 / 3 - 1.0]), jnp.array([-1.0]))
    expect = 0.5 * (plane[:, 0, 0] + plane[:, 0, 1])
    np.testing.assert_allclose(np.asarray(mid[:, 0]), np.asarray(expect), atol=1e-5)

    line = jnp.arange(3 * 5, dtype=jnp.float32).reshape(3, 5)
    out_l = _sample_line(line, jnp.array([-1.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out_l[:, 0]), np.asarray(line[:, 0]))
    np.testing.assert_allclose(np.asarray(out_l[:, 1]), np.asarray(line[:, 2]))
    np.testing.assert_allclose(np.asarray(out_l[:, 2]), np.asarray(line[:, 4]))


def test_tensorf_field_shapes_grads_and_rank_structure():
    cfg = TensoRFConfig(
        resolution=(16, 16, 16), sigma_rank=(4, 4, 4), color_rank=(8, 8, 8),
        color_feat_dim=12, num_layers=2, hidden_dim=32, bound=1.0,
    )
    init_fn, density_fn, rgb_fn = make_tensorf_field(cfg, compute_dtype=jnp.float32)
    params = init_fn(jax.random.PRNGKey(0))
    assert params["sigma_mat"][0].shape == (4, 16, 16)
    assert params["color_vec"][2].shape == (8, 16)
    assert params["basis"].shape == (24, 12)

    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 7, 3), minval=-1, maxval=1)
    sigma, feat = density_fn(params, x)
    assert sigma.shape == (5, 7)
    assert feat.shape == (5, 7, 12)
    assert (np.asarray(sigma) > 0).all()  # trunc_exp

    d = jnp.tile(jnp.array([[[0.0, 0.0, 1.0]]]), (5, 7, 1))
    rgb = rgb_fn(params, d, feat)
    assert rgb.shape == (5, 7, 3)

    def loss(p):
        s, f = density_fn(p, x)
        return jnp.sum(s) + jnp.sum(rgb_fn(p, d, f) ** 2) + density_l1_loss(p)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.abs(g["sigma_mat"][0]).sum()) > 0
    assert float(jnp.abs(g["basis"]).sum()) > 0


def test_tensorf_upsample():
    cfg = TensoRFConfig(resolution=(8, 8, 8), sigma_rank=(2, 2, 2), color_rank=(2, 2, 2))
    params = init_tensorf(jax.random.PRNGKey(0), cfg)
    params2, cfg2 = upsample_tensorf(params, cfg, (16, 16, 16))
    assert cfg2.resolution == (16, 16, 16)
    assert params2["sigma_mat"][0].shape == (2, 16, 16)
    assert params2["sigma_vec"][0].shape == (2, 16)
    # low-res content preserved at grid-aligned points (align_corners resize)
    a = np.asarray(params["sigma_vec"][0][:, 0])
    b = np.asarray(params2["sigma_vec"][0][:, 0])
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_tensorf_e2e_with_ngp_trainer():
    """TensoRF plugs into the occupancy-marching trainer unchanged."""
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import NGPSampler, NGPTrainConfig, NGPTrainer

    images, poses, rp, hwf, i_split = load_synthetic_data(n_train=6, n_test=1, H=32, W=32)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]

    cfg = TensoRFConfig(
        resolution=(32, 32, 32), sigma_rank=(4, 4, 4), color_rank=(8, 8, 8),
        color_feat_dim=12, num_layers=2, hidden_dim=32, bound=2.0,
    )
    init_fn, density_fn, rgb_fn = make_tensorf_field(cfg, compute_dtype=jnp.float32)
    rcfg = NGPRenderConfig(n_candidates=64, n_keep=32, grid_size=16, bound=2.0, bg_color=1.0)
    tcfg = NGPTrainConfig(max_steps=96, batch_rays=256, steps_per_chunk=16, lr=2e-2)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    s = NGPSampler(images[tr], poses[tr], K, tcfg)
    p0, _ = t.eval_images(poses[tr][:1], images[tr][:1], H, W, K, chunk=1024)
    t.fit(s, verbose=False)
    p1, _ = t.eval_images(poses[tr][:1], images[tr][:1], H, W, K, chunk=1024)
    assert p1 > p0, (p0, p1)
