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


def test_tensorf_shrink():
    """shrink_model analog (network.py:283-319): occupancy stats tighten
    the training aabb and slice the factor windows to match."""
    from flnerf_tpu.models.tensorf import norm_coords, shrink_tensorf

    cfg = TensoRFConfig(resolution=(32, 32, 32), sigma_rank=(2, 2, 2),
                        color_rank=(2, 2, 2), bound=1.0)
    params = init_tensorf(jax.random.PRNGKey(0), cfg)
    g = 16
    occ = np.zeros((g, g, g), np.float32)
    occ[4:12, 4:12, 6:10] = 1.0          # occupied sub-box
    params2, cfg2 = shrink_tensorf(params, cfg, occ, mean_density=0.5,
                                   grid_bound=1.0, density_thresh=0.01)
    assert cfg2.aabb is not None
    amin, amax = np.asarray(cfg2.aabb[:3]), np.asarray(cfg2.aabb[3:])
    assert np.all(amin > -1.0) and np.all(amax < 1.0)
    assert np.all(amax > amin)
    # z axis occupied thinner than x/y -> tighter bounds and fewer cells
    assert (amax - amin)[2] < (amax - amin)[0]
    rx, ry, rz = cfg2.resolution
    assert rz < 32 and rx < 32
    assert params2["sigma_mat"][0].shape[1:] == (ry, rx)
    assert params2["sigma_vec"][0].shape == (2, rz)
    # a point inside the kept region keeps its factor coordinates:
    # new normalized coords must address (approximately) the same texels
    x = jnp.asarray([[0.0, 0.0, 0.0]])
    c_old = np.asarray(norm_coords(x, cfg))
    c_new = np.asarray(norm_coords(x, cfg2))
    assert np.all(np.abs(c_new) <= 1.0)

    # empty grid: no-op
    p3, c3 = shrink_tensorf(params, cfg, np.zeros((g, g, g), np.float32),
                            0.0, 1.0)
    assert c3.resolution == cfg.resolution


@pytest.mark.slow
def test_tensorf_e2e_through_shrink_upsample():
    """fit -> shrink+upsample (replace_field, optimizer reset) -> fit:
    the tensoRF/utils.py:112-128 boundary, end to end."""
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.tensorf import shrink_tensorf, upsample_tensorf
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import NGPSampler, NGPTrainConfig, NGPTrainer

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=6, n_test=1, H=32, W=32)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]

    cfg = TensoRFConfig(
        resolution=(24, 24, 24), sigma_rank=(4, 4, 4), color_rank=(8, 8, 8),
        color_feat_dim=12, num_layers=2, hidden_dim=32, bound=2.0,
    )
    init_fn, density_fn, rgb_fn = make_tensorf_field(cfg, jnp.float32)
    rcfg = NGPRenderConfig(n_candidates=64, n_keep=32, grid_size=16,
                           bound=2.0)
    tcfg = NGPTrainConfig(max_steps=128, batch_rays=256, steps_per_chunk=16,
                          lr=2e-2)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    s = NGPSampler(images[tr], poses[tr], K, tcfg)
    t.fit(s, verbose=False, n_steps=64)

    params, cfg = shrink_tensorf(
        t.state.params, cfg, np.asarray(t.occ.density),
        float(t.occ.mean_density), rcfg.bound, rcfg.density_thresh)
    assert cfg.aabb is not None
    params, cfg = upsample_tensorf(params, cfg, (32, 32, 32))
    _, density_fn, rgb_fn = make_tensorf_field(cfg, jnp.float32)
    t.replace_field(density_fn, rgb_fn, params)
    t.fit(s, verbose=False, n_steps=64)
    p1, _ = t.eval_images(poses[tr][:1], images[tr][:1], H, W, K, chunk=1024)
    assert np.isfinite(p1) and p1 > 8.0, p1
