"""Plenoxels backend tests: trilinear sampling, grid rendering vs closed
form, TV, prune/upsample, npz format parity, and a small e2e training run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.voxel_sh import (
    VoxelGrid,
    VoxelGridConfig,
    init_voxel_grid,
    load_npz,
    prune_grid,
    save_npz,
    trilinear_sample,
    tv_loss,
    upsample_grid,
    voxel_render_rays,
    world2grid,
)


def _cfg(**kw):
    d = dict(reso=(16, 16, 16), radius=(1.0, 1.0, 1.0), max_steps=64, step_size=0.5)
    d.update(kw)
    return VoxelGridConfig(**d)


def test_world2grid_roundtrip():
    cfg = _cfg()
    # world center maps to the grid center; +radius maps to reso-0.5-ish
    g = np.asarray(world2grid(cfg, jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])))
    np.testing.assert_allclose(g[0], [7.5, 7.5, 7.5], atol=1e-5)
    np.testing.assert_allclose(g[1], [15.5, 15.5, 15.5], atol=1e-5)


def test_trilinear_sample_exact_at_centers_and_midpoints():
    cfg = _cfg()
    grid = init_voxel_grid(cfg)
    density = np.zeros(cfg.reso, np.float32)
    density[3, 4, 5] = 2.0
    density[4, 4, 5] = 6.0
    grid = grid._replace(density=jnp.asarray(density))
    s, _ = trilinear_sample(grid, jnp.array([[3.0, 4.0, 5.0], [3.5, 4.0, 5.0]]), cfg)
    np.testing.assert_allclose(np.asarray(s), [2.0, 4.0], atol=1e-5)

    # pruned cells sample as zero
    grid2 = grid._replace(alive=jnp.zeros(cfg.reso, bool))
    s2, sh2 = trilinear_sample(grid2, jnp.array([[3.0, 4.0, 5.0]]), cfg)
    assert float(s2[0]) == 0.0


def test_render_constant_density_matches_beer_lambert():
    """Uniform density + constant SH -> analytic transmittance check."""
    cfg = _cfg(background_brightness=0.0, max_steps=128)
    sigma0 = 2.0
    grid = init_voxel_grid(cfg)
    grid = grid._replace(density=jnp.full(cfg.reso, sigma0))
    # constant color: DC coefficient only. rgb = clamp(c0 * Y00 + 0.5)
    sh = np.zeros((*cfg.reso, 27), np.float32)
    target = 0.9
    sh[..., 0] = (target - 0.5) / 0.28209479177387814   # R channel DC
    sh[..., 9] = (target - 0.5) / 0.28209479177387814   # G
    sh[..., 18] = (target - 0.5) / 0.28209479177387814  # B
    grid = grid._replace(sh=jnp.asarray(sh))

    rays_o = jnp.array([[0.0, 0.0, 3.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    out = voxel_render_rays(grid, rays_o, rays_d, cfg)
    # Beer-Lambert: the ray crosses world length ~2 of sigma=2 medium ->
    # acc = 1 - exp(-4); rgb = acc * target
    expect_acc = 1.0 - np.exp(-sigma0 * 2.0)
    np.testing.assert_allclose(float(out["acc"][0]), expect_acc, atol=0.01)
    np.testing.assert_allclose(
        np.asarray(out["rgb"][0]), target * expect_acc, atol=0.02
    )

    # empty grid -> background
    grid0 = init_voxel_grid(cfg)._replace(density=jnp.zeros(cfg.reso))
    cfg_bg = cfg._replace(background_brightness=1.0)
    out0 = voxel_render_rays(grid0, rays_o, rays_d, cfg_bg)
    np.testing.assert_allclose(np.asarray(out0["rgb"][0]), 1.0, atol=1e-4)
    assert float(out0["acc"][0]) < 1e-4


def test_render_miss_gets_background():
    cfg = _cfg(background_brightness=0.7)
    grid = init_voxel_grid(cfg)._replace(density=jnp.full(cfg.reso, 100.0))
    rays_o = jnp.array([[5.0, 0.0, 0.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])  # parallel to the cube, misses
    out = voxel_render_rays(grid, rays_o, rays_d, cfg)
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), 0.7, atol=1e-3)


def test_tv_loss():
    f = jnp.zeros((4, 4, 4))
    assert float(tv_loss(f)) == 0.0
    f2 = f.at[0, 0, 0].set(1.0)
    assert float(tv_loss(f2)) > 0
    # constant field has zero TV regardless of value
    assert float(tv_loss(jnp.full((4, 4, 4), 3.7))) < 1e-10


def test_prune_and_upsample():
    cfg = _cfg(reso=(8, 8, 8))
    grid = init_voxel_grid(cfg)
    density = np.zeros((8, 8, 8), np.float32)
    density[4, 4, 4] = 10.0
    grid = grid._replace(density=jnp.asarray(density))
    pruned = prune_grid(grid, sigma_thresh=5.0, dilate=1)
    alive = np.asarray(pruned.alive)
    assert alive[4, 4, 4]
    assert alive[3, 4, 4] and alive[5, 4, 4]  # dilation
    assert not alive[0, 0, 0]

    up = upsample_grid(grid, (16, 16, 16))
    assert up.density.shape == (16, 16, 16)
    assert up.sh.shape == (16, 16, 16, 27)
    assert float(up.density.max()) > 1.0  # mass preserved-ish


def test_npz_roundtrip_reference_layout(tmp_path):
    cfg = _cfg(reso=(8, 8, 8))
    grid = init_voxel_grid(cfg)
    rng = np.random.default_rng(0)
    grid = grid._replace(
        density=jnp.asarray(rng.normal(size=(8, 8, 8)).astype(np.float32)),
        sh=jnp.asarray(rng.normal(size=(8, 8, 8, 27)).astype(np.float32) * 0.1),
        alive=jnp.asarray(rng.random((8, 8, 8)) > 0.3),
    )
    path = str(tmp_path / "ckpt00.npz")
    save_npz(path, grid, cfg)

    z = np.load(path)
    # reference field layout (svox2.py:1531-1558)
    for k in ("radius", "center", "links", "density_data", "sh_data", "basis_type"):
        assert k in z, k
    assert z["links"].shape == (8, 8, 8)
    assert z["sh_data"].dtype == np.float16
    assert z["density_data"].shape[1] == 1
    n_alive = int(np.asarray(grid.alive).sum())
    assert z["density_data"].shape[0] == n_alive

    g2, cfg2 = load_npz(path)
    assert cfg2.reso == (8, 8, 8)
    np.testing.assert_array_equal(np.asarray(g2.alive), np.asarray(grid.alive))
    alive = np.asarray(grid.alive)
    np.testing.assert_allclose(
        np.asarray(g2.density)[alive], np.asarray(grid.density)[alive], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g2.sh)[alive], np.asarray(grid.sh)[alive], atol=1e-2  # fp16
    )


@pytest.mark.slow
def test_plenoxels_e2e_training_improves():
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.rays.camera import get_rays_np, intrinsics_matrix
    from flnerf_tpu.rays.quadtree import RayBudgeter
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsTrainConfig,
        PlenoxelsTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(n_train=6, n_test=1, H=32, W=32)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr, te = i_split[0], i_split[2]
    o = np.stack([get_rays_np(H, W, K, p[:3, :4])[0] for p in poses[tr]], 0)
    d = np.stack([get_rays_np(H, W, K, p[:3, :4])[1] for p in poses[tr]], 0)
    b = RayBudgeter(images[tr], o, d, init_level=2, seed=0)

    gcfg = VoxelGridConfig(
        reso=(48, 48, 48), radius=(1.2, 1.2, 1.2), max_steps=160,
        step_size=0.7, init_sigma=0.1, background_brightness=1.0,
    )
    tcfg = PlenoxelsTrainConfig(
        n_epoch=3, batch_size=512, steps_per_chunk=4,
        lr_sigma=1e1, lr_sh=1e-2, lr_sigma_delay_steps=0,
        subdivide_every=1, subdivide_thres=0.05,
        lambda_tv=1e-5, lambda_tv_sh=1e-3,
    )
    t = PlenoxelsTrainer(gcfg, tcfg)
    # 6 tiny views overfit a voxel grid hard (floaters at held-out views, as
    # with real plenoxels at low view counts); the e2e check is that the
    # optimizer actually carves the grid: train-view PSNR must rise sharply.
    p0, _ = t.eval_images(poses[tr][:2], images[tr][:2], H, W, K, chunk=1024)
    t.fit(b, verbose=False)
    p1, s1 = t.eval_images(poses[tr][:2], images[tr][:2], H, W, K, chunk=1024)
    assert p1 > p0 + 2.0, (p0, p1)
    # golden pin (seeded): reaches 17.05 dB here; a convergence regression
    # in the XLA train path fails this before it fails the delta check
    assert p1 > 16.3, (p0, p1)
    assert p1 > 15.0
    # the quadtree subdivided on the way
    assert b.forest.n_leaves > 6 * 4


def test_nvol_backend_single_voxel_closed_form():
    """nvol weights: w_i = min(sum a, 1) increments
    (render_lerp_kernel_nvol.cu:88-96)."""
    cfg = VoxelGridConfig(
        reso=(8, 8, 8), radius=(1.0,) * 3, max_steps=64, step_size=0.5,
        backend="nvol", background_brightness=0.0,
    )
    sigma0 = 0.8
    grid = VoxelGrid(
        density=jnp.full((8, 8, 8), sigma0),
        sh=jnp.zeros((8, 8, 8, 27)).at[..., 0].set(1.0),  # DC-only sh
        alive=jnp.ones((8, 8, 8), bool),
    )
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = voxel_render_rays(grid, o, d, cfg)
    # constant sigma: a = 1 - exp(-step*sigma*ds) per step; total saturates
    # at 1 -> acc == 1 if enough steps
    ds = 1.0 / (0.5 * 8 / 1.0)  # delta_scale for this grid
    a = 1.0 - np.exp(-0.5 * sigma0 * ds)
    n_inside = 8 / 0.5  # steps crossing the grid
    expected_acc = min(n_inside * a, 1.0)
    np.testing.assert_allclose(float(out["acc"][0]), expected_acc, atol=0.05)
    # sh ch0 is R's DC coefficient; G/B have DC 0 -> clamp(0.5)
    c0 = 0.28209479177387814
    np.testing.assert_allclose(
        np.asarray(out["rgb"][0]),
        [expected_acc * (c0 + 0.5), expected_acc * 0.5, expected_acc * 0.5],
        atol=0.05)


def test_svox1_backend_constant_voxels():
    """svox1 (nearest-neighbor DDA) on a uniform grid matches the
    Beer-Lambert integral through the box."""
    cfg = VoxelGridConfig(
        reso=(8, 8, 8), radius=(1.0,) * 3, max_steps=64, step_size=0.5,
        backend="svox1", background_brightness=1.0,
    )
    sigma0 = 0.5
    grid = VoxelGrid(
        density=jnp.full((8, 8, 8), sigma0),
        sh=jnp.zeros((8, 8, 8, 27)).at[..., 0].set(1.0),
        alive=jnp.ones((8, 8, 8), bool),
    )
    o = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])  # hit / miss
    out = voxel_render_rays(grid, o, d, cfg)
    # DDA crosses ~7 unit cells (size-1 box), each contributing
    # exp-attenuation with delta ~= 1 voxel * delta_scale
    ds = 1.0 / (0.5 * 8)
    path = 7.0 * (1.0 + 1e-2)
    expected_T = np.exp(-path * ds * sigma0)
    np.testing.assert_allclose(float(out["acc"][0]), 1 - expected_T, atol=0.03)
    # miss ray renders pure background
    np.testing.assert_allclose(np.asarray(out["rgb"][1]), 1.0, atol=1e-5)
    # rgb = acc*(clamped sh) + T*bg, per channel (ch0 = R's DC)
    c0 = 0.28209479177387814
    a = 1 - expected_T
    np.testing.assert_allclose(
        np.asarray(out["rgb"][0]),
        [a * (c0 + 0.5) + expected_T, a * 0.5 + expected_T,
         a * 0.5 + expected_T], atol=0.03)


def test_msi_background_renders_and_roundtrips(tmp_path):
    cfg = VoxelGridConfig(
        reso=(8, 8, 8), radius=(0.5,) * 3, max_steps=32, step_size=0.5,
        background_nlayers=4, background_reso=16,
        background_brightness=0.0,
    )
    grid = init_voxel_grid(cfg)
    assert grid.background.shape == (32, 16, 4, 4)
    # empty grid + a bright opaque background shell: rays should see it
    bg = np.zeros((32, 16, 4, 4), np.float32)
    bg[..., 3] = 2000.0                  # sigma (opaque shell)
    bg[..., 0] = (0.7 - 0.5) / 0.28209479177387814   # red solves c0*v+.5=0.7
    grid = grid._replace(
        background=jnp.asarray(bg),
        density=jnp.zeros_like(grid.density),
    )
    rng = np.random.default_rng(0)
    d = rng.standard_normal((16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((16, 3), np.float32)
    out = voxel_render_rays(grid, jnp.asarray(o), jnp.asarray(d), cfg)
    np.testing.assert_allclose(np.asarray(out["rgb"][:, 0]), 0.7, atol=0.02)
    np.testing.assert_allclose(np.asarray(out["rgb"][:, 1]), 0.5, atol=0.02)

    # gradients flow into the background
    def loss(bgv):
        g = grid._replace(background=bgv)
        return jnp.mean(voxel_render_rays(g, jnp.asarray(o), jnp.asarray(d), cfg)["rgb"])
    gbg = jax.grad(loss)(grid.background)
    assert float(jnp.abs(gbg).max()) > 0

    # npz round-trip includes background fields (svox2.py:1531-1558 layout)
    path = str(tmp_path / "bg.npz")
    save_npz(path, grid, cfg)
    z = np.load(path)
    assert z["background_links"].shape == (32, 16)
    assert z["background_data"].shape == (512, 4, 4)
    g2, cfg2 = load_npz(path)
    assert cfg2.background_nlayers == 4 and cfg2.background_reso == 16
    np.testing.assert_allclose(
        np.asarray(g2.background), np.asarray(grid.background), atol=1e-2)


def test_tv_slab_unbiased():
    """Averaging tv_loss_slab over every possible z0 must reproduce the
    dense tv_loss exactly (the inverse-probability weights make the
    random-slab estimator unbiased), with and without an alive mask."""
    from flnerf_tpu.models.voxel_sh import tv_loss_slab

    rng = np.random.default_rng(0)
    X, Y, Z, S = 5, 6, 9, 4
    field = jnp.asarray(rng.standard_normal((X, Y, Z, 3)), jnp.float32)
    alive = jnp.asarray(rng.random((X, Y, Z)) > 0.3)

    class FixedKey:
        pass

    for mask in (None, alive):
        dense = float(tv_loss(field, mask))
        # enumerate z0 by monkeypatching randint via a key that maps to
        # each start: simpler — call the internals through jax by fixing
        # the key per start using fold_in until every start is seen.
        # Deterministic alternative: evaluate with a stubbed randint.
        import flnerf_tpu.models.voxel_sh as vs
        est = []
        orig = jax.random.randint
        try:
            for z0 in range(Z - S + 1):
                jax.random.randint = (
                    lambda key, shape, lo, hi, _z=z0: jnp.asarray(_z))
                est.append(float(tv_loss_slab(field, jax.random.PRNGKey(0),
                                              S, mask)))
        finally:
            jax.random.randint = orig
        np.testing.assert_allclose(np.mean(est), dense, rtol=1e-5)


def test_tv_slab_full_slab_matches_dense():
    """slab == Z degenerates to the dense TV (single start, all weights 1)."""
    from flnerf_tpu.models.voxel_sh import tv_loss_slab

    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.standard_normal((4, 4, 6, 2)), jnp.float32)
    dense = float(tv_loss(field))
    slab = float(tv_loss_slab(field, jax.random.PRNGKey(3), 6))
    np.testing.assert_allclose(slab, dense, rtol=1e-6)


def test_trainer_tv_sparsity_runs():
    """tv_sparsity < 1 trains end-to-end (XLA path) and changes only the
    TV estimate, not the data term."""
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsTrainConfig, PlenoxelsTrainer,
    )
    from flnerf_tpu.rays.quadtree import RayEpoch

    cfg = _cfg(reso=(12, 12, 12))
    tcfg = PlenoxelsTrainConfig(
        n_epoch=1, batch_size=64, steps_per_chunk=2, lr_sigma=1e1,
        lr_sh=1e-2, lr_sigma_delay_steps=0, tv_sparsity=0.5,
        use_kernel=False)
    trainer = PlenoxelsTrainer(cfg, tcfg)
    rng = np.random.default_rng(0)
    n = 128
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    ep = RayEpoch(
        origins=np.tile(np.array([[0, 0, -2.0]], np.float32), (n, 1)),
        dirs=(d / np.linalg.norm(d, axis=-1, keepdims=True)),
        rgb=rng.random((n, 3)).astype(np.float32),
        leaf_id=np.zeros(n, np.int32), n_leaves=4)
    stat, mse = trainer.run_epoch_rays(ep)
    assert np.isfinite(mse)


def test_tv_lumisphere_runs_and_grads():
    """Lumisphere TV (loss_kernel.cu:336 analog): finite, zero for a
    spatially constant radiance field, grads flow into sh AND the
    learned basis."""
    from flnerf_tpu.models.voxel_sh import init_voxel_grid, tv_loss_lumisphere

    cfg = _cfg(reso=(8, 8, 8), basis_type="3d_texture", basis_dim=9,
               basis_reso=8)
    grid = init_voxel_grid(cfg)
    rng = np.random.default_rng(0)
    grid = grid._replace(
        basis=jnp.asarray(rng.standard_normal(grid.basis.shape),
                          jnp.float32))
    key = jax.random.PRNGKey(0)

    # constant sh -> constant radiance -> zero spatial TV
    const = grid._replace(sh=jnp.ones_like(grid.sh) * 0.3)
    v0 = float(tv_loss_lumisphere(const, cfg, key, slab=4))
    assert abs(v0) < 1e-10

    grid = grid._replace(
        sh=jnp.asarray(rng.standard_normal(grid.sh.shape), jnp.float32))
    v = float(tv_loss_lumisphere(grid, cfg, key, slab=4,
                                 dir_factor=0.5))
    assert np.isfinite(v) and v > 0

    g_sh = jax.grad(lambda s: tv_loss_lumisphere(
        grid._replace(sh=s), cfg, key, 4, 0.5))(grid.sh)
    g_b = jax.grad(lambda b: tv_loss_lumisphere(
        grid._replace(basis=b), cfg, key, 4, 0.5))(grid.basis)
    assert float(jnp.abs(g_sh).max()) > 0
    assert float(jnp.abs(g_b).max()) > 0


def test_trainer_lumisphere_tv_runs():
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsTrainConfig, PlenoxelsTrainer,
    )
    from flnerf_tpu.rays.quadtree import RayEpoch

    cfg = _cfg(reso=(12, 12, 12), basis_type="3d_texture", basis_dim=9,
               basis_reso=8)
    tcfg = PlenoxelsTrainConfig(
        n_epoch=1, batch_size=64, steps_per_chunk=2, lr_sigma=1e1,
        lr_sh=1e-2, lr_sigma_delay_steps=0,
        lambda_tv_lumisphere=1e-3, tv_lumisphere_dir_factor=0.1,
        use_kernel=False)
    trainer = PlenoxelsTrainer(cfg, tcfg)
    rng = np.random.default_rng(0)
    n = 128
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    ep = RayEpoch(
        origins=np.tile(np.array([[0, 0, -2.0]], np.float32), (n, 1)),
        dirs=(d / np.linalg.norm(d, axis=-1, keepdims=True)),
        rgb=rng.random((n, 3)).astype(np.float32),
        leaf_id=np.zeros(n, np.int32), n_leaves=4)
    stat, mse = trainer.run_epoch_rays(ep)
    assert np.isfinite(mse)

    import pytest
    with pytest.raises(ValueError):
        PlenoxelsTrainer(_cfg(), tcfg._replace(use_kernel=True))


def test_tv_lumisphere_angular_unbiased():
    """Averaging the dir_factor (angular) term over every slab start must
    equal the slab == Z value: the 1/p_xy weighting makes the random-slab
    angular estimator unbiased, so a tuned dir_factor transfers across
    slab settings (ADVICE r4)."""
    from flnerf_tpu.models.voxel_sh import init_voxel_grid, tv_loss_lumisphere
    import flnerf_tpu.models.voxel_sh as vs

    cfg = _cfg(reso=(6, 6, 9), basis_type="3d_texture", basis_dim=9,
               basis_reso=8)
    rng = np.random.default_rng(2)
    grid = init_voxel_grid(cfg)
    grid = grid._replace(
        sh=jnp.asarray(rng.standard_normal(grid.sh.shape), jnp.float32),
        basis=jnp.asarray(rng.standard_normal(grid.basis.shape),
                          jnp.float32),
        alive=jnp.asarray(rng.random((6, 6, 9)) > 0.3))
    key = jax.random.PRNGKey(7)
    Z, S = 9, 4

    def only_angular(slab, z0_stub=None):
        """spatial part cancels: (dir_factor=1) - (dir_factor=0)."""
        orig = jax.random.randint
        try:
            if z0_stub is not None:
                jax.random.randint = (
                    lambda key, shape, lo, hi, _z=z0_stub: jnp.asarray(_z))
            hi = float(tv_loss_lumisphere(grid, cfg, key, slab,
                                          dir_factor=1.0))
            lo = float(tv_loss_lumisphere(grid, cfg, key, slab,
                                          dir_factor=0.0))
        finally:
            jax.random.randint = orig
        return hi - lo

    dense = only_angular(Z)
    est = [only_angular(S, z0_stub=z0) for z0 in range(Z - S + 1)]
    np.testing.assert_allclose(np.mean(est), dense, rtol=1e-5)
