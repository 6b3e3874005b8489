"""svox2 learned basis types (svox2.py:461-496): 3D-texture and MLP bases,
optim_basis_step wiring, npz round-trip (VERDICT r2 item 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.voxel_sh import (
    VoxelGrid,
    VoxelGridConfig,
    eval_basis,
    init_basis,
    init_voxel_grid,
    load_npz,
    save_npz,
    voxel_render_rays,
)
from flnerf_tpu.ops.sh_encoding import sh_encode


def _dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_3d_texture_parity_with_sh_when_baked():
    """A texture basis baked with the SH polynomials reproduces the
    closed-form SH path on a shared scene (the VERDICT parity check)."""
    reso = (12, 12, 12)
    rng = np.random.default_rng(1)
    sh = rng.standard_normal(reso + (27,)).astype(np.float32) * 0.3
    dens = rng.random(reso).astype(np.float32) * 2.0
    alive = jnp.ones(reso, bool)

    cfg_sh = VoxelGridConfig(reso=reso, max_steps=32, step_size=0.7)
    cfg_tx = cfg_sh._replace(basis_type="3d_texture", basis_reso=48)

    # bake: texel at cube position v holds the SH bases of normalize(v)
    r = cfg_tx.basis_reso
    idx = np.arange(r)
    gx, gy, gz = np.meshgrid(idx, idx, idx, indexing="ij")
    v = np.stack([gx, gy, gz], -1) / (r - 1) * 2.0 - 1.0
    vn = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
    baked = np.asarray(sh_encode(jnp.asarray(vn.reshape(-1, 3)), 3))
    basis = jnp.asarray(baked.reshape(r, r, r, 9))

    g_sh = VoxelGrid(jnp.asarray(dens), jnp.asarray(sh), alive)
    g_tx = VoxelGrid(jnp.asarray(dens), jnp.asarray(sh), alive, basis=basis)

    d = jnp.asarray(_dirs(64))
    o = jnp.asarray(np.tile([[0.0, 0.0, 0.0]], (64, 1)).astype(np.float32))
    # basis values themselves match to trilinear-interp tolerance
    b_sh = np.asarray(eval_basis(g_sh, d, cfg_sh))
    b_tx = np.asarray(eval_basis(g_tx, d, cfg_tx))
    assert np.abs(b_sh - b_tx).max() < 0.03, np.abs(b_sh - b_tx).max()
    # and so do rendered images
    rgb_sh = np.asarray(voxel_render_rays(g_sh, o, d, cfg_sh)["rgb"])
    rgb_tx = np.asarray(voxel_render_rays(g_tx, o, d, cfg_tx)["rgb"])
    assert np.abs(rgb_sh - rgb_tx).max() < 0.03


def test_mlp_basis_shapes_and_grads():
    cfg = VoxelGridConfig(reso=(8, 8, 8), basis_type="mlp", mlp_width=16,
                          mlp_posenc_size=2, max_steps=16)
    grid = init_voxel_grid(cfg)
    assert set(grid.basis) == {f"{k}{i}" for k in "wb" for i in range(4)}
    assert grid.basis["w0"].shape == (3 + 6 * 2, 16)
    assert grid.basis["w3"].shape == (16, 9)
    d = jnp.asarray(_dirs(32))
    out = eval_basis(grid, d, cfg)
    assert out.shape == (32, 9)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid

    o = jnp.zeros((32, 3))
    grid = grid._replace(sh=grid.sh + 0.3, density=grid.density + 1.0)

    def loss(basis):
        g = grid._replace(basis=basis)
        return jnp.mean(voxel_render_rays(g, o, d, cfg)["rgb"])

    g = jax.grad(loss)(grid.basis)
    assert all(float(jnp.abs(v).max()) > 0 for v in g.values())


def test_basis_training_moves_params():
    """optim_basis_step analog: the trainer updates the learned basis."""
    from flnerf_tpu.rays.quadtree import RayEpoch
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsTrainConfig, PlenoxelsTrainer,
    )

    gcfg = VoxelGridConfig(reso=(8, 8, 8), radius=(0.5,) * 3, max_steps=16,
                           step_size=0.7, basis_type="mlp", mlp_width=8,
                           mlp_posenc_size=0, init_sigma=1.0)
    tcfg = PlenoxelsTrainConfig(
        n_epoch=1, batch_size=64, steps_per_chunk=2, lr_sigma=1e0,
        lr_sigma_delay_steps=0, lr_basis=1e-2, subdivide_every=0,
        lambda_tv=0.0, lambda_tv_sh=0.0)
    t = PlenoxelsTrainer(gcfg, tcfg)
    assert t.state.rms_basis is not None
    t.state = t.state._replace(
        grid=t.state.grid._replace(sh=t.state.grid.sh + 0.5))
    b0 = {k: np.asarray(v).copy() for k, v in t.state.grid.basis.items()}
    d = _dirs(128)
    ep = RayEpoch(origins=np.zeros((128, 3), np.float32), dirs=d,
                  rgb=np.full((128, 3), 0.25, np.float32),
                  leaf_id=np.zeros(128, np.int32), n_leaves=1)
    t.run_epoch_rays(ep)
    moved = max(np.abs(np.asarray(t.state.grid.basis[k]) - b0[k]).max()
                for k in b0)
    assert moved > 1e-7, moved


def test_basis_kernel_path_rejected():
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsTrainConfig, PlenoxelsTrainer,
    )

    gcfg = VoxelGridConfig(reso=(8, 8, 8), basis_type="3d_texture",
                           basis_reso=8)
    with pytest.raises(ValueError, match="basis_type"):
        PlenoxelsTrainer(gcfg, PlenoxelsTrainConfig(use_kernel=True))


def test_basis_npz_roundtrip(tmp_path):
    for btype in ("3d_texture", "mlp"):
        cfg = VoxelGridConfig(reso=(8, 8, 8), basis_type=btype,
                              basis_reso=8, mlp_width=8, mlp_posenc_size=1)
        grid = init_voxel_grid(cfg)
        if btype == "3d_texture":
            grid = grid._replace(
                basis=grid.basis + jnp.arange(8.0)[None, None, :, None])
        p = str(tmp_path / f"{btype}.npz")
        save_npz(p, grid, cfg)
        z = np.load(p)
        assert int(z["basis_type"]) == (4 if btype == "3d_texture" else 255)
        if btype == "mlp":
            # torch Linear layout: weight [out, in] (net_to_dict keys)
            assert z["pt__basis_mlp__0__weight"].shape == (8, 3 + 6)
        g2, cfg2 = load_npz(p)
        assert cfg2.basis_type == btype
        if btype == "3d_texture":
            np.testing.assert_allclose(np.asarray(g2.basis),
                                       np.asarray(grid.basis), atol=1e-6)
        else:
            for k in grid.basis:
                np.testing.assert_allclose(np.asarray(g2.basis[k]),
                                           np.asarray(grid.basis[k]),
                                           atol=1e-6)
            assert cfg2.mlp_width == 8 and cfg2.mlp_posenc_size == 1
