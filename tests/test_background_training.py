"""MSI background TRAINING (VERDICT r2 item 4): optimizer wiring
(opt.py:499-500 optim_background_step, argument_parser.py:95-109 LR,
208-211 TV), sparsify_background (svox2.py:1431), and the fused-kernel
logT-gradient extension that lets the Pallas path train the background."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flnerf_tpu.models.voxel_sh import (
    VoxelGrid,
    VoxelGridConfig,
    compose_msi_background,
    init_voxel_grid,
    load_npz,
    save_npz,
    sparsify_background,
    tv_loss_background,
    voxel_render_rays,
)
from flnerf_tpu.rays.quadtree import RayEpoch
from flnerf_tpu.train.plenoxels_trainer import (
    PlenoxelsTrainConfig,
    PlenoxelsTrainer,
)


def _bg_cfg(**kw):
    d = dict(
        reso=(8, 8, 8), radius=(0.5,) * 3, max_steps=24, step_size=0.7,
        background_nlayers=2, background_reso=8, init_sigma=0.0,
        init_sigma_bg=0.1,
    )
    d.update(kw)
    return VoxelGridConfig(**d)


def _env_rays(n, seed=0):
    """Rays from near the origin in random directions; gt color is a
    smooth function of direction (an environment map)."""
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    gt = 0.5 + 0.4 * np.stack(
        [d[:, 0], d[:, 1] * d[:, 2], d[:, 2] ** 2], -1
    ).astype(np.float32)
    return o, d, np.clip(gt, 0.0, 1.0)


def test_tv_loss_background_wraps_longitude():
    bg = jnp.zeros((4, 3, 2, 4))
    # a single hot cell: lon-diff hits it twice (fwd + wrap), lat once
    bg = bg.at[0, 1, 0, 0].set(1.0)
    n = 4 * 3 * 2
    expected_c = (2.0 + 2.0) / n  # two lon diffs of 1, two lat diffs of 1
    got = float(tv_loss_background(bg, scaling_color=1.0, scaling_density=0.0))
    assert abs(got - expected_c) < 1e-6, got
    # sigma channel scaled separately
    bgd = jnp.zeros((4, 3, 2, 4)).at[1, 1, 0, 3].set(2.0)
    got_d = float(tv_loss_background(bgd, 0.0, 1.0))
    assert abs(got_d - (2 * 4.0 + 2 * 4.0) / n) < 1e-6, got_d


def test_sparsify_background_zeroes_and_dilates():
    bg = np.zeros((8, 4, 2, 4), np.float32)
    bg[..., :3] = 0.5
    bg[2, 1, 0, 3] = 5.0                       # one dense cell
    out, keep = sparsify_background(jnp.asarray(bg), sigma_thresh=1.0,
                                    dilate=1)
    keep = np.asarray(keep)
    assert keep[2, 1]
    # 8-neighborhood survives the dilation
    assert keep[1, 1] and keep[3, 1] and keep[2, 0] and keep[2, 2]
    assert not keep[5, 1]
    out = np.asarray(out)
    assert np.all(out[5, 1] == 0.0)            # emptied incl. color
    assert out[2, 1, 0, 3] == 5.0


def test_background_training_improves_env_psnr():
    """An empty grid + env-map gt: only the MSI background can explain the
    colors; training must push train PSNR up by several dB and must leave
    the trained field npz-roundtrippable."""
    gcfg = _bg_cfg()
    tcfg = PlenoxelsTrainConfig(
        n_epoch=2, batch_size=256, steps_per_chunk=4,
        lr_sigma=0.0, lr_sh=0.0, lr_sigma_delay_steps=0,
        lr_sigma_bg=3e0, lr_color_bg=1e-1,
        lambda_tv=0.0, lambda_tv_sh=0.0,
        lambda_tv_background_sigma=1e-3, lambda_tv_background_color=1e-3,
        subdivide_every=0,
    )
    t = PlenoxelsTrainer(gcfg, tcfg)
    assert t.state.rms_bg is not None and t.state.bg_alive is not None

    o, d, gt = _env_rays(4096)
    bg0 = np.asarray(t.state.grid.background).copy()

    # true pre-training error (run_epoch_rays reports the LAST chunk's mse,
    # which is already 16 steps in — the bg converges fast enough that the
    # first epoch's report would understate the gain)
    out0 = voxel_render_rays(t.state.grid, jnp.asarray(o[:512]),
                             jnp.asarray(d[:512]), gcfg)
    mse_init = float(jnp.mean((out0["rgb"] - gt[:512]) ** 2))

    def run_epoch():
        ep = RayEpoch(origins=o, dirs=d, rgb=gt,
                      leaf_id=np.zeros(o.shape[0], np.int32), n_leaves=1)
        _, mse = t.run_epoch_rays(ep)
        return mse

    for _ in range(4):
        mse1 = run_epoch()
    assert mse1 < mse_init * 0.1, (mse_init, mse1)
    psnr0 = -10 * np.log10(mse_init)
    psnr1 = -10 * np.log10(mse1)
    assert psnr1 > psnr0 + 10.0, (psnr0, psnr1)
    # the background actually moved (it is the only trainable thing here)
    assert np.abs(np.asarray(t.state.grid.background) - bg0).max() > 1e-3

    # round-trip the TRAINED background through the reference npz layout
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "bg.npz")
        save_npz(p, t.state.grid, t.gcfg)
        g2, cfg2 = load_npz(p)
        np.testing.assert_allclose(
            np.asarray(g2.background), np.asarray(t.state.grid.background),
            atol=1e-2)


def test_background_pinned_after_sparsify():
    gcfg = _bg_cfg()
    tcfg = PlenoxelsTrainConfig(
        n_epoch=1, batch_size=128, steps_per_chunk=2,
        lr_sigma=0.0, lr_sh=0.0, lr_sigma_delay_steps=0,
        lambda_tv=0.0, lambda_tv_sh=0.0,
        background_density_thresh=1e9,   # kill every cell
        subdivide_every=0,
    )
    t = PlenoxelsTrainer(gcfg, tcfg)
    n_dead = t.sparsify_bg()
    assert n_dead == 16 * 8
    o, d, gt = _env_rays(256)
    ep = RayEpoch(origins=o, dirs=d, rgb=gt,
                  leaf_id=np.zeros(o.shape[0], np.int32), n_leaves=1)
    t.run_epoch_rays(ep)
    # every cell pinned: the background cannot move
    assert float(jnp.abs(t.state.grid.background).max()) == 0.0


def test_kernel_logT_grad_and_msi_parity():
    """The fused kernel's ch-4 (logT) gradient extension: compose the MSI
    background on the kernel output and compare rgb + (density, sh, bg)
    grads against the pure-XLA twin that composes msi internally."""
    from flnerf_tpu.ops import voxel_pallas as vp

    rng = np.random.default_rng(3)
    cfg = VoxelGridConfig(
        reso=(32, 32, 32), max_steps=36, step_size=0.5,
        background_nlayers=2, background_reso=8,
    )
    bg = rng.standard_normal((16, 8, 2, 4)).astype(np.float32) * 0.3
    bg[..., 3] = np.abs(bg[..., 3]) * 5.0
    grid = VoxelGrid(
        density=jnp.asarray(rng.random((32, 32, 32)), jnp.float32) * 2.0,
        sh=jnp.asarray(rng.standard_normal((32, 32, 32, 27)) * 0.3,
                       jnp.float32),
        alive=jnp.asarray(rng.random((32, 32, 32)) > 0.1),
        background=jnp.asarray(bg),
    )
    n = 64
    o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (n, 1))
    d = np.tile(np.array([[0.02, 0.01, 1.0]], np.float32), (n, 1))
    d[:, :2] += rng.standard_normal((n, 2)).astype(np.float32) * 0.01
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    gt = jnp.asarray(rng.random((n, 3)), jnp.float32)

    def loss_twin(dens, sh, bgv):
        g = VoxelGrid(dens, sh, grid.alive, bgv)
        return jnp.mean((voxel_render_rays(g, o, d, cfg)["rgb"] - gt) ** 2)

    def loss_kernel(dens, sh, bgv):
        g = VoxelGrid(dens, sh, grid.alive)
        blocks = vp.build_blocks(o, d, cfg, vp.occupancy_mip(g, cfg))
        table = vp.pack_table(g, cfg)
        kout = vp.render_blocks(table, blocks.rays, blocks.corners,
                                blocks.valid, cfg).reshape(-1, 8)
        rgb = compose_msi_background(bgv, kout[:, 0:3], kout[:, 4], o, d,
                                     cfg)
        return jnp.mean((rgb - gt) ** 2)

    args = (grid.density, grid.sh, grid.background)
    v_t, g_t = jax.value_and_grad(loss_twin, argnums=(0, 1, 2))(*args)
    v_k, g_k = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(*args)
    assert abs(float(v_t) - float(v_k)) < 2e-3 * max(float(v_t), 1e-6)
    for a, b in zip(g_k, g_t):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-9)
        assert np.abs(a - b).max() < 0.015 * scale


def test_fast_eval_composites_msi_background():
    """voxel_render_rays_fast (the EVAL path) must composite a trained
    MSI background exactly like the XLA twin — regression for eval
    rendering the flat background_brightness fill while the train step
    optimized the MSI field."""
    from flnerf_tpu.ops import voxel_pallas as vp

    rng = np.random.default_rng(5)
    cfg = VoxelGridConfig(
        reso=(32, 32, 32), max_steps=36, step_size=0.5,
        background_nlayers=2, background_reso=8, init_sigma=0.02,
    )
    bg = rng.standard_normal((16, 8, 2, 4)).astype(np.float32) * 0.3
    bg[..., :3] -= 2.0                      # dark, clearly != flat fill
    bg[..., 3] = np.abs(bg[..., 3]) * 100.0  # near-opaque layers
    grid = VoxelGrid(
        density=jnp.asarray(rng.random((32, 32, 32)), jnp.float32) * 0.05,
        sh=jnp.asarray(rng.standard_normal((32, 32, 32, 27)) * 0.3,
                       jnp.float32),
        alive=jnp.ones((32, 32, 32), bool),
        background=jnp.asarray(bg),
    )
    n = vp.RB
    o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (n, 1))
    d = np.tile(np.array([[0.02, 0.01, 1.0]], np.float32), (n, 1))
    d[:, :2] += rng.standard_normal((n, 2)).astype(np.float32) * 0.01
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    fast = vp.voxel_render_rays_fast(grid, o, d, cfg)
    twin = voxel_render_rays(grid, o, d, cfg)
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(twin["rgb"]), atol=3e-2)
    # and the background genuinely matters for these rays (low density,
    # rays exit with transmittance left) — guards test vacuity
    flat = vp.voxel_render_rays_fast(
        grid._replace(background=None), o, d, cfg)
    assert float(np.abs(np.asarray(fast["rgb"])
                        - np.asarray(flat["rgb"])).max()) > 0.05
