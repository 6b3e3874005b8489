"""Headless interactive session (GUI-logic parity, nerf/gui.py without
dearpygui): budgeted train stepping, dynamic-resolution preview, spp
accumulation, orbit camera math."""

import numpy as np
import pytest

from flnerf_tpu.render.interactive import (
    DOWNSCALES,
    InteractiveSession,
    OrbitCamera,
)


def test_orbit_camera_pose_convention():
    cam = OrbitCamera(64, 48, r=2.0, fovy=60.0)
    p = cam.pose
    # initial pose: camera at +z*radius looking at origin (ngp convention:
    # base rotation diag(1,-1,-1) flips the -radius z-offset to +z)
    np.testing.assert_allclose(p[:3, 3], [0, 0, 2.0], atol=1e-6)
    fx, fy, cx, cy = cam.intrinsics
    assert cx == 32 and cy == 24
    assert abs(fx - 48 / (2 * np.tan(np.radians(30)))) < 1e-6
    # an orbit changes the position but keeps the radius
    cam.orbit(300.0, 0.0)
    np.testing.assert_allclose(np.linalg.norm(cam.pose[:3, 3]), 2.0,
                               atol=1e-5)
    assert abs(cam.pose[0, 3]) > 0.1
    cam.scale(1.0)
    assert cam.radius < 2.0
    c0 = cam.center.copy()
    cam.pan(10.0, 0.0)
    assert np.linalg.norm(cam.center - c0) > 0


@pytest.fixture(scope="module")
def session():
    import jax.numpy as jnp

    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=4, n_test=1, H=24, W=24)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]
    cfg = NGPConfig(num_levels=4, base_resolution=4, desired_resolution=32,
                    log2_hashmap_size=12, bound=1.5)
    init_fn, density_fn, rgb_fn = make_ngp_field(cfg, jnp.float32)
    rcfg = NGPRenderConfig(n_candidates=32, n_keep=8, grid_size=16,
                           bound=1.5)
    tcfg = NGPTrainConfig(max_steps=64, batch_rays=128, steps_per_chunk=4,
                          full_refreshes=1)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    s = NGPSampler(images[tr], poses[tr], K, tcfg)
    return InteractiveSession(t, s, W=32, H=32, radius=3.0)


def test_interleaved_train_render_frames(session):
    session.training = True
    out = session.frame()
    assert "train" in out and "render" in out
    assert out["train"]["train_steps"] % 4 == 0  # quantized to chunks
    assert session.step >= 4
    img = out["render"]["image"]
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()
    assert session.downscale in DOWNSCALES

    # camera still -> spp accumulates; moving resets it
    session.training = False
    spp1 = session.frame()["render"]["spp"]
    spp2 = session.frame()["render"]["spp"]
    assert spp2 == spp1 + 1
    session.orbit(50.0, 10.0)
    assert session.need_update
    out3 = session.frame()["render"]
    assert out3["spp"] == 1
    assert out3["image"].shape == (32, 32, 3)


def test_dynamic_downscale_reacts_to_budget(session):
    # a tiny render budget must push the downscale to the floor bucket
    session.render_budget_ms = 1e-6
    session.need_update = True
    session.frame()
    session.need_update = True
    session.frame()
    assert session.downscale == 0.25
    # a huge budget ramps it back to full res
    session.render_budget_ms = 1e9
    session.need_update = True
    session.frame()
    assert session.downscale == 1.0


def test_run_dearpygui_gracefully_absent(session):
    from flnerf_tpu.render.interactive import run_dearpygui

    with pytest.raises(ImportError):
        run_dearpygui(session)
