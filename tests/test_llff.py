"""LLFF loader golden tests (pins the pose math of data/llff.py).

Semantics under test mirror nerf-ours/load_llff.py: bd_factor rescale,
recentering into the average frame, spiral render path, spherified orbit,
nearest-to-mean held-out view."""

import os

import numpy as np
import pytest

from flnerf_tpu.data.llff import (
    average_pose,
    camera_frame,
    load_llff_data,
    nearest_ray_point,
    spherify_poses,
    spiral_path,
    to_reference_frame,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    import imageio.v2 as imageio

    base = tmp_path_factory.mktemp("llff")
    (base / "images").mkdir()
    rng = np.random.default_rng(3)
    rows = []
    for i in range(7):
        th = -0.5 + 0.9 * (i / 6) ** 1.7
        pos = np.array([np.sin(th) * 4, 0.13 * i - 0.2, np.cos(th) * (4 + 0.2 * i)])
        fwd = -pos / np.linalg.norm(pos)
        upv = np.array([0, 1.0, 0])
        right = np.cross(upv, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        m = np.stack([-up2, right, -fwd], 1)  # LLFF [down, right, back] cols
        p35 = np.concatenate(
            [np.concatenate([m, pos[:, None]], 1),
             np.array([[32.0], [40.0], [50.0]])], 1)
        rows.append(np.concatenate([p35.reshape(-1), [2.0, 8.0]]))
        imageio.imwrite(
            str(base / "images" / f"im{i:02d}.png"),
            (rng.random((32, 40, 3)) * 255).astype(np.uint8))
    np.save(str(base / "poses_bounds.npy"), np.stack(rows))
    return str(base)


def test_camera_frame_orthonormal():
    f = camera_frame(np.array([0.2, 0.1, 1.0]), np.array([0, 1.0, 0]),
                     np.array([1.0, 2.0, 3.0]))
    r = f[:, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(f[:, 3], [1, 2, 3])


def test_recenter_makes_average_identity(fixture_dir):
    _, poses, _, _, _ = load_llff_data(fixture_dir, factor=1)
    avg = average_pose(poses)
    np.testing.assert_allclose(avg[:3, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(avg[:3, 3], 0.0, atol=1e-5)


def test_to_reference_frame_inverts_rigid():
    rng = np.random.default_rng(0)
    f = camera_frame(rng.standard_normal(3), rng.standard_normal(3),
                     rng.standard_normal(3))
    poses = np.broadcast_to(f, (4, 3, 4)).copy()
    out = to_reference_frame(poses, f)
    np.testing.assert_allclose(
        out[:, :3, :3], np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)
    np.testing.assert_allclose(out[:, :3, 3], 0.0, atol=1e-6)


def test_nearest_ray_point_exact_intersection():
    # two rays through (1, 2, 3)
    p = np.array([1.0, 2.0, 3.0])
    o = np.stack([p - np.array([5, 0, 0.0]), p - np.array([0, 4, 1.0])])
    d = np.stack([np.array([1, 0, 0.0]), np.array([0, 4, 1.0]) / np.sqrt(17)])
    np.testing.assert_allclose(nearest_ray_point(o, d), p, atol=1e-6)


def test_golden_spiral(fixture_dir):
    """Golden values from the pre-rewrite implementation (verified identical
    to nerf-ours/load_llff.py semantics)."""
    imgs, poses, bds, rp, i_test = load_llff_data(fixture_dir, factor=1)
    assert imgs.shape == (7, 32, 40, 3)
    assert poses.shape == (7, 3, 5) and rp.shape == (120, 3, 5)
    assert i_test == 3
    np.testing.assert_allclose(bds[0], [1.33333337, 5.33333349], atol=1e-5)
    # spiral is anchored at the average pose and spans the camera radii
    radii = np.percentile(np.abs(poses[:, :3, 3]), 90, 0)
    centers = rp[:, :3, 3]
    assert np.all(np.abs(centers).max(0) <= radii * 1.05 + 1e-3)
    # frames are orthonormal look-at bases
    r = rp[:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nik->njk", r, r), np.broadcast_to(np.eye(3), (120, 3, 3)),
        atol=1e-5)


def test_golden_spherify(fixture_dir):
    _, poses, bds, orbit, _ = load_llff_data(fixture_dir, factor=1,
                                             spherify=True)
    # cameras sit on the unit sphere (rms radius 1 by construction)
    rms = np.sqrt(np.mean(np.sum(poses[:, :3, 3] ** 2, -1)))
    np.testing.assert_allclose(rms, 1.0, atol=1e-5)
    assert orbit.shape == (120, 3, 5)
    # orbit is an equatorial circle at the mean camera height
    zh = poses[:, :3, 3].mean(0)[2]
    np.testing.assert_allclose(orbit[:, 2, 3], zh, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(orbit[:, :2, 3], axis=1),
        np.sqrt(1 - zh ** 2), atol=1e-4)


def test_spherified_rays_hit_focus(fixture_dir):
    _, poses, _, _, _ = load_llff_data(fixture_dir, factor=1, spherify=True)
    # all cameras in the fixture aim at the world origin; after spherify the
    # focus point is the frame origin, so forward axes pass near 0
    o = poses[:, :3, 3]
    f = poses[:, :3, 2]
    # distance from origin to each camera axis line
    t = -np.sum(o * f, -1, keepdims=True)
    closest = o + t * f
    assert np.linalg.norm(closest, axis=1).max() < 0.15
