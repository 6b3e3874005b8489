import numpy as np
import jax.numpy as jnp

from flnerf_tpu.rays.camera import (
    get_rays,
    get_rays_np,
    intrinsics_matrix,
    ndc_rays,
    pose_spherical,
)


def test_get_rays_matches_numpy_twin():
    H, W = 12, 17
    K = intrinsics_matrix(H, W, 20.0)
    c2w = pose_spherical(33.0, -25.0, 4.0)[:3, :4]
    ro_j, rd_j = get_rays(H, W, K, c2w)
    ro_n, rd_n = get_rays_np(H, W, K, c2w)
    np.testing.assert_allclose(np.asarray(ro_j), ro_n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd_j), rd_n, atol=1e-5)


def test_get_rays_geometry():
    # center pixel looks along -z (camera frame) rotated to world
    H = W = 11
    f = 10.0
    K = intrinsics_matrix(H, W, f)
    c2w = np.eye(4)[:3, :4]
    ro, rd = get_rays_np(H, W, K, c2w)
    # principal point at (W/2, H/2) -> pixel (5,5) has dir offset (5-5.5)/f
    assert ro.shape == (H, W, 3)
    np.testing.assert_allclose(ro[0, 0], [0, 0, 0])
    np.testing.assert_allclose(rd[5, 5], [(5 - 5.5) / f, -(5 - 5.5) / f, -1.0], atol=1e-6)
    # x increases along columns, y decreases along rows (OpenGL convention)
    assert rd[5, 6][0] > rd[5, 5][0]
    assert rd[6, 5][1] < rd[5, 5][1]


def test_ndc_rays_finite_and_near_plane():
    H, W, f = 20, 20, 15.0
    K = intrinsics_matrix(H, W, f)
    c2w = np.eye(4)[:3, :4]
    ro, rd = get_rays(H, W, K, c2w)
    no, nd = ndc_rays(H, W, f, 1.0, ro.reshape(-1, 3), rd.reshape(-1, 3))
    assert np.isfinite(np.asarray(no)).all()
    assert np.isfinite(np.asarray(nd)).all()
    # o_z = 1 + 2*near/o_z(original at near plane) -> origin z = -near => o2 = -1
    np.testing.assert_allclose(np.asarray(no)[:, 2], -1.0, atol=1e-5)


def test_rand_poses_orbit_geometry():
    """rand_poses (provider.py:58-93): orthonormal c2w rotations, camera
    centers on the radius shell within the theta range, forward pointing
    at the origin."""
    import numpy as np

    from flnerf_tpu.rays.camera import rand_poses

    rng = np.random.default_rng(0)
    poses = rand_poses(256, rng, radius=2.0,
                       theta_range=(np.pi / 3, 2 * np.pi / 3))
    assert poses.shape == (256, 4, 4)
    c = poses[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(c, axis=-1), 2.0, rtol=1e-5)
    # theta range bounds the y (polar) coordinate: y = r cos(theta)
    y = c[:, 1] / 2.0
    assert (y <= np.cos(np.pi / 3) + 1e-6).all()
    assert (y >= np.cos(2 * np.pi / 3) - 1e-6).all()
    r = poses[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (256, 1, 1)),
                               atol=1e-5)
    # forward column (+z of the camera frame) looks at the origin
    fwd = r[:, :, 2]
    np.testing.assert_allclose(fwd, -c / 2.0, atol=1e-5)
