"""COLMAP model readers + conversion: round-trip against generated fixtures."""

import json
import os
import struct

import numpy as np

from flnerf_tpu.data.colmap import (
    colmap_to_transforms,
    llff_to_transforms,
    load_colmap_model,
    qvec2rotmat,
    read_cameras_bin,
    read_images_bin,
)


def _write_colmap_bin(d, n_images=4):
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
    # images.bin
    rng = np.random.default_rng(0)
    truth = {}
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(1, n_images + 1):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            name = f"im_{i:03d}.png"
            truth[name] = (q.copy(), t.copy())
            f.write(struct.pack("<i", i))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 2))                # 2 fake 2D points
            f.write(struct.pack("<2d", 1.0, 2.0) + struct.pack("<q", -1))
            f.write(struct.pack("<2d", 3.0, 4.0) + struct.pack("<q", 7))
    return truth


def test_qvec2rotmat_identity_and_orthonormal():
    np.testing.assert_allclose(qvec2rotmat([1, 0, 0, 0]), np.eye(3), atol=1e-12)
    q = np.array([0.5, 0.5, 0.5, 0.5])
    R = qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(R) - 1.0) < 1e-12


def test_read_colmap_bin_roundtrip(tmp_path):
    truth = _write_colmap_bin(str(tmp_path))
    cams = read_cameras_bin(str(tmp_path / "cameras.bin"))
    imgs = read_images_bin(str(tmp_path / "images.bin"))
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])
    assert len(imgs) == 4
    for im in imgs.values():
        q, t = truth[im.name]
        np.testing.assert_allclose(im.qvec, q, atol=1e-12)
        np.testing.assert_allclose(im.tvec, t, atol=1e-12)


def test_colmap_to_transforms(tmp_path):
    _write_colmap_bin(str(tmp_path))
    t = colmap_to_transforms(str(tmp_path), center_and_scale=True)
    assert t["w"] == 640 and t["h"] == 480
    assert abs(t["camera_angle_x"] - 2 * np.arctan(640 / (2 * 500.0))) < 1e-9
    assert len(t["frames"]) == 4
    m = np.array(t["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    # rotation part stays orthonormal after the convention flip
    R = m[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    # centered: camera centroid near origin
    centers = np.stack([np.array(f["transform_matrix"])[:3, 3] for f in t["frames"]])
    np.testing.assert_allclose(centers.mean(0), 0.0, atol=1e-9)
    assert np.abs(centers).max() <= 1.0 + 1e-9


def test_llff_to_transforms(tmp_path):
    import imageio.v2 as imageio

    n = 3
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        poses[i, :, :4] = np.eye(3, 4)
        poses[i, :, 4] = [480, 640, 500.0]  # h, w, f
    bounds = np.tile([1.0, 10.0], (n, 1))
    arr = np.concatenate([poses.reshape(n, -1), bounds], 1)
    np.save(tmp_path / "poses_bounds.npy", arr)
    (tmp_path / "images").mkdir()
    for i in range(n):
        imageio.imwrite(tmp_path / "images" / f"{i:03d}.png",
                        np.zeros((4, 4, 3), np.uint8))
    t = llff_to_transforms(str(tmp_path))
    assert len(t["frames"]) == 3
    assert t["w"] == 640
    m = np.array(t["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)


def test_colmap2nerf_cli(tmp_path):
    from flnerf_tpu.cli.colmap2nerf import main

    _write_colmap_bin(str(tmp_path))
    out = str(tmp_path / "transforms.json")
    main(["--colmap_sparse", str(tmp_path), "--out", out])
    d = json.load(open(out))
    assert len(d["frames"]) == 4


def test_create_split_and_unsplit(tmp_path):
    """NSVF split prefixing across parallel dirs + the inverse
    (create_split.py / unsplit.py analogs)."""
    from flnerf_tpu.cli.converters import create_split, unsplit

    for sub, ext in (("pose", ".txt"), ("rgb", ".png")):
        os.makedirs(tmp_path / sub)
        for i in range(8):
            (tmp_path / sub / f"{i:03d}{ext}").write_bytes(b"x")
    renames = create_split(str(tmp_path), every=4)
    assert len(renames) == 16
    pose_files = sorted(os.listdir(tmp_path / "pose"))
    assert "1_000.txt" in pose_files and "1_004.txt" in pose_files
    assert sum(f.startswith("1_") for f in pose_files) == 2
    rgb_files = sorted(os.listdir(tmp_path / "rgb"))
    # identical stems get identical prefixes across dirs
    assert [f.split(".")[0] for f in rgb_files] == [
        f.split(".")[0] for f in pose_files]
    # idempotent: already-prefixed files are skipped
    assert create_split(str(tmp_path), every=4) == []
    assert unsplit(str(tmp_path)) == 16
    assert sorted(os.listdir(tmp_path / "pose")) == [
        f"{i:03d}.txt" for i in range(8)]


def test_record3d_to_nsvf_frames_dir(tmp_path):
    """Record3D metadata -> NSVF pose/rgb layout (frames-dir fallback);
    orientation math pinned against an identity-quaternion pose."""
    import imageio.v2 as imageio
    import json as _json
    from flnerf_tpu.cli.converters import record3d_to_nsvf

    os.makedirs(tmp_path / "frames")
    n = 6
    poses = []
    for i in range(n):
        imageio.imwrite(str(tmp_path / "frames" / f"f{i:03d}.png"),
                        np.full((8, 8, 3), i * 30, np.uint8))
        poses.append([0.0, 0.0, 0.0, 1.0, float(i), 0.0, 0.0])
    meta = {"K": np.diag([100.0, 100.0, 1.0]).reshape(-1).tolist(),
            "poses": poses}
    (tmp_path / "metadata.json").write_text(_json.dumps(meta))

    wrote = record3d_to_nsvf(str(tmp_path), every=2, factor=2)
    assert wrote == 3
    K = np.loadtxt(tmp_path / "intrinsics.txt")
    assert K.shape == (4, 4) and abs(K[0, 0] - 50.0) < 1e-9
    p0 = np.loadtxt(tmp_path / "pose" / "00000.txt")
    # identity quat -> R = diag(1,-1,-1) after the nerf-axes flip
    np.testing.assert_allclose(p0[:3, :3], np.diag([1.0, -1.0, -1.0]),
                               atol=1e-12)
    # recentered translation: frame 0 at x = 0 - mean = -2.5
    np.testing.assert_allclose(p0[:3, 3], [-2.5, 0, 0], atol=1e-12)
