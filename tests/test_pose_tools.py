"""Pose tooling: epipolar geometry, cam-dict normalization, the COLMAP
pipeline's pure-Python stages (subprocess runner injected)."""

import json
import os
import struct

import numpy as np

from flnerf_tpu.data.pose_tools import (
    cam_dict_from_colmap,
    epipolar_distance,
    inspect_epipolar_geometry,
    normalize_cam_dict,
    plot_camera_frustums,
    two_view_fundamental,
)


def _camera(eye, target, f=400.0, w=640, h=480):
    """Simple look-at W2C + K (camera looks +z toward target)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd])             # world -> cam rows
    W2C = np.eye(4)
    W2C[:3, :3] = R
    W2C[:3, 3] = -R @ eye
    K = np.eye(4)
    K[0, 0] = K[1, 1] = f
    K[0, 2], K[1, 2] = w / 2, h / 2
    return K, W2C


def _project(K, W2C, pts):
    cam = pts @ W2C[:3, :3].T + W2C[:3, 3]
    pix = cam @ K[:3, :3].T
    return pix[:, :2] / pix[:, 2:3]


def test_fundamental_matrix_annihilates_correspondences():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, (50, 3)) + [0, 0, 3.0]
    K1, W1 = _camera([0, 0, 0], [0, 0, 3.0])
    K2, W2 = _camera([1.0, 0.3, 0.2], [0, 0, 3.0])
    p1 = _project(K1, W1, pts)
    p2 = _project(K2, W2, pts)
    _, F = two_view_fundamental(K1, W1, K2, W2)
    d = epipolar_distance(p1, p2, F)
    assert d.max() < 1e-6, d.max()
    # a wrong pose produces visibly broken epipolar geometry
    _, W2_bad = _camera([-1.0, 0.5, -0.3], [0.2, 0.1, 3.0])
    _, F_bad = two_view_fundamental(K1, W1, K2, W2_bad)
    assert epipolar_distance(p1, p2, F_bad).mean() > 1.0


def test_inspector_writes_overlay(tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((60, 80)) * 255).astype(np.uint8)
    K1, W1 = _camera([0, 0, 0], [0, 0, 3.0], f=60, w=80, h=60)
    K2, W2 = _camera([0.5, 0, 0], [0, 0, 3.0], f=60, w=80, h=60)
    out = str(tmp_path / "epi.png")
    lines = inspect_epipolar_geometry(img, K1, W1, img, K2, W2,
                                      out_path=out, n_points=8)
    assert lines.shape[1] == 3 and os.path.getsize(out) > 0


def test_normalize_cam_dict_unit_sphere():
    rng = np.random.default_rng(2)
    cams = {}
    for i in range(6):
        K, W2C = _camera(rng.uniform(5, 9, 3), [0, 0, 0])
        cams[f"im_{i}.png"] = {"K": K.reshape(-1).tolist(),
                               "W2C": W2C.reshape(-1).tolist(),
                               "img_size": [640, 480]}
    norm = normalize_cam_dict(cams, target_radius=1.0)
    centers = np.stack([
        np.linalg.inv(np.asarray(v["W2C"]).reshape(4, 4))[:3, 3]
        for v in norm.values()
    ])
    mid = centers.mean(0)
    assert np.abs(mid).max() < 1e-9
    r = np.linalg.norm(centers - mid, axis=1).max()
    assert 0.85 <= r <= 1.0 + 1e-9          # farthest cam inside the sphere
    # orientations preserved: R blocks unchanged
    for name in cams:
        R0 = np.asarray(cams[name]["W2C"]).reshape(4, 4)[:3, :3]
        R1 = np.asarray(norm[name]["W2C"]).reshape(4, 4)[:3, :3]
        np.testing.assert_allclose(R0, R1, atol=1e-12)


def _write_sparse_model(d, n_images=4):
    """Minimal COLMAP binary sparse model (same layout as test_colmap)."""
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<4d", 500.0, 510.0, 320.0, 240.0))
    rng = np.random.default_rng(0)
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(1, n_images + 1):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            f.write(struct.pack("<i", i))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"im_{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))


def test_run_colmap_pipeline_with_injected_runner(tmp_path):
    """The pipeline drives the 4 COLMAP stages through the injected runner
    and post-processes the sparse model into cam dicts + split dirs."""
    from flnerf_tpu.cli.run_colmap import run_pipeline

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "scene"
    os.makedirs(img_dir)
    import imageio.v2 as imageio
    for i in range(1, 5):
        imageio.imwrite(str(img_dir / f"im_{i:03d}.png"),
                        np.zeros((8, 8, 3), np.uint8))

    calls = []

    def fake_runner(cmd):
        calls.append(cmd[1])
        if cmd[1] == "mapper":
            _write_sparse_model(str(out_dir / "sparse" / "0"))

    norm = run_pipeline(str(img_dir), str(out_dir), colmap_bin="colmap",
                        runner=fake_runner)
    assert calls == ["feature_extractor", "exhaustive_matcher", "mapper",
                     "image_undistorter"]
    assert len(norm) == 4
    assert os.path.exists(out_dir / "cam_dict_norm.json")
    for sub in ("intrinsics", "pose", "rgb"):
        assert len(os.listdir(out_dir / "train" / sub)) == 4
    # the split layout round-trips through the nerf++ loader
    from flnerf_tpu.data.nerfpp_dataset import load_nerfpp_split

    data = load_nerfpp_split(str(tmp_path), "scene", "train")
    assert data["images"].shape[0] == 4
    assert np.isfinite(data["poses"]).all()


def test_frustum_plot_writes_png(tmp_path):
    d = tmp_path / "sparse0"
    _write_sparse_model(str(d))
    cams = cam_dict_from_colmap(str(d))
    out = str(tmp_path / "cams.png")
    plot_camera_frustums(cams, out)
    assert os.path.getsize(out) > 0


def test_run_colmap_posed_pipeline(tmp_path):
    """run_colmap_posed.py parity: sift/match -> known-pose model template
    (cameras.txt/images.txt keyed by DATABASE image ids) ->
    point_triangulator against it."""
    import json
    import sqlite3

    from flnerf_tpu.cli.run_colmap import (
        rotmat2qvec, run_posed_pipeline,
    )
    from flnerf_tpu.data.colmap import qvec2rotmat

    # quaternion round trip first
    rng = np.random.default_rng(0)
    v = rng.standard_normal(3)
    R = np.asarray(qvec2rotmat(
        np.array([np.cos(0.4), *(np.sin(0.4) * v / np.linalg.norm(v))])))
    q = rotmat2qvec(R)
    np.testing.assert_allclose(np.asarray(qvec2rotmat(q)), R, atol=1e-8)

    img_dir = tmp_path / "imgs"
    out_dir = tmp_path / "out"
    img_dir.mkdir()
    # known poses for two images
    cam_dict = {}
    for i, name in enumerate(["a.png", "b.png"]):
        K = np.eye(4)
        K[0, 0] = K[1, 1] = 100.0
        K[0, 2], K[1, 2] = 32, 24
        W2C = np.eye(4)
        W2C[:3, :3] = np.asarray(qvec2rotmat(
            np.array([np.cos(0.1 * i), np.sin(0.1 * i), 0, 0])))
        W2C[2, 3] = 2.0 + i
        cam_dict[name] = {"K": K.reshape(-1).tolist(),
                          "W2C": W2C.reshape(-1).tolist(),
                          "img_size": [64, 48]}
    cd_file = tmp_path / "cam_dict.json"
    cd_file.write_text(json.dumps(cam_dict))

    stages = []

    def fake_runner(cmd):
        stages.append(cmd[1])
        if cmd[1] == "feature_extractor":
            # colmap creates the database with assigned image ids
            db = sqlite3.connect(str(out_dir / "database.db"))
            db.execute("CREATE TABLE images (image_id INTEGER PRIMARY KEY,"
                       " name TEXT)")
            db.execute("INSERT INTO images VALUES (7, 'b.png')")
            db.execute("INSERT INTO images VALUES (3, 'a.png')")
            db.commit()
            db.close()

    sfm = run_posed_pipeline(str(img_dir), str(out_dir), str(cd_file),
                             colmap_bin="colmap", runner=fake_runner)
    assert stages == ["feature_extractor", "exhaustive_matcher",
                      "point_triangulator"]
    cams = (out_dir / "sfm" / "cameras.txt").read_text().strip().splitlines()
    imgs = [l for l in (out_dir / "sfm" / "images.txt").read_text()
            .splitlines() if l.strip()]
    assert len(cams) == 2 and len(imgs) == 2
    # database ids drive the model ids; image line carries the known pose
    first = imgs[0].split()
    assert first[0] == "3" and first[-1] == "a.png"
    assert cams[0].startswith("3 PINHOLE 64 48 100.0 100.0")
    tz = float(imgs[1].split()[7])
    assert abs(tz - 3.0) < 1e-9        # b.png (id 7) has W2C tz = 3
    assert (out_dir / "sfm" / "points3D.txt").exists()
    assert sfm.endswith("sfm")


def test_view_data_inspector(tmp_path):
    from flnerf_tpu.cli.view_data import main as view_main

    out = tmp_path / "vis.png"
    res = view_main(["synthetic", "--out", str(out)])
    assert res["type"] == "synthetic" and res["n_cams"] == 10
    assert out.exists() and out.stat().st_size > 5000
