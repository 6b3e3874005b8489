"""Fixture-driven tests for the long-tail parity tools: CO3D loader,
PlenOctree (svox1) export, max-weight camera pruning, dataset converters."""

import gzip
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------- CO3D

def _make_co3d_fixture(root):
    import imageio.v2 as imageio

    cat = os.path.join(root, "chair")
    os.makedirs(os.path.join(cat, "images"), exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(12):
        th = 2 * np.pi * i / 12
        pos = np.array([np.cos(th) * 3, 0.4, np.sin(th) * 3])
        rel = f"chair/images/frame{i:03d}.jpg"
        imageio.imwrite(
            os.path.join(root, rel),
            (rng.random((40, 30, 3)) * 255).astype(np.uint8))
        # world-to-cam R,T in the pytorch3d-ish convention the loader expects
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0, 1.0, 0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        rot = np.stack([right, up2, fwd], 0)
        frames.append({
            "sequence_name": "seq0",
            "frame_number": i,
            "image": {"size": [40, 30], "path": rel},
            "viewpoint": {
                "R": rot.T.tolist(),
                "T": (-rot @ pos).tolist(),
                "focal_length": [2.0, 2.1],
                "principal_point": [0.02, -0.03],
            },
        })
    with gzip.open(os.path.join(cat, "frame_annotations.jgz"), "wt") as f:
        json.dump(frames, f)


def test_co3d_loader(tmp_path):
    from flnerf_tpu.data.co3d import build_co3d_index, load_co3d_sequence

    root = str(tmp_path)
    _make_co3d_fixture(root)
    idx = build_co3d_index(root, os.path.join(root, "idx.npz"))
    assert len(idx["seq_names"]) == 1 and idx["seq_offsets"][-1] == 12
    # index is cached
    assert os.path.exists(os.path.join(root, "idx.npz"))

    seq = load_co3d_sequence(root, 0, "train",
                             index_file=os.path.join(root, "idx.npz"))
    # hold_every=8: frames 0 and 8 held out -> 10 train (post outlier filter)
    assert seq.images.shape[0] == 10
    assert seq.images.shape[-1] == 3
    assert seq.c2w.shape == (10, 4, 4)
    # normalized scene: camera distances ~ cam_scale_factor
    d = np.linalg.norm(seq.c2w[:, :3, 3], axis=-1)
    assert 0.5 < np.median(d) < 2.0

    test_seq = load_co3d_sequence(root, 0, "test",
                                  index_file=os.path.join(root, "idx.npz"))
    assert test_seq.images.shape[0] == 2


# ---------------------------------------------------------------- svox1

def test_to_svox1_export(tmp_path):
    from flnerf_tpu.core.svox1_export import lookup_octree, save_svox1_npz
    from flnerf_tpu.models.voxel_sh import (
        VoxelGrid, VoxelGridConfig, save_npz,
    )
    from flnerf_tpu.cli.to_svox1 import main as to_svox1_main

    rng = np.random.default_rng(1)
    r = 16
    cfg = VoxelGridConfig(reso=(r, r, r), radius=(1.3, 1.3, 1.3))
    grid = VoxelGrid(
        density=jnp.asarray(rng.random((r, r, r)), jnp.float32) * 3,
        sh=jnp.asarray(rng.standard_normal((r, r, r, 27)), jnp.float32),
        alive=jnp.asarray(rng.random((r, r, r)) > 0.8),
    )
    ckpt = str(tmp_path / "ckpt.npz")
    save_npz(ckpt, grid, cfg)
    out_path = to_svox1_main([ckpt])
    tree = dict(np.load(out_path, allow_pickle=True))
    assert str(tree["data_format"]) == "SH9"
    assert int(tree["data_dim"]) == 28
    np.testing.assert_allclose(np.asarray(tree["invradius3"]),
                               0.5 / np.asarray([1.3, 1.3, 1.3]), atol=1e-6)
    # child pointers are relative and non-negative
    assert tree["child"].min() >= 0
    # every occupied voxel's leaf round-trips its data
    occ = np.argwhere(np.asarray(grid.alive))
    dens = np.asarray(grid.density)
    sh = np.asarray(grid.sh)
    for c in occ[:: max(1, len(occ) // 20)]:
        leaf = lookup_octree(tree, c, r)
        np.testing.assert_allclose(leaf[-1], dens[tuple(c)], atol=2e-3,
                                   rtol=1e-2)
        np.testing.assert_allclose(leaf[:-1], sh[tuple(c)], atol=2e-2,
                                   rtol=2e-2)
    # unoccupied voxels resolve to zero leaves (or collapsed empty nodes)
    empty = np.argwhere(~np.asarray(grid.alive))[0]
    leaf = lookup_octree(tree, empty, r)
    assert np.all(np.abs(leaf) < 1e-6)


# ------------------------------------------------- max-weight pruning

def test_weight_prune_removes_occluded_interior():
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.voxel_sh import (
        VoxelGrid, VoxelGridConfig, weight_prune_grid,
    )
    from flnerf_tpu.rays.camera import intrinsics_matrix

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=6, n_test=1, H=24, W=24)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    r = 24
    cfg = VoxelGridConfig(reso=(r, r, r), radius=(1.2,) * 3, max_steps=96,
                          step_size=0.7)
    # an opaque solid ball: interior cells are occluded from every camera
    xx, yy, zz = np.meshgrid(*([np.arange(r)] * 3), indexing="ij")
    rad = np.sqrt((xx - r / 2) ** 2 + (yy - r / 2) ** 2 + (zz - r / 2) ** 2)
    density = np.where(rad < r * 0.3, 50.0, 0.0).astype(np.float32)
    grid = VoxelGrid(jnp.asarray(density), jnp.zeros((r, r, r, 27)),
                     jnp.ones((r, r, r), bool))
    pruned = weight_prune_grid(grid, cfg, poses[i_split[0]][:4], H, W, K,
                               weight_thresh=0.05, dilate=1, stride=2)
    alive = np.asarray(pruned.alive)
    core = rad < r * 0.15           # deep interior
    shell = (rad > r * 0.25) & (rad < r * 0.3)
    # sigma-threshold pruning would keep the core; weight pruning drops it
    assert alive[core].mean() < 0.2
    assert alive[shell].mean() > 0.35
    assert alive[shell].mean() > alive[core].mean() + 0.2


# ---------------------------------------------------------- converters

def test_tanks2nerf(tmp_path):
    import imageio.v2 as imageio

    from flnerf_tpu.cli.converters import tanks2nerf

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "pose"))
    np.savetxt(os.path.join(root, "intrinsics.txt"),
               np.array([[100.0, 0, 20, 0], [0, 100, 15, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1]]))
    rng = np.random.default_rng(0)
    for i in range(6):
        prefix = "0_" if i < 4 else "1_"
        th = i
        pos = np.array([np.cos(th) * 3, np.sin(th) * 3, 1.0])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0, 0, 1.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([right, up2, fwd], 1)
        c2w[:3, 3] = pos
        np.savetxt(os.path.join(root, "pose", f"{prefix}{i:04d}.txt"), c2w)
        imageio.imwrite(os.path.join(root, "rgb", f"{prefix}{i:04d}.png"),
                        (rng.random((30, 40, 3)) * 255).astype(np.uint8))
    written = tanks2nerf(root)
    assert len(written) == 3
    tr = json.load(open(os.path.join(root, "transforms_train.json")))
    assert tr["w"] == 40 and tr["h"] == 30 and len(tr["frames"]) == 4
    te = json.load(open(os.path.join(root, "transforms_test.json")))
    assert len(te["frames"]) == 2  # falls back to val
    # aligned poses are finite and roughly radius 4
    p = np.asarray([f["transform_matrix"] for f in tr["frames"]])
    assert np.isfinite(p).all()
    assert 1.0 < np.linalg.norm(p[:, :3, 3], axis=-1).mean() < 8.0


def test_hyper2nerf(tmp_path):
    from flnerf_tpu.cli.converters import hyper2nerf

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "camera"))
    names = [f"f{i:03d}" for i in range(8)]
    json.dump({"ids": names, "val_ids": [], "train_ids": []},
              open(os.path.join(root, "dataset.json"), "w"))
    json.dump({"scale": 1.0, "center": [0, 0, 0]},
              open(os.path.join(root, "scene.json"), "w"))
    json.dump({n: {"time_id": i} for i, n in enumerate(names)},
              open(os.path.join(root, "metadata.json"), "w"))
    for i, n in enumerate(names):
        th = 2 * np.pi * i / 8
        pos = [np.cos(th) * 2, np.sin(th) * 2, 0.5]
        json.dump({
            "orientation": np.eye(3).tolist(),
            "position": pos,
            "image_size": [64, 48],
            "principal_point": [32, 24],
            "focal_length": 80.0,
        }, open(os.path.join(root, "camera", f"{n}.json"), "w"))
    written = hyper2nerf(root, downscale=2, interval=4)
    tr = json.load(open(written[0]))
    assert tr["w"] == 32 and tr["h"] == 24
    assert len(tr["frames"]) == 2          # ids 0, 4
    assert all("time" in f for f in tr["frames"])
    times = [f["time"] for f in tr["frames"]]
    assert max(times) <= 1.0


def test_colmap2nsvf(tmp_path):
    from flnerf_tpu.cli.converters import colmap2nsvf
    from flnerf_tpu.data.colmap import ColmapCamera, ColmapImage

    # write a txt-model fixture
    sparse = str(tmp_path / "sparse")
    os.makedirs(sparse)
    with open(os.path.join(sparse, "cameras.txt"), "w") as f:
        f.write("# cams\n1 PINHOLE 64 48 80 80 32 24\n")
    with open(os.path.join(sparse, "images.txt"), "w") as f:
        f.write("# imgs\n")
        for i in range(3):
            f.write(f"{i+1} 1 0 0 0 {0.1*i} 0.2 {0.3+i} 1 im{i}.png\n")
            f.write("0.0 0.0 -1\n")   # POINTS2D line (alternating format)
    out = str(tmp_path / "nsvf")
    n = colmap2nsvf(sparse, out)
    assert n == 3
    intr = np.loadtxt(os.path.join(out, "intrinsics.txt"))
    assert intr[0, 0] == 80 and intr[0, 2] == 32
    poses = sorted(os.listdir(os.path.join(out, "pose")))
    assert len(poses) == 3 and poses[0].startswith("0_")
    p = np.loadtxt(os.path.join(out, "pose", poses[0]))
    assert p.shape == (4, 4)
    np.testing.assert_allclose(p[3], [0, 0, 0, 1], atol=1e-12)
