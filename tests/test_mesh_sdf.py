"""Mesh SDF provider (the pysdf/trimesh-free SDFDataset analog):
loader round-trips, exact point-triangle distances, winding-number sign,
reference batch mix."""

import os

import numpy as np
import pytest

from flnerf_tpu.data.mesh_sdf import (
    MeshSDF,
    SDFMeshDataset,
    load_mesh,
    normalize_mesh,
)

CUBE_V = np.array(
    [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5)
     for z in (-0.5, 0.5)], np.float32)
# 12 triangles, outward-facing winding
CUBE_F = np.array([
    [0, 1, 3], [0, 3, 2],          # x = -0.5
    [4, 7, 5], [4, 6, 7],          # x = +0.5
    [0, 4, 5], [0, 5, 1],          # y = -0.5
    [2, 3, 7], [2, 7, 6],          # y = +0.5
    [0, 2, 6], [0, 6, 4],          # z = -0.5
    [1, 5, 7], [1, 7, 3],          # z = +0.5
], np.int32)


def cube_sdf(p):
    """Analytic signed distance of the [-0.5, 0.5]^3 cube (+ inside)."""
    q = np.abs(p) - 0.5
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    return -(outside + inside)


def test_sdf_matches_analytic_cube():
    sdf = MeshSDF(CUBE_V, CUBE_F)
    rng = np.random.default_rng(0)
    p = rng.uniform(-1.2, 1.2, (512, 3)).astype(np.float32)
    got = sdf(p)
    want = cube_sdf(p)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_surface_sampling_on_faces():
    sdf = MeshSDF(CUBE_V, CUBE_F)
    pts = sdf.sample_surface(256, np.random.default_rng(1))
    # every sample lies on the cube surface: max |coord| == 0.5
    np.testing.assert_allclose(np.max(np.abs(pts), -1), 0.5, atol=1e-6)
    # and |sdf| ~ 0 there
    assert np.abs(sdf(pts)).max() < 1e-4


def test_obj_roundtrip_and_dataset(tmp_path):
    from flnerf_tpu.ops.marching import save_obj

    path = str(tmp_path / "cube.obj")
    save_obj(path, CUBE_V, CUBE_F)
    v, f = load_mesh(path)
    assert v.shape == (8, 3) and f.shape[0] == 12

    ds = SDFMeshDataset(path, num_samples=256, clip_sdf=0.1, seed=0)
    pts, sdfs = ds.sample_batch()
    assert pts.shape == (256, 3) and sdfs.shape == (256, 1)
    # first half: exact surface points recorded with sdf 0
    assert np.all(sdfs[:128] == 0.0)
    # normalization puts the mesh inside [-1, 1]
    assert np.abs(pts[:224]).max() <= 1.0 + 1e-5
    assert np.abs(sdfs).max() <= 0.1 + 1e-6
    # the uniform tail carries real signed values of both signs at this
    # mesh scale (cube diag-normalized to ~0.55 half-extent)
    assert (sdfs[224:] != 0).any()


def test_normalize_mesh_bounds():
    v = normalize_mesh(CUBE_V * 3.0 + 1.0)
    ext = v.max(0) - v.min(0)
    # diag scaled to 0.95 * 2
    np.testing.assert_allclose(np.linalg.norm(ext), 1.9, rtol=1e-6)
    np.testing.assert_allclose(v.max(0) + v.min(0), 0.0, atol=1e-6)


@pytest.mark.slow
def test_main_sdf_mesh_path(tmp_path, monkeypatch):
    """CLI smoke: .obj input takes the SDFMeshDataset path end-to-end."""
    from flnerf_tpu.cli.main_sdf import main
    from flnerf_tpu.ops.marching import save_obj

    mesh = str(tmp_path / "cube.obj")
    save_obj(mesh, CUBE_V, CUBE_F)
    r = main([mesh, "--workspace", str(tmp_path / "ws"), "--iters", "4",
              "--batch", "256", "--mesh_reso", "24"])
    assert np.isfinite(r["loss"])
    assert os.path.exists(str(tmp_path / "ws" / "mesh.obj"))


def test_ply_face_element_declared_first(tmp_path):
    """A PLY may legally declare `element face` before `element vertex`;
    the body rows must be walked in the header's declared order."""
    tri_v = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    header = "\n".join([
        "ply", "format ascii 1.0",
        "element face 1", "property list uchar int vertex_indices",
        "element vertex 3",
        "property float x", "property float y", "property float z",
        "end_header"])
    body = "3 0 1 2\n" + "\n".join(f"{x} {y} {z}" for x, y, z in tri_v)
    p = tmp_path / "f_first.ply"
    p.write_text(header + "\n" + body + "\n")
    verts, faces = load_mesh(str(p))
    np.testing.assert_allclose(verts, np.asarray(tri_v, np.float32))
    np.testing.assert_array_equal(faces, [[0, 1, 2]])
