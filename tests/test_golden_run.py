"""Golden-run readiness (tools/golden_run.py): dataset gates report the
expected layout when data is absent, and the full pipeline actually runs
against a generated blender-layout fixture — so the day a real dataset
exists, the parity claim is one command that is known to work."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_blender_fixture(basedir, H=24, n_train=3, n_val=1, n_test=1):
    """Write the synthetic scene in the nerf_synthetic blender layout
    (transforms_{split}.json + {split}/*.png, load_blender.py:37-91)."""
    import imageio.v2 as imageio

    from flnerf_tpu.data.synthetic import render_gt
    from flnerf_tpu.rays.camera import get_rays_np, intrinsics_matrix, \
        pose_spherical

    focal = 0.9 * H
    camera_angle_x = 2.0 * np.arctan(0.5 * H / focal)
    K = intrinsics_matrix(H, H, focal)
    n = n_train + n_val + n_test
    thetas = np.linspace(-180, 180, n, endpoint=False)
    splits = (["train"] * n_train + ["val"] * n_val + ["test"] * n_test)
    metas = {s: {"camera_angle_x": float(camera_angle_x), "frames": []}
             for s in ("train", "val", "test")}
    for i, (th, s) in enumerate(zip(thetas, splits)):
        pose = pose_spherical(th, -25.0, 3.5)
        ro, rd = get_rays_np(H, H, K, pose[:3, :4])
        img = (np.clip(render_gt(ro, rd), 0, 1) * 255).astype(np.uint8)
        os.makedirs(os.path.join(basedir, s), exist_ok=True)
        rel = f"./{s}/r_{i}"
        imageio.imwrite(os.path.join(basedir, f"{rel}.png"), img)
        metas[s]["frames"].append({
            "file_path": rel,
            "transform_matrix": np.asarray(pose, np.float64).tolist()})
    for s, meta in metas.items():
        with open(os.path.join(basedir, f"transforms_{s}.json"), "w") as f:
            json.dump(meta, f)


def test_gates_report_layout(tmp_path, monkeypatch):
    from tools import golden_run

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(golden_run, "enable_compile_cache_ok", None,
                        raising=False)
    rc = golden_run.main(["--scene", "lego_ngp", "--out",
                          str(tmp_path / "g.json")])
    assert rc == 0
    out = json.loads((tmp_path / "g.json").read_text())
    assert out["lego_ngp"]["skipped"]
    assert "transforms_" in out["lego_ngp"]["expected_layout"]
    assert out["lego_ngp"]["expected"]["published"] == 34.15


@pytest.mark.slow
def test_golden_pipeline_runs_on_fixture(tmp_path, monkeypatch):
    """lego_ngp golden run end-to-end on a generated blender fixture:
    loader -> trainer -> test-split eval -> psnr/pass fields."""
    from tools import golden_run

    data = tmp_path / "data" / "nerf_synthetic" / "lego"
    make_blender_fixture(str(data))
    monkeypatch.chdir(tmp_path)
    golden_run.main(["--scene", "lego_ngp", "--steps", "64",
                     "--out", str(tmp_path / "g.json")])
    out = json.loads((tmp_path / "g.json").read_text())
    res = out["lego_ngp"]
    assert "psnr" in res, res
    assert np.isfinite(res["psnr"])
    assert "pass" in res  # band comparison ran (64 steps won't pass it)
