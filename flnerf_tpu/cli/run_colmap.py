"""COLMAP SfM pipeline driver -> normalized cam dict + nerf++ split dirs.

Reference: nerf++-ours/colmap_runner/run_colmap.py (feature extraction ->
exhaustive matching -> mapper -> undistort, then cam-dict extraction +
unit-sphere normalization).  This driver keeps the same stage sequence and
flag choices but reads the sparse model with this repo's own binary
readers (data/colmap.py) and normalizes poses in pure numpy
(data/pose_tools.py) — no pyquaternion/open3d/trimesh dependencies.

The COLMAP binary itself does not ship in this environment; point
--colmap_bin (or $COLMAP_BIN) at one.  The post-SfM stages (extraction,
normalization, split layout) are pure Python and fixture-tested; the
subprocess runner is injectable for tests.

Usage:
  python -m flnerf_tpu.cli.run_colmap --img_dir photos/ --out_dir scene/
"""

from __future__ import annotations

import argparse
import os
import subprocess
from typing import Callable, Optional

from flnerf_tpu.data.pose_tools import (
    cam_dict_from_colmap,
    normalize_cam_dict,
    save_cam_dict,
    write_nerfpp_split,
)


def _colmap_cmds(colmap_bin: str, img_dir: str, out_dir: str,
                 use_gpu: bool = False):
    """The stage list (run_colmap.py:20-75 flag choices, CPU-safe)."""
    db = os.path.join(out_dir, "database.db")
    sparse = os.path.join(out_dir, "sparse")
    mvs = os.path.join(out_dir, "mvs")
    gpu = "1" if use_gpu else "0"
    return [
        [colmap_bin, "feature_extractor",
         "--database_path", db, "--image_path", img_dir,
         "--ImageReader.single_camera", "1",
         "--ImageReader.camera_model", "SIMPLE_RADIAL",
         "--SiftExtraction.max_num_features", "16384",
         "--SiftExtraction.use_gpu", gpu],
        [colmap_bin, "exhaustive_matcher",
         "--database_path", db,
         "--SiftMatching.guided_matching", "1",
         "--SiftMatching.use_gpu", gpu],
        [colmap_bin, "mapper",
         "--database_path", db, "--image_path", img_dir,
         "--output_path", sparse,
         "--Mapper.tri_min_angle", "3.0",
         "--Mapper.filter_min_tri_angle", "3.0"],
        [colmap_bin, "image_undistorter",
         "--image_path", img_dir,
         "--input_path", os.path.join(sparse, "0"),
         "--output_path", mvs,
         "--output_type", "COLMAP",
         "--max_image_size", "2000"],
    ]


def run_pipeline(
    img_dir: str,
    out_dir: str,
    colmap_bin: Optional[str] = None,
    target_radius: float = 1.0,
    split: str = "train",
    runner: Optional[Callable] = None,
    skip_sfm: bool = False,
) -> dict:
    """Full pipeline; returns the normalized cam dict.

    runner(cmd_list) runs one stage (default subprocess.check_call) —
    injectable so tests can fabricate the sparse model.  skip_sfm=True
    post-processes an existing sparse/0 model only."""
    os.makedirs(os.path.join(out_dir, "sparse"), exist_ok=True)
    if not skip_sfm:
        colmap_bin = colmap_bin or os.environ.get("COLMAP_BIN", "colmap")
        runner = runner or (lambda cmd: subprocess.check_call(cmd))
        for cmd in _colmap_cmds(colmap_bin, img_dir, out_dir):
            print("running:", " ".join(cmd), flush=True)
            runner(cmd)

    sparse0 = os.path.join(out_dir, "sparse", "0")
    cam_dict = cam_dict_from_colmap(sparse0)
    save_cam_dict(cam_dict, os.path.join(out_dir, "cam_dict.json"))
    norm = normalize_cam_dict(cam_dict, target_radius=target_radius)
    save_cam_dict(norm, os.path.join(out_dir, "cam_dict_norm.json"))
    write_nerfpp_split(norm, img_dir, out_dir, split=split)
    print(f"wrote {len(norm)} cameras -> {out_dir}/cam_dict_norm.json "
          f"+ {split}/ split dirs", flush=True)
    return norm


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--colmap_bin", default=None)
    p.add_argument("--target_radius", type=float, default=1.0)
    p.add_argument("--split", default="train")
    p.add_argument("--skip_sfm", action="store_true",
                   help="post-process an existing sparse/0 model only")
    a = p.parse_args(argv)
    run_pipeline(a.img_dir, a.out_dir, a.colmap_bin, a.target_radius,
                 a.split, skip_sfm=a.skip_sfm)


if __name__ == "__main__":
    main()
