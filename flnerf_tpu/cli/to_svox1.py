"""Convert a plenoxels ckpt.npz to a PlenOctree (svox1) npz.

Reference: plenoxels-ours/opt/to_svox1.py (+ svox2.py:1635 to_svox1).

Usage:
  python -m flnerf_tpu.cli.to_svox1 ckpt/exp/ckpt07.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", type=str)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv)

    from flnerf_tpu.core.svox1_export import save_svox1_npz
    from flnerf_tpu.models.voxel_sh import load_npz

    grid, cfg = load_npz(args.ckpt)
    out_path = args.out or os.path.splitext(args.ckpt)[0] + "_svox1.npz"
    save_svox1_npz(
        out_path,
        np.asarray(grid.density),
        np.asarray(grid.sh),
        np.asarray(grid.alive),
        cfg.radius,
        cfg.center,
        basis_dim=cfg.basis_dim,
    )
    print(f"saved {out_path}")
    return out_path


if __name__ == "__main__":
    main()
