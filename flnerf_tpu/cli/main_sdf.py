"""SDF-fitting CLI (ngp-ours/main_sdf.py analog).

The reference samples SDF values from a mesh via pysdf (offline-unavailable);
here the input is either a precomputed .npz of (points, sdf) samples or one
of the built-in analytic shapes for smoke runs.

Usage:
  python -m flnerf_tpu.cli.main_sdf sphere --iters 500 --workspace /tmp/sdf
  python -m flnerf_tpu.cli.main_sdf samples.npz --iters 20000
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _analytic_oracle(name: str):
    if name == "sphere":
        return lambda p: np.linalg.norm(np.asarray(p), axis=-1) - 0.5
    if name == "box":
        def box(p):
            q = np.abs(np.asarray(p)) - 0.4
            outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
            inside = np.minimum(np.max(q, axis=-1), 0.0)
            return outside + inside
        return box
    if name == "torus":
        def torus(p):
            p = np.asarray(p)
            q = np.stack([np.linalg.norm(p[..., :2], axis=-1) - 0.45, p[..., 2]], -1)
            return np.linalg.norm(q, axis=-1) - 0.15
        return torus
    return None


def main(argv=None):
    from flnerf_tpu.cli.bootstrap import bootstrap
    bootstrap()
    from flnerf_tpu.models.sdf import SDFConfig, SDFTrainer, sample_sdf_batch
    from flnerf_tpu.ops.marching import save_obj, save_ply

    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str, help="analytic shape name or samples .npz")
    parser.add_argument("--workspace", type=str, default="workspace_sdf")
    parser.add_argument("--iters", type=int, default=20000)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--bound", type=float, default=1.0)
    parser.add_argument("--mesh_reso", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    os.makedirs(args.workspace, exist_ok=True)

    if args.path.endswith((".obj", ".ply")):
        # mesh input — the reference's SDFDataset path (provider.py:28),
        # pysdf/trimesh-free (data/mesh_sdf.py)
        from flnerf_tpu.data.mesh_sdf import SDFMeshDataset

        ds = SDFMeshDataset(args.path, num_samples=args.batch,
                            seed=args.seed)
        cfg = SDFConfig(bound=args.bound)
        trainer = SDFTrainer(cfg, lr=args.lr, seed=args.seed)
        losses = trainer.fit_dataset(ds, steps=args.iters)
        print(f"final mape loss: {losses[-1]:.5f}")
        verts, tris = trainer.extract_mesh(reso=args.mesh_reso)
        out = os.path.join(args.workspace, "mesh.obj")
        save_obj(out, verts, tris)
        print(f"wrote {out}: {len(verts)} verts, {len(tris)} tris")
        return {"loss": losses[-1], "n_verts": len(verts)}

    oracle = _analytic_oracle(args.path)
    if oracle is None:
        data = np.load(args.path)
        pts_all = data["points"].astype(np.float32)
        sdf_all = data["sdf"].astype(np.float32)

        def oracle(p):  # nearest-sample lookup oracle for precomputed data
            from scipy.spatial import cKDTree

            if not hasattr(oracle, "_tree"):
                oracle._tree = cKDTree(pts_all)
            _, idx = oracle._tree.query(np.asarray(p))
            return sdf_all[idx]

    cfg = SDFConfig(bound=args.bound)
    trainer = SDFTrainer(cfg, lr=args.lr, seed=args.seed)
    losses = trainer.fit(oracle, steps=args.iters, batch=args.batch, seed=args.seed)
    print(f"final mape loss: {losses[-1]:.5f}")

    verts, tris = trainer.extract_mesh(reso=args.mesh_reso)
    out = os.path.join(args.workspace, "mesh.obj")
    save_obj(out, verts, tris)
    print(f"wrote {out}: {len(verts)} verts, {len(tris)} tris")
    return {"loss": losses[-1], "n_verts": len(verts)}


if __name__ == "__main__":
    main()
