"""Mesh extraction from a trained field (nerf-ours/extract_mesh.py analog,
also covers ngp save_mesh, nerf/utils.py:582-602).

Queries sigma on a regular grid through the jitted field (chunked), then
runs marching tetrahedra and writes .obj/.ply.

Usage:
  python -m flnerf_tpu.cli.extract_mesh --ckpt logs/lego/018.tar --out lego.obj \
      --bound 1.2 --reso 256 --sigma_thresh 25
"""

from __future__ import annotations

import argparse

import numpy as np


def density_grid_from_nerf(params_coarse, params_fine, query_fn, bound, reso, chunk=65536):
    """Evaluate sigma on a reso^3 grid in [-bound, bound]^3."""
    import jax
    import jax.numpy as jnp

    g = np.linspace(-bound, bound, reso, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    params = params_fine if params_fine is not None else params_coarse

    @jax.jit
    def sigma_fn(p, x):
        raw = query_fn(p, x[:, None, :], None)
        return raw[:, 0, 3]

    out = []
    n = pts.shape[0]
    n_pad = (n + chunk - 1) // chunk * chunk
    pts_pad = np.zeros((n_pad, 3), np.float32)
    pts_pad[:n] = pts
    for i in range(0, n_pad, chunk):
        out.append(np.asarray(sigma_fn(params, jnp.asarray(pts_pad[i : i + chunk]))))
    return np.concatenate(out)[:n].reshape(reso, reso, reso), g


def main(argv=None):
    from flnerf_tpu.core.checkpoint import load_nerf_checkpoint
    from flnerf_tpu.models.nerf_mlp import make_nerf_field
    from flnerf_tpu.ops.marching import (marching_cubes,
                                          marching_tetrahedra, save_obj,
                                          save_ply)

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True, help=".tar or .npz checkpoint")
    parser.add_argument("--out", type=str, default="mesh.obj")
    parser.add_argument("--bound", type=float, default=1.2)
    parser.add_argument("--reso", type=int, default=192)
    parser.add_argument("--sigma_thresh", type=float, default=25.0)
    # the reference extracts with PyMCubes marching cubes
    # (nerf-ours/extract_mesh.py); tetrahedra kept as the denser variant
    parser.add_argument("--algo", choices=["cubes", "tetrahedra"],
                        default="cubes")
    parser.add_argument("--multires", type=int, default=10)
    parser.add_argument("--multires_views", type=int, default=4)
    parser.add_argument("--netdepth", type=int, default=8)
    parser.add_argument("--netwidth", type=int, default=256)
    args = parser.parse_args(argv)

    if args.ckpt.endswith(".npz"):
        # plenoxels grid: the density field IS the grid
        from flnerf_tpu.models.voxel_sh import load_npz

        grid, gcfg = load_npz(args.ckpt)
        field = np.where(np.asarray(grid.alive), np.asarray(grid.density), 0.0)
        spacing = tuple(2 * r / (n - 1) for r, n in zip(gcfg.radius, gcfg.reso))
        origin = tuple(-r for r in gcfg.radius)
        march = (marching_cubes if args.algo == "cubes"
                 else marching_tetrahedra)
        verts, tris = march(
            field, iso=args.sigma_thresh, origin=origin, spacing=spacing
        )
    else:
        import jax.numpy as jnp

        # viewdir-conditioned checkpoints expose sigma through the trunk;
        # query with a fixed direction
        init_fn, query_fn = make_nerf_field(
            multires=args.multires, multires_views=args.multires_views,
            netdepth=args.netdepth, netwidth=args.netwidth,
            use_viewdirs=True, compute_dtype=jnp.float32,
        )
        _, _, pc, pf, _ = load_nerf_checkpoint(args.ckpt)

        def sigma_query(params, pts, _):
            d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), pts.shape[:-1] + (3,))[:, 0]
            return query_fn(params, pts, d)

        field, g = density_grid_from_nerf(pc, pf, sigma_query, args.bound, args.reso)
        spacing = (g[1] - g[0],) * 3
        march = (marching_cubes if args.algo == "cubes"
                 else marching_tetrahedra)
        verts, tris = march(
            field, iso=args.sigma_thresh, origin=(-args.bound,) * 3, spacing=spacing
        )

    print(f"extracted {len(verts)} vertices, {len(tris)} triangles")
    if args.out.endswith(".ply"):
        save_ply(args.out, verts, tris)
    else:
        save_obj(args.out, verts, tris)
    print("wrote", args.out)
    return len(verts), len(tris)


if __name__ == "__main__":
    main()
