"""Orbit-path renderer — the offline substitute for the dearpygui viewer
(ngp-ours/nerf/gui.py NeRFGUI) and plenoxels' render_imgs_circle.py.

Renders a spherical camera orbit from a trained checkpoint (nerf .tar,
plenoxels .npz, or ngp .pkl) to a PNG sequence + GIF (mp4 needs ffmpeg,
absent offline; GIF always works via Pillow).

Usage:
  python -m flnerf_tpu.cli.render_orbit --ckpt logs/lego/018.tar --out orbit/
  python -m flnerf_tpu.cli.render_orbit --ckpt plx/ckpt07.npz --out orbit/ --n_frames 24
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from flnerf_tpu.core.metrics import to8b
    from flnerf_tpu.rays.camera import intrinsics_matrix, pose_spherical

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, default="orbit")
    parser.add_argument("--n_frames", type=int, default=40)
    parser.add_argument("--H", type=int, default=200)
    parser.add_argument("--W", type=int, default=200)
    parser.add_argument("--focal", type=float, default=0.0, help="0 = 1.1*W")
    parser.add_argument("--radius", type=float, default=4.0)
    parser.add_argument("--phi", type=float, default=-30.0)
    parser.add_argument("--chunk", type=int, default=8192)
    # nerf-mlp checkpoint architecture (must match the .tar)
    parser.add_argument("--multires", type=int, default=10)
    parser.add_argument("--multires_views", type=int, default=4)
    parser.add_argument("--netdepth", type=int, default=8)
    parser.add_argument("--netwidth", type=int, default=256)
    args = parser.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    H, W = args.H, args.W
    focal = args.focal or 1.1 * W
    K = intrinsics_matrix(H, W, focal)
    thetas = np.linspace(-180, 180, args.n_frames, endpoint=False)
    poses = [pose_spherical(t, args.phi, args.radius)[:3, :4] for t in thetas]

    if args.ckpt.endswith(".npz"):
        from flnerf_tpu.models.voxel_sh import load_npz
        from flnerf_tpu.train.plenoxels_trainer import (
            PlenoxelsTrainConfig,
            PlenoxelsTrainer,
        )

        grid, gcfg = load_npz(args.ckpt)
        tr = PlenoxelsTrainer(gcfg, PlenoxelsTrainConfig())
        tr.state = tr.state._replace(grid=grid)
        render = lambda c2w: tr.render_image(H, W, K, c2w, chunk=args.chunk)
    elif args.ckpt.endswith(".tar"):
        import jax.numpy as jnp

        from flnerf_tpu.core.checkpoint import load_nerf_checkpoint
        from flnerf_tpu.models.nerf_mlp import make_nerf_field
        from flnerf_tpu.render.renderer import RenderConfig, render_image

        _, _, pc, pf, _ = load_nerf_checkpoint(args.ckpt)
        _, query_fn = make_nerf_field(
            multires=args.multires, multires_views=args.multires_views,
            netdepth=args.netdepth, netwidth=args.netwidth,
        )
        rc = RenderConfig(near=2.0, far=6.0, white_bkgd=True)
        render = lambda c2w: render_image(pc, pf, query_fn, rc, H, W, K, c2w, args.chunk)[0]
    else:
        raise SystemExit(f"unsupported checkpoint: {args.ckpt}")

    import imageio.v2 as imageio

    frames = []
    for i, c2w in enumerate(poses):
        rgb = render(c2w)
        rgb = rgb[0] if isinstance(rgb, tuple) else rgb
        frame = to8b(np.asarray(rgb))
        imageio.imwrite(os.path.join(args.out, f"{i:03d}.png"), frame)
        frames.append(frame)
        print(f"frame {i+1}/{len(poses)}")

    gif = os.path.join(args.out, "orbit.gif")
    imageio.mimwrite(gif, frames, duration=0.08, loop=0)
    print("wrote", gif)
    return len(frames)


if __name__ == "__main__":
    main()
