"""Plenoxels checkpoint evaluation CLI (opt/render_imgs.py analog).

Loads a ckpt.npz + dataset, renders every test view, computes
PSNR/SSIM/(gated LPIPS), writes PNGs + results.txt, optional --timing mode
(opt/render_imgs.py:22-92 flag surface subset).

Usage:
  python -m flnerf_tpu.cli.render_imgs ckpt_dir/ckpt07.npz <datadir> [--timing]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from flnerf_tpu.core.metrics import compute_ssim, lpips_fn, to8b
    from flnerf_tpu.models.voxel_sh import load_npz
    from flnerf_tpu.rays.camera import get_rays_np, intrinsics_matrix
    from flnerf_tpu.train.plenoxels_trainer import PlenoxelsTrainConfig, PlenoxelsTrainer

    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", type=str)
    parser.add_argument("data_dir", type=str)
    parser.add_argument("--render_dir", type=str, default=None)
    parser.add_argument("--timing", action="store_true")
    parser.add_argument("--eval_chunk", type=int, default=4096)
    args = parser.parse_args(argv)

    grid, gcfg = load_npz(args.ckpt)

    if args.data_dir == "synthetic":
        from flnerf_tpu.data.synthetic import load_synthetic_data

        images, poses, rp, hwf, i_split = load_synthetic_data(n_train=8, n_test=2, H=48, W=48)
    else:
        from flnerf_tpu.data.blender import composite_white_bkgd, load_blender_data

        images, poses, rp, hwf, i_split = load_blender_data(args.data_dir, False, 8)
        images = composite_white_bkgd(images, True)
    H, W, focal = int(hwf[0]), int(hwf[1]), hwf[2]
    K = intrinsics_matrix(H, W, focal)
    i_test = i_split[2]

    trainer = PlenoxelsTrainer(gcfg, PlenoxelsTrainConfig())
    trainer.state = trainer.state._replace(grid=grid)

    render_dir = args.render_dir or os.path.join(os.path.dirname(args.ckpt), "test_renders")
    os.makedirs(render_dir, exist_ok=True)
    lp = lpips_fn()

    psnrs, ssims, lpipss = [], [], []
    t0 = time.time()
    for i, vi in enumerate(i_test):
        rgb = trainer.render_image(H, W, K, poses[vi][:3, :4], chunk=args.eval_chunk)
        if not args.timing:
            import imageio.v2 as imageio

            imageio.imwrite(os.path.join(render_dir, f"{i:04d}.png"), to8b(rgb))
            gt = images[vi]
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
            ssims.append(float(compute_ssim(jnp.asarray(gt), jnp.asarray(rgb))))
            lpipss.append(lp(gt, rgb) if lp else float("nan"))
    dt = time.time() - t0

    if args.timing:
        fps = len(i_test) / dt
        print(f"rendered {len(i_test)} views in {dt:.2f}s ({fps:.2f} FPS)")
        return {"fps": fps}

    results = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "lpips": float(np.nanmean(lpipss)) if lpipss else float("nan"),
    }
    text = "mean PSNR: {psnr}\nmean SSIM: {ssim}\nmean LPIPS: {lpips}".format(**results)
    print(text)
    with open(os.path.join(render_dir, "results.txt"), "w") as f:
        f.write(text)
    return results


if __name__ == "__main__":
    main()
