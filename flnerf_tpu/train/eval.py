"""Full-image evaluation / render-path driver (render_path analog).

Parity target: nerf-ours/render.py:94-146 — renders each pose, computes
PSNR / SSIM / LPIPS against GT when available, saves PNGs, writes
``results.txt`` with the means, and returns the stacked rgb/disp arrays
(run_nerf.py writes video.mp4 from them at :294).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from flnerf_tpu.core.metrics import compute_ssim, lpips_fn, to8b
from flnerf_tpu.render.renderer import RenderConfig, render_image


def render_path(
    params_coarse,
    params_fine,
    query_fn,
    render_cfg: RenderConfig,
    render_poses,
    hwf,
    K,
    gt_imgs: Optional[np.ndarray] = None,
    savedir: Optional[str] = None,
    render_factor: int = 0,
    chunk: int = 8192,
    verbose: bool = True,
):
    H, W, focal = hwf
    if render_factor != 0:
        H = H // render_factor
        W = W // render_factor
        focal = focal / render_factor
        K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)

    lp = lpips_fn()
    rgbs, disps = [], []
    psnrs, ssims, lpipss = [], [], []

    for i, c2w in enumerate(np.asarray(render_poses)):
        rgb, disp, _ = render_image(
            params_coarse, params_fine, query_fn, render_cfg,
            H, W, K, c2w[:3, :4], chunk=chunk,
        )
        rgbs.append(rgb)
        disps.append(disp)

        if gt_imgs is not None and render_factor == 0:
            gt = np.asarray(gt_imgs[i])
            p = -10.0 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-12))
            s = float(compute_ssim(jnp.asarray(gt), jnp.asarray(rgb)))
            l = lp(gt, rgb) if lp is not None else float("nan")
            psnrs.append(p)
            ssims.append(s)
            lpipss.append(l)
            if verbose:
                print(f"img-{i}: psnr={p:.3f}, ssim={s:.4f}, lpips={l}")

        if savedir is not None:
            import imageio.v2 as imageio

            imageio.imwrite(os.path.join(savedir, f"{i:03d}.png"), to8b(rgb))

    results = None
    if psnrs:
        results = {
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "lpips": float(np.nanmean(lpipss)) if lpipss else float("nan"),
        }
        text = "mean PSNR: {}\nmean SSIM: {}\nmean LPIPS: {}".format(
            results["psnr"], results["ssim"], results["lpips"]
        )
        if verbose:
            print(text)
        if savedir is not None:
            with open(os.path.join(savedir, "results.txt"), "w") as f:
                f.write(text)

    return np.stack(rgbs, 0), np.stack(disps, 0), results


def write_video(path: str, rgbs: np.ndarray, fps: int = 30) -> bool:
    """video.mp4 writer (run_nerf.py:294); returns False if no encoder."""
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, to8b(rgbs), fps=fps, quality=8)
        return True
    except Exception as e:  # pragma: no cover - codec availability varies
        print(f"video write skipped: {e}")
        return False
