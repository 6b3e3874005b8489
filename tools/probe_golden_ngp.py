"""Probe the fixture_ngp golden failure (r5): main_nerf on the blender
fixture trains FLAT (loss pinned at the render-equals-background level
for 1536 steps, byte-identical early losses to the tensorf run) while
the same trainer on the 'synthetic' loader path reaches 20 dB in
seconds.  This instruments the exact golden config at short budgets:
per-chunk occupancy stats, render-vs-bg distance on a train view, and a
scale/views bisect between the two paths.

Run: nohup python -u tools/probe_golden_ngp.py > /tmp/probe_ngp.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flnerf_tpu.core.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def build(scale, src, H=96, iters=192, bound=1.5):
    from flnerf_tpu.data.blender import (
        composite_white_bkgd, load_blender_data,
    )
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    if src == "blender":
        from tools.golden_run import _ensure_fixture
        images, poses, render_poses, hwf, i_split = load_blender_data(
            _ensure_fixture(), False, 8)
        images = composite_white_bkgd(images, True)
    else:
        images, poses, render_poses, hwf, i_split = load_synthetic_data(
            n_train=8, n_test=2, H=H, W=H)
    poses = poses.copy()
    poses[:, :3, 3] = poses[:, :3, 3] * scale
    Hh, W, focal = hwf
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * Hh], [0, 0, 1]],
                 np.float32)
    i_train = i_split[0]

    cfg = NGPConfig(bound=bound, desired_resolution=2048,
                    log2_hashmap_size=19, hash_engine="auto")
    init_fn, density_fn, rgb_fn = make_ngp_field(
        cfg, compute_dtype=jnp.bfloat16)
    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=bound, density_thresh=0.01, bg_color=1.0,
                           dt_gamma=0.0)
    tcfg = NGPTrainConfig(max_steps=iters, batch_rays=4096,
                          steps_per_chunk=16, ema_decay=0.95, seed=42)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    sampler = NGPSampler(np.asarray(images)[i_train],
                         np.asarray(poses)[i_train], K, tcfg, seed=42)
    return t, sampler, (np.asarray(images), np.asarray(poses),
                        int(Hh), int(W), K, i_split)


def occ_stats(t):
    d = np.asarray(t.occ.density)
    mean = float(t.occ.mean_density)
    th = min(mean, t.rcfg.density_thresh)
    frac = float((d > th).mean())
    nb = (np.asarray(t.occ.bits) if t.occ.bits is not None else None)
    bitfrac = (float(np.unpackbits(nb.view(np.uint8)).mean())
               if nb is not None else -1.0)
    return (f"occ mean={mean:.4g} min={d.min():.4g} max={d.max():.4g} "
            f"frac>th={frac:.3f} bitfrac={bitfrac:.3f}")


def run(tag, scale, src, iters=192):
    from flnerf_tpu.train.ngp_trainer import mse2psnr
    t, sampler, (images, poses, H, W, K, i_split) = build(scale, src,
                                                          iters=iters)
    print(f"--- {tag}: src={src} scale={scale} "
          f"n_train={len(i_split[0])} H={H}", flush=True)
    print("  init:", occ_stats(t), flush=True)
    for k in range(iters // 48):
        t.fit(sampler, verbose=False, n_steps=48)
        losses = [h["loss"] for h in t.history[-3:]]
        print(f"  steps={(k+1)*48} loss={losses}", flush=True)
        print("  ", occ_stats(t), flush=True)
    tr_psnr, _ = t.eval_images(poses[i_split[0][:2]], images[i_split[0][:2]],
                               H, W, K, chunk=4096)
    te_psnr, _ = t.eval_images(poses[i_split[2]], images[i_split[2]],
                               H, W, K, chunk=4096)
    print(f"  eval train-view psnr={tr_psnr:.2f} test psnr={te_psnr:.2f}",
          flush=True)


if __name__ == "__main__":
    run("A-synthetic-0.5", 0.5, "synthetic")
    run("B-blender-0.8", 0.8, "blender")
    run("C-blender-0.5", 0.5, "blender")
    run("D-synthetic-0.8", 0.8, "synthetic")
