"""PSNR-28-class convergence run (VERDICT r2 'weak' #2: the north-star
wall-clock-to-quality claim needs a high-PSNR-class demonstration, not
just PSNR-20).  Trains the plenoxels backend on the synthetic scene until
train PSNR >= 28 (or the budget runs out), recording the full curve.

Writes BENCH_psnr28.json.  Run: python tools/convergence_psnr28.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(budget_s: float = 150.0, target: float = 28.0):
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.core.benchmark import BenchRecorder
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.voxel_sh import VoxelGridConfig
    from flnerf_tpu.rays.camera import get_rays_np, intrinsics_matrix
    from flnerf_tpu.rays.quadtree import RayBudgeter
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsTrainConfig, PlenoxelsTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=16, n_test=1, H=96, W=96)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]
    o = np.stack([get_rays_np(H, W, K, p[:3, :4])[0] for p in poses[tr]], 0)
    d = np.stack([get_rays_np(H, W, K, p[:3, :4])[1] for p in poses[tr]], 0)
    budgeter = RayBudgeter(images[tr], o, d, init_level=2, seed=0)

    gcfg = VoxelGridConfig(
        reso=(128, 128, 128), radius=(1.2,) * 3, max_steps=384,
        step_size=0.6, init_sigma=0.1)
    tcfg = PlenoxelsTrainConfig(
        n_epoch=60, batch_size=4096, steps_per_chunk=8,
        lr_sigma=1e1, lr_sh=1e-2, lr_sigma_delay_steps=0,
        subdivide_every=1, subdivide_thres=0.03, use_kernel=True)
    trainer = PlenoxelsTrainer(gcfg, tcfg)

    # compile warmup off the clock, then fresh state
    warm = budgeter.gen_rays(down_scale=1)
    t0c = time.time()
    trainer.run_epoch_rays(warm)
    compile_s = time.time() - t0c
    from flnerf_tpu.models.voxel_sh import init_voxel_grid
    from flnerf_tpu.train.plenoxels_trainer import PlenoxelsState
    g0 = init_voxel_grid(gcfg)
    trainer.state = jax.device_put(PlenoxelsState(
        g0, jnp.zeros_like(g0.density), jnp.zeros_like(g0.sh),
        jnp.int32(0)))
    budgeter = RayBudgeter(images[tr], o, d, init_level=2, seed=0)

    rec = BenchRecorder(meta={
        "scene": "synthetic96x16views", "backend": "plenoxels",
        "grid": "128^3", "target_psnr": target,
        "cold_start_compile_s": round(compile_s, 1),
        "psnr_kind": "train-ray MSE (the reference's train log metric)"})
    t0 = time.time()
    reached = None
    for epoch in range(1, tcfg.n_epoch + 1):
        ep = budgeter.gen_rays(down_scale=1)
        stat, mse = trainer.run_epoch_rays(ep)
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        wall = time.time() - t0
        rec.record(psnr=round(psnr, 2), epoch=epoch, wall_s=round(wall, 2),
                   rays=int(ep.origins.shape[0]))
        print(f"epoch {epoch}: psnr {psnr:.2f} wall {wall:.1f}s "
              f"rays {ep.origins.shape[0]}", flush=True)
        budgeter.adjust(stat, tcfg.subdivide_thres)
        reached = rec.time_to_psnr(target)
        if reached is not None or wall > budget_s:
            break
    rec.meta["time_to_psnr28_s"] = None if reached is None else round(
        reached, 2)
    rec.save("BENCH_psnr28.json")
    print("time_to_psnr28_s:", rec.meta["time_to_psnr28_s"])
    return rec


if __name__ == "__main__":
    main()
