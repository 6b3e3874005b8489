"""Benchmark harness: quadtree-NeRF training-step throughput on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: training rays/sec/chip for the reference's lego configuration
(nerf-ours/configs/lego.txt: N_rand=1920, N_samples=64, N_importance=128,
D=8 W=256 coarse+fine MLPs, viewdirs, white bkgd) — full optimizer steps
including forward, backward, Adam update, and the on-device per-leaf loss
scatter that replaces the reference's CPU loss collection.

Baseline: nerf-pytorch trains lego ~100K iters in ~4h on a 2080 Ti
(nerf-ours/README.md:49) at N_rand=1024 -> ~7.1K rays/s. The paper's repo
keeps that training stack (run_nerf.py), so per-chip ray throughput against
it is the honest speed comparison; vs_baseline = ours / 7111.
"""

import json
import time

import numpy as np


BASELINE_RAYS_PER_SEC = 100_000 * 1024 / (4 * 3600.0)  # ≈ 7111 rays/s


def main():
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.nerf_mlp import make_nerf_field
    from flnerf_tpu.rays.quadtree import RayEpoch
    from flnerf_tpu.render.renderer import RenderConfig
    from flnerf_tpu.train.trainer import NerfTrainer, TrainConfig

    init_fn, query_fn = make_nerf_field(
        multires=10, multires_views=4, netdepth=8, netwidth=256,
        compute_dtype=jnp.bfloat16,
    )
    rc = RenderConfig(n_samples=64, n_importance=128, near=2.0, far=6.0, white_bkgd=True)
    tc = TrainConfig(n_rand=1920, steps_per_chunk=16, precrop_iters=0)
    trainer = NerfTrainer(query_fn, init_fn, rc, tc)

    steps_per_chunk = tc.steps_per_chunk
    n_rays = tc.n_rand * steps_per_chunk
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
    dirs[:, 2] -= 2.0
    epoch = RayEpoch(
        origins=np.tile(np.array([[0, 0, 3.5]], np.float32), (n_rays, 1)),
        dirs=dirs,
        rgb=rng.random((n_rays, 3)).astype(np.float32),
        leaf_id=rng.integers(0, 256, n_rays).astype(np.int32),
        n_leaves=256,
    )

    # Warmup (compile)
    trainer.run_epoch_rays(epoch, jax.random.PRNGKey(0))

    n_timed = 4  # chunks
    t0 = time.perf_counter()
    for i in range(n_timed):
        trainer.run_epoch_rays(epoch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(trainer.state.params_coarse)
    dt = time.perf_counter() - t0

    total_rays = n_timed * n_rays
    rays_per_sec = total_rays / dt
    n_chips = len(jax.devices())
    rays_per_sec_chip = rays_per_sec / max(n_chips, 1)

    print(
        json.dumps(
            {
                "metric": "nerf_lego_train_rays_per_sec_per_chip",
                "value": round(rays_per_sec_chip, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_sec_chip / BASELINE_RAYS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
