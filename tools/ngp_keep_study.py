"""NGP keep-budget (K) study on real TPU: throughput vs quality.

The static keep budget K = n_keep is this framework's compaction analog
of torch-ngp's converged mean_count (~13-16 field evals per ray on lego
after occupancy warmup, nerf/renderer.py march loop).  Round-2 measured
K=16 BEATS K=32 in psnr at equal steps while running 1.4x faster; this
probes the other direction (12, 10) — the hash engine cost is linear in
kept points, so every kept point dropped is ~1/16 of the encode cost.

Writes NGP_keep_study.json: per-K {step_ms, train psnr at equal steps}.
Run: python tools/ngp_keep_study.py [--steps 768]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(n_keep: int, steps: int, log2: int = 19, synth_h: int = 64):
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.core.metrics import mse2psnr
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.train.ngp_trainer import (
        NGPRenderConfig, NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=8, n_test=1, H=synth_h, W=synth_h)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=log2)
    init_fn, density_fn, rgb_fn = make_ngp_field(cfg, jnp.bfloat16)
    rcfg = NGPRenderConfig(n_candidates=128, n_keep=n_keep, grid_size=128,
                           bound=1.5)
    tcfg = NGPTrainConfig(max_steps=steps, batch_rays=4096,
                          steps_per_chunk=16, full_refreshes=2)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    sampler = NGPSampler(images[tr], poses[tr], K, tcfg)

    # warmup: compile + occupancy refreshes off the clock
    t.fit(sampler, verbose=False, n_steps=48)
    # timed steady-state reps (async chain, one sync per rep)
    reps, per = 3, 32
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        t.fit(sampler, verbose=False, n_steps=per)
        jax.block_until_ready(t.state.params["sigma_net"])
        ts.append(time.perf_counter() - t0)
    step_ms = min(ts) / per * 1e3

    # fresh trainer for the quality run at equal steps
    t2 = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    s2 = NGPSampler(images[tr], poses[tr], K, tcfg)
    t2.fit(s2, verbose=False)
    losses = [h["loss"] for h in t2.history[-8:]]
    psnr = float(mse2psnr(jnp.float32(np.mean(losses))))
    return {"n_keep": n_keep, "step_ms": round(step_ms, 2),
            "train_psnr_at_equal_steps": round(psnr, 2),
            "rays_per_sec": round(4096 / (step_ms / 1e3))}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=768)
    p.add_argument("--keeps", type=int, nargs="+", default=[16, 12, 10])
    p.add_argument("--out", default="NGP_keep_study.json")
    a = p.parse_args(argv)
    out = []
    for k in a.keeps:
        r = run(k, a.steps)
        print(r, flush=True)
        out.append(r)
    with open(a.out, "w") as f:
        json.dump({"runs": out, "note": "2^19 capacity, 4096 rays/step, "
                   "synthetic 64^2 x8 views; psnr from last-8-step train "
                   "loss at equal steps"}, f, indent=1)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
