"""Lattice-hash quality gate: does the linear hash cost any PSNR?

The lattice engine (ops/hash_lattice.py) replaces the reference xor hash
(gridencoder.cu:36-47) with a linear hash on big levels so corners share
one sorted base key.  Its collision structure differs: distant
structured aliases replace xor's pseudo-random ones (nearby cells are
guaranteed collision-free by _pick_multipliers).  This trains the NGP
backend twice on the freq-textured synthetic scene at FULL 2^19
capacity — hash_engine='sorted' (xor semantics) vs 'lattice' — same
seed, same step budget, and records train-view PSNR for both.  A |delta|
within run-to-run noise (~0.1-0.2 dB) clears the engine for default use.

Writes LATTICE_quality.json.
Run: nohup python -u tools/quality_lattice.py > /tmp/latq.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(engine: str, steps: int, H: int, texture_freq: int, seed: int = 0,
        log2: int = 19, batch_rays: int = 4096, n_train: int = 16,
        n_keep: int = 16, n_candidates: int = 128):
    import jax.numpy as jnp

    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=n_train, n_test=2, H=H, W=H, texture_freq=texture_freq)
    Hh, W, focal = hwf
    K = intrinsics_matrix(Hh, W, focal)
    tr, te = i_split[0], i_split[2]

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=log2, hash_engine=engine)
    init_fn, density_fn, rgb_fn = make_ngp_field(cfg, jnp.bfloat16)
    rcfg = NGPRenderConfig(n_candidates=n_candidates, n_keep=n_keep,
                           grid_size=128, bound=1.5)
    tcfg = NGPTrainConfig(max_steps=steps, batch_rays=batch_rays,
                          steps_per_chunk=16, full_refreshes=4, seed=seed)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    sampler = NGPSampler(images[tr], poses[tr], K, tcfg, seed=seed)
    t0 = time.time()
    t.fit(sampler, verbose=False)
    train_s = time.time() - t0
    tr_psnr, tr_ssim = t.eval_images(poses[tr][:4], images[tr][:4, ..., :3],
                                     Hh, W, K, chunk=8192)
    return {"engine": engine, "steps": steps,
            "trainview_psnr": round(tr_psnr, 3),
            "trainview_ssim": round(tr_ssim, 4),
            "train_s": round(train_s, 1),
            "final_train_loss": float(t.history[-1]["loss"])}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1536)
    p.add_argument("--h", type=int, default=64)
    p.add_argument("--texture_freq", type=int, default=40)
    p.add_argument("--out", default="LATTICE_quality.json")
    p.add_argument("--engines", default="sorted,lattice",
                   help="comma list; a missing arm is reused from --out")
    p.add_argument("--log2", type=int, default=19)
    p.add_argument("--batch_rays", type=int, default=4096)
    p.add_argument("--n_train", type=int, default=16)
    p.add_argument("--n_keep", type=int, default=16)
    p.add_argument("--n_candidates", type=int, default=128)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (XLA oracle paths) — for "
                   "small-capacity hash-semantics studies while the TPU "
                   "pool is unavailable")
    a = p.parse_args(argv)
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from flnerf_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()

    prev = {}
    if os.path.exists(a.out):
        with open(a.out) as f:
            prev = {r["engine"]: r for r in json.load(f).get("runs", [])}
    runs = []
    for engine in ("sorted", "lattice"):
        if engine not in a.engines.split(","):
            assert engine in prev, f"no cached {engine} arm in {a.out}"
            runs.append(prev[engine])
            print(f"=== {engine} (cached)", flush=True)
            continue
        print(f"=== {engine}", flush=True)
        r = run(engine, a.steps, a.h, a.texture_freq, log2=a.log2,
                batch_rays=a.batch_rays, n_train=a.n_train,
                n_keep=a.n_keep, n_candidates=a.n_candidates)
        print(r, flush=True)
        runs.append(r)
    delta = runs[1]["trainview_psnr"] - runs[0]["trainview_psnr"]
    art = {"runs": runs, "delta_db": round(delta, 3),
           "note": "delta = lattice - sorted train-view PSNR at equal "
           f"steps/seed, 2^{a.log2} capacity, freq-{a.texture_freq} "
           "textured synthetic scene"
           + (" (CPU oracle-path proxy)" if a.cpu else "")}
    with open(a.out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art), flush=True)


if __name__ == "__main__":
    main()
