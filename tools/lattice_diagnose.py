"""Diagnose the lattice engine's 2.59 dB quality gap at 2^19 (VERDICT r3
weak #5 / next #3): is it the HASH SEMANTICS (collision structure) or a
KERNEL artifact (dropped out-of-slab corners on eval-shaped batches)?

The contradiction to explain: the lattice arm's final train loss was
LOWER than sorted's (5.8e-5 vs 2.3e-4) yet its full-image PSNR was
2.59 dB WORSE (LATTICE_quality.json).  Train batches are RANDOM rays
(keys ~ spread over the occupied set); eval renders SPATIALLY COHERENT
chunks (a frustum slice), whose dense-level keys cluster into many
separate runs — if a sorted block straddles 3+ runs, the dual
head+tail slab drops the middle runs' corners to zero
(hash_lattice._fetch_kernel).  That failure mode corrupts EVAL ONLY,
which would produce exactly the observed signature.

Stages (one TPU session, compile-cache enabled):
  1. train the lattice arm as in tools/quality_lattice.py (1536 steps,
     2^19, freq-40 scene);
  2. eval the SAME trained params three ways:
       a. kernel path, chunk 8192 (the gate's number);
       b. kernel path, chunks 4096 / 2048 (shape dependence);
       c. XLA-oracle path (identical lattice semantics, no slabs):
          if (c) >> (a), the gap is the kernel, not the hash.
  3. direct encode parity on the trained table: kernel vs oracle on
     (i) a uniform point cloud and (ii) an eval-shaped cloud (points
     from one rendered chunk's actual marching), plus
     spill_fraction_lattice on both.
Writes LATTICE_diagnose.json.

Run: cd /root/repo && nohup python -u tools/lattice_diagnose.py \
       > /tmp/latdiag.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from flnerf_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import (
        NGPConfig, make_ngp_field, make_ngp_spec,
    )
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    out = {"stages": {}}

    def note(k, v):
        out["stages"][k] = v
        print(k, json.dumps(v), flush=True)
        with open("LATTICE_diagnose.json", "w") as f:
            json.dump(out, f, indent=1)

    H, steps, freq = 64, 1536, 40
    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=16, n_test=2, H=H, W=H, texture_freq=freq)
    Hh, W, focal = hwf
    K = intrinsics_matrix(Hh, W, focal)
    tr = i_split[0]

    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5)
    tcfg = NGPTrainConfig(max_steps=steps, batch_rays=4096,
                          steps_per_chunk=16, full_refreshes=4, seed=0)

    def train_arm(engine):
        cfg = NGPConfig(bound=1.5, log2_hashmap_size=19,
                        hash_engine=engine)
        init_fn, density_fn, rgb_fn = make_ngp_field(cfg, jnp.bfloat16)
        t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
        sampler = NGPSampler(images[tr], poses[tr], K, tcfg, seed=0)
        t0 = time.time()
        t.fit(sampler, verbose=False)
        # tail-MEAN loss, not the last batch: LATTICE_quality.json's
        # final_train_loss was a single-batch sample (5.8e-5 vs sorted
        # 2.3e-4) — per-batch losses fluctuate ~10x, so the "lower
        # train loss yet lower PSNR" contradiction may be noise
        tail = [float(h["loss"]) for h in t.history[-32:]]
        note(f"train_{engine}", {
            "train_s": round(time.time() - t0, 1),
            "final_loss": float(t.history[-1]["loss"]),
            "tail32_mean_loss": float(np.mean(tail)),
            "tail32_median_loss": float(np.median(tail))})
        return cfg, t

    cfg, t = train_arm("lattice")

    # -- 2a/2b: kernel eval at several chunk sizes ----------------------
    for chunk in (8192, 4096, 2048):
        psnr, ssim = t.eval_images(poses[tr][:4], images[tr][:4, ..., :3],
                                   Hh, W, K, chunk=chunk)
        note(f"eval_kernel_chunk{chunk}",
             {"trainview_psnr": round(psnr, 3), "ssim": round(ssim, 4)})

    # -- 2c: XLA-oracle eval (same lattice semantics, no slab kernels) --
    ocfg = cfg._replace(hash_backend="xla")
    _, density_o, rgb_o = make_ngp_field(ocfg, jnp.bfloat16)
    t.replace_field(density_o, rgb_o, t.state.params)
    for chunk in (8192,):
        psnr, ssim = t.eval_images(poses[tr][:4], images[tr][:4, ..., :3],
                                   Hh, W, K, chunk=chunk)
        note("eval_oracle_chunk8192",
             {"trainview_psnr": round(psnr, 3), "ssim": round(ssim, 4)})
    _, density_k, rgb_k = make_ngp_field(cfg, jnp.bfloat16)
    t.replace_field(density_k, rgb_k, t.state.params)

    # -- sorted arm for a like-for-like tail-loss + eval comparison -----
    scfg, st = train_arm("sorted")
    psnr, ssim = st.eval_images(poses[tr][:4], images[tr][:4, ..., :3],
                                Hh, W, K, chunk=8192)
    note("eval_sorted_chunk8192",
         {"trainview_psnr": round(psnr, 3), "ssim": round(ssim, 4)})

    # -- 3: encode parity + spill on uniform vs eval-shaped clouds ------
    from flnerf_tpu.ops.hash_lattice import (
        lattice_encode, lattice_encode_xla, spill_fraction_lattice,
    )
    spec = make_ngp_spec(cfg)
    table_big = t.state.params["table"][1]

    def cloud_uniform(n, seed):
        return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3))

    def cloud_eval_shaped(n):
        """Points as a coherent frustum slice samples them: ray-ordered
        marching points of one 8192-ray image chunk."""
        from flnerf_tpu.rays.camera import get_rays_np
        ro, rd = get_rays_np(Hh, W, K, poses[tr][0][:3, :4])
        ro = ro.reshape(-1, 3)[:n // 16]
        rd = rd.reshape(-1, 3)[:n // 16]
        ts = np.linspace(2.2, 4.6, 16, dtype=np.float32)
        pts = ro[:, None] + rd[:, None] * ts[None, :, None]
        x01 = (pts.reshape(-1, 3) / cfg.bound + 1.0) * 0.5
        return jnp.asarray(np.clip(x01, 0.0, 1.0))

    for name, x in (("uniform_65536", cloud_uniform(65536, 1)),
                    ("uniform_131072", cloud_uniform(131072, 2)),
                    ("evalshaped_131072", cloud_eval_shaped(131072)),
                    ("evalshaped_65536", cloud_eval_shaped(65536))):
        k = jax.jit(lambda x: lattice_encode(x, table_big, spec))(x)
        o = lattice_encode_xla(x, table_big, spec)
        err = jnp.abs(k - o)
        scale = float(jnp.abs(o).max()) + 1e-9
        frac_bad = float(jnp.mean((err.max(axis=-1) > 1e-3 * scale)))
        spill = float(spill_fraction_lattice(x, spec))
        note(f"parity_{name}", {
            "max_abs_err": float(err.max()),
            "rel_to_max": float(err.max()) / scale,
            "frac_points_bad": round(frac_bad, 6),
            "spill_fraction": spill})

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
