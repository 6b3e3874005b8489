"""TPU gate for the r4 pad-duplication fix + hash_pallas compact layout.

Three claims to verify on real TPU (writes PADFIX_gate.json):

1. MECHANISM: encoding a batch padded by ONE repeated point (the old
   ngp_render_image behavior) violates the lattice engine's
   duplicate-uniformity contract -> large per-point errors vs oracle;
   the same batch padded by WRAP-TILING real points is clean.
2. E2E: with the render wrap-pad fix, eval at chunk 8192 on a 4096-ray
   image matches chunk 4096 and the XLA oracle (the round-3 "lattice
   quality gap" composition), for BOTH lattice and sorted engines.
3. The hash_pallas compact [*, CPR, WIDTH] layout (r4 rewrite) trains
   and evals to the same quality (it is inside every arm here), at no
   HBM blowup.

Run: cd /root/repo && nohup python -u tools/probe_pad_fix.py \
       > /tmp/padfix.log 2>&1 &
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

    out = {}

    def note(k, v):
        out[k] = v
        print(k, json.dumps(v), flush=True)
        with open("PADFIX_gate.json", "w") as f:
            json.dump(out, f, indent=1)

    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_spec
    from flnerf_tpu.ops.hash_lattice import (
        init_lattice_tables, lattice_encode_split, spill_fraction_lattice,
    )

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=19, hash_engine="lattice")
    spec = make_ngp_spec(cfg)
    tables = init_lattice_tables(jax.random.PRNGKey(0), spec)

    def parity(tag, x):
        k = np.asarray(jax.jit(
            lambda x: lattice_encode_split(x, tables, spec,
                                           use_kernels=True))(x), np.float32)
        o = np.asarray(lattice_encode_split(x, tables, spec,
                                            use_kernels=False), np.float32)
        err = np.abs(k - o)
        scale = float(np.abs(o).max()) + 1e-9
        per_pt = err.max(axis=-1)
        note(tag, {
            "max_abs_err": float(err.max()),
            "rel_to_max": float(err.max()) / scale,
            "frac_points_verybad":
                round(float((per_pt > 3e-2 * scale).mean()), 6),
            "spill_fraction":
                float(spill_fraction_lattice(x, spec))})

    half = jax.random.uniform(jax.random.PRNGKey(1), (65536, 3))
    # old render behavior: pad = one repeated point
    dummy_pad = jnp.concatenate(
        [half, jnp.broadcast_to(half[-1:], (65536, 3))], 0)
    # new render behavior: pad = wrap-tiled real points
    wrap_pad = jnp.tile(half, (2, 1))
    parity("encode_dummy_pad_131072", dummy_pad)
    parity("encode_wrap_pad_131072", wrap_pad)
    # SMEM-blocking fix: 2^19/2^20-point calls used to be a hard SMEM
    # compile error (1.31 MB of whole-array slab bases, LATTICE_multichunk)
    for n in (1 << 19, 1 << 20):
        parity(f"encode_uniform_{n}",
               jax.random.uniform(jax.random.PRNGKey(2), (n, 3)))

    # ---- e2e: the exact round-3 gate composition -----------------------
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import make_ngp_field
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

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
        acfg = NGPConfig(bound=1.5, log2_hashmap_size=19,
                         hash_engine=engine)
        init_fn, density_fn, rgb_fn = make_ngp_field(acfg, jnp.bfloat16)
        t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
        sampler = NGPSampler(images[tr], poses[tr], K, tcfg, seed=0)
        t0 = time.time()
        t.fit(sampler, verbose=False)
        note(f"train_{engine}", {"train_s": round(time.time() - t0, 1)})
        return acfg, t

    for engine in ("lattice", "sorted"):
        acfg, t = train_arm(engine)
        for chunk in (8192, 4096):
            psnr, ssim = t.eval_images(poses[tr][:4],
                                       images[tr][:4, ..., :3],
                                       Hh, W, K, chunk=chunk)
            note(f"eval_{engine}_chunk{chunk}",
                 {"trainview_psnr": round(psnr, 3), "ssim": round(ssim, 4)})
        if engine == "lattice":
            ocfg = acfg._replace(hash_backend="xla")
            _, density_o, rgb_o = make_ngp_field(ocfg, jnp.bfloat16)
            t.replace_field(density_o, rgb_o, t.state.params)
            psnr, ssim = t.eval_images(poses[tr][:4],
                                       images[tr][:4, ..., :3],
                                       Hh, W, K, chunk=8192)
            note("eval_lattice_oracle_chunk8192",
                 {"trainview_psnr": round(psnr, 3), "ssim": round(ssim, 4)})

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
