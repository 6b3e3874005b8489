"""Pin the lattice-engine eval defect to a path + point count (r4).

LATTICE_diagnose.json showed: same trained params, eval chunk 8192
(candidate encode = 8192 x 128 = 2^20 points) loses 5.3 dB vs chunk
4096 (2^19) / the XLA oracle, while direct parity at <= 2^17 points is
clean — so the defect lives in some kernel path ONLY at point counts
above the diagnose's probes.  CPU interpret-mode multi-chunk is clean
(n_ch up to 8 at a shrunk POINT_CAP), so it is TPU-hardware-specific.

This probe runs FULL encode parity (Pallas kernels vs XLA oracle,
random tables) at n = 2^17 (control) .. 2^20, uniform + ray-coherent
clouds, then isolates small-levels (hash_encode_pallas) vs big-levels
(lattice_encode) at every n.  Writes LATTICE_multichunk.json.

Run: cd /root/repo && nohup python -u tools/probe_lattice_multichunk.py \
       > /tmp/lat_mc.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from flnerf_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_spec
    from flnerf_tpu.ops.hash_lattice import (
        init_lattice_tables,
        lattice_encode,
        lattice_encode_split,
        lattice_encode_xla,
    )
    from flnerf_tpu.ops.hash_pallas import hash_encode_pallas, hash_encode_xla

    out = {}

    def note(k, v):
        out[k] = v
        print(k, json.dumps(v), flush=True)
        with open("LATTICE_multichunk.json", "w") as f:
            json.dump(out, f, indent=1)

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=19, hash_engine="lattice")
    spec = make_ngp_spec(cfg)
    tables = init_lattice_tables(jax.random.PRNGKey(0), spec)
    table_small, table_big = tables

    def cloud_uniform(n, seed):
        return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3))

    def cloud_eval_shaped(n):
        """Ray-coherent cloud: 16 marching samples per ray along +z."""
        per = n // 16
        g = int(np.ceil(np.sqrt(per)))
        xs, ys = np.meshgrid(np.linspace(0.1, 0.9, g),
                             np.linspace(0.1, 0.9, g))
        ro = np.stack([xs.ravel()[:per], ys.ravel()[:per],
                       np.zeros(per)], -1).astype(np.float32)
        ts = np.linspace(0.05, 0.95, 16, dtype=np.float32)
        pts = ro[:, None] + np.array([0, 0, 1], np.float32) * ts[None, :, None]
        return jnp.asarray(pts.reshape(-1, 3).clip(0.0, 1.0))

    def parity(tag, enc_k, enc_o, x):
        k = np.asarray(jax.jit(enc_k)(x), np.float32)
        o = np.asarray(enc_o(x), np.float32)
        err = np.abs(k - o)
        scale = float(np.abs(o).max()) + 1e-9
        per_pt = err.max(axis=-1)
        note(tag, {
            "max_abs_err": float(err.max()),
            "rel_to_max": float(err.max()) / scale,
            "frac_points_bad":
                round(float((per_pt > 1e-3 * scale).mean()), 6),
            "frac_points_verybad":
                round(float((per_pt > 3e-2 * scale).mean()), 6),
            "worst_point": int(per_pt.argmax())})

    full_k = lambda x: lattice_encode_split(x, tables, spec,
                                            use_kernels=True)
    full_o = lambda x: lattice_encode_split(x, tables, spec,
                                            use_kernels=False)
    big_k = lambda x: lattice_encode(x, table_big, spec)
    big_o = lambda x: lattice_encode_xla(x, table_big, spec)
    if spec.split.small is not None:
        small_k = lambda x: hash_encode_pallas(x, table_small,
                                               spec.split.small, 4096)
        small_o = lambda x: hash_encode_xla(x, table_small,
                                            spec.split.small)

    for n in (1 << 17, 1 << 18, 1 << 19, 1 << 20):
        for shape, cloud in (("uniform", cloud_uniform(n, 1 + n % 97)),
                             ("evalshaped", cloud_eval_shaped(n))):
            parity(f"full_{shape}_{n}", full_k, full_o, cloud)
            parity(f"big_{shape}_{n}", big_k, big_o, cloud)
            if spec.split.small is not None:
                parity(f"small_{shape}_{n}", small_k, small_o, cloud)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
