"""512^3 real-TPU smoke (VERDICT r4 #5): one reduced-step train step of
the spatially-sharded grid path at the reference's top resolution
(opt.py:104-151 trains 256^3 -> 512^3).

Single-chip here, so the mesh is 1 device — the POINT is the shape: the
full 512^3 fwd+bwd value_and_grad step compiles and executes on real
hardware at basis_dim=1 (~2.7 GB of grid + grads; 27-channel SH would
be 14.5 GB x2 and is the multi-chip regime this path shards for — the
8-device correctness check at this exact shape is
tests/test_sharded_512.py).

Writes PLENOXELS_512_smoke.json.
Run: nohup python -u tools/smoke_512.py > /tmp/s512.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from flnerf_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.voxel_sh import (
        VoxelGrid, VoxelGridConfig, voxel_render_rays,
    )

    reso = (512, 512, 512)
    gcfg = VoxelGridConfig(reso=reso, basis_dim=1, max_steps=128,
                           step_size=4.0, init_sigma=0.05)

    @jax.jit
    def make_grid(key):
        k1, k2 = jax.random.split(key)
        idx = (jnp.arange(512, dtype=jnp.float32) - 255.5) / 256.0
        x, y, z = jnp.meshgrid(idx, idx, idx, indexing="ij")
        r = jnp.sqrt(x * x + y * y + z * z)
        density = jnp.where(r < 0.5,
                            0.5 * jax.random.uniform(k1, reso), 0.0)
        sh = jnp.where((r < 0.5)[..., None],
                       0.3 * jax.random.normal(k2, reso + (3,)), 0.0)
        return VoxelGrid(density=density, sh=sh,
                         alive=jnp.ones(reso, bool))

    grid = make_grid(jax.random.PRNGKey(0))
    n_rays = 1024
    key = jax.random.PRNGKey(1)
    rd = jax.random.uniform(key, (n_rays, 3), minval=-0.3, maxval=0.3)
    rd = rd.at[:, 2].set(-1.0)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.zeros((n_rays, 3), jnp.float32).at[:, 2].set(3.0)
    gt = jax.random.uniform(jax.random.PRNGKey(2), (n_rays, 3))

    @jax.jit
    def step(density, sh):
        def loss(d, s):
            g = VoxelGrid(density=d, sh=s, alive=grid.alive)
            out = voxel_render_rays(g, ro, rd, gcfg)
            return jnp.mean((out["rgb"] - gt) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(density, sh)

    t0 = time.time()
    l, (gd, gs) = step(grid.density, grid.sh)
    l = float(l)
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        l2, (gd, gs) = step(grid.density, grid.sh)
    jax.block_until_ready(gd)
    step_ms = (time.time() - t0) / reps * 1e3
    gmax = float(jnp.abs(gd).max())
    art = {
        "reso": 512, "basis_dim": 1, "n_rays": n_rays,
        "max_steps": gcfg.max_steps,
        "loss": l, "grad_density_absmax": gmax,
        "finite": bool(np.isfinite(l) and np.isfinite(gmax) and gmax > 0),
        "compile_s": round(compile_s, 1),
        "fwd_bwd_step_ms": round(step_ms, 1),
        "note": "single-chip smoke of the spatially-sharded 512^3 path; "
        "8-device parity at this shape: tests/test_sharded_512.py",
    }
    with open("PLENOXELS_512_smoke.json", "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art), flush=True)


if __name__ == "__main__":
    main()
