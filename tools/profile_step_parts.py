"""A/B micro-profiles for the NGP step's non-hash parts on real TPU.

1. small-levels matmul path at 65k points vs hash_chunk
2. march prep variants: current argsort-compaction vs top_k
Run: nohup python -u tools/profile_step_parts.py > /tmp/parts.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_ngp import scan_chain, slope_ms


def small_chunks():
    from flnerf_tpu.ops.hash_lattice import (
        init_lattice_tables, make_lattice_spec)
    from flnerf_tpu.ops.hash_pallas import hash_encode_pallas

    spec = make_lattice_spec(log2_hashmap_size=19)
    ts, _ = init_lattice_tables(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (65536, 3))
    for chunk in (4096, 16384, 65536):
        def step(c, i, chunk=chunk):
            x, ts = c
            g = jax.grad(lambda t: jnp.sum(
                hash_encode_pallas(x, t, spec.split.small, chunk) ** 2))(ts)
            return (x, ts + g * 1e-9)

        ms = slope_ms(scan_chain(step), (x, ts))
        print(f"small_fwdbwd chunk={chunk}: {ms:.2f} ms", flush=True)


def march_variants(n_rays=4096):
    from flnerf_tpu.render.ngp import (
        NGPRenderConfig, init_occupancy, near_far_from_aabb,
        occupancy_lookup, with_density,
    )

    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5)
    occ = init_occupancy(rcfg)
    occ = with_density(
        occ, jax.random.uniform(jax.random.PRNGKey(2), occ.density.shape),
        rcfg)
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.tile([[0, 0, 3.0]], (n_rays, 1)), jnp.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.2
    d[:, 2] -= 1.0
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    S, K = rcfg.n_candidates, rcfg.n_keep

    def base(acc, i):
        near, far, hit = near_far_from_aabb(o, d, rcfg.bound, rcfg.min_near)
        t = jnp.linspace(0.0, 1.0, S)
        z = near[:, None] + (far - near)[:, None] * t[None, :] + 1e-7 * i
        xyz = jnp.clip(o[:, None, :] + d[:, None, :] * z[..., None],
                       -rcfg.bound, rcfg.bound)
        m = occupancy_lookup(occ, xyz, rcfg) & hit[:, None]
        return m, z

    def v_argsort(acc, i):
        m, z = base(acc, i)
        order = jnp.argsort(jnp.logical_not(m), axis=-1, stable=True)[:, :K]
        zk = jnp.take_along_axis(z, order, axis=-1)
        return acc + jnp.sum(zk)

    def v_topk(acc, i):
        m, z = base(acc, i)
        iota = jnp.arange(S, dtype=jnp.int32)[None, :]
        scored = jnp.where(m, S - iota, -iota)  # occupied first, in order
        _, order = jax.lax.top_k(scored, K)
        zk = jnp.take_along_axis(z, order, axis=-1)
        return acc + jnp.sum(zk)

    def v_occonly(acc, i):
        m, z = base(acc, i)
        return acc + jnp.sum(jnp.where(m, z, 0.0))

    def v_onehot(acc, i):
        m, z = base(acc, i)
        mf = m.astype(jnp.float32)
        c_occ = jnp.cumsum(mf, axis=-1)
        n_occ = c_occ[:, -1:]
        dest = jnp.where(m, c_occ - 1.0,
                         n_occ + jnp.cumsum(1.0 - mf, axis=-1) - 1.0)
        kidx = jnp.arange(K, dtype=jnp.float32)
        sel = dest[:, None, :] == kidx[None, :, None]
        zk = jnp.sum(jnp.where(sel, z[:, None, :], 0.0), -1)
        return acc + jnp.sum(zk)

    for name, f in (("argsort", v_argsort), ("topk", v_topk),
                    ("occonly", v_occonly), ("onehot", v_onehot)):
        ms = slope_ms(scan_chain(f), jnp.float32(0))
        print(f"march_{name}_{n_rays}rays: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    small_chunks()
    march_variants()
