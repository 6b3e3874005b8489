"""v4 additive-hash engine primitive shapes, measured on real TPU.

Decides the kernel geometry BEFORE writing the Pallas kernels:
  * slab row-fetch matmuls at K = r (thin-K): batched [256, r] @ [r, 256]
    bf16 per (level, block, corner) — the fwd fetch's dominant MXU work.
  * the transposed K=256 variant (bwd scatter shape).
  * bitonic sorts at the v4 widths: [14, 2^16] with 1-4 payloads (base-key
    sort + frac payloads; unsort carries features + inverse perm).

Run from /root/repo:  nohup python -u tools/profile_v4.py > /tmp/v4prof.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_ngp import scan_chain, slope_ms


def p_slab_fwd(nb, r, m=256, n=256):
    """Batched thin-K fwd fetch proxy: [nb, m, r] @ [nb, r, n] bf16."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(k1, (nb, m, r), jnp.bfloat16)
    b = jax.random.normal(k2, (nb, r, n), jnp.bfloat16)

    def step(c, i):
        a, b = c
        out = jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # fold the result back into a so the chain can't be folded away
        a = (a + out[:, :, :r].astype(jnp.bfloat16) * 1e-6)
        return (a, b)

    ms = slope_ms(scan_chain(step), (a, b))
    gmac = nb * m * r * n / 1e9
    print(f"slab_fwd nb={nb} K={r}: {ms:.2f} ms  "
          f"({gmac:.1f} GMAC, {2 * gmac / ms:.1f} TFLOP/s)", flush=True)


def p_slab_bwd(nb, r, m=256, n=256):
    """K=256 bwd scatter proxy: contract the entry dim.
    [nb, m, r]^T-style: dot_general(A [nb,m,r], V [nb,m,n], contract m)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = jax.random.normal(k1, (nb, m, r), jnp.bfloat16)
    v = jax.random.normal(k2, (nb, m, n), jnp.bfloat16)

    def step(c, i):
        a, v = c
        out = jax.lax.dot_general(
            a, v, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [nb, r, n]
        v = v + out[:, :1, :].astype(jnp.bfloat16) * 1e-6
        return (a, v)

    ms = slope_ms(scan_chain(step), (a, v))
    gmac = nb * m * r * n / 1e9
    print(f"slab_bwd nb={nb} K={m}: {ms:.2f} ms  "
          f"({gmac:.1f} GMAC, {2 * gmac / ms:.1f} TFLOP/s)", flush=True)


def p_sort(g, log_m, n_pay):
    from flnerf_tpu.ops.sort_pallas import bitonic_sort

    m = 1 << log_m
    k = jax.random.randint(jax.random.PRNGKey(0), (g, m), 0, 1 << 19)
    pays = [jnp.arange(g * m, dtype=jnp.int32).reshape(g, m)
            for _ in range(n_pay)]

    def step(c, i):
        keys, *p = c
        return bitonic_sort(keys ^ (i + 1), *p)

    ms = slope_ms(scan_chain(step), (k, *pays))
    print(f"sort_{g}x2^{log_m}_p{n_pay}: {ms:.2f} ms", flush=True)


def main():
    which = set(sys.argv[1:])

    if not which or "slab" in which:
        # 65k pts, 14 big levels: nb = 14 * (65536/256 blocks) * 8 corners
        nb_full = 14 * 256 * 8
        for r in (16, 24, 32, 40, 64):
            p_slab_fwd(nb_full, r)
        # 16k-pt chunk variant (nb/4)
        p_slab_fwd(14 * 64 * 8, 24)
        for r in (16, 24, 32):
            p_slab_bwd(14 * 256 * 8, r)

    if not which or "sort" in which:
        for np_ in (1, 2, 3, 4):
            p_sort(14, 16, np_)
        p_sort(14, 14, 3)   # 16k chunk
        p_sort(14, 17, 3)   # 2^17-entry chunk (VMEM probe)


if __name__ == "__main__":
    main()
