"""Sort microbench: tile size / batch grid tradeoffs for the bitonic sort."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_ngp import scan_chain, slope_ms


def p_sort(g, log_m, n_pay=1):
    from flnerf_tpu.ops.sort_pallas import bitonic_sort

    m = 1 << log_m
    k = jax.random.randint(jax.random.PRNGKey(0), (g, m), 0, 1 << 19)
    pays = [
        jnp.arange(g * m, dtype=jnp.int32).reshape(g, m)
        for _ in range(n_pay)
    ]

    def step(c, i):
        keys, *p = c
        return bitonic_sort(keys ^ (i + 1), *p)

    ms = slope_ms(scan_chain(step), (k, *pays))
    print(f"sort_{g}x2^{log_m}_p{n_pay}: {ms:.2f} ms", flush=True)


def main():
    cases = [
        (14, 16, 1),   # one 16k-pt chunk's keys at half tile
        (28, 16, 1),   # two chunks batched in the grid
        (56, 15, 1),   # four 4k-pt chunks x 14 levels in one grid
        (112, 14, 1),  # eight 2k-pt chunks
        (14, 17, 2),   # 2 payloads at full tile
        (14, 15, 1),
        (14, 15, 2),
    ]
    for g, lm, np_ in cases:
        try:
            p_sort(g, lm, np_)
        except Exception as e:
            print(f"sort_{g}x2^{lm}_p{np_}: ERROR {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
