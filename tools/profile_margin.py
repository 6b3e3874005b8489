"""A/B the lattice engine's hashed-slab safety margin on real TPU.

The r5 roofline estimate (lattice_flops_estimate) puts the engine at
~42% of the bf16 matmul roof, with margin rows a large slice of the
fetch MACs at training shapes: r_hash = span + 4*sigma + 24 rows, where
span = block*t_r64/per is the EXPECTED block key span — at the 65k-pt
trainer shape that's 64 expected + 40 margin rows (63% overhead).

This sweeps the (sigma multiplier, flat rows) margin, timing the 65k-pt
fwd+bwd slope AND measuring the exact spill fraction on a real uniform
batch (spilled fetches drop corners -> quality, not crashes; the
monitor is spill_fraction_lattice).

Run: nohup python -u tools/profile_margin.py > /tmp/margin.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flnerf_tpu.core.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

import flnerf_tpu.ops.hash_lattice as hl
from tools.profile_ngp import scan_chain, slope_ms

_ORIG_GEOMETRY = hl._geometry


def patched(sig_mult, flat):
    def _geom(n_points, spec):
        g = _ORIG_GEOMETRY(n_points, spec)
        per = -(-n_points // g.n_ch)
        span = g.block * spec.t_r64 / per
        if g.block >= 64:
            r_hash = min(spec.t_r64, spec.r_pad,
                         max(hl._round8(
                             int(span + sig_mult * span
                                 / np.sqrt(g.block / 2.0)) + flat), 32))
            g = g._replace(r_hash=r_hash)
        return g
    return _geom


def measure(n_pts=65536, log2=19):
    spec = hl.make_lattice_spec(log2_hashmap_size=log2)
    tables = hl.init_lattice_tables(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n_pts, 3))

    def step(c, i):
        x, tb = c
        g = jax.grad(lambda t: jnp.sum(
            hl.lattice_encode_split(x, t, spec) ** 2))(tb)
        return (x, jax.tree_util.tree_map(
            lambda a, b: a + 1e-9 * b, tb, g))

    ms = slope_ms(scan_chain(step), (x, tables))
    spill = float(hl.spill_fraction_lattice(x, spec))
    geo = hl._geometry(n_pts, spec)
    return ms, spill, geo.r_hash


def main():
    for sig_mult, flat, tag in ((4.0, 24, "baseline"), (3.0, 16, "mid"),
                                (2.5, 8, "tight"), (2.0, 8, "tighter")):
        hl._geometry = patched(sig_mult, flat)
        try:
            ms, spill, r_hash = measure()
        except Exception as e:
            print(f"{tag} sig={sig_mult} flat={flat}: ERROR "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        finally:
            hl._geometry = _ORIG_GEOMETRY
        print(f"{tag} sig={sig_mult} flat={flat}: r_hash={r_hash} "
              f"fwd+bwd {ms:.2f} ms spill={spill:.2e}", flush=True)


if __name__ == "__main__":
    main()
