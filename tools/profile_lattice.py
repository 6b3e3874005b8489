"""Lattice-hash engine (v4) on real TPU: smoke + block-size sweep.

Stages (each prints as it lands so the log is monitorable):
  1. tiny-spec smoke (2^16 table, 2k pts): validates Mosaic compilation
     of both kernels + parity vs the XLA twin on-device.
  2. full 2^19 spec: fwd and fwd+bwd ms at 65k and 16k points for
     spec.block in the sweep list (each block is its own compile).

Run:  cd /root/repo && nohup python -u tools/profile_lattice.py > /tmp/lat.log 2>&1 &
NEVER wrap in timeout (remote compiles of new Pallas graphs take
10-60 min EACH and killing mid-compile wedges the tile — CLAUDE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.profile_ngp import scan_chain, slope_ms


def smoke():
    from flnerf_tpu.ops.hash_lattice import (
        init_lattice_tables, lattice_encode, lattice_encode_xla,
        make_lattice_spec)

    spec = make_lattice_spec(log2_hashmap_size=16, split_min_size=1 << 15)
    _, tb = init_lattice_tables(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2048, 3))
    out = jax.jit(lambda x, t: lattice_encode(x, t, spec))(x, tb)
    ref = lattice_encode_xla(x, tb, spec)
    err = float(jnp.abs(out - ref).max())
    print(f"smoke fwd err={err:.2e}", flush=True)
    w = jax.random.normal(jax.random.PRNGKey(2), out.shape)
    g = jax.jit(jax.grad(
        lambda t: jnp.sum(lattice_encode(x, t, spec) * w)))(tb)
    gr = jax.grad(lambda t: jnp.sum(lattice_encode_xla(x, t, spec) * w))(tb)
    gerr = float(jnp.abs(g - gr).max())
    print(f"smoke bwd err={gerr:.2e}", flush=True)


def sweep(block, n, fwd_only=False):
    from flnerf_tpu.ops.hash_lattice import (
        init_lattice_tables, lattice_encode, make_lattice_spec, _geometry)

    spec = make_lattice_spec(log2_hashmap_size=19, block=block)
    geo = _geometry(n, spec)
    _, tb = init_lattice_tables(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    w = jax.random.normal(jax.random.PRNGKey(2), (n, spec.n_big * 2))

    if fwd_only:
        def step(c, i):
            x, t = c
            out = lattice_encode(x, t, spec)
            x = x + out[:, :3] * 1e-6
            return (x, t)

        ms = slope_ms(scan_chain(step), (x, tb))
        print(f"lat_fwd block={block} n={n} (geo block={geo.block} "
              f"r={geo.r_max}): {ms:.2f} ms", flush=True)
    else:
        def step(c, i):
            x, t = c
            loss, g = jax.value_and_grad(
                lambda t: jnp.sum(lattice_encode(x, t, spec) * w))(t)
            t = t + g * 1e-9
            return (x, t)

        ms = slope_ms(scan_chain(step), (x, tb))
        print(f"lat_fwdbwd block={block} n={n} (geo block={geo.block} "
              f"r={geo.r_max}): {ms:.2f} ms", flush=True)


def split_small(n=65536):
    """Small-levels cost inside the split encode: split(full) - big-only."""
    from flnerf_tpu.ops.hash_lattice import (
        init_lattice_tables, lattice_encode, lattice_encode_split,
        make_lattice_spec)

    spec = make_lattice_spec(log2_hashmap_size=19)
    ts, tb = init_lattice_tables(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))

    def mk(full):
        def step(c, i):
            x, ts, tb = c
            if full:
                def loss(ts, tb):
                    return jnp.sum(
                        lattice_encode_split(x, (ts, tb), spec) ** 2)
                gs, gb = jax.grad(loss, argnums=(0, 1))(ts, tb)
                return (x, ts + gs * 1e-9, tb + gb * 1e-9)
            g = jax.grad(
                lambda tb: jnp.sum(lattice_encode(x, tb, spec) ** 2))(tb)
            return (x, ts, tb + g * 1e-9)
        return step

    ms_full = slope_ms(scan_chain(mk(True)), (x, ts, tb))
    ms_big = slope_ms(scan_chain(mk(False)), (x, ts, tb))
    print(f"split_full n={n}: {ms_full:.2f} ms; big-only {ms_big:.2f}; "
          f"small-levels cost {ms_full - ms_big:.2f} ms", flush=True)


def main():
    which = set(sys.argv[1:])
    if not which or "smoke" in which:
        smoke()
    if not which or "sweep" in which:
        for block in (1024, 512):
            sweep(block, 65536, fwd_only=True)
            sweep(block, 65536)
        sweep(1024, 16384)
        sweep(1024, 131072)   # single-chunk at the widened POINT_CAP
    if "split" in which:
        split_small()


if __name__ == "__main__":
    main()
