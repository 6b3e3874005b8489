"""Round-3 batched TPU session: per-level dense slabs + 8192-ray steps.

One process, stages print as they land (remote compiles of new Pallas
graph shapes take 10-60 min EACH — batch them in one session, never
wrap in timeout; see CLAUDE.md).

  1. tiny-spec smoke: fwd/bwd parity of the per-level dense slab change
     on real Mosaic.
  2. engine fwd+bwd at 131072 pts (8192 rays x K=16: the density that
     shrinks r_hash 104->64 and dense slabs to 32/40/56) and 65536.
  3. NGP trainer steady-state step at batch_rays=8192, engine=lattice.
  4. quality gate, lattice arm only (Minkowski-bound multipliers),
     vs the cached sorted arm in LATTICE_quality.json.

Run: cd /root/repo && nohup python -u tools/r3_batch.py > /tmp/r3batch.log 2>&1 &
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
    gr = jax.jit(jax.grad(
        lambda t: jnp.sum(lattice_encode_xla(x, t, spec) * w)))(tb)
    gerr = float(jnp.abs(g - gr).max() / (jnp.abs(gr).max() + 1e-9))
    print(f"smoke bwd rel-err={gerr:.2e}", flush=True)


def engine_timing():
    from flnerf_tpu.ops.hash_lattice import (
        _geometry, init_lattice_tables, lattice_encode, make_lattice_spec)

    spec = make_lattice_spec(log2_hashmap_size=19)
    _, tb = init_lattice_tables(jax.random.PRNGKey(0), spec)
    for n in (131072, 65536):
        geo = _geometry(n, spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))

        def fwdbwd(c, i):
            x, t = c
            g = jax.grad(lambda t: jnp.sum(
                lattice_encode(x, t, spec) ** 2))(t)
            return (x, t + g * 1e-9)

        ms = slope_ms(scan_chain(fwdbwd), (x, tb))
        print(f"lat_fwdbwd n={n} (block={geo.block} r_hash={geo.r_hash} "
              f"r_dense={geo.r_dense[:3]}): {ms:.2f} ms", flush=True)


def march_ab():
    from tools import profile_step_parts
    for n in (4096, 8192):
        profile_step_parts.march_variants(n)


def guarded(fn, name):
    try:
        fn()
    except Exception as e:  # compile failures are safe; log and move on
        print(f"### stage {name} FAILED: {type(e).__name__}: "
              f"{str(e)[:500]}", flush=True)


def trainer_step(batch_rays=8192, engine="lattice", compaction=None):
    import bench as _b  # repo-root bench.py helpers
    t, sampler, tcfg = _b._ngp_trainer(log2=19, engine=engine,
                                       batch_rays=batch_rays)
    if compaction is not None:
        t.rcfg = t.rcfg._replace(compaction=compaction)
        t._chunk_fn = t._make_chunk_fn()   # rcfg is baked in at jit time
        t._occ_fn = t._make_occ_fn()
    t.fit(sampler, verbose=False)  # 48 steps incl. compile
    t.cfg = tcfg._replace(max_steps=10_000)
    reps, steps = 3, 32
    t0 = time.time()
    for _ in range(reps):
        t.fit(sampler, verbose=False, n_steps=steps)
    jax.block_until_ready(t.state.params["sigma_net"])
    dt = time.time() - t0
    rps = reps * steps * batch_rays / dt
    print(f"ngp_trainer {engine} batch={batch_rays}: "
          f"{rps:,.0f} rays/s ({dt / (reps * steps) * 1e3:.1f} ms/step)",
          flush=True)


def quality_lattice_arm():
    from tools import quality_lattice
    quality_lattice.main(["--engines", "lattice"])


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    stages = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "smoke", "engine", "march", "trainer", "trainer_oh", "trainer4k",
        "quality", "small"]
    for s in stages:
        print(f"### stage {s} @ {time.strftime('%H:%M:%S')}", flush=True)
        if s == "smoke":
            smoke()
        elif s == "engine":
            engine_timing()
        elif s == "march":
            guarded(march_ab, s)
        elif s == "trainer":
            guarded(lambda: trainer_step(8192), s)
        elif s == "trainer_oh":
            guarded(lambda: trainer_step(8192, compaction="onehot"), s)
        elif s == "trainer4k":
            guarded(lambda: trainer_step(4096), s)
        elif s == "quality":
            quality_lattice_arm()
        elif s == "small":
            from tools import profile_step_parts
            guarded(profile_step_parts.small_chunks, s)
    print(f"### done @ {time.strftime('%H:%M:%S')}", flush=True)
