"""Localize the 128-bad-points defect at 2^19-point lattice encodes on
real TPU (PADFIX_gate.json encode_uniform_524288: frac_verybad 2.4e-4,
clean at <= 2^18 and in CPU interpret at n_ch=4).  Dumps the bad points'
structure: which chunk (round-robin residue), which sorted positions,
big vs small path.  Writes LATTICE_519.json.

Run: cd /root/repo && nohup python -u tools/probe_519_localize.py \
       > /tmp/l519.log 2>&1 &
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

    import flnerf_tpu.ops.hash_lattice as hl
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_spec
    from flnerf_tpu.ops.hash_pallas import hash_encode_pallas, hash_encode_xla

    out = {}

    def note(k, v):
        out[k] = v
        print(k, json.dumps(v), flush=True)
        with open("LATTICE_519.json", "w") as f:
            json.dump(out, f, indent=1)

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=19, hash_engine="lattice")
    spec = make_ngp_spec(cfg)
    tables = hl.init_lattice_tables(jax.random.PRNGKey(0), spec)
    table_small, table_big = tables

    n = 1 << 19
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    geo = hl._geometry(n, spec)
    note("geometry", {"n_ch": geo.n_ch, "m_pad": geo.m_pad,
                      "block": geo.block, "nblk": geo.nblk,
                      "n_g": geo.n_g, "r_hash": geo.r_hash})

    def bad_mask(k, o, thresh=3e-2):
        err = np.abs(k - o)
        scale = float(np.abs(o).max()) + 1e-9
        return err.max(axis=-1) > thresh * scale, err

    # big path
    kb = np.asarray(jax.jit(
        lambda x: hl.lattice_encode(x, table_big, spec))(x), np.float32)
    ob = np.asarray(hl.lattice_encode_xla(x, table_big, spec), np.float32)
    mb, errb = bad_mask(kb, ob)
    note("big_path", {"n_bad": int(mb.sum()),
                      "max_err": float(errb.max())})
    # small path
    if spec.split.small is not None:
        ks = np.asarray(jax.jit(
            lambda x: hash_encode_pallas(x, table_small, spec.split.small,
                                         4096))(x), np.float32)
        os_ = np.asarray(hash_encode_xla(x, table_small, spec.split.small),
                         np.float32)
        ms, errs = bad_mask(ks, os_)
        note("small_path", {"n_bad": int(ms.sum()),
                            "max_err": float(errs.max())})

    idx = np.nonzero(mb)[0]
    if idx.size:
        # structure: chunk residue (round-robin deal: point p -> chunk
        # p % n_ch, in-chunk position p // n_ch), per-level bad channels
        pos = idx // geo.n_ch
        ch = idx % geo.n_ch
        lvl_bad = (np.abs(kb[idx] - ob[idx]).reshape(idx.size, -1, 2)
                   .max(-1) > 3e-2 * np.abs(ob).max())
        note("bad_structure", {
            "n": int(idx.size),
            "chunks": np.bincount(ch, minlength=geo.n_ch).tolist(),
            "pos_min": int(pos.min()), "pos_max": int(pos.max()),
            "pos_unique": int(np.unique(pos).size),
            "block_ids": np.unique(pos // geo.block).tolist()[:20],
            "levels_hist": lvl_bad.sum(0).tolist(),
            "first_idx": idx[:16].tolist()})
        # determinism: run twice, same bads?
        kb2 = np.asarray(jax.jit(
            lambda x: hl.lattice_encode(x, table_big, spec))(x), np.float32)
        note("deterministic", {"same": bool(np.array_equal(kb, kb2))})

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
