"""Stage-isolate the 128-bad-points defect at 2^19-point lattice encodes
(LATTICE_519.json: top-32 iota per chunk, level 13 only, TPU only).

The fetch runs in SORTED-key order while the bad points are selected by
ORIGINAL position, so the corruption must live in (a) the first sort's
payload permutation, (b) the unsort permutation, or (c) the fetch at
whatever sorted positions the bad entries happen to occupy.  This probe
checks each stage against numpy ground truth with the exact 2^19 inputs.

Run: cd /root/repo && nohup python -u tools/probe_519_stage.py \
       > /tmp/l519b.log 2>&1 &
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
    from flnerf_tpu.ops.sort_pallas import bitonic_sort

    out = {}

    def note(k, v):
        out[k] = v
        print(k, json.dumps(v), flush=True)
        with open("LATTICE_519_stage.json", "w") as f:
            json.dump(out, f, indent=1)

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=19, hash_engine="lattice")
    spec = make_ngp_spec(cfg)
    _, table_big = hl.init_lattice_tables(jax.random.PRNGKey(0), spec)

    n = 1 << 19
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    geo = hl._geometry(n, spec)
    lb = spec.n_big

    # ---- stage 0: keys/payloads via XLA (trusted) -----------------------
    total = geo.n_ch * geo.m_pad
    assert total == n
    x01 = jnp.transpose(x.reshape(geo.m_pad, geo.n_ch, 3), (1, 0, 2))
    key, p0, p1 = hl._base_keys_payloads(x01, spec)
    key_np = np.asarray(key)
    p0_np = np.asarray(p0)
    p1_np = np.asarray(p1)

    # ---- stage 1: first sort on TPU vs numpy stable sort ----------------
    skey, sp0, sp1 = jax.jit(lambda k, a, b: bitonic_sort(k, a, b))(
        key, p0, p1)
    skey_np, sp0_np, sp1_np = map(np.asarray, (skey, sp0, sp1))

    bad_rows = []
    for r in range(key_np.shape[0]):
        order = np.argsort(key_np[r], kind="stable")
        ok_k = np.array_equal(skey_np[r], key_np[r][order])
        # payload pairing: (key, p1) multiset must match exactly (p1 is
        # unique per row via the position bits)
        got = skey_np[r].astype(np.int64) << 32 | np.uint32(sp1_np[r])
        want = (key_np[r][order].astype(np.int64) << 32
                | np.uint32(p1_np[r][order]))
        ok_p1 = np.array_equal(np.sort(got), np.sort(want))
        # p0 must travel with p1: map position->p0
        pos_got = sp1_np[r] >> 14 & ((1 << 17) - 1)
        ok_p0 = np.array_equal(sp0_np[r][np.argsort(pos_got)],
                               p0_np[r])
        if not (ok_k and ok_p1 and ok_p0):
            bad_rows.append({"row": r, "ok_k": bool(ok_k),
                             "ok_p1": bool(ok_p1), "ok_p0": bool(ok_p0)})
    note("first_sort", {"n_bad_rows": len(bad_rows),
                        "bad_rows": bad_rows[:8]})

    # ---- stage 2: unsort on TPU vs ground truth -------------------------
    # exact shapes/arrays of the real unsort: key=pos, 3 payloads
    pos = jax.lax.shift_right_logical(sp1, 14)
    iota = jnp.broadcast_to(
        jnp.arange(geo.m_pad, dtype=jnp.int32)[None], pos.shape)
    # synthetic payloads that mimic feature bit patterns (floats incl.
    # negatives, bitcast): payload = f(iota) so truth is closed-form
    f0_syn = jax.lax.bitcast_convert_type(
        (jnp.arange(geo.m_pad, dtype=jnp.float32)[None] * 1e-4 - 3.0
         ).astype(jnp.float32), jnp.int32)
    f0_syn = jnp.broadcast_to(f0_syn, pos.shape)
    sp1_perm = sp1  # payload with the pos bits, to track placement
    upos, uf0, up1, inv = jax.jit(
        lambda a, b, c, d: bitonic_sort(a, b, c, d))(
        pos, f0_syn, sp1_perm, iota)
    upos_np, uf0_np, up1_np, inv_np = map(
        np.asarray, (upos, uf0, up1, inv))
    pos_np = np.asarray(pos)
    bad2 = []
    m = geo.m_pad
    ar = np.arange(m, dtype=np.int32)
    for r in range(pos_np.shape[0]):
        ok_key = np.array_equal(upos_np[r], ar)
        # payload correctness: up1 at position p must be the sp1 whose
        # pos==p, i.e. up1>>14 == iota
        ok_pl = np.array_equal(up1_np[r] >> 14 & ((1 << 17) - 1), ar)
        # inv: sorted-order index that lands at each position
        ok_inv = np.array_equal(pos_np[r][inv_np[r]], ar)
        if not (ok_key and ok_pl and ok_inv):
            bad_pos = np.nonzero(
                (up1_np[r] >> 14 & ((1 << 17) - 1)) != ar)[0]
            bad2.append({"row": r, "ok_key": bool(ok_key),
                         "ok_pl": bool(ok_pl), "ok_inv": bool(ok_inv),
                         "bad_pos_min": int(bad_pos.min()) if bad_pos.size
                         else -1,
                         "bad_pos_max": int(bad_pos.max()) if bad_pos.size
                         else -1,
                         "n_bad_pos": int(bad_pos.size)})
    note("unsort", {"n_bad_rows": len(bad2), "bad_rows": bad2[:8]})

    # ---- stage 3: fetch in sorted order vs oracle -----------------------
    # only if stages 1-2 are exact; compare the REAL encode's per-point
    # output (already known bad) against oracle to recover the bad
    # entries' SORTED positions via the first sort's permutation
    if not bad_rows and not bad2:
        kb = np.asarray(jax.jit(
            lambda x: hl.lattice_encode(x, table_big, spec))(x), np.float32)
        ob = np.asarray(hl.lattice_encode_xla(x, table_big, spec),
                        np.float32)
        err = np.abs(kb - ob)
        scale = float(np.abs(ob).max()) + 1e-9
        mb = err.max(axis=-1) > 3e-2 * scale
        idx = np.nonzero(mb)[0]
        note("n_bad_points", int(idx.size))
        if idx.size:
            # per bad point: level(s) bad and the sorted position of its
            # entry at that level
            lvl_bad = (err[idx].reshape(idx.size, -1, 2).max(-1)
                       > 3e-2 * scale)
            recs = []
            for i, p in enumerate(idx[:256]):
                ch = int(p % geo.n_ch)
                ipos = int(p // geo.n_ch)
                for l in np.nonzero(lvl_bad[i])[0]:
                    r = ch * lb + int(l)
                    spos = np.nonzero(
                        (sp1_np[r] >> 14 & ((1 << 17) - 1)) == ipos)[0]
                    recs.append({"pt": int(p), "ch": ch, "ipos": ipos,
                                 "lvl": int(l),
                                 "sorted_pos": int(spos[0]) if spos.size
                                 else -1,
                                 "key": int(skey_np[r][spos[0]])
                                 if spos.size else -1})
            spos_all = np.asarray([r["sorted_pos"] for r in recs])
            note("fetch_bad", {
                "recs": recs[:24],
                "sorted_pos_min": int(spos_all.min()),
                "sorted_pos_max": int(spos_all.max()),
                "n_unique_sorted_pos": int(np.unique(spos_all).size),
                "block_ids": np.unique(
                    spos_all // geo.block).tolist()[:20],
                "g_ids": np.unique(
                    spos_all // (geo.block * (geo.nblk // geo.n_g))
                ).tolist()[:20]})

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
