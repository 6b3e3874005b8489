"""2^19 lattice defect, stage 3: is it the fetched VALUE or a payload
desync?  Returns the full level-13 sorted triples (key, p0, p1) and the
fetched channel-0 features from inside the real jit; numpy then checks

  (a) the (key, p1) pairing at every sorted position vs ground truth
      (standalone sort already verified exact — does in-context differ?)
  (b) for each bad position: whose oracle value does the fetched
      feature actually match (same point / neighbor / nobody)?

Run: cd /root/repo && nohup python -u tools/probe_519_stage3.py \
       > /tmp/l519d.log 2>&1 &
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

    out_json = {}

    def note(k, v):
        out_json[k] = v
        print(k, json.dumps(v), flush=True)
        with open("LATTICE_519_stage3.json", "w") as f:
            json.dump(out_json, f, indent=1)

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=19, hash_engine="lattice")
    spec = make_ngp_spec(cfg)
    _, table_big = hl.init_lattice_tables(jax.random.PRNGKey(0), spec)
    n = 1 << 19
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    lb = spec.n_big
    geo = hl._geometry(n, spec)

    def encode_debug(x01_flat, table_big):
        spec_ = spec
        x01 = jnp.transpose(
            x01_flat.reshape(geo.m_pad, geo.n_ch, 3), (1, 0, 2))
        key, p0, p1 = hl._base_keys_payloads(x01, spec_)
        skey, sp0, sp1 = bitonic_sort(key, p0, p1)
        b_full, b_slice, b_tail = hl._slab_bases(skey, spec_, geo)
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        cb = geo.nblk // geo.n_g
        skey_pk = hl._pack_cols(skey, geo)
        sp0_pk = hl._pack_cols(sp0, geo)
        sp1_pk = hl._pack_cols(sp1, geo)
        offs32 = jnp.asarray(
            spec_.offs.reshape(-1).astype(np.int64), jnp.int32)
        tpad = hl._pad_table(table_big, spec_).astype(jnp.bfloat16)
        interpret = jax.default_backend() != "tpu"
        smem_o = pl.BlockSpec((lb * 8,), lambda l, ch, g: (0,),
                              memory_space=pltpu.SMEM)
        parts = []
        for off, lbp, dual in hl._level_ranges(spec_):
            if lbp == 0:
                continue
            sub = [(li, 1) for li in range(off, off + lbp)] if dual \
                else [(off, lbp)]
            for soff, slbp in sub:
                smem_b = pl.BlockSpec(
                    (geo.bw,),
                    lambda l, ch, g, soff=soff: (ch * lb + l + soff,),
                    memory_space=pltpu.SMEM)
                tile = pl.BlockSpec(
                    (1, 1, geo.block, cb),
                    lambda l, ch, g, soff=soff:
                    (ch * lb + l + soff, g, 0, 0),
                    memory_space=pltpu.VMEM)
                out_tile = pl.BlockSpec(
                    (1, 1, geo.block, cb),
                    lambda l, ch, g, slbp=slbp: (ch * slbp + l, g, 0, 0),
                    memory_space=pltpu.VMEM)
                out_shape = jax.ShapeDtypeStruct(
                    (geo.n_ch * slbp, geo.n_g, geo.block, cb), jnp.float32)
                f0, f1 = pl.pallas_call(
                    functools.partial(
                        hl._fetch_kernel,
                        r_max=geo.r_dense[soff] if dual else geo.r_hash,
                        off=soff, dual=dual, cb=cb),
                    grid=(slbp, geo.n_ch, geo.n_g),
                    in_specs=[
                        smem_o, smem_b, smem_b, smem_b, tile, tile, tile,
                        pl.BlockSpec((1, spec_.t_r64 + spec_.r_pad,
                                      hl.LANES),
                                     lambda l, ch, g, soff=soff:
                                     (l + soff, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=(out_tile, out_tile),
                    out_shape=(out_shape, out_shape),
                    interpret=interpret,
                )(offs32, b_full, b_slice, b_tail, skey_pk, sp0_pk,
                  sp1_pk, tpad)
                parts.append((hl._unpack_cols(f0), hl._unpack_cols(f1)))
        cat = lambda i: jnp.concatenate(
            [p[i].reshape(geo.n_ch, -1, geo.m_pad) for p in parts], axis=1
        ).reshape(geo.n_ch * lb, geo.m_pad)
        f0s = cat(0)
        take13 = lambda a: jnp.stack(
            [a[ch * lb + lb - 1] for ch in range(geo.n_ch)])
        return (take13(skey), take13(sp0), take13(sp1), take13(f0s))

    sk, s0, s1, f0 = jax.jit(encode_debug)(x, table_big)
    sk, s0, s1, f0 = map(np.asarray, (sk, s0, s1, f0))

    # ground truth triples for level 13 per chunk
    x01 = np.transpose(np.asarray(x).reshape(geo.m_pad, geo.n_ch, 3),
                       (1, 0, 2))
    import jax.numpy as jnp2
    key_t, p0_t, p1_t = map(np.asarray, hl._base_keys_payloads(
        jnp2.asarray(x01), spec))
    key13 = key_t.reshape(geo.n_ch, lb, geo.m_pad)[:, lb - 1]
    p0_13 = p0_t.reshape(geo.n_ch, lb, geo.m_pad)[:, lb - 1]
    p1_13 = p1_t.reshape(geo.n_ch, lb, geo.m_pad)[:, lb - 1]

    ob = np.asarray(hl.lattice_encode_xla(x, table_big, spec), np.float32)
    ora13 = ob[:, (lb - 1) * 2].reshape(geo.m_pad, geo.n_ch)
    scale = float(np.abs(ob).max()) + 1e-9

    for ch in range(geo.n_ch):
        # sortedness + pairing exactness at each position
        sorted_ok = bool(np.all(np.diff(sk[ch]) >= 0))
        # pos -> (key, p0) from ground truth
        pos = (s1[ch] >> 14) & ((1 << 17) - 1)
        pair_key_ok = sk[ch] == key13[ch][pos]
        pair_p0_ok = s0[ch] == p0_13[ch][pos]
        pair_p1_ok = s1[ch] == p1_13[ch][pos]
        want = ora13[pos, ch]
        bad = np.abs(f0[ch] - want) > 3e-2 * scale
        bidx = np.nonzero(bad)[0]
        recs = []
        for e in bidx[:8]:
            v = float(f0[ch][e])
            # whose value is it? nearest oracle match at this level
            d = np.abs(ora13[:, ch] - v)
            j = int(np.argmin(d))
            recs.append({
                "spos": int(e), "ipos": int(pos[e]),
                "key_ok": bool(pair_key_ok[e]),
                "p0_ok": bool(pair_p0_ok[e]), "p1_ok": bool(pair_p1_ok[e]),
                "got": v, "want": float(want[e]),
                "nearest_ipos": j, "nearest_err": float(d[j]),
                "neighbor_vals": [float(f0[ch][max(e - 1, 0)]),
                                  float(f0[ch][min(e + 1,
                                                   geo.m_pad - 1)])],
            })
        note(f"ch{ch}", {
            "sorted_ok": sorted_ok,
            "n_pair_key_bad": int((~pair_key_ok).sum()),
            "n_pair_p0_bad": int((~pair_p0_ok).sum()),
            "n_pair_p1_bad": int((~pair_p1_ok).sum()),
            "n_val_bad": int(bad.sum()),
            "bad": recs})
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
