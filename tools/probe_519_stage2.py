"""Pin the 2^19 lattice defect to fetch / unsort / undeal.

probe_519_stage.py proved both bitonic sorts are exact and the bad
points are the top-32 iota per chunk at level 13 — i.e. the TAIL of
each chunk's level-13 slice in the pre-undeal [n_ch, lb, m_pad, 2]
array.  This probe reruns the encode returning intermediates:

  f0s/f1s  (post-fetch, sorted order, level-13 rows only)
  feats    (post-unsort, position order, level-13 rows only)
  out      (final, post-undeal)

and checks each against the XLA oracle.  fetch bad -> kernel; fetch
clean + feats bad -> unsort payload path; feats clean + out bad ->
the undeal transpose (XLA).

Run: cd /root/repo && nohup python -u tools/probe_519_stage2.py \
       > /tmp/l519c.log 2>&1 &
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
        with open("LATTICE_519_stage2.json", "w") as f:
            json.dump(out_json, f, indent=1)

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=19, hash_engine="lattice")
    spec = make_ngp_spec(cfg)
    _, table_big = hl.init_lattice_tables(jax.random.PRNGKey(0), spec)
    n = 1 << 19
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    lb = spec.n_big

    # re-implement _fwd_impl verbatim but return intermediates
    def encode_debug(x01_flat, table_big):
        spec_ = spec
        geo = hl._geometry(x01_flat.shape[0], spec_)
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
                    lambda l, ch, g, soff=soff: (ch * lb + l + soff, g, 0, 0),
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
        ).reshape(geo.n_ch * lb, geo.m_pad) if len(parts) > 1 \
            else parts[0][i]
        f0s, f1s = cat(0), cat(1)
        bits = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        flt = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        pos = jax.lax.shift_right_logical(sp1, 14)
        iota = jnp.broadcast_to(
            jnp.arange(geo.m_pad, dtype=jnp.int32)[None], pos.shape)
        _, f0o, f1o, inv = bitonic_sort(pos, bits(f0s), bits(f1s), iota)
        feats = jnp.stack([flt(f0o), flt(f1o)], axis=-1)
        out = jnp.transpose(
            feats.reshape(geo.n_ch, lb, geo.m_pad, 2), (2, 0, 1, 3)
        ).reshape(geo.m_pad * geo.n_ch, lb * 2)[:x01_flat.shape[0]]
        # level-13 rows only (rows l == lb-1 per chunk) to bound output
        l13 = jnp.stack([f0s[ch * lb + lb - 1] for ch in range(geo.n_ch)])
        l13u = jnp.stack(
            [feats[ch * lb + lb - 1] for ch in range(geo.n_ch)])
        sp1_13 = jnp.stack(
            [sp1[ch * lb + lb - 1] for ch in range(geo.n_ch)])
        return out, l13, l13u, sp1_13

    out, l13_sorted, l13_unsorted, sp1_13 = jax.jit(encode_debug)(
        x, table_big)
    out_np = np.asarray(out)
    l13s_np = np.asarray(l13_sorted)        # [4, m] ch0 of level13, sorted
    l13u_np = np.asarray(l13_unsorted)      # [4, m, 2] position order
    sp1_np = np.asarray(sp1_13)

    ob = np.asarray(hl.lattice_encode_xla(x, table_big, spec), np.float32)
    scale = float(np.abs(ob).max()) + 1e-9
    geo = hl._geometry(n, spec)

    # final out check
    err = np.abs(out_np - ob)
    mb = err.max(axis=-1) > 3e-2 * scale
    note("final_out_n_bad", int(mb.sum()))

    # oracle level-13 channel-0 per (ch, position): point p = m*n_ch + c
    ora_l13 = ob[:, (lb - 1) * 2:(lb - 1) * 2 + 2].reshape(
        geo.m_pad, geo.n_ch, 2)
    for ch in range(geo.n_ch):
        pos_ch = (sp1_np[ch] >> 14) & ((1 << 17) - 1)
        want_sorted = ora_l13[pos_ch, ch, 0]
        bad_s = np.abs(l13s_np[ch] - want_sorted) > 3e-2 * scale
        bad_u = (np.abs(l13u_np[ch] - ora_l13[:, ch, :]).max(-1)
                 > 3e-2 * scale)
        note(f"ch{ch}", {
            "fetch_sorted_n_bad": int(bad_s.sum()),
            "fetch_sorted_bad_pos": np.nonzero(bad_s)[0][:8].tolist(),
            "unsorted_n_bad": int(bad_u.sum()),
            "unsorted_bad_pos_min": int(np.nonzero(bad_u)[0].min())
            if bad_u.any() else -1,
            "unsorted_bad_pos_max": int(np.nonzero(bad_u)[0].max())
            if bad_u.any() else -1,
        })
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
