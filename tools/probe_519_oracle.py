"""2^19 defect, final arbiter: is lattice_encode_xla (the oracle)
itself corrupted at n=2^19 on TPU?

probe_519_stage3.py showed every "bad" entry's ORACLE value is the
same constant (-7.65e-5) across chunks — 128 different points can't
share one trilerp.  Hypothesis: the [14, 2^20] x [14, 2^19] XLA gather
miscompiles its output tail on TPU (last 128 columns of the last row
broadcast one element).  Arbiter: a pure-NUMPY oracle + a small-batch
TPU oracle on the same points.

Run: cd /root/repo && nohup python -u tools/probe_519_oracle.py \
       > /tmp/l519e.log 2>&1 &
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def numpy_oracle(x, table_big, spec):
    import numpy as np
    big = spec.split.big
    n = x.shape[0]
    lb = spec.n_big
    LANES, PACK = 128, 64
    scales = np.asarray(big.scales)[:, None, None]
    pos = x[None].astype(np.float64) * scales + 0.5
    cell = np.floor(pos)
    frac = (pos - cell).astype(np.float32)
    cu = cell.astype(np.int64)
    mult = np.asarray(spec.mult.astype(np.int64))[:, :, None]
    sizes = np.asarray(big.sizes.astype(np.int64))[:, None]
    strides = np.asarray(big.resolutions.astype(np.int64) + 1)[:, None]
    use_hash = np.asarray(big.use_hash)[:, None]
    base_h = ((cu[..., 0] * mult[:, 0] + cu[..., 1] * mult[:, 1]
               + cu[..., 2] * mult[:, 2]) & 0xFFFFFFFF)
    base_d = cu[..., 0] + strides * (cu[..., 1] + strides * cu[..., 2])
    flat = np.asarray(table_big).reshape(lb, -1)
    offs = np.asarray(spec.offs.astype(np.int64))
    out = np.zeros((lb, n, 2), np.float32)
    for c in range(8):
        b = [(c >> k) & 1 for k in range(3)]
        w = np.prod(np.where(np.asarray(b, bool), frac, 1.0 - frac),
                    axis=-1)
        a_h = ((base_h + offs[:, c:c + 1]) & 0xFFFFFFFF) % sizes
        a_d = base_d + offs[:, c:c + 1]
        a = np.where(use_hash, a_h, a_d).astype(np.int64)
        pf = (a >> 6) * LANES + 2 * (a & (PACK - 1))
        out[..., 0] += w * np.take_along_axis(flat, pf, axis=1)
        out[..., 1] += w * np.take_along_axis(flat, pf + 1, axis=1)
    return np.transpose(out, (1, 0, 2)).reshape(n, lb * 2)


def main():
    from flnerf_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import numpy as np

    import flnerf_tpu.ops.hash_lattice as hl
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_spec

    out_json = {}

    def note(k, v):
        out_json[k] = v
        print(k, json.dumps(v), flush=True)
        with open("LATTICE_519_oracle.json", "w") as f:
            json.dump(out_json, f, indent=1)

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=19, hash_engine="lattice")
    spec = make_ngp_spec(cfg)
    _, table_big = hl.init_lattice_tables(jax.random.PRNGKey(0), spec)
    n = 1 << 19
    x = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    x_np = np.asarray(x, np.float32)

    # full-shape TPU oracle (the suspect)
    ob = np.asarray(hl.lattice_encode_xla(x, table_big, spec), np.float32)
    # small-batch TPU oracle on the suspect tail points
    ob_tail = np.asarray(
        hl.lattice_encode_xla(x[-256:], table_big, spec), np.float32)
    # numpy ground truth on the tail
    nt = numpy_oracle(x_np[-256:], table_big, spec)

    d_full_vs_np = np.abs(ob[-256:] - nt).max()
    d_small_vs_np = np.abs(ob_tail - nt).max()
    d_full_vs_small = np.abs(ob[-256:] - ob_tail).max()
    note("oracle_tail", {
        "full_vs_numpy_max_err": float(d_full_vs_np),
        "smallbatch_vs_numpy_max_err": float(d_small_vs_np),
        "full_vs_smallbatch_max_err": float(d_full_vs_small)})

    # engine on the full 2^19 call, tail points vs numpy truth
    kb = np.asarray(jax.jit(
        lambda x: hl.lattice_encode(x, table_big, spec))(x), np.float32)
    d_engine_vs_np = np.abs(kb[-256:] - nt).max()
    note("engine_tail_vs_numpy_max_err", float(d_engine_vs_np))

    # full-array numpy comparison for the engine (exonerate everywhere)
    nt_full = numpy_oracle(x_np, table_big, spec)
    note("engine_full_vs_numpy", {
        "max_err": float(np.abs(kb - nt_full).max()),
        "n_bad_3pct": int((np.abs(kb - nt_full).max(-1)
                           > 3e-2 * (np.abs(nt_full).max() + 1e-9)).sum())})
    note("xla_oracle_full_vs_numpy", {
        "max_err": float(np.abs(ob - nt_full).max()),
        "n_bad_3pct": int((np.abs(ob - nt_full).max(-1)
                           > 3e-2 * (np.abs(nt_full).max() + 1e-9)).sum())})
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
