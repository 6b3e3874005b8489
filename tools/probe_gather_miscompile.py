"""Minimal repro for the TPU XLA gather tail corruption that produced
the phantom "2^19 lattice defect" (round 4; GATHER_miscompile.json).

jnp.take_along_axis on a [14, 2^20] f32 operand with [14, N] int32
indices: at N = 2^19 the LAST ~128 outputs of the LAST row come back
as a broadcast of one gathered element (numpy mismatch ~1e-4 at 1e-4
data scale); smaller N and smaller row counts are clean.  Sweeps the
shape grid to find the trigger envelope.

Run: cd /root/repo && nohup python -u tools/probe_gather_miscompile.py \
       > /tmp/gmc.log 2>&1 &
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

    out_json = {}

    def note(k, v):
        out_json[k] = v
        print(k, json.dumps(v), flush=True)
        with open("GATHER_miscompile.json", "w") as f:
            json.dump(out_json, f, indent=1)

    rng = np.random.default_rng(0)

    @jax.jit
    def take(flat, idx):
        return jnp.take_along_axis(flat, idx, axis=1)

    for rows in (14, 8, 14, 4):
        for logn in (17, 18, 19, 20):
            n = 1 << logn
            flat_np = rng.normal(size=(rows, 1 << 20)).astype(np.float32)
            idx_np = rng.integers(0, 1 << 20, size=(rows, n),
                                  dtype=np.int32)
            got = np.asarray(take(jnp.asarray(flat_np),
                                  jnp.asarray(idx_np)))
            want = np.take_along_axis(flat_np, idx_np, axis=1)
            bad = got != want
            nb = int(bad.sum())
            rec = {"n_bad": nb}
            if nb:
                rr, cc = np.nonzero(bad)
                rec.update({"bad_rows": np.unique(rr).tolist()[:8],
                            "col_min": int(cc.min()),
                            "col_max": int(cc.max())})
            note(f"rows{rows}_n{n}", rec)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
