"""NGP trainer throughput vs batch_rays at 2^19 on real TPU.

The 4096-ray step pays batch-independent costs (table Adam update,
occupancy bookkeeping, dispatch); a bigger ray batch amortizes them.
Measures rays/s at 4096 / 8192 / 16384 to pick the bench shape for the
>=100k push (VERDICT r3 #4).

Run: nohup python -u tools/profile_ngp_batch.py > /tmp/ngp_batch.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flnerf_tpu.core.compile_cache import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402

import bench  # noqa: E402


def run(batch_rays, reps=3, n_steps=32):
    t, sampler, tcfg = bench._ngp_trainer(log2=19, batch_rays=batch_rays)
    t.fit(sampler, verbose=False)  # compile + warm
    t.cfg = tcfg._replace(max_steps=96)
    t0 = time.time()
    for _ in range(reps):
        t.fit(sampler, verbose=False, n_steps=n_steps)
    jax.block_until_ready(t.state.params["sigma_net"])
    dt = time.time() - t0
    rps = reps * n_steps * batch_rays / dt
    print(f"batch={batch_rays}: {rps:,.0f} rays/s "
          f"({dt / (reps * n_steps) * 1e3:.1f} ms/step)", flush=True)
    return rps


if __name__ == "__main__":
    for b in (4096, 8192, 16384):
        run(b)
