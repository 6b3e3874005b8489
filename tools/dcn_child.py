"""One process of the two-process DCN dryrun (VERDICT r2 item 9).

Each process owns 4 virtual CPU devices; jax.distributed stitches them
into one 8-device mesh spanning two processes — the same topology as two
TPU hosts over DCN.  The step is a data-parallel value_and_grad with the
batch sharded globally: XLA inserts the cross-process gradient reduction
(the DCN psum) on its own, exactly like the single-host path.

Usage: python tools/dcn_child.py <port> <process_id>
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from flnerf_tpu.parallel.mesh import (  # noqa: E402
    DATA_AXIS, init_distributed, make_mesh, replicated,
)

assert init_distributed(f"localhost:{port}", num_processes=2,
                        process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = make_mesh()
data_sh = NamedSharding(mesh, P(DATA_AXIS))
rep = replicated(mesh)

# tiny data-parallel regression step: params replicated, batch sharded
# across BOTH processes; the grad all-reduce crosses the process boundary
rng = np.random.default_rng(0)          # same params on both processes
w = jax.device_put(rng.standard_normal((8, 4)).astype(np.float32), rep)
n_global, n_local = 64, 32
x_all = np.linspace(-1, 1, n_global * 8, dtype=np.float32).reshape(-1, 8)
y_all = np.sum(x_all, -1, keepdims=True) * np.ones((1, 4), np.float32)
lo = pid * n_local
x = jax.make_array_from_process_local_data(
    data_sh, x_all[lo:lo + n_local], (n_global, 8))
y = jax.make_array_from_process_local_data(
    data_sh, y_all[lo:lo + n_local], (n_global, 4))


@jax.jit
def step(w, x, y):
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)

    l, g = jax.value_and_grad(loss)(w)
    return l, w - 0.1 * g


l0 = None
for _ in range(3):
    l, w = step(w, x, y)
    if l0 is None:
        l0 = float(l)
l1 = float(l)
assert l1 < l0, (l0, l1)
print(f"DCN_OK pid={pid} loss {l0:.5f}->{l1:.5f}", flush=True)
