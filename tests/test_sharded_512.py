"""512^3 spatially-sharded grid correctness (VERDICT r4 #5): the
reference trains 256^3 -> 512^3 (plenoxels-ours/opt/opt.py:104-151);
beyond-one-chip grids here ride the spatially-sharded XLA render path
(grid split on X over the mesh, rays replicated, XLA inserting the halo
collectives for cross-shard trilinear reads — __graft_entry__.py
sharded-grid segment).  This is the correctness check behind that
dryrun: at the REAL 512^3 shape on the 8-device CPU mesh, the sharded
render must match the single-device render exactly.

basis_dim=1 keeps the grid at ~2.7 GB (sh 27-ch would be 14.5 GB x2
arms on the host); the sharding math is channel-count independent.
The real-TPU smoke at this scale lives in tools/smoke_512.py
(PLENOXELS_512_smoke.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flnerf_tpu.models.voxel_sh import (
    VoxelGrid,
    VoxelGridConfig,
    voxel_render_rays,
)


@pytest.mark.slow
def test_sharded_grid_512_matches_single_device():
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    reso = (512, 512, 512)
    gcfg = VoxelGridConfig(reso=reso, basis_dim=1, max_steps=48,
                           step_size=8.0, init_sigma=0.05)

    # content that actually straddles shard boundaries: a density ridge
    # along X plus an X-linear SH DC ramp, so a halo-exchange bug would
    # shift colors/opacity rather than vanish into a constant field
    x = np.arange(reso[0], dtype=np.float32)
    ridge = 0.05 + 0.4 * np.exp(-((x - 255.5) / 64.0) ** 2)
    density = np.broadcast_to(ridge[:, None, None], reso)
    ramp = (0.1 + 0.8 * x / reso[0]).astype(np.float32)
    sh = np.zeros(reso + (3,), np.float32)
    sh[..., 0] = ramp[:, None, None]
    sh[..., 1] = 0.3
    sh[..., 2] = 1.0 - ramp[:, None, None]

    n_rays = 24
    rng = np.random.default_rng(0)
    ro = np.zeros((n_rays, 3), np.float32)
    ro[:, 2] = 3.0
    rd = rng.uniform(-0.3, 0.3, (n_rays, 3)).astype(np.float32)
    rd[:, 2] = -1.0
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro_j, rd_j = jnp.asarray(ro), jnp.asarray(rd)

    def render(grid):
        return voxel_render_rays(grid, ro_j, rd_j, gcfg)["rgb"]

    dev0 = jax.devices()[0]
    grid_1dev = VoxelGrid(
        density=jax.device_put(density, dev0),
        sh=jax.device_put(sh, dev0),
        alive=jax.device_put(np.ones(reso, bool), dev0),
    )
    ref = np.asarray(jax.jit(render)(grid_1dev))
    del grid_1dev

    mesh = Mesh(np.array(jax.devices()), ("data",))
    gsh = NamedSharding(mesh, P("data"))
    grid_sharded = VoxelGrid(
        density=jax.device_put(density, gsh),
        sh=jax.device_put(sh, gsh),
        alive=jax.device_put(np.ones(reso, bool), gsh),
    )
    out = np.asarray(jax.jit(render)(grid_sharded))

    assert np.isfinite(ref).all()
    assert ref.std() > 1e-3  # the scene isn't degenerate/constant
    np.testing.assert_allclose(out, ref, atol=1e-5)
