"""flnerf_tpu — TPU-native Fast-Learning-NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wen-yuan-zhang/Fast-Learning-NeRF (TIP-2023 "Fast Learning Radiance Fields by
Shooting Much Fewer Rays"): per-training-view quadtree ray budgeting grafted
onto four radiance-field backends (vanilla NeRF, NeRF++, Plenoxels-style
sparse voxel grids, Instant-NGP hash grids).

Design principles (TPU-first, not a port):
  * All hot compute lives under ``jax.jit`` with static shapes; irregular
    per-epoch ray sets are padded/masked rather than dynamically compacted.
  * The quadtree lives on the host as flat numpy arrays (vectorized allocate
    and subdivide); per-leaf loss statistics are aggregated **on device** with
    ``segment_max`` instead of the reference's per-iteration GPU→CPU copies
    (reference: nerf-ours/run_nerf.py:505-506).
  * Data parallelism is a ``jax.sharding.Mesh`` over the ray batch axis with
    gradients reduced by XLA collectives — replacing the reference's
    nn.DataParallel / dormant DDP (reference: nerf-ours/run_nerf.py:82,90).
  * bfloat16 matmuls with float32 parameters/accumulation replace AMP.
"""

__version__ = "0.1.0"
