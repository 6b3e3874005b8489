"""Benchmark harness — one JSON line per backend metric, on real TPU.

Each line: {"metric", "value", "unit", "vs_baseline"}.

Metrics and baselines (see BASELINE.md):
  1. nerf_lego_train_rays_per_sec_per_chip — quadtree-NeRF full optimizer
     steps at the reference lego config (N_rand=1920, 64+128 samples,
     D=8 W=256 x2).  Baseline: nerf-pytorch ~7.1k rays/s on a 2080 Ti
     (lego 100K iters ≈ 4h, nerf-ours/README.md:49).
  2. plenoxels_train_rays_per_sec_per_chip — fused Pallas voxel render
     (ops/voxel_pallas.py) full value_and_grad steps, 128^3 grid,
     512-step marching, dense (no occupancy skipping — worst case).
     Baseline: this repo's pure-XLA gather path measured on this chip
     (1,339 rays/s at the identical config) — the honest "without the
     kernel" comparison; the reference's CUDA kernel has no published
     rays/s.
  3. ngp_train_rays_per_sec_per_chip — hash-NGP trainer chunks (4096
     rays/step, occupancy marching, bf16, steady-state partial grid
     refreshes).  Baseline: torch-ngp -O lego 97 it/s x 4096 rays ≈ 397k
     rays/s on a V100 (ngp-ours/readme.md:211).
  4. nerfpp_truck_train_rays_per_sec_per_chip — NeRF++ cascade (fg +
     inverted-sphere bg) optimizer steps at the truck batch size.
     Baseline: the reference's own cost note (45 s per 100 iters at batch
     2880 on 3 GPUs, ddp_train_nerf.py:202) ≈ 2133 rays/s per GPU.
  5. ngp_hash19_fwd_bwd_16kpts_ms — the sorted-block gather engine at
     torch-ngp's 2^19 capacity (gridencoder grid.py:91), fwd+bwd at 16k
     points.  Baseline: the full-matmul path's cost extrapolated to 2^19
     (linear in table rows; measured 11.1 ms at 2^15).
  6. plenoxels_synth_time_to_psnr20_s — wall-clock until train PSNR 20 on
     the synthetic multi-view scene via the public trainer API (the
     paper's wall-clock-to-quality metric, first-class per SURVEY §5.1).
     Baseline: the same run costed at the XLA path's measured per-ray
     throughput (rays_used / 1339 s).
"""

import json
import time

import numpy as np


def emit(metric, value, unit, vs_baseline):
    print(json.dumps({
        "metric": metric, "value": round(float(value), 1), "unit": unit,
        "vs_baseline": round(float(vs_baseline), 2),
    }), flush=True)


def bench_nerf():
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.nerf_mlp import make_nerf_field
    from flnerf_tpu.rays.quadtree import RayEpoch
    from flnerf_tpu.render.renderer import RenderConfig
    from flnerf_tpu.train.trainer import NerfTrainer, TrainConfig

    init_fn, query_fn = make_nerf_field(
        multires=10, multires_views=4, netdepth=8, netwidth=256,
        compute_dtype=jnp.bfloat16,
    )
    rc = RenderConfig(n_samples=64, n_importance=128, near=2.0, far=6.0,
                      white_bkgd=True)
    tc = TrainConfig(n_rand=1920, steps_per_chunk=16, precrop_iters=0)
    trainer = NerfTrainer(query_fn, init_fn, rc, tc)

    n_rays = tc.n_rand * tc.steps_per_chunk
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
    dirs[:, 2] -= 2.0
    epoch = RayEpoch(
        origins=np.tile(np.array([[0, 0, 3.5]], np.float32), (n_rays, 1)),
        dirs=dirs,
        rgb=rng.random((n_rays, 3)).astype(np.float32),
        leaf_id=rng.integers(0, 256, n_rays).astype(np.int32),
        n_leaves=256,
    )
    trainer.run_epoch_rays(epoch, jax.random.PRNGKey(0))  # compile
    n_timed = 4
    t0 = time.perf_counter()
    for i in range(n_timed):
        trainer.run_epoch_rays(epoch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(trainer.state.params_coarse)
    dt = time.perf_counter() - t0
    rps = n_timed * n_rays / dt / max(len(jax.devices()), 1)
    emit("nerf_lego_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 7111.0)


def bench_plenoxels_kernel():
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.voxel_sh import VoxelGrid, VoxelGridConfig
    from flnerf_tpu.ops import voxel_pallas as vp

    rng = np.random.default_rng(0)
    reso, n_rays = 128, 4096
    cfg = VoxelGridConfig(reso=(reso,) * 3, max_steps=512, step_size=0.5)
    grid = VoxelGrid(
        density=jnp.asarray(rng.random((reso,) * 3), jnp.float32) * 2.0,
        sh=jnp.asarray(rng.standard_normal((reso,) * 3 + (27,)) * 0.3,
                       jnp.float32),
        alive=jnp.asarray(rng.random((reso,) * 3) > 0.1),
    )
    # coherent 64-ray bundles (the trainer's morton blocks)
    o = np.zeros((n_rays, 3), np.float32)
    d = np.zeros((n_rays, 3), np.float32)
    for b in range(n_rays // 64):
        base = rng.standard_normal(3).astype(np.float32)
        base[2] = abs(base[2]) + 2.0
        o[b * 64:(b + 1) * 64] = [0, 0, -2.5]
        dd = np.tile(base, (64, 1))
        dd[:, :2] += rng.standard_normal((64, 2)).astype(np.float32) * 0.01
        d[b * 64:(b + 1) * 64] = dd / np.linalg.norm(dd, -1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    gt = jnp.asarray(rng.random((n_rays, 3)), jnp.float32)

    @jax.jit
    def step(dens, sh):
        def loss(dn, s):
            g = VoxelGrid(dn, s, grid.alive)
            out = vp.voxel_render_rays_fast(g, o_j, d_j, cfg)
            return jnp.mean((out["rgb"] - gt) ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(dens, sh)

    jax.block_until_ready(step(grid.density, grid.sh))  # compile
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step(grid.density, grid.sh)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    import jax as _jax
    rps = n_rays / dt / max(len(_jax.devices()), 1)
    emit("plenoxels_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 1339.0)


def bench_ngp():
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=8, n_test=1, H=64, W=64)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]

    cfg = NGPConfig(bound=1.5)
    init_fn, density_fn, rgb_fn = make_ngp_field(cfg, jnp.bfloat16)
    # n_keep=16 ~ torch-ngp's converged mean_count (~13-16 field evals/ray
    # on lego after occupancy-grid warmup); the static keep budget is our
    # compaction analog (render/ngp.py).  Measured on the synthetic scene:
    # K=16 reaches HIGHER psnr than K=32 at equal steps (26.2 vs 24.2 dB
    # at 240 steps) while running 1.4x faster — occupied-space samples
    # dominate the kept set once the grid converges.
    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5)
    # full_refreshes=2: the warmup's 3 grid updates compile BOTH refresh
    # variants (2 full sweeps + 1 partial), the timed section then runs
    # steady-state partial refreshes only (a full 128^3 sweep is ~1.1s of
    # field evals — real 30k-step runs amortize their 16 full sweeps to
    # nothing, so steady state is the honest regime)
    tcfg = NGPTrainConfig(max_steps=48, batch_rays=4096, steps_per_chunk=16,
                          full_refreshes=2)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    sampler = NGPSampler(images[tr], poses[tr], K, tcfg)
    t.fit(sampler, verbose=False)  # 48 steps incl. compile

    tcfg2 = tcfg._replace(max_steps=96)
    t.cfg = tcfg2
    t0 = time.perf_counter()
    t.fit(sampler, verbose=False)
    jax.block_until_ready(t.state.params["table"])
    dt = time.perf_counter() - t0
    rps = 96 * 4096 / dt / max(len(jax.devices()), 1)
    emit("ngp_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 397312.0)


def bench_nerfpp():
    """NeRF++ cascade (fg + inverted-sphere bg, 64+64 samples, D8 W256 x2
    levels) full optimizer steps at the reference truck batch size.
    Baseline: the reference's own training-cost note — batch 2880 across
    3 GPUs at 45 s per 100 iters (nerf++-ours/ddp_train_nerf.py:202)
    = 2880 * 100 / 45 / 3 ~ 2133 rays/s per GPU."""
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.nerfpp import NerfPPConfig
    from flnerf_tpu.rays.quadtree import RayEpoch
    from flnerf_tpu.train.nerfpp_trainer import (
        NerfPPTrainConfig, NerfPPTrainer,
    )

    mcfg = NerfPPConfig()
    tcfg = NerfPPTrainConfig(batch_size=2880, steps_per_chunk=8,
                             prob_sampling=False)
    trainer = NerfPPTrainer(mcfg, tcfg)

    n_rays = tcfg.batch_size * tcfg.steps_per_chunk
    rng = np.random.default_rng(0)
    # camera outside the unit sphere looking in (fg+bg both exercised)
    o = np.tile(np.array([[0.0, 0.5, 3.0]], np.float32), (n_rays, 1))
    d = rng.standard_normal((n_rays, 3)).astype(np.float32) * 0.15
    d[:, 2] -= 1.0
    epoch = RayEpoch(
        origins=o, dirs=d / np.linalg.norm(d, axis=-1, keepdims=True),
        rgb=rng.random((n_rays, 3)).astype(np.float32),
        leaf_id=rng.integers(0, 128, n_rays).astype(np.int32),
        n_leaves=128,
    )
    trainer.run_epoch_rays(epoch, jax.random.PRNGKey(0))  # compile
    n_timed = 3
    t0 = time.perf_counter()
    for i in range(n_timed):
        trainer.run_epoch_rays(epoch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(trainer.state.params[0])
    dt = time.perf_counter() - t0
    rps = n_timed * n_rays / dt / max(len(jax.devices()), 1)
    emit("nerfpp_truck_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 2133.0)


def bench_hash_capacity():
    """Sorted-block gather engine at torch-ngp's 2^19 capacity vs the
    full-matmul path at the same capacity (both fwd+bwd at 16k points,
    measured in one jitted scan chain — per-call dispatch through the
    tunnel is ~2.5 ms and block_until_ready does not reliably block, so
    the slope of two rep counts with a float() sync is the honest timer).
    Baseline = the matmul path at 2^15 scaled by its measured linear
    capacity factor (16x rows on the 13 capped levels)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from flnerf_tpu.ops.hash_sorted import (
        hash_encode_split, init_split_table, make_split_spec,
    )

    spec = make_split_spec(num_levels=16, level_dim=2, base_resolution=16,
                           log2_hashmap_size=19, desired_resolution=2048)
    tables = init_split_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (16384, 3))

    def mk(reps):
        @jax.jit
        def f(tables):
            def loss(tb):
                return jnp.sum(hash_encode_split(x, tb, spec) ** 2)

            def body(c, _):
                g = jax.grad(loss)(c)
                return jax.tree_util.tree_map(
                    lambda a, b: a + 1e-9 * b, c, g), ()

            c, _ = jax.lax.scan(body, tables, None, length=reps)
            return c
        return f

    r1, r2 = mk(4), mk(24)
    sync = lambda o: float(o[1].ravel()[0])
    sync(r1(tables)); sync(r2(tables))
    ts = []
    for r in (r1, r2, r1, r2):
        t0 = _t.perf_counter(); sync(r(tables)); ts.append(_t.perf_counter() - t0)
    ms = (min(ts[1], ts[3]) - min(ts[0], ts[2])) / 20 * 1e3
    # matmul path at 2^19 = measured 11.1 ms at 2^15 with 13 of 16 levels
    # capped -> ~11.1 * (3 + 13 * 16) / 16 ~ 146 ms (linear in table rows)
    emit("ngp_hash19_fwd_bwd_16kpts_ms", ms, "ms", 146.0 / ms)


def bench_time_to_psnr():
    from flnerf_tpu.core.benchmark import BenchRecorder
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.voxel_sh import VoxelGridConfig
    from flnerf_tpu.rays.camera import get_rays_np, intrinsics_matrix
    from flnerf_tpu.rays.quadtree import RayBudgeter
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsTrainConfig, PlenoxelsTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=8, n_test=1, H=64, W=64)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]
    o = np.stack([get_rays_np(H, W, K, p[:3, :4])[0] for p in poses[tr]], 0)
    d = np.stack([get_rays_np(H, W, K, p[:3, :4])[1] for p in poses[tr]], 0)
    budgeter = RayBudgeter(images[tr], o, d, init_level=2, seed=0)

    gcfg = VoxelGridConfig(
        reso=(96, 96, 96), radius=(1.2,) * 3, max_steps=256, step_size=0.7,
        init_sigma=0.1,
    )
    tcfg = PlenoxelsTrainConfig(
        n_epoch=6, batch_size=4096, steps_per_chunk=8,
        lr_sigma=1e1, lr_sh=1e-2, lr_sigma_delay_steps=0,
        subdivide_every=1, subdivide_thres=0.05, use_kernel=True,
    )
    trainer = PlenoxelsTrainer(gcfg, tcfg)

    # Warm the jit caches on one epoch's shapes, then reset the train state:
    # the metric is steady-state wall-clock-to-quality (compile is one-time
    # and amortizes across real runs; the cold-start cost is recorded in
    # the artifact's meta).
    import jax
    import jax.numpy as jnp

    tc0 = time.time()
    warm = budgeter.gen_rays(down_scale=1)
    trainer.run_epoch_rays(warm)
    compile_s = time.time() - tc0
    from flnerf_tpu.models.voxel_sh import init_voxel_grid
    from flnerf_tpu.train.plenoxels_trainer import PlenoxelsState
    g0 = init_voxel_grid(gcfg)
    trainer.state = jax.device_put(
        PlenoxelsState(g0, jnp.zeros_like(g0.density),
                       jnp.zeros_like(g0.sh), jnp.int32(0)))
    budgeter = RayBudgeter(images[tr], o, d, init_level=2, seed=0)

    rec = BenchRecorder(meta={"scene": "synthetic", "backend": "plenoxels",
                              "cold_start_compile_s": round(compile_s, 1)})
    total_rays = [0]

    t0 = time.time()
    for epoch_id in range(1, tcfg.n_epoch + 1):
        last = epoch_id == tcfg.n_epoch
        ep = budgeter.gen_rays(down_scale=1, last_epoch=last)
        total_rays[0] += ep.origins.shape[0]
        stat, mse = trainer.run_epoch_rays(ep)
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        rec.record(psnr=psnr, epoch=epoch_id, wall_s=time.time() - t0,
                   rays=ep.origins.shape[0])
        if epoch_id < tcfg.n_epoch - 1:
            budgeter.adjust(stat, tcfg.subdivide_thres)
        if psnr >= 20.0:
            break
    tt = rec.time_to_psnr(20.0)
    rec.save("BENCH_time_to_psnr.json")
    if tt is None:
        emit("plenoxels_synth_time_to_psnr20_s", -1.0, "s", 0.0)
    else:
        xla_equiv = total_rays[0] / 1339.0  # same rays at the XLA path rate
        emit("plenoxels_synth_time_to_psnr20_s", tt, "s", xla_equiv / tt)


def main():
    for fn in (bench_nerf, bench_plenoxels_kernel, bench_ngp,
               bench_nerfpp, bench_hash_capacity, bench_time_to_psnr):
        try:
            fn()
        except Exception as e:  # one failing backend must not hide the rest
            print(json.dumps({"metric": fn.__name__, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
