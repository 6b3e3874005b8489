"""Benchmark harness — one JSON line per backend metric, on real TPU.

Each line: {"metric", "value", "unit", "vs_baseline", "baseline",
"n_reps", "spread_pct"}.

``baseline`` states what vs_baseline divides by — an EXTERNAL published
number where one exists, otherwise an explicit self-multiple (the
reference publishes no rays/s for those components).  ``spread_pct`` is
(max-min)/mean of the timed repetitions or seeds (VERDICT r2: artifacts
must be self-explaining about measurement noise).

Round-4 metric change (VERDICT r3 weak #1/#2/#5): every time-to-PSNR
metric now uses a FULL-IMAGE train-view eval, computed OFF the clock
(only ray generation + optimizer steps are timed, like the reference's
time_mins.txt accounting at opt.py:529).  The r2/r3 numbers used the
train-ray MSE, which quadtree subdivision biases low (epochs concentrate
rays on high-error leaves) — that bias, not a regression, produced the
r3 -1.0 lines and the plenoxels 9.9->11.5 s drift.

Metrics:
  1. nerf_train_rays_per_sec_per_chip — quadtree-NeRF full optimizer
     steps at the reference lego config (N_rand=1920, 64+128 samples,
     D=8 W=256 x2) on RANDOM rays.  Baseline (external): nerf-pytorch
     ~7.1k rays/s on a 2080 Ti (nerf-ours/README.md:49).
  2. nerf_train_achieved_tflops — the same steps as an achieved-FLOP
     rate (matmul-only analytic count, bwd = 2x fwd), vs the 33 TFLOP/s
     bf16 matmul rate measured on this tile (CLAUDE.md).
  3. plenoxels_train_rays_per_sec_per_chip — fused Pallas voxel render
     full value_and_grad steps, 128^3, 512 steps, dense.  Baseline
     (SELF-multiple): this repo's pure-XLA gather path (1,339 rays/s).
  3b. plenoxels_256_train_rays_per_sec_per_chip — the same kernel at the
     reference's 256^3 scale (opt.py:104-151) with mip occupancy
     skipping on a coherent scene + stochastic slab TV in the loss.
  4. ngp_train_rays_per_sec_per_chip — hash-NGP trainer at torch-ngp's
     FULL 2^19 table capacity, 4096 rays/step, occupancy marching,
     bf16.  Baseline (external): torch-ngp -O lego 97 it/s x 4096 ~
     397k rays/s on a V100 (ngp-ours/readme.md:211).
  5. ngp_train_perflop_vs_torch_ngp — the same rays/s normalized by
     chip matmul rate (33 TFLOP/s bf16 here vs ~125 TFLOP/s fp16 V100):
     the "fast for this chip" audit line.  Plus
     ngp_train_achieved_tflops: the model-flops MFU audit (MLP+trilerp
     MACs x rays/s vs the 33 TFLOP/s roof).
  6. nerfpp_truck_train_rays_per_sec_per_chip — NeRF++ cascade steps at
     the truck batch size.  Baseline (external): the reference's own
     cost note (45 s / 100 iters, batch 2880, 3 GPUs,
     ddp_train_nerf.py:202) ~ 2133 rays/s per GPU.
  7. ngp_hash19_fwd_bwd_16kpts_ms / ngp_hash19_lattice_fwd_bwd_65kpts_ms
     — hash-encoding engines at 2^19 capacity, slope-timed.
  8. plenoxels/ngp/nerfpp/tensorf_synth_time_to_psnr20_s — wall-clock
     (training only) to full-image train-view PSNR 20 per backend,
     2 seeds where the run is cheap.
  9. novelview_gap_db — train-view minus held-out-view PSNR after a
     short plenoxels fit on the 32-view synthetic scene (guards eval
     ray-gen bugs and out-of-distribution test poses; VERDICT r3 #6).
 10. nerf_synth_time_to_psnr20_s + quadtree_speedup_time_to_psnr — from
     the NeRF-backend quadtree-vs-allpixel ablation
     (tools/ablation_quadtree.py): the paper's thesis (reference
     README.md:12-13) measured on TPU.  The speedup is reported at the
     HIGHEST PSNR threshold that both arms reach in all seeds — the
     few-ray win lives in the high-PSNR regime.  The in-run slice is
     budget-trimmed; quadtree_speedup_hi_psnr_3seed carries the
     full-budget 3-seed statistics from the versioned artifact
     (regenerated each round by tools/ablation_quadtree.py
     --seeds 0,1,2 --budget 600).

Run shape: soft global deadline BENCH_BUDGET_S (default 1380 s);
throughput metrics first; every line persisted to BENCH_full.json as it
is emitted; the run ends with a compact all-metric summary line +
bench_health + the headline speedup (the driver keeps only a ~2k-char
stdout tail).
"""

import json
import os
import sys
import time

import numpy as np

_FAILED = []   # metrics that emitted an error or a -1 sentinel
_RECORDS = []  # every emitted line, re-persisted to BENCH_full.json

# The driver runs `python bench.py` under its own timeout and keeps only
# a ~2000-char TAIL of stdout (VERDICT r4 weak #1: the r04 run overran
# and the headline metrics never made the artifact).  Defenses:
#   1. a global soft deadline — stages trim seeds/budgets to fit and the
#      ablation (the longest stage) gets exactly the time that is left;
#   2. every line is ALSO written to BENCH_full.json in-tree after each
#      emit, so a truncated tail loses nothing;
#   3. the run ends with one compact summary line + health + headline,
#      which together fit the tail.
_T0 = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1380))


def remaining_s():
    return BUDGET_S - (time.time() - _T0)


def emit(metric, value, unit, vs_baseline, baseline="", n_reps=1,
         spread_pct=0.0, failed=False):
    """``failed`` marks a sentinel emission for the bench_health line —
    a negative VALUE is not itself failure (novelview_gap_db can
    legitimately be < 0 when held-out beats train)."""
    if failed:
        _FAILED.append(metric)
    rec = {
        "metric": metric, "value": float(f"{float(value):.6g}"),
        "unit": unit,
        "vs_baseline": float(f"{float(vs_baseline):.4g}"),
        "baseline": baseline, "n_reps": int(n_reps),
        "spread_pct": round(float(spread_pct), 1),
        "t": round(time.time() - _T0, 1),   # stage-cost audit trail
    }
    print(json.dumps(rec), flush=True)
    _RECORDS.append(rec)
    _save_full()


def emit_error(metric, err):
    _FAILED.append(metric)
    rec = {"metric": metric, "error": str(err)[:200]}
    print(json.dumps(rec), flush=True)
    _RECORDS.append(rec)
    _save_full()


def _save_full(path="BENCH_full.json"):
    with open(path, "w") as f:
        json.dump({"wall_s": round(time.time() - _T0, 1),
                   "budget_s": BUDGET_S, "lines": _RECORDS}, f, indent=1)


def _spread(vals):
    m = sum(vals) / len(vals)
    return 100.0 * (max(vals) - min(vals)) / max(abs(m), 1e-12)


def _seeds_note(stage, kept, total):
    rec = {"metric": f"{stage}_seed_trim",
           "note": f"deadline: {kept}/{total} seeds fit "
                   f"({remaining_s():.0f}s left)"}
    print(json.dumps(rec), flush=True)
    _RECORDS.append(rec)
    _save_full()


def _deadline_seeds(seeds, per_seed_s, reserve_s, stage):
    """Deadline gate for the t2p seed loops (the r5 overrun fix: the
    pre-ablation stages ran open-loop and blew the global budget by
    456 s — the exact rc=124 failure mode of round 4).  Returns the
    seeds that fit ``remaining_s()`` minus what the LATER stages still
    need; the caller re-checks between seeds with the same arithmetic
    so actual (not estimated) per-seed cost governs.  Empty result =
    skip the stage and emit from the versioned artifact instead."""
    avail = remaining_s() - reserve_s
    n = min(len(seeds), int(max(0.0, avail) // max(per_seed_s, 1.0)))
    if n < len(seeds):
        _seeds_note(stage, n, len(seeds))
    return tuple(seeds[:n])


def _t2p_artifact_fallback(metric, artifact, baseline_extra=""):
    """When the in-run slice doesn't fit the deadline, the metric line
    still must reach the round artifact: source it from the versioned
    per-seed recorder file committed in-tree (same provenance rule the
    quadtree headline already uses)."""
    try:
        with open(artifact) as f:
            tts = json.load(f)["meta"]["tts_per_seed"]
    except (OSError, KeyError, ValueError):
        emit(metric, -1.0, "s", 0.0, failed=True,
             baseline=f"deadline skip and no versioned {artifact}")
        return
    good = [t for t in tts if t is not None]
    emit(metric, float(np.median(good)) if good else -1.0, "s",
         1.0 if good else 0.0, failed=not good,
         baseline="from the versioned in-tree artifact "
         f"{artifact} (in-run slice didn't fit the deadline)"
         + baseline_extra,
         n_reps=max(len(good), 1),
         spread_pct=_spread(good) if len(good) > 1 else 0.0)


def _rep_stats(fn, n_reps, sync):
    """Run fn() n_reps times; returns (median_rep * n_reps, spread_pct).

    Median-rep (not the sum): host-dispatch-bound rep loops share ONE
    CPU core with whatever else runs on the box, and a single contended
    rep would otherwise drag the throughput number by its full overrun
    while the spread line under-reports it (r5: 93% spread on
    plenoxels_256 with pytest running concurrently).  The returned
    spread still exposes the contention."""
    ts = []
    for i in range(n_reps):
        t0 = time.perf_counter()
        sync(fn(i))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2] if len(ts) % 2 else (
        sorted(ts)[len(ts) // 2 - 1] + sorted(ts)[len(ts) // 2]) / 2.0
    return med * n_reps, _spread(ts)


# ---------------------------------------------------------------------------
# Throughput benches
# ---------------------------------------------------------------------------

def _nerf_train_flops_per_ray(rc, W=256, in_pts=63, in_views=27):
    """Matmul-only analytic FLOPs of one trained ray: coarse net over
    n_samples points + fine net over n_samples+n_importance, fwd 2*sum
    (in*out), bwd counted as 2x fwd (the dW and dX GEMMs)."""
    s = in_pts * W + 4 * W * W + (W + in_pts) * W + 2 * W * W  # trunk, skip@4
    s += W * W + W * 1 + (in_views + W) * (W // 2) + (W // 2) * 3
    fwd = 2.0 * s
    pts = rc.n_samples + (rc.n_samples + rc.n_importance)
    return 3.0 * fwd * pts


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
    dt, spread = _rep_stats(
        lambda i: trainer.run_epoch_rays(epoch, jax.random.PRNGKey(i + 1)),
        n_timed, lambda _: jax.block_until_ready(trainer.state.params_coarse))
    rps = n_timed * n_rays / dt / max(len(jax.devices()), 1)
    emit("nerf_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 7111.0, baseline="external: nerf-pytorch 2080Ti 7.1k rays/s"
         " (random-ray proxy at the lego config)", n_reps=n_timed,
         spread_pct=spread)
    tflops = rps * _nerf_train_flops_per_ray(rc) / 1e12
    emit("nerf_train_achieved_tflops", tflops, "TFLOP/s", tflops / 33.0,
         baseline="measured 33 TFLOP/s bf16 matmul rate on this tile "
         "(4096^3 probe, CLAUDE.md); matmul-only count, bwd = 2x fwd",
         n_reps=n_timed, spread_pct=spread)


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
    inner = 5  # async-chained steps per timed rep: the per-step time is
               # ~45 ms and a host sync costs ~28 ms through the tunnel,
               # so per-STEP syncing would dominate (CLAUDE.md)

    def rep(i):
        r = None
        for _ in range(inner):
            r = step(grid.density, grid.sh)
        return r

    iters = 3
    dt, spread = _rep_stats(rep, iters, jax.block_until_ready)
    rps = iters * inner * n_rays / dt / max(len(jax.devices()), 1)
    emit("plenoxels_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 1339.0,
         baseline="SELF-multiple: this repo's XLA gather path (1339 "
         "rays/s at the identical config; reference publishes no rays/s)",
         n_reps=iters, spread_pct=spread)


def bench_plenoxels_256(reso=256, n_rays=4096, max_steps=768, inner=5,
                        iters=3):
    """Reference-scale plenoxels throughput (VERDICT r4 #5: the reference
    trains 256^3 -> 512^3, opt.py:104-151): the fused Pallas kernel at
    256^3 with mip occupancy skipping engaged by a COHERENT scene (a
    centered sphere; random holes defeat skipping — CLAUDE.md) and the
    stochastic slab TV (the tv_grad_sparse analog) inside the
    value_and_grad step, as in real training.  The grid is initialized
    ON DEVICE — a host-side 1.8 GB sh array would cross the tunnel."""
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.voxel_sh import (
        VoxelGrid, VoxelGridConfig, tv_loss_slab,
    )
    from flnerf_tpu.ops import voxel_pallas as vp

    cfg = VoxelGridConfig(reso=(reso,) * 3, max_steps=max_steps,
                          step_size=0.5)

    @jax.jit
    def make_grid(key):
        k1, k2 = jax.random.split(key)
        idx = (jnp.arange(reso, dtype=jnp.float32) - (reso - 1) / 2) \
            / (reso / 2)
        x, y, z = jnp.meshgrid(idx, idx, idx, indexing="ij")
        r = jnp.sqrt(x * x + y * y + z * z)
        inside = r < 0.55
        density = jnp.where(
            inside, 2.0 * jax.random.uniform(k1, (reso,) * 3), 0.0)
        sh = jnp.where(
            inside[..., None],
            0.3 * jax.random.normal(k2, (reso,) * 3 + (27,)), 0.0)
        return VoxelGrid(density=density, sh=sh, alive=r < 0.6)

    grid = make_grid(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
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
    def step(dens, sh, key):
        def loss(dn, s):
            g = VoxelGrid(dn, s, grid.alive)
            out = vp.voxel_render_rays_fast(g, o_j, d_j, cfg)
            mse = jnp.mean((out["rgb"] - gt) ** 2)
            kz1, kz2 = jax.random.split(key)
            return (mse + 1e-3 * tv_loss_slab(s, kz1, 16, grid.alive)
                    + 1e-4 * tv_loss_slab(dn, kz2, 16, grid.alive))
        return jax.value_and_grad(loss, argnums=(0, 1))(dens, sh)

    key = jax.random.PRNGKey(1)
    jax.block_until_ready(step(grid.density, grid.sh, key))  # compile

    def rep(i):
        r = None
        for j in range(inner):
            r = step(grid.density, grid.sh,
                     jax.random.fold_in(key, i * inner + j))
        return r

    dt, spread = _rep_stats(rep, iters, jax.block_until_ready)
    rps = iters * inner * n_rays / dt / max(len(jax.devices()), 1)
    emit(f"plenoxels_{reso}_train_rays_per_sec_per_chip", rps,
         "rays/s/chip",
         rps / 26700.0,
         baseline="SELF-multiple: the same kernel DENSE at 256^3 "
         "(26.7k rays/s, round-2 measurement); svox2 publishes no "
         "rays/s — its 256^3 lego epoch wall-clock is the t2p analog",
         n_reps=iters, spread_pct=spread)


def _ngp_trainer(log2=19, synth_h=64, engine="auto", batch_rays=4096,
                 seed=0):
    import jax.numpy as jnp

    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.hash_ngp import NGPConfig, make_ngp_field
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=8, n_test=1, H=synth_h, W=synth_h)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]

    cfg = NGPConfig(bound=1.5, log2_hashmap_size=log2, hash_engine=engine)
    init_fn, density_fn, rgb_fn = make_ngp_field(cfg, jnp.bfloat16)
    # n_keep=16 ~ torch-ngp's converged mean_count; K=16 also reaches
    # higher psnr than K=32 at equal steps on this scene (DESIGN.md).
    # partial_stride=4: 1/64-grid steady-state refreshes — the r5
    # profile put the strided-eighth refresh at ~3.7 ms/step amortized
    # while the compiled train step is 34 ms; stride 4 cuts it ~8x and
    # the ngp time-to-PSNR line (same config) gates the staleness cost.
    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5, partial_stride=4)
    tcfg = NGPTrainConfig(max_steps=48, batch_rays=batch_rays,
                          steps_per_chunk=16, full_refreshes=2, seed=seed)
    t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)
    sampler = NGPSampler(images[tr], poses[tr], K, tcfg, seed=seed)
    return t, sampler, tcfg


def bench_ngp():
    """Trainer throughput at torch-ngp's FULL 2^19 capacity (its default;
    the engine formulation makes capacity ~free on TPU).  Steady-state
    partial occupancy refreshes (full 128^3 sweeps amortize to nothing
    over a real 30k-step run)."""
    import jax

    t, sampler, tcfg = _ngp_trainer(log2=19)
    t.fit(sampler, verbose=False)  # 48 steps incl. compile

    # 96-step reps: a real run is 30k steps in ONE fit call, so per-call
    # costs (first-chunk host sampling, the stacked loss sync) amortize
    # to ~0 — short reps overweight them (32-step reps read ~6% low)
    t.cfg = tcfg._replace(max_steps=48 + 3 * 96)
    reps = 3
    dt, spread = _rep_stats(
        lambda i: t.fit(sampler, verbose=False, n_steps=96),
        reps, lambda _: jax.block_until_ready(t.state.params["sigma_net"]))
    rps = reps * 96 * tcfg.batch_rays / dt / max(len(jax.devices()), 1)
    emit("ngp_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 397312.0,
         baseline="external: torch-ngp -O lego 97 it/s x 4096 rays on "
         "V100 at the same 2^19 capacity (ngp-ours/readme.md:211)",
         n_reps=reps, spread_pct=spread)
    # per-flop audit: rays/s per TFLOP/s of chip matmul rate, vs the same
    # ratio for torch-ngp on a V100 (397k / ~125 fp16 TFLOP/s)
    perflop = (rps / 33.0) / (397312.0 / 125.0)
    emit("ngp_train_perflop_vs_torch_ngp", perflop, "x", perflop,
         baseline="rays/s normalized by chip matmul rate (33 TFLOP/s "
         "bf16 here vs ~125 fp16 V100); 1.0 = per-flop parity",
         n_reps=reps, spread_pct=spread)
    # model-flops MFU audit (VERDICT r4 #3): the USEFUL flops a perfect
    # gather/scatter implementation would execute per trained ray —
    # MLP matmuls (MAC=2 flops, bwd=2x fwd) + trilerp MACs — times
    # rays/s.  NGP training is tiny-MLP work, so this is small by
    # construction for every implementation: torch-ngp's own number at
    # 397k rays/s is ~0.37 TFLOP/s on a 125 TFLOP/s V100 (0.3% MFU).
    # The chip-time story lives in the per-flop line above; the engine's
    # EXECUTED MXU flops are far larger by design (one-hot matmul
    # formulation trades dense flops for scatter avoidance, DESIGN.md §3).
    mac_pt = (32 * 64 + 64 * 16) + (31 * 64 + 64 * 64 + 64 * 3) \
        + 16 * 2 * 8  # sigma net + color net + 16-level x 2-feat trilerp
    flops_ray = 3.0 * 2.0 * mac_pt * 16  # bwd=2x fwd, n_keep=16 pts/ray
    tflops = rps * flops_ray / 1e12
    emit("ngp_train_achieved_tflops", tflops, "TFLOP/s", tflops / 33.0,
         baseline="model-flops convention (MLP+trilerp MACs, bwd=2x); "
         "vs_baseline = MFU against the 33 TFLOP/s bf16 roof; torch-ngp "
         "V100 equivalent: ~0.37 TFLOP/s = 0.3% MFU",
         n_reps=reps, spread_pct=spread)


def bench_nerfpp():
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
    o = np.tile(np.array([[0.0, 0.5, 3.0]], np.float32), (n_rays, 1))
    # every ray must enter the unit sphere (the reference raises
    # otherwise, ddp_train_nerf.py:65-66): aim at points drawn inside
    # |p| < 0.7 — r3 shipped sigma-scattered dirs whose tail missed
    targets = rng.uniform(-0.4, 0.4, (n_rays, 3)).astype(np.float32)
    d = targets - o
    epoch = RayEpoch(
        origins=o, dirs=d / np.linalg.norm(d, axis=-1, keepdims=True),
        rgb=rng.random((n_rays, 3)).astype(np.float32),
        leaf_id=rng.integers(0, 128, n_rays).astype(np.int32),
        n_leaves=128,
    )
    trainer.run_epoch_rays(epoch, jax.random.PRNGKey(0))  # compile
    n_timed = 3
    dt, spread = _rep_stats(
        lambda i: trainer.run_epoch_rays(epoch, jax.random.PRNGKey(i + 1)),
        n_timed, lambda _: jax.block_until_ready(trainer.state.params[0]))
    rps = n_timed * n_rays / dt / max(len(jax.devices()), 1)
    emit("nerfpp_truck_train_rays_per_sec_per_chip", rps, "rays/s/chip",
         rps / 2133.0,
         baseline="external: reference's own cost note, 2133 rays/s/GPU "
         "(ddp_train_nerf.py:202)", n_reps=n_timed, spread_pct=spread)


def bench_hash_capacity():
    """Sorted-block gather engine at 2^19, fwd+bwd, 16k points, measured
    as the slope of two scan-chained rep counts inside one jit (per-call
    dispatch ~2.5 ms and the ~28 ms tunnel sync cancel in the slope)."""
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
    spread = 100.0 * abs(ts[3] - ts[1]) / max(ts[1], 1e-9)
    emit("ngp_hash19_fwd_bwd_16kpts_ms", ms, "ms", 146.0 / ms,
         baseline="SELF-multiple: the full-matmul path extrapolated to "
         "2^19 (~146 ms; linear in table rows from measured 2^15)",
         n_reps=2, spread_pct=spread)


def bench_hash_lattice():
    """Lattice-hash engine (v4, ops/hash_lattice.py) at 2^19, fwd+bwd,
    the NGP step's 65k-point shape, same slope method."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from flnerf_tpu.ops.hash_lattice import (
        init_lattice_tables, lattice_encode_split, make_lattice_spec,
    )

    spec = make_lattice_spec(log2_hashmap_size=19)
    tables = init_lattice_tables(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (65536, 3))

    def mk(reps):
        @jax.jit
        def f(tables):
            def loss(tb):
                return jnp.sum(lattice_encode_split(x, tb, spec) ** 2)

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
    spread = 100.0 * abs(ts[3] - ts[1]) / max(ts[1], 1e-9)
    emit("ngp_hash19_lattice_fwd_bwd_65kpts_ms", ms, "ms", 49.3 / ms,
         baseline="SELF-multiple: v3 sorted-block engine at the same "
         "65k-point step shape (49.3 ms, round-3 measurement)",
         n_reps=2, spread_pct=spread)
    # roofline audit of the engine itself: analytic slab-matmul flops
    # (hash_lattice.lattice_flops_estimate) over the measured time
    from flnerf_tpu.ops.hash_lattice import lattice_flops_estimate
    est = lattice_flops_estimate(spec, 65536)
    tflops = est["flops_total"] / (ms / 1e3) / 1e12
    emit("ngp_engine_executed_tflops", tflops, "TFLOP/s", tflops / 33.0,
         baseline="analytic big-group slab-matmul flops / measured "
         "fwd+bwd time; vs_baseline = fraction of the 33 TFLOP/s bf16 "
         "roof (sorts, one-hot builds and the small-level path share "
         "the same wall-clock)", n_reps=2, spread_pct=spread)


# ---------------------------------------------------------------------------
# Time-to-PSNR benches (full-image train-view eval, training-only clock)
# ---------------------------------------------------------------------------

def RayEpoch_slice(ep, n):
    """First ``n`` rays of an epoch (for cheap compile pre-warm passes)."""
    s = slice(0, min(n, ep.origins.shape[0]))

    def cut(a):
        return None if a is None else a[s]

    return ep._replace(origins=ep.origins[s], dirs=ep.dirs[s],
                       rgb=ep.rgb[s], leaf_id=ep.leaf_id[s],
                       viewdirs=cut(ep.viewdirs), px=cut(ep.px),
                       py=cut(ep.py), img=cut(ep.img))


def bench_time_to_psnr(seeds=(0, 1, 2), H=64, reso=96, n_train=32,
                       target=20.0, early_stop=22.0, n_epoch=96,
                       budget_s=150.0):
    """Plenoxels wall-clock to full-image train-view PSNR ``target``.

    32 training views: at 8 views the dense grid fits the training RAYS
    past 20 dB while the full-image eval plateaus ~14 dB (few-view
    floaters) — the honest metric needs enough views that image quality
    tracks ray fit (r4 TPU curve in git history)."""
    # deadline gate: ~155 s/seed (measured with the crossed-break, r5
    # validation run: 567 s = warm compile + 3 seeds) + ~100 s warm
    # compile; the stages after this one need ~400 s
    seeds = _deadline_seeds(seeds, per_seed_s=155.0, reserve_s=500.0,
                            stage="plenoxels_t2p")
    if not seeds:
        _t2p_artifact_fallback("plenoxels_synth_time_to_psnr20_s",
                               "BENCH_time_to_psnr.json")
        return
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.core.benchmark import BenchRecorder
    from flnerf_tpu.core.compile_cache import cache_entries
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.voxel_sh import VoxelGridConfig, init_voxel_grid
    from flnerf_tpu.rays.camera import get_rays_np, intrinsics_matrix
    from flnerf_tpu.rays.quadtree import RayBudgeter
    from flnerf_tpu.train.plenoxels_trainer import (
        PlenoxelsState, PlenoxelsTrainConfig, PlenoxelsTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=n_train, n_test=1, H=H, W=H)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]
    o = np.stack([get_rays_np(H, W, K, p[:3, :4])[0] for p in poses[tr]], 0)
    d = np.stack([get_rays_np(H, W, K, p[:3, :4])[1] for p in poses[tr]], 0)

    gcfg = VoxelGridConfig(
        reso=(reso,) * 3, radius=(1.2,) * 3, max_steps=256, step_size=0.7,
        init_sigma=0.1,
    )
    # reference syn cadence/threshold (plenoxels-ours/opt/configs/
    # syn_ours.json: every=3, thres 1e-3-5e-3): at thres 0.05 NO leaf
    # ever subdivided on this scene (leaf MSE < 0.05 from epoch 1), the
    # budget collapsed to the 10-ray floor, and seed 0 plateaued at
    # 19.3 dB for 90 epochs (r4 artifact) — the tree must track error
    # for the metric to measure the paper's mechanism at all
    tcfg = PlenoxelsTrainConfig(
        n_epoch=n_epoch, batch_size=4096, steps_per_chunk=8,
        lr_sigma=1e1, lr_sh=1e-2, lr_sigma_delay_steps=0,
        subdivide_every=3, subdivide_thres=0.005, use_kernel=True,
    )
    trainer = PlenoxelsTrainer(gcfg, tcfg)
    entries_before = cache_entries()

    tc0 = time.time()
    warm_b = RayBudgeter(images[tr], o, d, init_level=2, seed=0)
    ep_warm = warm_b.gen_rays(down_scale=1)
    trainer.run_epoch_rays(ep_warm)
    # pre-warm the leaf-buffer buckets subdivision reaches mid-run
    # (init level 2 = 512 leaves -> bucket 1024; adjust() grows
    # n_leaves into 2048/4096 and each bucket is its own compiled
    # graph — warm them off-clock or, on a cold persistent cache,
    # the remote compile lands inside the timed region)
    small = RayEpoch_slice(ep_warm, tcfg.batch_size * tcfg.steps_per_chunk)
    for nl in (2047, 4095):
        trainer.run_epoch_rays(small._replace(n_leaves=nl))
    trainer.eval_images(poses[tr][:4], images[tr][:4], H, W, K, chunk=4096)
    compile_s = time.time() - tc0

    tts, total_rays = [], []
    rec0 = None
    for seed in seeds:
        if tts and remaining_s() - 400.0 < 155.0:
            _seeds_note("plenoxels_t2p", len(tts), len(seeds))
            break
        g0 = init_voxel_grid(gcfg)
        trainer.state = jax.device_put(
            PlenoxelsState(g0, jnp.zeros_like(g0.density),
                           jnp.zeros_like(g0.sh), jnp.int32(0)))
        # the ~100s-of-MB grid state crosses the tunnel lazily — block
        # BEFORE the clock so the transfer is setup, not "training"
        jax.block_until_ready(trainer.state.grid.sh)
        budgeter = RayBudgeter(images[tr], o, d, init_level=2, seed=seed)
        rec = BenchRecorder(meta={
            "scene": "synthetic", "backend": "plenoxels", "seed": seed,
            "psnr_kind": "full-image train-view eval (off the clock)",
            "warm_compile_s": round(compile_s, 1),
            "compile_cache_entries_before": entries_before})
        rays = 0
        train_s = 0.0
        for epoch_id in range(1, tcfg.n_epoch + 1):
            t0 = time.time()
            ep = budgeter.gen_rays(down_scale=1)
            rays += ep.origins.shape[0]
            stat, _ = trainer.run_epoch_rays(ep)
            if epoch_id % tcfg.subdivide_every == 0:
                budgeter.adjust(stat, tcfg.subdivide_thres,
                                min_area_floor=budgeter.starvation_floor())
            train_s += time.time() - t0
            # 4-view mean eval: a single view's PSNR is seed/allocation
            # sensitive (one r4 seed plateaued at 19 dB on view 0 while
            # crossing on others; a 2-view mean still stalled seed 0 at
            # 17.9 while the 1-view novelview probe crossed 20.3 on the
            # same run) — more views average the allocation noise out
            psnr, _ = trainer.eval_images(poses[tr][:4], images[tr][:4],
                                          H, W, K, chunk=4096)
            rec.record(psnr=psnr, epoch=epoch_id, wall_s=train_s,
                       rays=ep.origins.shape[0])
            # stop once the crossing is PINNED (target + 1 dB margin and
            # a dense-enough curve), not only at early_stop: the r5 run
            # sat at 20.8 dB for 60+ epochs chasing early_stop=22 and
            # the off-clock per-epoch evals tripled the stage wall-clock
            crossed = (rec.time_to_psnr(target) is not None
                       and psnr >= target + 1.0 and len(rec.samples) >= 12)
            if crossed or psnr >= early_stop or train_s > budget_s:
                break
        tts.append(rec.time_to_psnr(target))
        total_rays.append(rays)
        rec0 = rec0 or rec
    rec0.meta["tts_per_seed"] = [None if t is None else round(t, 2)
                                 for t in tts]
    rec0.save("BENCH_time_to_psnr.json")
    good = [t for t in tts if t is not None]
    metric = f"plenoxels_synth_time_to_psnr{int(target)}_s"
    if not good:
        emit(metric, -1.0, "s", 0.0, failed=True)
        return
    # MEDIAN of >=3 seeds (VERDICT r4 #6): one slow-converging seed
    # dominated the r4/r5-interim means (129% spread when contended);
    # the median is the robust center, spread still reported alongside
    tt = float(np.median(good))
    xla_equiv = (sum(total_rays) / len(total_rays)) / 1339.0
    emit(metric, tt, "s", xla_equiv / tt,
         baseline="SELF-multiple: same rays at the XLA path's rate; "
         "median of per-seed crossings (per-seed values in "
         "BENCH_time_to_psnr.json); metric changed r4 to full-image "
         "train-view eval (r2/r3 used the quadtree-biased train-ray MSE)",
         n_reps=len(good), spread_pct=_spread(good) if len(good) > 1 else 0.0)


def bench_ngp_time_to_psnr(seeds=(0, 1, 2), synth_h=64, target=20.0,
                           max_iters=48, steps_per_iter=32, log2=19):
    """NGP backend wall-clock to full-image train-view PSNR (2^19)."""
    seeds = _deadline_seeds(seeds, per_seed_s=35.0, reserve_s=330.0,
                            stage="ngp_t2p")
    if not seeds:
        _t2p_artifact_fallback("ngp_synth_time_to_psnr20_s",
                               "BENCH_time_to_psnr_ngp.json")
        return
    import jax

    from flnerf_tpu.core.benchmark import BenchRecorder
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.rays.camera import intrinsics_matrix

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=8, n_test=1, H=synth_h, W=synth_h)
    H, W, focal = hwf
    K = intrinsics_matrix(H, W, focal)
    tr = i_split[0]

    t, sampler, tcfg = _ngp_trainer(log2=log2, synth_h=synth_h)
    # warm the EXACT timed graphs: max_steps enters the compiled lr
    # decay (ngp_trainer.py:373), and the partial-refresh occupancy
    # variant first runs at step >= full_refreshes*steps_per_chunk —
    # a 16-step warmup at the default max_steps missed both, so on a
    # cold compile cache two remote compiles landed inside the
    # "training-only" clock (r4: 13.7 s -> 77.5 s artifact)
    t.cfg = tcfg._replace(max_steps=max_iters * steps_per_iter)
    t.fit(sampler, verbose=False, n_steps=3 * steps_per_iter)
    t.eval_images(poses[tr][:1], images[tr][:1], H, W, K)

    tts = []
    rec0 = None
    for seed in seeds:
        if tts and remaining_s() - 300.0 < 35.0:
            _seeds_note("ngp_t2p", len(tts), len(seeds))
            break
        t2, sampler2, _ = _ngp_trainer(log2=log2, synth_h=synth_h,
                                       seed=seed)   # fresh params
        rec = BenchRecorder(meta={
            "scene": "synthetic", "backend": "ngp", "seed": seed,
            "psnr_kind": "full-image train-view eval (off the clock)"})
        t2.cfg = tcfg._replace(max_steps=max_iters * steps_per_iter)
        train_s = 0.0
        for it in range(max_iters):
            t0 = time.time()
            t2.fit(sampler2, verbose=False, n_steps=steps_per_iter)
            train_s += time.time() - t0
            psnr, _ = t2.eval_images(poses[tr][:1], images[tr][:1], H, W, K)
            rec.record(psnr=psnr, step=int(t2.state.step), wall_s=train_s)
            # densify the curve (VERDICT r3 #9): don't stop at the first
            # post-target eval — a 2-sample artifact can't show a
            # regression next round
            if psnr >= target + 2.0 and len(rec.samples) >= 8:
                break
        tts.append(rec.time_to_psnr(target))
        rec0 = rec0 or rec
    rec0.meta["tts_per_seed"] = [None if t is None else round(t, 2)
                                 for t in tts]
    rec0.save("BENCH_time_to_psnr_ngp.json")
    good = [t for t in tts if t is not None]
    emit(f"ngp_synth_time_to_psnr{int(target)}_s",
         float(np.median(good)) if good else -1.0, "s",
         1.0 if good else 0.0, failed=not good,
         baseline="absolute (no external reference at this scene); "
         "median of per-seed crossings (per-seed values in "
         "BENCH_time_to_psnr_ngp.json), full-image train-view eval, "
         "training-only clock",
         n_reps=max(len(good), 1),
         spread_pct=_spread(good) if len(good) > 1 else 0.0)


def bench_nerfpp_time_to_psnr(H=64, n_train=8, target=20.0, max_epochs=60,
                              budget_s=120.0, mcfg=None, tcfg=None,
                              seeds=(0, 1, 2)):
    """NeRF++ wall-clock to full-image train-view PSNR ``target`` on the
    synthetic inside-the-unit-sphere scene (fg + bg cascade)."""
    seeds = _deadline_seeds(seeds, per_seed_s=45.0, reserve_s=220.0,
                            stage="nerfpp_t2p")
    if not seeds:
        _t2p_artifact_fallback("nerfpp_synth_time_to_psnr20_s",
                               "BENCH_time_to_psnr_nerfpp.json")
        return None
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.core.benchmark import BenchRecorder
    from flnerf_tpu.data.nerfpp_dataset import make_synthetic_nerfpp_scene
    from flnerf_tpu.models.nerfpp import NerfPPConfig
    from flnerf_tpu.rays.quadtree import RayBudgeter
    from flnerf_tpu.train.nerfpp_trainer import (
        NerfPPTrainConfig, NerfPPTrainer,
    )

    train, _ = make_synthetic_nerfpp_scene(n_train=n_train, n_test=1,
                                           H=H, W=H)
    mcfg = mcfg or NerfPPConfig()
    # same step shapes as bench_nerfpp so the chunk fn compile is shared
    tcfg = tcfg or NerfPPTrainConfig(batch_size=2880, steps_per_chunk=8,
                                     prob_sampling=False)
    ro0 = jnp.asarray(train["origins"][0].reshape(-1, 3))
    rd0 = jnp.asarray(train["dirs"][0].reshape(-1, 3))
    gt0 = train["images"][0].reshape(-1, 3)

    def budgeter(seed=0):
        return RayBudgeter(train["images"], train["origins"], train["dirs"],
                           init_level=2, seed=seed)

    def eval_psnr(tr):
        rgb = np.asarray(tr._eval_rays(ro0, rd0, chunk=4096))
        mse = float(np.mean((rgb - gt0) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    trainer = NerfPPTrainer(mcfg, tcfg)
    ep_w = budgeter().gen_rays(down_scale=1)
    trainer.run_epoch_rays(ep_w, jax.random.PRNGKey(0))  # compile warmup
    # subdivision can push n_leaves past 1024 mid-run — warm the next
    # leaf-buffer bucket off-clock (see bench_time_to_psnr)
    trainer.run_epoch_rays(
        RayEpoch_slice(ep_w, tcfg.batch_size * tcfg.steps_per_chunk)
        ._replace(n_leaves=2047), jax.random.PRNGKey(0))
    eval_psnr(trainer)

    tts, rec0 = [], None
    for seed in seeds:
        if tts and remaining_s() - 200.0 < 45.0:
            _seeds_note("nerfpp_t2p", len(tts), len(seeds))
            break
        trainer = NerfPPTrainer(mcfg, tcfg._replace(seed=777 + seed))
        b = budgeter(seed)
        rec = BenchRecorder(meta={
            "scene": "synthetic_nerfpp", "backend": "nerfpp", "seed": seed,
            "psnr_kind": "full-image train-view eval (off the clock)"})
        key = jax.random.PRNGKey(1 + seed)
        train_s = 0.0
        tt = None
        for epoch_id in range(1, max_epochs + 1):
            key, sub = jax.random.split(key)
            t0 = time.time()
            ep = b.gen_rays(down_scale=1)
            stat, _ = trainer.run_epoch_rays(ep, sub)
            # reference cadence + derived starvation floor (quadtree.py)
            if epoch_id % 3 == 0:
                b.adjust(stat, 0.02, min_area_floor=b.starvation_floor())
            train_s += time.time() - t0
            psnr = eval_psnr(trainer)
            rec.record(psnr=psnr, epoch=epoch_id, wall_s=train_s,
                       rays=ep.origins.shape[0])
            tt = rec.time_to_psnr(target)
            if tt is not None or train_s > budget_s:
                break
        tts.append(tt)
        rec0 = rec0 or rec
    ok = [t for t in tts if t is not None]
    rec0.meta["tts_per_seed"] = tts
    rec0.save("BENCH_time_to_psnr_nerfpp.json")
    # MEDIAN of >=3 seeds (VERDICT r4 #6): the r4 2-seed mean carried a
    # 94% spread — one slow-converging seed dominated; the median is the
    # robust center and the spread is still reported alongside
    val = float(np.median(ok)) if ok else -1.0
    spread = _spread(ok) if len(ok) > 1 else 0.0
    emit(f"nerfpp_synth_time_to_psnr{int(target)}_s",
         val, "s", 1.0 if len(ok) == len(tts) else 0.0,
         failed=not ok,
         baseline="absolute (no external reference at this scene); "
         "median of per-seed crossings, full-image train-view eval, "
         "training-only clock; per-seed values in "
         "BENCH_time_to_psnr_nerfpp.json",
         n_reps=len(tts), spread_pct=spread)
    return val


def bench_tensorf_time_to_psnr(H=64, n_train=8, target=20.0, max_iters=48,
                               steps_per_iter=32, seeds=(0, 1, 2)):
    """TensoRF (VM) wall-clock to full-image train-view PSNR ``target``
    via the shared occupancy-marching trainer (128^3, rank 48)."""
    seeds = _deadline_seeds(seeds, per_seed_s=35.0, reserve_s=110.0,
                            stage="tensorf_t2p")
    if not seeds:
        _t2p_artifact_fallback("tensorf_synth_time_to_psnr20_s",
                               "BENCH_time_to_psnr_tensorf.json")
        return None
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.core.benchmark import BenchRecorder
    from flnerf_tpu.data.synthetic import load_synthetic_data
    from flnerf_tpu.models.tensorf import TensoRFConfig, make_tensorf_field
    from flnerf_tpu.rays.camera import intrinsics_matrix
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import (
        NGPSampler, NGPTrainConfig, NGPTrainer,
    )

    images, poses, rp, hwf, i_split = load_synthetic_data(
        n_train=n_train, n_test=1, H=H, W=H)
    Hh, Ww, focal = hwf
    K = intrinsics_matrix(Hh, Ww, focal)
    tr = i_split[0]

    cfg = TensoRFConfig(bound=1.5)
    rcfg = NGPRenderConfig(n_candidates=128, n_keep=16, grid_size=128,
                           bound=1.5)
    tcfg = NGPTrainConfig(max_steps=steps_per_iter * max_iters,
                          batch_rays=4096, steps_per_chunk=16, lr=2e-2,
                          full_refreshes=2)

    def make(seed=0):
        init_fn, density_fn, rgb_fn = make_tensorf_field(cfg, jnp.bfloat16)
        t = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg,
                       tcfg._replace(seed=seed))
        return t, NGPSampler(images[tr], poses[tr], K, tcfg, seed=seed)

    t, sampler = make()
    # 3 iters of warmup: the partial-refresh occupancy variant first
    # runs at step >= full_refreshes*steps_per_chunk = 32, past a
    # 16-step warmup (see bench_ngp_time_to_psnr)
    t.fit(sampler, verbose=False, n_steps=3 * steps_per_iter)
    t.eval_images(poses[tr][:1], images[tr][:1], Hh, Ww, K)

    tts = []
    rec0 = None
    for seed in seeds:
        if tts and remaining_s() - 100.0 < 35.0:
            _seeds_note("tensorf_t2p", len(tts), len(seeds))
            break
        t, sampler = make(seed)
        rec = BenchRecorder(meta={
            "scene": "synthetic", "backend": "tensorf", "seed": seed,
            "psnr_kind": "full-image train-view eval (off the clock)"})
        train_s = 0.0
        for _ in range(max_iters):
            t0 = time.time()
            t.fit(sampler, verbose=False, n_steps=steps_per_iter)
            train_s += time.time() - t0
            psnr, _ = t.eval_images(poses[tr][:1], images[tr][:1],
                                    Hh, Ww, K)
            rec.record(psnr=psnr, step=int(t.state.step), wall_s=train_s)
            # densify the curve (VERDICT r3 #9) — see bench_ngp_time_to_psnr
            if psnr >= target + 2.0 and len(rec.samples) >= 8:
                break
        tts.append(rec.time_to_psnr(target))
        rec0 = rec0 or rec
    rec0.meta["tts_per_seed"] = [None if t is None else round(t, 2)
                                 for t in tts]
    rec0.save("BENCH_time_to_psnr_tensorf.json")
    good = [t for t in tts if t is not None]
    emit(f"tensorf_synth_time_to_psnr{int(target)}_s",
         float(np.median(good)) if good else -1.0, "s",
         1.0 if good else 0.0, failed=not good,
         baseline="absolute (no external reference at this scene); "
         "median of per-seed crossings (per-seed values in "
         "BENCH_time_to_psnr_tensorf.json), full-image train-view eval, "
         "training-only clock",
         n_reps=max(len(good), 1),
         spread_pct=_spread(good) if len(good) > 1 else 0.0)
    return tts


def bench_novelview_gap(budget_s=45.0, H=64, reso=96, n_train=32,
                        early_stop=23.0, healthy_below=4.0):
    """Held-out-view health gate (VERDICT r3 #6): short plenoxels fit on
    the 32-view synthetic scene, then train-view minus test-view PSNR.
    Catches eval ray-gen bugs and out-of-distribution test poses — a
    healthy fit keeps the gap small at this view density."""
    if remaining_s() < budget_s + 70.0:
        rec = {"metric": "novelview_gap_db",
               "note": f"skipped (deadline: {remaining_s():.0f}s left); "
               "health gate only — pinned by tests, not a perf line"}
        print(json.dumps(rec), flush=True)
        _RECORDS.append(rec)
        _save_full()
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.ablation_quadtree import run_plenoxels, eval_split

    rec = run_plenoxels("quadtree", budget_s=budget_s, H=H, reso=reso,
                        n_train=n_train, early_stop_psnr=early_stop)
    train_psnr, test_psnr = eval_split(rec)
    gap = train_psnr - test_psnr
    emit("novelview_gap_db", gap, "dB",
         1.0 if gap < healthy_below else 0.0,
         baseline=f"train-view {train_psnr:.1f} dB vs held-out "
         f"{test_psnr:.1f} dB after a {budget_s:.0f} s plenoxels fit, "
         f"{n_train}-view synthetic scene; healthy < {healthy_below} dB",
         n_reps=1)
    return gap


def bench_nerf_ablation(seeds=(0, 1), budget_s=340.0, early_stop=32.7,
                        H=96, n_train=32,
                        thresholds=(20, 22, 24, 26, 28, 30, 32),
                        run_kwargs=None):
    # Budget/early-stop sit PAST the arms' divergence: the quadtree's
    # few-ray concentration only builds up after the subdivide-every-3
    # rounds bite (~100 s in), and all-pixel saturates ~33-34 dB — at a
    # 210 s budget the r4 arms stopped at ~31 dB nearly identical
    # (speedup 1.0 +- 27%), while the r3 420 s curves show 1.9x at 32.
    """NeRF-backend quadtree-vs-allpixel ablation: emits the nerf
    time-to-PSNR20 (quadtree arm) and returns the speedup payload for
    the final line.  Both arms: identical seed/scene/eval, training-only
    clock, full-image train-view eval off the clock."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.ablation_quadtree import run_nerf, speedups

    thresholds = list(thresholds)
    curves = {}
    tts, sps = [], []
    run_kwargs = run_kwargs or {}
    for seed in seeds:
        rq = run_nerf("quadtree", budget_s=budget_s, seed=seed, H=H,
                      n_train=n_train, early_stop_psnr=early_stop,
                      **run_kwargs)
        ra = run_nerf("allpixel", budget_s=budget_s, seed=seed, H=H,
                      n_train=n_train, early_stop_psnr=early_stop,
                      **run_kwargs)
        tts.append(rq.time_to_psnr(min(thresholds)))
        sps.append(speedups(rq, ra, thresholds))
        curves[f"seed{seed}"] = {"quadtree": rq.samples,
                                 "allpixel": ra.samples,
                                 "meta": [rq.meta, ra.meta]}
    # in-run slice goes to its OWN file: the versioned full-budget
    # artifact (tools/ablation_quadtree.py, multi-seed + plenoxels +
    # at_allpixel_final) must survive a bench run, because the headline
    # artifact-sourced lines are read from it AFTER this stage
    with open("BENCH_ablation_inrun.json", "w") as f:
        json.dump({"curves": {"nerf": curves},
                   "speedups": {"nerf": sps},
                   "thresholds": thresholds}, f, indent=1)

    good = [t for t in tts if t is not None]
    emit(f"nerf_synth_time_to_psnr{int(min(thresholds))}_s",
         sum(good) / len(good) if good else -1.0, "s",
         1.0 if good else 0.0, failed=not good,
         baseline="absolute (no external reference at this scene); "
         "quadtree arm of the ablation, full-image train-view eval, "
         "training-only clock (incl. precrop warmup)",
         n_reps=max(len(good), 1),
         spread_pct=_spread(good) if len(good) > 1 else 0.0)

    # highest threshold reached by BOTH arms in ALL seeds
    for t in reversed(thresholds):
        key = f"psnr_{t}"
        if all(key in sp for sp in sps):
            vals = [sp[key] for sp in sps]
            return {"value": sum(vals) / len(vals), "threshold": t,
                    "n": len(vals),
                    "spread": _spread(vals) if len(vals) > 1 else 0.0}
    return None


def read_ablation_artifact(path="BENCH_ablation_quadtree.json",
                           t2p_target=20.0, backend="nerf"):
    """Headline payloads from the versioned multi-seed ablation artifact
    (tools/ablation_quadtree.py --seeds ... : the full-statistics run
    each round commits).  Returns (speedup_payload, t2p_payload,
    equal_quality_payload) or Nones."""
    try:
        with open(path) as f:
            art = json.load(f)
        sps = art["speedups"][backend]
        sp_payload = None
        for t in reversed(art["thresholds"]):
            key = f"psnr_{t:g}"
            if sps and all(key in sp for sp in sps):
                vals = [sp[key] for sp in sps]
                # median across seeds (VERDICT r4 #6): at 34 dB the
                # crossing is ill-conditioned and one seed can carry a
                # 2.8x outlier; the median is the robust center
                sp_payload = {"value": float(np.median(vals)),
                              "threshold": t, "n": len(vals),
                              "spread": _spread(vals) if len(vals) > 1
                              else 0.0,
                              "per_seed": [round(v, 3) for v in vals]}
                break
        tts = []
        for curve in art["curves"][backend].values():
            cross = [s["wall_s"] for s in curve["quadtree"]
                     if s["psnr"] >= t2p_target]
            if cross:
                tts.append(min(cross))
        t2p_payload = None
        if tts:
            t2p_payload = {"value": float(np.median(tts)), "n": len(tts),
                           "spread": _spread(tts) if len(tts) > 1 else 0.0}
        # the paper-shaped per-seed statistic: quadtree time to reach
        # the all-pixel arm's whole-budget END quality
        eq = [sp["at_allpixel_final"]["speedup"] for sp in sps
              if isinstance(sp.get("at_allpixel_final"), dict)
              and sp["at_allpixel_final"].get("speedup")]
        eq_payload = None
        if eq:
            eq_payload = {"value": float(np.median(eq)), "n": len(eq),
                          "spread": _spread(eq) if len(eq) > 1 else 0.0,
                          "per_seed": [round(v, 3) for v in eq]}
        return sp_payload, t2p_payload, eq_payload
    except Exception:
        return None, None, None


def emit_quadtree_speedup(payload, source="in-run"):
    if payload is None:
        emit("quadtree_speedup_time_to_psnr", -1.0, "x", 0.0,
             baseline="1.0 = parity with all-pixel training", n_reps=1,
             failed=True)
        return
    if source == "eq":
        # the paper-shaped, well-conditioned statistic: MEDIAN per-seed
        # ratio of the all-pixel arm's whole-budget wall-clock to the
        # quadtree arm's time to the SAME end quality (fixed-threshold
        # crossings near saturation carry 74% seed spread; this doesn't)
        emit("quadtree_speedup_time_to_psnr", payload["value"], "x",
             payload["value"],
             baseline="equal-quality vs all-pixel NeRF training: median "
             "per-seed allpixel_wall / quadtree_time_to_allpixel_end_psnr "
             f"over full-budget 600 s arms (per-seed {payload['per_seed']}; "
             "1.0 = parity; versioned BENCH_ablation_quadtree.json)",
             n_reps=payload["n"], spread_pct=payload["spread"])
        return
    prov = ("measured in this run" if source == "in-run" else
            "from the versioned full-budget artifact regenerated this "
            "round (600 s arms)")
    emit("quadtree_speedup_time_to_psnr", payload["value"], "x",
         payload["value"],
         baseline="all-pixel NeRF training at equal seed/scene/eval "
         f"(highest threshold both arms reach: psnr_{payload['threshold']}; "
         f"1.0 = parity; {prov}; the few-ray win grows with PSNR — "
         "BENCH_ablation_quadtree.json)",
         n_reps=payload["n"], spread_pct=payload["spread"])


def _probe_device(timeout_s: int = 1500) -> bool:
    """Fast-fail when the TPU pool is unreachable: a first computation
    then hangs INDEFINITELY at claim time (0% CPU, pre-claim — safe to
    abort, unlike mid-compile kills; see CLAUDE.md).  The alarm must
    outlast a QUEUED claim, not just a compile: another process holding
    the tile (or a killed one awaiting the ~9 min session reap) delays
    the claim, and aborting then would throw away the whole bench run —
    so wait out a reap window plus slack before declaring the pool
    down."""
    import signal

    import jax
    import jax.numpy as jnp

    def _handler(signum, frame):
        raise TimeoutError

    old = signal.signal(signal.SIGALRM, _handler)
    signal.alarm(timeout_s)
    try:
        x = jnp.ones((128, 128), jnp.bfloat16)
        float((x @ x).sum())
    except TimeoutError:
        print(json.dumps({
            "metric": "device_probe",
            "error": f"device unreachable after {timeout_s}s "
                     "(TPU pool down?)"}), flush=True)
        return False
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    return True


def main():
    from flnerf_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()
    if not _probe_device():
        return
    # throughput + headline metrics FIRST (VERDICT r4 #1): if anything
    # later overruns, the lines that define the perf story are already
    # out (and persisted to BENCH_full.json)
    for fn in (bench_nerf, bench_plenoxels_kernel, bench_plenoxels_256,
               bench_ngp, bench_nerfpp, bench_hash_capacity,
               bench_hash_lattice, bench_time_to_psnr,
               bench_ngp_time_to_psnr, bench_nerfpp_time_to_psnr,
               bench_tensorf_time_to_psnr, bench_novelview_gap):
        try:
            fn()
        except Exception as e:  # one failing backend must not hide the rest
            emit_error(fn.__name__, e)

    # the quadtree ablation is the longest stage and the r04 overrun
    # casualty: it now takes exactly the time that is LEFT in the budget
    # (seeds/arm-budget trimmed to fit), and the headline speedup falls
    # back to the versioned full-budget artifact when the in-run slice
    # is too small to re-measure it honestly
    payload = None
    t_left = remaining_s() - 90.0
    try:
        if t_left >= 420.0:
            n_seeds = 2 if t_left >= 1400.0 else 1
            per_arm = min(340.0, (t_left - 110.0 * n_seeds)
                          / (2.0 * n_seeds))
            payload = bench_nerf_ablation(seeds=tuple(range(n_seeds)),
                                          budget_s=per_arm)
        else:
            print(json.dumps({"metric": "bench_nerf_ablation",
                              "note": f"skipped in-run ({t_left:.0f}s "
                              "left); headline sourced from the "
                              "versioned artifact"}), flush=True)
    except Exception as e:
        emit_error("bench_nerf_ablation", e)

    art_sp, art_t2p, art_eq = read_ablation_artifact()
    if payload is None and art_t2p is not None:
        emit("nerf_synth_time_to_psnr20_s", art_t2p["value"], "s", 1.0,
             baseline="quadtree arm of the versioned full-budget "
             "ablation artifact regenerated this round "
             "(BENCH_ablation_quadtree.json); full-image train-view "
             "eval, training-only clock",
             n_reps=art_t2p["n"], spread_pct=art_t2p["spread"])
    if art_sp is not None:
        emit("quadtree_speedup_hi_psnr_3seed", art_sp["value"], "x",
             art_sp["value"],
             baseline="versioned full-budget ablation artifact (600 s "
             f"arms, n={art_sp['n']} seeds, highest threshold all seeds "
             f"reach: psnr_{art_sp['threshold']}) — the paper-regime "
             "statistics the in-run slice can't afford",
             n_reps=art_sp["n"], spread_pct=art_sp["spread"])
    if art_eq is not None:
        emit("quadtree_speedup_at_allpixel_final", art_eq["value"], "x",
             art_eq["value"],
             baseline="MEDIAN per-seed ratio of the all-pixel arm's "
             "whole-budget wall-clock to the quadtree arm's time to the "
             "SAME end quality (the paper's equal-quality statistic); "
             f"per-seed: {art_eq['per_seed']} — versioned artifact",
             n_reps=art_eq["n"], spread_pct=art_eq["spread"])
    plx_sp, _, plx_eq = read_ablation_artifact(backend="plenoxels")
    if plx_sp is not None:
        emit("quadtree_speedup_plenoxels_3seed", plx_sp["value"], "x",
             plx_sp["value"],
             baseline="plenoxels-backend quadtree-vs-allpixel arms from "
             "the versioned artifact (200 s arms, highest threshold all "
             f"seeds reach: psnr_{plx_sp['threshold']}"
             + (f"; equal-quality median {plx_eq['value']:.2f}x over "
                f"{plx_eq['per_seed']}" if plx_eq else "") + ")",
             n_reps=plx_sp["n"], spread_pct=plx_sp["spread"])

    # loud health line (VERDICT r3 #10): any error/-1 above shows here,
    # so a broken metric can't slip into a round artifact silently
    emit("bench_health", float(len(_FAILED)), "failed_metrics",
         1.0 if not _FAILED else 0.0,
         baseline="0 = every metric produced a real value"
         + ("; FAILED: " + ",".join(_FAILED[:8]) if _FAILED else ""),
         n_reps=1)
    # compact re-print of EVERY metric: the driver keeps only a ~2k-char
    # stdout tail, so the full line set must fit there (full-precision
    # records live in BENCH_full.json)
    summary = {r["metric"]: r["value"] for r in _RECORDS if "value" in r}
    print(json.dumps({"metric": "bench_summary",
                      "values": summary,
                      "wall_s": round(time.time() - _T0, 1)}), flush=True)
    if art_eq is not None:
        emit_quadtree_speedup(art_eq, source="eq")
    elif payload is not None:
        emit_quadtree_speedup(payload, source="in-run")
    else:
        emit_quadtree_speedup(art_sp, source="artifact")


if __name__ == "__main__":
    main()
