"""TensoRF training CLI (ngp-ours/main_tensoRF.py analog).

Same flag surface as main_nerf plus the TensoRF knobs: VM or CP
decomposition (--cp, main_tensoRF.py:33), upsample schedule
(--upsample_model_steps), and L1 sparsity weight (tensoRF/utils.py:46).

Usage:
  python -m flnerf_tpu.cli.main_tensorf data/nerf/lego -O --bound 1
  python -m flnerf_tpu.cli.main_tensorf synthetic -O --iters 256   # smoke
"""

from __future__ import annotations

import os
import time as _time

import numpy as np

from flnerf_tpu.cli.main_nerf import load_ngp_dataset, make_parser


def make_tensorf_parser():
    parser = make_parser()
    parser.add_argument("--cp", action="store_true",
                        help="CP decomposition instead of VM (network_cp.py)")
    parser.add_argument("--resolution0", type=int, default=128)
    parser.add_argument("--resolution1", type=int, default=300)
    parser.add_argument(
        "--upsample_model_steps", type=int, nargs="*",
        default=[2000, 3000, 4000, 5500, 7000],
    )
    parser.add_argument("--l1_reg_weight", type=float, default=1e-4)
    return parser


def main(argv=None):
    from flnerf_tpu.cli.bootstrap import bootstrap
    bootstrap()
    import jax.numpy as jnp

    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import NGPSampler, NGPTrainConfig, NGPTrainer

    args = make_tensorf_parser().parse_args(argv)
    if args.O:
        args.fp16 = True
        args.cuda_ray = True
        args.preload = True
    os.makedirs(args.workspace, exist_ok=True)

    images, poses, hwf, K, i_split = load_ngp_dataset(args)
    H, W, _ = hwf
    i_train, _, i_test = i_split

    compute_dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    reso = (args.resolution0,) * 3
    if args.cp:
        from flnerf_tpu.models.tensorf_variants import CPConfig, make_cp_field

        cfg = CPConfig(resolution=reso, bound=args.bound)
        init_fn, density_fn, rgb_fn = make_cp_field(cfg, compute_dtype)
    else:
        from flnerf_tpu.models.tensorf import TensoRFConfig, make_tensorf_field

        cfg = TensoRFConfig(resolution=reso, bound=args.bound)
        init_fn, density_fn, rgb_fn = make_tensorf_field(cfg, compute_dtype)

    rcfg = NGPRenderConfig(
        n_candidates=args.n_candidates, n_keep=args.n_keep,
        grid_size=args.grid_size, bound=args.bound, min_near=args.min_near,
    )
    tcfg = NGPTrainConfig(
        max_steps=args.iters, batch_rays=args.num_rays, lr=args.lr,
        steps_per_chunk=args.steps_per_chunk,
        use_error_map=args.error_map, seed=args.seed,
    )
    trainer = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)

    if args.gui:
        # NeRFGUI over the TensoRF field (main_tensoRF.py --gui): the
        # shared budgeted train/preview loop; no upsample schedule in GUI
        # mode (the reference GUI path skips it too)
        from flnerf_tpu.cli.main_nerf import run_gui

        sampler = NGPSampler(images[i_train], poses[i_train], K, tcfg,
                             seed=args.seed)
        return run_gui(args, trainer, sampler)

    if not args.test:
        sampler = NGPSampler(images[i_train], poses[i_train], K, tcfg,
                             seed=args.seed)
        t0 = _time.time()
        # upsample schedule (main_tensoRF.py:132: log-spaced voxel counts;
        # tensoRF/utils.py:112-128: shrink -> adaptive reso -> upsample ->
        # optimizer reset at each boundary).  CP keeps a plain fit (the
        # reference's CP main uses the same trainer but our variant has no
        # shrink — aabb shrink is a VM-model feature, network.py:283).
        ups = sorted(s for s in (args.upsample_model_steps or [])
                     if 0 < s < args.iters)
        if ups and not args.cp:
            import numpy as _np

            from flnerf_tpu.models.tensorf import (
                shrink_tensorf, upsample_tensorf,
            )

            n_voxels = _np.round(_np.exp(_np.linspace(
                _np.log(args.resolution0 ** 3),
                _np.log(args.resolution1 ** 3), len(ups) + 1)))[1:]
            done = 0
            for si, step in enumerate(ups + [args.iters]):
                trainer.fit(sampler, n_steps=step - done)
                done = step
                if step >= args.iters:
                    break
                params = trainer.state.params
                params, cfg = shrink_tensorf(
                    params, cfg, _np.asarray(trainer.occ.density),
                    float(trainer.occ.mean_density), rcfg.bound,
                    rcfg.density_thresh)
                aabb = _np.asarray(cfg.aabb if cfg.aabb is not None else
                                   (-args.bound,) * 3 + (args.bound,) * 3)
                vox = _np.cbrt(_np.prod(aabb[3:] - aabb[:3]) / n_voxels[si])
                reso = _np.maximum(
                    ((aabb[3:] - aabb[:3]) / vox).astype(_np.int64), 8)
                params, cfg = upsample_tensorf(params, cfg, tuple(reso))
                print(f"[INFO] step {step}: shrink+upsample -> "
                      f"reso {cfg.resolution} aabb {cfg.aabb}")
                _, density_fn, rgb_fn = make_tensorf_field(cfg, compute_dtype)
                trainer.replace_field(density_fn, rgb_fn, params)
        else:
            trainer.fit(sampler)
        with open(os.path.join(args.workspace, "time_mins.txt"), "w") as f:
            f.write(f"{(_time.time()-t0)/60:.3f}\n")
        trainer.save_checkpoint(args.workspace)

    psnr, ssim = trainer.eval_images(
        poses[i_test], images[i_test], H, W, K, chunk=args.max_ray_batch
    )
    print(f"test PSNR {psnr:.3f} SSIM {ssim:.4f}")
    with open(os.path.join(args.workspace, "results.txt"), "w") as f:
        f.write(f"mean PSNR: {psnr}\nmean SSIM: {ssim}\n")
    return {"psnr": psnr, "ssim": ssim}


if __name__ == "__main__":
    main()
