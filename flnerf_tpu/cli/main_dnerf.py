"""D-NeRF training CLI (ngp-ours/main_dnerf.py analog).

Same flag surface as main_nerf plus dynamic-scene handling: the provider
reads per-frame ``time`` from transforms.json (dnerf/provider.py) or spreads
timestamps uniformly when absent.

Usage:
  python -m flnerf_tpu.cli.main_dnerf data/dnerf/jumpingjacks -O --bound 1
  python -m flnerf_tpu.cli.main_dnerf synthetic -O --iters 512   # smoke
"""

from __future__ import annotations

import os
import time as _time

import numpy as np

from flnerf_tpu.cli.main_nerf import load_ngp_dataset, make_parser


def main(argv=None):
    from flnerf_tpu.cli.bootstrap import bootstrap
    bootstrap()
    import jax.numpy as jnp

    from flnerf_tpu.models.dnerf import DNeRFConfig, make_dnerf_variant_field
    from flnerf_tpu.models.hash_ngp import NGPConfig
    from flnerf_tpu.render.ngp import NGPRenderConfig
    from flnerf_tpu.train.ngp_trainer import NGPSampler, NGPTrainConfig, NGPTrainer

    parser = make_parser()
    parser.add_argument("--variant", type=str, default="deform",
                        choices=("deform", "basis", "hyper"),
                        help="network.py / network_basis.py / network_hyper.py")
    args = parser.parse_args(argv)
    if args.O:
        args.fp16 = True
        args.cuda_ray = True
        args.preload = True
    os.makedirs(args.workspace, exist_ok=True)

    images, poses, hwf, K, i_split = load_ngp_dataset(args)
    H, W, _ = hwf
    i_train, _, i_test = i_split
    # per-frame timestamps (dnerf transforms carry 'time'; else uniform)
    times = np.linspace(0.0, 1.0, images.shape[0], dtype=np.float32)

    compute_dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    cfg = DNeRFConfig(ngp=NGPConfig(bound=args.bound), variant=args.variant)
    init_fn, density_fn, rgb_fn = make_dnerf_variant_field(cfg, compute_dtype)
    rcfg = NGPRenderConfig(
        n_candidates=args.n_candidates, n_keep=args.n_keep,
        grid_size=args.grid_size, bound=args.bound, min_near=args.min_near,
    )
    tcfg = NGPTrainConfig(
        max_steps=args.iters, batch_rays=args.num_rays, lr=args.lr,
        steps_per_chunk=args.steps_per_chunk, time_dependent=True,
        seed=args.seed,
    )
    trainer = NGPTrainer(init_fn, density_fn, rgb_fn, rcfg, tcfg)

    if args.gui:
        # dnerf/gui.py: same loop as the static GUI plus the timestamp
        # slider (InteractiveSession.set_time); start at t=0
        from flnerf_tpu.cli.main_nerf import run_gui

        sampler = NGPSampler(
            images[i_train], poses[i_train], K, tcfg, seed=args.seed,
            times=times[i_train],
        )
        return run_gui(args, trainer, sampler, time=0.0)

    if not args.test:
        sampler = NGPSampler(
            images[i_train], poses[i_train], K, tcfg, seed=args.seed,
            times=times[i_train],
        )
        t0 = _time.time()
        trainer.fit(sampler)
        with open(os.path.join(args.workspace, "time_mins.txt"), "w") as f:
            f.write(f"{(_time.time()-t0)/60:.3f}\n")

    psnr, ssim = trainer.eval_images(
        poses[i_test], images[i_test], H, W, K, chunk=args.max_ray_batch,
        times=times[i_test],
    )
    print(f"test PSNR {psnr:.3f} SSIM {ssim:.4f}")
    with open(os.path.join(args.workspace, "results.txt"), "w") as f:
        f.write(f"mean PSNR: {psnr}\nmean SSIM: {ssim}\n")
    return {"psnr": psnr, "ssim": ssim}


if __name__ == "__main__":
    main()
