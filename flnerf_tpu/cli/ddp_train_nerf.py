"""NeRF++ quadtree training CLI, flag-compatible with the reference.

Parity target: nerf++-ours/ddp_train_nerf.py:428-498 (configargparse flags)
and the train flow at :187-324 (load splits at resolution_level=2 ->
create cascade nets -> quadtree manager with sharpness-prob sampling ->
epoch loop with mean-loss subdivision -> model_{epoch:04d}.pth + tree pkl).

Usage:
  python -m flnerf_tpu.cli.ddp_train_nerf --config configs/tat_training_truck.txt
  python -m flnerf_tpu.cli.ddp_train_nerf --datadir synthetic --scene any --expname smoke
"""

from __future__ import annotations

import os
import pickle
import time

import numpy as np


def config_parser():
    from flnerf_tpu.core.config import ConfigArgumentParser

    parser = ConfigArgumentParser()
    parser.add_argument("--config", is_config_file=True)
    parser.add_argument("--expname", type=str)
    parser.add_argument("--basedir", type=str, default="./logs/")
    parser.add_argument("--datadir", type=str, default=None)
    parser.add_argument("--scene", type=str, default=None)
    parser.add_argument("--testskip", type=int, default=8)
    parser.add_argument("--netdepth", type=int, default=8)
    parser.add_argument("--netwidth", type=int, default=256)
    parser.add_argument("--use_viewdirs", action="store_true")
    parser.add_argument("--init_level", type=int, default=3)
    parser.add_argument("--subdivide_every", type=int, default=1)
    parser.add_argument("--subdivide_thres", type=float, default=0.015)
    parser.add_argument("--rays_downscale", type=int, default=1)
    parser.add_argument("--randSamp_perc", type=float, default=0.5)
    parser.add_argument("--dset_name", type=str, default="Truck")
    parser.add_argument("--no_reload", action="store_true")
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--N_rand", type=int, default=32 * 32 * 2)
    parser.add_argument("--chunk_size", type=int, default=1024 * 8)
    parser.add_argument("--batch_size", type=int, default=2880)
    parser.add_argument("--N_iters", type=int, default=250001)
    parser.add_argument("--n_epoch", type=int, default=6)
    parser.add_argument("--render_splits", type=str, default="test")
    parser.add_argument("--cascade_level", type=int, default=2)
    parser.add_argument("--cascade_samples", type=str, default="64,64")
    parser.add_argument("--world_size", type=int, default=-1)
    parser.add_argument("--optim_autoexpo", action="store_true")
    parser.add_argument("--lambda_autoexpo", type=float, default=1.0)
    parser.add_argument("--lrate", type=float, default=5e-4)
    parser.add_argument("--lrate_decay_factor", type=float, default=0.1)
    parser.add_argument("--lrate_decay_steps", type=int, default=5000)
    parser.add_argument("--det", action="store_true")
    parser.add_argument("--max_freq_log2", type=int, default=10)
    parser.add_argument("--max_freq_log2_viewdirs", type=int, default=4)
    parser.add_argument("--load_min_depth", action="store_true")
    parser.add_argument("--i_print", type=int, default=100)
    parser.add_argument("--i_img", type=int, default=500)
    parser.add_argument("--i_weights", type=int, default=10000)
    # TPU extras
    parser.add_argument("--resolution_level", type=int, default=2,
                        help="training downsample (data_loader_split.py:102)")
    parser.add_argument("--steps_per_chunk", type=int, default=16)
    parser.add_argument("--compute_dtype", type=str, default="bfloat16")
    parser.add_argument("--seed", type=int, default=777)
    return parser


def main(argv=None):
    from flnerf_tpu.cli.bootstrap import bootstrap
    bootstrap()
    import jax

    from flnerf_tpu.core.config import save_args
    from flnerf_tpu.models.nerfpp import NerfPPConfig
    from flnerf_tpu.rays.quadtree import QuadTreeForest, RayBudgeter
    from flnerf_tpu.train.nerfpp_trainer import NerfPPTrainConfig, NerfPPTrainer

    args = config_parser().parse_args(argv)
    run_dir = os.path.join(args.basedir, args.expname)
    os.makedirs(run_dir, exist_ok=True)
    save_args(args, os.path.join(run_dir, "args.txt"))

    if args.datadir == "synthetic":
        from flnerf_tpu.data.nerfpp_dataset import make_synthetic_nerfpp_scene

        train, test = make_synthetic_nerfpp_scene(n_train=6, n_test=2, H=40, W=40)
    else:
        from flnerf_tpu.data.nerfpp_dataset import load_nerfpp_split

        train = load_nerfpp_split(
            args.datadir, args.scene, "train", resolution_level=args.resolution_level
        )
        test = load_nerfpp_split(
            args.datadir, args.scene, "test", skip=args.testskip,
            resolution_level=args.resolution_level,
        )

    budgeter = RayBudgeter(
        train["images"], train["origins"], train["dirs"],
        init_level=args.init_level, seed=args.seed,
    )

    cascade_samples = tuple(int(x) for x in args.cascade_samples.split(","))
    mcfg = NerfPPConfig(
        netdepth=args.netdepth, netwidth=args.netwidth,
        max_freq_log2=args.max_freq_log2,
        max_freq_log2_viewdirs=args.max_freq_log2_viewdirs,
        cascade_samples=cascade_samples[: args.cascade_level],
        optim_autoexpo=args.optim_autoexpo,
        lambda_autoexpo=args.lambda_autoexpo,
    )
    tcfg = NerfPPTrainConfig(
        n_epoch=args.n_epoch, batch_size=args.batch_size, lrate=args.lrate,
        lrate_decay_factor=args.lrate_decay_factor,
        lrate_decay_steps=args.lrate_decay_steps,
        subdivide_every=args.subdivide_every,
        subdivide_thres=args.subdivide_thres,
        rand_samp_perc=args.randSamp_perc,
        steps_per_chunk=args.steps_per_chunk,
        compute_dtype=args.compute_dtype,
        seed=args.seed,
    )
    # n_images sizes the per-image autoexpo table when --optim_autoexpo
    trainer = NerfPPTrainer(mcfg, tcfg,
                            n_images=train["images"].shape[0])

    def on_epoch_end(tr, epoch_id):
        # model_{epoch:04d}.pth naming parity (ddp_train_nerf.py:307-315);
        # payload is this framework's pytree (documented divergence)
        path = os.path.join(run_dir, f"model_{epoch_id:04d}.pth")
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "format": "flnerf_nerfpp_v1",
                    "epoch": epoch_id,
                    "global_iter": int(tr.state.global_iter),
                    "params": jax.tree_util.tree_map(np.asarray, tr.state.params),
                },
                f,
            )
        budgeter.forest.save(os.path.join(run_dir, f"treeDivide_{epoch_id:04d}.pkl"))

    t0 = time.time()
    trainer.fit(budgeter, on_epoch_end=on_epoch_end)
    print(f"train complete. time={time.time()-t0:.1f}s")

    psnr, ssim = trainer.eval_images(
        test["poses"], test["images"], test["H"], test["W"],
        test["intrinsics"][0], chunk=args.chunk_size,
    )
    print(f"test PSNR {psnr:.3f} SSIM {ssim:.4f}")
    with open(os.path.join(run_dir, "results.txt"), "w") as f:
        f.write(f"mean PSNR: {psnr}\nmean SSIM: {ssim}\n")
    return {"psnr": psnr, "ssim": ssim}


if __name__ == "__main__":
    main()
