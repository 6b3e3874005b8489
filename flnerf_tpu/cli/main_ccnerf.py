"""CCNeRF training/composition CLI (ngp-ours/main_CCNeRF.py analog).

Two modes, like the reference (main_CCNeRF.py:170-228):
  * train (default): rank-residual training — each step supervises a random
    truncation level so one model serves K compression levels; afterwards
    every level is evaluated and checkpointed (the per-level "compress"
    sweep at :217-227).
  * --compose obj1.pkl obj2.pkl ...: load finalized objects (with optional
    per-object --offsets x,y,z), build the composed scene field
    (network_cc.py:296-334) and render/evaluate it.

Usage:
  python -m flnerf_tpu.cli.main_ccnerf synthetic -O --iters 256
  python -m flnerf_tpu.cli.main_ccnerf synthetic --compose a.pkl b.pkl \
      --offsets 0,0,0 0.5,0,0
"""

from __future__ import annotations

import os
import pickle
import time as _time

import numpy as np

from flnerf_tpu.cli.main_nerf import load_ngp_dataset, make_parser


def make_ccnerf_parser():
    parser = make_parser()
    parser.add_argument("--rank_vec_density", type=int, nargs="*",
                        default=[8, 16, 24])
    parser.add_argument("--rank_mat_density", type=int, nargs="*",
                        default=[2, 4, 6])
    parser.add_argument("--rank_vec", type=int, nargs="*", default=[8, 16, 24])
    parser.add_argument("--rank_mat", type=int, nargs="*", default=[2, 4, 6])
    parser.add_argument("--resolution0", type=int, default=128)
    parser.add_argument("--compose", type=str, nargs="*", default=None,
                        help="object .pkl checkpoints to compose")
    parser.add_argument("--offsets", type=str, nargs="*", default=None,
                        help="per-object world offsets 'x,y,z'")
    parser.add_argument("--scales", type=float, nargs="*", default=None)
    return parser


def _save_object(path, params, cfg):
    import jax

    with open(path, "wb") as f:
        pickle.dump(
            {"params": jax.tree_util.tree_map(np.asarray, params),
             "cfg": cfg._asdict()},
            f,
        )


def load_object(path):
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.tensorf_variants import CCNeRFConfig

    with open(path, "rb") as f:
        d = pickle.load(f)
    d["params"] = jax.tree_util.tree_map(jnp.asarray, d["params"])
    cfg = d["cfg"]
    for k in ("resolution", "rank_vec_density", "rank_mat_density",
              "rank_vec", "rank_mat"):
        cfg[k] = tuple(cfg[k])
    return d["params"], CCNeRFConfig(**cfg)


def main(argv=None):
    from flnerf_tpu.cli.bootstrap import bootstrap
    bootstrap()
    import jax
    import jax.numpy as jnp

    from flnerf_tpu.models.tensorf_variants import (
        CCNeRFConfig,
        ComposedObject,
        compose_ccnerf_fields,
        make_ccnerf_field,
    )
    from flnerf_tpu.render.ngp import NGPRenderConfig, init_occupancy
    from flnerf_tpu.train.ngp_trainer import NGPSampler, NGPTrainConfig, NGPTrainer

    args = make_ccnerf_parser().parse_args(argv)
    if args.O:
        args.fp16 = True
        args.cuda_ray = True
        args.preload = True
    os.makedirs(args.workspace, exist_ok=True)

    images, poses, hwf, K, i_split = load_ngp_dataset(args)
    H, W, _ = hwf
    i_train, _, i_test = i_split
    compute_dtype = jnp.bfloat16 if args.fp16 else jnp.float32
    rcfg = NGPRenderConfig(
        n_candidates=args.n_candidates, n_keep=args.n_keep,
        grid_size=args.grid_size, bound=args.bound, min_near=args.min_near,
    )

    # ---------------- compose mode ----------------
    if args.compose:
        objects = []
        for i, path in enumerate(args.compose):
            params, ocfg = load_object(path)
            off = None
            if args.offsets and i < len(args.offsets):
                off = np.asarray(
                    [float(v) for v in args.offsets[i].split(",")], np.float32)
            sc = args.scales[i] if args.scales and i < len(args.scales) else 1.0
            objects.append(ComposedObject(params, ocfg, None, sc, off))
        density_fn, rgb_fn = compose_ccnerf_fields(objects, compute_dtype)

        from flnerf_tpu.render.ngp import ngp_render_image, update_occupancy

        occ = init_occupancy(rcfg)
        for _ in range(4):  # bake the composed density into the grid
            occ = update_occupancy(occ, {}, density_fn, jax.random.PRNGKey(0), rcfg)
        psnrs = []
        for i in i_test:
            rgb, _ = ngp_render_image(
                {}, density_fn, rgb_fn, occ, rcfg, H, W, K, poses[i][:3, :4],
                chunk=args.max_ray_batch,
            )
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(args.workspace, f"compose_{i:03d}.png"),
                (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
            )
            mse = float(np.mean((rgb - images[i][..., :3]) ** 2))
            psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        print(f"composed scene: {len(args.compose)} objects, "
              f"PSNR vs frames {np.mean(psnrs):.2f}")
        return {"psnr": float(np.mean(psnrs)), "n_objects": len(args.compose)}

    # ---------------- rank-residual train mode ----------------
    cfg = CCNeRFConfig(
        resolution=(args.resolution0,) * 3,
        rank_vec_density=tuple(args.rank_vec_density),
        rank_mat_density=tuple(args.rank_mat_density),
        rank_vec=tuple(args.rank_vec),
        rank_mat=tuple(args.rank_mat),
        bound=args.bound,
    )
    tcfg = NGPTrainConfig(
        max_steps=args.iters, batch_rays=args.num_rays, lr=args.lr,
        steps_per_chunk=args.steps_per_chunk, seed=args.seed,
    )
    # rank-residual training: cycle the supervised truncation level across
    # chunks (reference draws a random level per step, network_cc.py:284)
    results = {}
    trainer = None
    fields = [make_ccnerf_field(cfg, level=k + 1, compute_dtype=compute_dtype)
              for k in range(cfg.K)]
    init_fn = fields[-1][0]
    sampler = NGPSampler(images[i_train], poses[i_train], K, tcfg,
                         seed=args.seed)
    trainer = NGPTrainer(init_fn, fields[-1][1], fields[-1][2], rcfg, tcfg)
    steps_per_level = max(args.iters // (cfg.K * 4), tcfg.steps_per_chunk)

    if args.gui:
        # NeRFGUI over CCNeRF (main_CCNeRF.py:160-161).  The reference's
        # network draws a random supervised level per step INSIDE forward
        # (network_cc.py:284); here the level cycles per GUI frame (the
        # chunk-fn memo makes swaps free after the first K compiles) and
        # the preview always renders the full-K field.
        from flnerf_tpu.render.interactive import (
            InteractiveSession, run_dearpygui,
        )

        sess = InteractiveSession(
            trainer, sampler, W=args.W, H=args.H, radius=args.radius,
            fovy=args.fovy, max_spp=args.max_spp)
        sess.training = not args.test
        li = cfg.K - 1
        try:
            run_dearpygui(sess)
        except ImportError:
            if args.test:
                for _ in range(4):
                    sess.render_frame()
            else:
                while sess.step < args.iters:
                    trainer.density_fn, trainer.rgb_fn = \
                        fields[li][1], fields[li][2]
                    trainer._chunk_fn = trainer._make_chunk_fn()
                    sess.train_frame()
                    trainer.density_fn, trainer.rgb_fn = \
                        fields[-1][1], fields[-1][2]
                    sess.render_frame()
                    li = (li - 1) % cfg.K
                _save_object(os.path.join(args.workspace, "object.pkl"),
                             trainer.state.params, cfg)
        return {"step": sess.step, "spp": sess.spp}

    if not args.test:
        t0 = _time.time()
        done = 0
        li = cfg.K - 1
        while done < args.iters:
            # swap the supervised level's field fns in-place; cfg.max_steps
            # stays the TOTAL so the lr decay spans the whole run
            trainer.density_fn, trainer.rgb_fn = fields[li][1], fields[li][2]
            trainer._chunk_fn = trainer._make_chunk_fn()
            trainer.fit(sampler, verbose=False, n_steps=steps_per_level)
            done += steps_per_level
            li = (li - 1) % cfg.K
        with open(os.path.join(args.workspace, "time_mins.txt"), "w") as f:
            f.write(f"{(_time.time()-t0)/60:.3f}\n")
        _save_object(os.path.join(args.workspace, "object.pkl"),
                     trainer.state.params, cfg)

    # per-level evaluation sweep (the compress loop, main_CCNeRF.py:217-227)
    for k in range(cfg.K, 0, -1):
        trainer.density_fn, trainer.rgb_fn = fields[k - 1][1], fields[k - 1][2]
        psnr, ssim = trainer.eval_images(
            poses[i_test], images[i_test], H, W, K, chunk=args.max_ray_batch)
        name = (f"{cfg.rank_vec_density[k-1]}_{cfg.rank_mat_density[k-1]}-"
                f"{cfg.rank_vec[k-1]}_{cfg.rank_mat[k-1]}")
        print(f"level {k} ({name}): PSNR {psnr:.3f} SSIM {ssim:.4f}")
        results[name] = psnr
    with open(os.path.join(args.workspace, "results.txt"), "w") as f:
        for name, p in results.items():
            f.write(f"{name}: PSNR {p}\n")
    return results


if __name__ == "__main__":
    main()
