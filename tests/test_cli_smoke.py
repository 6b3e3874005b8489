"""End-surface smoke tests for the CLIs the verify doc drives manually.

Each runs a tiny synthetic configuration through the REAL argv entry
point and asserts the artifacts the reference drivers leave behind.
"""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_opt_cli_smoke(tmp_path):
    """plenoxels opt.py driver: 1 epoch on the synthetic scene -> args.json
    + final npz checkpoint in the reference layout."""
    from flnerf_tpu.cli.opt import main as opt_main

    opt_main([
        "synthetic", "-t", str(tmp_path), "--n_epochs", "1",
        "--reso", "[[32, 32, 32]]", "--batch_size", "256",
        "--steps_per_chunk", "2", "--init_level", "1",
        "--lr_sigma_delay_steps", "0",
    ])
    assert os.path.exists(tmp_path / "args.json")
    import glob
    npzs = glob.glob(str(tmp_path) + "/*.npz")
    assert npzs, os.listdir(tmp_path)


@pytest.mark.slow
def test_ddp_train_nerf_cli_smoke(tmp_path):
    """nerf++ ddp_train_nerf driver on the synthetic nerf++ scene ->
    args.txt, tree pkls, results.txt."""
    from flnerf_tpu.cli.ddp_train_nerf import main as ddp_main

    ddp_main([
        "--datadir", "synthetic", "--scene", "s", "--expname", "smoke",
        "--basedir", str(tmp_path), "--n_epoch", "1",
        "--batch_size", "256", "--steps_per_chunk", "2",
        "--init_level", "1", "--cascade_samples", "8,8",
        "--netdepth", "2", "--netwidth", "32",
    ])
    run_dir = tmp_path / "smoke"
    assert os.path.exists(run_dir / "args.txt")
    files = os.listdir(run_dir)
    assert any(f.startswith("treeDivide_") for f in files), files


@pytest.mark.slow
def test_main_dnerf_cli_smoke(tmp_path):
    """D-NeRF driver (basis variant) on the synthetic scene."""
    from flnerf_tpu.cli.main_dnerf import main as dnerf_main

    dnerf_main([
        "synthetic", "--workspace", str(tmp_path), "--synth_h", "24",
        "--iters", "4", "--steps_per_chunk", "2", "--num_rays", "64",
        "--n_candidates", "16", "--n_keep", "8", "--grid_size", "16",
        "--variant", "basis", "--bound", "1.5",
    ])
    assert os.path.exists(tmp_path / "results.txt")


def test_calc_metrics_cli(tmp_path, capsys):
    """render-vs-gt metric script over two image dirs."""
    import imageio.v2 as imageio

    from flnerf_tpu.cli.calc_metrics import main as metrics_main

    rd, gd = tmp_path / "render", tmp_path / "gt"
    os.makedirs(rd); os.makedirs(gd)
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        noisy = np.clip(img.astype(np.int32)
                        + rng.integers(-8, 8, img.shape), 0, 255)
        imageio.imwrite(str(gd / f"{i:03d}.png"), img)
        imageio.imwrite(str(rd / f"{i:03d}.png"), noisy.astype(np.uint8))
    metrics_main([str(rd), str(gd)])
    out = capsys.readouterr().out
    assert "PSNR" in out or "psnr" in out


def test_inspect_cameras_cli(tmp_path):
    """epipolar + frustum CLI over a generated cam dict."""
    import imageio.v2 as imageio

    from flnerf_tpu.cli.inspect_cameras import main as inspect_main

    rng = np.random.default_rng(1)
    cams = {}
    for i, eye in enumerate(([0, 0, 0], [0.6, 0.1, 0.1])):
        K = np.eye(4); K[0, 0] = K[1, 1] = 40.0
        K[0, 2], K[1, 2] = 24.0, 16.0
        W2C = np.eye(4); W2C[:3, 3] = -np.asarray(eye, np.float64)
        cams[f"im_{i}.png"] = {"K": K.reshape(-1).tolist(),
                               "W2C": W2C.reshape(-1).tolist(),
                               "img_size": [48, 32]}
        imageio.imwrite(str(tmp_path / f"im_{i}.png"),
                        (rng.random((32, 48)) * 255).astype(np.uint8))
    cd = tmp_path / "cams.json"
    cd.write_text(json.dumps(cams))

    inspect_main(["frustums", "--cam_dict", str(cd),
                  "--out", str(tmp_path / "fr.png")])
    assert os.path.getsize(tmp_path / "fr.png") > 0
    inspect_main(["epipolar", "--cam_dict", str(cd),
                  "--img_dir", str(tmp_path),
                  "--img1", "im_0.png", "--img2", "im_1.png",
                  "--out", str(tmp_path / "epi.png"), "--n_points", "6"])
    assert os.path.getsize(tmp_path / "epi.png") > 0
