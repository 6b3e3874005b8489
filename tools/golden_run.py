"""Golden-run readiness (VERDICT r3 #8): the parity claim as one command
the day a real dataset exists.

No datasets ship in this environment, so each golden run is GATED on its
dataset directory: when absent, the run reports ``skipped`` with the
exact download layout it expects; when present, it trains the backend at
the reference's own config and asserts test-split PSNR lands inside the
expected band derived from published numbers (BASELINE.md).

Bands (mid = published number, width = tolerance for scene/eval-protocol
drift):
  * lego / nerf     — nerf-pytorch 100K iters PSNR ~32.5 (the reference's
    base repo; nerf-ours/README.md:49 gives only wall-clock, the PSNR is
    the nerf-pytorch repo's published lego number).  Band [30.5, inf).
  * lego / ngp      — torch-ngp -O 30K steps PSNR 34.15
    (ngp-ours/readme.md:211).  Band [33.0, inf).
  * lego / tensorf  — torch-ngp TensoRF -O 30K steps PSNR 35.05
    (ngp-ours/readme.md:216).  Band [33.5, inf).
  * lego / plenoxels— svox2 paper syn PSNR ~34.1 (plenoxels paper tbl 1
    lego 34.10).  Band [32.5, inf).
  * truck / nerfpp  — nerf++ paper T&T Truck PSNR 22.77 (paper tbl; the
    reference repo publishes only wall-clock).  Band [21.5, inf).

The fixture_* rows (VERDICT r4 #7) EXECUTE unconditionally: they
generate the procedural scene in the real dataset layouts (blender /
nerf++ splits) and drive the same CLIs end-to-end — loader, trainer,
test-split eval — with a PSNR band pinned to the measured-at-commit
value minus margin.  So GOLDEN_runs.json always carries at least one
non-skipped, banded row per backend, and the real-data rows stay gated
on their datasets.

Usage:
  python tools/golden_run.py                 # gated rows + fixture rows
  python tools/golden_run.py --scene fixture_ngp
  python tools/golden_run.py --scene lego_ngp --steps 30000
Writes GOLDEN_runs.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEGO_DIR = "data/nerf_synthetic/lego"
TAT_DIR = "data/tanks_and_temples/tat_training_Truck"
FIX_DIR = "data/fixture_blender96"        # generated on demand (gitignored)
FIX_NPP_DIR = "data/fixture_nerfpp"       # parent of scene dir "fixture"

_FIX_SRC = ("procedural blender-layout fixture (96px, 12 train views, "
            "data/synthetic.py write_blender_fixture); band = "
            "measured-at-commit minus ~2 dB pipeline margin — it pins "
            "the REAL CLI end-to-end, not paper parity")

EXPECTED = {
    "lego_nerf": {"min_psnr": 30.5, "published": 32.5,
                  "source": "nerf-pytorch lego (nerf-ours base repo)"},
    "lego_ngp": {"min_psnr": 33.0, "published": 34.15,
                 "source": "ngp-ours/readme.md:211"},
    "lego_tensorf": {"min_psnr": 33.5, "published": 35.05,
                     "source": "ngp-ours/readme.md:216"},
    "lego_plenoxels": {"min_psnr": 32.5, "published": 34.1,
                       "source": "plenoxels paper table 1"},
    "truck_nerfpp": {"min_psnr": 21.5, "published": 22.77,
                     "source": "nerf++ paper (T&T Truck)"},
    # executing fixture rows (VERDICT r4 #7): same CLIs, generated data
    "fixture_ngp": {"min_psnr": 26.0, "published": None,
                    "source": _FIX_SRC},
    "fixture_tensorf": {"min_psnr": 24.0, "published": None,
                        "source": _FIX_SRC},
    "fixture_nerf": {"min_psnr": 22.0, "published": None,
                     "source": _FIX_SRC},
    "fixture_plenoxels": {"min_psnr": 26.0, "published": None,
                          "source": _FIX_SRC},
    "fixture_nerfpp": {"min_psnr": 22.0, "published": None,
                       "source": _FIX_SRC + "; nerf++ split layout via "
                       "data/nerfpp_dataset.py write_nerfpp_fixture"},
}


def _ensure_fixture():
    from flnerf_tpu.data.synthetic import write_blender_fixture
    marker = os.path.join(FIX_DIR, ".fixture_v2")  # v2: interleaved splits
    if not os.path.isfile(marker):
        write_blender_fixture(FIX_DIR, H=96, n_train=12, n_val=2, n_test=2)
        open(marker, "w").write("interleaved splits\n")
    return FIX_DIR


def _ensure_npp_fixture():
    from flnerf_tpu.data.nerfpp_dataset import write_nerfpp_fixture
    scene = os.path.join(FIX_NPP_DIR, "fixture")
    if not os.path.isdir(os.path.join(scene, "train", "rgb")):
        write_nerfpp_fixture(scene, H=96, n_train=12, n_test=2)
    return FIX_NPP_DIR


def _gate(path, layout):
    if os.path.isdir(path):
        return None
    return {"skipped": True, "reason": f"dataset missing at {path}",
            "expected_layout": layout}


def _psnr_of(res):
    if not isinstance(res, dict) or "psnr" not in res:
        return {"error": f"CLI returned no psnr: {res!r}"}
    return {"psnr": float(res["psnr"]),
            "ssim": float(res.get("ssim", float("nan")))}


def run_lego_ngp(steps):
    gate = _gate(LEGO_DIR, "nerf_synthetic blender layout: "
                 "transforms_{train,val,test}.json + {train,val,test}/*.png")
    if gate:
        return gate
    from flnerf_tpu.cli.main_nerf import main
    return _psnr_of(main([
        LEGO_DIR, "-O", "--workspace", "logs/golden_lego_ngp",
        "--iters", str(steps), "--bound", "1.0", "--scale", "0.8"]))


def run_lego_tensorf(steps):
    gate = _gate(LEGO_DIR, "nerf_synthetic blender layout")
    if gate:
        return gate
    from flnerf_tpu.cli.main_tensorf import main
    return _psnr_of(main([
        LEGO_DIR, "-O", "--workspace", "logs/golden_lego_tensorf",
        "--iters", str(steps), "--bound", "1.0", "--scale", "0.8"]))


def run_lego_nerf(_steps):
    gate = _gate(LEGO_DIR, "nerf_synthetic blender layout")
    if gate:
        return gate
    from flnerf_tpu.cli.run_nerf import main
    return _psnr_of(main(["--config", "configs/lego.txt",
                          "--datadir", LEGO_DIR]))


def run_lego_plenoxels(_steps):
    gate = _gate(LEGO_DIR, "nerf_synthetic blender layout")
    if gate:
        return gate
    from flnerf_tpu.cli.opt import main
    return _psnr_of(main([LEGO_DIR, "-t", "logs/golden_lego_plenoxels",
                          "-c", "configs/syn.json"]))


def run_truck_nerfpp(_steps):
    gate = _gate(TAT_DIR, "nerf++ tanks_and_temples layout: "
                 "{train,test}/{rgb,pose,intrinsics}")
    if gate:
        return gate
    from flnerf_tpu.cli.ddp_train_nerf import main
    return _psnr_of(main(["--config", "configs/tat_training_truck.txt"]))


def run_fixture_ngp(steps):
    from flnerf_tpu.cli.main_nerf import main
    return _psnr_of(main([
        _ensure_fixture(), "-O", "--workspace", "logs/golden_fix_ngp",
        "--iters", str(min(steps, 1536)), "--bound", "1.5",
        "--scale", "0.8", "--dt_gamma", "0"]))


def run_fixture_tensorf(steps):
    from flnerf_tpu.cli.main_tensorf import main
    return _psnr_of(main([
        _ensure_fixture(), "-O", "--workspace", "logs/golden_fix_tensorf",
        "--iters", str(min(steps, 1536)), "--bound", "1.5",
        "--scale", "0.8", "--dt_gamma", "0"]))


def run_fixture_nerf(_steps):
    from flnerf_tpu.cli.run_nerf import main
    return _psnr_of(main([
        "--expname", "golden_fix_nerf", "--basedir", "logs",
        "--datadir", _ensure_fixture(), "--dataset_type", "blender",
        "--white_bkgd", "--use_viewdirs", "--N_importance", "128",
        "--N_rand", "1920", "--precrop_iters", "500",
        "--n_epoch", "8", "--init_level", "2", "--subdivide_every", "3",
        "--testskip", "1", "--no_reload"]))


def run_fixture_plenoxels(_steps):
    from flnerf_tpu.cli.opt import main
    return _psnr_of(main([
        _ensure_fixture(), "-t", "logs/golden_fix_plx",
        "--reso", "[[128, 128, 128]]", "--n_epochs", "4",
        "--lr_sigma_delay_steps", "0", "--tune_nosave"]))


def run_fixture_nerfpp(_steps):
    from flnerf_tpu.cli.ddp_train_nerf import main
    return _psnr_of(main([
        "--datadir", _ensure_npp_fixture(), "--scene", "fixture",
        "--expname", "golden_fix_npp", "--basedir", "logs",
        "--use_viewdirs", "--n_epoch", "3", "--testskip", "1",
        "--no_reload"]))


RUNS = {
    "lego_nerf": run_lego_nerf,
    "lego_ngp": run_lego_ngp,
    "lego_tensorf": run_lego_tensorf,
    "lego_plenoxels": run_lego_plenoxels,
    "truck_nerfpp": run_truck_nerfpp,
    "fixture_ngp": run_fixture_ngp,
    "fixture_tensorf": run_fixture_tensorf,
    "fixture_nerf": run_fixture_nerf,
    "fixture_plenoxels": run_fixture_plenoxels,
    "fixture_nerfpp": run_fixture_nerfpp,
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", choices=sorted(RUNS), default=None)
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--out", default="GOLDEN_runs.json")
    a = p.parse_args(argv)

    from flnerf_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache()

    out = {}
    ok = True
    for name, fn in RUNS.items():
        if a.scene and name != a.scene:
            continue
        t0 = time.time()
        try:
            res = fn(a.steps)
        except Exception as e:  # a crash is a FAILED golden run, not a skip
            res = {"error": str(e)[:300]}
            ok = False
        res["wall_s"] = round(time.time() - t0, 1)
        res["expected"] = EXPECTED[name]
        if "psnr" in res:
            res["pass"] = bool(res["psnr"] >= EXPECTED[name]["min_psnr"])
            ok = ok and res["pass"]
        out[name] = res
        print(name, json.dumps(res), flush=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
