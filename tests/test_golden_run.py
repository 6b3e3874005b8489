"""Golden-run readiness (tools/golden_run.py): dataset gates report the
expected layout when data is absent, and the full pipeline actually runs
against a generated blender-layout fixture — so the day a real dataset
exists, the parity claim is one command that is known to work."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_blender_fixture(basedir, H=24, n_train=3, n_val=1, n_test=1):
    """Thin wrapper over the product fixture writer (data/synthetic.py
    write_blender_fixture — the same code the executing fixture_* golden
    rows use)."""
    from flnerf_tpu.data.synthetic import write_blender_fixture

    write_blender_fixture(basedir, H=H, n_train=n_train, n_val=n_val,
                          n_test=n_test)


def test_gates_report_layout(tmp_path, monkeypatch):
    from tools import golden_run

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(golden_run, "enable_compile_cache_ok", None,
                        raising=False)
    rc = golden_run.main(["--scene", "lego_ngp", "--out",
                          str(tmp_path / "g.json")])
    assert rc == 0
    out = json.loads((tmp_path / "g.json").read_text())
    assert out["lego_ngp"]["skipped"]
    assert "transforms_" in out["lego_ngp"]["expected_layout"]
    assert out["lego_ngp"]["expected"]["published"] == 34.15


@pytest.mark.slow
def test_golden_pipeline_runs_on_fixture(tmp_path, monkeypatch):
    """lego_ngp golden run end-to-end on a generated blender fixture:
    loader -> trainer -> test-split eval -> psnr/pass fields."""
    from tools import golden_run

    data = tmp_path / "data" / "nerf_synthetic" / "lego"
    make_blender_fixture(str(data))
    monkeypatch.chdir(tmp_path)
    golden_run.main(["--scene", "lego_ngp", "--steps", "64",
                     "--out", str(tmp_path / "g.json")])
    out = json.loads((tmp_path / "g.json").read_text())
    res = out["lego_ngp"]
    assert "psnr" in res, res
    assert np.isfinite(res["psnr"])
    assert "pass" in res  # band comparison ran (64 steps won't pass it)


def test_nerfpp_fixture_roundtrip(tmp_path):
    """write_nerfpp_fixture emits the exact {split}/{intrinsics,pose,rgb}
    layout load_nerfpp_split reads; images survive the png round trip."""
    from flnerf_tpu.data.nerfpp_dataset import (
        load_nerfpp_split, make_synthetic_nerfpp_scene, write_nerfpp_fixture,
    )

    scene = tmp_path / "npp" / "fixture"
    write_nerfpp_fixture(str(scene), H=24, n_train=2, n_test=1)
    d = load_nerfpp_split(str(tmp_path / "npp"), "fixture", "train")
    assert d["images"].shape == (2, 24, 24, 3)
    ref, _ = make_synthetic_nerfpp_scene(n_train=2, n_test=1, H=24, W=24)
    np.testing.assert_allclose(d["images"], np.clip(ref["images"], 0, 1),
                               atol=2.0 / 255)
    np.testing.assert_allclose(d["poses"], ref["poses"], atol=1e-5)
