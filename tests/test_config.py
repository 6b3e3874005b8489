import pytest

from flnerf_tpu.core.config import ConfigArgumentParser, save_args


def _parser():
    p = ConfigArgumentParser()
    p.add_argument("--config", is_config_file=True)
    p.add_argument("--expname", type=str)
    p.add_argument("--n_epoch", type=int, default=12)
    p.add_argument("--subdivide_thres", type=float, default=0.015)
    p.add_argument("--white_bkgd", action="store_true")
    p.add_argument("--half_res", action="store_true")
    return p


def test_config_file_parsing(tmp_path):
    cfg = tmp_path / "lego.txt"
    cfg.write_text(
        "expname = lego_ours\n"
        "# a comment\n"
        "n_epoch = 18\n"
        "subdivide_thres = 0.001\n"
        "white_bkgd = True\n"
        "half_res = False\n"
        "unknown_key = whatever\n"
    )
    args = _parser().parse_args(["--config", str(cfg)])
    assert args.expname == "lego_ours"
    assert args.n_epoch == 18
    assert args.subdivide_thres == 0.001
    assert args.white_bkgd is True
    assert args.half_res is False


def test_cli_overrides_config(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("n_epoch = 18\nexpname = fromfile\n")
    args = _parser().parse_args(["--config", str(cfg), "--n_epoch", "3"])
    assert args.n_epoch == 3
    assert args.expname == "fromfile"


def test_no_config_file():
    args = _parser().parse_args(["--expname", "x"])
    assert args.expname == "x"
    assert args.n_epoch == 12


def test_save_args(tmp_path):
    args = _parser().parse_args(["--expname", "y"])
    path = str(tmp_path / "args.txt")
    save_args(args, path)
    text = open(path).read()
    assert "expname = y" in text
    assert "n_epoch = 12" in text
