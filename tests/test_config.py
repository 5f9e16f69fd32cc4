"""Config/flag-surface tests: reference CLI contract (SURVEY.md §2.2) and
artifact round-trips."""

import json
import os
import pickle

import pytest

from domain_transfer_gan_tpu.config import (
    TestOptions,
    TrainConfig,
    TrainOptions,
    load_train_config_from_expr_dir,
    parse_opt_file,
)

REFERENCE_DEFAULTS = {
    # flag -> default (reference options.py:20-85)
    "checkpoints_dir": "./checkpoints/",
    "input_nc": 3, "output_nc": 3, "grid_size": 256, "numpy_data": 1,
    "model": "aug_cycle_gan", "gpu_ids": "0",
    "sup_frac": 0.1, "lambda_sup_A": 0.1, "lambda_sup_B": 0.1,
    "batchSize": 32, "which_epoch": "latest", "epoch_count": 1,
    "niter": 25, "niter_decay": 25, "beta1": 0.5, "lr": 2e-4,
    "ngf": 32, "nef": 32, "ndf": 64, "nlatent": 16,
    "which_model_netD": "basic", "which_model_netG": "resnet",
    "norm": "instance", "max_gnorm": 500.0, "z_gan": 1, "enc_A_B": 1,
    "lambda_A": 1.0, "lambda_B": 1.0, "lambda_z_B": 0.025,
    "monitor_gnorm": True, "display_freq": 5000, "print_freq": 100,
    "save_epoch_freq": 5, "num_multi": 10, "eval_A_freq": 1,
    "eval_B_freq": 1,
}


def test_defaults_match_reference():
    cfg = TrainConfig()
    for k, v in REFERENCE_DEFAULTS.items():
        assert getattr(cfg, k) == v, f"{k}: {getattr(cfg, k)} != {v}"
    # boolean action flags default False
    for k in ("supervised", "continue_train", "use_dropout", "stoch_enc",
              "no_lsgan"):
        assert getattr(cfg, k) is False


def test_use_sigmoid_follows_no_lsgan():
    assert TrainConfig(no_lsgan=True).use_sigmoid is True
    assert TrainConfig().use_sigmoid is False


def test_parse_and_artifacts(tmp_path):
    opts = TrainOptions()
    cfg = opts.parse(sub_dirs=["vis_x"], args=[
        "--dataroot", "/data", "--name", "exp1",
        "--checkpoints_dir", str(tmp_path), "--ngf", "16", "--stoch_enc"])
    assert cfg.ngf == 16 and cfg.stoch_enc is True
    expr = os.path.join(str(tmp_path), "exp1")
    assert cfg.expr_dir == expr
    for f in ("opt.txt", "opt.json", "opt.pkl"):
        assert os.path.exists(os.path.join(expr, f))
    assert os.path.isdir(os.path.join(expr, "vis_x"))
    assert cfg.vis_x == os.path.join(expr, "vis_x")


def test_opt_roundtrip(tmp_path):
    cfg = TrainConfig(dataroot="/d", name="n", ngf=12, stoch_enc=True,
                      checkpoints_dir=str(tmp_path))
    cfg.finalize()
    back = load_train_config_from_expr_dir(cfg.expr_dir)
    assert back.ngf == 12 and back.stoch_enc is True
    assert back.model == cfg.model


def test_parse_opt_file_formats(tmp_path):
    d = {"a": 1, "b": True, "c": "s", "lr": 0.0002}
    pj = tmp_path / "opt.json"
    pj.write_text(json.dumps(d))
    assert parse_opt_file(str(pj)) == d
    pp = tmp_path / "opt.pkl"
    pp.write_bytes(pickle.dumps(d))
    assert parse_opt_file(str(pp)) == d
    pt = tmp_path / "opt.txt"
    pt.write_text("------------ Options -------------\n"
                  "a: 1\nb: True\nc: s\nlr: 0.0002\n"
                  "-------------- End ----------------\n")
    out = parse_opt_file(str(pt))
    assert out["a"] == 1 and out["b"] is True and out["lr"] == 0.0002


def test_test_options():
    t = TestOptions().parse(["--chk_path", "/c/latest", "--dataroot", "/d",
                             "--metric", "bpp"])
    assert t.metric == "bpp" and t.train_logvar == 1


def test_parse_opt_file_nonfinite_floats(tmp_path):
    """Reference-era opt.txt values like inf/-inf/nan must parse as floats
    (int(inf) raises OverflowError, int(nan) ValueError — neither means
    'keep the string')."""
    p = tmp_path / "opt.txt"
    p.write_text("------------ Options -------------\n"
                 "max_gnorm: inf\n"
                 "a: -inf\n"
                 "b: nan\n"
                 "lr: 2e-4\n"
                 "n: 50\n")
    out = parse_opt_file(str(p))
    assert out["max_gnorm"] == float("inf")
    assert out["a"] == float("-inf")
    assert out["b"] != out["b"] and isinstance(out["b"], float)
    assert out["lr"] == 2e-4 and isinstance(out["lr"], float)
    assert out["n"] == 50 and isinstance(out["n"], int)
