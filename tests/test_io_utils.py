"""Argument-surface parity tests: every reference flag exists with the
reference's default (reference io_utils.py:17-64). The CLIs are e2e-tested
elsewhere; this pins the exact flag contract a reference user relies on."""
import pytest

from deep_kernel_transfer_tpu.io_utils import parse_args, parse_args_regression


def test_parse_args_train_defaults():
    p = parse_args("train", [])
    # shared surface (reference io_utils.py:19-26)
    assert (p.seed, p.dataset, p.model) == (0, "CUB", "Conv4")
    assert p.method == "baseline"
    assert (p.train_n_way, p.test_n_way, p.n_shot) == (5, 5, 5)
    assert p.train_aug is False
    # train-only (reference io_utils.py:29-34)
    assert (p.num_classes, p.save_freq) == (200, 50)
    assert (p.start_epoch, p.stop_epoch) == (0, -1)
    assert p.resume is False and p.warmup is False


def test_parse_args_save_features_and_test_defaults():
    p = parse_args("save_features", [])
    assert (p.split, p.save_iter) == ("novel", -1)
    p = parse_args("test", [])
    assert (p.split, p.save_iter) == ("novel", -1)
    assert p.adaptation is False
    assert p.repeat == 5  # reference io_utils.py:42
    with pytest.raises(ValueError):
        parse_args("unknown-script", [])


def test_parse_args_regression_defaults():
    p = parse_args_regression("train_regression", [])
    assert (p.seed, p.model, p.method, p.dataset) == (0, "Conv3", "DKT", "QMUL")
    assert p.spectral is False
    assert (p.start_epoch, p.stop_epoch) == (0, 100)
    assert p.resume is False
    p = parse_args_regression("test_regression", [])
    assert (p.n_support, p.n_test_epochs) == (5, 10)


def test_flag_overrides_parse():
    p = parse_args("test", ["--method=DKT", "--n_shot=1", "--train_aug",
                            "--adaptation", "--repeat=2", "--seed=7"])
    assert p.method == "DKT" and p.n_shot == 1 and p.seed == 7
    assert p.train_aug and p.adaptation and p.repeat == 2
