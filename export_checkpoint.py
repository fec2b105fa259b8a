"""Export a trained checkpoint to the reference's torch format.

The reverse migration path: after training on TPU, write a
BayesWatch/deep-kernel-transfer-compatible `torch.save` file so the model
can be inspected/compared (or kept running) inside the reference tooling.
Counterpart of the transparent torch IMPORT in utils/torch_import.py;
layout contract: reference train.py:57-65 (classification),
DKT_regression.py:99-104 / feature_transfer_regression.py:82-83
(regression).

Usage (same experiment flags as test.py):
  python export_checkpoint.py --dataset=cross_char --model=Conv4S \
      --method=DKT [--save_iter=N] [--out=path.tar] [--num_classes=N]
Regression (same flags as test_regression.py; selected by --regression):
  python export_checkpoint.py --regression --dataset=QMUL --model=Conv3 \
      --method=DKT [--spectral] [--out=path.tar]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.io_utils import parse_args
from deep_kernel_transfer_tpu.utils.checkpoint import (
    load_params_checkpoint,
    resolve_checkpoint_file,
)
from deep_kernel_transfer_tpu.utils.torch_export import (
    export_method_checkpoint,
)


def _main_regression(rest, out):
    """--regression: the test_regression arg surface (QMUL/sines track)."""
    import os

    from deep_kernel_transfer_tpu.io_utils import parse_args_regression
    from train_regression import build_regression_method

    params_cli = parse_args_regression("test_regression", rest)
    model = build_regression_method(params_cli)
    example_x = jnp.zeros((19, 100, 100, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), example_x).params
    ckpt_dir = factory.regression_checkpoint_dir(params_cli)
    ckpt_file = os.path.join(ckpt_dir, "best_model.tar")
    if not os.path.isfile(ckpt_file):
        raise SystemExit(f"no checkpoint found at {ckpt_file}")
    method_name = ("DKT_regression" if params_cli.method == "DKT"
                   else params_cli.method)
    if params_cli.method == "DKT" and params_cli.spectral:
        method_name = "DKT_regression_spectral"
    params, epoch = load_params_checkpoint(
        ckpt_file, params, method_name=method_name, model=model,
        image_size=100)
    out = out or (ckpt_file[:-4] + ".torch.tar")
    export_method_checkpoint(out, method_name, model, params, 100,
                             epoch=epoch)
    print(f"exported {ckpt_file} (epoch {epoch}) -> {out}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = None
    num_classes = None
    regression = False
    rest = []
    for a in argv:  # --out/--num_classes/--regression are ours; the rest
        if a.startswith("--out="):  # is the test / test_regression surface
            out = a.split("=", 1)[1]
        elif a.startswith("--num_classes="):
            num_classes = int(a.split("=", 1)[1])
        elif a == "--regression":
            regression = True
        else:
            rest.append(a)
    if regression:
        return _main_regression(rest, out)
    params_cli = parse_args("test", rest)
    # the 'test' surface has no --num_classes, but baseline/++ need one to
    # rebuild the pretrain head shape (reference train.py num_classes)
    params_cli.num_classes = num_classes if num_classes is not None else 200

    image_size = factory.resolve_image_size(params_cli)
    factory.check_model_constraints(params_cli)  # omniglot => Conv4S rule
    n_support = params_cli.n_shot
    # checkpoint way-sized parameters follow TRAIN n_way (see test.py)
    model = factory.build_method(params_cli, params_cli.train_n_way, n_support)

    ckpt_dir = factory.checkpoint_dir(params_cli)
    ckpt_file = resolve_checkpoint_file(ckpt_dir, params_cli.save_iter)
    if ckpt_file is None:
        raise SystemExit(f"no checkpoint found in {ckpt_dir}")

    if params_cli.method in ("baseline", "baseline++"):
        example = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    else:
        n_query = 15  # reference test.py:142
        example = jnp.zeros((params_cli.train_n_way, n_support + n_query,
                             image_size, image_size, 3), jnp.float32)
    if hasattr(model, "init_params"):
        params = model.init_params(jax.random.PRNGKey(0), example)
    else:
        params = model.init(jax.random.PRNGKey(0), example).params
    # transparent npz/torch load (same loader as test.py) — exporting an
    # already-torch checkpoint just round-trips it through our layout
    params, epoch = load_params_checkpoint(
        ckpt_file, params, method_name=params_cli.method, model=model,
        image_size=image_size)

    out = out or (ckpt_file[:-4] if ckpt_file.endswith(".tar")
                  else ckpt_file) + ".torch.tar"
    export_method_checkpoint(out, params_cli.method, model, params,
                             image_size, epoch=epoch)
    print(f"exported {ckpt_file} (epoch {epoch}) -> {out}")


if __name__ == "__main__":
    main()
