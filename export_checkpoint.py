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
      --method=DKT [--save_iter=N] [--out=path.tar]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.io_utils import parse_args
from deep_kernel_transfer_tpu.utils.checkpoint import (
    get_assigned_file,
    get_best_file,
    load_params_checkpoint,
)
from deep_kernel_transfer_tpu.utils.torch_export import (
    export_method_checkpoint,
)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = None
    rest = []
    for a in argv:  # --out is ours; everything else is the test surface
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        else:
            rest.append(a)
    params_cli = parse_args("test", rest)

    image_size = factory.resolve_image_size(params_cli)
    factory.check_model_constraints(params_cli)  # omniglot => Conv4S rule
    n_support = params_cli.n_shot
    # checkpoint way-sized parameters follow TRAIN n_way (see test.py)
    model = factory.build_method(params_cli, params_cli.train_n_way, n_support)

    ckpt_dir = factory.checkpoint_dir(params_cli)
    ckpt_file = (get_assigned_file(ckpt_dir, params_cli.save_iter)
                 if params_cli.save_iter != -1 else get_best_file(ckpt_dir))
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
