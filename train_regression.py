"""Regression training CLI — rebuild of reference train_regression.py.

QMUL head-pose trajectories: Conv3 features + ExactGP (DKT) or Linear head
(transfer). Each epoch samples one random trajectory batch over the 24
train people and takes either one vmapped-batch step (TPU default) or one
step per person (--task_batch=1 scan, strict reference parity —
reference methods/DKT_regression.py:45-64).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.data import get_batch, train_people
from deep_kernel_transfer_tpu.io_utils import parse_args_regression
from deep_kernel_transfer_tpu.methods import DKTRegression, FeatureTransfer
from deep_kernel_transfer_tpu.models.backbones import feat_dims, model_dict
from deep_kernel_transfer_tpu.utils.checkpoint import save_checkpoint
from deep_kernel_transfer_tpu.utils.jit_cache import enable_persistent_jit_cache


def build_regression_method(params_cli):
    backbone = model_dict[params_cli.model]()
    feat_dim = feat_dims[params_cli.model]
    if params_cli.method == "DKT":
        kernel = "spectral" if params_cli.spectral else "rbf"
        return DKTRegression(backbone, feat_dim=feat_dim, kernel_type=kernel)
    if params_cli.method == "transfer":
        return FeatureTransfer(backbone)
    raise ValueError(f"Unknown regression method {params_cli.method}")


def main(argv=None):
    enable_persistent_jit_cache()  # repeat CLI runs skip XLA recompiles
    params_cli = parse_args_regression("train_regression", argv)
    np.random.seed(params_cli.seed)

    model = build_regression_method(params_cli)
    example_x = jnp.zeros((19, 100, 100, 3), jnp.float32)
    state = model.init(jax.random.PRNGKey(params_cli.seed), example_x)

    ckpt_dir = factory.regression_checkpoint_dir(params_cli)
    os.makedirs(ckpt_dir, exist_ok=True)
    print(f"checkpoint dir: {ckpt_dir}")

    start_epoch = params_cli.start_epoch
    if params_cli.resume:
        from deep_kernel_transfer_tpu.utils.checkpoint import (
            load_params_checkpoint)

        ckpt = os.path.join(ckpt_dir, "best_model.tar")
        if os.path.isfile(ckpt):
            # load_params_checkpoint handles BOTH our npz .tar payloads and
            # reference torch checkpoints (same contract as train.py resume)
            params, epoch = load_params_checkpoint(
                ckpt, state.params,
                method_name=("DKT_regression" if params_cli.method == "DKT"
                             else params_cli.method),
                model=model, image_size=100)
            state = state._replace(params=params)
            start_epoch = (epoch + 1) if epoch is not None else start_epoch
            print(f"resumed from {ckpt} (epoch {epoch})")

    ckpt = os.path.join(ckpt_dir, "best_model.tar")
    for epoch in range(start_epoch, params_cli.stop_epoch):
        # per-epoch RNG: a resumed run draws the SAME data an uninterrupted
        # run would have drawn at this epoch (no replay of consumed batches)
        rng = np.random.RandomState(params_cli.seed * 100003 + epoch)
        xb, yb = get_batch(train_people, rng)
        xb, yb = jnp.asarray(xb), jnp.asarray(yb)
        if params_cli.task_batch == 1 and hasattr(model, "unbatched_train_step"):
            state, m = model.unbatched_train_step(state, xb, yb)
        else:
            state, m = model.train_step(state, xb, yb)
        print(f"[{epoch:03d}] loss: {float(m['loss']):.4f}")
        if epoch % 50 == 49 or epoch == params_cli.stop_epoch - 1:
            save_checkpoint(ckpt, state.params, epoch)
    if start_epoch < params_cli.stop_epoch:
        print(f"saved {ckpt}")
    else:
        print("nothing to train (start_epoch >= stop_epoch); checkpoint untouched")
    return state


if __name__ == "__main__":
    main()
