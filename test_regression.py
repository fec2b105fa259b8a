"""Regression evaluation CLI — rebuild of reference test_regression.py.

Each test epoch: sample a random trajectory for a random test person,
condition on n_support of the 19 points, report MSE over ALL 19 points
(reference methods/DKT_regression.py:66-97); print mean +- std over
n_test_epochs (reference test_regression.py:30-39).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.data import get_batch, test_people
from deep_kernel_transfer_tpu.io_utils import parse_args_regression
from deep_kernel_transfer_tpu.utils.checkpoint import load_params_checkpoint
from deep_kernel_transfer_tpu.utils.jit_cache import enable_persistent_jit_cache
from train_regression import build_regression_method


def main(argv=None):
    enable_persistent_jit_cache()  # repeat CLI runs skip XLA recompiles
    params_cli = parse_args_regression("test_regression", argv)
    np.random.seed(params_cli.seed)
    rng = np.random.RandomState(params_cli.seed)

    model = build_regression_method(params_cli)
    example_x = jnp.zeros((19, 100, 100, 3), jnp.float32)
    state = model.init(jax.random.PRNGKey(params_cli.seed), example_x)

    ckpt_dir = factory.regression_checkpoint_dir(params_cli)
    ckpt_file = os.path.join(ckpt_dir, "best_model.tar")
    params, _ = load_params_checkpoint(
        ckpt_file, state.params,
        method_name=("DKT_regression" if params_cli.method == "DKT"
                     else params_cli.method),
        model=model, image_size=100)
    print(f"loaded {ckpt_file}")

    mses = []
    for _ in range(params_cli.n_test_epochs):
        person = [test_people[rng.randint(len(test_people))]]
        x, y = get_batch(person, rng)
        x, y = jnp.asarray(x[0]), jnp.asarray(y[0])  # [19, H, W, C], [19]
        support_idx = rng.choice(19, params_cli.n_support, replace=False)
        xs, ys = x[support_idx], y[support_idx]
        if params_cli.method == "transfer":
            state_loaded = state._replace(params=params)
            mse = model.test_mse(state_loaded, xs, ys, x, y)
        else:
            mse = model.test_mse(params, xs, ys, x, y)
        mses.append(float(mse))

    mses = np.asarray(mses)
    print("-------------------")
    print(f"Average MSE: {mses.mean():.4f} +- {mses.std():.4f}")
    print("-------------------")
    return float(mses.mean()), float(mses.std())


if __name__ == "__main__":
    main()
