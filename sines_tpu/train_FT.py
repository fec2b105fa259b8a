"""Sines feature-transfer baseline — MLP(1->40->40) + Linear(40, 1).

Rebuild of reference sines/train_FT.py: joint MSE training over tasks
(Adam 1e-3, n_shot_train=10), then clone-and-finetune at test with a fresh
Adam(1e-2) for 100 iterations on the 5 support points (reference
train_FT.py:145-216); MSE over query points of 500 tasks.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_kernel_transfer_tpu.methods import FeatureTransfer  # noqa: E402
from deep_kernel_transfer_tpu.models.backbones import MLP2  # noqa: E402
from sines_tpu import common  # noqa: E402


def main():
    args = common.parse_args("train_FT", default_iters=50000)
    rng = np.random.RandomState(args.seed)
    tasks = common.train_tasks()

    model = FeatureTransfer(MLP2(), lr=1e-3)
    state = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((10, 1)))

    for it in range(args.iterations):
        xb, yb = tasks.sample_batch(rng, args.task_batch,
                                    common.N_SHOT_TRAIN, noise=0.1)
        state, m = model.train_step(state, jnp.asarray(xb), jnp.asarray(yb))
        if it % 100 == 0:
            print(f"[{it}] - Loss: {float(m['loss']):.3f}")

    print("Test, please wait...")
    tt = common.test_tasks(args.out_of_range)
    mses = []
    for _ in range(args.n_test_tasks):
        _, xs, ys, xq, yq, _, _ = common.sample_eval_task(rng, tt)
        pred = model.finetune_and_predict(
            state.params, (jnp.asarray(xs), jnp.asarray(ys)), jnp.asarray(xq),
            steps=100, lr=1e-2)
        mses.append(float(jnp.mean((pred - jnp.asarray(yq)) ** 2)))
    common.report("FT", mses)

    test_hi = 10.0 if args.out_of_range else 5.0
    for i in range(args.n_plots):
        task, xs, ys, _, _, x_all, _ = common.sample_eval_task(rng, tt)
        pred = model.finetune_and_predict(
            state.params, (jnp.asarray(xs), jnp.asarray(ys)),
            jnp.asarray(x_all), steps=100, lr=1e-2)
        common.save_uncertainty_plot(i, "FT", task, xs, ys, x_all, pred,
                                     test_hi=test_hi)


if __name__ == "__main__":
    main()
