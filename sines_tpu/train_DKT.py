"""Sines DKT — MLP(1->40->40) features + SpectralMixture(4, ard=40) ExactGP.

Rebuild of reference sines/train_DKT.py:113-277. Training follows the
reference protocol (Adam 1e-3 on GP + net, -MLL per task, n_shot_train=10
noisy points); --task_batch > 1 vmaps several tasks into one batched
Cholesky step (TPU-native batching). Evaluation: 500 tasks, 5-shot
conditioning, MSE over the 195 query points; --n_plots saves
confidence-region figures.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_kernel_transfer_tpu.methods import DKTRegression  # noqa: E402
from deep_kernel_transfer_tpu.models.backbones import MLP2  # noqa: E402
from sines_tpu import common  # noqa: E402


def main():
    args = common.parse_args("train_DKT", default_iters=50000)
    rng = np.random.RandomState(args.seed)
    tasks = common.train_tasks()

    model = DKTRegression(MLP2(), feat_dim=40, kernel_type="spectral",
                          lr=1e-3)
    state = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((10, 1)))

    for it in range(args.iterations):
        xb, yb = tasks.sample_batch(rng, args.task_batch,
                                    common.N_SHOT_TRAIN, noise=0.1)
        state, m = model.train_step(state, jnp.asarray(xb), jnp.asarray(yb))
        if it % 100 == 0:
            print(f"[{it}] - Loss: {float(m['loss']):.3f}  "
                  f"noise: {float(m['noise']):.3f}")

    print("Test, please wait...")
    tt = common.test_tasks(args.out_of_range)
    mses = []
    for _ in range(args.n_test_tasks):
        _, xs, ys, xq, yq, _, _ = common.sample_eval_task(rng, tt)
        mses.append(model.test_mse(state.params, jnp.asarray(xs),
                                   jnp.asarray(ys), jnp.asarray(xq),
                                   jnp.asarray(yq)))
    common.report("DKT", mses)

    test_hi = 10.0 if args.out_of_range else 5.0
    for i in range(args.n_plots):
        task, xs, ys, _, _, x_all, _ = common.sample_eval_task(rng, tt)
        pred = model.predict(state.params, jnp.asarray(xs), jnp.asarray(ys),
                             jnp.asarray(x_all))
        lower, upper = pred.confidence_region()
        common.save_uncertainty_plot(i, "DKT", task, xs, ys, x_all, pred.mean,
                                     lower, upper, test_hi)


if __name__ == "__main__":
    main()
