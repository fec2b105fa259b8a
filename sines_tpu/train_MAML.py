"""Sines MAML — functional first/second-order MAML on MLP(1->40->40->1).

Rebuild of reference sines/train_MAML.py:111-204: inner SGD (lr 0.01,
1 step) on a task's K=10 points, outer Adam (lr 0.001) on the post-
adaptation loss, averaged over a meta-batch of tasks. In JAX the
fast-weight machinery is just jax.grad over the pure params pytree — no
`weight.fast` attribute hack is needed. Evaluation (reference
train_MAML.py:206-258): adapt from the meta-params with Adam for n_steps
on 5 support points, MSE on the 195 query points, 500 tasks.
"""
from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sines_tpu import common  # noqa: E402

INNER_LR = 0.01
META_LR = 0.001
INNER_STEPS = 1


class MAMLModel(nn.Module):
    """reference sines/train_MAML.py:119-130: 1->40->40->1 ReLU MLP."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(40)(x))
        x = nn.relu(nn.Dense(40)(x))
        return nn.Dense(1)(x)[..., 0]


class SinesMAML:
    def __init__(self, meta_batch: int = 25):
        self.net = MAMLModel()
        self.meta_batch = meta_batch
        self.tx = optax.adam(META_LR)

    def init(self, key):
        params = self.net.init(key, jnp.zeros((2, 1)))
        return params, self.tx.init(params)

    def task_loss(self, params, x, y):
        return jnp.mean((self.net.apply(params, x) - y) ** 2)

    def inner_adapted_loss(self, params, x, y):
        """1-step inner SGD then loss on the SAME K points (reference
        train_MAML.py:157-176)."""
        fast = params
        for _ in range(INNER_STEPS):
            g = jax.grad(self.task_loss)(fast, x, y)
            fast = jax.tree.map(lambda p, gi: p - INNER_LR * gi, fast, g)
        return self.task_loss(fast, x, y)

    @partial(jax.jit, static_argnums=0)
    def meta_step(self, params, opt_state, xb, yb):
        def meta_loss(p):
            return jnp.mean(jax.vmap(
                lambda x, y: self.inner_adapted_loss(p, x, y))(xb, yb))

        loss, grads = jax.value_and_grad(meta_loss)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnums=(0, 5))
    def adapt_trajectory(self, params, support, x_query, y_query,
                         n_steps: int = 10, lr: float = 0.01):
        """Adaptation analysis (reference train_MAML.py:206-300
        loss_on_random_task / model_functions_at_training): fresh-SGD
        finetune on the support, recording the query MSE after EVERY step
        and the model function after each step. Returns
        (query_mses [n_steps+1], preds [n_steps+1, M])."""
        xs, ys = support

        def query_state(p):
            pred = self.net.apply(p, x_query)
            return jnp.mean((pred - y_query) ** 2), pred

        def one(p, _):
            g = jax.grad(self.task_loss)(p, xs, ys)
            p = jax.tree.map(lambda w, gi: w - lr * gi, p, g)
            mse, pred = query_state(p)
            return p, (mse, pred)

        mse0, pred0 = query_state(params)
        _, (mses, preds) = jax.lax.scan(one, params, None, length=n_steps)
        return (jnp.concatenate([mse0[None], mses]),
                jnp.concatenate([pred0[None], preds]))

    @partial(jax.jit, static_argnums=(0, 4))
    def adapt_predict(self, params, support, x_query, n_steps: int = 10,
                      lr: float = 0.01):
        """Test-time: fresh-Adam finetune on support from the meta-params
        (reference train_MAML.py:206-245 uses optim=Adam at eval)."""
        xs, ys = support
        tx = optax.adam(lr)

        def one(carry, _):
            p, o = carry
            g = jax.grad(self.task_loss)(p, xs, ys)
            updates, o = tx.update(g, o, p)
            return (optax.apply_updates(p, updates), o), None

        (p, _), _ = jax.lax.scan(one, (params, tx.init(params)), None,
                                 length=n_steps)
        return self.net.apply(p, x_query)


def main(argv=None):
    args = common.parse_args("train_MAML", default_iters=10000, argv=argv,
                             default_task_batch=25)
    rng = np.random.RandomState(args.seed)
    tasks = common.train_tasks()

    # an explicit --task_batch is honoured (no silent floor); the DEFAULT is
    # 25 because MAML's meta objective averages over a task batch
    maml = SinesMAML(meta_batch=args.task_batch)
    params, opt_state = maml.init(jax.random.PRNGKey(args.seed))

    for it in range(args.iterations):
        xb, yb = tasks.sample_batch(rng, maml.meta_batch,
                                    common.N_SHOT_TRAIN, noise=0.1)
        params, opt_state, loss = maml.meta_step(
            params, opt_state, jnp.asarray(xb), jnp.asarray(yb))
        if it % 100 == 0:
            print(f"[{it}] - MetaLoss: {float(loss):.3f}")

    print("Test, please wait...")
    tt = common.test_tasks(args.out_of_range)
    mses = []
    for _ in range(args.n_test_tasks):
        _, xs, ys, xq, yq, _, _ = common.sample_eval_task(rng, tt)
        pred = maml.adapt_predict(params, (jnp.asarray(xs), jnp.asarray(ys)),
                                  jnp.asarray(xq), n_steps=10)
        mses.append(float(jnp.mean((pred - jnp.asarray(yq)) ** 2)))
    common.report("MAML", mses)

    test_hi = 10.0 if args.out_of_range else 5.0
    for i in range(args.n_plots):
        task, xs, ys, _, _, x_all, _ = common.sample_eval_task(rng, tt)
        pred = maml.adapt_predict(params, (jnp.asarray(xs), jnp.asarray(ys)),
                                  jnp.asarray(x_all), n_steps=10)
        common.save_uncertainty_plot(i, "MAML", task, xs, ys, x_all, pred,
                                     test_hi=test_hi)

    if args.analysis:
        analysis(maml, params, rng, tt, args.analysis, test_hi)
    return params


def analysis(maml, params, rng, tt, n_tasks: int, test_hi: float,
             n_steps: int = 10, out_dir: str = "plots"):
    """Adaptation-speed analysis (reference sines/train_MAML.py:206-330):
    the query-MSE learning trajectory averaged over n_tasks random tasks
    (average_losses) and one task's adapted functions after sampled step
    counts (plot_sampled_performance)."""
    curves = []
    keep = None
    for i in range(n_tasks):
        task, xs, ys, xq, yq, x_all, _ = common.sample_eval_task(rng, tt)
        mses, _ = maml.adapt_trajectory(
            params, (jnp.asarray(xs), jnp.asarray(ys)),
            jnp.asarray(xq), jnp.asarray(yq), n_steps=n_steps)
        curves.append(np.asarray(mses))
        if keep is None:
            keep = (task, xs, ys, x_all)
    curve = np.mean(curves, axis=0)
    print("MAML adaptation curve (avg query MSE after k steps):")
    for k, v in enumerate(curve):
        print(f"  step {k:2d}: {v:.4f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots()
    ax.plot(range(len(curve)), curve, marker="o")
    ax.set_xlabel("adaptation steps")
    ax.set_ylabel("avg query MSE")
    ax.set_title(f"MAML adaptation over {n_tasks} tasks")
    fig.savefig(os.path.join(out_dir, "MAML_adaptation_curve.png"), dpi=120)
    plt.close(fig)

    task, xs, ys, x_all = keep
    _, preds = maml.adapt_trajectory(
        params, (jnp.asarray(xs), jnp.asarray(ys)), jnp.asarray(x_all),
        jnp.zeros(len(x_all)), n_steps=n_steps)
    fig, ax = plt.subplots()
    grid = np.linspace(-5.0, test_hi, 400)
    ax.plot(grid, [task.true_function(x) for x in grid], color="blue",
            label="true")
    for k in (0, 1, n_steps):
        ax.plot(x_all, np.asarray(preds[k]), alpha=0.7, label=f"{k} steps")
    ax.scatter(xs, ys, color="black", marker="*", zorder=5, label="support")
    ax.legend()
    fig.savefig(os.path.join(out_dir, "MAML_sampled_steps.png"), dpi=120)
    plt.close(fig)
    return curve


if __name__ == "__main__":
    main()
