"""Sines experiment scripts — smoke + the MAML adaptation-analysis track
(reference sines/train_MAML.py:206-330 loss_on_random_task /
average_losses / plot_sampled_performance equivalents)."""
import os

import numpy as np
import jax
import jax.numpy as jnp


def test_maml_analysis_outputs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from sines_tpu import train_MAML

    params = train_MAML.main(["--iterations=5", "--n_test_tasks=3",
                              "--analysis=2", "--seed=0"])
    assert params is not None
    assert os.path.isfile("plots/MAML_adaptation_curve.png")
    assert os.path.isfile("plots/MAML_sampled_steps.png")


def test_adapt_trajectory_monotone_start():
    """Step 0 of the trajectory is the unadapted model; the recorded MSEs
    and predictions have the right shapes and the support loss falls."""
    from sines_tpu import common, train_MAML

    maml = train_MAML.SinesMAML()
    params, _ = maml.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    tt = common.test_tasks(False)
    _, xs, ys, xq, yq, _, _ = common.sample_eval_task(rng, tt)
    mses, preds = maml.adapt_trajectory(
        params, (jnp.asarray(xs), jnp.asarray(ys)),
        jnp.asarray(xq), jnp.asarray(yq), n_steps=6)
    assert mses.shape == (7,)
    assert preds.shape == (7, len(xq))
    unadapted = maml.net.apply(params, jnp.asarray(xq))
    np.testing.assert_allclose(np.asarray(preds[0]), np.asarray(unadapted),
                               rtol=1e-6)
    # adaptation on the support must reduce the SUPPORT loss (query loss
    # from a random init need not fall, so check the train objective)
    l0 = float(maml.task_loss(params, jnp.asarray(xs), jnp.asarray(ys)))
    fast = params
    for _ in range(6):
        g = jax.grad(maml.task_loss)(fast, jnp.asarray(xs), jnp.asarray(ys))
        fast = jax.tree.map(lambda w, gi: w - 0.01 * gi, fast, g)
    l6 = float(maml.task_loss(fast, jnp.asarray(xs), jnp.asarray(ys)))
    assert l6 < l0
