"""End-to-end sines DKT regression — the minimum slice (SURVEY.md §7 step 2):
MLP feature + GP head, jitted vmapped train step, MSE eval."""
import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu.data.sines import TaskDistribution
from deep_kernel_transfer_tpu.methods.dkt_regression import DKTRegression
from deep_kernel_transfer_tpu.models.backbones import MLP2


def _make():
    model = DKTRegression(MLP2(), feat_dim=40, kernel_type="rbf", lr=1e-2)
    state = model.init(jax.random.PRNGKey(0), jnp.zeros((10, 1)))
    return model, state


def test_train_reduces_loss_and_beats_prior_mse():
    model, state = _make()
    rng = np.random.RandomState(0)
    tasks = TaskDistribution(x_min=-5.0, x_max=5.0)

    losses = []
    for i in range(400):
        xb, yb = tasks.sample_batch(rng, batch_size=4, samples_per_task=10, noise=0.1)
        state, metrics = model.train_step(state, jnp.asarray(xb), jnp.asarray(yb))
        losses.append(float(metrics["loss"]))
    # per-batch loss is noisy; compare smoothed start vs end
    assert np.mean(losses[-20:]) < np.mean(losses[:20]) - 0.1

    # 5-shot eval protocol (reference sines/train_DKT.py:199-230)
    mses = []
    for _ in range(20):
        t = tasks.sample_task(rng)
        x_all, y_all = t.sample_data(rng, 50, noise=0.1, sort=True)
        xs, ys = x_all[:5], y_all[:5]
        idx = rng.permutation(50)
        xs, ys = x_all[idx[:5]], y_all[idx[:5]]
        xq, yq = x_all[idx[5:]], y_all[idx[5:]]
        mses.append(model.test_mse(state.params, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xq), jnp.asarray(yq)))
    # amplitude ~ U[0.1, 5] -> E[y^2] ~ several; the trained GP should do
    # far better than predicting 0.
    assert np.mean(mses) < 3.0


def test_unbatched_step_matches_interface():
    model, state = _make()
    rng = np.random.RandomState(1)
    tasks = TaskDistribution()
    xb, yb = tasks.sample_batch(rng, batch_size=3, samples_per_task=8)
    state2, m = model.unbatched_train_step(state, jnp.asarray(xb), jnp.asarray(yb))
    assert np.isfinite(float(m["loss"]))
    # params actually changed
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree.leaves(diff)) > 0


def test_predict_confidence_region():
    model, state = _make()
    xs = jnp.linspace(-2, 2, 8).reshape(-1, 1)
    ys = jnp.sin(xs[:, 0])
    xq = jnp.linspace(-2, 2, 16).reshape(-1, 1)
    pred = model.predict(state.params, xs, ys, xq)
    lo, hi = pred.confidence_region()
    assert lo.shape == (16,) and hi.shape == (16,)
    assert bool(jnp.all(hi > lo))


def test_spectral_kernel_runs():
    model = DKTRegression(MLP2(), feat_dim=40, kernel_type="spectral")
    state = model.init(jax.random.PRNGKey(0), jnp.zeros((10, 1)))
    rng = np.random.RandomState(2)
    xb, yb = TaskDistribution().sample_batch(rng, 2, 10)
    state, m = model.train_step(state, jnp.asarray(xb), jnp.asarray(yb))
    assert np.isfinite(float(m["loss"]))
