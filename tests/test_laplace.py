"""Laplace GP classifier vs sklearn's (the reference's implementation,
methods/DKT.py:207-222 uses sklearn GaussianProcessClassifier with
1.0 * RBF(0.1), optimizer=None)."""
import numpy as np
import jax.numpy as jnp
import pytest

from deep_kernel_transfer_tpu.gp.laplace import (
    laplace_ovr_predict,
    laplace_predict_proba,
)


def _blobs(rng, n_per=10, d=4, n_way=3, spread=0.3):
    centers = rng.randn(n_way, d) * 2.0
    x = np.concatenate(
        [centers[i] + rng.randn(n_per, d) * spread for i in range(n_way)])
    y = np.repeat(np.arange(n_way), n_per)
    return x.astype(np.float32), y


def test_binary_probs_valid_and_separating():
    rng = np.random.RandomState(0)
    x, y = _blobs(rng, n_way=2)
    t = (y == 1).astype(np.float32)
    probs = np.asarray(laplace_predict_proba(jnp.asarray(x), jnp.asarray(t),
                                             jnp.asarray(x)))
    assert probs.shape == (20,)
    assert np.all((probs > 0) & (probs < 1))
    assert np.mean((probs > 0.5) == (t > 0.5)) > 0.9


def test_ovr_multiclass_accuracy():
    rng = np.random.RandomState(1)
    x, y = _blobs(rng, n_way=4)
    xq, yq = _blobs(rng, n_way=4)  # same centers? no — fresh rng: use train
    pred = np.asarray(laplace_ovr_predict(jnp.asarray(x), jnp.asarray(y),
                                          jnp.asarray(x), n_way=4))
    assert np.mean(pred == y) > 0.9


def test_matches_sklearn_reference():
    sklearn_gp = pytest.importorskip("sklearn.gaussian_process")
    from sklearn.gaussian_process import GaussianProcessClassifier
    from sklearn.gaussian_process.kernels import RBF
    from sklearn.gaussian_process.kernels import ConstantKernel as C

    rng = np.random.RandomState(2)
    x, y = _blobs(rng, n_per=8, n_way=2, spread=0.8)
    xq, _ = _blobs(rng, n_per=5, n_way=2, spread=0.8)
    t = (y == 1).astype(np.float32)

    # the reference's exact sklearn configuration (methods/DKT.py:212-213)
    gp = GaussianProcessClassifier(
        kernel=1.0 * RBF(length_scale=0.1, length_scale_bounds=(0.1, 10.0)),
        optimizer=None)
    gp.fit(x, t)
    sk_probs = gp.predict_proba(xq)[:, 1]

    probs = np.asarray(laplace_predict_proba(jnp.asarray(x), jnp.asarray(t),
                                             jnp.asarray(xq)))
    # same mode-finding; predictive prob differs only in the final
    # integral approximation (probit vs Williams-Barber expansion)
    assert np.all(np.abs(probs - sk_probs) < 0.05)
    assert np.array_equal(probs > 0.5, sk_probs > 0.5)
