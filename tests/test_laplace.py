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


def _f64_reference_ovr(x, y, xq, n_way, ls=0.1, n_iters=60):
    """Infinite-precision-style numpy f64 OvR Laplace GPC (R&W Alg 3.1/3.2,
    MacKay probit link) — the ground truth the rescaled f32 ranking must
    reproduce in the underflow band."""
    x, xq = x.astype(np.float64), xq.astype(np.float64)
    d2 = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2 / ls**2)
    d2q = ((x[:, None] - xq[None, :]) ** 2).sum(-1)
    k_star = np.exp(-0.5 * d2q / ls**2)
    scores = []
    for w in range(n_way):
        t = (y == w).astype(np.float64)
        f = np.zeros(len(y))
        for _ in range(n_iters):
            pi = 1.0 / (1.0 + np.exp(-f))
            W = pi * (1 - pi)
            sw = np.sqrt(W)
            B = np.eye(len(y)) + sw[:, None] * K * sw[None, :]
            L = np.linalg.cholesky(B)
            b = W * f + (t - pi)
            v = np.linalg.solve(L, sw * (K @ b))
            a = b - sw * np.linalg.solve(L.T, v)
            f = K @ a
        pi = 1.0 / (1.0 + np.exp(-f))
        sw = np.sqrt(pi * (1 - pi))
        L = np.linalg.cholesky(np.eye(len(y)) + sw[:, None] * K * sw[None, :])
        f_star = k_star.T @ (t - pi)
        v = np.linalg.solve(L, sw[:, None] * k_star)
        var = np.maximum(1.0 - (v * v).sum(0), 1e-12)
        scores.append(f_star / np.sqrt(1 + np.pi * var / 8))
    return np.argmax(np.asarray(scores), axis=0)


def test_ovr_underflow_band_matches_f64():
    """The digits_real --laplace regime (benchmarks/laplace_probe.py): unit-
    norm features where exp(-50 d^2) underflows f32 for most query-support
    pairs. A naive f32 sigmoid(f*/den) head rounds every way's probability
    to exactly 0.5 (argmax collapses to way 0); the rescaled-score ranking
    must keep matching an f64 reference."""
    rng = np.random.RandomState(5)
    n_way, n_per = 5, 5
    centers = rng.randn(n_way, 32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    x = np.repeat(centers, n_per, 0) + 0.35 * rng.randn(n_way * n_per, 32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    y = np.repeat(np.arange(n_way), n_per)
    xq = np.repeat(centers, 8, 0) + 0.55 * rng.randn(n_way * 8, 32)
    xq /= np.linalg.norm(xq, axis=-1, keepdims=True)
    yq = np.repeat(np.arange(n_way), 8)
    # confirm the episode actually sits in the f32 underflow band
    d2q = ((x[:, None] - xq[None, :]) ** 2).sum(-1)
    assert d2q.min(0).max() > 0.3, "test data not in the collapse band"

    ref = _f64_reference_ovr(x, y, xq, n_way)
    got = np.asarray(laplace_ovr_predict(
        jnp.asarray(x, jnp.float32), jnp.asarray(y),
        jnp.asarray(xq, jnp.float32), n_way=n_way))
    # rankings agree with f64 (tiny float disagreements allowed on ties)
    assert np.mean(got == ref) > 0.97
    # and the head actually classifies: well above the 1/n_way = 0.2 a
    # collapsed head gets here (argmax of all-0.5 returns way 0)
    assert np.mean(got == yq) > 0.4
    assert len(np.unique(got)) > 1
