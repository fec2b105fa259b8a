"""ExactGP engine vs sklearn GaussianProcessRegressor (independent oracle).

The GP-engine unit tests check closed forms and naive numpy; this file
cross-checks posterior mean/std and MLL against sklearn's exact GP with an
identical RBF kernel configuration.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_kernel_transfer_tpu.gp import ExactGP, GaussianLikelihood, make_kernel
from deep_kernel_transfer_tpu.gp.kernels import inv_softplus

sklearn_gp = pytest.importorskip("sklearn.gaussian_process")
from sklearn.gaussian_process import GaussianProcessRegressor  # noqa: E402
from sklearn.gaussian_process.kernels import RBF  # noqa: E402


def _setup(noise=0.05, lengthscale=0.8):
    rng = np.random.RandomState(0)
    x = rng.uniform(-3, 3, (25, 2)).astype(np.float32)
    y = (np.sin(x[:, 0]) + 0.5 * np.cos(2 * x[:, 1])).astype(np.float32)
    xq = rng.uniform(-3, 3, (40, 2)).astype(np.float32)

    gp = ExactGP(make_kernel("rbf"), GaussianLikelihood(trainable=True))
    params = gp.init(jax.random.PRNGKey(0), noise=noise)
    # pin: outputscale = 1, lengthscale, zero mean (sklearn's convention)
    params["kernel"]["raw_outputscale"] = inv_softplus(jnp.asarray(1.0))
    params["kernel"]["base"]["raw_lengthscale"] = inv_softplus(
        jnp.asarray(lengthscale))
    sk = GaussianProcessRegressor(kernel=RBF(length_scale=lengthscale),
                                  alpha=noise, optimizer=None)
    sk.fit(x, y)
    return gp, params, sk, x, y, xq


def test_posterior_mean_and_std_match_sklearn():
    gp, params, sk, x, y, xq = _setup()
    post = gp.posterior(params, jnp.asarray(x), jnp.asarray(y), jnp.asarray(xq))
    sk_mean, sk_std = sk.predict(xq, return_std=True)
    np.testing.assert_allclose(np.asarray(post.mean), sk_mean, atol=2e-4)
    # sklearn's return_std excludes observation noise, as does our posterior
    np.testing.assert_allclose(np.sqrt(np.asarray(post.variance)), sk_std,
                               atol=2e-3)


def test_mll_matches_sklearn():
    gp, params, sk, x, y, _ = _setup()
    ours = float(gp.mll(params, jnp.asarray(x), jnp.asarray(y)))
    theirs = sk.log_marginal_likelihood() / len(y)  # we use the 1/N scaling
    assert abs(ours - theirs) < 1e-4, (ours, theirs)
