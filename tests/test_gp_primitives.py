"""Direct unit tests for the small GP primitives (gp/distributions.py,
gp/likelihoods.py, gp/means.py) — previously covered only through the
engine. Pins the gpytorch-parity contracts each replaces."""
import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu.gp.distributions import MultivariateNormal
from deep_kernel_transfer_tpu.gp.likelihoods import GaussianLikelihood
from deep_kernel_transfer_tpu.gp.means import constant_mean, constant_mean_init


def test_confidence_region_is_two_sigma():
    """gpytorch contract: mean -+ 2*stddev (reference DKT_regression.py:93)."""
    mean = jnp.asarray([1.0, -2.0])
    var = jnp.asarray([4.0, 0.25])
    lo, hi = MultivariateNormal(mean, var).confidence_region()
    np.testing.assert_allclose(np.asarray(lo), [1 - 4.0, -2 - 1.0])
    np.testing.assert_allclose(np.asarray(hi), [1 + 4.0, -2 + 1.0])
    # negative variance (numerical) clamps instead of producing NaN
    d = MultivariateNormal(jnp.zeros(1), jnp.asarray([-1e-9]))
    assert np.isfinite(np.asarray(d.stddev)).all()


def test_mvn_sampling_moments():
    """Marginal sampling matches (mean, var); full-covariance sampling
    reproduces the off-diagonal structure."""
    mean = jnp.asarray([0.5, -1.0])
    var = jnp.asarray([1.0, 4.0])
    s = MultivariateNormal(mean, var).sample(jax.random.PRNGKey(0), 20000)
    np.testing.assert_allclose(np.asarray(s.mean(0)), mean, atol=0.05)
    np.testing.assert_allclose(np.asarray(s.var(0)), var, rtol=0.05)

    cov = jnp.asarray([[1.0, 0.8], [0.8, 1.0]])
    d = MultivariateNormal(jnp.zeros(2), jnp.diag(cov), covariance=cov)
    s = d.sample(jax.random.PRNGKey(1), 20000)
    got = np.cov(np.asarray(s).T)
    np.testing.assert_allclose(got, np.asarray(cov), atol=0.05)


def test_likelihood_noise_parameterisations():
    """Trainable: raw 0 -> softplus(0) ~ 0.693 like gpytorch's default
    init (reference DKT_regression.py:29); init(noise=v) round-trips;
    fixed: empty pytree, constant 0.1 (reference DKT.py:346-347)."""
    lik = GaussianLikelihood(trainable=True)
    p = lik.init()
    np.testing.assert_allclose(float(lik.noise(p)), np.log(2.0), rtol=1e-6)
    p = lik.init(noise=0.37)
    np.testing.assert_allclose(float(lik.noise(p)), 0.37, rtol=1e-5)

    fixed = GaussianLikelihood(trainable=False, fixed_noise=0.1)
    assert fixed.init() == {}
    np.testing.assert_allclose(float(fixed.noise({})), 0.1)

    # __call__ adds noise to marginals and the covariance diagonal
    cov = jnp.asarray([[2.0, 0.3], [0.3, 1.0]])
    d = MultivariateNormal(jnp.zeros(2), jnp.diag(cov), covariance=cov)
    out = fixed({}, d)
    np.testing.assert_allclose(np.asarray(out.variance), [2.1, 1.1])
    np.testing.assert_allclose(np.asarray(out.covariance),
                               [[2.1, 0.3], [0.3, 1.1]], rtol=1e-6)
    # the mean is untouched — this is why sigmoid(mean) after the
    # likelihood equals sigmoid(posterior mean) (reference DKT.py:258-268)
    np.testing.assert_array_equal(np.asarray(out.mean), np.zeros(2))


def test_constant_mean_broadcasts():
    p = constant_mean_init()
    assert float(p["constant"]) == 0.0
    x = jnp.ones((7, 3))
    m = constant_mean({"constant": jnp.asarray(2.5)}, x)
    assert m.shape == (7,)
    np.testing.assert_allclose(np.asarray(m), 2.5)
    # batched inputs broadcast too
    xb = jnp.ones((4, 7, 3))
    assert constant_mean(p, xb).shape == (4, 7)
