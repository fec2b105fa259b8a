"""Unit tests of the ExactGP engine against closed-form / naive-numpy results
(SURVEY.md §4a: the reference ships no tests; this suite is built from
scratch against independent reference implementations)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_kernel_transfer_tpu.gp import (
    ExactGP,
    GaussianLikelihood,
    make_kernel,
    psd_safe_cholesky,
    sum_mll,
    init_batched,
    batched_posterior,
)
from deep_kernel_transfer_tpu.gp.kernels import (
    inv_softplus,
    linear_kernel,
    matern_kernel,
    rbf_kernel,
    polynomial_kernel,
    scale,
    softplus,
    spectral_mixture_kernel,
    sq_dist,
)


def naive_mll(K, noise, y, mean_const=0.0):
    """Dense numpy MLL, the formula gpytorch implements (divided by N)."""
    n = len(y)
    Kn = K + noise * np.eye(n)
    diff = y - mean_const
    alpha = np.linalg.solve(Kn, diff)
    sign, logdet = np.linalg.slogdet(Kn)
    assert sign > 0
    return float(-0.5 * (diff @ alpha + logdet + n * np.log(2 * np.pi)) / n)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_sq_dist_matches_numpy(rng):
    x1 = rng.randn(7, 5).astype(np.float32)
    x2 = rng.randn(9, 5).astype(np.float32)
    expected = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
    got = np.asarray(sq_dist(jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_rbf_kernel_closed_form(rng):
    k = rbf_kernel()
    params = {"raw_lengthscale": inv_softplus(2.0)}
    x = rng.randn(6, 3).astype(np.float32)
    got = np.asarray(k.apply(params, jnp.asarray(x), jnp.asarray(x)))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    expected = np.exp(-0.5 * d2 / 4.0)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_matern25_closed_form(rng):
    k = matern_kernel(2.5)
    params = {"raw_lengthscale": inv_softplus(1.5)}
    x = rng.randn(6, 3).astype(np.float32)
    d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)) / 1.5
    c = np.sqrt(5.0) * d
    expected = (1 + c + c**2 / 3) * np.exp(-c)
    got = np.asarray(k.apply(params, jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_linear_and_poly(rng):
    x = rng.randn(4, 3).astype(np.float32)
    lin = linear_kernel(train_variance=True)
    p = {"raw_variance": inv_softplus(1.0)}
    np.testing.assert_allclose(
        np.asarray(lin.apply(p, jnp.asarray(x), jnp.asarray(x))),
        x @ x.T,
        rtol=1e-4,
        atol=1e-5,
    )
    poly = polynomial_kernel(2)
    p2 = {"raw_offset": inv_softplus(0.5)}
    np.testing.assert_allclose(
        np.asarray(poly.apply(p2, jnp.asarray(x), jnp.asarray(x))),
        (x @ x.T + 0.5) ** 2,
        rtol=1e-4,
        atol=1e-4,
    )


def test_scale_wrapper(rng):
    x = rng.randn(4, 3).astype(np.float32)
    k = scale(rbf_kernel())
    params = k.init(jax.random.PRNGKey(0))
    # default raw 0 -> outputscale = softplus(0)
    got = np.asarray(k.apply(params, jnp.asarray(x), jnp.asarray(x)))
    inner = np.asarray(rbf_kernel().apply(params["base"], jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, float(softplus(0.0)) * inner, rtol=1e-5)


def test_spectral_mixture_symmetry_and_diag(rng):
    k = spectral_mixture_kernel(num_mixtures=4, ard_num_dims=5)
    params = k.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.randn(6, 5).astype(np.float32))
    K = np.asarray(k.apply(params, x, x))
    np.testing.assert_allclose(K, K.T, rtol=1e-4, atol=1e-5)
    # diagonal = sum of weights (tau=0 -> exp term 1, cos term 1)
    w = np.asarray(softplus(params["raw_weights"]))
    np.testing.assert_allclose(np.diag(K), np.full(6, w.sum()), rtol=1e-4)
    # PSD check
    evals = np.linalg.eigvalsh(K + 1e-5 * np.eye(6))
    assert (evals > 0).all()


def test_psd_safe_cholesky_escalates():
    # rank-deficient matrix: plain cholesky would give NaNs
    a = np.array([[1.0, 1.0], [1.0, 1.0]], dtype=np.float32)
    plain = np.asarray(jnp.linalg.cholesky(jnp.asarray(a)))
    assert np.isnan(plain).any()
    safe = np.asarray(psd_safe_cholesky(jnp.asarray(a), initial_jitter=1e-4))
    assert np.isfinite(safe).all()
    recon = safe @ safe.T
    np.testing.assert_allclose(recon, a, atol=1e-2)


def test_mll_matches_naive(rng):
    gp = ExactGP(make_kernel("rbf"), GaussianLikelihood(trainable=True))
    params = gp.init(jax.random.PRNGKey(0))
    x = rng.randn(12, 4).astype(np.float32)
    y = rng.randn(12).astype(np.float32)
    got = float(gp.mll(params, jnp.asarray(x), jnp.asarray(y)))

    ls = float(softplus(params["kernel"]["base"]["raw_lengthscale"]))
    os_ = float(softplus(params["kernel"]["raw_outputscale"]))
    noise = float(softplus(params["likelihood"]["raw_noise"]))
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    K = os_ * np.exp(-0.5 * d2 / ls**2)
    expected = naive_mll(K.astype(np.float64), noise, y.astype(np.float64))
    assert got == pytest.approx(expected, rel=1e-3)


def test_posterior_matches_naive(rng):
    gp = ExactGP(make_kernel("rbf"), GaussianLikelihood(trainable=False, fixed_noise=0.1))
    params = gp.init(jax.random.PRNGKey(0))
    xt = rng.randn(10, 3).astype(np.float32)
    yt = rng.randn(10).astype(np.float32)
    xq = rng.randn(4, 3).astype(np.float32)

    post = gp.posterior(params, jnp.asarray(xt), jnp.asarray(yt), jnp.asarray(xq))

    ls = float(softplus(params["kernel"]["base"]["raw_lengthscale"]))
    os_ = float(softplus(params["kernel"]["raw_outputscale"]))

    def kf(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return os_ * np.exp(-0.5 * d2 / ls**2)

    Ktt = kf(xt, xt) + 0.1 * np.eye(10)
    Ktq = kf(xt, xq)
    Kqq = kf(xq, xq)
    mean = Ktq.T @ np.linalg.solve(Ktt, yt)
    cov = Kqq - Ktq.T @ np.linalg.solve(Ktt, Ktq)
    np.testing.assert_allclose(np.asarray(post.mean), mean, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(post.variance), np.diag(cov), rtol=1e-2, atol=1e-3)

    # full-covariance path agrees with marginal path
    post_full = gp.posterior(
        params, jnp.asarray(xt), jnp.asarray(yt), jnp.asarray(xq), full_covariance=True
    )
    np.testing.assert_allclose(
        np.asarray(post_full.variance), np.asarray(post.variance), rtol=1e-3, atol=1e-4
    )


def test_posterior_interpolates_noiseless_limit(rng):
    """With tiny noise the posterior mean at the training points ~ y."""
    gp = ExactGP(make_kernel("rbf"), GaussianLikelihood(trainable=False, fixed_noise=1e-4))
    params = gp.init(jax.random.PRNGKey(0))
    xt = np.linspace(-2, 2, 8).reshape(-1, 1).astype(np.float32)
    yt = np.sin(xt[:, 0]).astype(np.float32)
    post = gp.posterior(params, jnp.asarray(xt), jnp.asarray(yt), jnp.asarray(xt))
    np.testing.assert_allclose(np.asarray(post.mean), yt, atol=5e-2)
    assert (np.asarray(post.variance) < 0.05).all()


def test_sum_mll_equals_sum_of_mlls(rng):
    gp = ExactGP(make_kernel("bncossim"), GaussianLikelihood(trainable=False, fixed_noise=0.1))
    n_way, n = 5, 20
    params_b = init_batched(gp, jax.random.PRNGKey(0), n_way)
    x = rng.randn(n, 8).astype(np.float32)
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    y = np.where(rng.rand(n_way, n) > 0.5, 1.0, -1.0).astype(np.float32)

    total = float(sum_mll(gp, params_b, jnp.asarray(x), jnp.asarray(y)))
    singles = sum(
        float(
            gp.mll(
                jax.tree.map(lambda l: l[i], params_b),
                jnp.asarray(x),
                jnp.asarray(y[i]),
            )
        )
        for i in range(n_way)
    )
    assert total == pytest.approx(singles, rel=1e-4)


def test_batched_posterior_shapes(rng):
    gp = ExactGP(make_kernel("bncossim"), GaussianLikelihood(trainable=False, fixed_noise=0.1))
    n_way, n_sup, n_q = 5, 25, 75
    params_b = init_batched(gp, jax.random.PRNGKey(0), n_way)
    xs = rng.randn(n_sup, 16).astype(np.float32)
    xq = rng.randn(n_q, 16).astype(np.float32)
    y = np.where(rng.rand(n_way, n_sup) > 0.5, 1.0, -1.0).astype(np.float32)
    post = batched_posterior(gp, params_b, jnp.asarray(xs), jnp.asarray(y), jnp.asarray(xq))
    assert post.mean.shape == (n_way, n_q)
    assert post.variance.shape == (n_way, n_q)
    assert np.isfinite(np.asarray(post.mean)).all()


def test_mll_gradients_finite(rng):
    gp = ExactGP(make_kernel("rbf"), GaussianLikelihood(trainable=True))
    params = gp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(15, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(15).astype(np.float32))
    grads = jax.grad(lambda p: -gp.mll(p, x, y))(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # gradient should be nonzero for kernel params
    assert float(jnp.abs(grads["kernel"]["base"]["raw_lengthscale"])) > 0


def test_mll_training_improves(rng):
    """A few Adam steps on -MLL must increase the MLL (engine + autodiff +
    optimizer loop smoke test)."""
    import optax

    gp = ExactGP(make_kernel("rbf"), GaussianLikelihood(trainable=True))
    params = gp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.linspace(-3, 3, 25).reshape(-1, 1).astype(np.float32))
    y = jnp.sin(x[:, 0]) * 2.0

    opt = optax.adam(0.1)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(lambda p: -gp.mll(p, x, y))(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(60):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.3


def test_banded_size_identity_padding_is_exact(rng):
    """Gram sizes in the 84-88 band are identity-padded to 96 to dodge an
    XLA cholesky-derivative compile failure (gp/exact._padded_size); the
    padding must be invisible: mll / posterior / gradients at N=85 agree
    with the naive dense computation."""
    gp = ExactGP(make_kernel("rbf"),
                 GaussianLikelihood(trainable=False, fixed_noise=0.1))
    params = gp.init(jax.random.PRNGKey(0))
    n = 85
    xt = rng.randn(n, 3).astype(np.float32)
    yt = rng.randn(n).astype(np.float32)
    xq = rng.randn(6, 3).astype(np.float32)

    ls = float(softplus(params["kernel"]["base"]["raw_lengthscale"]))
    os_ = float(softplus(params["kernel"]["raw_outputscale"]))

    def kf(a, b):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return os_ * np.exp(-0.5 * d2 / ls**2)

    K = kf(xt, xt).astype(np.float64)
    got = float(gp.mll(params, jnp.asarray(xt), jnp.asarray(yt)))
    expected = naive_mll(K, 0.1, yt.astype(np.float64))
    assert got == pytest.approx(expected, rel=1e-3)

    post = gp.posterior(params, jnp.asarray(xt), jnp.asarray(yt),
                        jnp.asarray(xq))
    Ktt = K + 0.1 * np.eye(n)
    Ktq = kf(xt, xq).astype(np.float64)
    mean = Ktq.T @ np.linalg.solve(Ktt, yt.astype(np.float64))
    cov = kf(xq, xq).astype(np.float64) - Ktq.T @ np.linalg.solve(Ktt, Ktq)
    np.testing.assert_allclose(np.asarray(post.mean), mean,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(post.variance), np.diag(cov),
                               rtol=1e-2, atol=1e-3)

    # gradients flow and are finite through the padded factorisation
    g = jax.grad(lambda p: gp.mll(p, jnp.asarray(xt), jnp.asarray(yt)))(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_assume_pd_bit_identical(rng):
    """assume_pd=True (DKT classification's fast path: skip the jitter
    probe) must be BIT-identical to the safe path whenever the probe would
    pick jitter 0 — i.e. on any PD noisy Gram. bncossim-style setup: PSD
    linear kernel on unit-norm features + fixed noise 0.1."""
    z = rng.randn(30, 8).astype(np.float32)
    z = z / np.linalg.norm(z, axis=-1, keepdims=True)
    y = np.where(rng.rand(30) > 0.5, 1.0, -1.0).astype(np.float32)
    zq = rng.randn(7, 8).astype(np.float32)
    lik = GaussianLikelihood(trainable=False, fixed_noise=0.1)
    safe = ExactGP(make_kernel("cossim"), lik, force_dense=True)
    fast = safe._replace(assume_pd=True)
    params = safe.init(jax.random.PRNGKey(0))

    m_safe = safe.mll(params, jnp.asarray(z), jnp.asarray(y))
    m_fast = fast.mll(params, jnp.asarray(z), jnp.asarray(y))
    assert float(m_safe) == float(m_fast)  # bit-exact, not approx

    g_safe = jax.grad(lambda p: safe.mll(p, jnp.asarray(z), jnp.asarray(y)))(params)
    g_fast = jax.grad(lambda p: fast.mll(p, jnp.asarray(z), jnp.asarray(y)))(params)
    for a, b in zip(jax.tree.leaves(g_safe), jax.tree.leaves(g_fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p_safe = safe.posterior(params, jnp.asarray(z), jnp.asarray(y), jnp.asarray(zq))
    p_fast = fast.posterior(params, jnp.asarray(z), jnp.asarray(y), jnp.asarray(zq))
    np.testing.assert_array_equal(np.asarray(p_safe.mean), np.asarray(p_fast.mean))
    np.testing.assert_array_equal(np.asarray(p_safe.variance),
                                  np.asarray(p_fast.variance))


def test_dkt_constructs_assume_pd():
    """DKT (fixed noise 0.1) opts into the probe-free factorisation; the
    regression track (trainable noise) must NOT."""
    from deep_kernel_transfer_tpu.methods import DKT, DKTRegression
    from deep_kernel_transfer_tpu.models.backbones import MLP2, ConvNetS

    m = DKT(ConvNetS(depth=2), n_way=2, n_support=2, kernel_type="bncossim")
    assert m.gp.assume_pd
    r = DKTRegression(MLP2(), feat_dim=40, kernel_type="rbf")
    assert not r.gp.assume_pd
