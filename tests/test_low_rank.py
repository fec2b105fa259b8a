"""Woodbury low-rank GP path (gp/low_rank.py) parity vs the dense engine.

The linear kernel family is exactly K = s Phi Phi^T, so the Woodbury MLL /
posterior must match the dense Cholesky path to f32 accuracy while never
building the [N, N] Gram."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu.gp import (
    ExactGP,
    GaussianLikelihood,
    make_kernel,
)
from deep_kernel_transfer_tpu.gp.kernels import Kernel
from deep_kernel_transfer_tpu.gp.exact import init_batched, sum_mll

N, D, M = 200, 24, 17


def _gps(kind):
    k = make_kernel(kind)
    dense_k = Kernel(k.init, k.apply, None)  # force the dense path
    lik = GaussianLikelihood(trainable=False, fixed_noise=0.1)
    return ExactGP(k, lik), ExactGP(dense_k, lik)


def _data(seed=0, normalize=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(N, D).astype(np.float32)
    xq = rng.randn(M, D).astype(np.float32)
    if normalize:
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        xq /= np.linalg.norm(xq, axis=-1, keepdims=True)
    y = rng.randn(N).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(xq)


@pytest.mark.parametrize("kind", ["linear", "cossim", "bncossim", "poli1"])
def test_mll_and_posterior_parity(kind):
    gp, gp_dense = _gps(kind)
    params = gp.init(jax.random.PRNGKey(0))
    x, y, xq = _data(normalize=kind in ("cossim", "bncossim"))

    assert gp._use_low_rank(params, x)
    m_lr = float(gp.mll(params, x, y))
    m_d = float(gp_dense.mll(params, x, y))
    assert abs(m_lr - m_d) < 5e-4 * max(1.0, abs(m_d)), (m_lr, m_d)

    p_lr = gp.posterior(params, x, y, xq)
    p_d = gp_dense.posterior(params, x, y, xq)
    np.testing.assert_allclose(np.asarray(p_lr.mean), np.asarray(p_d.mean),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(p_lr.variance),
                               np.asarray(p_d.variance), rtol=5e-3, atol=5e-3)

    pc_lr = gp.posterior(params, x, y, xq, full_covariance=True)
    pc_d = gp_dense.posterior(params, x, y, xq, full_covariance=True)
    np.testing.assert_allclose(np.asarray(pc_lr.covariance),
                               np.asarray(pc_d.covariance),
                               rtol=5e-3, atol=5e-3)


def test_gradient_parity():
    gp, gp_dense = _gps("linear")
    params = gp.init(jax.random.PRNGKey(0))
    x, y, _ = _data()
    g_lr = jax.grad(lambda p: -gp.mll(p, x, y))(params)
    g_d = jax.grad(lambda p: -gp_dense.mll(p, x, y))(params)
    for a, b in zip(jax.tree.leaves(g_lr), jax.tree.leaves(g_d)):
        denom = float(jnp.abs(b).max()) + 1e-8
        assert float(jnp.abs(a - b).max()) / denom < 5e-3


def test_small_n_stays_dense():
    """With N < 2D the routing keeps the dense path (identical object)."""
    gp, _ = _gps("linear")
    params = gp.init(jax.random.PRNGKey(0))
    x_small = jnp.asarray(np.random.RandomState(0).randn(30, D), jnp.float32)
    assert not gp._use_low_rank(params, x_small)
    # rbf has no low-rank structure at any size
    rbf_gp = ExactGP(make_kernel("rbf"),
                     GaussianLikelihood(trainable=False, fixed_noise=0.1))
    rp = rbf_gp.init(jax.random.PRNGKey(0))
    assert not rbf_gp._use_low_rank(rp, x_small)


def test_force_dense_field_toggle(monkeypatch):
    """ExactGP.force_dense (benchmarks/woodbury_workload.py A/B hatch)
    disables the Woodbury route; the dense result matches. The env var
    DKT_GP_FORCE_DENSE maps onto the field once, at DKT construction —
    never at trace time (ADVICE r3: jitted entries cache per object)."""
    gp, _ = _gps("linear")
    params = gp.init(jax.random.PRNGKey(0))
    x, y, _ = _data()
    assert gp._use_low_rank(params, x)
    mll_w = float(gp.mll(params, x, y))
    gp_dense = gp._replace(force_dense=True)
    assert not gp_dense._use_low_rank(params, x)
    mll_d = float(gp_dense.mll(params, x, y))
    assert abs(mll_w - mll_d) < 1e-4
    # env var is consumed at construction only
    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.models.backbones import ConvNetS

    monkeypatch.setenv("DKT_GP_FORCE_DENSE", "1")
    assert DKT(ConvNetS(depth=2), n_way=2, n_support=1).gp.force_dense
    monkeypatch.delenv("DKT_GP_FORCE_DENSE")
    assert not DKT(ConvNetS(depth=2), n_way=2, n_support=1).gp.force_dense
    # explicit kwarg beats the env var
    monkeypatch.setenv("DKT_GP_FORCE_DENSE", "1")
    assert not DKT(ConvNetS(depth=2), n_way=2, n_support=1,
                   force_dense=False).gp.force_dense
    # falsy spellings are OFF (ADVICE r4: "0" must not force dense)
    for off in ("0", "false", "FALSE", "off", "", " "):
        monkeypatch.setenv("DKT_GP_FORCE_DENSE", off)
        assert not DKT(ConvNetS(depth=2), n_way=2, n_support=1).gp.force_dense
    # the regression track honours the same contract (ADVICE r4)
    from deep_kernel_transfer_tpu.methods import DKTRegression
    from deep_kernel_transfer_tpu.models.backbones import MLP2

    monkeypatch.setenv("DKT_GP_FORCE_DENSE", "1")
    assert DKTRegression(MLP2(), feat_dim=40).gp.force_dense
    monkeypatch.setenv("DKT_GP_FORCE_DENSE", "0")
    assert not DKTRegression(MLP2(), feat_dim=40).gp.force_dense


_TPU_PARITY_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU"); raise SystemExit(0)
from deep_kernel_transfer_tpu.gp import ExactGP, GaussianLikelihood, make_kernel
from deep_kernel_transfer_tpu.gp.kernels import Kernel

N, D, M = 512, 64, 33
k = make_kernel("linear")
lik = GaussianLikelihood(trainable=False, fixed_noise=0.1)
gp, gp_dense = ExactGP(k, lik), ExactGP(Kernel(k.init, k.apply, None), lik)
params = gp.init(jax.random.PRNGKey(0))
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(N, D).astype(np.float32))
y = jnp.asarray(rng.randn(N).astype(np.float32))
xq = jnp.asarray(rng.randn(M, D).astype(np.float32))
assert gp._use_low_rank(params, x)

# the Woodbury terms are near-cancelling: any default-precision (bf16)
# matmul in the chain blows these tolerances by orders of magnitude
m_lr, m_d = float(jax.jit(gp.mll)(params, x, y)), float(jax.jit(gp_dense.mll)(params, x, y))
assert abs(m_lr - m_d) < 5e-4 * max(1.0, abs(m_d)), (m_lr, m_d)

p_lr = jax.jit(gp.posterior)(params, x, y, xq)
p_d = jax.jit(gp_dense.posterior)(params, x, y, xq)
assert np.allclose(np.asarray(p_lr.mean), np.asarray(p_d.mean),
                   rtol=2e-3, atol=2e-3)
assert np.allclose(np.asarray(p_lr.variance), np.asarray(p_d.variance),
                   rtol=5e-3, atol=5e-3)

g_lr = jax.jit(jax.grad(lambda p: -gp.mll(p, x, y)))(params)
g_d = jax.jit(jax.grad(lambda p: -gp_dense.mll(p, x, y)))(params)
for a, b in zip(jax.tree.leaves(g_lr), jax.tree.leaves(g_d)):
    denom = float(jnp.abs(b).max()) + 1e-8
    assert float(jnp.abs(a - b).max()) / denom < 5e-3
print("WOODBURY_TPU_OK")
"""


def test_woodbury_parity_on_tpu():
    """Dense-vs-Woodbury parity ON THE MXU: catches any contraction in
    gp/low_rank.py that falls back to default (bf16) precision — invisible
    to the CPU suite, where every matmul is f32 regardless."""
    from tpu_subprocess import run_on_tpu

    run_on_tpu(_TPU_PARITY_SCRIPT, "WOODBURY_TPU_OK")


def test_vmapped_sum_mll_jits():
    """The routing is static, so the batched one-vs-rest surface jits and
    runs through Woodbury unchanged."""
    gp, gp_dense = _gps("bncossim")
    params = init_batched(gp, jax.random.PRNGKey(0), 5)
    x, _, _ = _data(normalize=True)
    yb = jnp.where(jnp.arange(5)[:, None] == (jnp.arange(N) % 5)[None, :],
                   1.0, -1.0)
    f = jax.jit(lambda p, x, y: sum_mll(gp, p, x, y))
    out = float(f(params, x, yb))
    ref = float(sum_mll(gp_dense, params, x, yb))
    assert abs(out - ref) < 5e-3 * max(1.0, abs(ref))


def test_woodbury_padded_capacitance_band_parity():
    """Feature dims D in the 84-89 cholesky-bwd band route through the
    identity-pad workaround inside _m_chol; MLL, its gradient, and the
    posterior must stay exactly parity with the unpadded math (D=80)."""
    from deep_kernel_transfer_tpu.gp.low_rank import (woodbury_mll,
                                                      woodbury_posterior)

    for d in (80, 85):  # outside / inside the padded band
        key = jax.random.PRNGKey(d)
        z = jax.random.normal(key, (200, d)) * 0.3
        zq = jax.random.normal(jax.random.PRNGKey(d + 1), (7, d)) * 0.3
        diff = jax.random.normal(jax.random.PRNGKey(d + 2), (200,))
        s, noise = 0.7, 0.2
        # dense oracle
        k = s * (z @ z.T) + noise * jnp.eye(200)
        L = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((L, True), diff)
        mll_dense = -0.5 * (diff @ alpha
                            + 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
                            + 200 * jnp.log(2 * jnp.pi)) / 200
        np.testing.assert_allclose(
            float(woodbury_mll(z, diff, s, noise)), float(mll_dense),
            rtol=2e-5)
        g = jax.grad(lambda zz: woodbury_mll(zz, diff, s, noise))(z)
        assert np.all(np.isfinite(np.asarray(g)))
        mean_adj, var, _ = woodbury_posterior(z, diff, zq, s, noise)
        mean_dense = s * (zq @ (z.T @ alpha))
        np.testing.assert_allclose(np.asarray(mean_adj),
                                   np.asarray(mean_dense), rtol=2e-4,
                                   atol=2e-4)
        kqq = s * (zq @ zq.T)
        kqt = s * (zq @ z.T)
        cov_dense = kqq - kqt @ jax.scipy.linalg.cho_solve((L, True), kqt.T)
        np.testing.assert_allclose(np.asarray(var),
                                   np.asarray(jnp.diagonal(cov_dense)),
                                   rtol=2e-3, atol=2e-4)


def test_spectral_init_single_point_task():
    """initialize_spectral_from_data must not crash on a 1-sample task
    (zero-size gaps axis -> unit-spacing fallback)."""
    from deep_kernel_transfer_tpu.gp.kernels import (
        initialize_spectral_from_data, make_kernel)

    kern = make_kernel("spectral", dim=3, num_mixtures=4)
    params = kern.init(jax.random.PRNGKey(0))
    x1 = jnp.ones((1, 3))
    y1 = jnp.ones((1,))
    out = initialize_spectral_from_data(params, x1, y1,
                                        jax.random.PRNGKey(1))
    assert all(np.all(np.isfinite(np.asarray(v))) for v in out.values())
