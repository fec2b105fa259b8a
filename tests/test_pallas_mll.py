"""Fused Pallas GP-MLL kernel tests.

The suite's conftest pins JAX to a virtual CPU mesh, and Mosaic interpret
mode is prohibitively slow here (~80s for a trivial kernel), so the real
parity check runs in a SUBPROCESS against the default (TPU) platform and is
skipped when no TPU is reachable.
"""
from tpu_subprocess import run_on_tpu

_PARITY_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU"); raise SystemExit(0)
from deep_kernel_transfer_tpu.ops.pallas import fused_mll as fm

rng = np.random.RandomState(0)
B, N, D, W = 3, 30, 96, 5
z = rng.randn(B, N, D).astype(np.float32)
z /= np.linalg.norm(z, axis=-1, keepdims=True)
labels = np.arange(N) % W
diffs = np.where(labels[None,:] == np.arange(W)[:,None], 1.0, -1.0).astype(np.float32)
diffs = diffs - 0.13  # non-zero constant mean exercises the diff path
scales = np.linspace(0.4, 1.5, W).astype(np.float32)

def ref_mll(z, diffs, scales):
    def one(zb, dw, sw):
        # HIGHEST to match the kernel's pinned MXU precision
        gram = jnp.dot(zb, zb.T, precision=jax.lax.Precision.HIGHEST)
        K = sw * gram + (0.1 + 1e-6) * jnp.eye(N)
        L = jnp.linalg.cholesky(K)
        al = jax.scipy.linalg.cho_solve((L, True), dw)
        return -0.5*(dw @ al + 2*jnp.sum(jnp.log(jnp.diagonal(L)))
                     + N*1.8378770664093453)/N
    return jax.vmap(lambda zb: jax.vmap(lambda dw, sw: one(zb, dw, sw))(diffs, scales))(z)

za, da, sa = jnp.asarray(z), jnp.asarray(diffs), jnp.asarray(scales)
expected = np.asarray(ref_mll(za, da, sa))
got = np.asarray(fm.fused_linear_mll(za, da, sa, N, 0.1))
assert np.abs(expected - got).max() < 1e-5, (expected, got)

gp = jax.grad(lambda z,d,s: -jnp.sum(fm.fused_linear_mll(z,d,s,N,0.1)), argnums=(0,1,2))(za, da, sa)
gr = jax.grad(lambda z,d,s: -jnp.sum(ref_mll(z,d,s)), argnums=(0,1,2))(za, da, sa)
for a, b in zip(gp, gr):
    denom = float(jnp.abs(b).max()) + 1e-8
    assert float(jnp.abs(a-b).max()) / denom < 2e-2, (a, b)
print("PARITY_OK")
"""

_DKT_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU"); raise SystemExit(0)
from deep_kernel_transfer_tpu.methods import DKT
from deep_kernel_transfer_tpu.models.backbones import ConvNetS

x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 5, 16, 16, 3), jnp.float32)
losses = {}
for flag in (False, True):
    m = DKT(ConvNetS(depth=2), 3, 2, kernel_type="bncossim",
            feature_dtype="float32", use_pallas_mll=flag)
    st = m.init(jax.random.PRNGKey(0), x[0])
    losses[flag] = float(m.batch_loss(st.params, x))
assert abs(losses[True] - losses[False]) < 1e-4 * max(1, abs(losses[False])), losses
print("DKT_OK", losses)
"""


_run_on_tpu = run_on_tpu


def test_fused_mll_parity_on_tpu():
    _run_on_tpu(_PARITY_SCRIPT, "PARITY_OK")


def test_dkt_pallas_flag_matches_xla_on_tpu():
    _run_on_tpu(_DKT_SCRIPT, "DKT_OK")


_BLOCKED_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU"); raise SystemExit(0)
from deep_kernel_transfer_tpu.ops.pallas.blocked_cholesky import blocked_cholesky

rng = np.random.RandomState(0)
for N in (256, 512):
    B = 2
    z = rng.randn(B, N, N // 2).astype(np.float32)
    K = jnp.asarray(z @ np.transpose(z, (0, 2, 1))
                    + 0.5 * np.eye(N, dtype=np.float32))
    L = np.asarray(blocked_cholesky(K))
    rec = L @ np.transpose(L, (0, 2, 1))
    rel = np.abs(rec - np.asarray(K)).max() / np.abs(np.asarray(K)).max()
    assert not np.isnan(L).any() and rel < 1e-5, (N, rel)
    assert np.abs(np.triu(L[0], 1)).max() == 0.0  # exactly lower triangular

# gradient parity vs XLA cholesky through a logdet
N, B = 256, 2
z = rng.randn(B, N, N // 2).astype(np.float32)
K = jnp.asarray(z @ np.transpose(z, (0, 2, 1))
                + 0.5 * np.eye(N, dtype=np.float32))
def f(chol_fn, K):
    L = chol_fn(K)
    return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
gp = jax.grad(lambda K: f(blocked_cholesky, K))(K)
gx = jax.grad(lambda K: f(jnp.linalg.cholesky, K))(K)
rel = float(jnp.abs(gp - gx).max() / (jnp.abs(gx).max() + 1e-9))
assert rel < 2e-2, rel
print("BLOCKED_OK")
"""


def test_blocked_cholesky_on_tpu():
    _run_on_tpu(_BLOCKED_SCRIPT, "BLOCKED_OK")


def test_blocked_cholesky_fallback_shapes():
    """Non-tile-aligned or oversized N falls back to XLA (runs on CPU)."""
    import numpy as np
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.ops.pallas.blocked_cholesky import _forward

    rng = np.random.RandomState(0)
    z = rng.randn(2, 50, 30).astype(np.float32)
    K = jnp.asarray(z @ np.transpose(z, (0, 2, 1))
                    + 0.5 * np.eye(50, dtype=np.float32))
    L = _forward(K)  # 50 % 128 != 0 -> XLA path
    np.testing.assert_allclose(np.asarray(L), np.asarray(jnp.linalg.cholesky(K)),
                               atol=1e-5)


_HBM_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
if jax.default_backend() not in ("tpu", "axon"):
    print("NO_TPU"); raise SystemExit(0)
from deep_kernel_transfer_tpu.ops.pallas.hbm_cholesky import (
    hbm_blocked_cholesky, fused_gram_cholesky)

rng = np.random.RandomState(0)
B, N, D = 2, 384, 128  # nt=3 keeps the Mosaic compile quick
z = jnp.asarray(rng.randn(B, N, D).astype(np.float32) * 0.3)
K = jnp.einsum("bnd,bmd->bnm", z, z, precision=jax.lax.Precision.HIGHEST)
L_ref = np.asarray(jnp.linalg.cholesky(K + 1.0 * jnp.eye(N)))

L_h = np.asarray(hbm_blocked_cholesky(K, 1.0))
rel = np.abs(L_h - L_ref).max() / np.abs(L_ref).max()
assert rel < 1e-5, ("general", rel)
assert np.abs(np.triu(L_h[0], 1)).max() == 0.0

L_f = np.asarray(fused_gram_cholesky(z, 1.0, 1.0))
rel = np.abs(L_f - L_ref).max() / np.abs(L_ref).max()
assert rel < 1e-5, ("fused", rel)

# tiled (memory-regime) entry point: same factor, no untile transpose
from deep_kernel_transfer_tpu.ops.pallas.hbm_cholesky import (
    fused_gram_cholesky_tiled, tiled_log_det)
ld = np.asarray(tiled_log_det(fused_gram_cholesky_tiled(z, 1.0, 1.0)))
ld_ref = 2.0 * np.log(np.diagonal(L_ref, axis1=-2, axis2=-1)).sum(-1)
rel = np.abs(ld - ld_ref).max() / np.abs(ld_ref).max()
assert rel < 1e-5, ("tiled logdet", rel)

# gradient parity vs the XLA chain through a logdet + quadratic form
y = jnp.asarray(rng.randn(B, N).astype(np.float32))
def obj(chol_fn):
    def f(z):
        L = chol_fn(z)
        al = jax.scipy.linalg.cho_solve((L[0], True), y[0])
        return (jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
                + 0.5 * y[0] @ al)
    return f
gx = jax.grad(obj(lambda z: jnp.linalg.cholesky(
    jnp.einsum("bnd,bmd->bnm", z, z, precision=jax.lax.Precision.HIGHEST)
    + 1.0 * jnp.eye(N))))(z)
gf = jax.grad(obj(lambda z: fused_gram_cholesky(z, 1.0, 1.0)))(z)
rel = float(jnp.abs(gf - gx).max() / (jnp.abs(gx).max() + 1e-9))
# XLA's cholesky VJP runs its matmuls at default (bf16) precision on TPU,
# so the two f32 gradient chains legitimately differ by a few percent; the
# exact-formula check lives in test_hbm_cholesky_bwd_formula (CPU).
assert rel < 0.1, rel
print("HBM_OK")
"""


def test_hbm_cholesky_on_tpu():
    _run_on_tpu(_HBM_SCRIPT, "HBM_OK")


def test_tiled_log_det_cpu():
    """tiled_log_det reads logdet off the tile-blocked layout — pure jnp,
    checked against the untiled diagonal on CPU."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.ops.pallas.hbm_cholesky import (
        _tile_matrix,
        tiled_log_det,
    )

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 64))
    k = 2.0 * jnp.einsum("bnd,bmd->bnm", z, z) + 0.1 * jnp.eye(256)
    L = jnp.linalg.cholesky(k)
    ld_ref = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    ld = tiled_log_det(_tile_matrix(L))
    assert np.allclose(np.asarray(ld_ref), np.asarray(ld), rtol=1e-6)


def test_hbm_cholesky_bwd_formula():
    """The fused kernel's custom VJP (Murray cholesky reverse + Gram chain)
    matches autodiff through the XLA chain — checked on CPU where both
    sides run the same f32 math (runs in the suite's CPU env)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.ops.pallas.hbm_cholesky import _fused_bwd

    rng = np.random.RandomState(0)
    B, N, D = 2, 48, 16
    z = jnp.asarray(rng.randn(B, N, D).astype(np.float32) * 0.5)
    scale, diag = 0.7, 1.3

    def chol_chain(z):
        K = scale * jnp.einsum("bnd,bmd->bnm", z, z) + diag * jnp.eye(N)
        return jnp.linalg.cholesky(K)

    L = chol_chain(z)
    Lbar = jnp.asarray(rng.randn(B, N, N).astype(np.float32)) * jnp.tril(
        jnp.ones((N, N)))
    _, vjp = jax.vjp(chol_chain, z)
    gz_ref, = vjp(Lbar)
    gz, gs, gd = _fused_bwd((z, jnp.float32(scale), L), Lbar)
    assert float(jnp.abs(gz - gz_ref).max() / jnp.abs(gz_ref).max()) < 2e-2

    f = lambda s, d: jnp.sum(jnp.linalg.cholesky(
        s * jnp.einsum("bnd,bmd->bnm", z, z) + d * jnp.eye(N)) * Lbar)
    gs_ref = jax.grad(f, argnums=0)(jnp.float32(scale), jnp.float32(diag))
    gd_ref = jax.grad(f, argnums=1)(jnp.float32(scale), jnp.float32(diag))
    assert float(abs(gs - gs_ref) / abs(gs_ref)) < 2e-2
    assert float(abs(gd - gd_ref) / abs(gd_ref)) < 2e-2
