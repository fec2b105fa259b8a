"""Woodbury / matrix-determinant-lemma GP path for low-rank kernels.

For the linear kernel family (linear, cossim, bncossim, poli1 — reference
methods/DKT.py:353,362-370) the Gram matrix is EXACTLY
K = s * Z Z^T with Z = Phi(X) [N, D], so for N > D the O(N^3) Cholesky the
reference's GPyTorch stack always runs is the wrong algorithm. With
noise sigma^2:

  (sigma^2 I + s Z Z^T)^-1 = sigma^-2 (I - Z M^-1 Z^T sigma^-2),
      M = s^-1 I_D + sigma^-2 Z^T Z                      [D, D]
  logdet(sigma^2 I + s Z Z^T) = N log sigma^2 + D log s + logdet M

(Sylvester's determinant identity), which turns MLL and posterior into
O(N D^2 + D^3) dense ops — MXU-shaped matmuls plus one D x D Cholesky —
with NO N x N object ever materialised. This is the framework's true
large-support-set scaling answer (SURVEY.md §5): at N=4096, D=256 it
replaces a 23-GFLOP factorisation with ~0.3 GFLOP of matmuls.

The engine (gp/exact.py) routes through here automatically whenever the
kernel exposes `low_rank` and 2*D <= N; everything is plain jnp, so
autodiff, vmap over ways/episodes, and sharding compose untouched.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

# no cycle: exact.py only imports this module inside function bodies
from .exact import (_LOG_2PI, _chol_solve as _cho_solve, _pad_gram,
                    _padded_size, psd_safe_cholesky)
from .kernels import hdot

Array = jax.Array

# EVERY contraction here runs f32 on the MXU: the Woodbury terms are
# near-cancelling differences (e.g. the MLL quad form), so a default
# bf16 pass in any one operand destroys the cancellation and the exact
# parity with the dense path that this module's tests enforce.
_dot = hdot


def _m_chol(z: Array, s, noise):
    """Cholesky of M = s^-1 I + noise^-1 Z^T Z (the [D, D] capacitance).

    The factorisation goes through the same identity-pad workaround as the
    dense path (exact._padded_size): a capacitance dim D in the 84-89 band
    would otherwise re-expose the cholesky-derivative scoped-VMEM compile
    failure the pad exists to avoid. The pad is exact (identity block) and
    solves against zero-padded vectors return the leading block, so every
    consumer slices [:d]."""
    d = z.shape[-1]
    g = _dot(z.T, z)
    m = g / noise + jnp.eye(d, dtype=z.dtype) / s
    d_pad = _padded_size(d)
    return psd_safe_cholesky(_pad_gram(m, d_pad))


def woodbury_mll(z: Array, diff: Array, s, noise) -> Array:
    """Exact MLL of diff ~ N(0, s Z Z^T + noise I), gpytorch 1/N scaling
    (matches ExactGP.mll for low-rank kernels)."""
    n, d = z.shape
    t = _dot(z.T, diff)  # [D]
    lc = _m_chol(z, s, noise)  # [Dp, Dp], identity-padded (exact)
    t_pad = jnp.pad(t, (0, lc.shape[-1] - d))
    quad = (_dot(diff, diff) - _dot(t_pad, _cho_solve(lc, t_pad)) / noise) / noise
    logdet = (n * jnp.log(noise) + d * jnp.log(s)
              # the identity pad's diagonal is 1s: adds exactly 0
              + 2.0 * jnp.sum(jnp.log(jnp.diagonal(lc))))
    return -0.5 * (quad + logdet + n * _LOG_2PI) / n


def woodbury_posterior(
    z_train: Array,
    diff: Array,
    z_query: Array,
    s,
    noise,
    full_covariance: bool = False,
):
    """Posterior mean adjustment and (co)variance of the noise-free f* at
    query features, conditioning on (Z, diff) — the weight-space view of
    the degenerate GP (Rasmussen & Williams eq. 2.11). With
    M = s^-1 I + noise^-1 Z^T Z the Woodbury-expanded function-space
    expressions COLLAPSE exactly (H = Z^T (K+noise I)^-1 Z satisfies
    s I - s^2 H = M^-1):
      mean* = Zq M^-1 t / noise,   t = Z^T diff                    [D]
      cov*  = Zq M^-1 Zq^T
    This form has no large-term cancellation (the subtractive
    function-space form loses ~all variance precision on the MXU: the
    prior and correction terms agree to ~3 decimal digits) and is
    positive-semidefinite by construction.
    Returns (mean_adjustment [M], var [M], cov [M, M] | None)."""
    d = z_train.shape[-1]
    t = _dot(z_train.T, diff)
    lc = _m_chol(z_train, s, noise)  # [Dp, Dp], identity-padded (exact)
    t_pad = jnp.pad(t, (0, lc.shape[-1] - d))
    mean_adj = _dot(z_query, _cho_solve(lc, t_pad)[:d]) / noise
    # U = Lc^-1 Zq^T  =>  Zq M^-1 Zq^T = U^T U; zero-padded rows of Zq^T
    # solve to zero rows of U under the block-diag factor, adding 0 to U^T U
    zq_pad = jnp.pad(z_query.T, ((0, lc.shape[-1] - d), (0, 0)))
    u = jax.scipy.linalg.solve_triangular(lc, zq_pad, lower=True)
    var = jnp.sum(u * u, axis=0)
    if full_covariance:
        return mean_adj, var, _dot(u.T, u)
    return mean_adj, var, None
