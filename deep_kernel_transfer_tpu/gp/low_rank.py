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

Array = jax.Array

_LOG_2PI = 1.8378770664093453


def _m_chol(z: Array, s, noise):
    """Cholesky of M = s^-1 I + noise^-1 Z^T Z (the [D, D] capacitance)."""
    d = z.shape[-1]
    from .exact import psd_safe_cholesky  # runtime import (exact imports us)

    g = jnp.dot(z.T, z, precision=jax.lax.Precision.HIGHEST)
    m = g / noise + jnp.eye(d, dtype=z.dtype) / s
    return psd_safe_cholesky(m)


def _cho_solve(lc: Array, b: Array) -> Array:
    y = jax.scipy.linalg.solve_triangular(lc, b, lower=True)
    return jax.scipy.linalg.solve_triangular(lc.T, y, lower=False)


def woodbury_mll(z: Array, diff: Array, s, noise) -> Array:
    """Exact MLL of diff ~ N(0, s Z Z^T + noise I), gpytorch 1/N scaling
    (matches ExactGP.mll for low-rank kernels)."""
    n, d = z.shape
    t = jnp.dot(z.T, diff, precision=jax.lax.Precision.HIGHEST)  # [D]
    lc = _m_chol(z, s, noise)
    quad = (jnp.dot(diff, diff) - jnp.dot(t, _cho_solve(lc, t)) / noise) / noise
    logdet = (n * jnp.log(noise) + d * jnp.log(s)
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
    query features, conditioning on (Z, diff):
      mean* = s Zq w,            w = Z^T (K + noise I)^-1 diff     [D]
      cov*  = s Zq Zq^T - s^2 Zq H Zq^T,
              H = Z^T (K + noise I)^-1 Z                           [D, D]
    Returns (mean_adjustment [M], var [M], cov [M, M] | None)."""
    g = jnp.dot(z_train.T, z_train, precision=jax.lax.Precision.HIGHEST)
    t = jnp.dot(z_train.T, diff, precision=jax.lax.Precision.HIGHEST)
    lc = _m_chol(z_train, s, noise)
    w = (t - jnp.dot(g, _cho_solve(lc, t)) / noise) / noise        # [D]
    h = (g - jnp.dot(g, _cho_solve(lc, g)) / noise) / noise        # [D, D]
    mean_adj = s * jnp.dot(z_query, w)
    zq_h = jnp.dot(z_query, h, precision=jax.lax.Precision.HIGHEST)
    var = (s * jnp.sum(z_query * z_query, axis=-1)
           - s * s * jnp.sum(zq_h * z_query, axis=-1))
    if full_covariance:
        cov = (s * jnp.dot(z_query, z_query.T)
               - s * s * jnp.dot(zq_h, z_query.T))
        return mean_adj, var, cov
    return mean_adj, var, None
