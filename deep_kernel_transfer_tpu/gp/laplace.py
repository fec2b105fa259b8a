"""Laplace-approximation GP classification — from-scratch JAX rebuild of the
sklearn escape hatch the reference uses at test time
(reference methods/DKT.py:207-222: GaussianProcessClassifier with
1.0 * RBF(length_scale=0.1), optimizer=None, one-vs-rest).

Binary Laplace GPC follows Rasmussen & Williams, "Gaussian Processes for
Machine Learning", Algorithms 3.1/3.2 (logistic link): Newton iterations on
the latent posterior mode with the numerically-stable B = I + W^1/2 K W^1/2
parameterisation, then a probit-approximated predictive probability. The
one-vs-rest multiclass wrapper is a vmap over the way axis — all ways fit
in ONE batched Newton solve (the reference's sklearn call is sequential
per-way on the CPU).

Everything is jit/vmap-safe with a fixed Newton iteration count
(lax.fori_loop), so the whole test-time path stays on the TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .kernels import hdot, sq_dist

Array = jax.Array

# GP numerics contract (see gp/exact.py): MXU contractions stay f32
_dot = hdot


def rbf_gram(x1: Array, x2: Array, lengthscale: float = 0.1,
             outputscale: float = 1.0) -> Array:
    """1.0 * RBF(0.1) of the reference's sklearn kernel (DKT.py:212)."""
    return outputscale * jnp.exp(-0.5 * sq_dist(x1, x2) / (lengthscale**2))


def _newton_mode(K: Array, t: Array, n_iters: int = 30):
    """Find the posterior mode f_hat for binary targets t in {0,1}.

    R&W Algorithm 3.1 with fixed iteration count (monotone convergence;
    30 Newton steps is far past convergence for N <= a few hundred)."""
    n = K.shape[0]
    eye = jnp.eye(n, dtype=K.dtype)

    def body(_, f):
        pi = jax.nn.sigmoid(f)
        W = pi * (1.0 - pi)
        sw = jnp.sqrt(W)
        B = eye + sw[:, None] * K * sw[None, :]
        L = jnp.linalg.cholesky(B)
        b = W * f + (t - pi)
        # a = b - W^1/2 L^-T L^-1 W^1/2 K b
        kb = _dot(K, b)
        v = jax.scipy.linalg.solve_triangular(L, sw * kb, lower=True)
        a = b - sw * jax.scipy.linalg.solve_triangular(L.T, v, lower=False)
        return _dot(K, a)

    f_hat = jax.lax.fori_loop(0, n_iters, body, jnp.zeros(n, dtype=K.dtype))
    return f_hat


def _mode_project(K: Array, t: Array, k_cols: Array, n_iters: int):
    """Shared body of the binary-probability and OvR-ranking paths
    (R&W Algorithm 3.2 lines 2-5): Newton mode, then the projection of the
    query columns k_cols [N, M] through the mode and the stable B
    factorisation. Returns (f_proj, v_sq) where f_proj = k_cols^T (t - pi)
    is the (possibly rescaled) predictive mean and v_sq = sum(v^2, axis=0)
    the matching quadratic term of the predictive variance.

    NOT a duplicate of the Newton loop's last iteration: the loop computes
    pi/W/L at the PENULTIMATE iterate to produce f_hat; prediction needs
    them AT the converged mode, so one recompute here is required for
    exactness."""
    f_hat = _newton_mode(K, t, n_iters)
    pi = jax.nn.sigmoid(f_hat)
    sw = jnp.sqrt(pi * (1.0 - pi))
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    L = jnp.linalg.cholesky(eye + sw[:, None] * K * sw[None, :])
    f_proj = _dot(k_cols.T, t - pi)  # [M]
    v = jax.scipy.linalg.solve_triangular(L, sw[:, None] * k_cols, lower=True)
    return f_proj, jnp.sum(v * v, axis=0)


@partial(jax.jit, static_argnames=("n_iters",))
def laplace_predict_proba(x_train: Array, t: Array, x_query: Array,
                          lengthscale: float = 0.1, outputscale: float = 1.0,
                          n_iters: int = 30) -> Array:
    """Binary Laplace GPC predictive probabilities [M] for targets t in {0,1}.

    Predictive mean f* = k*^T (t - sigmoid(f_hat)); variance via the stable
    B factorisation; probability by the probit (MacKay) approximation
    sigmoid(f* / sqrt(1 + pi v / 8))."""
    K = rbf_gram(x_train, x_train, lengthscale, outputscale)
    k_star = rbf_gram(x_train, x_query, lengthscale, outputscale)  # [N, M]
    f_star, v_sq = _mode_project(K, t, k_star, n_iters)
    k_ss = outputscale  # RBF diagonal
    var = jnp.maximum(k_ss - v_sq, 1e-10)  # [M]
    return jax.nn.sigmoid(f_star / jnp.sqrt(1.0 + jnp.pi * var / 8.0))


@partial(jax.jit, static_argnames=("n_way", "n_iters"))
def laplace_ovr_predict(z_support: Array, y_support: Array, z_query: Array,
                        n_way: int, lengthscale: float = 0.1,
                        n_iters: int = 30) -> Array:
    """One-vs-rest multiclass prediction: [M] argmax class ids.

    vmapped over ways: one batched Newton solve replaces sklearn's
    sequential per-class fit (reference methods/DKT.py:213-217).

    Underflow-proof ranking (measured fix, benchmarks/laplace_probe.py):
    with lengthscale 0.1 on unit-norm features, k* = exp(-50 d^2) spans
    1 .. 1e-87. A naive f32 sigmoid(f*/den) rounds to exactly 0.5 for
    every way once the query sits d^2 >~ 0.3 from all supports, so argmax
    degenerates to way 0 (sklearn's f64 head hits the same wall at
    d^2 ~ 0.74 where 0.5 + eps rounds to 0.5 in f64). The ranking is
    instead computed on per-query RESCALED scores: k~ = exp(-50 (d^2 -
    d^2_min)) has max 1 by construction, and the true probability is
    sigmoid(m * f~ / den) with m = exp(-50 d^2_min) > 0 SHARED by all
    ways of a query — so argmax_w sigmoid(m f~_w / den_w) = argmax_w
    f~_w / den_w exactly, at any distance, with no underflow. This is
    rank-equivalent to infinite-precision sklearn (modulo its erf-blend
    vs our MacKay probit, both monotone in f*); on the digits_real
    --laplace protocol it measures at parity with sklearn's f64 head
    (54.97/67.19 vs 54.16/66.99, overlapping CI95s) while staying
    rank-exact past the distance where sklearn's head saturates."""
    ls2 = lengthscale * lengthscale
    targets = (y_support[None, :] == jnp.arange(n_way)[:, None]).astype(
        z_support.dtype)  # [n_way, N] in {0,1}
    K = rbf_gram(z_support, z_support, lengthscale)
    d2q = sq_dist(z_support, z_query)  # [N, M]
    d2min = jnp.min(d2q, axis=0)  # [M]
    k_tilde = jnp.exp(-0.5 * (d2q - d2min[None, :]) / ls2)  # col-max = 1
    # m^2 = exp(-d2min / ls^2); underflow -> 0 is exact enough: it only
    # feeds the variance as k_ss - m^2 |v~|^2 where |v~|^2 <= N
    m2 = jnp.exp(-d2min / ls2)  # [M]

    def score_one_way(t: Array) -> Array:
        # same mode/factorisation body as laplace_predict_proba, but
        # projected through the RESCALED columns k~ (f_tilde = f* / m) and
        # the true variance recovered via m^2 (v~_sq = v_sq / m^2)
        f_tilde, v_sq_tilde = _mode_project(K, t, k_tilde, n_iters)
        var = jnp.maximum(1.0 - m2 * v_sq_tilde, 1e-10)
        return f_tilde / jnp.sqrt(1.0 + jnp.pi * var / 8.0)

    scores = jax.vmap(score_one_way)(targets)  # [n_way, M]
    return jnp.argmax(scores, axis=0)
