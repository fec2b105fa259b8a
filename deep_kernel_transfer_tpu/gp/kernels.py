"""Kernel zoo for the ExactGP engine — pure-functional, vmap/grad-friendly.

Replaces the GPyTorch kernels consumed by the reference implementation
(reference methods/DKT.py:351-372, methods/DKT_regression.py:117-124,
sines/train_DKT.py:132): RBF, Matern(nu=2.5), Linear, Polynomial(power 1/2),
cosine-similarity (Linear with unit variance over L2-normalised features),
ScaleKernel wrapper, and the ARD Spectral-Mixture kernel.

Parameterisation follows GPyTorch for checkpoint/behaviour parity: every
positive hyperparameter theta is stored as an unconstrained `raw_theta` with
theta = softplus(raw_theta); raw init of 0 gives theta ~= 0.6931.

All `apply` functions are pure: `apply(params, x1, x2) -> Gram[N1, N2]`.
They contain only static shapes and matmul/elementwise ops so XLA maps the
heavy lifting (the x1 @ x2.T contraction) onto the MXU and fuses the rest.
Batching over the one-vs-rest "way" axis or over episodes is done with
`jax.vmap` at the call site — never with python loops.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

def softplus(x: Array) -> Array:
    return jax.nn.softplus(x)


def inv_softplus(y) -> Array:
    """Inverse of softplus, for initialising raw parameters to a target value."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def sq_dist(x1: Array, x2: Array) -> Array:
    """Pairwise squared euclidean distances, MXU-friendly.

    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b — one [N1,D]x[D,N2] matmul plus
    cheap elementwise ops that XLA fuses. Clamped at 0 for numerical safety.
    """
    x1n = jnp.sum(jnp.square(x1), axis=-1, keepdims=True)  # [N1, 1]
    x2n = jnp.sum(jnp.square(x2), axis=-1, keepdims=True).T  # [1, N2]
    cross = _dot_f32(x1, x2)
    return jnp.maximum(x1n + x2n - 2.0 * cross, 0.0)


def _dot_f32(x1: Array, x2: Array) -> Array:
    """x1 @ x2.T at full f32 MXU precision.

    Gram matrices feed a Cholesky, so the default bf16 MXU passes are not
    accurate enough; HIGHEST requests the f32 (multi-pass) MXU mode. The
    matrices here are tiny (N ~ 1e2), so the extra passes are free."""
    return jnp.dot(
        x1,
        x2.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def hdot(a: Array, b: Array) -> Array:
    """jnp.dot at HIGHEST precision — the engine-wide f32-MXU contract
    helper shared by exact.py / low_rank.py / laplace.py (one definition
    so a future precision-policy change cannot silently diverge)."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


def dist(x1: Array, x2: Array) -> Array:
    """Pairwise euclidean distance with a safe sqrt (grad-finite at 0)."""
    d2 = sq_dist(x1, x2)
    # sqrt has an infinite gradient at exactly 0 (the diagonal); clamp below.
    return jnp.sqrt(jnp.maximum(d2, 1e-30))


class Kernel(NamedTuple):
    """A pure-functional kernel: parameter initialiser + Gram function.

    `low_rank`, when set, exposes the kernel's exact factored structure
    k(X, X) = s * Phi(X) Phi(X)^T as params, x -> (s, Phi(X)); the GP
    engine uses it to route large-N problems through the Woodbury /
    matrix-determinant-lemma path (gp/low_rank.py) at O(N D^2) instead of
    an O(N^3) Cholesky. Linear-family kernels (linear, cossim, bncossim,
    poli1) are exactly low-rank; RBF/Matern/spectral leave it None."""

    init: Callable[[Array], dict]  # key -> params pytree
    apply: Callable[[dict, Array, Array], Array]  # (params, x1, x2) -> Gram
    low_rank: Callable[[dict, Array], tuple] | None = None


# ---------------------------------------------------------------------------
# Base kernels
# ---------------------------------------------------------------------------


def rbf_kernel() -> Kernel:
    """k(a,b) = exp(-0.5 ||(a-b)/l||^2); scalar lengthscale like gpytorch
    RBFKernel default (reference methods/DKT.py:356)."""

    def init(key):
        del key
        return {"raw_lengthscale": jnp.zeros(())}

    def apply(params, x1, x2):
        ls = softplus(params["raw_lengthscale"])
        return jnp.exp(-0.5 * sq_dist(x1 / ls, x2 / ls))

    return Kernel(init, apply)


def matern_kernel(nu: float = 2.5) -> Kernel:
    """Matern kernel, gpytorch default nu=2.5 (reference methods/DKT.py:359)."""

    def init(key):
        del key
        return {"raw_lengthscale": jnp.zeros(())}

    def apply(params, x1, x2):
        ls = softplus(params["raw_lengthscale"])
        d = dist(x1 / ls, x2 / ls)
        if nu == 0.5:
            return jnp.exp(-d)
        if nu == 1.5:
            c = jnp.sqrt(3.0) * d
            return (1.0 + c) * jnp.exp(-c)
        if nu == 2.5:
            c = jnp.sqrt(5.0) * d
            return (1.0 + c + c * c / 3.0) * jnp.exp(-c)
        raise ValueError(f"unsupported matern nu={nu}")

    return Kernel(init, apply)


def linear_kernel(train_variance: bool = True) -> Kernel:
    """k(a,b) = v * a.b — gpytorch LinearKernel (reference methods/DKT.py:353).

    For cossim/bncossim the variance is frozen at 1.0 and the inputs are
    L2-normalised upstream (reference methods/DKT.py:366-370); we express the
    freeze by simply omitting the parameter from the trainable pytree.
    """

    if train_variance:

        def init(key):
            del key
            return {"raw_variance": jnp.zeros(())}

        def apply(params, x1, x2):
            v = softplus(params["raw_variance"])
            return v * _dot_f32(x1, x2)

        def low_rank(params, x):
            return softplus(params["raw_variance"]), x

    else:

        def init(key):
            del key
            return {}

        def apply(params, x1, x2):
            return _dot_f32(x1, x2)

        def low_rank(params, x):
            del params
            return jnp.ones(()), x

    return Kernel(init, apply, low_rank)


def polynomial_kernel(power: int) -> Kernel:
    """k(a,b) = (a.b + offset)^power — gpytorch PolynomialKernel
    (reference methods/DKT.py:362-365, poli1/poli2)."""

    def init(key):
        del key
        return {"raw_offset": jnp.zeros(())}

    def apply(params, x1, x2):
        offset = softplus(params["raw_offset"])
        base = _dot_f32(x1, x2) + offset
        return base**power

    if power == 1:
        # (a.b + c) is exactly low-rank: Phi(x) = [x, sqrt(c)]
        def low_rank(params, x):
            offset = softplus(params["raw_offset"])
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            return jnp.ones(()), jnp.concatenate(
                [x, jnp.sqrt(offset) * ones], axis=-1)

        return Kernel(init, apply, low_rank)
    return Kernel(init, apply)


def scale(base: Kernel) -> Kernel:
    """gpytorch ScaleKernel wrapper: k = outputscale * base(a,b)."""

    def init(key):
        return {"raw_outputscale": jnp.zeros(()), "base": base.init(key)}

    def apply(params, x1, x2):
        s = softplus(params["raw_outputscale"])
        return s * base.apply(params["base"], x1, x2)

    low_rank = None
    if base.low_rank is not None:
        def low_rank(params, x):
            s = softplus(params["raw_outputscale"])
            bs, z = base.low_rank(params["base"], x)
            return s * bs, z

    return Kernel(init, apply, low_rank)


def spectral_mixture_kernel(num_mixtures: int, ard_num_dims: int) -> Kernel:
    """ARD spectral mixture kernel (Wilson & Adams 2013).

    k(tau) = sum_q w_q * prod_d exp(-2 pi^2 tau_d^2 s_{qd}^2) cos(2 pi tau_d mu_{qd})
    with tau = a - b. Matches gpytorch SpectralMixtureKernel as used at
    reference methods/DKT_regression.py:122 (num_mixtures=4, ard_num_dims=2916)
    and sines/train_DKT.py:132 (ard_num_dims=40). Raw init matches
    gpytorch's: raw_mixture_weights ZEROS (all mixtures start at
    softplus(0) = log 2), raw means/scales N(0,1). (Data-driven init
    lives in initialize_spectral_from_data; the reference never calls
    its gpytorch counterpart.)

    TPU note: the naive formulation would materialise [N1, N2, D] deltas; for
    ard_num_dims=2916 and N=19 that is fine, but we nevertheless compute the
    exp term via an MXU matmul trick:
      sum_d tau_d^2 s_d^2 = ||a s||^2 + ||b s||^2 - 2 (a s).(b s)
    so the only [N1,N2,D] tensor is the cosine phase, computed per-mixture
    inside a lax scan (q is tiny: 4).
    """

    q, d = num_mixtures, ard_num_dims

    def init(key):
        k2, k3 = jax.random.split(key)
        return {
            "raw_weights": jnp.zeros((q,)),  # gpytorch: zeros
            "raw_means": jax.random.normal(k2, (q, d)),
            "raw_scales": jax.random.normal(k3, (q, d)),
        }

    def apply(params, x1, x2):
        w = softplus(params["raw_weights"])  # [q]
        mu = softplus(params["raw_means"])  # [q, d]
        sig = softplus(params["raw_scales"])  # [q, d]

        two_pi = 2.0 * jnp.pi

        def one_mixture(carry, inputs):
            w_q, mu_q, sig_q = inputs
            a = x1 * sig_q
            b = x2 * sig_q
            exp_term = jnp.exp(-2.0 * jnp.pi**2 * sq_dist(a, b))  # [N1,N2]
            # cos(2 pi sum_d tau_d mu_d) per gpytorch's product-of-cos form:
            # gpytorch uses prod_d cos(2 pi tau_d mu_qd); reproduce exactly.
            tau = x1[:, None, :] - x2[None, :, :]  # [N1,N2,D]
            cos_term = jnp.prod(jnp.cos(two_pi * tau * mu_q), axis=-1)
            return carry + w_q * exp_term * cos_term, None

        n1, n2 = x1.shape[0], x2.shape[0]
        out, _ = jax.lax.scan(
            one_mixture, jnp.zeros((n1, n2), x1.dtype), (w, mu, sig)
        )
        return out

    return Kernel(init, apply)


def initialize_spectral_from_data(params: dict, x: "Array", y: "Array",
                                  key: "Array") -> dict:
    """Data-driven spectral-mixture init (gpytorch's initialize_from_data
    heuristic; OPTIONAL — the reference never calls it, so random init is
    the parity default).

    Heuristic: mixture weights = std(y)/Q; frequency means ~ U(0,
    0.5/min_dist) per dim (Nyquist-bounded); inverse scales ~ |N(0,1)| /
    max_dist per dim. Returns updated raw params (inverse-softplus'd).
    """
    q, d = params["raw_means"].shape
    xs = jnp.sort(x, axis=0)  # [N, D]
    gaps = jnp.diff(xs, axis=0)  # [N-1, D]  (zero-size when N == 1)
    if gaps.shape[0] == 0:  # single-point task: fall back to unit spacing
        min_dist = jnp.ones((xs.shape[1],), xs.dtype)
    else:
        min_dist = jnp.min(jnp.where(gaps > 0, gaps, jnp.inf), axis=0)  # [D]
        min_dist = jnp.where(jnp.isfinite(min_dist), min_dist, 1.0)
    max_dist = jnp.maximum(xs[-1] - xs[0], 1e-6)  # [D]

    k1, k2 = jax.random.split(key)
    means = jax.random.uniform(k1, (q, d)) * (0.5 / min_dist)[None, :]
    scales = jnp.abs(jax.random.normal(k2, (q, d))) / max_dist[None, :] + 1e-6
    weights = jnp.full((q,), jnp.std(y) / q) + 1e-6
    return {
        "raw_weights": inv_softplus(weights),
        "raw_means": inv_softplus(jnp.maximum(means, 1e-6)),
        "raw_scales": inv_softplus(scales),
    }


# ---------------------------------------------------------------------------
# Registry: kernel_type strings of the reference config (configs.py:7)
# ---------------------------------------------------------------------------


def make_kernel(kind: str, dim: int | None = None, num_mixtures: int = 4) -> Kernel:
    """Build the covariance module for a reference `kernel_type` string.

    Mirrors the switch in reference methods/DKT.py:351-372 (classification)
    and methods/DKT_regression.py:117-124 (regression adds 'spectral').
    """
    kind_l = kind.lower()
    if kind_l == "linear":
        return scale(linear_kernel(train_variance=True))
    if kind_l == "rbf":
        return scale(rbf_kernel())
    if kind_l == "matern":
        return scale(matern_kernel(2.5))
    if kind_l == "poli1":
        return scale(polynomial_kernel(1))
    if kind_l == "poli2":
        return scale(polynomial_kernel(2))
    if kind_l in ("cossim", "bncossim"):
        return scale(linear_kernel(train_variance=False))
    if kind_l == "spectral":
        if dim is None:
            raise ValueError("spectral kernel needs the feature dim (ard_num_dims)")
        return spectral_mixture_kernel(num_mixtures=num_mixtures, ard_num_dims=dim)
    raise ValueError(f"[ERROR] the kernel '{kind}' is not supported!")


def normalizes_features(kind: str) -> bool:
    """cossim/bncossim L2-normalise the deep features before the GP
    (reference methods/DKT.py:43-50, 141-142)."""
    return kind.lower() in ("cossim", "bncossim")
