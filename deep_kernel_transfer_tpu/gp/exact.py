"""ExactGP engine: jittered Cholesky, marginal log-likelihood, posterior.

This is the from-scratch replacement for the GPyTorch machinery the reference
outsources to (`ExactGP` + `set_train_data` conditioning,
`ExactMarginalLogLikelihood`, `SumMarginalLogLikelihood` over an
`IndependentModelList` — reference methods/DKT.py:58-71,
methods/DKT_regression.py:25-37).

Everything here is a pure function of (params, data): conditioning on a
support set is just passing different arrays, so the reference's stateful
`set_train_data` dance disappears. All functions are jit/vmap/grad-safe with
static shapes; batching over the one-vs-rest way axis or over episodes is
done by `jax.vmap` at the call site, which turns the per-way python loop of
the reference into ONE batched [n_way, N, N] Cholesky on the TPU.

Numerical robustness: the reference documents "Matrix not positive definite"
failures (reference README.md:27). We use an in-graph jitter-escalation
Cholesky (`psd_safe_cholesky`) implemented with lax.while_loop so it never
round-trips to the host.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .distributions import MultivariateNormal
from .kernels import Kernel, hdot
from .likelihoods import GaussianLikelihood
from .means import constant_mean, constant_mean_init

Array = jax.Array

_LOG_2PI = 1.8378770664093453

# GP numerics contract: every MXU contraction in the engine runs f32
# (Mosaic/XLA lower default-precision f32 dots to bf16 on TPU, which the
# CPU test mesh cannot see); one shared helper — kernels.hdot
_dot = hdot


def psd_safe_cholesky(mat: Array, initial_jitter: float = 1e-6, max_tries: int = 9) -> Array:
    """Cholesky with in-graph jitter escalation (no host round-trips).

    jnp.linalg.cholesky returns NaNs on a non-PD input instead of raising, so
    escalation is a lax.while_loop that retries with jitter
    initial_jitter * 10**i until the factor is finite (mirrors gpytorch's
    psd_safe_cholesky, needed per reference README.md:27). max_tries=9 takes
    the jitter up to 1e2 — far above any Gram this engine builds (bncossim
    diagonals are ~1.1), so a finite input always factors. On true
    exhaustion the next UNTRIED level is used (not the one that just
    failed); gpytorch raises NotPSDError there, which an in-graph op cannot
    — a NaN factor (and loss) is the in-jit analogue.

    Cost note: the common PD case pays TWO factorisations (the phase-1
    probe — whose while_loop exits after its initial cholesky — plus the
    differentiable phase-2 one). A lax.cond fast path would not help:
    under vmap cond lowers to select so both branches execute anyway, and
    phase 2 must stay differentiable so it cannot reuse the stop-gradient
    probe.
    """
    n = mat.shape[-1]
    eye = jnp.eye(n, dtype=mat.dtype)

    # Phase 1 — find the smallest sufficient jitter on a stop-gradient copy.
    # lax.while_loop is not reverse-differentiable, so the search must not see
    # tangents; the jitter level itself is a discrete choice with zero
    # gradient anyway.
    m0 = jax.lax.stop_gradient(mat)

    def bad(state):
        i, chol = state
        return jnp.logical_and(jnp.any(~jnp.isfinite(chol)), i < max_tries)

    def retry(state):
        i, _ = state
        jitter = initial_jitter * (10.0**i)
        return i + 1.0, jnp.linalg.cholesky(m0 + jitter * eye)

    tries, probe = jax.lax.while_loop(
        bad, retry, (jnp.asarray(0.0, mat.dtype), jnp.linalg.cholesky(m0))
    )
    ok = jnp.all(jnp.isfinite(probe))
    jitter = jnp.where(
        ok,
        jnp.where(tries > 0, initial_jitter * (10.0 ** (tries - 1.0)), 0.0),
        initial_jitter * (10.0 ** tries),  # exhausted: escalate once more
    )

    # Phase 2 — one differentiable Cholesky at the selected jitter.
    return jnp.linalg.cholesky(mat + jitter * eye)


def _chol_solve(chol: Array, b: Array) -> Array:
    """Solve (L L^T) x = b given lower-triangular L."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def _padded_size(n: int) -> int:
    """Toolchain workaround: XLA's cholesky/triangular-solve DERIVATIVE
    fails to compile for Gram sizes in the ~84-88 band under a large vmap
    (InvertDiagBlocksLowerTriangular wants 18.3 MB scoped VMEM against the
    16 MB ceiling; 90/96/100/128 compile fine at the same batch). Sizes in
    the band are padded to 96 with an identity block — EXACT math: for the
    block-diagonal [[K, 0], [0, I]] the factor, solves against zero-padded
    vectors, and the leading-diagonal logdet are unchanged (the 5-way
    1-shot 16-query episode, N=85, sits exactly in the band)."""
    return 96 if 84 <= n <= 89 else n


def _pad_gram(k_noisy: Array, n_pad: int) -> Array:
    """[N, N] SPD -> [n_pad, n_pad] block-diag with an identity tail."""
    n = k_noisy.shape[-1]
    if n_pad == n:
        return k_noisy
    out = jnp.eye(n_pad, dtype=k_noisy.dtype)
    return out.at[:n, :n].set(k_noisy)


class ExactGP(NamedTuple):
    """A GP prior spec = (mean, kernel, likelihood). Pure configuration.

    Parameters live in a plain dict pytree created by `init`:
      {"mean": {...}, "kernel": {...}, "likelihood": {...}}
    Mirrors `ExactGPLayer` (reference methods/DKT.py:337-378).
    """

    kernel: Kernel
    likelihood: GaussianLikelihood
    # Disables the Woodbury low-rank route even when the kernel is exactly
    # low-rank — the dense-Gram A/B arm of benchmarks/woodbury_workload.py.
    # An explicit spec field (NOT an env read at trace time): jitted entry
    # points cache per method object, so routing must be fixed at
    # construction.
    force_dense: bool = False
    # Skips psd_safe_cholesky's phase-1 jitter probe (one full batched
    # factorisation + a while_loop) when the noisy Gram is positive
    # definite BY CONSTRUCTION: every kernel in the zoo is PSD, so with a
    # fixed non-trainable noise (DKT classification pins 0.1, reference
    # methods/DKT.py:346-347) the minimum eigenvalue is >= noise minus f32
    # roundoff (~1e-4 at N~100) and the probe provably exits at jitter=0 —
    # where the fast path is BIT-IDENTICAL (cholesky(mat + 0*I) ==
    # cholesky(mat), parity-tested). Leave False whenever the noise is
    # trainable (regression) or the Gram can otherwise lose PD-ness.
    assume_pd: bool = False

    def _factor(self, k_noisy: Array) -> Array:
        if self.assume_pd:
            return jnp.linalg.cholesky(k_noisy)
        return psd_safe_cholesky(k_noisy)

    @staticmethod
    def force_dense_from_env() -> bool:
        """The documented DKT_GP_FORCE_DENSE contract: unset/""/0/false/off
        (any case) = off, anything else = on. Methods read this ONCE at
        construction (never at trace time) when their force_dense kwarg is
        left as None."""
        import os

        return os.environ.get("DKT_GP_FORCE_DENSE", "").strip().lower() not in (
            "", "0", "false", "off")

    def init(self, key: Array, noise: float | None = None) -> dict:
        return {
            "mean": constant_mean_init(),
            "kernel": self.kernel.init(key),
            "likelihood": self.likelihood.init(noise),
        }

    # -- prior -------------------------------------------------------------

    def prior(self, params: dict, x: Array) -> MultivariateNormal:
        """The GP prior at inputs x (gpytorch "train mode" forward)."""
        mean = constant_mean(params["mean"], x)
        cov = self.kernel.apply(params["kernel"], x, x)
        return MultivariateNormal(mean, jnp.diagonal(cov, axis1=-2, axis2=-1), cov)

    # -- marginal log likelihood ------------------------------------------

    def mll(self, params: dict, x: Array, y: Array) -> Array:
        """Exact marginal log likelihood of y under the prior + noise.

        Matches gpytorch.mlls.ExactMarginalLogLikelihood INCLUDING the final
        division by N (gpytorch scales the MLL by num_data; the reference's
        learning rates were tuned against that convention).
        """
        n = x.shape[0]
        mean = constant_mean(params["mean"], x)
        noise = self.likelihood.noise(params["likelihood"])
        diff = y - mean
        if self._use_low_rank(params, x):
            # linear-family kernel with N >> D: exact Woodbury route,
            # O(N D^2) with no N x N Gram (gp/low_rank.py)
            from .low_rank import woodbury_mll

            s, z = self.kernel.low_rank(params["kernel"], x)
            return woodbury_mll(z, diff, s, noise)
        k = self.kernel.apply(params["kernel"], x, x)
        k_noisy = k + noise * jnp.eye(n, dtype=k.dtype)
        n_pad = _padded_size(n)
        chol = self._factor(_pad_gram(k_noisy, n_pad))
        alpha = _chol_solve(chol, jnp.pad(diff, (0, n_pad - n)))
        quad = _dot(diff, alpha[:n])
        # leading-diagonal slice: the identity pad must not enter logdet
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)[:n]))
        return -0.5 * (quad + logdet + n * _LOG_2PI) / n

    def _use_low_rank(self, params: dict, x: Array) -> bool:
        """Static (shape-level) routing decision: the kernel is exactly
        low-rank and the factor is at most half the support size.

        force_dense=True (an ExactGP field, set at construction) disables
        the route — the benchmarking escape hatch used by benchmarks/
        woodbury_workload.py to A/B the dense Gram path on a config that
        normally routes. Methods map DKT_GP_FORCE_DENSE=1 onto this field
        once, in __init__ (methods/dkt.py), never at trace time."""
        if self.force_dense:
            return False
        if self.kernel.low_rank is None:
            return False
        _, z = jax.eval_shape(
            lambda p, xx: self.kernel.low_rank(p, xx), params["kernel"], x)
        return 2 * z.shape[-1] <= x.shape[0]

    # -- posterior (conditioning on a support set) ------------------------

    @partial(jax.named_call, name="exact_gp_posterior")
    def posterior(
        self,
        params: dict,
        x_train: Array,
        y_train: Array,
        x_query: Array,
        full_covariance: bool = False,
    ) -> MultivariateNormal:
        """Predictive posterior p(f* | X, y, X*).

        Functional equivalent of gpytorch `set_train_data` + eval-mode
        forward (reference methods/DKT.py:239-240 + 258-271). Observation
        noise on y is included in the conditioning; noise on the *output* is
        added by the likelihood if desired.
        """
        n = x_train.shape[0]
        mean_tr = constant_mean(params["mean"], x_train)
        mean_q = constant_mean(params["mean"], x_query)
        kp = params["kernel"]
        if self._use_low_rank(params, x_train):
            from .low_rank import woodbury_posterior

            s, z_tr = self.kernel.low_rank(kp, x_train)
            _, z_q = self.kernel.low_rank(kp, x_query)
            noise = self.likelihood.noise(params["likelihood"])
            mean_adj, var, cov = woodbury_posterior(
                z_tr, y_train - mean_tr, z_q, s, noise,
                full_covariance=full_covariance)
            return MultivariateNormal(mean_q + mean_adj,
                                      jnp.maximum(var, 1e-10), cov)
        k_tt = self.kernel.apply(kp, x_train, x_train)
        k_tq = self.kernel.apply(kp, x_train, x_query)  # [N, M]
        noise = self.likelihood.noise(params["likelihood"])
        n_pad = _padded_size(n)
        chol = self._factor(
            _pad_gram(k_tt + noise * jnp.eye(n, dtype=k_tt.dtype), n_pad))
        if n_pad != n:  # identity-padded rows solve to exact zeros
            k_tq = jnp.pad(k_tq, ((0, n_pad - n), (0, 0)))

        alpha = _chol_solve(chol, jnp.pad(y_train - mean_tr,
                                          (0, n_pad - n)))  # [N']
        mean = mean_q + _dot(k_tq.T, alpha)  # [M]

        v = jax.scipy.linalg.solve_triangular(chol, k_tq, lower=True)  # [N', M]
        if full_covariance:
            k_qq = self.kernel.apply(kp, x_query, x_query)
            cov = k_qq - _dot(v.T, v)
            var = jnp.diagonal(cov)
            return MultivariateNormal(mean, jnp.maximum(var, 1e-10), cov)
        # marginal variances only: diag(Kqq) - sum_n v^2 (no [M,M] matrix)
        k_qq_diag = jax.vmap(lambda q: self.kernel.apply(kp, q[None, :], q[None, :])[0, 0])(
            x_query
        )
        var = k_qq_diag - jnp.sum(v * v, axis=0)
        return MultivariateNormal(mean, jnp.maximum(var, 1e-10), None)


# ---------------------------------------------------------------------------
# Batched one-vs-rest surface (replaces IndependentModelList + SumMLL)
# ---------------------------------------------------------------------------


def sum_mll(gp: ExactGP, params_batched: dict, x: Array, y_batched: Array) -> Array:
    """Sum of per-way MLLs with a SHARED input x.

    `params_batched` has a leading way axis on every leaf; `y_batched` is
    [n_way, N]. One vmapped (batched) Cholesky replaces the reference's
    sequential IndependentModelList/SumMarginalLogLikelihood loop
    (reference methods/DKT.py:68-71, 160-163).
    """
    per_way = jax.vmap(lambda p, y: gp.mll(p, x, y))(params_batched, y_batched)
    return jnp.sum(per_way)


def batched_posterior(
    gp: ExactGP,
    params_batched: dict,
    x_train: Array,
    y_batched: Array,
    x_query: Array,
) -> MultivariateNormal:
    """Per-way posteriors with shared support/query inputs: [n_way, M] means."""
    return jax.vmap(lambda p, y: gp.posterior(p, x_train, y, x_query))(
        params_batched, y_batched
    )


def init_batched(gp: ExactGP, key: Array, n_way: int, noise: float | None = None) -> dict:
    """n_way independent parameter sets, stacked on a leading axis.

    Deterministically-initialised leaves are identical across ways (matching
    the reference, where every ExactGPLayer starts from the same softplus(0)
    constants); random leaves (spectral mixture) get per-way keys.
    """
    keys = jax.random.split(key, n_way)
    return jax.vmap(lambda k: gp.init(k, noise))(keys)
