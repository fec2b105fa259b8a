"""Minimal multivariate-normal container for GP priors/posteriors.

Replaces `gpytorch.distributions.MultivariateNormal` as consumed by the
reference (mean / variance / confidence_region / rsample surface; reference
methods/DKT_regression.py:93, sines/train_DKT.py:248).

A NamedTuple (a pytree) so it can flow through jit/vmap unmodified. Only the
marginal variance is stored alongside the full covariance when available —
the posterior paths usually only need marginals, and skipping the full
[N,N] covariance keeps HBM traffic minimal on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class MultivariateNormal(NamedTuple):
    mean: Array  # [..., N]
    variance: Array  # [..., N] marginal variances
    covariance: Optional[Array] = None  # [..., N, N] if materialised

    @property
    def stddev(self) -> Array:
        return jnp.sqrt(jnp.maximum(self.variance, 0.0))

    def confidence_region(self) -> tuple[Array, Array]:
        """2 standard deviations below/above the mean, matching
        gpytorch's confidence_region() used at reference
        methods/DKT_regression.py:93."""
        half = 2.0 * self.stddev
        return self.mean - half, self.mean + half

    def sample(self, key: Array, num_samples: int) -> Array:
        """Draw samples. Uses the full covariance when materialised, else
        treats the distribution as factorised over its marginals (the only
        consumer of samples in the reference surface is the likelihood's
        MC averaging with num_likelihood_samples=32, which is marginal-wise;
        reference methods/DKT.py:258,323)."""
        eps = jax.random.normal(key, (num_samples,) + self.mean.shape)
        if self.covariance is not None:
            # psd_safe_cholesky (jitter escalation): a posterior covariance
            # with query points nearly coincident with support can round
            # slightly indefinite in f32, and raw jnp.linalg.cholesky would
            # return silent NaNs. Imported lazily (exact.py imports this
            # module at load time).
            from .exact import psd_safe_cholesky

            chol = psd_safe_cholesky(self.covariance)
            return self.mean + jnp.einsum(
                "...ij,s...j->s...i", chol, eps,
                precision=jax.lax.Precision.HIGHEST)  # f32-MXU contract
        return self.mean + self.stddev * eps
