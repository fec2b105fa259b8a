"""Gaussian observation likelihood — replaces gpytorch.likelihoods.GaussianLikelihood.

The reference uses two configurations:
  * regression: trainable noise, raw init 0 -> noise = softplus(0) ~ 0.693
    (reference methods/DKT_regression.py:29, sines/train_DKT.py:130)
  * classification: noise fixed at 0.1 with raw_noise.requires_grad=False
    (reference methods/DKT.py:346-347)

The "fixed" case is expressed functionally by keeping the noise OUT of the
trainable pytree and closing over the constant instead.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .distributions import MultivariateNormal
from .kernels import inv_softplus, softplus

Array = jax.Array


class GaussianLikelihood(NamedTuple):
    """Pure-functional Gaussian likelihood.

    If `trainable` the params pytree is {"raw_noise": scalar}; otherwise the
    params pytree is empty and `fixed_noise` is baked in.
    """

    trainable: bool = True
    fixed_noise: float = 0.1

    def init(self, noise: float | None = None) -> dict:
        if not self.trainable:
            # a requested value that differs from the baked-in constant
            # would be silently discarded — surface it instead
            if noise is not None and float(noise) != float(self.fixed_noise):
                # raise (not assert: python -O strips asserts) — the value
                # would otherwise be silently discarded
                raise ValueError(
                    f"init(noise={noise}) on a non-trainable likelihood "
                    f"with fixed_noise={self.fixed_noise}: construct "
                    "GaussianLikelihood(trainable=False, fixed_noise=noise) "
                    "instead")
            return {}
        if noise is None:
            return {"raw_noise": jnp.zeros(())}  # softplus(0) like gpytorch
        return {"raw_noise": inv_softplus(jnp.asarray(noise, jnp.float32))}

    def noise(self, params: dict) -> Array:
        if not self.trainable:
            return jnp.asarray(self.fixed_noise, jnp.float32)
        return softplus(params["raw_noise"])

    def __call__(self, params: dict, dist: MultivariateNormal) -> MultivariateNormal:
        """p(y|f): adds observation noise to the (marginal) variances."""
        n = self.noise(params)
        cov = dist.covariance
        if cov is not None:
            cov = cov + n * jnp.eye(cov.shape[-1], dtype=cov.dtype)
        return MultivariateNormal(dist.mean, dist.variance + n, cov)
