"""From-scratch ExactGP engine (no GPyTorch): kernels, likelihood, exact
inference. See SURVEY.md §2.3 for the replaced GPyTorch surface."""
from .distributions import MultivariateNormal
from .exact import (
    ExactGP,
    batched_posterior,
    init_batched,
    psd_safe_cholesky,
    sum_mll,
)
from .kernels import Kernel, make_kernel, normalizes_features
from .laplace import laplace_ovr_predict, laplace_predict_proba
from .likelihoods import GaussianLikelihood
from .means import constant_mean, constant_mean_init

__all__ = [
    "MultivariateNormal",
    "ExactGP",
    "batched_posterior",
    "init_batched",
    "psd_safe_cholesky",
    "sum_mll",
    "Kernel",
    "make_kernel",
    "normalizes_features",
    "laplace_ovr_predict",
    "laplace_predict_proba",
    "GaussianLikelihood",
    "constant_mean",
    "constant_mean_init",
]
