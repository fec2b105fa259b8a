"""Mean functions — replaces gpytorch.means.ConstantMean
(reference methods/DKT.py:349, methods/DKT_regression.py:115)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def constant_mean_init() -> dict:
    return {"constant": jnp.zeros(())}


def constant_mean(params: dict, x: Array) -> Array:
    """Broadcast the learned constant over the input batch: [N, D] -> [N]."""
    return jnp.broadcast_to(params["constant"], x.shape[:-1])
