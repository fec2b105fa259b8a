"""Optax transform matching the torch SGD configuration the reference
hard-codes, so finetuning dynamics are comparable.

reference meta_template.py:115 / baselinefinetune.py:37 / relationnet.py:52:
  torch.optim.SGD(lr=0.01, momentum=0.9, dampening=0.9, weight_decay=0.001)

torch SGD semantics (torch/optim/sgd.py):
  g <- g + wd * p
  buf <- g                                   on the FIRST step
  buf <- momentum * buf + (1-dampening) * g  afterwards
  p <- p - lr * buf
The first-step special case matters: with dampening=0.9 a naive EMA chain
would make step 1 ten times smaller than torch's.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class TorchSGDState(NamedTuple):
    buf: optax.Updates
    step: jax.Array


def torch_sgd(
    lr: float = 0.01,
    momentum: float = 0.9,
    dampening: float = 0.9,
    weight_decay: float = 0.001,
) -> optax.GradientTransformation:
    def init_fn(params):
        return TorchSGDState(jax.tree.map(jnp.zeros_like, params),
                             jnp.zeros((), jnp.int32))

    def update_fn(grads, state, params=None):
        assert params is not None, "torch_sgd needs params for weight decay"
        g = jax.tree.map(lambda gi, p: gi + weight_decay * p, grads, params)
        first = state.step == 0
        buf = jax.tree.map(
            lambda b, gi: jnp.where(first, gi,
                                    momentum * b + (1.0 - dampening) * gi),
            state.buf, g)
        updates = jax.tree.map(lambda b: -lr * b, buf)
        return updates, TorchSGDState(buf, state.step + 1)

    return optax.GradientTransformation(init_fn, update_fn)
