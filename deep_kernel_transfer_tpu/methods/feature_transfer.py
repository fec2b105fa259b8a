"""FeatureTransfer regression baseline — Conv3 features + Linear(D, 1).

Rebuild of reference methods/feature_transfer_regression.py: meta-train the
regressor with plain MSE over tasks; at test take ONE gradient step on the
support points of a random test task, then report MSE over all its points.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from .base import MethodState

Array = jax.Array


class TransferNet(nn.Module):
    backbone: nn.Module

    @nn.compact
    def __call__(self, x: Array) -> Array:
        z = self.backbone(x)
        return nn.Dense(1)(z)[..., 0]  # Regressor layer4: Linear(2916, 1)


FeatureTransferState = MethodState  # shared (params, opt_state, step)


class FeatureTransfer:
    def __init__(self, backbone: nn.Module, lr: float = 1e-3):
        self.net = TransferNet(backbone)
        self.tx = optax.adam(lr)

    def init(self, key, example_x: Array) -> FeatureTransferState:
        params = {"net": self.net.init(key, example_x)}
        return FeatureTransferState(params, self.tx.init(params), jnp.zeros((), jnp.int32))

    def task_loss(self, params, x: Array, y: Array) -> Array:
        pred = self.net.apply(params["net"], x)
        return jnp.mean((pred - y) ** 2)

    def batch_loss(self, params, xb: Array, yb: Array) -> Array:
        return jnp.mean(jax.vmap(lambda x, y: self.task_loss(params, x, y))(xb, yb))

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: FeatureTransferState, xb: Array, yb: Array):
        loss, grads = jax.value_and_grad(self.batch_loss)(state.params, xb, yb)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FeatureTransferState(params, opt_state, state.step + 1), {"loss": loss}

    @partial(jax.jit, static_argnums=0)
    def adapt_and_predict(self, state: FeatureTransferState,
                          x_support: Array, y_support: Array, x_all: Array):
        """One support gradient step, then predict (reference
        feature_transfer_regression.py:52-80 takes exactly one optimizer
        step on the support loss before eval)."""
        loss, grads = jax.value_and_grad(self.task_loss)(
            state.params, x_support, y_support
        )
        updates, _ = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return self.net.apply(params["net"], x_all)

    def test_mse(self, state, x_support, y_support, x_all, y_all) -> float:
        pred = self.adapt_and_predict(state, x_support, y_support, x_all)
        return float(jnp.mean((pred - y_all) ** 2))

    @partial(jax.jit, static_argnums=(0, 4, 5))
    def finetune_and_predict(self, params, support, x_all: Array,
                             steps: int = 100, lr: float = 1e-2):
        """Clone-and-finetune on support for `steps` fresh-Adam steps, then
        predict (reference sines/train_FT.py:189-216: Adam(1e-2), 100
        iterations on a restored copy of the trained net). lax.scan keeps
        the whole finetune on-device."""
        x_support, y_support = support
        tx = optax.adam(lr)

        def one(carry, _):
            p, o = carry
            g = jax.grad(self.task_loss)(p, x_support, y_support)
            updates, o = tx.update(g, o, p)
            return (optax.apply_updates(p, updates), o), None

        (p, _), _ = jax.lax.scan(one, (params, tx.init(params)), None,
                                 length=steps)
        return self.net.apply(p["net"], x_all)
