"""Baseline / Baseline++ — pretrain a classifier, finetune a new head per episode.

Rebuild of reference methods/baselinetrain.py (softmax or cosine 'dist' head
over all base classes) and methods/baselinefinetune.py (test time: discard
the head, train a fresh n_way linear/dist head on the support features for
100 epochs of batch-4 SGD, then score the query).

The reference finetune loop is host-side python over torch minibatches
(baselinefinetune.py:39-50); here the whole 100-epoch finetune is ONE
lax.scan inside jit — each episode's head-finetune runs entirely on device
and can itself be vmapped over a batch of episodes.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.backbones import DistLinear
from ..utils.torch_optim import torch_sgd
from .base import MethodState, episode_labels, merge_stats

Array = jax.Array


class BaselineClassifier(nn.Module):
    backbone: nn.Module
    num_class: int
    loss_type: str = "softmax"  # "softmax" | "dist"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        z = self.backbone(x, train=train)
        if self.loss_type == "dist":
            return DistLinear(self.num_class)(z)
        return nn.Dense(self.num_class, bias_init=nn.initializers.zeros)(z)


BaselineState = MethodState  # shared (params, opt_state, step)


class BaselineTrain:
    """Stage-1 pretraining (reference methods/baselinetrain.py:10-51)."""

    def __init__(self, backbone: nn.Module, num_class: int,
                 loss_type: str = "softmax", lr: float = 1e-3):
        self.net = BaselineClassifier(backbone, num_class, loss_type)
        self.loss_type = loss_type
        self.tx = optax.adam(lr)

    def init(self, key, example_x: Array) -> BaselineState:
        params = {"net": self.net.init(key, example_x)}
        return BaselineState(params, self.tx.init(params), jnp.zeros((), jnp.int32))

    def loss(self, params, x: Array, y: Array):
        scores, mut = self.net.apply(params["net"], x, train=True,
                                     mutable=["batch_stats"])
        ce = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(scores, y))
        return ce, mut.get("batch_stats", {})

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: BaselineState, x: Array, y: Array):
        (loss, stats), grads = jax.value_and_grad(self.loss, has_aux=True)(
            state.params, x, y)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = {**params, "net": merge_stats(params["net"], stats)}
        return BaselineState(params, opt_state, state.step + 1), {"loss": loss}

    def feature_params(self, state: BaselineState):
        """The backbone variables, for save_features / warm-start
        (reference save_features.py:110-119, train.py:198-217)."""
        out = {"params": state.params["net"]["params"]["backbone"]}
        stats = state.params["net"].get("batch_stats", {}).get("backbone")
        if stats is not None:
            out["batch_stats"] = stats
        return out


class BaselineFinetune:
    """Episode-level head finetuning on cached features
    (reference methods/baselinefinetune.py:14-52).

    Operates on FEATURES (is_feature=True always, like the reference).
    """

    def __init__(self, feat_dim: int, n_way: int, n_support: int,
                 loss_type: str = "softmax", finetune_epochs: int = 100,
                 batch_size: int = 4):
        self.feat_dim = feat_dim
        self.n_way = n_way
        self.n_support = n_support
        self.loss_type = loss_type
        self.finetune_epochs = finetune_epochs
        self.batch_size = batch_size
        if loss_type == "dist":
            self.head = DistLinear(n_way)
        else:
            self.head = nn.Dense(n_way)
        # SGD(0.01, momentum=.9, dampening=.9, wd=1e-3) — baselinefinetune.py:37
        self.tx = torch_sgd()

    @partial(jax.jit, static_argnums=0)
    def episode_scores(self, key: Array, z_episode: Array) -> Array:
        """z_episode: [n_way, S+Q, D] features -> [n_way*Q, n_way] scores."""
        n_way = self.n_way
        n_support = self.n_support
        d = z_episode.shape[-1]
        z_support = z_episode[:, :n_support].reshape(n_way * n_support, d)
        z_query = z_episode[:, n_support:].reshape(-1, d)
        y_support = episode_labels(n_way, n_support)

        k_init, k_perm = jax.random.split(key)
        params = self.head.init(k_init, z_support)
        opt_state = self.tx.init(params)
        support_size = n_way * n_support

        def epoch(carry, ek):
            params, opt_state = carry
            perm = jax.random.permutation(ek, support_size)

            def minibatch(carry, idx):
                params, opt_state = carry
                zb = z_support[idx]
                yb = y_support[idx]

                def loss_fn(p):
                    s = self.head.apply(p, zb)
                    return jnp.mean(
                        optax.softmax_cross_entropy_with_integer_labels(s, yb)
                    )

                g = jax.grad(loss_fn)(params)
                updates, opt_state = self.tx.update(g, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), None

            # fixed-size minibatches of 4; support_size % 4 leftovers are
            # folded into a final wrapped batch (static shapes for XLA).
            n_batches = -(-support_size // self.batch_size)
            pad = n_batches * self.batch_size - support_size
            idxs = jnp.concatenate([perm, perm[:pad]]).reshape(
                n_batches, self.batch_size
            )
            (params, opt_state), _ = jax.lax.scan(
                minibatch, (params, opt_state), idxs
            )
            return (params, opt_state), None

        epoch_keys = jax.random.split(k_perm, self.finetune_epochs)
        (params, _), _ = jax.lax.scan(epoch, (params, opt_state), epoch_keys)
        return self.head.apply(params, z_query)

    def correct(self, key, z_episode: Array) -> tuple[float, int]:
        n_query = z_episode.shape[1] - self.n_support
        scores = self.episode_scores(key, z_episode)
        y = episode_labels(self.n_way, n_query)
        pred = jnp.argmax(scores, axis=-1)
        return float(jnp.sum(pred == y)), int(self.n_way * n_query)

