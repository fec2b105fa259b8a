"""MAML (+ first-order approximation) — functional inner loop.

Rebuild of reference methods/maml.py. The reference threads "fast weights"
through mutated `weight.fast` attributes on torch layers
(reference backbone.py:54-102, maml.py:40-55); in JAX the inner loop is
simply jax.grad over the parameter pytree — second-order gradients fall out
of differentiating through the update (the `create_graph=True` equivalent),
and `maml_approx` is a stop_gradient on the inner gradients.

Semantics preserved:
  * inner: task_update_num SGD steps at train_lr on support CE
    (maml.py:42-55); outer: n_task episode losses summed -> one Adam step
    (maml.py:71-98). Here the n_task episodes arrive as one batched array
    and adapt in parallel under vmap — identical math, one XLA program.
  * classifier = Linear(feat_dim, n_way), bias zero-init (maml.py:14-15).
  * omniglot overrides n_task=32, task_update_num=1, train_lr=0.1
    (reference train.py:163-172) are plain constructor args.
  * BatchNorm uses batch statistics EVERYWHERE (the reference's momentum=1
    always-training BatchNorm2d_fw hack, backbone.py:94-102): MAML applies
    the trunk in train mode at both meta-train and test and discards the
    running-average updates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .base import EpisodicMethod, episode_labels, flatten_episode

Array = jax.Array


class MAMLNet(nn.Module):
    backbone: nn.Module
    n_way: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # always-training BN (reference BatchNorm2d_fw, backbone.py:94-102)
        z = self.backbone(x, train=True)
        return nn.Dense(
            self.n_way, bias_init=nn.initializers.zeros
        )(z)


class MAML(EpisodicMethod):
    def __init__(
        self,
        backbone: nn.Module,
        n_way: int,
        n_support: int,
        approx: bool = False,
        n_task: int = 4,
        task_update_num: int = 5,
        train_lr: float = 0.01,
        lr: float = 1e-3,
    ):
        self.net = MAMLNet(backbone, n_way)
        self.n_way = n_way
        self.n_support = n_support
        self.approx = approx
        self.n_task = n_task
        self.task_update_num = task_update_num
        self.train_lr = train_lr
        self.tx = optax.adam(lr)

    @property
    def task_update_num(self) -> int:
        return self._task_update_num

    @task_update_num.setter
    def task_update_num(self, value: int) -> None:
        """The inner-loop step count is baked into traced programs, so
        mutating it (test.py --adaptation sets 100, reference
        test.py:158-159) must drop any jitted closures cached on the
        instance — otherwise a pre-mutation trace would silently keep
        running the old count."""
        self._task_update_num = int(value)
        for k in [k for k in self.__dict__ if k.endswith("_fn")]:
            del self.__dict__[k]

    def init_params(self, key, example_episode):
        return {"net": self.net.init(key, flatten_episode(example_episode))}

    # -- inner loop --------------------------------------------------------

    def _adapt(self, params, x_support: Array, y_support: Array):
        """task_update_num inner SGD steps (reference maml.py:42-55)."""

        def inner_loss(p):
            scores, _ = self.net.apply(p, x_support, mutable=["batch_stats"])
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(scores, y_support)
            )

        fast = params["net"]
        for _ in range(self.task_update_num):
            g = jax.grad(inner_loss)(fast)
            if self.approx:  # first-order: no grad-of-grad (maml.py:46-47)
                g = jax.lax.stop_gradient(g)
            fast = jax.tree.map(lambda p, gi: p - self.train_lr * gi, fast, g)
        return fast

    def _forward_episode(self, params, x: Array) -> Array:
        n_way, n_total = x.shape[0], x.shape[1]
        n_support = self.n_support
        x_s = x[:, :n_support].reshape((n_way * n_support,) + x.shape[2:])
        x_q = x[:, n_support:].reshape((n_way * (n_total - n_support),) + x.shape[2:])
        y_s = episode_labels(n_way, n_support)
        fast = self._adapt(params, x_s, y_s)
        scores, _ = self.net.apply(fast, x_q, mutable=["batch_stats"])
        return scores

    # -- EpisodicMethod contract -------------------------------------------

    def episode_scores(self, params, x: Array) -> Array:
        return self._forward_episode(params, x)

    def episode_loss_train(self, params, x: Array):
        n_query = x.shape[1] - self.n_support
        scores = self._forward_episode(params, x)
        y_q = episode_labels(x.shape[0], n_query)
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(scores, y_q)
        )
        return loss, {}  # running averages unused (always-training BN)

    def batch_loss(self, params, xb: Array) -> Array:
        """SUM of task losses per outer step (reference maml.py:89-92 stacks
        n_task losses and sums before the single optimizer step)."""
        return jnp.sum(jax.vmap(lambda x: self.episode_loss(params, x))(xb))

    def batch_loss_train(self, params, xb: Array):
        return self.batch_loss(params, xb), {}
