"""ProtoNet — prototypes = support means, scores = -euclidean^2.

Rebuild of reference methods/protonet.py:11-49 on the shared functional
stack. The euclidean distance is computed MXU-style (norms + one matmul)
instead of the reference's [N, M, D] broadcast (protonet.py:38-49)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .base import EpisodicMethod, episode_labels, flatten_episode

Array = jax.Array


def euclidean_sq(x: Array, y: Array) -> Array:
    """[N,D],[M,D] -> [N,M] squared distances without the [N,M,D] temp."""
    xn = jnp.sum(x * x, axis=-1, keepdims=True)
    yn = jnp.sum(y * y, axis=-1, keepdims=True).T
    cross = jnp.dot(x, y.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(xn + yn - 2.0 * cross, 0.0)


class ProtoNet(EpisodicMethod):
    def __init__(self, backbone: nn.Module, n_way: int, n_support: int,
                 lr: float = 1e-3):
        self.feature = backbone
        self.n_way = n_way
        self.n_support = n_support
        self.tx = optax.adam(lr)

    def init_params(self, key, example_episode):
        return {"feature": self.feature.init(key, flatten_episode(example_episode))}

    def _embed(self, params, x: Array):
        n_way, n_total = x.shape[0], x.shape[1]
        z = self.feature.apply(params["feature"], flatten_episode(x))
        return z.reshape(n_way, n_total, -1)

    def scores_from_features(self, params, z: Array) -> Array:
        """[n_way, S+Q, D] features -> scores (is_feature=True path,
        reference meta_template.py:36-38)."""
        z_proto = jnp.mean(z[:, : self.n_support], axis=1)  # [n_way, D]
        z_query = z[:, self.n_support :].reshape(-1, z.shape[-1])
        return -euclidean_sq(z_query, z_proto)

    def episode_scores(self, params, x: Array) -> Array:
        """reference protonet.py:17-26."""
        return self.scores_from_features(params, self._embed(params, x))

    def episode_loss(self, params, x: Array) -> Array:
        n_query = x.shape[1] - self.n_support
        scores = self.episode_scores(params, x)
        y = episode_labels(x.shape[0], n_query)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(scores, y)
        )
