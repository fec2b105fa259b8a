"""ProtoNet — prototypes = support means, scores = -euclidean^2.

Rebuild of reference methods/protonet.py:11-49 on the shared functional
stack. The euclidean distance is computed MXU-style (norms + one matmul)
instead of the reference's [N, M, D] broadcast (protonet.py:38-49)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..gp.kernels import sq_dist as euclidean_sq  # shared MXU pairwise-dist
from .base import EpisodicMethod, apply_trunk, episode_labels, flatten_episode

Array = jax.Array


class ProtoNet(EpisodicMethod):
    def __init__(self, backbone: nn.Module, n_way: int, n_support: int,
                 lr: float = 1e-3, feature_dtype: str = "bfloat16"):
        self.feature = backbone
        self.n_way = n_way
        self.n_support = n_support
        # bf16 trunk on the MXU, f32 distances/scores (same mixed-precision
        # law as DKT; --feature_dtype float32 for exact-parity arithmetic)
        self.feature_dtype = jnp.dtype(feature_dtype)
        self.tx = optax.adam(lr)

    def init_params(self, key, example_episode):
        return {"feature": self.feature.init(key, flatten_episode(example_episode))}

    def _embed(self, params, x: Array, train: bool = False):
        n_way, n_total = x.shape[0], x.shape[1]
        z, stats = apply_trunk(self.feature, params["feature"],
                               flatten_episode(x), train,
                               dtype=self.feature_dtype)
        return z.reshape(n_way, n_total, -1), stats

    def scores_from_features(self, params, z: Array) -> Array:
        """[n_way, S+Q, D] features -> scores (is_feature=True path,
        reference meta_template.py:36-38)."""
        z_proto = jnp.mean(z[:, : self.n_support], axis=1)  # [n_way, D]
        z_query = z[:, self.n_support :].reshape(-1, z.shape[-1])
        return -euclidean_sq(z_query, z_proto)

    def episode_scores(self, params, x: Array) -> Array:
        """reference protonet.py:17-26 (eval: running-average BN)."""
        z, _ = self._embed(params, x, train=False)
        return self.scores_from_features(params, z)

    def episode_loss_train(self, params, x: Array):
        n_query = x.shape[1] - self.n_support
        z, stats = self._embed(params, x, train=True)
        scores = self.scores_from_features(params, z)
        y = episode_labels(x.shape[0], n_query)
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(scores, y))
        return loss, {"feature": stats}
