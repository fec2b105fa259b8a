"""RelationNet — learned relation scorer over unpooled feature-map pairs.

Rebuild of reference methods/relationnet.py. The backbone keeps spatial maps
(NP variants, [H, W, C] here vs the reference's [C, H, W]); prototypes are
support means; each (query, proto) pair is concatenated on channels and
scored by a small conv module (RelationModule, relationnet.py:128-154).
Losses: MSE on one-hot (default) or CE ("relationnet_softmax").
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.backbones import EpisodicBatchNorm
from .base import EpisodicMethod, episode_labels, flatten_episode

Array = jax.Array


class RelationConvBlock(nn.Module):
    """conv3x3 + BN + relu + maxpool2 (reference relationnet.py:107-126)."""

    out_dim: int
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.out_dim, (3, 3), padding=self.padding)(x)
        x = EpisodicBatchNorm()(x)
        x = nn.relu(x)
        if x.shape[-3] >= 2 and x.shape[-2] >= 2:  # pool would yield 0-size
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class RelationModule(nn.Module):
    """Two conv blocks + 2 dense layers -> relation score
    (reference relationnet.py:128-154). Input [B, H, W, 2C]."""

    feat_shape: Sequence[int]  # (H, W, C) of a single feature map
    hidden_size: int = 8
    loss_type: str = "mse"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w, c = self.feat_shape
        padding = 1 if (h < 10 and w < 10) else 0
        x = RelationConvBlock(c, padding=padding)(x)
        x = RelationConvBlock(c, padding=padding)(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden_size)(x))
        x = nn.Dense(1)(x)
        if self.loss_type == "mse":
            x = jax.nn.sigmoid(x)
        return x


class RelationNet(EpisodicMethod):
    def __init__(
        self,
        backbone: nn.Module,
        feat_shape: Sequence[int],  # (H, W, C) map shape of the backbone
        n_way: int,
        n_support: int,
        loss_type: str = "mse",
        lr: float = 1e-3,
    ):
        self.feature = backbone
        self.feat_shape = tuple(feat_shape)
        self.n_way = n_way
        self.n_support = n_support
        self.loss_type = loss_type
        self.relation = RelationModule(self.feat_shape, 8, loss_type)
        self.tx = optax.adam(lr)

    def init_params(self, key, example_episode):
        kf, kr = jax.random.split(key)
        h, w, c = self.feat_shape
        dummy_pairs = jnp.zeros((2, h, w, 2 * c))
        return {
            "feature": self.feature.init(kf, flatten_episode(example_episode)),
            "relation": self.relation.init(kr, dummy_pairs),
        }

    def episode_scores(self, params, x: Array) -> Array:
        """[n_way*Q, n_way] relation scores (reference relationnet.py:24-39)."""
        n_way, n_total = x.shape[0], x.shape[1]
        z = self.feature.apply(params["feature"], flatten_episode(x))
        h, w, c = self.feat_shape
        return self.scores_from_features(params, z.reshape(n_way, n_total, h, w, c))

    def scores_from_features(self, params, z: Array) -> Array:
        """[n_way, S+Q, h, w, c] feature maps -> scores (is_feature path)."""
        n_way, n_total = z.shape[0], z.shape[1]
        n_support = self.n_support
        n_query = n_total - n_support
        h, w, c = self.feat_shape
        z_proto = jnp.mean(z[:, :n_support], axis=1)  # [n_way, h, w, c]
        z_query = z[:, n_support:].reshape(n_way * n_query, h, w, c)

        # all (query, proto) pairs: [Q*n_way, h, w, 2c]
        proto_ext = jnp.broadcast_to(
            z_proto[None], (n_way * n_query, n_way, h, w, c)
        )
        query_ext = jnp.broadcast_to(
            z_query[:, None], (n_way * n_query, n_way, h, w, c)
        )
        pairs = jnp.concatenate([proto_ext, query_ext], axis=-1)
        pairs = pairs.reshape(-1, h, w, 2 * c)
        rel = self.relation.apply(params["relation"], pairs)
        return rel.reshape(n_way * n_query, n_way)

    def episode_loss(self, params, x: Array) -> Array:
        n_query = x.shape[1] - self.n_support
        scores = self.episode_scores(params, x)
        y = episode_labels(x.shape[0], n_query)
        if self.loss_type == "mse":
            y_oh = jax.nn.one_hot(y, x.shape[0])
            return jnp.mean((scores - y_oh) ** 2)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(scores, y)
        )
