"""RelationNet — learned relation scorer over unpooled feature-map pairs.

Rebuild of reference methods/relationnet.py. The backbone keeps spatial maps
(NP variants, [H, W, C] here vs the reference's [C, H, W]); prototypes are
support means; each (query, proto) pair is concatenated on channels and
scored by a small conv module (RelationModule, relationnet.py:128-154).
Losses: MSE on one-hot (default) or CE ("relationnet_softmax").
"""
from __future__ import annotations

from typing import Sequence

from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..models.backbones import EpisodicBatchNorm
from .base import EpisodicMethod, apply_trunk, episode_labels, flatten_episode

Array = jax.Array


class RelationConvBlock(nn.Module):
    """conv3x3 + BN + relu + maxpool2 (reference relationnet.py:107-126)."""

    out_dim: int
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = nn.Conv(self.out_dim, (3, 3), padding=self.padding)(x)
        x = EpisodicBatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        if x.shape[-3] >= 2 and x.shape[-2] >= 2:  # pool would yield 0-size
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def relation_module_geometry(h: int, w: int) -> tuple[int, int, int]:
    """(hs, ws, padding) of the relation scorer's post-conv map.

    Single source of the geometry law (reference relationnet.py:138-141):
    padding 1 on small maps, then per block conv 3x3 (pad p) followed by a
    2x2 maxpool that RelationConvBlock SKIPS (both dims) whenever either
    post-conv dim is < 2 — the skip must be modelled here too or
    torch_import/torch_export would derive a wrong fc1 permutation size
    for small/asymmetric maps. Keep the sites in lockstep by keeping ONE."""
    padding = 1 if (h < 10 and w < 10) else 0

    def block(hh: int, ww: int) -> tuple[int, int]:
        hh, ww = hh - 2 + 2 * padding, ww - 2 + 2 * padding
        if hh >= 2 and ww >= 2:  # mirror RelationConvBlock's pool guard
            hh, ww = hh // 2, ww // 2
        return hh, ww

    hs, ws = block(*block(h, w))
    return hs, ws, padding


class RelationModule(nn.Module):
    """Two conv blocks + 2 dense layers -> relation score
    (reference relationnet.py:128-154). Input [B, H, W, 2C]."""

    feat_shape: Sequence[int]  # (H, W, C) of a single feature map
    hidden_size: int = 8
    loss_type: str = "mse"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        h, w, c = self.feat_shape
        _, _, padding = relation_module_geometry(h, w)
        x = RelationConvBlock(c, padding=padding)(x, train)
        x = RelationConvBlock(c, padding=padding)(x, train)
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
        feature_dtype: str = "bfloat16",
    ):
        self.feature = backbone
        self.feat_shape = tuple(feat_shape)
        self.n_way = n_way
        self.n_support = n_support
        self.loss_type = loss_type
        # bf16 NP trunk; the relation conv scorer and losses stay f32
        self.feature_dtype = jnp.dtype(feature_dtype)
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
        z, _ = apply_trunk(self.feature, params["feature"], flatten_episode(x),
                           train=False, dtype=self.feature_dtype)
        h, w, c = self.feat_shape
        return self.scores_from_features(params, z.reshape(n_way, n_total, h, w, c))

    def _pair_scores(self, rel_params, z_proto: Array, z_query: Array,
                     train: bool = False):
        """(query, proto) pair scores: z_proto [n_way, h, w, c],
        z_query [M, h, w, c] -> ([M, n_way], batch_stats|None)."""
        n_way = z_proto.shape[0]
        m = z_query.shape[0]
        h, w, c = self.feat_shape
        proto_ext = jnp.broadcast_to(z_proto[None], (m, n_way, h, w, c))
        query_ext = jnp.broadcast_to(z_query[:, None], (m, n_way, h, w, c))
        pairs = jnp.concatenate([proto_ext, query_ext], axis=-1)
        rel, stats = apply_trunk(self.relation, rel_params,
                                 pairs.reshape(-1, h, w, 2 * c), train)
        return rel.reshape(m, n_way), stats

    def scores_from_features(self, params, z: Array) -> Array:
        """[n_way, S+Q, h, w, c] feature maps -> scores (is_feature path)."""
        n_way, n_total = z.shape[0], z.shape[1]
        n_support = self.n_support
        h, w, c = self.feat_shape
        z_proto = jnp.mean(z[:, :n_support], axis=1)  # [n_way, h, w, c]
        z_query = z[:, n_support:].reshape(-1, h, w, c)
        return self._pair_scores(params["relation"], z_proto, z_query)[0]

    def _scores_loss(self, rel_params, z_proto, z_query, y) -> Array:
        # eval-mode BN like the reference's finetune under model.eval()
        scores, _ = self._pair_scores(rel_params, z_proto, z_query,
                                      train=False)
        if self.loss_type == "mse":
            return jnp.mean((scores - jax.nn.one_hot(y, z_proto.shape[0])) ** 2)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(scores, y))

    @partial(jax.jit, static_argnums=0)
    def adapted_scores_from_features(self, params, z: Array,
                                     key: Array) -> Array:
        """Test-time relation-module finetune on the support set
        (reference relationnet.py:42-93 set_forward_adaptation): 100 epochs
        of SGD(0.01, momentum=.9, dampening=.9, wd=1e-3) on random 3/2
        sub-splits of the support, then score the query with the finetuned
        module. Runs fully on-device as a lax.scan."""
        from ..utils.torch_optim import torch_sgd

        n_way, n_total = z.shape[0], z.shape[1]
        n_support = self.n_support
        h, w, c = self.feat_shape
        z_support = z[:, :n_support]  # [n_way, S, h, w, c]
        z_query = z[:, n_support:].reshape(-1, h, w, c)
        z_proto_full = jnp.mean(z_support, axis=1)

        if n_support < 2:  # no support left to form a finetune sub-split
            return self._pair_scores(params["relation"], z_proto_full,
                                     z_query)[0]

        sub_s = min(3, n_support - 1)  # reference hardcodes 3/2
        sub_q = min(2, n_support - sub_s)
        y_sub = episode_labels(n_way, sub_q)
        tx = torch_sgd()
        # finetune ONLY the weights; BN running statistics stay frozen
        # (reference optimizes module.parameters() under model.eval())
        rel_vars = params["relation"]
        frozen = {k: v for k, v in rel_vars.items() if k != "params"}

        def loss_fn(p, proto, query):
            return self._scores_loss({"params": p, **frozen}, proto, query,
                                     y_sub)

        def epoch(carry, k):
            p, opt_state = carry
            perm = jax.random.permutation(k, n_support)
            zz = z_support[:, perm]
            proto = jnp.mean(zz[:, :sub_s], axis=1)
            query = zz[:, sub_s:sub_s + sub_q].reshape(-1, h, w, c)
            grads = jax.grad(loss_fn)(p, proto, query)
            updates, opt_state = tx.update(grads, opt_state, p)
            return (optax.apply_updates(p, updates), opt_state), None

        keys = jax.random.split(key, 100)
        (p, _), _ = jax.lax.scan(
            epoch, (rel_vars["params"], tx.init(rel_vars["params"])), keys)

        return self._pair_scores({"params": p, **frozen}, z_proto_full,
                                 z_query)[0]

    def episode_loss_train(self, params, x: Array):
        n_way, n_total = x.shape[0], x.shape[1]
        n_query = n_total - self.n_support
        h, w, c = self.feat_shape
        z, f_stats = apply_trunk(self.feature, params["feature"],
                                 flatten_episode(x), train=True,
                                 dtype=self.feature_dtype)
        z = z.reshape(n_way, n_total, h, w, c)
        z_proto = jnp.mean(z[:, :self.n_support], axis=1)
        z_query = z[:, self.n_support:].reshape(-1, h, w, c)
        scores, r_stats = self._pair_scores(params["relation"], z_proto,
                                            z_query, train=True)
        y = episode_labels(n_way, n_query)
        if self.loss_type == "mse":
            loss = jnp.mean((scores - jax.nn.one_hot(y, n_way)) ** 2)
        else:
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(scores, y))
        return loss, {"feature": f_stats, "relation": r_stats}
