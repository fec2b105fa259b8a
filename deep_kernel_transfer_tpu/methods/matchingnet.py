"""MatchingNet — bi-LSTM context encoding + attention-LSTM query embedding.

Rebuild of reference methods/matchingnet.py:13-100. Components:
  * G encoder: bidirectional LSTM over the support set, residual-summed
    (encode_training_set, matchingnet.py:25-33);
  * F encoder: an LSTM cell iterated K=|S| times with softmax attention over
    G (FullyContextualEmbedding, matchingnet.py:73-100), implemented as a
    lax.scan;
  * scores = relu(cosine(F, G)) * 100, logprobs = log(softmax @ one-hot(Y_S))
    (matchingnet.py:35-44), NLL loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .base import EpisodicMethod, apply_trunk, episode_labels, flatten_episode

Array = jax.Array


def _l2norm(x: Array) -> Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-5)


class FullyContextualEmbedding(nn.Module):
    """reference matchingnet.py:73-100: h_{k+1} = LSTMCell([f, r_k], (h_k+f? ...))
    with r_k = softmax(h_k G^T) G; h is residual-added with f each step."""

    feat_dim: int

    @nn.compact
    def __call__(self, f: Array, G: Array) -> Array:
        cell = nn.OptimizedLSTMCell(self.feat_dim)
        K = G.shape[0]

        def one(c: Array, h: Array) -> tuple[Array, Array]:
            a = jax.nn.softmax(h @ G.T, axis=-1)  # [Q, K]
            r = a @ G  # [Q, D]
            x = jnp.concatenate([f, r], axis=-1)  # [Q, 2D]
            (c, h), _ = cell((c, h), x)
            return c, h + f  # residual (matchingnet.py:96)

        # Step 0 runs eagerly so the cell's params are materialised OUTSIDE
        # the scan (a submodule may not be first called inside a scan body —
        # its freshly-created params would leak as tracers); the remaining
        # K-1 steps share them through ONE traced body instead of a K-fold
        # unrolled graph (the unroll dominated MatchingNet compile time).
        c, h = one(jnp.zeros_like(f), f)

        def body(carry, _):
            return one(*carry), None

        (c, h), _ = jax.lax.scan(body, (c, h), None, length=K - 1)
        return h


class GEncoder(nn.Module):
    """Bidirectional LSTM over the support sequence; G = S + fwd + bwd
    (reference matchingnet.py:29-31)."""

    feat_dim: int

    @nn.compact
    def __call__(self, S: Array) -> Array:
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.feat_dim))
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.feat_dim), reverse=True,
                     keep_order=True)
        out_f = fwd(S[None])[0]
        out_b = bwd(S[None])[0]
        return S + out_f + out_b


class MatchingNet(EpisodicMethod):
    def __init__(self, backbone: nn.Module, feat_dim: int, n_way: int,
                 n_support: int, lr: float = 1e-3,
                 feature_dtype: str = "bfloat16"):
        # bf16 conv trunk; the bi-LSTM FCE heads and cosine scores stay f32
        self.feature_dtype = jnp.dtype(feature_dtype)
        self.feature = backbone
        self.feat_dim = feat_dim
        self.n_way = n_way
        self.n_support = n_support
        self.G_encoder = GEncoder(feat_dim)
        self.FCE = FullyContextualEmbedding(feat_dim)
        self.tx = optax.adam(lr)

    def init_params(self, key, example_episode):
        kf, kg, kc = jax.random.split(key, 3)
        n_s = self.n_way * self.n_support
        dummy_S = jnp.zeros((n_s, self.feat_dim))
        dummy_f = jnp.zeros((4, self.feat_dim))
        return {
            "feature": self.feature.init(kf, flatten_episode(example_episode)),
            "G": self.G_encoder.init(kg, dummy_S),
            "FCE": self.FCE.init(kc, dummy_f, dummy_S),
        }

    def _logprobs(self, params, x: Array, train: bool = False):
        n_way, n_total = x.shape[0], x.shape[1]
        z, stats = apply_trunk(self.feature, params["feature"],
                               flatten_episode(x), train,
                               dtype=self.feature_dtype)
        scores = self.scores_from_features(params, z.reshape(n_way, n_total, -1))
        return scores, stats

    def scores_from_features(self, params, z: Array) -> Array:
        """[n_way, S+Q, D] features -> log-prob scores (is_feature path)."""
        n_way, n_total = z.shape[0], z.shape[1]
        n_support = self.n_support
        z_s = z[:, :n_support].reshape(n_way * n_support, -1)
        z_q = z[:, n_support:].reshape(-1, z.shape[-1])

        G = self.G_encoder.apply(params["G"], z_s)
        G_n = _l2norm(G)
        F = self.FCE.apply(params["FCE"], z_q, G)
        F_n = _l2norm(F)
        scores = jax.nn.relu(F_n @ G_n.T) * 100.0  # (matchingnet.py:42)
        y_s = episode_labels(n_way, n_support)
        Y_S = jax.nn.one_hot(y_s, n_way)  # [K, n_way]
        probs = jax.nn.softmax(scores, axis=-1) @ Y_S
        return jnp.log(probs + 1e-6)

    def episode_scores(self, params, x: Array) -> Array:
        return self._logprobs(params, x, train=False)[0]

    def episode_loss_train(self, params, x: Array):
        n_query = x.shape[1] - self.n_support
        logprobs, stats = self._logprobs(params, x, train=True)
        y_q = episode_labels(x.shape[0], n_query)
        # NLL on logprobs (matchingnet.py:62-68)
        loss = -jnp.mean(jnp.take_along_axis(logprobs, y_q[:, None], axis=1))
        return loss, {"feature": stats}
