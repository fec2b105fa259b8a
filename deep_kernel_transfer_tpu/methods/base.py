"""Episodic method scaffolding — the functional analog of MetaTemplate.

The reference's `MetaTemplate` (reference methods/meta_template.py:10-135) is
a stateful nn.Module holding n_way/n_support/n_query and a feature trunk.
Here the same contract is expressed functionally so that every method is a
set of pure jit/vmap-able functions over a params pytree:

  * episodes are arrays [n_way, S+Q, ...] (or batched [B, n_way, S+Q, ...]);
  * `split_support_query` replaces parse_feature's slicing
    (reference meta_template.py:32-43);
  * label construction helpers replace the np.repeat patterns scattered
    through the reference.

A small `EpisodicMethod` protocol documents the method contract
(set_forward / loss / train_step / correct equivalents).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class EpisodeSpec(NamedTuple):
    """Static episode geometry (shapes are compile-time constants on TPU)."""

    n_way: int
    n_support: int
    n_query: int

    @property
    def n_total(self) -> int:
        return self.n_support + self.n_query


def split_support_query(x: Array, n_support: int) -> tuple[Array, Array]:
    """[n_way, S+Q, ...] -> ([n_way, S, ...], [n_way, Q, ...]).

    Functional parse_feature (reference meta_template.py:40-41)."""
    return x[:, :n_support], x[:, n_support:]


def flatten_episode(x: Array) -> Array:
    """[n_way, K, ...] -> [n_way*K, ...]."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def episode_labels(n_way: int, k: int) -> Array:
    """np.repeat(range(n_way), k) (reference meta_template.py:47 etc.)."""
    return jnp.repeat(jnp.arange(n_way), k)


def one_vs_rest_targets(n_way: int, k: int) -> Array:
    """[n_way, n_way*k] matrix of +-1 one-vs-rest GP regression targets.

    Row w is -1 everywhere except +1 on the block [w*k, (w+1)*k) — exactly
    the target_list loop of the reference (methods/DKT.py:129-136)."""
    labels = episode_labels(n_way, k)  # [n_way*k]
    onehot = (labels[None, :] == jnp.arange(n_way)[:, None]).astype(jnp.float32)
    return 2.0 * onehot - 1.0


def accuracy_from_scores(scores: Array, labels: Array) -> Array:
    """Top-1 accuracy in percent (reference meta_template.py:45-52)."""
    pred = jnp.argmax(scores, axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32)) * 100.0


def ci95(acc_per_episode) -> float:
    """mean +- 1.96*std/sqrt(n) protocol (reference test.py:174)."""
    import numpy as np

    a = np.asarray(acc_per_episode)
    return float(1.96 * a.std() / np.sqrt(len(a)))
