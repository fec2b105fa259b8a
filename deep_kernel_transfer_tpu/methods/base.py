"""Episodic method scaffolding — the functional analog of MetaTemplate.

The reference's `MetaTemplate` (reference methods/meta_template.py:10-135) is
a stateful nn.Module holding n_way/n_support/n_query and a feature trunk.
Here the same contract is expressed functionally so that every method is a
set of pure jit/vmap-able functions over a params pytree:

  * episodes are arrays [n_way, S+Q, ...] (or batched [B, n_way, S+Q, ...]);
    methods slice support/query with plain [:, :n_support] indexing
    (parse_feature, reference meta_template.py:32-43);
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


def ci95(acc_per_episode) -> float:
    """mean +- 1.96*std/sqrt(n) protocol (reference test.py:174)."""
    import numpy as np

    a = np.asarray(acc_per_episode)
    return float(1.96 * a.std() / np.sqrt(len(a)))


def apply_trunk(module, variables, x: Array, train: bool, dtype=None,
                ep_groups: int = 1):
    """Apply a backbone with reference BatchNorm semantics.

    train=True: batch statistics + running-average updates — returns
    (out, batch_stats_updates). train=False: running averages (the
    reference's model.eval() protocol) — returns (out, None).

    ep_groups > 1: x is ep_groups episodes flattened into one batch and
    BatchNorm statistics are computed per episode (grouped reductions in
    EpisodicBatchNorm) — identical semantics to vmapping the trunk over
    the episode axis, without paying the vmap structure cost on the
    convolutions (measured ~29% of ResNet10@224 fwd+bwd). The returned
    batch_stats updates are already episode-averaged (merge_stats takes
    them as-is).

    dtype=bfloat16 runs the trunk on the MXU in bf16 (weights cast on the
    fly, BN statistics stay f32 — EpisodicBatchNorm keeps its own f32
    accumulators) and returns f32 features, the same mixed-precision law
    as DKT's flagship path; uint8 inputs are normalised BEFORE the cast
    (the cast would otherwise erase the integer marker the trunk's
    preprocess_input keys on), honouring the trunk's own normalisation
    law via its `imagenet_norm` attribute (Conv3 is /255-only)."""
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        if jnp.issubdtype(x.dtype, jnp.integer):
            from ..models.backbones import preprocess_input

            x = preprocess_input(
                x, imagenet=getattr(module, "imagenet_norm", True))
        variables = {**variables, "params": jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            variables["params"])}
        x = x.astype(dtype)
        cast_back = lambda z: z.astype(jnp.float32)
    else:
        cast_back = lambda z: z
    extra = {"ep_groups": ep_groups} if ep_groups != 1 else {}
    if train:
        out, mut = module.apply(variables, x, train=True,
                                mutable=["batch_stats"], **extra)
        return cast_back(out), mut.get("batch_stats", {})
    return cast_back(module.apply(variables, x, train=False, **extra)), None


def merge_stats(variables, stats):
    """Merge batch_stats updates (possibly with a leading vmap axis to
    average over) back into a flax variables dict."""
    if not stats:
        return variables
    old = variables.get("batch_stats")
    if old is not None:
        stats = jax.tree.map(
            lambda new, ref: (jnp.mean(new, axis=0)
                              if new.ndim == ref.ndim + 1 else new),
            stats, old)
    return {**variables, "batch_stats": stats}


class MethodState(NamedTuple):
    params: object
    opt_state: object
    step: Array


def train_step_body(method, state, xb):
    """The one training-step program: value_and_grad over the episode batch
    -> optimizer update -> BN running-average merge (per-episode updates
    averaged by merge_stats; zero-grad leaves were untouched by Adam).

    Shared by the single-device jitted path (EpisodicMethod.train_step)
    and the episode-sharded path (parallel.mesh.make_sharded_train_step),
    so the two can never drift apart. Under a sharded episode axis the
    jnp.mean inside batch_loss_train / merge_stats IS the psum."""
    import optax

    (loss, stats), grads = jax.value_and_grad(
        method.batch_loss_train, has_aux=True)(state.params, xb)
    updates, opt_state = method.tx.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    for key, st in (stats or {}).items():
        params = {**params, key: merge_stats(params[key], st)}
    return state._replace(params=params, opt_state=opt_state,
                          step=state.step + 1), {"loss": loss}


class EpisodicMethod:
    """Shared functional train/eval machinery for the comparison methods.

    Subclasses define:
      * self.tx          — an optax transform (reference train.py:40 uses a
                           single Adam over all params for these methods)
      * init_params(key, example_episode) -> params pytree
      * episode_loss(params, x[, key]) -> scalar
      * episode_scores(params, x[, key]) -> [n_way*n_query, n_way]

    This is the functional analog of MetaTemplate's default train_loop /
    test_loop / correct (reference meta_template.py:45-100).
    """

    n_way: int
    n_support: int
    tx: object

    # -- to be provided by subclasses --------------------------------------
    def init_params(self, key, example_episode):
        raise NotImplementedError

    def episode_loss_train(self, params, x):
        """(loss, {param_top_key: batch_stats_updates}) in train mode."""
        raise NotImplementedError

    def episode_scores(self, params, x):
        raise NotImplementedError

    # -- shared machinery --------------------------------------------------
    def init(self, key, example_episode) -> MethodState:
        params = self.init_params(key, example_episode)
        return MethodState(params, self.tx.init(params), jnp.zeros((), jnp.int32))

    def episode_loss(self, params, x: Array) -> Array:
        return self.episode_loss_train(params, x)[0]

    def batch_loss(self, params, xb: Array) -> Array:
        return jnp.mean(jax.vmap(lambda x: self.episode_loss(params, x))(xb))

    def batch_loss_train(self, params, xb: Array):
        losses, stats = jax.vmap(
            lambda x: self.episode_loss_train(params, x))(xb)
        return jnp.mean(losses), stats

    def train_step(self, state: MethodState, xb: Array):
        # jit once per (self, shape); cache on the instance.
        fn = self.__dict__.get("_train_step_fn")
        if fn is None:
            fn = jax.jit(lambda s, x: train_step_body(self, s, x))
            self.__dict__["_train_step_fn"] = fn
        return fn(state, xb)

    def batch_scores(self, params, xb: Array) -> Array:
        fn = self.__dict__.get("_batch_scores_fn")
        if fn is None:
            fn = jax.jit(
                lambda params, xb: jax.vmap(
                    lambda x: self.episode_scores(params, x)
                )(xb)
            )
            self.__dict__["_batch_scores_fn"] = fn
        return fn(params, xb)

    def correct(self, params, x: Array) -> tuple[float, int]:
        """(top1_correct, count) — reference meta_template.py:45-52."""
        n_query = x.shape[1] - self.n_support
        scores = self.batch_scores(params, x[None])[0]
        y = episode_labels(x.shape[0], n_query)
        pred = jnp.argmax(scores, axis=-1)
        return float(jnp.sum(pred == y)), int(x.shape[0] * n_query)

    def batch_correct(self, params, xb: Array) -> Array:
        """Per-episode accuracy% [B] in one vmapped dispatch."""
        n_way, n_total = xb.shape[1], xb.shape[2]
        y = episode_labels(n_way, n_total - self.n_support)
        scores = self.batch_scores(params, xb)  # [B, n_way*Q, n_way]
        pred = jnp.argmax(scores, axis=-1)
        return jnp.mean((pred == y[None]).astype(jnp.float32), axis=1) * 100.0
