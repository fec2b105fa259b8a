"""DKT — one-vs-rest deep-kernel GP few-shot classification (the paper's method).

TPU-native rebuild of reference methods/DKT.py. The reference trains n_way
independent GPyTorch ExactGPs in a python loop (IndependentModelList,
reference methods/DKT.py:68-71, 148-157); here the way axis is a vmap => ONE
batched [n_way, N, N] Cholesky per episode, and a further vmap batches whole
episodes, so a training step over B episodes is a single XLA computation:

    images [B, n_way, S+Q, H, W, C]
      -> features (Flax backbone, per-episode BatchNorm)   [B, N, D]
      -> (optional) L2 normalise (+ bn_out for bncossim)
      -> batched Gram + jittered Cholesky + MLL over [B, n_way]
      -> -sum MLL  ->  grads -> optax update (dual LR, psum over mesh)

Semantics preserved from the reference:
  * GP train data = support AND query features during meta-training
    (reference methods/DKT.py:126-164); support-only conditioning at test
    (methods/DKT.py:224-240).
  * +-1 one-vs-rest targets (methods/DKT.py:129-136).
  * prediction = argmax over ways of sigmoid(posterior mean)
    (methods/DKT.py:179-181, 258-271).
  * fixed likelihood noise 0.1, non-trainable (methods/DKT.py:346-347).
  * bncossim: BatchNorm1d appended to the trunk output + L2 normalisation
    (methods/DKT.py:45-48); cossim: L2 normalisation only.
  * dual learning rates: GP hyperparams 1e-4, feature net 1e-3, Adam state
    reset every epoch (methods/DKT.py:114-115 recreates the optimizer each
    epoch — reproduced via `reset_opt_state`).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..gp import ExactGP, GaussianLikelihood, make_kernel, normalizes_features
from ..gp.exact import batched_posterior, init_batched, sum_mll
from ..models.backbones import EpisodicBatchNorm
from .base import (MethodState, apply_trunk, episode_labels,
                   flatten_episode, one_vs_rest_targets, train_step_body)

Array = jax.Array


class DKTFeature(nn.Module):
    """Backbone (+ optional bncossim output BatchNorm, reference DKT.py:45-48)."""

    backbone: nn.Module
    bn_out: bool = False

    @property
    def imagenet_norm(self) -> bool:
        """Forward the wrapped trunk's normalisation law to apply_trunk."""
        return getattr(self.backbone, "imagenet_norm", True)

    @nn.compact
    def __call__(self, x: Array, train: bool = True,
                 ep_groups: int = 1) -> Array:
        if ep_groups != 1:
            z = self.backbone(x, train=train, ep_groups=ep_groups)
        else:
            z = self.backbone(x, train=train)
        if self.bn_out:
            z = EpisodicBatchNorm()(z, use_running_average=not train,
                                    ep_groups=ep_groups)
        return z


# one shared (params, opt_state, step) state tuple for every method
DKTState = MethodState


class DKT:
    """Functional DKT method. All heavy entry points are jit-compiled.

    Params pytree layout:
      {"feature": <flax variables>, "gp": <leading-n_way-axis gp params>}
    """

    def __init__(
        self,
        backbone: nn.Module,
        n_way: int,
        n_support: int,
        kernel_type: str = "bncossim",
        gp_lr: float = 1e-4,
        feature_lr: float = 1e-3,
        noise: float = 0.1,
        feature_dtype: str = "bfloat16",
        use_pallas_mll: bool = False,
        force_dense: bool | None = None,
    ):
        self.n_way = n_way
        self.n_support = n_support
        self.kernel_type = kernel_type
        # TPU-first: the conv trunk runs in bf16 on the MXU (~1.7x faster,
        # profiled: the trunk is ~90% of a train step); params, the L2
        # normalisation, and ALL GP numerics stay float32. Set
        # feature_dtype="float32" for exact-parity arithmetic.
        self.feature_dtype = jnp.dtype(feature_dtype)
        self.use_pallas_mll = use_pallas_mll
        self.normalize = normalizes_features(kernel_type)
        self.feature = DKTFeature(backbone, bn_out=(kernel_type == "bncossim"))
        # Fixed, non-trainable observation noise (reference DKT.py:346-347).
        # force_dense disables the Woodbury low-rank GP route (the
        # benchmarks/woodbury_workload.py A/B arm). None maps the
        # DKT_GP_FORCE_DENSE env var ONCE, here at construction — jitted
        # entry points cache per method object, so routing must not depend
        # on ambient state at trace time (build a fresh DKT to re-route).
        if force_dense is None:
            force_dense = ExactGP.force_dense_from_env()
        self.gp = ExactGP(
            make_kernel(kernel_type),
            GaussianLikelihood(trainable=False, fixed_noise=noise),
            force_dense=force_dense,
            # PSD kernel + fixed noise >= 0.1 => the noisy Gram is PD by
            # construction, so the jitter-probe factorisation is a provable
            # no-op here; skipping it removes one of the two forward
            # Choleskys from every MLL (bit-identical result, see
            # ExactGP.assume_pd)
            assume_pd=noise >= 1e-2,
        )
        self.tx = optax.multi_transform(
            {"gp": optax.adam(gp_lr), "feature": optax.adam(feature_lr)},
            param_labels={"gp": "gp", "feature": "feature"},
        )

    # -- init --------------------------------------------------------------

    def init(self, key: Array, example_episode: Array) -> DKTState:
        """example_episode: [n_way, S+Q, H, W, C] (content ignored)."""
        kf, kg = jax.random.split(key)
        x_flat = flatten_episode(example_episode)
        fvars = self.feature.init(kf, x_flat)
        gp_params = init_batched(self.gp, kg, self.n_way)
        params = {"feature": fvars, "gp": gp_params}
        return DKTState(params, self.tx.init(params), jnp.zeros((), jnp.int32))

    def reset_opt_state(self, state: DKTState) -> DKTState:
        """Reference recreates Adam every epoch (methods/DKT.py:114-115)."""
        return state._replace(opt_state=self.tx.init(state.params))

    # -- core --------------------------------------------------------------

    def _features(self, params, x_flat: Array, train: bool = False,
                  ep_groups: int = 1):
        """L2-normalised deep features. train=True uses batch-stat BN and
        returns (z, batch_stats_updates); train=False (the reference's
        model.eval() test protocol) uses running averages and returns
        (z, None). The mixed-precision law (bf16 weights, f32 BN stats,
        uint8 preprocessed before the cast, f32 features out) lives in
        base.apply_trunk — one copy for every method. ep_groups > 1:
        x_flat is that many episodes flattened together and BN statistics
        are per episode (grouped reductions — see apply_trunk)."""
        z, stats = apply_trunk(self.feature, params["feature"], x_flat,
                               train, dtype=self.feature_dtype,
                               ep_groups=ep_groups)
        if self.normalize:
            z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        return z, stats

    def _gp_params_for(self, params, n_way: int):
        """GP params for an episode with n_way ways: the reference's
        change_way support (reference meta_template.py:18, DKT.py:119) —
        a model trained train_n_way-way evaluates test_n_way-way episodes
        (test_n_way <= train_n_way) using the first n_way per-way GPs."""
        gp = params["gp"]
        if n_way == self.n_way:
            return gp
        assert n_way < self.n_way, (
            f"episode has {n_way} ways but the model holds {self.n_way} "
            "per-way GP parameter sets")
        return jax.tree.map(lambda a: a[:n_way], gp)

    def episode_loss_train(self, params, x: Array):
        """-sum_way MLL on one episode, GP conditioned on support+query,
        train-mode BN (reference methods/DKT.py:126-164)."""
        n_way, n_total = x.shape[0], x.shape[1]
        z, stats = self._features(params, flatten_episode(x), train=True)
        targets = one_vs_rest_targets(n_way, n_total)  # [n_way, n_way*k]
        gp_params = self._gp_params_for(params, n_way)
        return -sum_mll(self.gp, gp_params, z, targets), stats

    def episode_loss(self, params, x: Array) -> Array:
        return self.episode_loss_train(params, x)[0]

    def batch_loss(self, params, xb: Array) -> Array:
        return self.batch_loss_train(params, xb)[0]

    def batch_loss_train(self, params, xb: Array):
        """(mean episode loss, per-episode-averaged BN stats) over
        [B, n_way, S+Q, ...].

        The trunk runs ONCE on the flat [B*n_way*(S+Q)] image batch with
        per-episode BN statistics computed as grouped reductions
        (ep_groups, see base.apply_trunk) — same math as vmapping
        episode_loss_train over episodes (regression-tested to f32
        parity), but the convolutions stay un-vmapped: the episodic vmap
        structure alone measured ~29% of the ResNet10@224 trunk fwd+bwd
        (docs/DESIGN.md §1). Only the O(N²)/O(N³) GP tail is vmapped."""
        if self.use_pallas_mll:
            from ..ops.pallas.fused_mll import supports

            n = xb.shape[1] * xb.shape[2]
            if supports(self.kernel_type, n):
                return self._batch_loss_pallas(params, xb)
        b, n_way, n_total = xb.shape[0], xb.shape[1], xb.shape[2]
        x_flat = xb.reshape((b * n_way * n_total,) + xb.shape[3:])
        z, stats = self._features(params, x_flat, train=True, ep_groups=b)
        z = z.reshape(b, n_way * n_total, z.shape[-1])
        targets = one_vs_rest_targets(n_way, n_total)
        gp_params = self._gp_params_for(params, n_way)
        losses = jax.vmap(
            lambda zz: -sum_mll(self.gp, gp_params, zz, targets))(z)
        return jnp.mean(losses), {"feature": stats}

    def _batch_loss_pallas(self, params, xb: Array) -> Array:
        """Fused-kernel episode batch loss (ops/pallas/fused_mll.py): one
        Pallas program per episode does Gram+Cholesky+solves+MLL in VMEM.
        Off by default — see the kernel docstring for measured timings."""
        from ..gp.kernels import softplus
        from ..ops.pallas.fused_mll import fused_linear_mll

        n_way, n_total = xb.shape[1], xb.shape[2]
        n = n_way * n_total
        z, stats = jax.vmap(
            lambda x: self._features(params, flatten_episode(x), train=True))(xb)
        targets = one_vs_rest_targets(n_way, n_total)  # [W, N]
        gp = self._gp_params_for(params, n_way)  # change_way slicing
        diffs = targets - gp["mean"]["constant"][:, None]
        scales = softplus(gp["kernel"]["raw_outputscale"])
        base = gp["kernel"].get("base", {})
        if "raw_variance" in base:  # 'linear' kernel_type
            scales = scales * softplus(base["raw_variance"])
        mll = fused_linear_mll(z, diffs, scales, n,
                               float(self.gp.likelihood.fixed_noise))
        return -jnp.mean(jnp.sum(mll, axis=1)), {"feature": stats}

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: DKTState, xb: Array) -> tuple[DKTState, dict]:
        # the SAME program as every other path (base.train_step_body; the
        # sharded mesh step also runs it) + DKT's hyperparameter telemetry
        state, metrics = train_step_body(self, state, xb)
        return state, {**metrics, **self._hyper_metrics(state.params)}

    def _hyper_metrics(self, params) -> dict:
        """Mean outputscale / lengthscale / noise telemetry
        (reference methods/DKT.py:148-157 logs these per episode)."""
        out = {}
        kernel = params["gp"].get("kernel", {})
        if "raw_outputscale" in kernel:
            out["outputscale"] = jnp.mean(
                jax.nn.softplus(kernel["raw_outputscale"]))
        base = kernel.get("base", {})
        if "raw_lengthscale" in base:
            out["lengthscale"] = jnp.mean(
                jax.nn.softplus(base["raw_lengthscale"]))
        out["noise"] = jnp.asarray(self.gp.likelihood.fixed_noise)
        return out

    @partial(jax.jit, static_argnums=0)
    def train_telemetry(self, params, xb: Array) -> dict:
        """Per-print_freq training telemetry (reference methods/DKT.py:167-196):
        GP support/query accuracy with the GP conditioned on support+query
        (the meta-training protocol) under eval-mode BN, plus the first
        episode's support features for the z_support histogram — all in ONE
        device dispatch."""
        n_way, n_total = xb.shape[1], xb.shape[2]
        n_support = self.n_support
        labels = episode_labels(n_way, n_total)  # [N] over all points
        # flatten_episode orders points way-major: first n_support of each
        # way's n_total block are support
        support_mask = jnp.tile(
            (jnp.arange(n_total) < n_support).astype(jnp.float32), n_way)

        def one(x):
            z_all, _ = self._features(params, flatten_episode(x))
            targets = one_vs_rest_targets(n_way, n_total)
            gp_params = self._gp_params_for(params, n_way)
            post = batched_posterior(self.gp, gp_params, z_all, targets, z_all)
            pred = jnp.argmax(jax.nn.sigmoid(post.mean.T), axis=-1)  # [N]
            hit = (pred == labels).astype(jnp.float32)
            acc_s = jnp.sum(hit * support_mask) / jnp.sum(support_mask)
            acc_q = jnp.sum(hit * (1 - support_mask)) / jnp.sum(1 - support_mask)
            return acc_s * 100.0, acc_q * 100.0, z_all

        acc_s, acc_q, z = jax.vmap(one)(xb)
        d = z.shape[-1]
        z_support = z[0].reshape(n_way, n_total, d)[:, :n_support].reshape(-1, d)
        return {"GP_support_accuracy": jnp.mean(acc_s),
                "GP_query_accuracy": jnp.mean(acc_q),
                "z_support": z_support}

    # -- prediction --------------------------------------------------------

    def _logits_from_features(self, params, z_all: Array, n_way: int,
                              n_total: int,
                              condition_on_all: bool = False) -> Array:
        """episode_logits given precomputed features (so adaptation paths
        can reuse one trunk forward — the trunk is ~90% of the cost)."""
        n_support = self.n_support
        d = z_all.shape[-1]
        z = z_all.reshape(n_way, n_total, d)
        z_support = z[:, :n_support].reshape(n_way * n_support, d)
        z_query = z[:, n_support:].reshape(-1, d)
        gp_params = self._gp_params_for(params, n_way)
        if condition_on_all:
            targets = one_vs_rest_targets(n_way, n_total)
            post = batched_posterior(self.gp, gp_params, z_all, targets, z_query)
        else:
            targets = one_vs_rest_targets(n_way, n_support)
            post = batched_posterior(self.gp, gp_params, z_support, targets, z_query)
        return post.mean.T  # [n_query_total, n_way]

    def episode_logits(self, params, x: Array, condition_on_all: bool = False) -> Array:
        """Posterior means of each way's GP at the query points.

        Returns [n_way*Q, n_way] (queries x ways), the reference's stacked
        `gaussian.mean` layout (methods/DKT.py:297-335). Conditioning is on
        support only (test protocol) unless condition_on_all.
        """
        z_all, _ = self._features(params, flatten_episode(x))
        return self._logits_from_features(params, z_all, x.shape[0],
                                          x.shape[1], condition_on_all)

    def episode_scores(self, params, x: Array) -> Array:
        """sigmoid(mean) scores (reference methods/DKT.py:258-271)."""
        return jax.nn.sigmoid(self.episode_logits(params, x))

    @partial(jax.jit, static_argnums=0)
    def batch_scores(self, params, xb: Array) -> Array:
        return jax.vmap(lambda x: self.episode_scores(params, x))(xb)

    @partial(jax.jit, static_argnums=0)
    def batch_logits(self, params, xb: Array) -> Array:
        return jax.vmap(lambda x: self.episode_logits(params, x))(xb)

    def correct(self, params, x: Array) -> tuple[float, int]:
        """(top1_correct, count) on one episode (reference methods/DKT.py:199-272)."""
        n_way, n_total = x.shape[0], x.shape[1]
        n_query = n_total - self.n_support
        scores = self.episode_scores(params, x)
        y_query = episode_labels(n_way, n_query)
        pred = jnp.argmax(scores, axis=-1)
        return float(jnp.sum(pred == y_query)), n_way * n_query

    @partial(jax.jit, static_argnums=0)
    def batch_correct(self, params, xb: Array) -> Array:
        """Per-episode accuracy%% [B] — the test loop's 600 episodes run in
        vmapped batches instead of one device dispatch per episode."""
        n_way, n_total = xb.shape[1], xb.shape[2]
        n_query = n_total - self.n_support
        y_query = episode_labels(n_way, n_query)

        def one(x):
            pred = jnp.argmax(self.episode_scores(params, x), axis=-1)
            return jnp.mean((pred == y_query).astype(jnp.float32)) * 100.0

        return jax.vmap(one)(xb)

    def _episode_laplace_pred(self, params, x: Array) -> Array:
        """[n_way*Q] predicted class ids from the Laplace GPC head."""
        from ..gp.laplace import laplace_ovr_predict

        n_way, n_total = x.shape[0], x.shape[1]
        n_support = self.n_support
        z_all, _ = self._features(params, flatten_episode(x))
        d = z_all.shape[-1]
        z = z_all.reshape(n_way, n_total, d)
        z_support = z[:, :n_support].reshape(n_way * n_support, d)
        z_query = z[:, n_support:].reshape(-1, d)
        y_support = episode_labels(n_way, n_support)
        return laplace_ovr_predict(z_support, y_support, z_query, n_way)

    def correct_laplace(self, params, x: Array) -> tuple[float, int]:
        """Laplace-approximation test head (reference methods/DKT.py:207-222:
        sklearn GaussianProcessClassifier with 1.0*RBF(0.1) on the support
        features) — rebuilt as a vmapped JAX Laplace GPC, so it runs
        on-device instead of sklearn-on-CPU."""
        n_way, n_total = x.shape[0], x.shape[1]
        n_query = n_total - self.n_support
        pred = self._episode_laplace_pred(params, x)
        y_query = episode_labels(n_way, n_query)
        return float(jnp.sum(pred == y_query)), n_way * n_query

    @partial(jax.jit, static_argnums=0)
    def batch_correct_laplace(self, params, xb: Array) -> Array:
        """Per-episode Laplace-head accuracy% [B]: the --laplace test loop
        batches like the standard path instead of one dispatch per episode
        (all ways x episodes share one batched Newton solve)."""
        n_way, n_total = xb.shape[1], xb.shape[2]
        y_query = episode_labels(n_way, n_total - self.n_support)

        def one(x):
            pred = self._episode_laplace_pred(params, x)
            return jnp.mean((pred == y_query).astype(jnp.float32)) * 100.0

        return jax.vmap(one)(xb)

    @partial(jax.jit, static_argnums=(0, 3))
    def batch_correct_adapted(self, params, xb: Array, steps: int,
                              lr: float = 1e-3) -> Array:
        """Per-episode accuracy% [B] after `steps` of per-episode GP
        hyperparameter adaptation on the support set (the --adaptation
        path, reference DKT.py:249-256) — each episode's lax.scan adapt
        runs under one vmap, so 600 episodes are ceil(600/B) dispatches."""
        n_way, n_total = xb.shape[1], xb.shape[2]
        y_query = episode_labels(n_way, n_total - self.n_support)

        def one(x):
            # ONE trunk forward per episode: adaptation and scoring share
            # the features (adapt_gp only changes params['gp'])
            z_all, _ = self._features(params, flatten_episode(x))
            p = self.adapt_gp(params, x, steps=steps, lr=lr, z_all=z_all)
            scores = jax.nn.sigmoid(
                self._logits_from_features(p, z_all, n_way, n_total))
            pred = jnp.argmax(scores, axis=-1)
            return jnp.mean((pred == y_query).astype(jnp.float32)) * 100.0

        return jax.vmap(one)(xb)

    # -- test-time GP adaptation (reference correct(N>0), DKT.py:249-256) --

    def adapt_gp(self, params, x: Array, steps: int, lr: float = 1e-3,
                 z_all: Array | None = None):
        """Optimise GP hyperparams on the support set for `steps` Adam steps.

        The reference's optional test-time adaptation optimises the GP (not
        the feature net) against the support MLL. Runs as a lax.scan so it
        stays on-device. Pass `z_all` (the episode's flattened features) to
        reuse an existing trunk forward."""
        if steps == 0:
            return params
        n_way = x.shape[0]
        n_support = self.n_support
        if z_all is None:
            z_all, _ = self._features(params, flatten_episode(x))
        d = z_all.shape[-1]
        z_support = (
            z_all.reshape(n_way, -1, d)[:, :n_support].reshape(n_way * n_support, d)
        )
        targets = one_vs_rest_targets(n_way, n_support)
        tx = optax.adam(lr)
        gp0 = self._gp_params_for(params, n_way)  # change_way slicing

        def loss_fn(gp_params):
            return -sum_mll(self.gp, gp_params, z_support, targets)

        def step(carry, _):
            gp_params, opt_state = carry
            g = jax.grad(loss_fn)(gp_params)
            updates, opt_state = tx.update(g, opt_state)
            return (optax.apply_updates(gp_params, updates), opt_state), None

        (gp_params, _), _ = jax.lax.scan(
            step, (gp0, tx.init(gp0)), None, length=steps
        )
        return {**params, "gp": gp_params}
