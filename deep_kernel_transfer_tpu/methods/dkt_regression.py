"""DKT regression — single ExactGP over deep features (QMUL / sines).

TPU-native rebuild of reference methods/DKT_regression.py and the sines DKT
script (reference sines/train_DKT.py): a feature net (Conv3 for QMUL, MLP2
for sines) feeds an ExactGP with a trainable Gaussian likelihood; training
minimises -MLL per task; testing conditions on n_support points and reports
MSE (plus a confidence region for uncertainty plots).

The per-person python loop of the reference train_loop
(methods/DKT_regression.py:45-64) becomes a vmap over the task axis: one
batched [n_tasks, N, N] Cholesky per step and a single optimizer update on
the mean loss (the reference steps per person sequentially; batching is the
TPU-idiomatic equivalent with the same objective in expectation, and an
`unbatched_train_step` is provided for strict step-per-task parity).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..gp import ExactGP, GaussianLikelihood, make_kernel
from .base import MethodState

Array = jax.Array


DKTRegressionState = MethodState  # shared (params, opt_state, step)


class DKTRegression:
    """Params layout: {"feature": <flax vars>, "gp": <gp params>}."""

    def __init__(
        self,
        backbone: nn.Module,
        feat_dim: int,
        kernel_type: str = "rbf",
        lr: float = 1e-3,
        num_mixtures: int = 4,
        force_dense: bool | None = None,
    ):
        self.feature = backbone
        self.kernel_type = kernel_type
        # 'spectral' needs ard_num_dims = feature dim (reference
        # methods/DKT_regression.py:122: num_mixtures=4, ard_num_dims=2916).
        # force_dense / DKT_GP_FORCE_DENSE: same contract as DKT.__init__ —
        # the regression track constructs an ExactGP too, so the dense-Gram
        # escape hatch must reach it (read once here, never at trace time).
        if force_dense is None:
            force_dense = ExactGP.force_dense_from_env()
        self.gp = ExactGP(
            make_kernel(kernel_type, dim=feat_dim, num_mixtures=num_mixtures),
            GaussianLikelihood(trainable=True),
            force_dense=force_dense,
        )
        # Dual param-group Adam, both 1e-3 (reference train_regression.py:33-34).
        self.tx = optax.adam(lr)

    def init(self, key: Array, example_x: Array) -> DKTRegressionState:
        """example_x: [N, ...input shape] for one task."""
        kf, kg = jax.random.split(key)
        fvars = self.feature.init(kf, example_x)
        params = {"feature": fvars, "gp": self.gp.init(kg)}
        return DKTRegressionState(params, self.tx.init(params), jnp.zeros((), jnp.int32))

    # -- core --------------------------------------------------------------

    def _features(self, params, x: Array, train: bool = True) -> Array:
        """The regression track supports stat-free trunks only (Conv3/MLP2,
        like the reference): a BatchNorm trunk would need the
        mutable=['batch_stats'] machinery of the classification track
        (methods/base.apply_trunk); train is threaded so eval paths see
        eval-mode semantics either way."""
        return self.feature.apply(params["feature"], x, train=train)

    def task_loss(self, params, x: Array, y: Array) -> Array:
        """-MLL of one task, GP conditioned on all its points
        (reference methods/DKT_regression.py:48-57)."""
        z = self._features(params, x)
        return -self.gp.mll(params["gp"], z, y)

    def batch_loss(self, params, xb: Array, yb: Array) -> Array:
        """Mean -MLL over a batch of tasks [B, N, ...]."""
        return jnp.mean(jax.vmap(lambda x, y: self.task_loss(params, x, y))(xb, yb))

    @partial(jax.jit, static_argnums=0)
    def train_step(self, state: DKTRegressionState, xb: Array, yb: Array):
        loss, grads = jax.value_and_grad(self.batch_loss)(state.params, xb, yb)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        noise = self.gp.likelihood.noise(params["gp"]["likelihood"])
        return (
            DKTRegressionState(params, opt_state, state.step + 1),
            {"loss": loss, "noise": noise},
        )

    @partial(jax.jit, static_argnums=0)
    def unbatched_train_step(self, state: DKTRegressionState, xb: Array, yb: Array):
        """Strict parity mode: one sequential optimizer step per task (the
        reference's per-person loop, methods/DKT_regression.py:48-57) as a
        lax.scan — still a single XLA computation."""

        def one(carry, xy):
            params, opt_state = carry
            x, y = xy
            loss, grads = jax.value_and_grad(self.task_loss)(params, x, y)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (state.params, state.opt_state), (xb, yb)
        )
        noise = self.gp.likelihood.noise(params["gp"]["likelihood"])
        return (
            # one optimizer update was applied PER task: step counts them
            # all (the reference's per-person step count)
            DKTRegressionState(params, opt_state, state.step + xb.shape[0]),
            {"loss": jnp.mean(losses), "noise": noise},
        )

    def init_spectral_from_data(self, state: DKTRegressionState, x: Array,
                                y: Array, key: Array) -> DKTRegressionState:
        """OPTIONAL data-driven spectral-mixture init over the current
        features (gpytorch initialize_from_data analog; the reference never
        calls it — see gp/kernels.py:initialize_spectral_from_data)."""
        from ..gp.kernels import initialize_spectral_from_data

        if self.kernel_type != "spectral":
            return state
        z = self._features(state.params, x, train=False)
        kernel_params = initialize_spectral_from_data(
            state.params["gp"]["kernel"], z, y, key)
        params = dict(state.params)
        params["gp"] = {**state.params["gp"], "kernel": kernel_params}
        return state._replace(params=params, opt_state=self.tx.init(params))

    # -- evaluation --------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def predict(self, params, x_support: Array, y_support: Array, x_query: Array):
        """Posterior (with observation noise) at query points: the
        `likelihood(model(z_query))` path of reference
        methods/DKT_regression.py:90-93. Returns a MultivariateNormal."""
        z_s = self._features(params, x_support, train=False)
        z_q = self._features(params, x_query, train=False)
        post = self.gp.posterior(params["gp"], z_s, y_support, z_q)
        return self.gp.likelihood(params["gp"]["likelihood"], post)

    def test_mse(self, params, x_support, y_support, x_query, y_query) -> float:
        pred = self.predict(params, x_support, y_support, x_query)
        return float(jnp.mean((pred.mean - y_query) ** 2))
