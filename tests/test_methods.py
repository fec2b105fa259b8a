"""Comparison-method episode tests on synthetic data (SURVEY.md §4b).

Each method must (a) run jitted train steps with finite decreasing loss and
(b) beat chance on linearly-separable synthetic episodes after a few steps.
Small backbones keep single-core CPU compile times sane.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_kernel_transfer_tpu.methods import (
    BaselineFinetune,
    BaselineTrain,
    FeatureTransfer,
    MAML,
    MatchingNet,
    ProtoNet,
    RelationNet,
)
from deep_kernel_transfer_tpu.models.backbones import ConvNetS, ConvNetSNopool, MLP2

N_WAY, N_SUPPORT, N_QUERY = 4, 3, 4
IMG = 16


def synthetic_episode(rng, n_way=N_WAY, k=N_SUPPORT + N_QUERY):
    x = rng.randn(n_way, k, IMG, IMG, 3).astype(np.float32) * 0.3
    for w in range(n_way):
        r, c = divmod(w, 2)
        # mild signal: strong enough to learn, weak enough that the CE loss
        # does not saturate to exactly 0.0 at init (squared-distance scores
        # over ~1k feature dims produce huge softmax margins otherwise)
        x[w, :, r * 6:r * 6 + 5, c * 6:c * 6 + 5, :] += 0.3
    return x


def _train_and_eval(method, steps=20, batch=2, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    state = method.init(jax.random.PRNGKey(0), jnp.asarray(synthetic_episode(rng)))
    losses = []
    for _ in range(steps):
        xb = jnp.asarray(np.stack([synthetic_episode(rng) for _ in range(batch)]))
        state, m = method.train_step(state, xb)
        losses.append(float(m["loss"]))
    correct = total = 0
    for _ in range(4):
        c, n = method.correct(state.params, jnp.asarray(synthetic_episode(rng)))
        correct += c
        total += n
    return losses, correct / total * 100


def test_protonet_learns():
    losses, acc = _train_and_eval(
        ProtoNet(ConvNetS(depth=2), N_WAY, N_SUPPORT), steps=60
    )
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    assert acc > 50.0  # chance = 25%


def test_maml_learns():
    m = MAML(ConvNetS(depth=2), N_WAY, N_SUPPORT,
             n_task=2, task_update_num=2, train_lr=0.05)
    losses, acc = _train_and_eval(m, steps=20)
    assert np.isfinite(losses).all()
    assert acc > 50.0


def test_maml_approx_runs():
    m = MAML(ConvNetS(depth=2), N_WAY, N_SUPPORT, approx=True,
             n_task=2, task_update_num=1)
    rng = np.random.RandomState(0)
    state = m.init(jax.random.PRNGKey(0), jnp.asarray(synthetic_episode(rng)))
    xb = jnp.asarray(np.stack([synthetic_episode(rng) for _ in range(2)]))
    state, metrics = m.train_step(state, xb)
    assert np.isfinite(float(metrics["loss"]))


def test_matchingnet_learns():
    # tiny feature dim via a 2-block conv on 16px -> flatten
    m = MatchingNet(ConvNetS(depth=2), feat_dim=4 * 4 * 64,
                    n_way=N_WAY, n_support=N_SUPPORT)
    # eval uses running-average BN (momentum 0.1): needs ~50 steps to warm up
    losses, acc = _train_and_eval(m, steps=60)
    assert np.isfinite(losses).all()
    assert acc > 45.0


def test_relationnet_learns():
    # ConvNetSNopool on 16px: two pooled valid blocks -> [2,2,64]
    m = RelationNet(ConvNetSNopool(depth=2), feat_shape=(2, 2, 64),
                    n_way=N_WAY, n_support=N_SUPPORT, loss_type="mse")
    # eval uses running-average BN: allow it to warm up
    losses, acc = _train_and_eval(m, steps=60)
    assert np.isfinite(losses).all()
    assert acc > 45.0


def test_relationnet_softmax_runs():
    m = RelationNet(ConvNetSNopool(depth=2), feat_shape=(2, 2, 64),
                    n_way=N_WAY, n_support=N_SUPPORT, loss_type="softmax")
    rng = np.random.RandomState(0)
    state = m.init(jax.random.PRNGKey(0), jnp.asarray(synthetic_episode(rng)))
    xb = jnp.asarray(np.stack([synthetic_episode(rng)]))
    state, metrics = m.train_step(state, xb)
    assert np.isfinite(float(metrics["loss"]))


def test_baseline_train_and_finetune():
    bt = BaselineTrain(ConvNetS(depth=2), num_class=8, loss_type="softmax")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, IMG, IMG, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 8, 16))
    state = bt.init(jax.random.PRNGKey(0), x)
    state, m1 = bt.train_step(state, x, y)
    state, m2 = bt.train_step(state, x, y)
    assert float(m2["loss"]) < float(m1["loss"])

    # finetune on separable features
    d = 32
    z = rng.randn(N_WAY, N_SUPPORT + N_QUERY, d).astype(np.float32) * 0.1
    for w in range(N_WAY):
        z[w, :, w * 5:(w + 1) * 5] += 2.0
    bf = BaselineFinetune(d, N_WAY, N_SUPPORT, loss_type="softmax",
                          finetune_epochs=30)
    c, n = bf.correct(jax.random.PRNGKey(0), jnp.asarray(z))
    assert c / n * 100 > 60.0


def test_baseline_plusplus_finetune():
    rng = np.random.RandomState(0)
    d = 32
    z = rng.randn(N_WAY, N_SUPPORT + N_QUERY, d).astype(np.float32) * 0.1
    for w in range(N_WAY):
        z[w, :, w * 5:(w + 1) * 5] += 2.0
    bf = BaselineFinetune(d, N_WAY, N_SUPPORT, loss_type="dist",
                          finetune_epochs=30)
    c, n = bf.correct(jax.random.PRNGKey(0), jnp.asarray(z))
    assert c / n * 100 > 60.0


def test_feature_transfer_regression():
    ft = FeatureTransfer(MLP2())
    rng = np.random.RandomState(0)
    state = ft.init(jax.random.PRNGKey(0), jnp.zeros((10, 1)))
    # tasks: y = a*x; transfer should fit the mean task then adapt
    first = last = None
    for i in range(60):
        a = rng.uniform(0.5, 1.5, (4, 1))
        x = rng.uniform(-2, 2, (4, 10, 1)).astype(np.float32)
        y = (a[:, :, None] * x)[:, :, 0].astype(np.float32)
        state, m = ft.train_step(state, jnp.asarray(x), jnp.asarray(y))
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first
    xs = np.linspace(-2, 2, 5).reshape(-1, 1).astype(np.float32)
    ys = (1.2 * xs)[:, 0]
    xa = np.linspace(-2, 2, 20).reshape(-1, 1).astype(np.float32)
    ya = (1.2 * xa)[:, 0]
    mse = ft.test_mse(state, jnp.asarray(xs), jnp.asarray(ys),
                      jnp.asarray(xa), jnp.asarray(ya))
    assert mse < 1.0


def test_relationnet_adapted_scores():
    """Test-time relation-module finetune (reference relationnet.py:42-93)."""
    m = RelationNet(ConvNetSNopool(depth=2), feat_shape=(2, 2, 64),
                    n_way=N_WAY, n_support=N_SUPPORT, loss_type="mse")
    rng = np.random.RandomState(5)
    ep = jnp.asarray(synthetic_episode(rng))
    state = m.init(jax.random.PRNGKey(0), ep)
    z = m.feature.apply(state.params["feature"],
                        ep.reshape((-1,) + ep.shape[2:]), train=False)
    z = z.reshape(N_WAY, N_SUPPORT + N_QUERY, 2, 2, 64)
    scores = m.adapted_scores_from_features(state.params, z,
                                            jax.random.PRNGKey(1))
    assert scores.shape == (N_WAY * N_QUERY, N_WAY)
    assert np.isfinite(np.asarray(scores)).all()


def test_torch_sgd_first_step_matches_torch():
    """torch SGD seeds the momentum buffer with the FULL gradient on step 1
    (no dampening), then applies dampening afterwards."""
    import optax
    from deep_kernel_transfer_tpu.utils.torch_optim import torch_sgd

    tx = torch_sgd(lr=0.1, momentum=0.9, dampening=0.9, weight_decay=0.0)
    p = jnp.asarray(1.0)
    g = jnp.asarray(2.0)
    opt = tx.init(p)
    u1, opt = tx.update(g, opt, p)
    np.testing.assert_allclose(float(u1), -0.1 * 2.0, rtol=1e-6)  # lr*g
    # step 2: buf = 0.9*2.0 + 0.1*2.0 = 2.0 -> update = -0.2 again
    u2, opt = tx.update(g, opt, p)
    np.testing.assert_allclose(float(u2), -0.1 * 2.0, rtol=1e-6)
    # a different gradient now moves the EMA slowly
    u3, _ = tx.update(jnp.asarray(0.0), opt, p)
    np.testing.assert_allclose(float(u3), -0.1 * 0.9 * 2.0, rtol=1e-6)


def test_relationnet_adapted_scores_one_shot():
    """n_support=1 leaves no finetune sub-split; adaptation degrades
    gracefully to plain scoring instead of crashing."""
    m = RelationNet(ConvNetSNopool(depth=2), feat_shape=(2, 2, 64),
                    n_way=N_WAY, n_support=1, loss_type="mse")
    rng = np.random.RandomState(6)
    ep = jnp.asarray(synthetic_episode(rng, k=1 + N_QUERY))
    state = m.init(jax.random.PRNGKey(0), ep)
    z = m.feature.apply(state.params["feature"],
                        ep.reshape((-1,) + ep.shape[2:]), train=False)
    z = z.reshape(N_WAY, 1 + N_QUERY, 2, 2, 64)
    scores = m.adapted_scores_from_features(state.params, z,
                                            jax.random.PRNGKey(1))
    assert scores.shape == (N_WAY * N_QUERY, N_WAY)
    assert np.isfinite(np.asarray(scores)).all()


def test_relation_module_geometry_matches_module():
    """The shared geometry law (used by torch_import/export for the fc1
    permutation) must agree with RelationConvBlock's ACTUAL output shape —
    including the conditional maxpool skip on small/asymmetric maps."""
    import jax
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.methods.relationnet import (
        RelationConvBlock, relation_module_geometry)

    for h, w in [(19, 19), (7, 7), (5, 5), (8, 3), (2, 2), (3, 8), (4, 4)]:
        hs, ws, padding = relation_module_geometry(h, w)
        x = jnp.zeros((1, h, w, 6))
        blk = RelationConvBlock(3, padding=padding)

        def fwd(x):
            y = blk.apply(blk.init(jax.random.PRNGKey(0), x), x,
                          train=False)
            return y

        y = fwd(fwd(x))
        assert y.shape[1:3] == (hs, ws), (h, w, y.shape, (hs, ws))
