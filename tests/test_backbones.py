"""Backbone shape/parity tests (feature dims must match reference
backbone.py:264,281,304,323,368-370)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_kernel_transfer_tpu.models import (
    Conv3,
    Conv4,
    Conv4NP,
    Conv4S,
    Conv4SNP,
    DistLinear,
    MLP2,
    ResNet10,
    feat_dims,
)


def _init_apply(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(vars_, x, mutable=["batch_stats"])
    return out


def test_conv4_feat_dim_84():
    out = _init_apply(Conv4(), (2, 84, 84, 3))
    assert out.shape == (2, 1600)  # 5*5*64, reference backbone.py:264


def test_conv4s_feat_dim_28():
    out = _init_apply(Conv4S(), (2, 28, 28, 3))
    assert out.shape == (2, 64)  # reference backbone.py:304


def test_conv4np_map_shape():
    out = _init_apply(Conv4NP(), (2, 84, 84, 3))
    assert out.shape == (2, 19, 19, 64)  # reference backbone.py:281 ([64,19,19] CHW)


def test_conv4snp_map_shape():
    out = _init_apply(Conv4SNP(), (2, 28, 28, 3))
    assert out.shape == (2, 5, 5, 64)  # reference backbone.py:323


def test_conv3_qmul_feat_dim():
    out = _init_apply(Conv3(), (2, 100, 100, 3))
    assert out.shape == (2, 2916)  # reference backbone.py:378-402


def test_resnet10_feat_dim():
    out = _init_apply(ResNet10(), (2, 224, 224, 3))
    assert out.shape == (2, 512)  # reference backbone.py:368


def test_mlp2():
    out = _init_apply(MLP2(), (7, 1))
    assert out.shape == (7, 40)
    assert bool((out >= 0).all())  # relu output


def test_dist_linear_scores_bounded():
    head = DistLinear(out_dim=5)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 16), jnp.float32)
    vars_ = head.init(jax.random.PRNGKey(0), x)
    scores = head.apply(vars_, x)
    assert scores.shape == (8, 5)
    # cosine in [-1,1] scaled by 2 and unit init norms -> |scores| <= ~2
    assert float(jnp.abs(scores).max()) <= 2.5


def test_batchnorm_is_per_episode_under_vmap():
    """Train-mode BN statistics must not leak across vmapped episodes
    (SURVEY.md §7 hard part (c))."""
    model = Conv4S()
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 28, 28, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x[0])

    def fwd(e):
        out, _ = model.apply(vars_, e, train=True, mutable=["batch_stats"])
        return out

    batched = jax.vmap(fwd)(x)
    single = fwd(x[1])
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                               rtol=2e-2, atol=2e-3)


def test_batchnorm_running_stats_update_and_eval():
    """Torch-convention running averages: train mode updates them, eval
    mode uses them (the reference's model.eval() test protocol)."""
    model = Conv4S()
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (16, 28, 28, 3)) * 2.0 + 1.0
    vars_ = model.init(jax.random.PRNGKey(0), x)
    stats0 = vars_["batch_stats"]

    out_train, mut = model.apply(vars_, x, train=True,
                                 mutable=["batch_stats"])
    stats1 = mut["batch_stats"]
    # stats moved toward the batch statistics
    l0, l1 = jax.tree.leaves(stats0), jax.tree.leaves(stats1)
    assert any(float(jnp.abs(a - b).max()) > 1e-6 for a, b in zip(l0, l1))

    # eval with updated stats is deterministic and batch-independent
    vars2 = {**vars_, "batch_stats": stats1}
    e1 = model.apply(vars2, x[:4], train=False)
    e2 = model.apply(vars2, x[:8], train=False)[:4]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)
