"""DKT one-vs-rest GP classification on synthetic episodes.

Uses tiny images whose class identity is linearly decodable so a few train
steps must push query accuracy well above chance (SURVEY.md §4b)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_kernel_transfer_tpu.methods.base import (
    episode_labels,
    one_vs_rest_targets,
)
from deep_kernel_transfer_tpu.methods.dkt import DKT
from deep_kernel_transfer_tpu.models.backbones import ConvNetS


N_WAY, N_SUPPORT, N_QUERY = 5, 5, 6
IMG = 16


def synthetic_episode(rng, n_way=N_WAY, k=N_SUPPORT + N_QUERY):
    """Each class = a bright blob in a class-specific corner + noise."""
    x = rng.randn(n_way, k, IMG, IMG, 3).astype(np.float32) * 0.3
    for w in range(n_way):
        r, c = divmod(w, 3)
        x[w, :, r * 5:r * 5 + 5, c * 5:c * 5 + 5, :] += 2.0
    return x


def batch(rng, b=2):
    return np.stack([synthetic_episode(rng) for _ in range(b)])


@pytest.fixture(scope="module")
def trained():
    model = DKT(ConvNetS(depth=2), n_way=N_WAY, n_support=N_SUPPORT,
                kernel_type="bncossim")
    rng = np.random.RandomState(0)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(synthetic_episode(rng)))
    losses = []
    for i in range(25):
        xb = jnp.asarray(batch(rng))
        state, m = model.train_step(state, xb)
        losses.append(float(m["loss"]))
    return model, state, losses, rng


def test_one_vs_rest_targets():
    t = np.asarray(one_vs_rest_targets(3, 2))
    expected = np.array(
        [[1, 1, -1, -1, -1, -1], [-1, -1, 1, 1, -1, -1], [-1, -1, -1, -1, 1, 1]],
        np.float32,
    )
    np.testing.assert_array_equal(t, expected)


def test_episode_labels():
    np.testing.assert_array_equal(np.asarray(episode_labels(3, 2)), [0, 0, 1, 1, 2, 2])


def test_loss_decreases(trained):
    _, _, losses, _ = trained
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_query_accuracy_above_chance(trained):
    model, state, _, rng = trained
    correct = total = 0
    for _ in range(6):
        x = jnp.asarray(synthetic_episode(rng))
        c, n = model.correct(state.params, x)
        correct += c
        total += n
    acc = correct / total * 100
    assert acc > 60.0, f"query acc {acc:.1f}% not above chance (20%)"


def test_scores_shape_and_range(trained):
    model, state, _, rng = trained
    x = jnp.asarray(synthetic_episode(rng))
    scores = model.episode_scores(state.params, x)
    assert scores.shape == (N_WAY * N_QUERY, N_WAY)
    assert float(scores.min()) >= 0.0 and float(scores.max()) <= 1.0  # sigmoid

    logits = model.episode_logits(state.params, x)
    assert logits.shape == (N_WAY * N_QUERY, N_WAY)


def test_gp_adaptation_runs(trained):
    model, state, _, rng = trained
    x = jnp.asarray(synthetic_episode(rng))
    adapted = model.adapt_gp(state.params, x, steps=3)
    # gp params changed, feature params untouched
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()),
                     adapted["feature"], state.params["feature"])
    )
    changed = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), adapted["gp"], state.params["gp"]
    )
    assert max(jax.tree.leaves(changed)) > 0


def test_reset_opt_state(trained):
    model, state, _, _ = trained
    fresh = model.reset_opt_state(state)
    # Adam moments zeroed
    leaves = jax.tree.leaves(fresh.opt_state)
    arrs = [l for l in leaves if hasattr(l, "shape") and getattr(l, "size", 0) > 0]
    assert all(float(jnp.abs(a).sum()) == 0 for a in arrs if a.dtype != jnp.int32)


@pytest.mark.parametrize("kernel_type", ["linear", "rbf", "matern", "poli1",
                                         "poli2", "cossim", "bncossim"])
def test_all_kernel_types_train_and_score(kernel_type):
    """Every reference kernel_type (reference methods/DKT.py:351-372) runs a
    finite train step and produces valid scores through DKT."""
    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.models.backbones import ConvNetS

    model = DKT(ConvNetS(depth=2), n_way=3, n_support=2,
                kernel_type=kernel_type, feature_dtype="float32")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 3, 5, 16, 16, 3).astype(np.float32))
    state = model.init(jax.random.PRNGKey(0), x[0])
    state, m = model.train_step(state, x)
    assert np.isfinite(float(m["loss"])), kernel_type
    scores = model.episode_scores(state.params, x[0])
    assert scores.shape == (9, 3)
    assert np.isfinite(np.asarray(scores)).all(), kernel_type


def test_change_way_fewer_test_ways():
    """A train_n_way-way model evaluates test_n_way-way episodes
    (reference change_way, meta_template.py:18 / DKT.py:119)."""
    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.models.backbones import ConvNetS

    model = DKT(ConvNetS(depth=2), n_way=5, n_support=2,
                kernel_type="bncossim", feature_dtype="float32")
    rng = np.random.RandomState(0)
    x5 = jnp.asarray(rng.rand(5, 4, 16, 16, 3).astype(np.float32))
    state = model.init(jax.random.PRNGKey(0), x5)
    # 3-way episode through the 5-way model: loss, scores, correct all work
    x3 = jnp.asarray(rng.rand(1, 3, 4, 16, 16, 3).astype(np.float32))
    state, m = model.train_step(state, x3)
    assert np.isfinite(float(m["loss"]))
    scores = model.episode_scores(state.params, x3[0])
    assert scores.shape == (3 * 2, 3)
    accs = model.batch_correct(state.params, x3)
    assert np.isfinite(np.asarray(accs)).all()


def test_change_way_adaptation_and_laplace():
    """GP adaptation and the Laplace head also honour change_way."""
    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.models.backbones import ConvNetS

    model = DKT(ConvNetS(depth=2), n_way=5, n_support=2,
                kernel_type="bncossim", feature_dtype="float32")
    rng = np.random.RandomState(1)
    x5 = jnp.asarray(rng.rand(5, 4, 16, 16, 3).astype(np.float32))
    state = model.init(jax.random.PRNGKey(0), x5)
    x3 = jnp.asarray(rng.rand(3, 4, 16, 16, 3).astype(np.float32))
    p = model.adapt_gp(state.params, x3, steps=2)
    c, n = model.correct(p, x3)
    assert n == 3 * 2 and np.isfinite(c)
    c, n = model.correct_laplace(state.params, x3)
    assert n == 3 * 2 and np.isfinite(c)


def test_flat_grouped_bn_matches_vmapped_episode_path():
    """batch_loss_train (flat trunk + grouped per-episode BN, the round-5
    restructure) must equal the vmapped per-episode path exactly: same
    mean loss, same episode-averaged batch_stats updates."""
    model = DKT(ConvNetS(depth=2), n_way=3, n_support=2,
                kernel_type="bncossim", feature_dtype="float32")
    rng = np.random.RandomState(3)
    ex = synthetic_episode(rng, n_way=3, k=6)
    state = model.init(jax.random.PRNGKey(1), jnp.asarray(ex))
    xb = jnp.asarray(np.stack([synthetic_episode(rng, n_way=3, k=6)
                               for _ in range(4)]))

    loss_flat, stats_flat = jax.jit(model.batch_loss_train)(
        state.params, xb)
    losses_v, stats_v = jax.jit(jax.vmap(
        lambda x: model.episode_loss_train(state.params, x),
        in_axes=0))(xb)

    np.testing.assert_allclose(np.asarray(loss_flat),
                               np.asarray(jnp.mean(losses_v)),
                               rtol=2e-6, atol=2e-6)
    # grouped-BN updates come back episode-averaged; the vmapped ones carry
    # a leading episode axis that merge_stats averages — compare directly
    flat_leaves = jax.tree.leaves(stats_flat["feature"])
    v_leaves = jax.tree.leaves(stats_v)
    assert len(flat_leaves) == len(v_leaves) > 0
    for a, b in zip(flat_leaves, v_leaves):
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(jnp.mean(b, axis=0)),
                                   rtol=2e-6, atol=2e-6)


def test_flat_grouped_bn_matches_vmapped_bf16_argmax():
    """Under the bf16 trunk the two structures must agree to bf16 noise:
    per-episode losses from the flat path's features match the vmapped
    path within bf16 tolerance."""
    model = DKT(ConvNetS(depth=2), n_way=3, n_support=2,
                kernel_type="bncossim")  # default bf16 trunk
    rng = np.random.RandomState(4)
    ex = synthetic_episode(rng, n_way=3, k=6)
    state = model.init(jax.random.PRNGKey(2), jnp.asarray(ex))
    xb = jnp.asarray(np.stack([synthetic_episode(rng, n_way=3, k=6)
                               for _ in range(2)]))
    loss_flat, _ = jax.jit(model.batch_loss_train)(state.params, xb)
    losses_v, _ = jax.jit(jax.vmap(
        lambda x: model.episode_loss_train(state.params, x)))(xb)
    np.testing.assert_allclose(np.asarray(loss_flat),
                               np.asarray(jnp.mean(losses_v)),
                               rtol=3e-2)
