"""Multi-device episode-parallel training on the virtual 8-device CPU mesh
(SURVEY.md §4c)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_kernel_transfer_tpu.methods.dkt import DKT
from deep_kernel_transfer_tpu.models.backbones import ConvNetS
from deep_kernel_transfer_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    replicate_tree,
    shard_episode_batch,
)


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_sharded_dkt_train_step_matches_single_device():
    n_way, n_support, n_query = 3, 2, 3
    # f32 trunk: this test checks sharding correctness, and bf16 reduction-
    # order noise would swamp the tolerance
    model = DKT(ConvNetS(depth=2), n_way=n_way, n_support=n_support,
                kernel_type="bncossim", feature_dtype="float32")
    rng = np.random.RandomState(0)
    x = rng.randn(8, n_way, n_support + n_query, 16, 16, 3).astype(np.float32)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))

    # single-device loss + grads
    loss1, grads1 = jax.value_and_grad(model.batch_loss)(
        state.params, jnp.asarray(x))

    # 8-device episode-sharded loss + grads (XLA inserts the psum)
    mesh = make_mesh(8)
    from deep_kernel_transfer_tpu.parallel import episode_sharding, replicated

    grad_fn = jax.jit(
        jax.value_and_grad(model.batch_loss),
        in_shardings=(replicated(mesh), episode_sharding(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    loss2, grads2 = grad_fn(replicate_tree(state.params, mesh),
                            shard_episode_batch(jnp.asarray(x), mesh))

    assert np.isfinite(float(loss2))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    # gradients agree across the sharded/unsharded paths. (Comparing
    # post-Adam params instead would be brittle: a single Adam step is
    # ~lr*sign(g), so numerically-tiny gradient differences flip signs.)
    for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)

    # and a full sharded train step runs
    step = make_sharded_train_step(model, mesh)
    state2, m2 = step(replicate_tree(state, mesh),
                      shard_episode_batch(jnp.asarray(x), mesh))
    assert np.isfinite(float(m2["loss"]))


def test_sharded_eval_matches_single_device():
    """batch_correct over a sharded episode axis == unsharded result."""
    from deep_kernel_transfer_tpu.parallel import make_sharded_eval

    n_way, n_support, n_query = 3, 2, 3
    model = DKT(ConvNetS(depth=2), n_way=n_way, n_support=n_support,
                kernel_type="bncossim", feature_dtype="float32")
    rng = np.random.RandomState(2)
    x = rng.randn(8, n_way, n_support + n_query, 16, 16, 3).astype(np.float32)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))

    single = np.asarray(model.batch_correct(state.params, jnp.asarray(x)))
    mesh = make_mesh(8)
    eval_fn = make_sharded_eval(model, mesh)
    sharded = np.asarray(eval_fn(replicate_tree(state.params, mesh),
                                 shard_episode_batch(jnp.asarray(x), mesh)))
    np.testing.assert_allclose(single, sharded, atol=1e-4)


def test_gradients_synchronised_across_shards():
    """After a sharded step the replicated params must be identical on every
    device (XLA inserted the psum)."""
    n_way, n_support, n_query = 3, 2, 3
    model = DKT(ConvNetS(depth=2), n_way=n_way, n_support=n_support)
    rng = np.random.RandomState(1)
    x = rng.randn(8, n_way, n_support + n_query, 16, 16, 3).astype(np.float32)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))
    mesh = make_mesh(8)
    step = make_sharded_train_step(model, mesh)
    state2, _ = step(replicate_tree(state, mesh), shard_episode_batch(jnp.asarray(x), mesh))
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_distribute_local_episodes_single_process():
    """On one process this equals shard_episode_batch (multi-host entry
    point, jax.make_array_from_process_local_data)."""
    from deep_kernel_transfer_tpu.parallel import distribute_local_episodes

    mesh = make_mesh(8)
    x = np.arange(8 * 2 * 3, dtype=np.float32).reshape(8, 2, 3)
    arr = distribute_local_episodes(x, mesh)
    assert arr.shape == (8, 2, 3)
    np.testing.assert_allclose(np.asarray(arr), x)


def test_tensor_parallel_step_matches_replicated():
    """Optional TP (SURVEY.md §2.2): params sharded over a 2x4 dp x tp mesh
    produce the same loss/params as the replicated step."""
    from deep_kernel_transfer_tpu.parallel import (
        make_mesh_2d,
        tensor_sharding_rules,
    )

    n_way, n_support, n_query = 3, 2, 3
    model = DKT(ConvNetS(depth=2), n_way=n_way, n_support=n_support,
                kernel_type="bncossim", feature_dtype="float32")
    rng = np.random.RandomState(3)
    x = rng.randn(8, n_way, n_support + n_query, 16, 16, 3).astype(np.float32)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))
    loss_ref = float(model.batch_loss(state.params, jnp.asarray(x)))

    mesh = make_mesh_2d(dp=2, tp=4)
    rules = tensor_sharding_rules(state.params, mesh, min_size=1 << 10)
    # at least one leaf actually sharded over tp
    assert any(s.spec != jax.sharding.PartitionSpec()
               for s in jax.tree.leaves(rules))
    step = make_sharded_train_step(model, mesh, param_shardings=rules)
    state2, m2 = step(state, shard_episode_batch(jnp.asarray(x), mesh))
    np.testing.assert_allclose(float(m2["loss"]), loss_ref, rtol=1e-4)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(state2.params)[0])).all()


def test_wrap_pad_episodes_pads_to_dp_extent_not_mesh_size():
    """On a 2-D dp x tp mesh only the dp axis shards the episode batch, so
    padding must target mesh.shape['dp'], not the total device count."""
    from deep_kernel_transfer_tpu.parallel import (make_mesh, make_mesh_2d,
                                                   wrap_pad_episodes)

    mesh2d = make_mesh_2d(4, 2)
    xb = jnp.arange(3 * 5, dtype=jnp.float32).reshape(3, 5)
    padded, b = wrap_pad_episodes(xb, mesh2d)
    assert b == 3 and padded.shape[0] == 4  # NOT 8
    np.testing.assert_array_equal(padded[3], xb[0])  # wrapped duplicate
    # already divisible: untouched
    xb4 = jnp.ones((4, 5))
    padded4, b4 = wrap_pad_episodes(xb4, mesh2d)
    assert b4 == 4 and padded4.shape[0] == 4
    # 1-D mesh keeps the old behavior (extent == mesh.size)
    mesh1d = make_mesh(8)
    padded1, _ = wrap_pad_episodes(xb, mesh1d)
    assert padded1.shape[0] == 8


def test_make_mesh_rejects_overcommit():
    from deep_kernel_transfer_tpu.parallel import make_mesh

    with pytest.raises(ValueError):
        make_mesh(len(jax.devices()) + 1)


def test_batch_axis_extent():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deep_kernel_transfer_tpu.data.device_dataset import _batch_axis_extent
    from deep_kernel_transfer_tpu.parallel import make_mesh_2d

    mesh = make_mesh_2d(4, 2)
    assert _batch_axis_extent(NamedSharding(mesh, P("dp"))) == 4
    assert _batch_axis_extent(NamedSharding(mesh, P(("dp", "tp")))) == 8
    assert _batch_axis_extent(NamedSharding(mesh, P(None, "tp"))) == 1
    assert _batch_axis_extent(NamedSharding(mesh, P())) == 1
