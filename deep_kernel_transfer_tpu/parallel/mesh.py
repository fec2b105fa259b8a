"""Device-mesh utilities — episode-parallel training over TPU slices.

The reference is strictly single-process single-GPU (SURVEY.md §2.2: no
DataParallel/DDP/NCCL anywhere). The TPU-native scaling strategy is
EPISODE parallelism: the episode batch axis is sharded over a 1-D "dp" mesh
axis; parameters are replicated; XLA inserts the psum over ICI for the
gradient all-reduce when the sharded loss is averaged.

Everything rides jax.sharding + jit (pjit): no hand-written collectives are
needed for data-parallel meta-training. (`shard_map` enters only in the
Pallas collective kernels under ops/.)
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"make_mesh(n_devices={n_devices}): only {len(devices)} "
                f"devices available (silently truncating would run with "
                f"less parallelism than the per-device batch math assumes)")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(dp: int, tp: int) -> Mesh:
    """(dp, tp) mesh: episodes sharded over dp, large params optionally
    sharded over tp (tensor_sharding_rules)."""
    devices = jax.devices()
    if len(devices) < dp * tp:
        raise ValueError(
            f"make_mesh_2d(dp={dp}, tp={tp}) needs {dp * tp} devices, "
            f"only {len(devices)} available")
    return Mesh(np.array(devices[: dp * tp]).reshape(dp, tp),
                (DATA_AXIS, MODEL_AXIS))


def episode_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading episode-batch axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_episode_batch(xb: Array, mesh: Mesh, axis: str = DATA_AXIS) -> Array:
    """Place [B, ...] with B split across the mesh. B must divide evenly."""
    return jax.device_put(xb, episode_sharding(mesh, axis))


def distribute_local_episodes(xb_local, mesh: Mesh,
                              axis: str = DATA_AXIS) -> Array:
    """Multi-host assembly: each process contributes its LOCAL episode batch
    [B_local, ...]; the result is the global [B_local * n_processes, ...]
    array sharded over the mesh (SURVEY.md §5: per-process host loading via
    jax.make_array_from_process_local_data; gradients still reduce over ICI
    inside the jitted step). On a single process this is equivalent to
    shard_episode_batch."""
    return jax.make_array_from_process_local_data(
        episode_sharding(mesh, axis), np.asarray(xb_local))


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_train_step(method, mesh: Mesh, axis: str = DATA_AXIS,
                            param_shardings: Any = None):
    """jit the method's train step with episode-sharded input. `method`
    must expose .batch_loss_train(params, xb) and .tx.

    Default: state replicated; the mean over the (sharded) episode axis
    inside the loss is what XLA lowers to a psum over ICI — the whole
    data-parallel step is one compiled program per device.

    With `param_shardings` (a NamedSharding pytree over method params, e.g.
    from tensor_sharding_rules on a 2-D dp x tp mesh), the params are
    constrained to that layout inside the step and XLA inserts the
    all-gathers/reduce-scatters; other shardings are compiler-propagated.
    """
    from ..methods.base import train_step_body

    x_sh = episode_sharding(mesh, axis)

    def _step(state, xb):
        if param_shardings is not None:
            state = state._replace(params=jax.lax.with_sharding_constraint(
                state.params, param_shardings))
        # the SAME step body as the single-device path (methods/base.py):
        # under the sharded episode axis its means lower to psum over ICI
        return train_step_body(method, state, xb)

    if param_shardings is None:
        state_sh: Any = replicated(mesh)
        return jax.jit(_step, in_shardings=(state_sh, x_sh),
                       out_shardings=(state_sh, state_sh))
    # tensor-parallel mode: episode input pinned, everything else inferred /
    # propagated by the compiler from the in-step constraints
    return jax.jit(_step, in_shardings=(None, x_sh))


MODEL_AXIS = "tp"


def tensor_sharding_rules(params: Any, mesh: Mesh, axis: str = MODEL_AXIS,
                          min_size: int = 1 << 16) -> Any:
    """Optional tensor-parallel param shardings (SURVEY.md §2.2: TP is not
    NEEDED at these model sizes — <= 44 M params — but the rules are exposed
    anyway). Shards the trailing (output-channel) dimension of every large
    leaf over the model axis when it divides evenly; everything else is
    replicated. XLA inserts the all-gathers/reduce-scatters.

    Returns a pytree of NamedShardings matching `params`, usable as the
    `param_shardings` argument of make_sharded_train_step."""
    n = mesh.shape[axis]

    def rule(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.size >= min_size
                and leaf.shape[-1] % n == 0):
            spec = [None] * (leaf.ndim - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def make_sharded_eval(method, mesh: Mesh, axis: str = DATA_AXIS):
    """jit the method's batched per-episode accuracy with the episode axis
    sharded over the mesh: the reference's 600-episode test loop
    (reference test.py:142-161) becomes ceil(600/B) sharded dispatches.

    Returns fn(params, xb [B, n_way, S+Q, ...]) -> per-episode accuracy%
    [B] (episode-sharded; np.asarray gathers it)."""
    return jax.jit(
        lambda params, xb: method.batch_correct(params, xb),
        in_shardings=(replicated(mesh), episode_sharding(mesh, axis)),
        out_shardings=episode_sharding(mesh, axis),
    )


def wrap_pad_episodes(xb: Array, mesh: Mesh,
                      axis: str = DATA_AXIS) -> tuple[Array, int]:
    """Pad a final partial episode batch up to a dp-divisible size by
    wrapping episodes; returns (padded batch, original size) so eval
    callers can trim the duplicates back off ([:b]). For training the
    duplicates add negligible gradient weight once per epoch.

    Divisibility is by the extent of the episode axis (mesh.shape[axis]),
    NOT the total device count: on a 2-D dp x tp mesh only dp shards the
    batch, so padding to mesh.size would silently double the compute."""
    b = xb.shape[0]
    extent = mesh.shape[axis] if axis in mesh.shape else mesh.size
    if b % extent != 0:
        target = -(-b // extent) * extent
        reps = -(-target // b)
        xb = jnp.concatenate([jnp.asarray(xb)] * reps)[:target]
    return xb, b
