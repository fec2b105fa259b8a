"""Quickstart: train and evaluate DKT on synthetic episodes in ~a minute.

No datasets, no checkpoints, no CLI — the minimal end-to-end loop against
the library API, runnable on CPU or one TPU chip unchanged:

    python examples/quickstart.py

What it shows:
  * building a DKT method (Conv4S trunk + bncossim deep kernel, the
    paper's configuration scaled down to 28px)
  * the jitted train step over a vmapped episode batch (one XLA program:
    features -> batched [n_way, N, N] Gram/Cholesky/MLL -> grads -> Adam)
  * device-side evaluation with support-only GP conditioning

For real datasets use train.py / test.py (same flags as the reference
repo, see README.md); for the regression track see sines_tpu/.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

# allow running straight from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from deep_kernel_transfer_tpu.methods import DKT
from deep_kernel_transfer_tpu.models.backbones import Conv4S

N_WAY, N_SUPPORT, N_QUERY, HW = 5, 5, 15, 28
EPISODE_BATCH, STEPS = 4, 60


from functools import partial


@partial(jax.jit, static_argnums=1)
def sample_episodes(key, batch):
    """Synthetic separable tasks: each way lights up a class-specific patch."""
    x = jax.random.uniform(
        key, (batch, N_WAY, N_SUPPORT + N_QUERY, HW, HW, 3)) * 0.4
    for w in range(N_WAY):
        r, c = divmod(w, 3)
        x = x.at[:, w, :, r * 9:r * 9 + 8, c * 9:c * 9 + 8, :].add(0.6)
    return x


def main():
    model = DKT(Conv4S(), n_way=N_WAY, n_support=N_SUPPORT,
                kernel_type="bncossim")
    key = jax.random.PRNGKey(0)
    state = model.init(key, jnp.zeros(
        (N_WAY, N_SUPPORT + N_QUERY, HW, HW, 3), jnp.float32))
    print(f"backend={jax.default_backend()}  "
          f"params={sum(p.size for p in jax.tree.leaves(state.params)):,}")

    t0 = time.perf_counter()
    for step in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = model.train_step(state, sample_episodes(sub, EPISODE_BATCH))
        if step % 10 == 0:
            print(f"step {step:3d}  loss {float(metrics['loss']):.4f}  "
                  f"outputscale {float(metrics['outputscale']):.3f}")
    # device->host readback BEFORE stopping the clock: dispatches are
    # async and block_until_ready can return at enqueue-ack on the tunnel
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"trained {STEPS * EPISODE_BATCH} episodes in {dt:.1f}s "
          f"({STEPS * EPISODE_BATCH / dt:.1f} eps/s incl. compile)")

    key, sub = jax.random.split(key)
    acc = model.batch_correct(state.params, sample_episodes(sub, 8))
    print(f"eval accuracy over 8 fresh episodes: {float(jnp.mean(acc)):.1f}% "
          f"(chance {100 / N_WAY:.0f}%)")


if __name__ == "__main__":
    main()
