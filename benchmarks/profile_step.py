"""Segment profile of the flagship DKT training step (where does the
56 ms go?). Times, with in-jit scan repetition so tunnel dispatch latency
and enqueue-ack timing cannot corrupt the numbers (docs/DESIGN.md §3):

  * trunk forward only (bf16, train-mode BN)
  * trunk forward, eval-mode BN (isolates the batch-stats passes)
  * trunk forward+backward
  * full loss forward (trunk + GP MLL)
  * full value_and_grad (everything but optax)
  * full train_step (+ optax update and BN merge)

Usage: python benchmarks/profile_step.py  (real TPU; ~2 min of compiles)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu.methods import DKT
from deep_kernel_transfer_tpu.models.backbones import Conv4
from deep_kernel_transfer_tpu.utils.profiling import sync as _sync

N_WAY, N_SUPPORT, N_QUERY, HW = 5, 5, 15, 84
B = 16  # overridable: --batch (bench.py's flagship config is 32)
R = 8  # in-jit repetitions


def reps_time(fn, *args, iters=3):
    """Mean ms of fn(*args) via in-jit lax.scan repetition; fn must return
    a scalar-reducible pytree. A tiny input perturbation per rep keeps XLA
    from hoisting the body out of the scan."""

    def run(*a):
        def step(c, eps):
            out = fn(*(x * (1.0 + eps)
                       if isinstance(x, jax.Array)
                       and jnp.issubdtype(x.dtype, jnp.floating) else x
                       for x in a))
            return c + jax.tree.reduce(
                lambda s, l: s + jnp.sum(l).astype(jnp.float32),
                out, jnp.float32(0.0)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0),
                            jnp.linspace(0.0, 1e-4, R))
        return c

    f = jax.jit(run)
    _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    _sync(o)
    return (time.perf_counter() - t0) / (iters * R) * 1e3


def main():
    import argparse
    import os

    global B
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B)
    B = ap.parse_args().batch

    from deep_kernel_transfer_tpu.utils.jit_cache import (
        enable_persistent_jit_cache)

    os.environ.setdefault("DKT_JIT_CACHE", "/tmp/_bench_jit_cache")
    enable_persistent_jit_cache()
    model = DKT(Conv4(), n_way=N_WAY, n_support=N_SUPPORT,
                kernel_type="bncossim")
    x1 = jnp.zeros((N_WAY, N_SUPPORT + N_QUERY, HW, HW, 3), jnp.float32)
    state = model.init(jax.random.PRNGKey(0), x1)
    xb = jax.random.uniform(jax.random.PRNGKey(1), (B,) + x1.shape)
    xflat = xb.reshape(B * N_WAY * (N_SUPPORT + N_QUERY), HW, HW, 3)
    params = state.params

    out = {"episode_batch": B, "backend": jax.default_backend()}

    def trunk_fwd(p, x):
        z, _ = model._features(p, x, train=True)
        return z

    def trunk_fwd_eval(p, x):
        z, _ = model._features(p, x, train=False)
        return z

    out["trunk_fwd_train_ms"] = round(reps_time(trunk_fwd, params, xflat), 2)
    out["trunk_fwd_eval_ms"] = round(reps_time(trunk_fwd_eval, params, xflat), 2)
    out["trunk_fwd_bwd_ms"] = round(reps_time(
        lambda p, x: jax.grad(
            lambda q: jnp.sum(trunk_fwd(q, x) ** 2))(p), params, xflat), 2)
    out["loss_fwd_ms"] = round(reps_time(
        lambda p, x: model.batch_loss(p, x), params, xb), 2)
    out["loss_fwd_bwd_ms"] = round(reps_time(
        lambda p, x: jax.grad(model.batch_loss)(p, x), params, xb), 2)

    # full train step: scan over the SAME state (params update feeds back)
    def full(state, x):
        def step(s, eps):
            s2, m = model.train_step(s, x * (1.0 + eps))
            return s2, m["loss"]

        s, losses = jax.lax.scan(step, state, jnp.linspace(0.0, 1e-4, R))
        return jnp.sum(losses)

    f = jax.jit(full)
    _sync(f(state, xb))
    t0 = time.perf_counter()
    for _ in range(3):
        o = f(state, xb)
    _sync(o)
    out["train_step_ms"] = round((time.perf_counter() - t0) / (3 * R) * 1e3, 2)

    # derived shares
    ts = out["train_step_ms"]
    out["gp_share_ms"] = round(out["loss_fwd_bwd_ms"] - out["trunk_fwd_bwd_ms"], 2)
    out["opt_overhead_ms"] = round(ts - out["loss_fwd_bwd_ms"], 2)
    out["eps_per_sec_at_step"] = round(B / ts * 1e3, 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
