"""Segment profile + episode-batch knee for the big-backbone config:
ResNet10 @ 224 px through DKT (the CUB/miniImagenet image size; reference
train.py --model ResNet10, backbone.py ResNet). Round 5's grouped-BN
restructure (DESIGN.md §1) removed the vmap tax and moved this config from
86.2 to 107.7 eps/s at B=16; this script answers two follow-ups:

  * where do the remaining ~148 ms/step go (trunk fwd / bwd / GP / optax)?
  * did the batch knee move past 16 now that the trunk runs flat?

All timings use in-jit lax.scan repetition + a derived-scalar readback
(the two tunnel-platform rules of docs/DESIGN.md §3). OOM at a batch size
is recorded as the string "oom", not a crash — the knee report must
survive the largest batch failing to fit HBM.

Usage: python benchmarks/profile_resnet.py [--batches 8,16,24,32]
Writes resnet10_224_profile_* / resnet10_224_knee_* rows to report.json.
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
from deep_kernel_transfer_tpu.models.backbones import ResNet10
from deep_kernel_transfer_tpu.utils.profiling import sync as _sync

N_WAY, N_SUPPORT, N_QUERY, HW = 5, 5, 15, 224
R = 4  # in-jit repetitions (each rep is ~150 ms of device time)


def reps_time(fn, *args, iters=3):
    """Mean ms via in-jit scan repetition; tiny perturbation per rep keeps
    XLA from hoisting the body (same harness as profile_step.py — the
    perturbation multiply stays in the operand's dtype, CLAUDE.md)."""

    def run(*a):
        def step(c, eps):
            out = fn(*(x * (1.0 + eps).astype(x.dtype)
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


def step_eps_per_sec(model, state, B):
    """Full train_step throughput at episode batch B (scan carries the
    state so the optimizer update feeds back)."""
    xb = jax.random.uniform(
        jax.random.PRNGKey(1),
        (B, N_WAY, N_SUPPORT + N_QUERY, HW, HW, 3), jnp.float32)

    def full(state, x):
        def step(s, eps):
            s2, m = model.train_step(s, x * (1.0 + eps))
            return s2, m["loss"]

        s, losses = jax.lax.scan(step, state, jnp.linspace(0.0, 1e-4, R))
        return jnp.sum(losses)

    f = jax.jit(full)
    _sync(f(state, xb))
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        o = f(state, xb)
    _sync(o)
    dt = (time.perf_counter() - t0) / (iters * R)
    return round(B / dt, 1), round(dt * 1e3, 1)


def _record(out_path: str, update: dict) -> None:
    """Merge into report.json on disk immediately (the run_all.py
    convention: a later OOM must not discard rows already measured)."""
    report = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            report = json.load(f)
    report.update(update)
    tmp = out_path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=2)
    os.replace(tmp, out_path)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,24,32")
    ap.add_argument("--profile_batch", type=int, default=16)
    args = ap.parse_args(argv)

    from deep_kernel_transfer_tpu.utils.jit_cache import (
        enable_persistent_jit_cache)

    os.environ.setdefault("DKT_JIT_CACHE", "/tmp/_bench_jit_cache")
    enable_persistent_jit_cache()
    _sync(jnp.zeros(()) + 1)  # backend init outside every timer

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "report.json")
    model = DKT(ResNet10(), n_way=N_WAY, n_support=N_SUPPORT,
                kernel_type="bncossim")
    x1 = jnp.zeros((N_WAY, N_SUPPORT + N_QUERY, HW, HW, 3), jnp.float32)
    state = model.init(jax.random.PRNGKey(0), x1)
    params = state.params

    out = {}
    # --- segment profile at the reference batch ---
    B = args.profile_batch
    n_img = B * N_WAY * (N_SUPPORT + N_QUERY)
    xflat = jax.random.uniform(jax.random.PRNGKey(2), (n_img, HW, HW, 3))
    xb = xflat.reshape(B, N_WAY, N_SUPPORT + N_QUERY, HW, HW, 3)

    def trunk_fwd(p, x):
        z, _ = model._features(p, x, train=True, ep_groups=B)
        return z

    out[f"resnet10_224_profile_b{B}_trunk_fwd_ms"] = round(
        reps_time(trunk_fwd, params, xflat), 1)
    out[f"resnet10_224_profile_b{B}_trunk_fwd_bwd_ms"] = round(
        reps_time(lambda p, x: jax.grad(
            lambda q: jnp.sum(trunk_fwd(q, x) ** 2))(p), params, xflat), 1)
    out[f"resnet10_224_profile_b{B}_loss_fwd_bwd_ms"] = round(
        reps_time(lambda p, x: jax.grad(model.batch_loss)(p, x),
                  params, xb), 1)
    _, step_ms = step_eps_per_sec(model, state, B)
    out[f"resnet10_224_profile_b{B}_train_step_ms"] = step_ms
    out[f"resnet10_224_profile_b{B}_gp_share_ms"] = round(
        out[f"resnet10_224_profile_b{B}_loss_fwd_bwd_ms"]
        - out[f"resnet10_224_profile_b{B}_trunk_fwd_bwd_ms"], 1)
    _record(out_path, out)
    print(json.dumps(out, indent=2))

    # --- batch knee ---
    knee = {}
    for b in (int(s) for s in args.batches.split(",")):
        try:
            eps_b, _ = step_eps_per_sec(model, state, b)
            knee[f"resnet10_224_knee_b{b}_eps_per_sec"] = eps_b
        except Exception as e:  # XlaRuntimeError RESOURCE_EXHAUSTED etc.
            cls = type(e).__name__
            msg = str(e)
            knee[f"resnet10_224_knee_b{b}_eps_per_sec"] = (
                "oom" if ("RESOURCE_EXHAUSTED" in msg or "hbm" in msg.lower())
                else f"error:{cls}")
        _record(out_path, knee)
        print(json.dumps(knee, indent=2))


if __name__ == "__main__":
    main()
