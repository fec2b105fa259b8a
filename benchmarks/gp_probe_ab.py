"""A/B: the jitter-probe factorisation's cost in the flagship GP tail.

psd_safe_cholesky (gp/exact.py) pays a phase-1 probe Cholesky (inside a
lax.while_loop on a stop-gradient copy) before the differentiable phase-2
factorisation. For DKT classification the noisy Gram is PD by construction
(PSD kernel + fixed noise 0.1, reference methods/DKT.py:346-347), so the
probe provably exits at jitter 0 and ExactGP(assume_pd=True) skips it with
a BIT-IDENTICAL result (tests/test_gp_engine.py::test_assume_pd_bit_identical).

This times the isolated GP tail of the headline config — value_and_grad of
the vmapped episode-batch sum-MLL wrt (gp params, features), the exact tail
batch_loss_train runs after the trunk — with the probe on vs off, at the
flagship shape [B=32 episodes, N=100, D=1600, 5 ways].

Writes gp_probe_ab_* rows into benchmarks/report.json (--dry_run to skip).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu.gp import (ExactGP, GaussianLikelihood,
                                         make_kernel)
from deep_kernel_transfer_tpu.gp.exact import init_batched, sum_mll
from deep_kernel_transfer_tpu.methods.base import one_vs_rest_targets
from deep_kernel_transfer_tpu.utils.profiling import sync as _sync

B, N_WAY, N_TOTAL, D = 32, 5, 20, 1600  # bench.py's flagship geometry
R = 16  # in-jit repetitions


def time_tail(assume_pd: bool) -> float:
    """ms per value_and_grad of the batched GP tail."""
    gp = ExactGP(make_kernel("bncossim"),
                 GaussianLikelihood(trainable=False, fixed_noise=0.1),
                 force_dense=True, assume_pd=assume_pd)
    params = init_batched(gp, jax.random.PRNGKey(0), N_WAY)
    z = jax.random.normal(jax.random.PRNGKey(1), (B, N_WAY * N_TOTAL, D))
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    targets = one_vs_rest_targets(N_WAY, N_TOTAL)

    def loss(p, zz):
        return jnp.mean(jax.vmap(lambda ze: -sum_mll(gp, p, ze, targets))(zz))

    def run(p, zz):
        def step(c, eps):
            (v, (gp_g, z_g)) = jax.value_and_grad(loss, argnums=(0, 1))(
                p, zz * (1.0 + eps))
            return c + v + jnp.sum(z_g[0, 0]) + jax.tree.reduce(
                lambda s, l: s + jnp.sum(l), gp_g, jnp.float32(0.0)), None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.linspace(0.0, 1e-4, R))
        return c

    f = jax.jit(run)
    _sync(f(params, z))  # compile
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        o = f(params, z)
    _sync(o)
    return (time.perf_counter() - t0) / (iters * R) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()
    os.environ.setdefault("DKT_JIT_CACHE", "/tmp/_bench_jit_cache")
    from deep_kernel_transfer_tpu.utils.jit_cache import (
        enable_persistent_jit_cache)

    enable_persistent_jit_cache()
    probed = time_tail(assume_pd=False)
    fast = time_tail(assume_pd=True)
    rows = {
        "gp_probe_ab_tail_probed_ms": round(probed, 3),
        "gp_probe_ab_tail_assume_pd_ms": round(fast, 3),
        "gp_probe_ab_saved_ms": round(probed - fast, 3),
        "gp_probe_ab_protocol": (
            "value_and_grad of the vmapped [B=32, 5-way, N=100, D=1600] "
            "bncossim sum-MLL tail (fixed noise 0.1, dense route) with the "
            "psd_safe_cholesky jitter probe on vs ExactGP(assume_pd=True); "
            "in-jit lax.scan R=16, readback-forced sync, one v5e"),
    }
    print(json.dumps(rows, indent=2))
    if not args.dry_run:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "report.json")
        with open(path) as f:
            report = json.load(f)
        report.update(rows)
        with open(path, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
