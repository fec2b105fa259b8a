"""Benchmark of record: DKT meta-training episodes/sec (headline config).

Protocol: 5-way 5-shot 15-query episodes of 84x84x3 images, Conv4 backbone,
bncossim kernel — the reference's main configuration (reference train.py,
methods/DKT.py, configs.py:7). We time the full jitted training step
(features -> batched [n_way,N,N] Cholesky + MLL -> grads -> Adam) over a
batch of episodes on the default JAX device.

Baseline: a torch-CPU re-enactment of the reference's sequential episode
step (Conv4 forward/backward + per-way exact-GP MLL via torch Cholesky, the
IndependentModelList loop of reference methods/DKT.py:148-164). The
denominator is PINNED in BASELINE.json ("cpu_reenactment_eps_per_sec",
measured once on this idle host) so vs_baseline is reproducible run to run
— re-measuring it per run on the noisy 1-core host produced denominators
from 0.127 to 0.449 eps/s (the 739x/849x/2624x spread across BENCH_r01/r02
and docs/ROUND2.md). The north-star target is >=10x (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import time

N_WAY, N_SUPPORT, N_QUERY, HW = 5, 5, 15, 84
EP_BATCH = 32  # conv-bound: eps/s is ~flat in batch, 32 is the measured knee
_BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_cpu_baseline.json")
_BASELINE_JSON = os.path.join(os.path.dirname(__file__), "BASELINE.json")


# MFU is reported against BOTH peaks so the artifact is self-interpreting:
#   mfu_datasheet  — v5e datasheet peak, 197 TFLOP/s bf16/chip (regressions
#                    show as a ratio of the hardware);
#   mfu_attainable — the chip's OBSERVED peak through this toolchain:
#                    180.2 TFLOP/s bf16, measured by benchmarks/
#                    peak_sweep.py (scan-chained 16384^2 matmuls,
#                    tpu_peak_* rows in report.json; re-derived in round 5
#                    after the old 38 TF/s thin-shape figure was falsified
#                    by the ResNet10 step's own 42 TF/s).
PEAK_FLOPS_DATASHEET = 197e12
PEAK_FLOPS_ATTAINABLE = 180.2e12


def _measure_jax() -> tuple[float, float, float]:
    """Returns (fused eps/sec, per-dispatch eps/sec, FLOPs per step).

    Two dispatch patterns, both of the SAME compiled training step:

      fused        — R steps under one in-jit lax.scan, the dispatch
                     pattern train.py actually ships (its epoch runs
                     sample -> augment -> train_step as ONE scan dispatch
                     per print_freq chunk, data/device_dataset.
                     make_fused_epoch). Each scan step perturbs the
                     episode batch (a full-size multiply, standing in for
                     the on-device sample+augment work) and carries the
                     optimizer state, so nothing hoists out of the loop.
      per-dispatch — one host dispatch per step, the BENCH_r01-r04
                     protocol; on the axon tunnel each dispatch adds
                     ~4-5 ms of relay latency that the shipped trainer
                     does not pay, which is why it reads ~5% lower.

    The headline value is the fused number (it is what the production
    path sustains); per-dispatch is kept for cross-round comparability.
    """
    import jax
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.models.backbones import Conv4

    model = DKT(Conv4(), n_way=N_WAY, n_support=N_SUPPORT, kernel_type="bncossim")
    x1 = jnp.zeros((N_WAY, N_SUPPORT + N_QUERY, HW, HW, 3), jnp.float32)
    state = model.init(jax.random.PRNGKey(0), x1)
    xb = jax.random.uniform(jax.random.PRNGKey(1), (EP_BATCH,) + x1.shape)

    def _step_flops() -> float:
        try:
            ca = DKT.train_step.lower(model, state, xb).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            return float(ca["flops"])
        except Exception:
            # analytic fallback: Conv4@84px ~190 MFLOP/image fwd, x3 fwd+bwd
            n_img = EP_BATCH * N_WAY * (N_SUPPORT + N_QUERY)
            return n_img * 190e6 * 3.0

    flops = _step_flops()

    def _sync(state, m) -> float:
        # On the axon tunnel platform block_until_ready can return at
        # enqueue-ack, not completion — force a genuine device->host
        # readback of data produced by the step instead.
        return float(jax.tree.leaves(state.params)[0].sum()) + float(m["loss"])

    state, m = model.train_step(state, xb)  # compile
    _sync(state, m)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = model.train_step(state, xb)
    _sync(state, m)
    dispatch_eps = n_iters * EP_BATCH / (time.perf_counter() - t0)

    R = 10

    def chunk(state, xb):
        def body(s, eps):
            s2, m = model.train_step(s, xb * (1.0 + eps))
            return s2, m["loss"]

        s, losses = jax.lax.scan(body, state, jnp.linspace(0.0, 1e-4, R))
        return s, jnp.sum(losses)

    fchunk = jax.jit(chunk)
    s2, tot = fchunk(state, xb)  # compile
    float(tot)
    t0 = time.perf_counter()
    for _ in range(3):
        s2, tot = fchunk(s2, xb)
    float(tot)
    fused_eps = 3 * R * EP_BATCH / (time.perf_counter() - t0)
    return fused_eps, dispatch_eps, flops


def _measure_torch_cpu_baseline() -> float:
    """Sequential torch-CPU episode step in the reference's style."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    def conv_block(cin, cout):
        return torch.nn.Sequential(
            torch.nn.Conv2d(cin, cout, 3, padding=1),
            torch.nn.BatchNorm2d(cout),
            torch.nn.ReLU(),
            torch.nn.MaxPool2d(2),
        )

    net = torch.nn.Sequential(
        conv_block(3, 64), conv_block(64, 64), conv_block(64, 64),
        conv_block(64, 64), torch.nn.Flatten(),
    )
    raw_outputscale = torch.zeros(N_WAY, requires_grad=True)
    opt = torch.optim.Adam(
        [{"params": net.parameters(), "lr": 1e-3},
         {"params": [raw_outputscale], "lr": 1e-4}]
    )
    n = N_WAY * (N_SUPPORT + N_QUERY)
    labels = torch.arange(N_WAY).repeat_interleave(N_SUPPORT + N_QUERY)
    targets = torch.where(
        labels[None, :] == torch.arange(N_WAY)[:, None], 1.0, -1.0
    )
    x = torch.rand(n, 3, HW, HW)

    def episode():
        opt.zero_grad()
        z = net(x)
        z = z / (z.norm(dim=-1, keepdim=True) + 1e-12)
        loss = 0.0
        for w in range(N_WAY):  # reference's sequential per-way GP loop
            k = torch.nn.functional.softplus(raw_outputscale[w]) * (z @ z.T)
            k = k + 0.1 * torch.eye(n)
            chol = torch.linalg.cholesky(k)
            diff = targets[w]
            alpha = torch.cholesky_solve(diff[:, None], chol)[:, 0]
            mll = -0.5 * (
                diff @ alpha
                + 2.0 * chol.diagonal().log().sum()
                + n * 1.8378770664093453
            ) / n
            loss = loss - mll
        loss.backward()
        opt.step()

    episode()  # warmup
    n_iters = 4
    t0 = time.perf_counter()
    for _ in range(n_iters):
        episode()
    return n_iters / (time.perf_counter() - t0)


def _cpu_baseline() -> float:
    """Pinned denominator from BASELINE.json; measured + cached only if the
    pin is absent (then worth copying into BASELINE.json by hand)."""
    if os.path.exists(_BASELINE_JSON):
        with open(_BASELINE_JSON) as f:
            pinned = json.load(f).get("cpu_reenactment_eps_per_sec")
        if pinned:
            return pinned
    if os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            return json.load(f)["episodes_per_sec"]
    eps = _measure_torch_cpu_baseline()
    with open(_BASELINE_CACHE, "w") as f:
        json.dump({"episodes_per_sec": eps}, f)
    return eps


def _probe_device(timeout_s: int = 120) -> str | None:
    """Bounded device-availability probe in a subprocess.

    When the TPU tunnel relay dies, EVERY jax dispatch — even
    jax.devices() — hangs with no error (CLAUDE.md). A hung bench run
    leaves the driver with no artifact at all; probing in a killable
    subprocess turns that into a diagnosable JSON error line instead."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s)
        if proc.returncode == 0:
            return None
        return f"device init failed: {proc.stderr[-300:]}"
    except subprocess.TimeoutExpired:
        return (f"device init hung >{timeout_s}s "
                "(TPU tunnel relay down? see CLAUDE.md)")
    except OSError as e:
        return f"probe failed: {e}"


def main():
    err = _probe_device()
    if err is not None:
        print(json.dumps({
            "metric": "dkt_train_episodes_per_sec",
            "value": 0.0,
            "unit": "episodes/s",
            "vs_baseline": 0.0,
            "error": err,
        }))
        raise SystemExit(1)
    # persistent executable cache: skips the multi-minute cold XLA compile
    # on repeat runs; measured step time is unaffected (cache only serves
    # compiled executables)
    from deep_kernel_transfer_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    enable_persistent_jit_cache()
    eps, dispatch_eps, step_flops = _measure_jax()
    base = _cpu_baseline()
    achieved = step_flops * eps / EP_BATCH  # FLOP/s sustained
    print(json.dumps({
        "metric": "dkt_train_episodes_per_sec",
        "value": round(eps, 3),
        "unit": "episodes/s",
        "vs_baseline": round(eps / base, 2),
        "per_dispatch_eps_per_sec": round(dispatch_eps, 3),
        "protocol": ("fused in-jit scan of the training step (the "
                     "dispatch pattern train.py ships); r01-r04 timed one "
                     "host dispatch per step = per_dispatch_eps_per_sec"),
        "mfu_datasheet": round(achieved / PEAK_FLOPS_DATASHEET, 4),
        "mfu_attainable": round(achieved / PEAK_FLOPS_ATTAINABLE, 4),
        "achieved_tflops": round(achieved / 1e12, 2),
    }))


if __name__ == "__main__":
    main()
