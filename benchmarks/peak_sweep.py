"""Measure the chip's actual attainable matmul peak (bf16 + f32).

Round-4 verdict: every `mfu_attainable` row was computed against a 38 TF/s
"observed attainable" peak that the repo's own ResNet10 measurement
(42 TF/s achieved) falsifies. This sweep re-derives the denominator the
honest way: a lax.scan chain of K dependent square matmuls (one XLA
dispatch, no host round-trips inside the timed region, data dependency
prevents overlap accounting), swept over sizes until the rate saturates.

The scan carry is rescaled by 1/sqrt(N) each step so bf16 magnitudes stay
sane; the rescale is a fused elementwise epilogue and does not perturb the
2*N^3-per-matmul FLOP count materially.

Writes tpu_peak_<dtype>_<N>_tflops rows + tpu_peak_attainable_bf16_tflops
(the max) into benchmarks/report.json.

Reference for the MFU convention: bench.py (mfu_datasheet vs mfu_attainable).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from deep_kernel_transfer_tpu.utils.jit_cache import enable_persistent_jit_cache

REPORT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "report.json")
K_CHAIN = 32  # matmuls per dispatch


def main():
    enable_persistent_jit_cache()
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])
    results = {}
    for dtype, sizes in (("bfloat16", (2048, 4096, 8192, 12288, 16384)),
                         ("float32", (2048, 4096, 8192))):
        for n in sizes:
            scale = jnp.asarray(1.0 / (n ** 0.5), dtype)

            @jax.jit
            def chain(a, b, scale=scale):
                def body(y, _):
                    return (y @ b) * scale, None

                y, _ = jax.lax.scan(body, a, None, length=K_CHAIN)
                return y

            key = jax.random.PRNGKey(0)
            a = jax.random.normal(key, (n, n), jnp.float32).astype(dtype)
            b = jax.random.normal(jax.random.PRNGKey(1), (n, n),
                                  jnp.float32).astype(dtype)
            y = chain(a, b)  # compile
            float(y[0, 0].astype(jnp.float32))  # genuine readback sync
            reps = max(1, int(2e12 / (2.0 * n**3 * K_CHAIN)))
            t0 = time.perf_counter()
            for _ in range(reps):
                y = chain(y, b)
            float(y[0, 0].astype(jnp.float32))
            dt = time.perf_counter() - t0
            tflops = 2.0 * n**3 * K_CHAIN * reps / dt / 1e12
            key_name = f"tpu_peak_{dtype}_{n}_tflops"
            results[key_name] = round(tflops, 2)
            print(f"{dtype} {n}x{n}: {tflops:.2f} TF/s  ({reps} reps, {dt:.2f}s)")

    best_bf16 = max(v for k, v in results.items() if "bfloat16" in k)
    results["tpu_peak_attainable_bf16_tflops"] = best_bf16
    results["tpu_peak_protocol"] = (
        f"lax.scan chain of {K_CHAIN} dependent NxN matmuls per dispatch "
        "(y <- (y@B)/sqrt(N)), readback-forced sync, persistent jit cache; "
        "attainable = max over the bf16 size sweep; v5e datasheet bf16 peak "
        "= 197 TF/s; float32 rows are DEFAULT-precision dots (XLA routes "
        "them through MXU bf16 passes), not precision=HIGHEST")
    with open(REPORT) as f:
        report = json.load(f)
    report.update(results)
    with open(REPORT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"tpu_peak_attainable_bf16_tflops": best_bf16}))


if __name__ == "__main__":
    main()
