"""Persistent XLA executable cache for the CLIs.

Every CLI invocation builds fresh model objects, so jax must re-lower and
XLA re-compile each jitted entry point per process — several minutes cold
for conv trunks on a TPU host. The persistent compilation cache keys
executables by (HLO, compile options, device kind) on disk, cutting
repeat CLI start-up from minutes to seconds; correctness is unaffected
(cache misses simply compile).

Enabled by every CLI entry point. Opt out with DKT_NO_JIT_CACHE=1;
relocate with DKT_JIT_CACHE=/path (default ~/.cache/deep_kernel_transfer_tpu/jit).
"""
from __future__ import annotations

import os


def enable_persistent_jit_cache() -> str | None:
    """Point jax at the on-disk executable cache. Returns the dir or None.

    Must run before the first jit compilation (CLI mains call it first
    thing); calling after some compiles is safe, they are just not cached.
    """
    if os.environ.get("DKT_NO_JIT_CACHE"):
        return None
    try:
        import jax

        configured = jax.config.jax_compilation_cache_dir
    except Exception:
        configured = None
    if configured:  # host app / test harness already chose a cache
        return configured
    path = os.environ.get(
        "DKT_JIT_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "deep_kernel_transfer_tpu", "jit"))
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unwritable cache dir must never kill a run
        return None
    return path
