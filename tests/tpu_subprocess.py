"""Run a parity script in a subprocess against the default (TPU) platform.

The suite's conftest pins JAX to a virtual CPU mesh, so TPU-only checks
(Mosaic kernels, MXU precision behavior) re-exec in a clean env; they
self-skip when no TPU is reachable — including when the tunnel is WEDGED
(a dead axon relay makes jax init hang forever rather than fail, so a
bounded probe runs once per session before any real script)."""
import os
import subprocess
import sys

import pytest

_tpu_usable: bool | None = None  # session cache for the probe


def _clean_env() -> dict:
    # drop the conftest's CPU-mesh pins but KEEP the rest of the env —
    # PYTHONPATH carries the TPU platform plugin
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.join(os.path.dirname(__file__), "..")
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + repo)
    return env


def _probe_tpu() -> bool:
    """One bounded jax-init probe: False when the platform is absent OR the
    tunnel is down (init hangs / errors)."""
    global _tpu_usable
    if _tpu_usable is None:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print('BACKEND=' + jax.default_backend())"],
                env=_clean_env(), capture_output=True, text=True,
                timeout=300)  # generous: backend init competes for the 1 core
            _tpu_usable = ("BACKEND=tpu" in r.stdout
                           or "BACKEND=axon" in r.stdout)
        except subprocess.TimeoutExpired:
            _tpu_usable = False
    return _tpu_usable


def run_on_tpu(script: str, marker: str, timeout: int = 1500):
    # Mosaic kernel compiles aren't served by the persistent XLA cache and
    # take 7-9 min alone on this 1-core host — under full-suite congestion
    # a tighter timeout flakes.
    if not _probe_tpu():
        pytest.skip("no usable TPU (platform absent or tunnel down)")
    result = subprocess.run([sys.executable, "-c", script], env=_clean_env(),
                            capture_output=True, text=True, timeout=timeout)
    out = result.stdout + result.stderr
    if "NO_TPU" in out:
        pytest.skip("no TPU platform available")
    assert result.returncode == 0, out
    assert marker in out, out
