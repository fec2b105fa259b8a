"""Run a parity script in a subprocess against the default (TPU) platform.

The suite's conftest pins JAX to a virtual CPU mesh, so TPU-only checks
(Mosaic kernels, MXU precision behavior) re-exec in a clean env; they
self-skip when no TPU is reachable."""
import os
import subprocess
import sys

import pytest


def run_on_tpu(script: str, marker: str, timeout: int = 1500):
    # Mosaic kernel compiles aren't served by the persistent XLA cache and
    # take 7-9 min alone on this 1-core host — under full-suite congestion
    # a tighter timeout flakes.
    # drop the conftest's CPU-mesh pins but KEEP the rest of the env —
    # PYTHONPATH carries the TPU platform plugin
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.join(os.path.dirname(__file__), "..")
    env["PYTHONPATH"] = (env.get("PYTHONPATH", "") + os.pathsep + repo)
    result = subprocess.run([sys.executable, "-c", script], env=env,
                            capture_output=True, text=True, timeout=timeout)
    out = result.stdout + result.stderr
    if "NO_TPU" in out:
        pytest.skip("no TPU platform available")
    assert result.returncode == 0, out
    assert marker in out, out
