"""Multi-host episode-parallel training, validated with REAL processes.

SURVEY.md §5 prescribes per-process host loading via
jax.make_array_from_process_local_data (parallel/mesh.py
`distribute_local_episodes`). The rest of the suite runs that API
single-process, where it degenerates to shard_episode_batch; here TWO
separate Python processes form a jax.distributed cluster (CPU backend,
4 virtual devices each -> one 8-device global mesh), each contributes its
LOCAL half of a global episode batch, and both run the sharded DKT
training step. The loss must match the single-process step on the full
batch bit-for-tolerance — proving the multi-host assembly + XLA-collective
gradient path end-to-end, not just its types.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
pid = int(sys.argv[1])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from deep_kernel_transfer_tpu.methods import DKT
from deep_kernel_transfer_tpu.models.backbones import ConvNetS
from deep_kernel_transfer_tpu.parallel import (
    distribute_local_episodes, make_mesh, make_sharded_train_step,
    replicate_tree,
)

assert jax.device_count() == 8 and jax.local_device_count() == 4

model = DKT(ConvNetS(depth=2), n_way=3, n_support=2,
            kernel_type="bncossim", feature_dtype="float32")
# identical global batch on every process; each contributes its local half
x = np.random.RandomState(7).randn(8, 3, 5, 16, 16, 3).astype(np.float32)
state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))

mesh = make_mesh(8)
step = make_sharded_train_step(model, mesh)
xb = distribute_local_episodes(x[pid * 4:(pid + 1) * 4], mesh)
assert xb.shape == (8, 3, 5, 16, 16, 3)
state, metrics = step(replicate_tree(state, mesh), xb)
loss = float(metrics["loss"])
leaf = float(np.sum(np.asarray(
    jax.tree.leaves(state.params)[0].addressable_data(0))))
print(f"WORKER{{pid}} loss={{loss:.8f}} leaf={{leaf:.6f}}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step(tmp_path):
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, port=port))

    # clean env: drop the conftest's single-process CPU-mesh pins (the
    # workers configure their own 4-device runtime); keep PYTHONPATH
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out

    def parse(out, pid):
        for line in out.splitlines():
            if line.startswith(f"WORKER{pid} "):
                toks = dict(t.split("=") for t in line.split()[1:])
                return float(toks["loss"]), float(toks["leaf"])
        raise AssertionError(out)

    loss0, leaf0 = parse(outs[0], 0)
    loss1, leaf1 = parse(outs[1], 1)
    # both processes computed the SAME global step
    assert loss0 == pytest.approx(loss1, rel=1e-6)
    assert leaf0 == pytest.approx(leaf1, rel=1e-6)

    # ... and it matches the single-process step on the full batch
    # (this process runs on the conftest's 8-device CPU mesh)
    import jax
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.methods.base import train_step_body
    from deep_kernel_transfer_tpu.models.backbones import ConvNetS

    model = DKT(ConvNetS(depth=2), n_way=3, n_support=2,
                kernel_type="bncossim", feature_dtype="float32")
    x = np.random.RandomState(7).randn(8, 3, 5, 16, 16, 3).astype(np.float32)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))
    _, metrics = train_step_body(model, state, jnp.asarray(x))
    assert loss0 == pytest.approx(float(metrics["loss"]), rel=1e-4)
