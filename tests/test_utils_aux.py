"""Aux-subsystem tests: metrics logger, step timer, calibration metrics."""
import json

import numpy as np

from deep_kernel_transfer_tpu.utils import MetricsLogger, StepTimer
from deep_kernel_transfer_tpu.utils.metrics import (
    DBindex,
    calibrate_temperature,
    ece,
    sparsity,
)


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), tensorboard=False)
    logger.log_scalars(0, loss=1.5, test_accuracy=20.0)
    logger.log_scalars(1, loss=1.2, test_accuracy=35.0)
    logger.log_histogram(1, "z_support", np.random.randn(100))
    logger.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1
    assert "z_support/mean" in lines[2]


def test_step_timer_phases():
    timer = StepTimer()
    with timer.phase("a"):
        sum(range(1000))
    with timer.phase("a"):
        pass
    s = timer.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0
    assert "a" in timer.report()


def test_ece_perfect_and_awful():
    # confident & correct -> tiny ECE
    logits = np.zeros((200, 5))
    labels = np.random.RandomState(0).randint(0, 5, 200)
    logits[np.arange(200), labels] = 10.0
    assert ece(logits, labels) < 0.02
    # confident & always wrong -> huge ECE
    wrong = (labels + 1) % 5
    logits2 = np.zeros((200, 5))
    logits2[np.arange(200), wrong] = 10.0
    assert ece(logits2, labels) > 0.9
    # one-vs-rest normalisation stays in [0, 1]
    assert 0.0 <= ece(logits, labels, one_vs_rest=True) <= 1.0


def test_temperature_scaling_reduces_overconfidence():
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 4, 500)
    # logits point at the label but only weakly informative + overconfident
    logits = rng.randn(500, 4) * 0.5
    logits[np.arange(500), labels] += 1.0
    logits *= 8.0  # overconfident scaling
    t = calibrate_temperature(logits, labels)
    assert t > 2.0  # recovers a big temperature
    assert ece(logits, labels, temperature=t) < ece(logits, labels)


def test_temperature_matches_lbfgs_oracle():
    """calibrate_temperature (Adam on NLL) must land on the same optimum as
    the reference's LBFGS (reference test_uncertainty.py:62-74) — checked
    against scipy L-BFGS-B on the identical NLL objective."""
    from scipy.optimize import minimize
    from scipy.special import logsumexp

    rng = np.random.RandomState(3)
    labels = rng.randint(0, 5, 400)
    logits = rng.randn(400, 5) * 0.7
    logits[np.arange(400), labels] += 1.5
    logits *= 5.0  # miscalibrated

    def nll(t):
        z = logits / t[0]
        return float(np.mean(logsumexp(z, axis=1) - z[np.arange(400), labels]))

    oracle = minimize(nll, x0=[1.0], method="L-BFGS-B",
                      bounds=[(1e-3, 100.0)]).x[0]
    ours = calibrate_temperature(logits, labels)
    assert abs(ours - oracle) / oracle < 0.02, (ours, oracle)


def test_dbindex_and_sparsity():
    rng = np.random.RandomState(2)
    tight = {0: list(rng.randn(20, 8) * 0.1), 1: list(rng.randn(20, 8) * 0.1 + 5)}
    loose = {0: list(rng.randn(20, 8) * 3.0), 1: list(rng.randn(20, 8) * 3.0 + 1)}
    assert DBindex(tight) < DBindex(loose)
    # reference utils.py:26-31 counts nonzero entries
    feats = {0: [np.array([0.0, 1.0, 0.0, 2.0])]}
    assert abs(sparsity(feats) - 2.0) < 1e-6


def test_persistent_jit_cache_helper(monkeypatch, tmp_path):
    """utils/jit_cache: opt-out honoured; an already-configured cache dir
    (the harness's) wins; DKT_JIT_CACHE picks the dir otherwise."""
    import jax

    from deep_kernel_transfer_tpu.utils.jit_cache import (
        enable_persistent_jit_cache,
    )

    monkeypatch.setenv("DKT_NO_JIT_CACHE", "1")
    assert enable_persistent_jit_cache() is None

    monkeypatch.delenv("DKT_NO_JIT_CACHE")
    # conftest configured tests/.jax_cache -> helper must NOT move it
    configured = jax.config.jax_compilation_cache_dir
    assert configured
    assert enable_persistent_jit_cache() == configured

    target = str(tmp_path / "jitcache")
    monkeypatch.setenv("DKT_JIT_CACHE", target)
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        assert enable_persistent_jit_cache() == target
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", configured)


def test_resolve_checkpoint_file(tmp_path, capsys):
    """Shared eval-CLI resolution: --save_iter dispatch, best_model
    preference, and a LOUD warning when nothing exists (a silent run would
    record random-weight accuracy to results.txt)."""
    from deep_kernel_transfer_tpu.utils.checkpoint import (
        resolve_checkpoint_file)

    d = str(tmp_path)
    assert resolve_checkpoint_file(d) is None
    assert "RANDOMLY-INITIALISED" in capsys.readouterr().err
    (tmp_path / "3.tar").write_bytes(b"x")
    assert resolve_checkpoint_file(d).endswith("3.tar")  # latest epoch
    (tmp_path / "best_model.tar").write_bytes(b"x")
    assert resolve_checkpoint_file(d).endswith("best_model.tar")
    assert resolve_checkpoint_file(d, save_iter=3).endswith("3.tar")
    assert capsys.readouterr().err == ""  # found -> no warning


def test_calibration_collection_batch_invariant():
    """get_logits_targets_features: grouping episodes into --episode_batch
    chunks must not change the logits or targets (same sampling RNG stream,
    same per-episode PRNG keys)."""
    from types import SimpleNamespace

    import jax
    import jax.numpy as jnp

    from test_uncertainty import get_logits_targets_features

    rng = np.random.RandomState(0)
    cl_data = {c: [rng.rand(6).astype(np.float32) for _ in range(8)]
               for c in range(5)}
    # episode [n_way, S+Q, D] -> query logits [n_way*Q, n_way], shaped
    # like the real scorers; deterministic but key-consuming
    fn = jax.jit(jax.vmap(
        lambda z, k: z[:, 2:, :].reshape(-1, z.shape[-1])[:, :3]
        + jax.random.uniform(k, ()) * 0.0))

    def collect(eb):
        p = SimpleNamespace(test_n_way=3, n_shot=2, episode_batch=eb,
                            n_iter=7)
        return get_logits_targets_features(p, fn, cl_data, seed=5)

    l1, t1 = collect(1)
    l4, t4 = collect(4)  # 4 + 3 remainder
    np.testing.assert_array_equal(t1, t4)
    np.testing.assert_allclose(l1, l4, rtol=0, atol=0)
    assert l1.shape == (7 * 3 * 15, 3)
