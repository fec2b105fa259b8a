"""Direct tests for utils/profiling.py (SURVEY.md §5 tracing subsystem) —
previously exercised only via bench scripts on the real chip."""
import numpy as np
import jax.numpy as jnp

from deep_kernel_transfer_tpu.utils.profiling import StepTimer, annotate, sync


def test_sync_handles_every_input_shape():
    assert sync(()) == 0.0  # no device leaves
    assert sync({"a": 3}) == 0.0  # no array leaves
    assert sync(jnp.asarray(2.5)) == 2.5  # scalar readback
    # multi-element arrays read back ONE on-device-sliced element, never
    # the whole buffer (the tunnel-bandwidth lesson in the docstring)
    v = sync({"m": jnp.arange(12.0).reshape(3, 4), "x": jnp.ones(())})
    assert v == 0.0  # ravel()[0] of arange


def test_step_timer_phases_and_report():
    t = StepTimer()
    with t.phase("data"):
        pass
    with t.phase("step") as ph:
        out = jnp.ones((4,)) * 3
        ph["sync"] = out
    with t.phase("step"):
        pass
    s = t.summary()
    assert set(s) == {"data", "step"}
    assert s["step"]["count"] == 2
    assert s["step"]["total_s"] >= 0.0
    assert "step" in t.report() and "data" in t.report()


def test_annotate_is_usable_as_context():
    with annotate("unit-test-span"):
        x = float(np.asarray(jnp.zeros(()) + 1))
    assert x == 1.0
