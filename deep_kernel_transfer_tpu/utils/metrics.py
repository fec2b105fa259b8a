"""Metrics: one-hot, Davies-Bouldin index, sparsity (reference utils.py:4-31)
and calibration (15-bin ECE + temperature scaling,
reference test_uncertainty.py:39-94)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def one_hot(y, num_class: int) -> np.ndarray:
    """reference utils.py:4-5."""
    y = np.asarray(y)
    out = np.zeros((len(y), num_class), np.float32)
    out[np.arange(len(y)), y] = 1.0
    return out


def DBindex(cl_data_file: dict) -> float:
    """Davies-Bouldin cluster-separation index (reference utils.py:7-24)."""
    class_list = list(cl_data_file.keys())
    cl_means, stds = [], []
    for cl in class_list:
        arr = np.asarray(cl_data_file[cl])
        cl_means.append(np.mean(arr, axis=0))
        stds.append(np.sqrt(np.mean(np.sum(np.square(arr - cl_means[-1]), axis=1))))
    mu = np.asarray(cl_means)
    mdists = np.sqrt(np.sum(np.square(mu[None] - mu[:, None]), axis=2))
    DBs = []
    for i in range(len(class_list)):
        DBs.append(
            max(
                (stds[i] + stds[j]) / mdists[i, j]
                for j in range(len(class_list))
                if j != i
            )
        )
    return float(np.mean(DBs))


def sparsity(cl_data_file: dict) -> float:
    """Mean number of nonzero feature entries (reference utils.py:26-31)."""
    cl_sparsity = [
        np.mean([np.sum(x != 0) for x in cl_data_file[cl]]) for cl in cl_data_file
    ]
    return float(np.mean(cl_sparsity))


# -- calibration (reference test_uncertainty.py) ----------------------------


def ece(logits, labels, temperature: float = 1.0, n_bins: int = 15,
        one_vs_rest: bool = False) -> float:
    """15-bin expected calibration error (reference test_uncertainty.py:76-94).

    one_vs_rest: sigmoid-normalised probabilities for DKT's one-vs-rest
    logits (test_uncertainty.py:78-81)."""
    logits = np.asarray(logits, np.float64) / temperature
    labels = np.asarray(labels)
    if one_vs_rest:
        s = 1.0 / (1.0 + np.exp(-logits))
        probs = s / s.sum(axis=1, keepdims=True)
    else:
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = e / e.sum(axis=1, keepdims=True)
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    acc = (pred == labels).astype(np.float64)
    bins = np.linspace(0, 1, n_bins + 1)
    total = 0.0
    for lo, hi in zip(bins[:-1], bins[1:]):
        in_bin = (conf > lo) & (conf <= hi)
        prop = in_bin.mean()
        if prop > 0:
            total += abs(conf[in_bin].mean() - acc[in_bin].mean()) * prop
    return float(total)


def calibrate_temperature(logits, labels, iterations: int = 200,
                          lr: float = 0.1) -> float:
    """Fit a scalar temperature by minimising NLL (the reference uses LBFGS,
    test_uncertainty.py:62-74; full-batch Adam on one scalar converges to
    the same optimum — cross-checked against scipy L-BFGS-B in
    tests/test_utils_aux.py). The defaults ARE what executes: 200 Adam
    steps at lr 0.1 on log-temperature."""
    import optax

    logits_j = jnp.asarray(np.asarray(logits), jnp.float32)
    labels_j = jnp.asarray(np.asarray(labels))

    def nll(log_t):
        t = jnp.exp(log_t)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits_j / t, labels_j)
        )

    log_t = jnp.zeros(())
    tx = optax.adam(lr)
    opt_state = tx.init(log_t)
    grad_fn = jax.jit(jax.value_and_grad(nll))
    for _ in range(iterations):
        _, g = grad_fn(log_t)
        updates, opt_state = tx.update(g, opt_state)
        log_t = optax.apply_updates(log_t, updates)
    return float(jnp.exp(log_t))
