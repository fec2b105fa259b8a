"""Regression uncertainty coverage — quantifying the reference's bands.

The reference PLOTS `confidence_region()` bands (reference
methods/DKT_regression.py:93, sines/train_DKT.py:233-277) but never
measures them. This benchmark measures the empirical coverage of the
+-2*sigma band (gpytorch's confidence_region convention; nominal coverage
95.45% under a correct Gaussian posterior): the fraction of true query
targets y that fall inside [mean - 2s, mean + 2s] of the noise-inclusive
predictive posterior `likelihood(model(z))`, multi-seed (fresh training
per seed).

Tracks:
  * sines  — DKT = MLP(1->40->40) + SpectralMixture ExactGP
    (sines_tpu/train_DKT.py protocol: 5-shot conditioning, coverage over
    the 195 query points of each of --n_test_tasks tasks);
  * qmul   — synthetic-QMUL DKT (benchmarks/paper_protocol.py dataset),
    rbf + spectral kernels, coverage over all 19 trajectory points
    conditioned on n_support=5 (reference test_regression.py protocol).

Writes {sines,qmul_synthetic}_dkt_*_coverage95{,_std} rows (means over
seeds, std across seeds) into benchmarks/report.json.
Usage: python benchmarks/coverage.py [--tracks sines,qmul] [--seeds 1,2,3]
           [--sines_iters 50000] [--qmul_epochs 100] [--n_test_tasks 500]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def band_coverage(pred, y) -> float:
    """Fraction of targets inside confidence_region() (+-2 sigma)."""
    lower, upper = pred.confidence_region()
    y = np.asarray(y)
    return float(np.mean((np.asarray(lower) <= y) & (y <= np.asarray(upper))))


def sines_coverage(seed: int, iters: int, n_test_tasks: int,
                   task_batch: int) -> tuple[float, float]:
    """Train the sines DKT (sines_tpu/train_DKT.py law) and return
    (coverage95, mse) over n_test_tasks 5-shot tasks."""
    import jax
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.methods import DKTRegression
    from deep_kernel_transfer_tpu.models.backbones import MLP2
    from sines_tpu import common

    rng = np.random.RandomState(seed)
    tasks = common.train_tasks()
    model = DKTRegression(MLP2(), feat_dim=40, kernel_type="spectral",
                          lr=1e-3)
    state = model.init(jax.random.PRNGKey(seed), jnp.zeros((10, 1)))
    for it in range(iters // task_batch):
        xb, yb = tasks.sample_batch(rng, task_batch, common.N_SHOT_TRAIN,
                                    noise=0.1)
        state, m = model.train_step(state, jnp.asarray(xb), jnp.asarray(yb))
        if it % 1000 == 0:
            print(f"[sines seed {seed}] {it * task_batch}/{iters} "
                  f"loss {float(m['loss']):.3f}", flush=True)

    tt = common.test_tasks(out_of_range=False)
    covs, mses = [], []
    for _ in range(n_test_tasks):
        _, xs, ys, xq, yq, _, _ = common.sample_eval_task(rng, tt)
        pred = model.predict(state.params, jnp.asarray(xs), jnp.asarray(ys),
                             jnp.asarray(xq))
        covs.append(band_coverage(pred, yq))
        mses.append(float(np.mean((np.asarray(pred.mean) - yq) ** 2)))
    return float(np.mean(covs)), float(np.mean(mses))


def qmul_coverage(seed: int, kernel: str, epochs: int, root: str,
                  n_test_epochs: int) -> tuple[float, float]:
    """Train the synthetic-QMUL DKT CLI-style and return (coverage95, mse)
    over n_test_epochs random 5-shot test-person trajectories."""
    import jax
    import jax.numpy as jnp

    from paper_protocol import make_synthetic_qmul

    make_synthetic_qmul(root)
    cwd = os.getcwd()
    os.chdir(root)
    try:
        import train_regression as train_cli

        from deep_kernel_transfer_tpu.data import get_batch, test_people

        flags = ["--method=DKT", f"--seed={seed}", f"--stop_epoch={epochs}"]
        if kernel == "spectral":
            flags.append("--spectral")
        state = train_cli.main(flags)
        model = train_cli.build_regression_method(
            argparse.Namespace(method="DKT", model="Conv3",
                               spectral=(kernel == "spectral"),
                               task_batch=1, dataset="QMUL"))
        rng = np.random.RandomState(seed)
        covs, mses = [], []
        for _ in range(n_test_epochs):
            person = [test_people[rng.randint(len(test_people))]]
            x, y = get_batch(person, rng)
            x, y = jnp.asarray(x[0]), jnp.asarray(y[0])
            sidx = rng.choice(19, 5, replace=False)
            pred = model.predict(state.params, x[sidx], y[sidx], x)
            covs.append(band_coverage(pred, y))
            mses.append(float(np.mean((np.asarray(pred.mean)
                                       - np.asarray(y)) ** 2)))
        return float(np.mean(covs)), float(np.mean(mses))
    finally:
        os.chdir(cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", default="sines,qmul")
    ap.add_argument("--seeds", default="1,2,3")
    ap.add_argument("--sines_iters", type=int, default=50000)
    ap.add_argument("--sines_task_batch", type=int, default=1,
                    help="1 = reference-parity sequential tasks")
    ap.add_argument("--qmul_epochs", type=int, default=100)
    ap.add_argument("--qmul_kernels", default="rbf,spectral")
    ap.add_argument("--n_test_tasks", type=int, default=500)
    ap.add_argument("--qmul_test_epochs", type=int, default=50)
    ap.add_argument("--qmul_root", default="/tmp/_paper_qmul")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "report.json")

    def record(update: dict) -> None:
        with open(report_path) as f:
            report = json.load(f)
        report.update(update)
        report["coverage_protocol"] = (
            "empirical coverage of the +-2*sigma confidence_region() band "
            "(nominal 95.45%) of the noise-inclusive predictive posterior, "
            "fresh training per seed; sines = 500 5-shot test tasks x 195 "
            "query points (sines_tpu protocol), qmul_synthetic = 50 5-shot "
            "test-person trajectories x 19 points (test_regression.py "
            "protocol)")
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)

    if "sines" in args.tracks:
        covs, mses = [], []
        for seed in seeds:
            t0 = time.time()
            c, m = sines_coverage(seed, args.sines_iters, args.n_test_tasks,
                                  args.sines_task_batch)
            print(f"== sines seed {seed}: coverage95 {c:.4f} mse {m:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            covs.append(c)
            mses.append(m)
        record({"sines_dkt_coverage95": round(float(np.mean(covs)), 4),
                "sines_dkt_coverage95_std": round(float(np.std(covs)), 4),
                "sines_dkt_mse_multiseed": round(float(np.mean(mses)), 4)})

    if "qmul" in args.tracks:
        for kernel in args.qmul_kernels.split(","):
            covs, mses = [], []
            for seed in seeds:
                t0 = time.time()
                c, m = qmul_coverage(seed, kernel, args.qmul_epochs,
                                     args.qmul_root, args.qmul_test_epochs)
                print(f"== qmul {kernel} seed {seed}: coverage95 {c:.4f} "
                      f"mse {m:.4f} ({time.time() - t0:.0f}s)", flush=True)
                covs.append(c)
                mses.append(m)
            record({f"qmul_synthetic_dkt_{kernel}_coverage95":
                        round(float(np.mean(covs)), 4),
                    f"qmul_synthetic_dkt_{kernel}_coverage95_std":
                        round(float(np.std(covs)), 4),
                    f"qmul_synthetic_dkt_{kernel}_mse_multiseed":
                        round(float(np.mean(mses)), 4)})


if __name__ == "__main__":
    main()
