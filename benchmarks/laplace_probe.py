"""Root-cause probe for the Laplace head's accuracy drop on digits_real.

Measured finding (report.json): DKT --laplace scores 48.54 / 62.33 vs
57.97 / 74.03 for the standard learned-kernel GP head. The reference's
--laplace escape hatch (reference methods/DKT.py:207-222) DISCARDS the
learned deep-kernel GP hyperparameters and fits sklearn's
GaussianProcessClassifier with a FIXED kernel 1.0 * RBF(length_scale=0.1,
bounds=(0.1, 10), optimizer=None) on the L2-normalised support features.
On unit-norm 1600-d features the squared distances sit in [0, 4], so
exp(-d^2 / (2 * 0.01)) collapses the off-diagonal Gram toward 0 — the GPC
is prior-dominated and must lose accuracy by construction.

This probe answers "our bug or reference parity?" empirically: the SAME
trained checkpoint + the SAME episodes are scored through
  (a) ours    — gp/laplace.py laplace_ovr_predict (jax, on the eval device),
  (b) sklearn — the reference's literal head (GaussianProcessClassifier),
  (c) gp      — the standard learned-kernel posterior head, for context,
plus the mean off-diagonal support Gram value under RBF(0.1) to document
the identity collapse. Writes digits_real_laplace_probe_* rows.

Run AFTER benchmarks/digits_real.py (needs its dataset + checkpoints).
Usage: python benchmarks/laplace_probe.py [--episodes 100] [--shots 1,5]
           [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def probe_shot(shot: int, n_episodes: int, seed: int = 7) -> dict:
    import jax
    import jax.numpy as jnp
    from sklearn.gaussian_process import GaussianProcessClassifier
    from sklearn.gaussian_process.kernels import RBF
    from sklearn.gaussian_process.kernels import ConstantKernel as C

    from deep_kernel_transfer_tpu import factory
    from deep_kernel_transfer_tpu.data import EpisodicDataLoader
    from deep_kernel_transfer_tpu.gp.laplace import laplace_ovr_predict, rbf_gram
    from deep_kernel_transfer_tpu.io_utils import parse_args
    from deep_kernel_transfer_tpu.methods.base import (episode_labels,
                                                       flatten_episode)
    from deep_kernel_transfer_tpu.utils.checkpoint import (
        load_params_checkpoint,
        resolve_checkpoint_file,
    )

    params_cli = parse_args("test", [
        "--dataset=omniglot", "--model=Conv4", "--method=DKT",
        "--train_n_way=5", "--test_n_way=5", f"--n_shot={shot}", "--seed=1"])
    n_way, n_support, n_query = 5, shot, 15
    factory.check_model_constraints(params_cli)  # Conv4 -> Conv4S @28px
    image_size = factory.resolve_image_size(params_cli)
    model = factory.build_method(params_cli, n_way, n_support)
    example = jnp.zeros((n_way, n_support + n_query, image_size, image_size,
                         3), jnp.float32)
    state = model.init(jax.random.PRNGKey(1), example)
    ckpt = resolve_checkpoint_file(factory.checkpoint_dir(params_cli), -1)
    params, _ = load_params_checkpoint(ckpt, state.params,
                                       method_name="DKT", model=model,
                                       image_size=image_size)
    print(f"loaded {ckpt}")

    novel_file = factory.resolve_data_files(params_cli, split_for_test="novel")
    loader = EpisodicDataLoader(novel_file, image_size, n_way, n_support,
                                n_query, n_episodes=n_episodes,
                                episode_batch=1, aug=False, seed=seed,
                                output_uint8=True)
    y_support = np.asarray(episode_labels(n_way, n_support))
    y_query = np.asarray(episode_labels(n_way, n_query))
    kernel = C(1.0) * RBF(length_scale=0.1, length_scale_bounds=(0.1, 10.0))

    acc_ours, acc_sk, acc_gp, offdiag = [], [], [], []
    for xb in loader:
        x = jnp.asarray(xb[0])
        z_all, _ = model._features(params, flatten_episode(x))
        d = z_all.shape[-1]
        z = np.asarray(z_all, np.float64).reshape(n_way, n_support + n_query, d)
        z_support = z[:, :n_support].reshape(n_way * n_support, d)
        z_query = z[:, n_support:].reshape(-1, d)
        # (a) ours — the jax Laplace GPC
        pred = np.asarray(laplace_ovr_predict(
            jnp.asarray(z_support, jnp.float32), jnp.asarray(y_support),
            jnp.asarray(z_query, jnp.float32), n_way))
        acc_ours.append(float(np.mean(pred == y_query)) * 100.0)
        # (b) the reference's literal sklearn head
        gpc = GaussianProcessClassifier(kernel=kernel, optimizer=None)
        gpc.fit(z_support, y_support)
        acc_sk.append(float(np.mean(gpc.predict(z_query) == y_query)) * 100.0)
        # (c) the standard learned-kernel GP head on the same episode
        gp_pred = np.asarray(jnp.argmax(model.episode_scores(params, x),
                                        axis=-1))
        acc_gp.append(float(np.mean(gp_pred == y_query)) * 100.0)
        # identity-collapse evidence: mean off-diagonal RBF(0.1) Gram value
        g = np.asarray(rbf_gram(jnp.asarray(z_support, jnp.float32),
                                jnp.asarray(z_support, jnp.float32)))
        n = g.shape[0]
        offdiag.append(float((g.sum() - np.trace(g)) / (n * n - n)))

    def mci(v):
        v = np.asarray(v)
        return (round(float(v.mean()), 2),
                round(float(1.96 * v.std() / np.sqrt(len(v))), 2))

    (mo, co), (ms, cs), (mg, cg) = mci(acc_ours), mci(acc_sk), mci(acc_gp)
    print(f"{shot}-shot over {len(acc_ours)} episodes: ours {mo}+-{co} | "
          f"sklearn {ms}+-{cs} | learned-GP {mg}+-{cg} | "
          f"offdiag {np.mean(offdiag):.2e}")
    return {
        f"digits_real_laplace_probe_{shot}shot_ours_acc": mo,
        f"digits_real_laplace_probe_{shot}shot_ours_ci95": co,
        f"digits_real_laplace_probe_{shot}shot_sklearn_acc": ms,
        f"digits_real_laplace_probe_{shot}shot_sklearn_ci95": cs,
        f"digits_real_laplace_probe_{shot}shot_gp_acc": mg,
        f"digits_real_laplace_probe_{shot}shot_gp_ci95": cg,
        f"digits_real_laplace_probe_{shot}shot_gram_offdiag":
            float(np.format_float_scientific(np.mean(offdiag), 3)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=100)
    ap.add_argument("--shots", default="1,5")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (leave the TPU to other studies)")
    ap.add_argument("--root", default="/tmp/_digits_real")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "report.json")
    from digits_real import make_digits_filelists

    make_digits_filelists(args.root)
    os.chdir(args.root)

    rows: dict = {}
    for shot in (int(s) for s in args.shots.split(",") if s):
        rows.update(probe_shot(shot, args.episodes))
    rows["digits_real_laplace_probe_protocol"] = (
        "same checkpoint + same episodes through (a) gp/laplace.py, (b) the "
        "reference's literal sklearn GaussianProcessClassifier 1.0*RBF(0.1) "
        "head (reference methods/DKT.py:207-222), (c) the learned-kernel GP "
        "posterior; gram_offdiag = mean off-diagonal support Gram under "
        "RBF(0.1) documenting the identity collapse")
    with open(report_path) as f:
        report = json.load(f)
    report.update(rows)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
