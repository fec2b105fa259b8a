"""A real CLI workload that ROUTES through the Woodbury low-rank GP path.

Every reference config has N = n_way*(S+Q) <= ~105 with D >= 1600, so the
O(N D^2) Woodbury route (gp/low_rank.py, auto-routed by gp/exact.py
_use_low_rank when the kernel is exactly low-rank and 2D <= N) is never
taken by the paper's own settings. This benchmark builds the config where
the scaling answer actually matters and drives it through the production
CLIs end-to-end:

  * 250 synthetic stroke-glyph classes x 40 imgs (the digits_real.py
    generator), split base 200 / val 25 / novel 25;
  * DKT, Conv4S (D=64 features), bncossim kernel, 20-way 15-shot:
    train episodes have N = 20*(15+16) = 620 points per way-GP
    (2D = 128 <= 620 -> Woodbury fires in mll), eval conditions on
    N = 300 support points (-> Woodbury fires in posterior);
  * trained with train.py, evaluated with test.py (600-episode protocol).

Then A/Bs the SAME jitted training/eval step with force_dense=True (the
explicit DKT constructor flag wired to ExactGP.force_dense) to measure
what the dense N x N Gram path would cost on this config.

Writes glyphs20w_* rows into benchmarks/report.json.
Usage: python benchmarks/woodbury_workload.py [--epochs 50] [--repeat 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from digits_real import _render_glyph_class  # noqa: E402

N_WAY, N_SHOT, N_QUERY_TRAIN, N_QUERY_TEST, HW = 20, 15, 16, 15, 28


def make_glyph_filelists(root: str, n_classes: int = 250,
                         n_img: int = 40) -> None:
    """250-class glyph dataset, enough images per class for 15-shot
    episodes (S+Q = 31 <= 40); base 200 / val 25 / novel 25 (disjoint)."""
    from PIL import Image

    root = os.path.abspath(root)
    fl = os.path.join(root, "filelists", "omniglot")
    img_dir = os.path.join(fl, "glyphs")
    done = os.path.join(img_dir, f".complete_{n_classes}x{n_img}")
    names = [os.path.join(img_dir, f"g{cl}_{i}.jpg")
             for cl in range(n_classes) for i in range(n_img)]
    labels = [cl for cl in range(n_classes) for _ in range(n_img)]
    if not os.path.exists(done):
        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.RandomState(23)
        it = iter(names)
        for cl in range(n_classes):
            for arr in _render_glyph_class(rng, n_img):
                Image.fromarray(arr, mode="L").save(next(it), quality=95)
        open(done, "w").close()
        print(f"glyph dataset ready: {len(names)} images -> {img_dir}")
    names_np, labels_np = np.asarray(names), np.asarray(labels)
    splits = {"base": range(0, 200), "val": range(200, 225),
              "novel": range(225, 250)}
    for split, classes in splits.items():
        mask = np.isin(labels_np, list(classes))
        with open(os.path.join(fl, f"{split}.json"), "w") as f:
            json.dump({
                "label_names": [f"glyph_{c}" for c in range(n_classes)],
                "image_names": names_np[mask].tolist(),
                "image_labels": [int(c) for c in labels_np[mask]],
            }, f)


def bench_step_ab(ep_batch: int = 8, iters: int = 10) -> dict:
    """Time the jitted 20-way DKT train step + posterior eval with the
    Woodbury route (default) vs force_dense=True (an explicit DKT
    constructor flag — each arm builds its own method object, so each
    traces fresh; no ambient env state is touched)."""
    import jax
    import jax.numpy as jnp

    from deep_kernel_transfer_tpu.methods import DKT
    from deep_kernel_transfer_tpu.models.backbones import Conv4S

    xb = jax.random.uniform(
        jax.random.PRNGKey(0),
        (ep_batch, N_WAY, N_SHOT + N_QUERY_TRAIN, HW, HW, 3))

    def sync(v) -> float:
        # device->host readback: block_until_ready can ack at enqueue on
        # the tunnelled platform (CLAUDE.md)
        return float(np.asarray(jax.tree.leaves(v)[0]).ravel()[0])

    out = {}
    for arm in ("woodbury", "dense"):
        model = DKT(Conv4S(), n_way=N_WAY, n_support=N_SHOT,
                    kernel_type="bncossim", force_dense=(arm == "dense"))
        state = model.init(jax.random.PRNGKey(0), xb[0])
        state, m = model.train_step(state, xb)  # compile + route at trace
        sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = model.train_step(state, xb)
        sync(m["loss"])
        dt = time.perf_counter() - t0
        out[f"{arm}_train_eps_per_sec"] = round(iters * ep_batch / dt, 2)
        # eval: condition on 300 support, score 300 query (posterior route)
        acc = model.batch_correct(state.params, xb[:, :, : N_SHOT + N_QUERY_TEST])
        sync(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = model.batch_correct(state.params,
                                      xb[:, :, : N_SHOT + N_QUERY_TEST])
        sync(acc)
        out[f"{arm}_eval_eps_per_sec"] = round(
            iters * ep_batch / (time.perf_counter() - t0), 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--episode_batch", type=int, default=8)
    ap.add_argument("--skip_train", action="store_true",
                    help="only the step A/B bench (no CLI train/test)")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip the step A/B and training; run the "
                         "woodbury-vs-dense accuracy A/B on the existing "
                         "checkpoint under --root")
    ap.add_argument("--root", default="/tmp/_glyphs20w")
    args = ap.parse_args()
    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "report.json")

    def record(update: dict) -> None:
        with open(report_path) as f:
            report = json.load(f)
        report.update(update)
        report["glyphs20w_protocol"] = (
            "Woodbury-routed workload: 250 synthetic glyph classes "
            "(base 200/val 25/novel 25), DKT Conv4S bncossim 20-way "
            "15-shot via train.py/test.py; train N=620 (2D=128<=N -> "
            "gp/exact.py Woodbury mll), eval conditions on N=300 "
            "(Woodbury posterior); dense arms re-trace the same step with "
            "force_dense=True (explicit DKT/ExactGP flag); "
            "glyphs20w_dense_*_acc is the SAME checkpoint + episode "
            "stream scored through the dense route (accuracy parity A/B)")
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)

    if not args.eval_only:
        entry = bench_step_ab(ep_batch=args.episode_batch)
        record({f"glyphs20w_{k}": v for k, v in entry.items()})
        print(json.dumps(entry))
        if args.skip_train:
            return
    make_glyph_filelists(args.root)
    os.chdir(args.root)
    import test as test_cli
    import train as train_cli

    common = ["--dataset=omniglot", "--model=Conv4", "--method=DKT",
              f"--train_n_way={N_WAY}", f"--test_n_way={N_WAY}",
              f"--n_shot={N_SHOT}", "--seed=1",
              f"--episode_batch={args.episode_batch}"]
    if not args.eval_only:
        t0 = time.time()
        train_cli.main(common + ["--resume", f"--stop_epoch={args.epochs}"])
        record({"glyphs20w_dkt_train_s": round(time.time() - t0, 1)})
    # Accuracy A/B on the SAME checkpoint and the SAME reseeded episode
    # stream (seed fixed by --seed): the Woodbury route (default, fires at
    # eval N=300) vs force_dense (env hatch mapped at DKT construction).
    # Dense-vs-Woodbury parity on the shipped workload, not just unit tests.
    for arm in ("woodbury", "dense"):
        os.environ["DKT_GP_FORCE_DENSE"] = "1" if arm == "dense" else "0"
        try:
            acc, ci = test_cli.main(common + [f"--repeat={args.repeat}"])
        finally:
            os.environ.pop("DKT_GP_FORCE_DENSE", None)
        key = ("glyphs20w_dkt_20way_15shot" if arm == "woodbury"
               else "glyphs20w_dense_20way_15shot")
        record({f"{key}_acc": round(acc, 2), f"{key}_ci95": round(ci, 2)})
        print(f"== glyphs 20-way 15-shot [{arm}]: {acc:.2f}% +- {ci:.2f}% "
              f"(floor {100 / N_WAY:.0f}%)")


if __name__ == "__main__":
    main()
