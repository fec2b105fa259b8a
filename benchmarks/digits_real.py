"""Real-image few-shot benchmark: sklearn's bundled handwritten digits.

The paper's image benchmarks (BASELINE.md) need datasets this zero-egress
environment cannot download. The ONE real image dataset shipped offline in
this image is scikit-learn's `load_digits` — 1,797 genuine 8x8 handwritten
digits (a UCI/NIST-derived test set). This script turns it into a real-data
few-shot classification benchmark with the reference's omniglot protocol
shape (28px grayscale, Conv4S, 5-way, n_query=15, 600-episode eval with
95% CI, multi-seed repeats — reference test.py:65,142,174):

  * base split   = digit classes 0-4 (~900 images),
  * novel split  = digit classes 5-9 (disjoint classes, never seen),
  * val split    = base classes (model selection cannot leak novel data),
  * images bicubic-upsampled 8x8 -> 28x28, saved as grayscale JPEGs through
    the standard filelist pipeline (data/filelist.py) — the full production
    path, not an array shortcut.

This is NOT a paper-parity number (the paper never ran this dataset); it is
recorded as honest evidence that the framework *learns on real images*
end-to-end through its CLIs: cross-class transfer from digits 0-4 to
unseen digits 5-9. A 5-way random-guess floor is 20%.

Writes digits_real_* entries into benchmarks/report.json.
Usage: python benchmarks/digits_real.py [--methods DKT,protonet]
       [--shots 1,5] [--repeat 3] [--root DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from PIL import Image


def make_digits_filelists(root: str) -> None:
    """Write the omniglot-layout filelist dataset from sklearn digits."""
    from sklearn.datasets import load_digits

    img_dir = os.path.join(root, "filelists", "omniglot", "images")
    done = os.path.join(img_dir, ".complete")
    if os.path.exists(done):
        return
    os.makedirs(img_dir, exist_ok=True)
    X, y = load_digits(return_X_y=True)  # (1797, 64) float 0..16, labels 0..9
    names: list[str] = []
    labels: list[int] = []
    for i, (row, cl) in enumerate(zip(X, y)):
        arr = (row.reshape(8, 8) / 16.0 * 255.0).round().astype(np.uint8)
        img = Image.fromarray(arr, mode="L").resize((28, 28), Image.BICUBIC)
        p = os.path.join(img_dir, f"d{cl}_{i}.jpg")
        img.save(p, quality=95)
        names.append(p)
        labels.append(int(cl))
    names_np, labels_np = np.asarray(names), np.asarray(labels)

    def split_json(classes, path):
        mask = np.isin(labels_np, classes)
        with open(path, "w") as f:
            json.dump({
                "label_names": [f"digit_{c}" for c in range(10)],
                "image_names": names_np[mask].tolist(),
                "image_labels": labels_np[mask].tolist(),
            }, f)

    fl = os.path.join(root, "filelists", "omniglot")
    split_json(range(0, 5), os.path.join(fl, "base.json"))
    split_json(range(0, 5), os.path.join(fl, "val.json"))  # no novel leakage
    split_json(range(5, 10), os.path.join(fl, "novel.json"))
    open(done, "w").close()
    print(f"digits dataset ready: {len(names)} images -> {img_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="DKT,protonet")
    ap.add_argument("--shots", default="1,5")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=-1,
                    help="-1 = the reference's default budget per method/shots")
    ap.add_argument("--root", default="/tmp/_digits_real")
    args = ap.parse_args()

    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "report.json")
    make_digits_filelists(args.root)
    os.chdir(args.root)

    import save_features as sf_cli
    import test as test_cli
    import train as train_cli

    results: dict[str, float] = {}
    for method in args.methods.split(","):
        for shot in (int(s) for s in args.shots.split(",")):
            common = ["--dataset=omniglot", "--model=Conv4",
                      "--train_n_way=5", "--test_n_way=5",
                      f"--n_shot={shot}", "--seed=1", f"--method={method}"]
            t0 = time.time()
            train_cli.main(common + ([f"--stop_epoch={args.epochs}"]
                                     if args.epochs != -1 else []))
            train_s = time.time() - t0
            if method not in ("DKT", "maml", "maml_approx"):
                sf_cli.main(common + ["--split=novel"])
            acc, ci = test_cli.main(common + [f"--repeat={args.repeat}"])
            key = f"digits_real_{method.lower()}_5way_{shot}shot"
            results[f"{key}_acc"] = round(acc, 2)
            results[f"{key}_ci95"] = round(ci, 2)
            results[f"{key}_train_s"] = round(train_s, 1)
            print(f"== {method} {shot}-shot: {acc:.2f}% +- {ci:.2f}% "
                  f"(train {train_s:.0f}s)")

    with open(report_path) as f:
        report = json.load(f)
    report.update(results)
    report["digits_real_protocol"] = (
        "sklearn load_digits (1797 real 8x8 handwritten digits) -> 28px "
        "grayscale jpgs; base=digits 0-4, novel=digits 5-9 (disjoint), "
        "val=base; reference omniglot protocol (Conv4S, n_query=15, "
        "600-episode eval, multi-seed); random-guess floor 20%")
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()}))


if __name__ == "__main__":
    main()
