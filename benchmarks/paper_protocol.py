"""Paper-protocol QMUL run on a synthetic face grid (offline fallback).

The paper's image benchmarks (BASELINE.md: cross_char ~75.4/90.3 %, CUB
~63.4/77.7 %, QMUL MSE ~0.10) need the real datasets, and this
environment has ZERO network egress — `filelists_tpu/*/download_*.sh`
cannot run (documented in README.md "Real-dataset status"). The closest
faithful substitute is the QMUL head-pose track with a procedurally
generated face grid: the full reference protocol end-to-end —

  * all 29 reference people (24 train / 5 disjoint test,
    data/qmul.py:18-28), full 13 x 19 (pitch, angle) grid, 100x100 JPEGs
    with the person_<pitch>_<angle>.jpg naming contract,
  * `train_regression.py` CLI, default 100-epoch budget,
  * `test_regression.py` CLI: condition on n_support=5 of 19 points of a
    random test person, MSE over all 19, repeated n_test_epochs times
    (reference test_regression.py:30-39).

The faces are drawn so the label is genuinely visual (head ellipse rises
with pitch, pupils track the yaw angle, per-person texture/geometry
noise), so a model must regress pose from pixels — same task shape as
real QMUL, different pixels, so the absolute MSE is recorded next to (not
compared against) the paper's ~0.10.

Writes qmul_synthetic_* entries into benchmarks/report.json.
Usage: python benchmarks/paper_protocol.py [--epochs N] [--spectral]
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


def render_face(person_seed: int, pitch: int, angle: int, size: int = 100):
    """Deterministic synthetic 'face': pose is visually encoded."""
    rng = np.random.RandomState(person_seed * 7919 + pitch * 131 + angle)
    prng = np.random.RandomState(person_seed)
    img = np.full((size, size, 3), 60 + prng.randint(0, 60), np.float32)
    img += rng.randn(size, size, 3) * 8  # sensor noise
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)

    # head ellipse: vertical centre tracks pitch, slight per-person shape
    cy = size * (0.70 - 0.40 * pitch / 120.0) + prng.randn() * 2
    cx = size * 0.5 + prng.randn() * 2
    ry = size * (0.28 + 0.02 * prng.rand())
    rx = size * (0.20 + 0.02 * prng.rand())
    head = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
    skin = 150 + prng.randint(0, 60)
    img[head] = [skin, skin * 0.85, skin * 0.7]

    # pupils: horizontal offset tracks the yaw angle
    off = (angle - 90.0) / 90.0 * rx * 0.45
    for side in (-1, 1):
        ex = cx + side * rx * 0.45 + off
        ey = cy - ry * 0.15
        eye = (yy - ey) ** 2 + (xx - ex) ** 2 <= (size * 0.025) ** 2
        img[eye] = 20
    return np.clip(img, 0, 255).astype(np.uint8)


def make_synthetic_qmul(root: str, size: int = 100) -> None:
    from deep_kernel_transfer_tpu.data import qmul

    img_dir = os.path.join(root, "filelists", "QMUL", "images")
    done_marker = os.path.join(img_dir, ".complete")
    if os.path.exists(done_marker):
        return
    people = qmul.train_people + qmul.test_people
    for pi, person in enumerate(people):
        d = os.path.join(img_dir, person)
        os.makedirs(d, exist_ok=True)
        for pitch in range(0, 130, 10):
            for angle in range(0, 190, 10):
                name = (f"{person[:-4]}_{qmul._num_to_str(pitch)}"
                        f"_{qmul._num_to_str(angle)}.jpg")
                arr = render_face(pi, pitch, angle, size)
                Image.fromarray(arr).save(os.path.join(d, name), quality=92)
        print(f"[{pi + 1}/{len(people)}] {person}", flush=True)
    open(done_marker, "w").close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--spectral", action="store_true")
    ap.add_argument("--root", default="/tmp/_paper_qmul")
    args = ap.parse_args()

    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "report.json")
    t0 = time.time()
    make_synthetic_qmul(args.root)
    print(f"dataset ready in {time.time() - t0:.0f}s")

    os.chdir(args.root)
    import test_regression as test_cli
    import train_regression as train_cli

    flags = ["--method=DKT", "--seed=1", f"--stop_epoch={args.epochs}"]
    if args.spectral:
        flags.append("--spectral")
    t0 = time.time()
    train_cli.main(flags)
    train_s = time.time() - t0
    mse, std = test_cli.main(["--method=DKT", "--seed=1",
                              "--n_test_epochs=10", "--n_support=5"]
                             + (["--spectral"] if args.spectral else []))

    kernel = "spectral" if args.spectral else "rbf"
    with open(report_path) as f:
        report = json.load(f)
    report[f"qmul_synthetic_dkt_{kernel}_mse"] = round(mse, 4)
    report[f"qmul_synthetic_dkt_{kernel}_mse_std"] = round(std, 4)
    report[f"qmul_synthetic_{kernel}_train_s"] = round(train_s, 1)
    report["qmul_paper_target_real_data_mse"] = 0.10  # BASELINE.md (real QMUL)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if "qmul" in k}))


if __name__ == "__main__":
    main()
