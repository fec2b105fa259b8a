"""End-to-end train.py throughput — the REAL user path, not the bare step.

Builds a synthetic 84px filelist dataset, then runs the actual train.py
main() (DKT + Conv4 + bncossim, --device_data on, episode batch 16): HBM
staging, on-device episode sampling + augmentation, the jitted sharded
train step, per-print_freq telemetry, the per-epoch validation test_loop,
and checkpointing — everything a real run pays for. One cold epoch warms
the jit caches; the measured pass then re-runs main() for N_EPOCHS and
reports trained episodes / wall second (validation + checkpoint overhead
INCLUDED). Writes train_cli_e2e_eps_per_sec into benchmarks/report.json.

Usage: python benchmarks/train_cli_e2e.py   (real TPU, ~5 min)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CLASSES, N_IMG, HW = 30, 40, 84
N_EPISODES, N_EPOCHS = 200, 8


def make_dataset(root: str) -> None:
    from PIL import Image

    img_dir = os.path.join(root, "filelists", "CUB", "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    names, labels = [], []
    for cl in range(N_CLASSES):
        for i in range(N_IMG):
            arr = (rng.rand(HW, HW, 3) * 70).astype(np.uint8)
            r, c = divmod(cl % 9, 3)
            arr[r * 25:r * 25 + 20, c * 25:c * 25 + 20, :] += 150
            p = os.path.join(img_dir, f"c{cl}_{i}.jpg")
            Image.fromarray(arr).save(p, quality=90)
            names.append(p)
            labels.append(cl)
    meta = {"label_names": [f"c{i}" for i in range(N_CLASSES)],
            "image_names": names, "image_labels": labels}
    for split in ("base", "val"):
        with open(os.path.join(root, "filelists", "CUB", f"{split}.json"),
                  "w") as f:
            json.dump(meta, f)


def main():
    import jax

    # persistent executable cache: re-runs of this script skip the ~10 min
    # cold XLA compile (same mechanism as tests/conftest.py)
    jax.config.update("jax_compilation_cache_dir", "/tmp/_bench_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import train as train_cli

    root = "/tmp/_bench_train_cli"
    if not os.path.isdir(os.path.join(root, "filelists", "CUB", "images")):
        make_dataset(root)
    cwd = os.getcwd()
    os.chdir(root)
    args = ["--dataset=CUB", "--model=Conv4", "--method=DKT",
            "--train_n_way=5", "--test_n_way=5", "--n_shot=5", "--seed=1",
            "--train_aug", "--device_data=on", "--episode_batch=16",
            f"--n_train_episodes={N_EPISODES}", "--save_freq=1000"]
    # Difference method: each main() call rebuilds the model (a fresh jit
    # cache entry), so a single run mixes trace/compile time into the
    # epochs. Timing a 1-epoch and an N-epoch run and differencing cancels
    # the per-run fixed cost, leaving pure steady-state epoch time.
    try:
        t0 = time.perf_counter()
        train_cli.main(args + ["--stop_epoch=1"])            # cold compiles
        cold_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        train_cli.main(args + ["--stop_epoch=1"])            # fixed cost
        one_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        train_cli.main(args + [f"--stop_epoch={1 + N_EPOCHS}"])
        many_s = time.perf_counter() - t0
    finally:
        os.chdir(cwd)
    epoch_s = (many_s - one_s) / N_EPOCHS
    eps = N_EPISODES / epoch_s
    out = {"train_cli_e2e_eps_per_sec": round(eps, 1),
           "train_cli_cold_first_epoch_s": round(cold_s, 1),
           "train_cli_fixed_overhead_s": round(one_s - epoch_s, 1),
           "train_cli_warm_epoch_s": round(epoch_s, 2)}
    rep_path = os.path.join(REPO, "benchmarks", "report.json")
    rep = json.load(open(rep_path))
    rep.update(out)
    json.dump(rep, open(rep_path, "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
