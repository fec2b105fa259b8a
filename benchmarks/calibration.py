"""Measured calibration study — the paper's core uncertainty claim.

Runs the rebuilt test_uncertainty.py CLI (reference test_uncertainty.py:
228-263) end-to-end on the real-image digits benchmarks for the method zoo:
15-bin ECE BEFORE (T=1) and AFTER temperature scaling, over --repeat
reseeded 600-episode collections, using the checkpoints + feature caches
produced by benchmarks/digits_real.py (run that first).

Writes {tag}_ece_{method}_{shot}shot_{raw,raw_std,cal,cal_std,temp,acc}
rows into benchmarks/report.json, where tag is digits_real or digits_cross.

Usage: python benchmarks/calibration.py [--cross]
           [--methods DKT,protonet,matchingnet,baseline++,maml]
           [--shots 1,5] [--repeat 3] [--root DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from digits_real import make_cross_filelists, make_digits_filelists  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="DKT,protonet,matchingnet,"
                                         "baseline++,maml")
    ap.add_argument("--shots", default="1,5")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--episode_batch", type=int, default=32)
    ap.add_argument("--cross", action="store_true")
    ap.add_argument("--skip_existing", action="store_true")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    root = args.root or ("/tmp/_digits_cross" if args.cross
                         else "/tmp/_digits_real")
    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "report.json")
    if args.cross:
        make_cross_filelists(root)
    else:
        make_digits_filelists(root)
    os.chdir(root)

    import test_uncertainty as tu_cli

    tag = "digits_cross" if args.cross else "digits_real"
    with open(report_path) as f:
        existing = json.load(f)

    def record(update: dict) -> None:
        with open(report_path) as f:
            report = json.load(f)
        report.update(update)
        report[f"{tag}_ece_protocol"] = (
            "15-bin ECE over --repeat reseeded 600-episode collections on "
            "the novel split (n_query=15), temperature fitted by Adam-on-NLL "
            "on a held-out collection (reference test_uncertainty.py "
            "protocol); raw = T=1, cal = fitted T; DKT logits are one-vs-"
            "rest sigmoid-normalised (reference test_uncertainty.py:78-81)")
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)

    for method in args.methods.split(","):
        for shot in (int(s) for s in args.shots.split(",")):
            key = f"{tag}_ece_{method.lower()}_{shot}shot"
            if args.skip_existing and f"{key}_raw" in existing:
                print(f"-- skip {key} (already in report.json)")
                continue
            out = tu_cli.main([
                "--dataset=omniglot", "--model=Conv4", "--train_n_way=5",
                "--test_n_way=5", f"--n_shot={shot}", "--seed=1",
                f"--method={method}", f"--repeat={args.repeat}",
                f"--episode_batch={args.episode_batch}"])
            record({f"{key}_raw": round(out["ece_raw"], 4),
                    f"{key}_raw_std": round(out["ece_raw_std"], 4),
                    f"{key}_cal": round(out["ece_cal"], 4),
                    f"{key}_cal_std": round(out["ece_cal_std"], 4),
                    f"{key}_temp": round(out["temperature"], 3),
                    f"{key}_acc": round(out["acc"], 2)})
            print(f"== {method} {shot}-shot: ECE raw {out['ece_raw']:.4f} "
                  f"-> cal {out['ece_cal']:.4f} (T={out['temperature']:.2f})")


if __name__ == "__main__":
    main()
