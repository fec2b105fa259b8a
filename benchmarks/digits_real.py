"""Real-image few-shot benchmarks: sklearn's bundled handwritten digits.

The paper's image benchmarks (BASELINE.md) need datasets this zero-egress
environment cannot download. The ONE real image dataset shipped offline in
this image is scikit-learn's `load_digits` — 1,797 genuine 8x8 handwritten
digits (a UCI/NIST-derived test set). This script turns it into TWO
real-data few-shot benchmarks with the reference's omniglot protocol
shape (28px grayscale, Conv4S, 5-way, n_query=15, 600-episode eval with
95% CI, multi-seed repeats — reference test.py:65,142,174):

Default (within-digits split):
  * base split   = digit classes 0-4 (~900 images),
  * novel split  = digit classes 5-9 (disjoint classes, never seen),
  * val split    = base classes (model selection cannot leak novel data),
  * images bicubic-upsampled 8x8 -> 28x28, saved as grayscale JPEGs through
    the standard filelist pipeline (data/filelist.py) — the full production
    path, not an array shortcut.

--cross (cross-domain, the cross_char analog): base = 200 SYNTHETIC
stroke-glyph classes (random Bezier-stroke "characters", white-on-black
like the digits, with per-image affine + noise jitter — the same
many-base-class, character-like regime as the reference's
omniglot->EMNIST cross_char), and — exactly like the reference's EMNIST
even/odd treatment (filelists/emnist/write_cross_char_valnovel_filelist
.py:30-37) — the target domain is split by class parity: val = EVEN real
digits {0,2,4,6,8}, novel = ODD real digits {1,3,5,7,9}. Model selection
sees the domain shift (target-domain val) without ever seeing a novel
class; no odd digit appears anywhere in training. (A val split drawn
from the glyph base instead was measured to MIS-SELECT: base accuracy
saturates within epochs while digit transfer quietly degrades — 61.5%
full-budget vs 68.1% after 2 epochs — which is precisely why the
reference validates cross-domain runs on target-domain classes.)

Neither is a paper-parity number (the paper never ran this dataset); they
are honest evidence that the framework *learns on real images* end-to-end
through its CLIs. A 5-way random-guess floor is 20%.

Writes digits_real_* / digits_cross_* entries into benchmarks/report.json.
Usage: python benchmarks/digits_real.py [--cross] [--methods DKT,protonet]
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
    """Write the omniglot-layout filelist dataset from sklearn digits.
    Image generation is memoised via a sentinel; the split JSONs are
    rewritten unconditionally so switching a --root between modes (or
    changing split logic) can never leave stale layouts behind."""
    from sklearn.datasets import load_digits

    root = os.path.abspath(root)  # paths go into JSONs; cwd changes later
    img_dir = os.path.join(root, "filelists", "omniglot", "images")
    done = os.path.join(img_dir, ".complete")
    X, y = load_digits(return_X_y=True)  # (1797, 64) float 0..16, labels 0..9
    names = [os.path.join(img_dir, f"d{cl}_{i}.jpg")
             for i, cl in enumerate(y)]
    if not os.path.exists(done):
        os.makedirs(img_dir, exist_ok=True)
        for p, row in zip(names, X):
            arr = (row.reshape(8, 8) / 16.0 * 255.0).round().astype(np.uint8)
            img = Image.fromarray(arr, mode="L").resize((28, 28),
                                                        Image.BICUBIC)
            img.save(p, quality=95)
        open(done, "w").close()
        print(f"digits dataset ready: {len(names)} images -> {img_dir}")
    names_np, labels_np = np.asarray(names), np.asarray(y)

    def split_json(classes, path):
        mask = np.isin(labels_np, classes)
        with open(path, "w") as f:
            json.dump({
                "label_names": [f"digit_{c}" for c in range(10)],
                "image_names": names_np[mask].tolist(),
                "image_labels": [int(c) for c in labels_np[mask]],
            }, f)

    fl = os.path.join(root, "filelists", "omniglot")
    split_json(range(0, 5), os.path.join(fl, "base.json"))
    split_json(range(0, 5), os.path.join(fl, "val.json"))  # no novel leakage
    split_json(range(5, 10), os.path.join(fl, "novel.json"))


def _render_glyph_class(rng: np.ndarray, n_img: int) -> list:
    """n_img 28x28 uint8 images of one synthetic stroke-glyph class:
    2-4 quadratic Bezier strokes, jittered per image (small affine +
    stroke-point noise), white-on-black like load_digits ink."""
    from PIL import Image, ImageDraw

    n_strokes = rng.randint(2, 5)
    # class identity: stroke control points on a 20x20 box (28px canvas)
    strokes = rng.rand(n_strokes, 3, 2) * 20 + 4
    out = []
    for _ in range(n_img):
        img = Image.new("L", (28, 28), 0)
        draw = ImageDraw.Draw(img)
        ang = rng.randn() * 0.12
        rot = np.array([[np.cos(ang), -np.sin(ang)],
                        [np.sin(ang), np.cos(ang)]])
        scale = 1.0 + rng.randn() * 0.08
        shift = rng.randn(2) * 1.2
        for s in strokes:
            p = s + rng.randn(3, 2) * 0.6  # stroke-point jitter
            p = (p - 14) @ rot.T * scale + 14 + shift
            t = np.linspace(0, 1, 12)[:, None]
            pts = ((1 - t) ** 2 * p[0] + 2 * t * (1 - t) * p[1]
                   + t ** 2 * p[2])
            draw.line([tuple(q) for q in pts], fill=255,
                      width=int(rng.randint(2, 4)))
        arr = np.asarray(img, np.uint8)
        noise = (rng.rand(28, 28) * 40).astype(np.uint8)
        out.append(np.maximum(arr, noise))
    return out


def make_cross_filelists(root: str, n_classes: int = 200,
                         n_img: int = 20) -> None:
    """Cross-domain layout: base = synthetic stroke glyphs; target-domain
    digits split by class parity like the reference's EMNIST treatment
    (val = even digits, novel = odd digits — reference
    filelists/emnist/write_cross_char_valnovel_filelist.py:30-37)."""
    from PIL import Image

    root = os.path.abspath(root)
    make_digits_filelists(root)  # digit images (+ digit splits, replaced below)
    fl = os.path.join(root, "filelists", "omniglot")
    img_dir = os.path.join(fl, "glyphs")
    done = os.path.join(img_dir, f".complete_{n_classes}x{n_img}")
    names = [os.path.join(img_dir, f"g{cl}_{i}.jpg")
             for cl in range(n_classes) for i in range(n_img)]
    labels = [cl for cl in range(n_classes) for _ in range(n_img)]
    if not os.path.exists(done):  # sentinel gates only image generation
        os.makedirs(img_dir, exist_ok=True)
        rng = np.random.RandomState(11)
        it = iter(names)
        for cl in range(n_classes):
            for arr in _render_glyph_class(rng, n_img):
                Image.fromarray(arr, mode="L").save(next(it), quality=95)
        open(done, "w").close()
        print(f"glyph base ready: {len(names)} images -> {img_dir}")
    with open(os.path.join(fl, "base.json"), "w") as f:
        json.dump({"label_names": [f"glyph_{c}" for c in range(n_classes)],
                   "image_names": names, "image_labels": labels}, f)
    # target domain split by parity: val = even digits, novel = odd digits
    from sklearn.datasets import load_digits

    _, y = load_digits(return_X_y=True)
    dig_dir = os.path.join(fl, "images")
    dnames = np.asarray([os.path.join(dig_dir, f"d{cl}_{i}.jpg")
                         for i, cl in enumerate(y)])
    for split, parity in (("val", 0), ("novel", 1)):
        mask = (y % 2) == parity
        with open(os.path.join(fl, f"{split}.json"), "w") as f:
            json.dump({"label_names": [f"digit_{c}" for c in range(10)],
                       "image_names": dnames[mask].tolist(),
                       "image_labels": [int(c) for c in y[mask]]}, f)


ZOO = ("protonet,DKT,matchingnet,relationnet,relationnet_softmax,"
       "baseline,baseline++,maml_approx,maml")


def maml_budget_epochs(shot: int) -> int:
    """MAML CLI --stop_epoch giving EPISODE-COUNT parity with the other
    methods' reference budgets (60k episodes 1-shot / 40k 5-shot).

    The reference multiplies stop_epoch by n_task (train.py:163-167), which
    on character data (n_task=32) turns the 600-epoch default into 1.92M
    episodes — a budget the paper itself never ran and that a 5-base-class
    split saturates within a fraction of. train.py applies the same x
    n_task multiplication and runs ~128 episodes/epoch (4 accumulation
    batches of 32), so stop_epoch=15 -> 61,440 episodes (~= the 60,000 the
    other methods get) and stop_epoch=10 -> 40,960 (~= 40,000)."""
    return 15 if shot == 1 else 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="DKT,protonet",
                    help=f"comma list, or 'zoo' = {ZOO}")
    ap.add_argument("--shots", default="1,5")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=-1,
                    help="-1 = the reference's default budget per method/shots")
    ap.add_argument("--cross", action="store_true",
                    help="cross-domain: synthetic glyph base, real-digit novel")
    ap.add_argument("--dkt_variants", action="store_true",
                    help="also evaluate DKT --laplace and --adaptation heads "
                         "from the trained DKT checkpoint")
    ap.add_argument("--skip_existing", action="store_true",
                    help="skip configs whose _acc row is already in report.json")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()
    if args.methods == "zoo":
        args.methods = ZOO
    root = args.root or ("/tmp/_digits_cross" if args.cross
                         else "/tmp/_digits_real")

    report_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "report.json")
    if args.cross:
        make_cross_filelists(root)
    else:
        make_digits_filelists(root)
    os.chdir(root)

    import save_features as sf_cli
    import test as test_cli
    import train as train_cli

    if args.cross:
        protocol = (
            "cross-domain cross_char analog: base = 200 synthetic "
            "stroke-glyph classes x 20 imgs (Bezier strokes, affine+noise "
            "jitter); target digits split by parity like the reference's "
            "EMNIST treatment — val = EVEN real digits, novel = ODD real "
            "digits (sklearn load_digits; no odd digit ever seen in "
            "training); reference omniglot protocol (Conv4S 28px, "
            "n_query=15, 600-episode eval, multi-seed); floor 20%")
    else:
        protocol = (
            "sklearn load_digits (1797 real 8x8 handwritten digits) -> 28px "
            "grayscale jpgs; base=digits 0-4, novel=digits 5-9 (disjoint), "
            "val=base; reference omniglot protocol (Conv4S, n_query=15, "
            "600-episode eval, multi-seed); random-guess floor 20%")
    tag = "digits_cross" if args.cross else "digits_real"

    def record(update: dict) -> None:
        # merge after EVERY config so an interrupted sweep keeps its
        # completed results (the sweep itself resumes via --resume)
        with open(report_path) as f:
            report = json.load(f)
        report.update(update)
        report[f"{tag}_protocol"] = protocol
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)

    with open(report_path) as f:
        existing = json.load(f)

    def eval_and_record(key: str, test_args: list, train_s: float,
                        label: str) -> None:
        # across-seed spread is recorded alongside the episode-level CI:
        # <key>_ci95 is the mean per-run 1.96*std/sqrt(n_iter) (reference
        # test.py:174), <key>_seed_std the std of the --repeat per-seed
        # accuracies — a different, usually wider statistic
        acc, ci, runs = test_cli.main(test_args, return_runs=True)
        entry = {f"{key}_acc": round(acc, 2),
                 f"{key}_ci95": round(ci, 2),
                 f"{key}_seed_std": round(float(np.std(runs)), 2)}
        if train_s is not None:
            entry[f"{key}_train_s"] = round(train_s, 1)
        record(entry)
        print(f"== {label}: {acc:.2f}% +- {ci:.2f}% (seed std "
              f"{np.std(runs):.2f})"
              + (f" (train {train_s:.0f}s)" if train_s else ""))

    trained: set = set()  # baseline ckpt/features are shot-independent
    for method in args.methods.split(","):
        for shot in (int(s) for s in args.shots.split(",")):
            key = f"{tag}_{method.lower()}_5way_{shot}shot"
            # --skip_existing skips per-row, not per-config: the plain row
            # may exist while the --dkt_variants rows don't — then the
            # variants still run, eval-only, from the checkpoint already in
            # --root (no retrain; a missing checkpoint is a usage error).
            need_plain = not (args.skip_existing and f"{key}_acc" in existing)
            want_variants = method == "DKT" and args.dkt_variants
            need_variants = want_variants and not (
                args.skip_existing
                and f"{tag}_dkt_laplace_5way_{shot}shot_acc" in existing
                and f"{tag}_dkt_adaptation_5way_{shot}shot_acc" in existing)
            if not need_plain and not need_variants:
                print(f"-- skip {key} (already in report.json)")
                continue
            common = ["--dataset=omniglot", "--model=Conv4",
                      "--train_n_way=5", "--test_n_way=5",
                      f"--n_shot={shot}", "--seed=1", f"--method={method}"]
            is_baseline = method in ("baseline", "baseline++")
            epochs = args.epochs
            if epochs == -1 and method in ("maml", "maml_approx"):
                epochs = maml_budget_epochs(shot)
            # the baseline pretrain checkpoint has no way/shot in its path
            # (factory.checkpoint_dir) — train + embed once per method
            train_s = None
            if need_plain and not (is_baseline and method in trained):
                t0 = time.time()
                # --resume: an interrupted run (TPU tunnel outage) continues
                # from its last save_freq checkpoint on re-invocation; a
                # fresh config starts from scratch (no checkpoint yet).
                # Protocol changes need a fresh --root.
                train_cli.main(
                    common + ["--resume"]
                    + ([f"--stop_epoch={epochs}"] if epochs != -1 else [])
                    # base-class head sized by the reference's omniglot rule
                    # (factory.build_method num_classes assert); digits only
                    # populates ids 0-4 of it
                    + (["--num_classes=4112"] if is_baseline else []))
                train_s = time.time() - t0
                if method not in ("DKT", "maml", "maml_approx"):
                    sf_cli.main(common + ["--split=novel"])
                trained.add(method)
            if need_plain:
                eval_and_record(key, common + [f"--repeat={args.repeat}"],
                                train_s, f"{method} {shot}-shot")
            if need_variants:
                # eval-only heads from the same checkpoint (reference
                # test.py --laplace / --adaptation, methods/DKT.py:207-256)
                eval_and_record(
                    f"{tag}_dkt_laplace_5way_{shot}shot",
                    common + [f"--repeat={args.repeat}", "--laplace"],
                    None, f"DKT+laplace {shot}-shot")
                eval_and_record(
                    f"{tag}_dkt_adaptation_5way_{shot}shot",
                    common + [f"--repeat={args.repeat}", "--adaptation"],
                    None, f"DKT+adaptation {shot}-shot")
    with open(report_path) as f:
        final = json.load(f)
    print(json.dumps({k: v for k, v in final.items()
                      if k.startswith(tag)}))


if __name__ == "__main__":
    main()
