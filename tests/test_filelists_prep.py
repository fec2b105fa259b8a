"""Dataset-prep writer tests (SURVEY.md §2 component 20) on fake trees."""
import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "filelists_tpu"))

from common import folder_split_filelists, write_filelist_json  # noqa: E402


def _fake_tree(root, n_classes=8, n_img=3, ext="jpg"):
    for c in range(n_classes):
        d = root / f"class_{c:03d}"
        d.mkdir(parents=True)
        for i in range(n_img):
            Image.fromarray(
                (np.ones((8, 8, 3)) * 10 * c).astype(np.uint8)
            ).save(d / f"img_{i}.{ext}")


def test_cub_style_split(tmp_path):
    data = tmp_path / "images"
    _fake_tree(data)
    folder_split_filelists(
        str(data), str(tmp_path),
        {"base": lambda i: i % 2 == 0,
         "val": lambda i: i % 4 == 1,
         "novel": lambda i: i % 4 == 3}, seed=0)
    metas = {}
    for split in ("base", "val", "novel"):
        with open(tmp_path / f"{split}.json") as f:
            metas[split] = json.load(f)
    assert len(metas["base"]["image_names"]) == 4 * 3  # classes 0,2,4,6
    assert len(metas["val"]["image_names"]) == 2 * 3  # classes 1,5
    assert len(metas["novel"]["image_names"]) == 2 * 3  # classes 3,7
    # splits are class-disjoint
    base_labels = set(metas["base"]["image_labels"])
    val_labels = set(metas["val"]["image_labels"])
    novel_labels = set(metas["novel"]["image_labels"])
    assert not (base_labels & val_labels) and not (base_labels & novel_labels)
    assert not (val_labels & novel_labels)
    # loadable by the data pipeline
    from deep_kernel_transfer_tpu.data.filelist import FileListMeta

    meta = FileListMeta(str(tmp_path / "base.json"))
    assert len(meta.by_class()) == 4


def test_omniglot_rotation_and_writer(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "filelists_tpu", "omniglot"))
    from rot_omniglot import rotate_all
    from write_cross_char_base_filelist import main as write_nolatin

    images = tmp_path / "images"
    for lang in ("Latin", "Greek"):
        for ch in ("character01", "character02"):
            d = images / lang / ch
            d.mkdir(parents=True)
            Image.fromarray(np.zeros((8, 8), np.uint8)).save(d / "a.png")
    rotate_all(str(images))
    for deg in ("rot000", "rot090", "rot180", "rot270"):
        assert (images / "Greek" / "character01" / deg / "a.png").is_file()

    write_nolatin(str(images), str(tmp_path), seed=0)
    with open(tmp_path / "noLatin.json") as f:
        meta = json.load(f)
    assert all("Latin" not in n for n in meta["label_names"])
    assert len(meta["label_names"]) == 2  # Greek's two characters
    # only original pngs, not the rotated copies
    assert len(meta["image_names"]) == 2


def test_write_filelist_json_roundtrip(tmp_path):
    p = tmp_path / "x.json"
    write_filelist_json(str(p), ["a"], ["f1.jpg", "f2.jpg"], np.array([0, 0]))
    with open(p) as f:
        d = json.load(f)
    assert d["image_labels"] == [0, 0]


def test_digits_real_filelists(tmp_path):
    """benchmarks/digits_real.py writes a valid omniglot-layout filelist
    from sklearn's bundled digits: disjoint base/novel classes, loadable by
    the standard pipeline."""
    bench_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    sys.path.insert(0, bench_dir)
    try:
        from digits_real import make_digits_filelists
    finally:
        sys.path.remove(bench_dir)

    make_digits_filelists(str(tmp_path))
    fl = tmp_path / "filelists" / "omniglot"
    with open(fl / "base.json") as f:
        base = json.load(f)
    with open(fl / "novel.json") as f:
        novel = json.load(f)
    assert set(base["image_labels"]) == {0, 1, 2, 3, 4}
    assert set(novel["image_labels"]) == {5, 6, 7, 8, 9}
    assert len(base["image_names"]) + len(novel["image_names"]) == 1797
    img = Image.open(base["image_names"][0])
    assert img.size == (28, 28)
    # loadable through the standard episodic pipeline meta
    from deep_kernel_transfer_tpu.data.filelist import FileListMeta

    by_class = FileListMeta(str(fl / "novel.json")).by_class()
    assert len(by_class) == 5
    assert min(len(v) for v in by_class.values()) >= 16  # S+Q


def test_cross_digits_filelists(tmp_path):
    """--cross layout: synthetic glyph base; the target digit domain split
    by class parity (val = even, novel = odd — the reference's EMNIST
    even/odd treatment); glyphs are white-on-black 28px like the digits."""
    bench_dir = os.path.join(os.path.dirname(__file__), "..", "benchmarks")
    sys.path.insert(0, bench_dir)
    try:
        from digits_real import make_cross_filelists
    finally:
        sys.path.remove(bench_dir)

    make_cross_filelists(str(tmp_path), n_classes=6, n_img=4)
    fl = tmp_path / "filelists" / "omniglot"
    with open(fl / "base.json") as f:
        base = json.load(f)
    with open(fl / "val.json") as f:
        val = json.load(f)
    with open(fl / "novel.json") as f:
        novel = json.load(f)
    assert len(set(base["image_labels"])) == 6
    assert len(base["image_names"]) == 24
    assert all("glyph" in n for n in base["label_names"])
    assert set(val["image_labels"]) == {0, 2, 4, 6, 8}
    assert set(novel["image_labels"]) == {1, 3, 5, 7, 9}
    assert len(val["image_names"]) + len(novel["image_names"]) == 1797
    arr = np.asarray(Image.open(base["image_names"][0]))
    assert arr.shape[:2] == (28, 28)
    assert arr.max() > 180  # strokes are bright on a dark canvas
    assert np.median(arr) < 60


def test_qmul_writer_convert_and_label_law(tmp_path):
    """QMUL prep: .ras -> .jpg conversion + the reference's split('_')[-1]
    label law (reference filelists/QMUL/write_QMUL_filelist.py:22-72; these
    jsons are reference-format artifacts — the regression pipeline parses
    pitch itself)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "filelists_tpu", "QMUL"))
    from write_QMUL_filelist import (convert_ras_to_jpg,
                                     reference_suffix_label)

    src = tmp_path / "Set1_Greyscale"
    people = ["AdamB", "KateS"]
    pitches = ["060", "100"]
    for person in people:
        d = src / person
        d.mkdir(parents=True)
        for pitch in pitches:
            # PIL sniffs content, not extension: a PNG payload named .ras
            # stands in for Sun Raster in this read-convert-save test
            Image.fromarray(np.full((10, 10), 90, np.uint8)).save(
                d / f"{person}_{pitch}_090.ras", format="PNG")
        (d / ".hidden.ras").write_bytes(b"junk")  # dotfiles skipped

    dst = tmp_path / "images"
    convert_ras_to_jpg(str(src), str(dst))
    for person in people:
        for pitch in pitches:
            out = dst / person / f"{person}_{pitch}_090.jpg"
            assert out.is_file(), out
            assert Image.open(out).mode == "RGB"
    assert not (dst / people[0] / ".hidden.jpg").exists()

    # reference label law: LAST '_' segment (the angle — see writer docstring)
    assert reference_suffix_label(0, "AdamB_100_090.jpg") == 90

    folder_split_filelists(
        str(dst), str(tmp_path),
        {"base": lambda i: i % 2 == 0, "novel": lambda i: i % 4 == 3},
        label_fn=reference_suffix_label)
    meta = json.load(open(tmp_path / "base.json"))
    assert meta["image_labels"] == [90] * len(meta["image_names"])
    assert all(n.endswith(".jpg") for n in meta["image_names"])
