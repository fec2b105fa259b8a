"""QMUL prep — reference filelists/QMUL/write_QMUL_filelist.py: convert the
Set1_Greyscale .ras images to RGB jpgs under images/<person>/, then write
base/val/novel.json labelled with the reference's split('_')[-1] law
(write_QMUL_filelist.py:62-72). NOTE: for {person}_{pitch}_{angle}.jpg
filenames that last segment is the ANGLE, not the pitch — the reference
does the same, and these jsons are reference-format artifacts only: the
regression pipeline (data/qmul.py get_person_at_curve) parses pitch
targets from filenames itself and never reads them. The 'ras' substring
match/replace below is likewise the reference's own law, kept verbatim."""
import os
import sys
from os import listdir
from os.path import isdir, isfile, join

from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import folder_split_filelists  # noqa: E402


def convert_ras_to_jpg(src_root: str, dst_root: str) -> None:
    folders = sorted(f for f in listdir(src_root) if isdir(join(src_root, f)))
    for folder in folders:
        os.makedirs(join(dst_root, folder), exist_ok=True)
        for cf in listdir(join(src_root, folder)):
            path = join(src_root, folder, cf)
            if isfile(path) and cf[0] != "." and "ras" in cf:
                Image.open(path).convert("RGB").save(
                    join(dst_root, folder, cf.replace("ras", "jpg")))


def reference_suffix_label(_i: int, path: str) -> int:
    """The reference's label law: last '_' segment (the angle; see module
    docstring — kept for byte-level parity, not used by the pipeline)."""
    return int(path.split("_")[-1].replace(".jpg", ""))


if __name__ == "__main__":
    cwd = os.getcwd()
    convert_ras_to_jpg(
        join(cwd, "QMUL_360degreeViewSphere_FaceDatabase", "Set1_Greyscale"),
        join(cwd, "images"))
    folder_split_filelists(
        join(cwd, "images"), cwd,
        {"base": lambda i: i % 2 == 0,
         "val": lambda i: i % 4 == 1,
         "novel": lambda i: i % 4 == 3},
        label_fn=reference_suffix_label)
