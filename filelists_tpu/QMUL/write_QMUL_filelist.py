"""QMUL prep — reference filelists/QMUL/write_QMUL_filelist.py: convert the
Set1_Greyscale .ras images to RGB jpgs under images/<person>/, then write
base/val/novel.json where the label of each image is its PITCH (parsed from
the filename suffix, write_QMUL_filelist.py:62-72)."""
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


def pitch_label(_i: int, path: str) -> int:
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
        label_fn=pitch_label)
