"""EMNIST inversion — reference filelists/emnist/invert_emnist.py: the 62
class folders (named '0'..'61') are copied to inv_emnist/ with pixel
values inverted (omniglot is black-on-white; EMNIST is white-on-black)."""
import os
from os import listdir
from os.path import isfile, join

import PIL.ImageOps
from PIL import Image


def invert_all(data_path: str, inv_data_path: str, n_classes: int = 62):
    os.makedirs(inv_data_path, exist_ok=True)
    for character in (str(i) for i in range(n_classes)):
        src = join(data_path, character)
        dst = join(inv_data_path, character)
        os.makedirs(dst, exist_ok=True)
        for img in listdir(src):
            if isfile(join(src, img)) and img[0] != ".":
                PIL.ImageOps.invert(Image.open(join(src, img))).save(
                    join(dst, img))


if __name__ == "__main__":
    cwd = os.getcwd()
    invert_all(join(cwd, "emnist"), join(cwd, "inv_emnist"))
