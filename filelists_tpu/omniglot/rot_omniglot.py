"""Omniglot 4x rotation augmentation — reference
filelists/omniglot/rot_omniglot.py:29-37: every character folder gets
rot000/rot090/rot180/rot270 subfolders with rotated copies."""
import os
from os import listdir
from os.path import isdir, isfile, join

from PIL import Image


def rotate_all(data_path: str) -> None:
    for language in sorted(f for f in listdir(data_path)
                           if isdir(join(data_path, f))):
        lang_path = join(data_path, language)
        for character in sorted(cf for cf in listdir(lang_path)
                                if isdir(join(lang_path, cf))):
            char_path = join(lang_path, character)
            images = [img for img in listdir(char_path)
                      if isfile(join(char_path, img)) and img[0] != "."]
            for deg in (0, 90, 180, 270):
                rot_path = join(char_path, f"rot{deg:03d}")
                print(rot_path)
                os.makedirs(rot_path, exist_ok=True)
                for img in images:
                    Image.open(join(char_path, img)).rotate(deg).save(
                        join(rot_path, img))


if __name__ == "__main__":
    rotate_all(join(os.getcwd(), "images"))
