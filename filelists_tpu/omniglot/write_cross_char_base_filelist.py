"""cross_char base writer — reference
filelists/omniglot/write_cross_char_base_filelist.py:25-27: noLatin.json =
every language EXCEPT Latin, one class per character folder, original
(non-rotated) pngs only."""
import os
import random
import sys
from os import listdir
from os.path import isdir, isfile, join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import write_filelist_json  # noqa: E402


def main(data_path=None, savedir="./", seed=None):
    data_path = data_path or join(os.getcwd(), "images")
    rng = random.Random(seed)
    folderlist, names, labels = [], [], []
    cl = -1
    for language in sorted(f for f in listdir(data_path)
                           if isdir(join(data_path, f))):
        if language == "Latin":
            continue
        lang_path = join(data_path, language)
        for character in sorted(cf for cf in listdir(lang_path)
                                if isdir(join(lang_path, cf))):
            char_path = join(lang_path, character)
            label = join(language, character)
            folderlist.append(label)
            cl += 1
            files = [join(char_path, img) for img in listdir(char_path)
                     if isfile(join(char_path, img)) and img.endswith("png")]
            rng.shuffle(files)
            names.extend(files)
            labels.extend([cl] * len(files))
    write_filelist_json(join(savedir, "noLatin.json"), folderlist, names,
                        labels)


if __name__ == "__main__":
    main()
