"""Omniglot Vinyals-split writer — reference
filelists/omniglot/write_omniglot_filelist.py:25-31: train/val/test.txt
list `Language/character/rotXXX` class paths; each becomes one class with
all its images."""
import os
import random
import sys
from os import listdir
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import write_filelist_json  # noqa: E402


def main(data_path=None, savedir="./", seed=None):
    data_path = data_path or join(os.getcwd(), "images")
    rng = random.Random(seed)
    datasetmap = {"base": "train", "val": "val", "novel": "test"}
    folderlist = []
    cl = -1
    for dataset, split in datasetmap.items():
        names, labels = [], []
        with open(join(savedir, split + ".txt")) as lines:
            class_dirs = [line.strip() for line in lines if line.strip()]
        for label in class_dirs:
            folderlist.append(label)
            cl += 1
            files = [join(data_path, label, f)
                     for f in listdir(join(data_path, label))]
            rng.shuffle(files)
            names.extend(files)
            labels.extend([cl] * len(files))
        write_filelist_json(join(savedir, dataset + ".json"), folderlist,
                            names, labels)


if __name__ == "__main__":
    main()
