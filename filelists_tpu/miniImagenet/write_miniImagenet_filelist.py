"""miniImagenet writer — reference
filelists/miniImagenet/write_miniImagenet_filelist.py:26-40: train/val/test
CSVs (fid, _, class) index into the ILSVRC train directory whose files are
sorted by their numeric suffix; also writes all.json (base+val+novel
merged) for the cross-domain setting (write_cross_filelist.py:49-55)."""
import os
import random
import re
import sys
from os import listdir
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from common import write_filelist_json  # noqa: E402


def collect(data_path: str, savedir: str, seed=None):
    rng = random.Random(seed)
    datasetmap = {"base": "train", "val": "val", "novel": "test"}
    folderlist = []
    per_split = {}
    cl = -1
    for dataset, split in datasetmap.items():
        filelists: dict[str, list[str]] = {}
        sorted_fnames_cache: dict[str, list[str]] = {}
        with open(join(savedir, split + ".csv")) as lines:
            for i, line in enumerate(lines):
                if i == 0 or not line.strip():
                    continue
                fid, _, label = re.split(r",|\.", line)
                label = label.strip()
                if label not in filelists:
                    folderlist.append(label)
                    filelists[label] = []
                    fnames = listdir(join(data_path, label))
                    fnames.sort(key=lambda f: int(re.split(r"_|\.", f)[1]))
                    sorted_fnames_cache[label] = fnames
                fid = int(fid[-5:]) - 1
                filelists[label].append(
                    join(data_path, label, sorted_fnames_cache[label][fid]))
        names, labels = [], []
        for label, files in filelists.items():
            cl += 1
            rng.shuffle(files)
            names.extend(files)
            labels.extend([cl] * len(files))
        per_split[dataset] = (names, labels)
        write_filelist_json(join(savedir, dataset + ".json"), folderlist,
                            names, labels)
    # cross setting: all splits together (reference write_cross_filelist.py)
    all_names = sum((per_split[d][0] for d in datasetmap), [])
    all_labels = sum((per_split[d][1] for d in datasetmap), [])
    write_filelist_json(join(savedir, "all.json"), folderlist, all_names,
                        all_labels)


if __name__ == "__main__":
    collect(join(os.getcwd(), "ILSVRC2015", "Data", "CLS-LOC", "train"), "./")
