"""Shared dataset-prep helpers — the writer core behind every
write_*_filelist script (reference filelists/*/write_*.py all repeat this
logic with hand-rolled JSON emission; here it is one json.dump)."""
from __future__ import annotations

import json
import os
import random
from os import listdir
from os.path import isdir, isfile, join


def write_filelist_json(path: str, label_names, image_names, image_labels):
    """base/val/novel.json schema consumed by data.filelist.FileListMeta
    (reference filelists/omniglot/write_omniglot_filelist.py:38-57)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"label_names": list(label_names),
                   "image_names": list(image_names),
                   "image_labels": [int(x) for x in image_labels]}, f)
    print(f"{os.path.basename(path)} -OK")


def list_class_folders(data_path: str):
    folders = [f for f in listdir(data_path) if isdir(join(data_path, f))]
    folders.sort()
    return folders


def list_class_files(folder_path: str, ext: str | None = None):
    files = [join(folder_path, cf) for cf in listdir(folder_path)
             if isfile(join(folder_path, cf)) and cf[0] != "."
             and (ext is None or cf.endswith(ext))]
    return files


def folder_split_filelists(data_path: str, savedir: str, split_rules,
                           seed: int | None = None,
                           label_fn=None, ext: str | None = None):
    """CUB-style writer: class folders split by index rule
    (reference filelists/CUB/write_CUB_filelist.py:22-44: base = i%2==0,
    val = i%4==1, novel = i%4==3).

    split_rules: {split_name: predicate(i)}. label_fn(i, path) -> int label
    (default: the class index)."""
    rng = random.Random(seed)
    folders = list_class_folders(data_path)
    class_files = []
    for folder in folders:
        files = list_class_files(join(data_path, folder), ext)
        rng.shuffle(files)
        class_files.append(files)

    for split, rule in split_rules.items():
        names, labels = [], []
        for i, files in enumerate(class_files):
            if not rule(i):
                continue
            names.extend(files)
            if label_fn is None:
                labels.extend([i] * len(files))
            else:
                labels.extend(label_fn(i, p) for p in files)
        write_filelist_json(join(savedir, f"{split}.json"), folders, names,
                            labels)
