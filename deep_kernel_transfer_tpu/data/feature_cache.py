"""HDF5 feature cache — rebuild of reference save_features.py:20-41 +
data/feature_loader.py:24-44, keeping the SAME on-disk layout
({all_feats, all_labels, count}) so caches interoperate."""
from __future__ import annotations

from collections import defaultdict

import numpy as np

try:
    import h5py

    HAS_H5PY = True
except ImportError:  # pragma: no cover - h5py is present in this image
    HAS_H5PY = False


def save_features(out_path: str, feats: np.ndarray, labels: np.ndarray):
    """Write {all_feats [N, D], all_labels [N], count} (reference
    save_features.py:20-41 writes incrementally; the arrays here are already
    assembled on host)."""
    if not HAS_H5PY:
        np.savez(out_path, all_feats=feats, all_labels=labels, count=len(labels))
        return
    with h5py.File(out_path, "w") as f:
        f.create_dataset("all_feats", data=feats)
        f.create_dataset("all_labels", data=labels)
        f.create_dataset("count", data=np.asarray(len(labels)))


def init_loader(path: str) -> dict[int, list[np.ndarray]]:
    """Read the cache into {class: [feat, ...]}, trimming any zero-padded
    tail via count (reference data/feature_loader.py:24-44)."""
    if HAS_H5PY and h5py.is_hdf5(path):
        with h5py.File(path, "r") as f:
            feats = f["all_feats"][...]
            labels = f["all_labels"][...]
            count = int(np.asarray(f["count"]))
    else:
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        feats, labels, count = z["all_feats"], z["all_labels"], int(z["count"])
    feats, labels = feats[:count], labels[:count]
    cl_data: dict[int, list[np.ndarray]] = defaultdict(list)
    for feat, label in zip(feats, labels):
        cl_data[int(label)].append(feat)
    return dict(cl_data)


def sample_feature_episode(
    cl_data: dict[int, list[np.ndarray]],
    rng: np.random.RandomState,
    n_way: int,
    n_support: int,
    n_query: int,
) -> np.ndarray:
    """[n_way, S+Q, D] episode from cached class features (reference
    test.py:39-50 feature_evaluation's sampling)."""
    classes = rng.permutation(sorted(cl_data.keys()))[:n_way]
    k = n_support + n_query
    z = []
    for cl in classes:
        feats = cl_data[int(cl)]
        # sample with replacement only when a class is too small (mirrors
        # EpisodicDataLoader; the reference assumes big-enough classes)
        idx = (rng.permutation(len(feats))[:k] if len(feats) >= k
               else rng.choice(len(feats), k, replace=True))
        z.append(np.stack([np.squeeze(feats[i]) for i in idx]))
    return np.stack(z).astype(np.float32)
