"""Checkpointing with the reference's directory/naming scheme.

The reference stores torch state_dicts at
  <ckpt_dir>/{best_model.tar, <epoch>.tar}           (train.py:57-65)
with discovery helpers get_assigned/resume/best_file (io_utils.py:66-86).
We keep the exact file naming and discovery logic; the payload is a flat
npz of the jax pytree leaves keyed by tree path (portable, no pickle).

Why npz rather than Orbax: the models here are tiny (<= 44 M params,
single-file, synchronous save at epoch boundaries) and the reference's
discovery contract is path-glob based — a flat npz keeps the exact
`.tar` names, loads with zero extra dependencies, and round-trips any
pytree (params + batch_stats + opt state) byte-for-byte. Orbax's async
multi-file checkpointing buys nothing at this scale and would break the
single-file naming the reference's tooling (and test.py) globs for.
"""
from __future__ import annotations

import glob
import io
import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_checkpoint(path: str, tree: Any, epoch: int = -1) -> None:
    """Write {'epoch', leaves...} to `path` (an .npz archive regardless of
    extension, so the reference's .tar names keep working)."""
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    buf = io.BytesIO()
    np.savez(buf, __epoch__=np.asarray(epoch), **flat)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_params_checkpoint(path: str, example_tree: Any, *,
                           method_name: str | None = None,
                           model: Any = None,
                           image_size: int | None = None) -> tuple[Any, int]:
    """load_checkpoint that ALSO accepts the reference's torch checkpoints.

    A reference user pointing our CLIs at their existing `save/checkpoints`
    tree (torch.save payloads, reference train.py:57-65) gets their trained
    weights imported transparently (utils/torch_import.py); our own npz
    payloads load as before. The torch path needs the method context
    (`method_name`, the method object, and the image size for flatten-
    permutation of feature-space heads)."""
    from .torch_import import import_method_checkpoint, is_torch_checkpoint

    if is_torch_checkpoint(path):
        if model is None or method_name is None:
            raise ValueError(
                f"{path} is a reference torch checkpoint; importing it "
                "requires the method context (method_name/model)")
        print(f"importing reference torch checkpoint {path}")
        return import_method_checkpoint(path, method_name, model,
                                        example_tree, image_size or 84)
    return load_checkpoint(path, example_tree)


def load_checkpoint(path: str, example_tree: Any) -> tuple[Any, int]:
    """Rebuild a pytree with the structure of `example_tree` from `path`."""
    with open(path, "rb") as f:
        z = np.load(io.BytesIO(f.read()), allow_pickle=False)
    epoch = int(z["__epoch__"])
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(example_tree)
    leaves = []
    for path_t, example_leaf in paths_leaves:
        key = jax.tree_util.keystr(path_t)
        if key not in z:
            raise KeyError(f"checkpoint {path} missing leaf {key}")
        arr = z[key]
        want = np.shape(example_leaf)
        if arr.shape != want:
            # permit only trivial (size-1-axis / scalar) reshapes; an
            # equal-size layout change (e.g. a transposed kernel) would be
            # silently scrambled by reshape, so it must fail loudly
            if tuple(d for d in arr.shape if d != 1) != tuple(
                    d for d in want if d != 1):
                raise ValueError(
                    f"checkpoint {path} leaf {key}: saved shape "
                    f"{arr.shape} does not match expected {want}")
            arr = arr.reshape(want)
        leaves.append(arr.astype(np.asarray(example_leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves), epoch


# -- discovery (reference io_utils.py:66-86) --------------------------------


def get_assigned_file(checkpoint_dir: str, num: int) -> str:
    return os.path.join(checkpoint_dir, f"{num}.tar")


def get_resume_file(checkpoint_dir: str) -> Optional[str]:
    filelist = glob.glob(os.path.join(checkpoint_dir, "*.tar"))
    filelist = [x for x in filelist if os.path.basename(x) != "best_model.tar"]
    if not filelist:
        return None
    epochs = [int(os.path.splitext(os.path.basename(x))[0]) for x in filelist]
    return os.path.join(checkpoint_dir, f"{max(epochs)}.tar")


def get_best_file(checkpoint_dir: str) -> Optional[str]:
    best = os.path.join(checkpoint_dir, "best_model.tar")
    if os.path.isfile(best):
        return best
    return get_resume_file(checkpoint_dir)


def resolve_checkpoint_file(checkpoint_dir: str,
                            save_iter: int = -1) -> Optional[str]:
    """Eval-CLI checkpoint resolution (reference test.py:95-100): a pinned
    --save_iter epoch file, else best_model.tar / latest epoch. Shared by
    test.py / test_uncertainty.py / save_features.py. Warns LOUDLY when
    nothing is found — the CLIs proceed on freshly-initialised weights for
    reference parity, and a silent ~chance-level 'result' in results.txt is
    far worse than a stderr warning."""
    import sys

    if save_iter != -1:
        f = get_assigned_file(checkpoint_dir, save_iter)
    else:
        f = get_best_file(checkpoint_dir)
    if f is None:
        print(f"[WARNING] no checkpoint found in {checkpoint_dir} — "
              "evaluating RANDOMLY-INITIALISED weights", file=sys.stderr)
    return f


def warmup_from_baseline(warm_dir: str, target_params: Any,
                         backbone: Any = None) -> Any:
    """Warm-start the feature trunk from a baseline checkpoint.

    The reference renames `feature.`-prefixed state_dict keys into the target
    model (reference train.py:198-217). Here: baseline stores the trunk under
    a 'backbone' submodule; we suffix-match each baseline backbone leaf path
    against the target pytree's leaf paths (which may or may not contain a
    'backbone' level, depending on the method's module nesting) and replace
    the matching leaves. A reference torch baseline checkpoint works too
    when `backbone` (the flax trunk module) is given.
    """
    src_file = get_best_file(warm_dir)
    if src_file is None:
        raise ValueError(f"no warmup checkpoint found in {warm_dir}")
    return load_backbone_from(src_file, target_params, backbone=backbone)


def load_backbone_from(src_file: str, target_params: Any,
                       backbone: Any = None) -> Any:
    """Graft a checkpoint's feature-trunk leaves into `target_params` by
    suffix path matching (handles both 'backbone'-wrapped checkpoints and
    bare-trunk ones, e.g. ProtoNet where 'feature' IS the backbone).

    Accepts this repo's npz payloads AND the reference's torch checkpoints
    (the latter need `backbone`, the flax trunk module, to drive the key
    translation in utils/torch_import.py)."""
    from . import torch_import as _ti

    if _ti.is_torch_checkpoint(src_file):
        if backbone is None:
            raise ValueError(
                f"{src_file} is a reference torch checkpoint; grafting its "
                "trunk requires the flax backbone module")
        print(f"importing reference torch trunk from {src_file}")
        state, _ = _ti.load_torch_state(src_file)
        fvars = _ti.import_backbone(state, backbone, prefix="feature.")
        rel = {}
        for path_t, leaf in jax.tree_util.tree_flatten_with_path(fvars)[0]:
            key = jax.tree_util.keystr(path_t)
            # strip the leading ['params'] / ['batch_stats'] level: the
            # suffix below matches either target nesting; params vs stats
            # cannot collide (leaf names scale/bias vs mean/var differ)
            rel[key[key.index("]") + 1:]] = np.asarray(leaf)
        return _graft_suffix_leaves(src_file, rel, target_params)
    with open(src_file, "rb") as f:
        z = np.load(io.BytesIO(f.read()), allow_pickle=False)
    rel = {}
    for marker in ("['backbone']", "['feature']"):
        for key in z.files:
            if marker in key:
                rel[key[key.index(marker) + len(marker):]] = z[key]
        if rel:
            break
    if not rel:
        raise ValueError(f"{src_file} has no backbone/feature leaves")
    return _graft_suffix_leaves(src_file, rel, target_params)


def _graft_suffix_leaves(src_file: str, rel: dict, target_params: Any) -> Any:
    """Replace target leaves whose path ends with a key of `rel` (and whose
    shape matches). LONGEST suffix wins: rel keys are full paths from the
    backbone root, so a leaf's own key is always its longest match — a
    shorter key that happens to share the tail (e.g. a ResNet's stem
    `['EpisodicBatchNorm_0']['scale']` vs a block's
    `['SimpleBlock_0']['EpisodicBatchNorm_0']['scale']`, same shape) must
    not shadow it."""

    by_len = sorted(rel.items(), key=lambda kv: len(kv[0]), reverse=True)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    leaves, hits = [], 0
    for path_t, leaf in paths_leaves:
        key = jax.tree_util.keystr(path_t)
        replaced = leaf
        for suffix, arr in by_len:
            if key.endswith(suffix) and arr.shape == np.shape(leaf):
                replaced = arr.astype(np.asarray(leaf).dtype)
                hits += 1
                break
        leaves.append(replaced)
    if hits == 0:
        raise ValueError(f"no overlapping backbone leaves between {src_file} "
                         "and the target model")
    print(f"warmup: loaded {hits} trunk leaves from {src_file}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def checkpoint_dir_for(save_dir: str, dataset: str, model: str, method: str,
                       train_aug: bool, train_n_way: Optional[int] = None,
                       n_shot: Optional[int] = None) -> str:
    """save/checkpoints/<ds>/<model>_<method>[_aug][_Nway_Kshot]
    (reference train.py:178-182)."""
    d = f"{save_dir}/checkpoints/{dataset}/{model}_{method}"
    if train_aug:
        d += "_aug"
    if method not in ("baseline", "baseline++") and train_n_way is not None:
        d += f"_{train_n_way}way_{n_shot}shot"
    return d
