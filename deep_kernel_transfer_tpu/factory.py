"""Experiment factory — dataset/model/method resolution rules.

Rebuild of the decision logic inlined in the reference entry scripts
(reference train.py:73-182, test.py:73-115): filelist resolution including
the cross / cross_char domain-transfer settings, image-size rules, default
epoch schedules, method construction (with the MAML omniglot overrides),
and the checkpoint-directory naming scheme that test.py relies on to find
best_model.tar.
"""
from __future__ import annotations

import os

from . import configs
from .methods import (
    DKT,
    MAML,
    BaselineTrain,
    MatchingNet,
    ProtoNet,
    RelationNet,
)
from .models.backbones import feat_dims, model_dict, np_feat_shapes


def _fallback(path: str) -> str:
    """The reference layout is ./filelists/<ds>/; this repo's prep scripts
    write into ./filelists_tpu/<ds>/. Accept either: if the reference-layout
    file is missing but the filelists_tpu twin exists, use the twin."""
    if not os.path.exists(path):
        alt = path.replace("filelists/", "filelists_tpu/", 1)
        if os.path.exists(alt):
            return alt
    return path


def resolve_data_files(params, split_for_test: str | None = None):
    """(base_file, val_file) for training, or the single test-split file.

    reference train.py:73-81, test.py (via save_features.py:35-49)."""
    d = configs.data_dir
    if split_for_test is not None:
        split = split_for_test
        if params.dataset == "cross":
            if split == "base":
                return _fallback(os.path.join(d["miniImagenet"], "all.json"))
            return _fallback(os.path.join(d["CUB"], f"{split}.json"))
        if params.dataset == "cross_char":
            if split == "base":
                return _fallback(os.path.join(d["omniglot"], "noLatin.json"))
            return _fallback(os.path.join(d["emnist"], f"{split}.json"))
        return _fallback(os.path.join(d[params.dataset], f"{split}.json"))

    if params.dataset == "cross":
        base_file = os.path.join(d["miniImagenet"], "all.json")
        val_file = os.path.join(d["CUB"], "val.json")
    elif params.dataset == "cross_char":
        base_file = os.path.join(d["omniglot"], "noLatin.json")
        val_file = os.path.join(d["emnist"], "val.json")
    else:
        base_file = os.path.join(d[params.dataset], "base.json")
        val_file = os.path.join(d[params.dataset], "val.json")
    return _fallback(base_file), _fallback(val_file)


def resolve_image_size(params) -> int:
    """28 for character datasets, 84 for Conv trunks, 224 for ResNets
    (reference train.py:83-89)."""
    if "Conv" in params.model:
        if params.dataset in ("omniglot", "cross_char"):
            return 28
        return 84
    return 224


def check_model_constraints(params) -> None:
    """omniglot/cross_char force Conv4 -> Conv4S (reference train.py:91-93)."""
    if params.dataset in ("omniglot", "cross_char"):
        assert params.model in ("Conv4", "Conv4S") and not getattr(
            params, "train_aug", False
        ), "omniglot only supports Conv4 without augmentation"
        params.model = "Conv4S"


def default_stop_epoch(params) -> int:
    """reference train.py:97-113."""
    if params.method in ("baseline", "baseline++"):
        if params.dataset in ("omniglot", "cross_char"):
            return 5
        if params.dataset in ("CUB",):
            return 200
        if params.dataset in ("miniImagenet", "cross"):
            return 400
        return 400
    if params.n_shot == 1:
        return 600
    if params.n_shot == 5:
        return 400
    return 600


def resolve_mesh(params, model, episode_batch: int):
    """Episode-parallel mesh resolution for the CLIs (parallel/mesh.py).

    --n_devices N forces an N-device mesh; default (None) auto-enables over
    ALL local devices when there are several, the method exposes the
    batched-loss surface the sharded step needs, and the episode batch
    divides the device count. Returns a Mesh or None (single-device path).
    """
    import jax as _jax

    n_req = getattr(params, "n_devices", None)
    n = n_req if n_req else _jax.device_count()
    if n <= 1:
        return None
    supported = hasattr(model, "batch_loss_train") and hasattr(model, "tx")
    if not supported or episode_batch % n != 0:
        if n_req:
            raise ValueError(
                f"--n_devices={n_req} needs a method with batch_loss_train "
                f"and --episode_batch divisible by it "
                f"(episode_batch={episode_batch})")
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(n)


def use_device_data(params, data_file: str, image_size: int,
                    canvas: bool = False) -> bool:
    """Resolve the --device_data tri-state: stage the split in HBM when
    forced on, or (auto) when it fits the budget (data/device_dataset.py)."""
    mode = getattr(params, "device_data", "off")
    if mode == "off":
        return False
    if mode == "on":
        return True
    from .data.device_dataset import fits_budget

    return fits_budget(data_file, image_size, canvas=canvas)


def train_n_query(params) -> int:
    """n_query = max(1, 16 * test_n_way / train_n_way) (train.py:132-133)."""
    return max(1, int(16 * params.test_n_way / params.train_n_way))


def kernel_type(params) -> str:
    kt = getattr(params, "kernel_type", None)
    return kt if kt else configs.kernel_type


def build_method(params, n_way: int, n_support: int):
    """Method object for classification (reference train.py:115-174)."""
    model_fn = model_dict[params.model]
    method = params.method
    fdtype = getattr(params, "feature_dtype", "bfloat16")
    if method in ("baseline", "baseline++"):
        # the base-class label ids must fit the classifier head, else labels
        # clip silently (reference train.py:119-123)
        min_classes = {"omniglot": 4112, "cross_char": 1597}.get(params.dataset)
        if min_classes is not None:
            assert params.num_classes >= min_classes, (
                f"--num_classes must be >= {min_classes} for "
                f"{params.dataset} (max base-class label id; "
                "reference train.py:119-123)")
    if method == "baseline":
        return BaselineTrain(model_fn(), params.num_classes, loss_type="softmax")
    if method == "baseline++":
        return BaselineTrain(model_fn(), params.num_classes, loss_type="dist")
    if method == "DKT":
        return DKT(model_fn(), n_way, n_support, kernel_type=kernel_type(params),
                   feature_dtype=fdtype)
    if method == "protonet":
        return ProtoNet(model_fn(), n_way, n_support, feature_dtype=fdtype)
    if method == "matchingnet":
        return MatchingNet(model_fn(), feat_dims[params.model], n_way,
                           n_support, feature_dtype=fdtype)
    if method in ("relationnet", "relationnet_softmax"):
        # relationnet uses the non-pooled trunks (reference train.py:145-151)
        if params.model == "Conv4":
            bb, shape_key = model_dict["Conv4"], "Conv4NP"
            from .models.backbones import Conv4NP

            bb = Conv4NP()
        elif params.model == "Conv6":
            from .models.backbones import Conv6NP

            bb, shape_key = Conv6NP(), "Conv6NP"
        elif params.model == "Conv4S":
            from .models.backbones import Conv4SNP

            bb, shape_key = Conv4SNP(), "Conv4SNP"
        else:
            bb, shape_key = model_dict[params.model](flatten=False), params.model
        feat_shape = np_feat_shapes[shape_key]
        loss_type = "mse" if method == "relationnet" else "softmax"
        return RelationNet(bb, feat_shape, n_way, n_support,
                           loss_type=loss_type, feature_dtype=fdtype)
    if method in ("maml", "maml_approx"):
        kwargs = dict(approx=(method == "maml_approx"))
        if params.dataset in ("omniglot", "cross_char"):
            # reference train.py:169-172
            kwargs.update(n_task=32, task_update_num=1, train_lr=0.1)
        return MAML(model_fn(), n_way, n_support, **kwargs)
    raise ValueError(f"Unknown method {params.method}")


def checkpoint_dir(params) -> str:
    """save/checkpoints/<ds>/<model>_<method>[_aug][_Nway_Kshot]
    (reference train.py:178-182, identical naming)."""
    path = os.path.join(
        configs.save_dir, "checkpoints", params.dataset,
        f"{params.model}_{params.method}",
    )
    if getattr(params, "train_aug", False):
        path += "_aug"
    if params.method not in ("baseline", "baseline++"):
        path += f"_{params.train_n_way}way_{params.n_shot}shot"
    return path


def regression_checkpoint_dir(params) -> str:
    """save/checkpoints/<ds>/<model>_<method>[_spectral]
    (reference train_regression.py:19-22 naming)."""
    name = f"{params.model}_{params.method}"
    if getattr(params, "spectral", False):
        name += "_spectral"
    return os.path.join(configs.save_dir, "checkpoints", params.dataset, name)
