"""Feature-cache writer CLI — rebuild of reference save_features.py.

Runs the trained feature trunk over a split's images and writes the HDF5
cache {all_feats, all_labels, count} that test.py's feature_evaluation path
consumes (reference save_features.py:20-41; same on-disk layout). The trunk
weights are pulled out of the method checkpoint by suffix-matching leaf
paths (the reference's `feature.`-key renaming, save_features.py:110-119).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.data import SimpleDataLoader
from deep_kernel_transfer_tpu.data.feature_cache import save_features
from deep_kernel_transfer_tpu.io_utils import parse_args
from deep_kernel_transfer_tpu.models.backbones import model_dict
from deep_kernel_transfer_tpu.utils.checkpoint import (
    resolve_checkpoint_file,
    load_backbone_from,
)
from deep_kernel_transfer_tpu.utils.jit_cache import enable_persistent_jit_cache


def feature_file_path(params_cli) -> str:
    """<ckpt_dir with checkpoints->features>/<split>[_iter].hdf5
    (reference save_features.py:96-101)."""
    ckpt_dir = factory.checkpoint_dir(params_cli)
    split = params_cli.split
    if params_cli.save_iter != -1:
        name = f"{split}_{params_cli.save_iter}.hdf5"
    else:
        name = f"{split}.hdf5"
    return os.path.join(ckpt_dir.replace("checkpoints", "features"), name)


def main(argv=None):
    enable_persistent_jit_cache()  # repeat CLI runs skip XLA recompiles
    params_cli = parse_args("save_features", argv)
    split_file = factory.resolve_data_files(params_cli,
                                            split_for_test=params_cli.split)
    image_size = factory.resolve_image_size(params_cli)
    factory.check_model_constraints(params_cli)

    ckpt_dir = factory.checkpoint_dir(params_cli)
    ckpt_file = resolve_checkpoint_file(ckpt_dir, params_cli.save_iter)
    assert ckpt_file is not None, f"no checkpoint in {ckpt_dir}"

    assert params_cli.method not in ("maml", "maml_approx"), (
        "maml does not support save_features (reference save_features.py:45)")
    if params_cli.method in ("relationnet", "relationnet_softmax"):
        # unpooled trunks keep spatial maps (reference save_features.py:94-100)
        from deep_kernel_transfer_tpu.models.backbones import (
            Conv4NP, Conv4SNP, Conv6NP,
        )

        np_map = {"Conv4": Conv4NP, "Conv6": Conv6NP, "Conv4S": Conv4SNP}
        if params_cli.model in np_map:
            backbone = np_map[params_cli.model]()
        else:
            backbone = model_dict[params_cli.model](flatten=False)
    else:
        backbone = model_dict[params_cli.model]()
    example = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
    bvars = backbone.init(jax.random.PRNGKey(0), example)
    bvars = load_backbone_from(ckpt_file, bvars, backbone=backbone)

    # eval-mode BN: running statistics -> deterministic per-image features
    embed = jax.jit(lambda x: backbone.apply(bvars, x, train=False))
    if factory.use_device_data(params_cli, split_file, image_size):
        # TPU-first path: stage the whole split in HBM once, embed
        # fixed-shape on-device slices — the only tunnel traffic is the
        # one-time uint8 staging plus the (much smaller) feature readback.
        # Pixels are bit-identical to the streaming path (same
        # TransformPipeline decodes them; see data/device_dataset.py).
        from deep_kernel_transfer_tpu.data.device_dataset import cached_dataset

        ds = cached_dataset(split_file, image_size, verbose=True)
        n, bs = ds.images.shape[0], 64
        feats = []
        for i in range(0, n, bs):
            # fixed-shape on-device gather; the tail clamps to the last
            # image and is trimmed after the trunk
            idx = jnp.clip(jnp.arange(i, i + bs), 0, n - 1)
            x = jnp.take(ds.images, idx, axis=0)
            feats.append(np.asarray(embed(x))[: min(bs, n - i)])
            if (i // bs) % 10 == 0:
                print(f"{i // bs}/{-(-n // bs)}")
        feats = np.concatenate(feats)
        labels = ds.image_labels
    else:
        loader = SimpleDataLoader(split_file, image_size, batch_size=64,
                                  aug=False, output_uint8=True)
        feats, labels = [], []
        for i, (x, y) in enumerate(loader):
            feats.append(np.asarray(embed(jnp.asarray(x))))
            labels.append(y)
            if i % 10 == 0:
                print(f"{i}/{len(loader)}")
        feats = np.concatenate(feats)
        labels = np.concatenate(labels)

    out = feature_file_path(params_cli)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_features(out, feats, labels)
    print(f"saved {feats.shape} features to {out}")


if __name__ == "__main__":
    main()
