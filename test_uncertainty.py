"""Calibration evaluation CLI — rebuild of reference test_uncertainty.py.

Phase 1: collect logits/targets over --n_iter episodes and fit a scalar
temperature on NLL (reference test_uncertainty.py:62-74, 234-245).
Phase 2: reseeded repeats, 15-bin ECE at the fitted temperature
(test_uncertainty.py:76-94, 249-257). DKT's one-vs-rest logits use
sigmoid-normalised probabilities (test_uncertainty.py:78-81).

Method routing mirrors the reference (test_uncertainty.py:105-225):
  * DKT / maml / maml_approx collect logits from raw images
    (--adaptation => MAML task_update_num=100, reference :190-191);
  * protonet / matchingnet / relationnet* collect from the save_features.py
    feature cache via scores_from_features;
  * baseline / baseline++ train a fresh BaselineFinetune head per episode
    on cached features (no meta-checkpoint is loaded, reference :149).
"""
from __future__ import annotations

import os
import random

import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.data import EpisodicDataLoader
from deep_kernel_transfer_tpu.data.feature_cache import (
    init_loader,
    sample_feature_episode,
)
from deep_kernel_transfer_tpu.io_utils import parse_args
from deep_kernel_transfer_tpu.methods import BaselineFinetune
from deep_kernel_transfer_tpu.methods.base import episode_labels
from deep_kernel_transfer_tpu.utils.checkpoint import (
    resolve_checkpoint_file,
    load_params_checkpoint,
)
from deep_kernel_transfer_tpu.utils.metrics import calibrate_temperature, ece
from deep_kernel_transfer_tpu.utils.jit_cache import enable_persistent_jit_cache

FROM_IMAGES = ("DKT", "maml", "maml_approx")


def get_logits_targets_images(params_cli, model, params, seed: int):
    """Stacked [episodes*n_way*Q, n_way] logits + labels from raw images
    (reference test_uncertainty.py:165-200)."""
    np.random.seed(seed)
    random.seed(seed)
    n_way, n_support, n_query = params_cli.test_n_way, params_cli.n_shot, 15
    image_size = factory.resolve_image_size(params_cli)
    novel_file = factory.resolve_data_files(params_cli,
                                            split_for_test=params_cli.split)
    episode_batch = max(params_cli.episode_batch, 1)
    if factory.use_device_data(params_cli, novel_file, image_size):
        # HBM-resident sampling, same as test.py (data/device_dataset.py)
        from deep_kernel_transfer_tpu.data.device_dataset import cached_dataset

        loader = cached_dataset(novel_file, image_size).epoch(
            seed, n_way, n_support, n_query, n_episodes=params_cli.n_iter,
            episode_batch=episode_batch)
    else:
        loader = EpisodicDataLoader(
            novel_file, image_size, n_way, n_support, n_query,
            n_episodes=params_cli.n_iter, episode_batch=episode_batch,
            aug=False, seed=seed, output_uint8=True)
    # ONE vmapped program over --episode_batch episodes (like test.py's
    # standard path) instead of 600 sequential per-episode dispatches
    per_episode = (model.episode_logits if hasattr(model, "episode_logits")
                   else model.episode_scores)
    batched = jax.jit(lambda p, xb: jax.vmap(
        lambda x: per_episode(p, x))(xb))
    y = np.asarray(episode_labels(n_way, n_query))
    outs = []
    for xb in loader:
        # keep results on device in the loop; read back after (a per-batch
        # host sync would serialise dispatch with compute on the tunnel)
        outs.append(batched(params, jnp.asarray(xb)))
    logits = np.concatenate([np.asarray(o).reshape(-1, o.shape[-1])
                             for o in outs])
    n_episodes = sum(int(o.shape[0]) for o in outs)
    return logits, np.tile(y, n_episodes)


def get_logits_targets_features(params_cli, batched_logits_fn, cl_data,
                                seed: int):
    """Stacked logits + labels from the HDF5 feature cache (reference
    test_uncertainty.py:201-224: 600 sampled feature episodes through
    set_forward(is_feature=True)). Episodes are scored --episode_batch at
    a time through one vmapped program (the sampling RNG stream and the
    per-episode PRNG keys are identical to the sequential law), with the
    device->host readbacks deferred out of the loop."""
    rng = np.random.RandomState(seed)
    n_way, n_support, n_query = params_cli.test_n_way, params_cli.n_shot, 15
    eb = max(params_cli.episode_batch, 1)
    y = np.asarray(episode_labels(n_way, n_query))
    outs, done = [], 0
    while done < params_cli.n_iter:
        b = min(eb, params_cli.n_iter - done)
        zb = np.stack([
            sample_feature_episode(cl_data, rng, n_way, n_support, n_query)
            for _ in range(b)])
        keys = jnp.stack([jax.random.PRNGKey(seed * 10000 + done + j)
                          for j in range(b)])
        outs.append(batched_logits_fn(jnp.asarray(zb), keys))
        done += b
    logits = np.concatenate([np.asarray(o).reshape(-1, o.shape[-1])
                             for o in outs])
    return logits, np.tile(y, done)


def _load_params(params_cli, model, image_size, n_support):
    """Init params at train n_way and graft the best/assigned checkpoint."""
    example = jnp.zeros((params_cli.train_n_way, n_support + 15,
                         image_size, image_size, 3), jnp.float32)
    state = model.init(jax.random.PRNGKey(params_cli.seed), example)
    params = state.params
    ckpt_dir = factory.checkpoint_dir(params_cli)
    ckpt_file = resolve_checkpoint_file(ckpt_dir, params_cli.save_iter)
    if ckpt_file is not None:
        params, _ = load_params_checkpoint(
            ckpt_file, params, method_name=params_cli.method,
            model=model, image_size=image_size)
        print(f"loaded {ckpt_file}")
    return params


def make_collector(params_cli):
    """Returns collect(seed) -> (logits, targets) for the CLI method."""
    n_support = params_cli.n_shot
    factory.check_model_constraints(params_cli)
    image_size = factory.resolve_image_size(params_cli)

    if params_cli.method in FROM_IMAGES:
        # build at TRAIN n_way (the checkpoint's way-sized parameter shapes);
        # test_n_way episodes are handled by DKT's change_way slicing
        if params_cli.method in ("maml", "maml_approx"):
            assert params_cli.test_n_way == params_cli.train_n_way, (
                "maml does not support test_n_way != train_n_way "
                "(reference change_way=False)")
        model = factory.build_method(params_cli, params_cli.train_n_way,
                                     n_support)
        if params_cli.method in ("maml", "maml_approx") and params_cli.adaptation:
            model.task_update_num = 100  # reference test_uncertainty.py:190-191
        params = _load_params(params_cli, model, image_size, n_support)
        return lambda seed: get_logits_targets_images(
            params_cli, model, params, seed)

    # feature-cache methods (reference test_uncertainty.py:201-224)
    from save_features import feature_file_path

    feat_file = feature_file_path(params_cli)
    assert os.path.isfile(feat_file), (
        f"{feat_file} not found — run save_features.py first")
    cl_data = init_loader(feat_file)

    if params_cli.method in ("baseline", "baseline++"):
        # fresh head finetuned per episode; no meta checkpoint (reference :149)
        feat_dim = int(np.asarray(next(iter(cl_data.values()))[0]).reshape(-1).shape[0])
        loss_type = "dist" if params_cli.method == "baseline++" else "softmax"
        head = BaselineFinetune(feat_dim, params_cli.test_n_way, n_support,
                                loss_type=loss_type)
        fn = jax.jit(jax.vmap(lambda z, k: head.episode_scores(k, z)))
        return lambda seed: get_logits_targets_features(
            params_cli, fn, cl_data, seed)

    model = factory.build_method(params_cli, params_cli.train_n_way, n_support)
    params = _load_params(params_cli, model, image_size, n_support)
    fn = jax.jit(jax.vmap(
        lambda z, k: model.scores_from_features(params, z)))
    return lambda seed: get_logits_targets_features(
        params_cli, fn, cl_data, seed)


def main(argv=None):
    """Returns a dict {ece_raw, ece_raw_std, ece_cal, ece_cal_std,
    temperature, acc} — the measured calibration study for one method
    (means/stds over the --repeat reseeded runs). ece_raw is the
    uncalibrated (T=1) 15-bin ECE, ece_cal after temperature scaling."""
    enable_persistent_jit_cache()  # repeat CLI runs skip XLA recompiles
    params_cli = parse_args("test", argv)
    collect = make_collector(params_cli)
    one_vs_rest = params_cli.method == "DKT"

    # Phase 1: temperature on a held-out collection run
    logits, targets = collect(params_cli.seed)
    temperature = calibrate_temperature(logits, targets)
    print(f"fitted temperature: {temperature:.4f}")

    # Phase 2: reseeded repeats -> ECE before (T=1) and after temperature
    # scaling (reference test_uncertainty.py:249-257 reports the scaled
    # number; the raw one is what scaling is claimed to improve on)
    eces_raw, eces_cal, accs = [], [], []
    for r in range(params_cli.repeat):
        logits, targets = collect(params_cli.seed + 1 + r)
        e_raw = ece(logits, targets, temperature=1.0,
                    one_vs_rest=one_vs_rest)
        e_cal = ece(logits, targets, temperature=temperature,
                    one_vs_rest=one_vs_rest)
        acc = float(np.mean(np.argmax(logits, 1) == targets)) * 100
        print(f"run {r}: ECE = {e_raw:.4f} raw / {e_cal:.4f} calibrated "
              f"| acc = {acc:.2f}%")
        eces_raw.append(e_raw)
        eces_cal.append(e_cal)
        accs.append(acc)
    print("-----------------------------")
    print(f"ECE raw = {np.mean(eces_raw):.4f} +- {np.std(eces_raw):.4f} | "
          f"ECE calibrated = {np.mean(eces_cal):.4f} +- "
          f"{np.std(eces_cal):.4f} (T = {temperature:.3f})")
    print("-----------------------------")
    return {
        "ece_raw": float(np.mean(eces_raw)),
        "ece_raw_std": float(np.std(eces_raw)),
        "ece_cal": float(np.mean(eces_cal)),
        "ece_cal_std": float(np.std(eces_cal)),
        "temperature": float(temperature),
        "acc": float(np.mean(accs)),
    }


if __name__ == "__main__":
    main()
