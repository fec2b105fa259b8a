"""Classification evaluation CLI — rebuild of reference test.py.

Protocols preserved:
  * DKT / MAML evaluate from raw images: --n_iter (600) episodes with
    n_query=15, accuracy mean +- 1.96*std/sqrt(n) (reference test.py:133-161).
  * other methods evaluate from the save_features.py HDF5 cache
    (`feature_evaluation`, reference test.py:39-59).
  * --repeat N reseeded runs averaged (reference test.py:187-199).
  * results appended to record/results.txt (reference test.py:175-184).
"""
from __future__ import annotations

import os
import random
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.data import EpisodicDataLoader
from deep_kernel_transfer_tpu.data.device_dataset import cached_dataset
from deep_kernel_transfer_tpu.data.feature_cache import (
    init_loader,
    sample_feature_episode,
)
from deep_kernel_transfer_tpu.io_utils import parse_args
from deep_kernel_transfer_tpu.methods import (
    DKT,
    MAML,
    BaselineFinetune,
)
from deep_kernel_transfer_tpu.methods.base import ci95
from deep_kernel_transfer_tpu.utils.checkpoint import (
    load_params_checkpoint,
    resolve_checkpoint_file,
)
from deep_kernel_transfer_tpu.utils.jit_cache import enable_persistent_jit_cache


def _set_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)


def make_feature_scorer(model, params_cli, feat_dim: int):
    """Build ONE episode-scoring callable (z, key) -> scores for the
    feature-cache path, so the jitted programs are traced once per run
    instead of once per episode (reference test.py:39-59 scores inline;
    600 retraces of the 100-epoch finetune scan would dominate the run)."""
    adaptation = params_cli.adaptation
    if adaptation and params_cli.method in ("relationnet",
                                            "relationnet_softmax"):
        # relationnet finetunes its relation module, not a linear probe
        # (reference relationnet.py:42-93 overrides set_forward_adaptation)
        return lambda z, key: model.adapted_scores_from_features(
            model._loaded_params, z, key)
    if adaptation or params_cli.method in ("baseline", "baseline++"):
        # linear-probe finetune on support features (reference
        # meta_template.py:102-135 / baselinefinetune.py:14-52); one head
        # reused across episodes (episode_scores jit-caches on identity)
        loss_type = "dist" if params_cli.method == "baseline++" else "softmax"
        head = BaselineFinetune(feat_dim, params_cli.test_n_way,
                                params_cli.n_shot, loss_type=loss_type)
        return lambda z, key: head.episode_scores(key, z)
    score_fn = jax.jit(partial(model.scores_from_features,
                               model._loaded_params))
    return lambda z, key: score_fn(z)


def feature_evaluation(cl_data, score_episode, params_cli, n_query=15,
                       seed=0):
    """One episode from cached features -> accuracy% (reference test.py:39-59)."""
    rng = np.random.RandomState(seed)
    n_way = params_cli.test_n_way
    n_support = params_cli.n_shot
    z = sample_feature_episode(cl_data, rng, n_way, n_support, n_query)
    scores = score_episode(jnp.asarray(z), jax.random.PRNGKey(seed))
    pred = np.asarray(jnp.argmax(scores, axis=-1))
    y = np.repeat(range(n_way), n_query)
    return np.mean(pred == y) * 100


def single_test(params_cli, seed: int) -> tuple[float, float]:
    """One full evaluation run -> (acc_mean, acc_ci95). reference test.py:62-185."""
    _set_seed(seed)
    n_way = params_cli.test_n_way
    n_support = params_cli.n_shot
    image_size = factory.resolve_image_size(params_cli)
    factory.check_model_constraints(params_cli)

    from_images = params_cli.method in ("DKT", "maml", "maml_approx")
    # the checkpoint's way-sized parameters follow TRAIN n_way; DKT handles
    # smaller test_n_way episodes by change_way GP slicing; MAML does not
    # support mixed ways (reference maml.py:13 sets change_way=False)
    if params_cli.method in ("maml", "maml_approx"):
        assert params_cli.test_n_way == params_cli.train_n_way, (
            "maml does not support test_n_way != train_n_way "
            "(reference change_way=False)")
    if params_cli.method in ("baseline", "baseline++"):
        # no meta model: a fresh BaselineFinetune head is trained per episode
        # from cached features (reference test.py:83-86, baselinefinetune.py)
        model = None
    else:
        model = factory.build_method(params_cli, params_cli.train_n_way,
                                     n_support)
    if params_cli.method in ("maml", "maml_approx") and params_cli.adaptation:
        model.task_update_num = 100  # reference test.py:158-159

    ckpt_dir = factory.checkpoint_dir(params_cli)
    ckpt_file = resolve_checkpoint_file(ckpt_dir, params_cli.save_iter)

    if from_images:
        novel_file = factory.resolve_data_files(params_cli,
                                                split_for_test=params_cli.split)
        n_query = 15  # reference test.py:142
        example = jnp.zeros((params_cli.train_n_way, n_support + n_query,
                             image_size, image_size, 3), jnp.float32)
        state = model.init(jax.random.PRNGKey(seed), example)
        params = state.params
        if ckpt_file is not None:
            params, _ = load_params_checkpoint(
                ckpt_file, params, method_name=params_cli.method,
                model=model, image_size=image_size)
            print(f"loaded {ckpt_file}")
        # the special DKT heads (--laplace / --adaptation) batch episodes
        # the same way as the standard path: one vmapped dispatch per
        # --episode_batch episodes (reference runs them per-episode)
        special = (isinstance(model, DKT)
                   and (getattr(params_cli, "laplace", False)
                        or params_cli.adaptation))
        episode_batch = max(params_cli.episode_batch, 1)
        # episode-parallel eval: the 600-episode protocol sharded over the
        # mesh (standard head only; the special heads stay single-program)
        mesh = (None if special
                else factory.resolve_mesh(params_cli, model, episode_batch))
        dds = None
        if factory.use_device_data(params_cli, novel_file, image_size):
            # TPU-native fast path: the whole novel split lives in HBM and
            # episodes are sampled + gathered on device — zero host->device
            # transfers inside the 600-episode loop (data/device_dataset.py)
            dds = cached_dataset(novel_file, image_size, verbose=True)
            if mesh is not None:
                dds = dds.shard(mesh)
            loader = dds.epoch(seed, n_way, n_support, n_query,
                               n_episodes=params_cli.n_iter,
                               episode_batch=episode_batch)
        else:
            loader = EpisodicDataLoader(
                novel_file, image_size, n_way, n_support, n_query,
                n_episodes=params_cli.n_iter, episode_batch=episode_batch,
                aug=False, seed=seed, output_uint8=True)
        if mesh is not None:
            from deep_kernel_transfer_tpu.parallel import (
                make_sharded_eval,
                replicate_tree,
                shard_episode_batch,
                wrap_pad_episodes,
            )

            print(f"episode-parallel mesh: {mesh.shape}")
            sharded_eval = make_sharded_eval(model, mesh)
            params = replicate_tree(params, mesh)

        if dds is not None and mesh is None and not special:
            # fused eval: the whole n_iter protocol as one scan dispatch
            # over HBM-resident episodes (+ one remainder batch), zero
            # host round-trips between batches (device_dataset.py)
            from deep_kernel_transfer_tpu.data.device_dataset import (
                fused_protocol_accs,
                make_fused_eval,
            )

            fused = make_fused_eval(model, dds, n_way, n_support, n_query,
                                    episode_batch)
            accs = np.asarray(fused_protocol_accs(
                fused, model, dds, params, jax.random.PRNGKey(seed),
                n_way, n_support, n_query, params_cli.n_iter,
                episode_batch))
            return float(accs.mean()), ci95(accs)

        accs = []
        for xb in loader:
            xb = jnp.asarray(xb)
            if special:
                if getattr(params_cli, "laplace", False):
                    # Laplace head (reference test.py --laplace ->
                    # DKT.correct(laplace=True), methods/DKT.py:207-222)
                    batch_acc = model.batch_correct_laplace(params, xb)
                else:
                    batch_acc = model.batch_correct_adapted(params, xb,
                                                            steps=100)
            elif mesh is not None:
                xb, b = wrap_pad_episodes(xb, mesh)  # trim after
                batch_acc = sharded_eval(
                    params, shard_episode_batch(xb, mesh))[:b]
            else:
                batch_acc = model.batch_correct(params, xb)
            # defer the device->host readback: syncing inside the loop
            # would serialise dispatch with compute (measured ~3x slower
            # per batch on the tunnelled platform)
            accs.append(batch_acc)
        accs = np.concatenate([np.asarray(a) for a in accs])
        return float(accs.mean()), ci95(accs)

    # feature-cache path
    from save_features import feature_file_path

    feat_file = feature_file_path(params_cli)
    assert os.path.isfile(feat_file), (
        f"{feat_file} not found — run save_features.py first")
    cl_data = init_loader(feat_file)

    if params_cli.method not in ("baseline", "baseline++"):
        # rebuild method params and load the checkpoint for the head weights
        example = jnp.zeros((n_way, n_support + 15, image_size, image_size, 3),
                            jnp.float32)
        state = model.init(jax.random.PRNGKey(seed), example)
        params = state.params
        if ckpt_file is not None:
            params, _ = load_params_checkpoint(
                ckpt_file, params, method_name=params_cli.method,
                model=model, image_size=image_size)
        model._loaded_params = params

    feat_dim = int(next(iter(cl_data.values()))[0].shape[-1]) if cl_data else 0
    score_episode = make_feature_scorer(model, params_cli, feat_dim)
    accs = np.asarray([
        feature_evaluation(cl_data, score_episode, params_cli,
                           seed=seed * 10000 + i)
        for i in range(params_cli.n_iter)
    ])
    return float(accs.mean()), ci95(accs)


def main(argv=None, return_runs: bool = False):
    """Runs the --repeat reseeded evaluation protocol. Returns (acc, ci)
    where ci is the mean of the per-run episode-level 95% CIs (reference
    test.py:174 convention); with return_runs=True also returns the
    per-seed accuracy list so callers can report across-seed spread (a
    different statistic from the episode-level CI)."""
    enable_persistent_jit_cache()  # repeat CLI runs skip XLA recompiles
    params_cli = parse_args("test", argv)
    repeat = params_cli.repeat
    accs, cis = [], []
    for r in range(repeat):
        acc, ci = single_test(params_cli, seed=params_cli.seed + r)
        print(f"run {r}: {params_cli.n_iter} episodes, "
              f"acc = {acc:.2f}% +- {ci:.2f}%")
        accs.append(acc)
        cis.append(ci)
    acc, ci = float(np.mean(accs)), float(np.mean(cis))
    print("-----------------------------")
    print(f"Seeds = {repeat} | Overall Test Acc = {acc:.2f}% +- {ci:.2f}%")
    print("-----------------------------")

    # record/results.txt append (reference test.py:175-184)
    os.makedirs("./record", exist_ok=True)
    with open("./record/results.txt", "a") as f:
        timestamp = time.strftime("%Y%m%d-%H%M%S", time.localtime())
        aug_str = "-aug" if params_cli.train_aug else ""
        aug_str += "-adapted" if params_cli.adaptation else ""
        exp_setting = (
            f"{params_cli.dataset}-{params_cli.model}-{params_cli.method}"
            f"{aug_str} {params_cli.n_shot}shot {params_cli.test_n_way}way_test")
        acc_str = f"{repeat} Test Acc = {acc:.2f}% +- {ci:.2f}%"
        f.write(f"Time: {timestamp}, Setting: {exp_setting}, Acc: {acc_str}\n")
    if return_runs:
        return acc, ci, accs
    return acc, ci


if __name__ == "__main__":
    main()
