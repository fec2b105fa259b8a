"""Classification meta-training CLI — reference-compatible surface.

Rebuild of reference train.py:24-219: same flags (io_utils.parse_args),
same dataset/image-size/epoch-default resolution, same checkpoint directory
naming and best-model selection, with the TPU-native training loop under
the hood (batched episodes, jitted steps, optional episode-parallel mesh).

Run e.g.:
    python train.py --dataset=cross_char --model=Conv4 --method=DKT
"""
from __future__ import annotations

import os
import random

import numpy as np
import jax
import jax.numpy as jnp

from deep_kernel_transfer_tpu import factory
from deep_kernel_transfer_tpu.data import EpisodicDataLoader, SimpleDataLoader
from deep_kernel_transfer_tpu.data.device_dataset import cached_dataset
from deep_kernel_transfer_tpu.io_utils import parse_args
from deep_kernel_transfer_tpu.methods import DKT, MAML, BaselineTrain
from deep_kernel_transfer_tpu.utils.checkpoint import (
    get_resume_file,
    load_params_checkpoint,
    save_checkpoint,
)
from deep_kernel_transfer_tpu.utils.logger import MetricsLogger
from deep_kernel_transfer_tpu.utils.jit_cache import enable_persistent_jit_cache


def _set_seed(seed: int) -> None:
    """reference train.py:24-35."""
    np.random.seed(seed)
    random.seed(seed)


def _val_acc(model, params, val_loader, eval_fn=None) -> float:
    accs = []
    for xb in val_loader:  # vmapped per-episode accuracy, one dispatch/batch
        if eval_fn is not None:  # episode-sharded over the mesh
            accs.extend(eval_fn(params, jnp.asarray(xb)))
        else:
            # keep the per-batch results ON DEVICE: a sync here would
            # serialise dispatch with compute (measured 3x slower); all
            # batches read back together below
            accs.append(model.batch_correct(params, jnp.asarray(xb)))
    if not accs:
        return 0.0
    if eval_fn is not None:
        return float(np.mean(accs))
    return float(np.mean(np.concatenate([np.asarray(a) for a in accs])))


def train_baseline(params_cli, base_file, image_size, stop_epoch, ckpt_dir):
    """Stage-1 softmax/cosine pretraining (reference train.py:37-67 with
    BaselineTrain.train_loop, methods/baselinetrain.py:31-43)."""
    loader = SimpleDataLoader(base_file, image_size, batch_size=16,
                              aug=params_cli.train_aug, seed=params_cli.seed,
                              output_uint8=True)
    model = factory.build_method(params_cli, params_cli.train_n_way, params_cli.n_shot)
    x0, _ = next(iter(loader))
    state = model.init(jax.random.PRNGKey(params_cli.seed), jnp.asarray(x0))

    start_epoch = params_cli.start_epoch
    if params_cli.resume:
        resume_file = get_resume_file(ckpt_dir)
        if resume_file is not None:
            state_params, epoch = load_params_checkpoint(
                resume_file, state.params, method_name=params_cli.method,
                model=model, image_size=image_size)
            state = state._replace(params=state_params)
            start_epoch = epoch + 1
            print(f"resumed from {resume_file} (epoch {epoch})")

    import contextlib

    from deep_kernel_transfer_tpu.utils.profiling import trace

    profile_dir = getattr(params_cli, "profile_dir", None)
    for epoch in range(start_epoch, stop_epoch):
        profile_ctx = (trace(profile_dir)
                       if profile_dir and epoch == start_epoch
                       else contextlib.nullcontext())
        avg_loss, i = 0.0, 0
        with profile_ctx:
            for x, y in loader:
                state, m = model.train_step(state, jnp.asarray(x),
                                             jnp.asarray(y))
                avg_loss += float(m["loss"])
                i += 1
                if i % 10 == 0:
                    print(f"Epoch {epoch} | Batch {i}/{len(loader)} | "
                          f"Loss {avg_loss / i:.6f}")
        # baseline has no validation protocol (reference baselinetrain.py:51
        # returns -1); save every save_freq and at the end
        if (epoch % params_cli.save_freq == 0) or (epoch == stop_epoch - 1):
            save_checkpoint(os.path.join(ckpt_dir, f"{epoch}.tar"),
                            state.params, epoch)
    # the best model for baseline is the last (no val); keep parity with
    # test.py's get_best_file fallback to get_resume_file
    save_checkpoint(os.path.join(ckpt_dir, "best_model.tar"),
                    state.params, stop_epoch - 1)
    return state


def train_meta(params_cli, base_file, val_file, image_size, stop_epoch, ckpt_dir):
    n_way = params_cli.train_n_way
    n_support = params_cli.n_shot
    n_query = factory.train_n_query(params_cli)

    model = factory.build_method(params_cli, n_way, n_support)
    episode_batch = params_cli.episode_batch
    if isinstance(model, MAML):
        # reference accumulates n_task episode losses per outer step
        # (methods/maml.py:71-98); the episode batch IS that accumulation,
        # and the training budget scales accordingly (reference
        # train.py: stop_epoch = stop_epoch * n_task for maml)
        episode_batch = model.n_task
        stop_epoch = stop_epoch * model.n_task

    n_episodes = getattr(params_cli, "n_train_episodes", 100)
    n_batches = -(-n_episodes // episode_batch)
    mesh = factory.resolve_mesh(params_cli, model, episode_batch)
    use_dd = factory.use_device_data(params_cli, base_file, image_size,
                                     canvas=params_cli.train_aug)
    if use_dd:
        # TPU-native fast path: both splits resident in HBM, episodes
        # sampled + (optionally) augmented on device — the host never
        # touches pixels inside the training loop (data/device_dataset.py,
        # data/device_aug.py)
        base_ds = cached_dataset(base_file, image_size,
                                 canvas=params_cli.train_aug, verbose=True)
        val_ds = cached_dataset(val_file, image_size, verbose=True)
        if mesh is not None:
            base_ds = base_ds.shard(mesh)
            val_ds = val_ds.shard(mesh)
        aug_to = image_size if params_cli.train_aug else None

        def base_iter(epoch):
            return base_ds.epoch(
                params_cli.seed * 100003 + epoch, n_way, n_support, n_query,
                n_episodes=n_episodes, episode_batch=episode_batch,
                augment_to=aug_to)

        def val_iter(epoch):
            return val_ds.epoch(
                params_cli.seed * 100003 + 50001 + epoch,
                params_cli.test_n_way, n_support, n_query,
                n_episodes=n_episodes, episode_batch=episode_batch)
    else:
        # uint8 pipeline: the trunk normalises on device (4x less
        # host->device traffic than normalised f32)
        base_loader = EpisodicDataLoader(
            base_file, image_size, n_way, n_support, n_query,
            n_episodes=n_episodes, episode_batch=episode_batch,
            aug=params_cli.train_aug, seed=params_cli.seed, output_uint8=True)
        val_loader = EpisodicDataLoader(
            val_file, image_size, params_cli.test_n_way, n_support, n_query,
            n_episodes=n_episodes, episode_batch=episode_batch, aug=False,
            seed=params_cli.seed + 1, output_uint8=True)
        base_iter = lambda epoch: base_loader
        val_iter = lambda epoch: val_loader

    example = jnp.zeros((n_way, n_support + n_query, image_size, image_size, 3),
                        jnp.float32)
    state = model.init(jax.random.PRNGKey(params_cli.seed), example)

    # Fused-epoch fast path: with the split HBM-resident and a single
    # device, sample -> augment -> train_step runs as ONE lax.scan dispatch
    # per print_freq chunk (data/device_dataset.make_fused_epoch; measured
    # 1.36x over the per-batch dispatch chain). The mesh path keeps the
    # per-batch loop (episode batches are host-sharded there).
    # MAML is excluded: wrapping its inner-loop scan in the epoch scan
    # multiplies XLA compile time (~20 min on the CPU host) for no
    # dispatch win worth having — its n_task batch keeps the plain loop.
    fused_chunk = fused_val = None
    if use_dd and mesh is None and not isinstance(model, MAML):
        from deep_kernel_transfer_tpu.data.device_dataset import (
            make_fused_epoch,
            make_fused_eval,
        )

        fused_chunk = make_fused_epoch(
            model, base_ds, n_way, n_support, n_query, episode_batch,
            augment_to=aug_to)
        fused_val = make_fused_eval(
            model, val_ds, params_cli.test_n_way, n_support, n_query,
            episode_batch)
        # exact-count parity with the streaming loader: a final partial
        # batch of rem episodes instead of rounding the epoch up to
        # n_batches*episode_batch
        nb_full_tr, rem_tr = divmod(n_episodes, episode_batch)
        fused_chunk_rem = (make_fused_epoch(
            model, base_ds, n_way, n_support, n_query, rem_tr,
            augment_to=aug_to) if rem_tr else None)

    if mesh is not None:
        # episode-parallel training: params replicated, episode axis sharded,
        # XLA's psum over ICI does the gradient all-reduce
        # (parallel/mesh.py; validated for parity in tests/test_parallel.py)
        from deep_kernel_transfer_tpu.parallel import (
            make_sharded_eval,
            make_sharded_train_step,
            replicate_tree,
            shard_episode_batch,
            wrap_pad_episodes,
        )

        print(f"episode-parallel mesh: {mesh.shape}")
        sharded_step = make_sharded_train_step(model, mesh)
        sharded_eval = make_sharded_eval(model, mesh)

        def train_step(state, xb):
            xb, _ = wrap_pad_episodes(xb, mesh)
            return sharded_step(state, shard_episode_batch(xb, mesh))

        def eval_batch(params, xb):
            xb, b = wrap_pad_episodes(xb, mesh)
            return np.asarray(
                sharded_eval(params, shard_episode_batch(xb, mesh)))[:b]

        state = replicate_tree(state, mesh)
        maybe_replicate = lambda s: replicate_tree(s, mesh)
    else:
        train_step = model.train_step
        eval_batch = None
        maybe_replicate = lambda s: s

    start_epoch = params_cli.start_epoch
    if params_cli.resume:
        resume_file = get_resume_file(ckpt_dir)
        if resume_file is not None:
            state_params, epoch = load_params_checkpoint(
                resume_file, state.params, method_name=params_cli.method,
                model=model, image_size=image_size)
            state = state._replace(params=state_params)
            start_epoch = epoch + 1
            print(f"resumed from {resume_file} (epoch {epoch})")
    elif params_cli.warmup:
        from deep_kernel_transfer_tpu import configs
        from deep_kernel_transfer_tpu.utils.checkpoint import warmup_from_baseline

        # reference train.py:198-201: <model>_baseline[_aug], no way/shot
        warm_dir = os.path.join(
            configs.save_dir, "checkpoints", params_cli.dataset,
            f"{params_cli.model}_baseline"
            + ("_aug" if params_cli.train_aug else ""))
        from deep_kernel_transfer_tpu.utils.torch_import import method_backbone

        state = state._replace(
            params=warmup_from_baseline(warm_dir, state.params,
                                        backbone=method_backbone(model)))

    # scalar stream (reference's optional tensorboardX writer,
    # methods/DKT.py:16-21): JSONL in <ckpt_dir>/log + TB if importable
    logger = MetricsLogger(os.path.join(ckpt_dir, "log"))

    import contextlib

    from deep_kernel_transfer_tpu.utils.profiling import trace

    profile_dir = getattr(params_cli, "profile_dir", None)
    max_acc = 0.0
    for epoch in range(start_epoch, stop_epoch):
        profile_ctx = (trace(profile_dir)
                       if profile_dir and epoch == start_epoch
                       else contextlib.nullcontext())
        if isinstance(model, DKT):
            # reference DKT.py:114-115; fresh opt state re-replicated on mesh
            state = maybe_replicate(model.reset_opt_state(state))
        # metrics stay ON DEVICE between print_freq boundaries: float()-ing
        # every step would force a host sync per episode batch and serialise
        # the dispatch pipeline (the async dispatch queue is what overlaps
        # host episode prep with TPU compute)
        losses, i = [], 0
        extra, last_m = {}, None
        print_freq = 10

        def print_progress(m_last, last_xb):
            nonlocal extra
            extra = {k: float(v) for k, v in m_last.items() if k != "loss"}
            avg_loss = float(jnp.mean(jnp.stack(losses)))
            line = (f"Epoch {epoch} | Batch {i}/{n_batches} | "
                    f"Loss {avg_loss:.6f}")
            if isinstance(model, DKT):
                # GP support/query accuracy + z_support histogram every
                # print_freq (reference methods/DKT.py:167-196)
                tele = model.train_telemetry(state.params, last_xb)
                acc_s = float(tele["GP_support_accuracy"])
                acc_q = float(tele["GP_query_accuracy"])
                it = epoch * n_batches + i
                logger.log_scalars(
                    it, loss=float(m_last["loss"]),
                    GP_support_accuracy=acc_s,
                    GP_query_accuracy=acc_q, **extra)
                logger.log_histogram(it, "z_support",
                                     np.asarray(tele["z_support"]))
                hyp = " | ".join(f"{k.capitalize()} {v:f}"
                                 for k, v in extra.items())
                line += (f" | {hyp} | Supp. {acc_s:.2f} | "
                         f"Query {acc_q:.2f}")
            print(line)

        with profile_ctx:
          if fused_chunk is not None:
            ekey = jax.random.PRNGKey(params_cli.seed * 100003 + epoch)
            while i < nb_full_tr:
                ln = min(print_freq, nb_full_tr - i)
                ekey, sub = jax.random.split(ekey)
                state, ms, last_xb = fused_chunk(state, sub, ln)
                losses.extend(list(ms["loss"]))
                i += ln
                last_m = {k: v[-1] for k, v in ms.items()}
                if i % print_freq == 0:  # same cadence as the batch loop
                    print_progress(last_m, last_xb)
            if fused_chunk_rem is not None:
                # final partial batch, same count as the streaming loader
                ekey, sub = jax.random.split(ekey)
                state, ms, last_xb = fused_chunk_rem(state, sub, 1)
                losses.extend(list(ms["loss"]))
                i += 1
                last_m = {k: v[-1] for k, v in ms.items()}
                if i % print_freq == 0:
                    print_progress(last_m, last_xb)
          else:
            for xb in base_iter(epoch):
                xb = jnp.asarray(xb)
                state, m = train_step(state, xb)
                losses.append(m["loss"])
                i += 1
                last_m = m
                if i % print_freq == 0:
                    print_progress(m, xb)
        if profile_dir and epoch == start_epoch:
            print(f"profile trace written to {profile_dir}")
        if last_m is not None:
            # epochs shorter than print_freq never hit print_progress;
            # the epoch-level scalars still get the final batch's
            # hyperparameters (reference logs them every episode)
            extra = {k: float(v) for k, v in last_m.items() if k != "loss"}
        epoch_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        if fused_val is not None:
            # validation fused the same way as training: full batches in
            # one scan dispatch, the remainder as a single extra batch
            from deep_kernel_transfer_tpu.data.device_dataset import (
                fused_protocol_accs,
            )

            vkey = jax.random.PRNGKey(
                params_cli.seed * 100003 + 50001 + epoch)
            acc = float(jnp.mean(fused_protocol_accs(
                fused_val, model, val_ds, state.params, vkey,
                params_cli.test_n_way, n_support, n_query, n_episodes,
                episode_batch)))
        else:
            acc = _val_acc(model, state.params, val_iter(epoch),
                           eval_fn=eval_batch)
        print(f"Epoch {epoch} | Val acc {acc:.2f}%")
        # epoch-scale scalars get their own tag: 'loss' is already logged
        # per-iteration above, and one tag on two step scales garbles
        # TensorBoard charts and JSONL consumers
        logger.log_scalars(epoch, epoch_loss=epoch_loss,
                           test_accuracy=acc, **extra)
        if acc > max_acc:  # reference train.py:57-60
            max_acc = acc
            save_checkpoint(os.path.join(ckpt_dir, "best_model.tar"),
                            state.params, epoch)
            print("best model! save...")
        if (epoch % params_cli.save_freq == 0) or (epoch == stop_epoch - 1):
            save_checkpoint(os.path.join(ckpt_dir, f"{epoch}.tar"),
                            state.params, epoch)
    logger.close()
    return state


def main(argv=None):
    enable_persistent_jit_cache()  # repeat CLI runs skip XLA recompiles
    params_cli = parse_args("train", argv)
    _set_seed(params_cli.seed)

    base_file, val_file = factory.resolve_data_files(params_cli)
    image_size = factory.resolve_image_size(params_cli)
    factory.check_model_constraints(params_cli)
    stop_epoch = (params_cli.stop_epoch if params_cli.stop_epoch != -1
                  else factory.default_stop_epoch(params_cli))

    ckpt_dir = factory.checkpoint_dir(params_cli)
    os.makedirs(ckpt_dir, exist_ok=True)
    print(f"checkpoint dir: {ckpt_dir} | epochs: {stop_epoch} | "
          f"devices: {jax.device_count()}")

    if params_cli.method in ("baseline", "baseline++"):
        return train_baseline(params_cli, base_file, image_size, stop_epoch,
                              ckpt_dir)
    return train_meta(params_cli, base_file, val_file, image_size, stop_epoch,
                      ckpt_dir)


if __name__ == "__main__":
    main()
