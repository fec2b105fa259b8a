"""End-to-end CLI smoke tests on a synthetic on-disk dataset.

Exercises the full reference-compatible surface (SURVEY.md §3 call stacks):
train.py -> checkpoint -> test.py -> record/results.txt, and the
save_features.py -> feature_evaluation path, against a generated
omniglot-like filelist dataset (28px, Conv4->Conv4S rule).
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

import test as test_cli
import train as train_cli

N_CLASSES, N_IMG = 6, 20


@pytest.fixture(scope="module")
def dataset_cwd(tmp_path_factory):
    root = tmp_path_factory.mktemp("repo_cwd")
    img_dir = root / "filelists" / "omniglot" / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    names, labels = [], []
    for cl in range(N_CLASSES):
        for i in range(N_IMG):
            arr = (rng.rand(28, 28, 3) * 60).astype(np.uint8)
            r, c = divmod(cl, 3)
            arr[r * 12:r * 12 + 10, c * 9:c * 9 + 8] += 150  # class signature
            p = img_dir / f"c{cl}_{i}.jpg"
            Image.fromarray(arr).save(p)
            names.append(str(p))
            labels.append(cl)
    meta = {"label_names": [f"c{i}" for i in range(N_CLASSES)],
            "image_names": names, "image_labels": labels}
    (root / "filelists" / "CUB").mkdir(parents=True)
    for split in ("base", "val", "novel"):
        with open(root / "filelists" / "omniglot" / f"{split}.json", "w") as f:
            json.dump(meta, f)
        with open(root / "filelists" / "CUB" / f"{split}.json", "w") as f:
            json.dump(meta, f)  # aug-capable dataset (omniglot forbids aug)
    old = os.getcwd()
    os.chdir(root)
    yield root
    os.chdir(old)


COMMON = ["--dataset=omniglot", "--model=Conv4", "--train_n_way=3",
          "--test_n_way=3", "--n_shot=2", "--seed=1"]


def _ensure_dkt_ckpt():
    """Self-provision the DKT checkpoint so tests run under -k selection."""
    ckpt = "save/checkpoints/omniglot/Conv4S_DKT_3way_2shot/best_model.tar"
    if not os.path.isfile(ckpt):
        train_cli.main(COMMON + ["--method=DKT", "--stop_epoch=1",
                                 "--n_train_episodes=10"])
    return ckpt


def _ensure_protonet_features():
    """Self-provision the protonet checkpoint + novel feature cache."""
    import save_features as sf_cli

    ckpt = "save/checkpoints/omniglot/Conv4S_protonet_3way_2shot/best_model.tar"
    if not os.path.isfile(ckpt):
        train_cli.main(COMMON + ["--method=protonet", "--stop_epoch=1",
                                 "--n_train_episodes=3"])
    feat = "save/features/omniglot/Conv4S_protonet_3way_2shot/novel.hdf5"
    if not os.path.isfile(feat):
        sf_cli.main(COMMON + ["--method=protonet", "--split=novel"])
    return ckpt, feat


def test_train_and_test_dkt_from_images(dataset_cwd):
    train_cli.main(COMMON + ["--method=DKT", "--stop_epoch=1",
                             "--n_train_episodes=10"])
    ckpt = "save/checkpoints/omniglot/Conv4S_DKT_3way_2shot/best_model.tar"
    assert os.path.isfile(ckpt)

    # train telemetry (reference methods/DKT.py:167-196): GP support/query
    # accuracy scalars + z_support histogram land in the metrics stream
    log = "save/checkpoints/omniglot/Conv4S_DKT_3way_2shot/log/metrics.jsonl"
    assert os.path.isfile(log)
    txt = open(log).read()
    assert "GP_support_accuracy" in txt and "GP_query_accuracy" in txt
    assert "z_support/mean" in txt

    test_cli.main(COMMON + ["--method=DKT", "--n_iter=2", "--repeat=1"])
    assert os.path.isfile("record/results.txt")
    assert "omniglot-Conv4S-DKT" in open("record/results.txt").read()


def test_train_save_features_and_test_protonet(dataset_cwd):
    import save_features as sf_cli

    train_cli.main(COMMON + ["--method=protonet", "--stop_epoch=1",
                             "--n_train_episodes=3"])
    sf_cli.main(COMMON + ["--method=protonet", "--split=novel"])
    feat = "save/features/omniglot/Conv4S_protonet_3way_2shot/novel.hdf5"
    assert os.path.isfile(feat)

    test_cli.main(COMMON + ["--method=protonet", "--n_iter=2", "--repeat=1"])
    txt = open("record/results.txt").read()
    assert "omniglot-Conv4S-protonet" in txt


def test_save_features_device_path_parity(dataset_cwd):
    """save_features --device_data on (HBM-staged split, on-device slices)
    vs off (streaming host loader) write the SAME feature multiset: pixels
    come from the same TransformPipeline and eval-mode BN is deterministic,
    so only the row order (staged class-major vs loader order) may differ."""
    import save_features as sf_cli
    from deep_kernel_transfer_tpu.data.feature_cache import init_loader

    ckpt, feat = _ensure_protonet_features()

    sf_cli.main(COMMON + ["--method=protonet", "--split=novel",
                          "--device_data=on"])
    by_class_on = init_loader(feat)
    sf_cli.main(COMMON + ["--method=protonet", "--split=novel",
                          "--device_data=off"])
    by_class_off = init_loader(feat)

    assert sorted(by_class_on) == sorted(by_class_off)
    for cl in by_class_on:
        a = np.sort(np.stack(by_class_on[cl]), axis=0)
        b = np.sort(np.stack(by_class_off[cl]), axis=0)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_dkt_laplace_and_adaptation_heads(dataset_cwd):
    """--laplace (Laplace GPC head) and --adaptation (GP hyperparameter
    finetune) test-time variants over the trained DKT checkpoint."""
    _ensure_dkt_ckpt()
    # episode_batch=2: the special heads batch episodes like the standard
    # path (batch_correct_laplace / batch_correct_adapted)
    test_cli.main(COMMON + ["--method=DKT", "--n_iter=2", "--repeat=1",
                            "--episode_batch=2", "--laplace"])
    test_cli.main(COMMON + ["--method=DKT", "--n_iter=2", "--repeat=1",
                            "--episode_batch=2", "--adaptation"])
    txt = open("record/results.txt").read()
    assert "-adapted" in txt


def test_uncertainty_cli_runs_after_dkt(dataset_cwd):
    """ECE + temperature-scaling pipeline over the DKT checkpoint
    (reference test_uncertainty.py protocol)."""
    import test_uncertainty as tu_cli

    # reuses (or provisions) the DKT checkpoint
    _ensure_dkt_ckpt()
    tu_cli.main(COMMON + ["--method=DKT", "--n_iter=2", "--repeat=1"])


def test_relationnet_feature_path_keeps_spatial_maps(dataset_cwd):
    """relationnet caches UNPOOLED feature maps (reference
    save_features.py:94-100) and evaluates from them."""
    import h5py

    import save_features as sf_cli

    train_cli.main(COMMON + ["--method=relationnet", "--stop_epoch=1",
                             "--n_train_episodes=2"])
    sf_cli.main(COMMON + ["--method=relationnet", "--split=novel"])
    feat = "save/features/omniglot/Conv4S_relationnet_3way_2shot/novel.hdf5"
    with h5py.File(feat) as f:
        assert f["all_feats"].ndim == 4  # [N, h, w, c] spatial maps
    test_cli.main(COMMON + ["--method=relationnet", "--n_iter=2",
                            "--repeat=1"])
    assert "omniglot-Conv4S-relationnet" in open("record/results.txt").read()


def test_uncertainty_feature_method_protonet(dataset_cwd):
    """Feature-cache calibration path (reference test_uncertainty.py:201-224):
    logits come from sampled feature episodes, not raw images."""
    import test_uncertainty as tu_cli

    _ensure_protonet_features()
    tu_cli.main(COMMON + ["--method=protonet", "--n_iter=2", "--repeat=1"])


def test_baseline_pp_full_pipeline_with_uncertainty(dataset_cwd):
    """baseline++: pretrain -> save_features -> test.py (BaselineFinetune
    head) -> test_uncertainty (reference test_uncertainty.py:105-108 builds
    BaselineFinetune and never loads a meta checkpoint)."""
    import save_features as sf_cli
    import test_uncertainty as tu_cli

    train_cli.main(COMMON + ["--method=baseline++", "--stop_epoch=1",
                             "--num_classes=4112"])
    sf_cli.main(COMMON + ["--method=baseline++", "--split=novel"])
    test_cli.main(COMMON + ["--method=baseline++", "--n_iter=2", "--repeat=1"])
    assert "omniglot-Conv4S-baseline++" in open("record/results.txt").read()
    tu_cli.main(COMMON + ["--method=baseline++", "--n_iter=2", "--repeat=1"])


def test_baseline_num_classes_guard(dataset_cwd):
    """A too-small softmax head on omniglot must fail loudly
    (reference train.py:119-123), not clip labels silently."""
    with pytest.raises(AssertionError, match="num_classes"):
        train_cli.main(COMMON + ["--method=baseline", "--stop_epoch=1",
                                 "--num_classes=200"])


def test_matchingnet_feature_path(dataset_cwd):
    """MatchingNet through save_features + feature evaluation."""
    import save_features as sf_cli

    train_cli.main(COMMON + ["--method=matchingnet", "--stop_epoch=1",
                             "--n_train_episodes=2"])
    sf_cli.main(COMMON + ["--method=matchingnet", "--split=novel"])
    test_cli.main(COMMON + ["--method=matchingnet", "--n_iter=2",
                            "--repeat=1"])
    assert "omniglot-Conv4S-matchingnet" in open("record/results.txt").read()


def test_device_data_train_aug_and_eval_toggle(dataset_cwd):
    """Device-resident path (--device_data): canvas-staged training with
    on-device augmentation (data/device_aug.py), then eval with the HBM
    sampler ON vs the host loader OFF — both must complete end-to-end and
    log results (the auto default already covers ON elsewhere). Uses the
    CUB fixture at 84px: omniglot forbids augmentation (factory rule)."""
    cub = ["--dataset=CUB", "--model=Conv4", "--train_n_way=3",
           "--test_n_way=3", "--n_shot=2", "--seed=1", "--train_aug"]
    train_cli.main(cub + ["--method=DKT", "--stop_epoch=1",
                          "--n_train_episodes=6", "--device_data=on"])
    ckpt = "save/checkpoints/CUB/Conv4_DKT_aug_3way_2shot/best_model.tar"
    assert os.path.isfile(ckpt)
    test_cli.main(cub + ["--method=DKT", "--n_iter=2", "--repeat=1",
                         "--device_data=on"])
    test_cli.main(cub + ["--method=DKT", "--n_iter=2", "--repeat=1",
                         "--device_data=off"])
    assert "CUB-Conv4-DKT-aug" in open("record/results.txt").read()


def test_maml_cli_device_data(dataset_cwd):
    """MAML with device-resident data: the per-batch loop (MAML is
    excluded from the fused epoch — compile blow-up) plus the fused test
    eval. Uses the CUB fixture so the omniglot n_task=32 override doesn't
    blow up the test budget."""
    cub = ["--dataset=CUB", "--model=Conv4", "--train_n_way=3",
           "--test_n_way=3", "--n_shot=2", "--seed=1"]
    train_cli.main(cub + ["--method=maml_approx", "--stop_epoch=1",
                          "--n_train_episodes=4", "--device_data=on"])
    ckpt = "save/checkpoints/CUB/Conv4_maml_approx_3way_2shot/best_model.tar"
    assert os.path.isfile(ckpt)
    test_cli.main(cub + ["--method=maml_approx", "--n_iter=2", "--repeat=1",
                         "--device_data=on"])
    assert "CUB-Conv4-maml_approx" in open("record/results.txt").read()


def test_episode_parallel_mesh_cli(dataset_cwd):
    """--n_devices episode-parallel path end-to-end on the virtual 8-CPU
    mesh: sharded train step (device-data sampler sharded over the mesh),
    sharded 8-episode eval batches with a wrap-padded final partial batch
    (10 % 8 != 0)."""
    train_cli.main(COMMON + ["--method=DKT", "--stop_epoch=1",
                             "--n_train_episodes=8", "--episode_batch=8",
                             "--n_devices=8"])
    ckpt = "save/checkpoints/omniglot/Conv4S_DKT_3way_2shot/best_model.tar"
    assert os.path.isfile(ckpt)
    test_cli.main(COMMON + ["--method=DKT", "--n_iter=10", "--repeat=1",
                            "--episode_batch=8", "--n_devices=8"])
    assert "omniglot-Conv4S-DKT" in open("record/results.txt").read()


def test_reference_torch_checkpoint_in_test_cli(dataset_cwd):
    """A user's REFERENCE torch checkpoint (torch.save payload with the
    reference's state_dict key layout) dropped into the checkpoint dir is
    imported transparently by test.py (utils/torch_import.py)."""
    torch = pytest.importorskip("torch")
    from test_torch_import import TConvNet, _randomize, _state

    t = _randomize(TConvNet(4, in_ch=1), seed=11)
    t.trunk.add_module("bn_out", torch.nn.BatchNorm1d(64))
    _randomize(t.trunk.bn_out, seed=12)
    state = _state(t)
    rng = np.random.RandomState(11)
    for w in range(3):
        p = f"model.models.{w}."
        state[f"{p}mean_module.raw_constant"] = torch.tensor(
            float(rng.randn()) * 0.1)
        state[f"{p}covar_module.raw_outputscale"] = torch.tensor(
            float(rng.randn()))
    state = {k: (torch.as_tensor(v) if not torch.is_tensor(v) else v)
             for k, v in state.items()}
    ckpt_dir = "save/checkpoints/omniglot/Conv4S_DKT_3way_2shot"
    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save({"epoch": 99, "state": state}, f"{ckpt_dir}/99.tar")

    test_cli.main(COMMON + ["--method=DKT", "--n_iter=2", "--repeat=1",
                            "--save_iter=99"])
    assert "omniglot-Conv4S-DKT" in open("record/results.txt").read()

def test_export_checkpoint_cli(dataset_cwd, tmp_path):
    """export_checkpoint.py turns a trained npz checkpoint into a
    reference-format torch.save file with the reference's key layout
    (utils/torch_export.py; reference train.py:57-65)."""
    torch = pytest.importorskip("torch")
    import export_checkpoint as export_cli

    _ensure_dkt_ckpt()
    out = str(tmp_path / "exported.torch.tar")
    export_cli.main(COMMON + ["--method=DKT", f"--out={out}"])

    blob = torch.load(out, map_location="cpu", weights_only=False)
    state = blob["state"]
    for k in ("feature.trunk.0.C.weight", "feature.trunk.0.trunk.0.weight",
              "feature.trunk.3.BN.running_var",
              "feature.trunk.bn_out.running_mean",
              "model.models.0.covar_module.raw_outputscale",
              "model.models.2.likelihood.noise_covar.raw_noise"):
        assert k in state, k
    assert state["feature.trunk.0.C.weight"].shape == (64, 1, 3, 3)
    # noise constraint inverse: softplus(raw) + 1e-4 == fixed 0.1
    raw = float(state["model.models.0.likelihood.noise_covar.raw_noise"])
    assert abs(float(np.log1p(np.exp(raw))) + 1e-4 - 0.1) < 1e-6


def test_train_resume_episodic(dataset_cwd, capsys):
    """train.py --resume continues an episodic run from its last
    save_freq checkpoint (epoch 0 is always saved: 0 % save_freq == 0).
    Uses its own n_shot so no other test's checkpoints share the dir."""
    own = ["--dataset=omniglot", "--model=Conv4", "--train_n_way=3",
           "--test_n_way=3", "--n_shot=4", "--seed=1", "--method=DKT",
           "--n_train_episodes=6"]
    ckpt_dir = "save/checkpoints/omniglot/Conv4S_DKT_3way_4shot"
    train_cli.main(own + ["--stop_epoch=1"])
    assert os.path.isfile(f"{ckpt_dir}/0.tar")
    train_cli.main(own + ["--stop_epoch=2", "--resume"])
    out = capsys.readouterr().out
    assert "resumed from" in out and "(epoch 0)" in out
    assert os.path.isfile(f"{ckpt_dir}/1.tar")


def test_uncertainty_rejects_maml_way_mismatch(dataset_cwd):
    """maml is change_way=False (reference maml.py:13): calibrating at a
    different test_n_way must fail loudly, not produce a bogus ECE."""
    import test_uncertainty as unc_cli

    with pytest.raises(AssertionError, match="test_n_way"):
        unc_cli.main(["--dataset=omniglot", "--model=Conv4", "--seed=1",
                      "--method=maml", "--train_n_way=3", "--test_n_way=2",
                      "--n_shot=2", "--n_iter=1"])
