"""QMUL regression track on a generated synthetic face-image grid.

Exercises the full path: trajectory sampling -> image loading (reference
data/qmul_loader.py filename scheme person_<pitch>_<angle>.jpg) -> Conv3
features -> ExactGP train/test (reference methods/DKT_regression.py)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from deep_kernel_transfer_tpu.data import qmul
from deep_kernel_transfer_tpu.methods import DKTRegression, FeatureTransfer
from deep_kernel_transfer_tpu.models.backbones import Conv3

PEOPLE = ["AliceGrey", "BobGrey"]
SIZE = 40  # small images keep Conv3 compiles fast; Conv3 is size-agnostic


@pytest.fixture(scope="module")
def qmul_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("qmul")
    rng = np.random.RandomState(0)
    for person in PEOPLE:
        d = root / "images" / person
        d.mkdir(parents=True)
        # full (pitch, angle) grid the trajectory sampler can hit
        for pitch in range(0, 130, 10):
            for angle in range(0, 190, 10):
                # brightness encodes pitch so the task is learnable
                arr = np.full((SIZE, SIZE, 3), int(pitch * 255 / 120), np.uint8)
                arr += (rng.rand(SIZE, SIZE, 3) * 20).astype(np.uint8)
                name = f"{person[:-4]}_{qmul._num_to_str(pitch)}_{qmul._num_to_str(angle)}.jpg"
                Image.fromarray(arr).save(d / name)
    return str(root / "images") + "/"


def test_get_batch_shapes_and_targets(qmul_dir):
    rng = np.random.RandomState(1)
    x, y = qmul.get_batch(PEOPLE, rng, prefix=qmul_dir)
    assert x.shape == (2, 19, SIZE, SIZE, 3)
    assert y.shape == (2, 19)
    assert np.all((y >= -1.001) & (y <= 1.001))  # normalised pitch
    # both people share the trajectory -> identical targets
    np.testing.assert_allclose(y[0], y[1])


def test_dkt_regression_on_qmul_images(qmul_dir):
    rng = np.random.RandomState(2)
    model = DKTRegression(Conv3(), feat_dim=2916, kernel_type="rbf", lr=1e-3)
    x, y = qmul.get_batch(PEOPLE, rng, prefix=qmul_dir)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))
    for _ in range(3):
        xb, yb = qmul.get_batch(PEOPLE, rng, prefix=qmul_dir)
        state, m = model.train_step(state, jnp.asarray(xb), jnp.asarray(yb))
        assert np.isfinite(float(m["loss"]))
    # test protocol: condition on 5 of 19 points, MSE over all 19
    # (reference methods/DKT_regression.py:66-97)
    xt, yt = qmul.get_batch(PEOPLE[:1], rng, prefix=qmul_dir)
    support_idx = rng.choice(19, 5, replace=False)
    mse = model.test_mse(state.params, jnp.asarray(xt[0][support_idx]),
                         jnp.asarray(yt[0][support_idx]),
                         jnp.asarray(xt[0]), jnp.asarray(yt[0]))
    assert np.isfinite(mse)


def test_feature_transfer_on_qmul_images(qmul_dir):
    rng = np.random.RandomState(3)
    model = FeatureTransfer(Conv3())
    x, y = qmul.get_batch(PEOPLE, rng, prefix=qmul_dir)
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))
    state, m = model.train_step(state, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(m["loss"]))
    mse = model.test_mse(state, jnp.asarray(x[0][:5]), jnp.asarray(y[0][:5]),
                         jnp.asarray(x[0]), jnp.asarray(y[0]))
    assert np.isfinite(mse)


def test_dkt_regression_spectral_full_dim(qmul_dir):
    """Spectral-mixture kernel at the reference's full ard_num_dims
    (reference methods/DKT_regression.py:122 uses 2916 = Conv3 dim; our
    small test images give a smaller dim, derived from the trunk output)."""
    rng = np.random.RandomState(4)
    x, y = qmul.get_batch(PEOPLE, rng, prefix=qmul_dir)
    # derive the actual Conv3 feature dim for SIZE-px inputs
    bb = Conv3()
    v = bb.init(jax.random.PRNGKey(0), jnp.asarray(x[0][:1]))
    d = int(bb.apply(v, jnp.asarray(x[0][:1])).shape[-1])
    model = DKTRegression(Conv3(), feat_dim=d, kernel_type="spectral")
    state = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))
    state, m = model.train_step(state, jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(m["loss"]))


def test_train_regression_cli_resume(qmul_dir, monkeypatch, tmp_path):
    """train_regression.py end-to-end incl. --resume (QMUL track CLI)."""
    import os
    import shutil

    import train_regression as tr_cli

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        dst = tmp_path / "filelists" / "QMUL" / "images"
        shutil.copytree(qmul_dir, dst)
        monkeypatch.setattr(tr_cli, "train_people", PEOPLE)
        tr_cli.main(["--dataset=QMUL", "--model=Conv3", "--method=DKT",
                     "--stop_epoch=2"])
        assert os.path.isfile("save/checkpoints/QMUL/Conv3_DKT/best_model.tar")
        tr_cli.main(["--dataset=QMUL", "--model=Conv3", "--method=DKT",
                     "--stop_epoch=3", "--resume"])
    finally:
        os.chdir(cwd)
