"""Device-resident dataset + on-device augmentation tests.

Covers: HBM staging parity with the host TransformPipeline, the on-device
episode sampler's composition rules (reference data/dataset.py:29-87), and
the jit augmentation pipeline vs its PIL counterpart."""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image, ImageEnhance

from deep_kernel_transfer_tpu.data import TransformPipeline
from deep_kernel_transfer_tpu.data.device_aug import (
    _crop_resize,
    apply_jitter,
    augment,
)
from deep_kernel_transfer_tpu.data.device_dataset import (
    DeviceDataset,
    fits_budget,
)


@pytest.fixture(scope="module")
def filelist(tmp_path_factory):
    """5 classes x {8,8,8,3,8} images, 24x24 px (one class smaller than
    S+Q to exercise the with-replacement fallback)."""
    root = tmp_path_factory.mktemp("dds")
    rng = np.random.RandomState(7)
    names, labels = [], []
    sizes = [8, 8, 8, 3, 8]
    for cl, n in enumerate(sizes):
        for i in range(n):
            arr = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
            p = str(root / f"c{cl}_{i}.jpg")
            Image.fromarray(arr).save(p)
            names.append(p)
            labels.append(cl)
    jf = str(root / "novel.json")
    with open(jf, "w") as f:
        json.dump({"label_names": [f"c{i}" for i in range(5)],
                   "image_names": names, "image_labels": labels}, f)
    return jf


@pytest.fixture(scope="module")
def dds(filelist):
    return DeviceDataset(filelist, image_size=16)


def test_stage_and_shapes(dds):
    assert dds.images.dtype == jnp.uint8
    assert dds.images.shape == (35, 16, 16, 3)
    x = dds.sample_episodes(jax.random.PRNGKey(0), n_way=4, n_support=2,
                            n_query=3, batch=3)
    assert x.shape == (3, 4, 5, 16, 16, 3)
    assert x.dtype == jnp.uint8


def test_staged_pixels_match_host_pipeline(filelist, dds):
    tp = TransformPipeline(16, aug=False, output_uint8=True)
    with open(filelist) as f:
        meta = json.load(f)
    host = np.stack([tp.load(p) for p in meta["image_names"]])
    np.testing.assert_array_equal(np.asarray(dds.images), host)


def test_sampler_composition_rules(filelist, dds):
    """Ways are distinct; images within a large-enough way are distinct and
    belong to the sampled class; a too-small class still yields its own
    images (with replacement)."""
    with open(filelist) as f:
        meta = json.load(f)
    labels = np.asarray(meta["image_labels"])
    k = 5  # class 3 has only 3 images
    ids = np.asarray(dds.sample_episode_ids(jax.random.PRNGKey(1), 4, k, 8))
    assert ids.shape == (8, 4, k)
    for ep in ids:
        way_classes = [set(labels[w]) for w in ep]
        # each way's images all come from ONE class
        assert all(len(s) == 1 for s in way_classes)
        # ways are distinct classes
        flat = [next(iter(s)) for s in way_classes]
        assert len(set(flat)) == 4
        for w, cl in zip(ep, flat):
            if (labels == cl).sum() >= k:
                assert len(set(w.tolist())) == k  # without replacement
            else:
                assert set(np.unique(w)) <= set(np.where(labels == cl)[0])


def test_small_class_sampled_uniformly(dds):
    """The with-replacement fallback is EXACTLY uniform over a small
    class's images (floor(u * count) indexing — the wrap-tiled slot table
    would bias toward low-index images when width % count != 0)."""
    ids = np.asarray(dds.sample_episode_ids(jax.random.PRNGKey(2), 5, 6, 200))
    # class 3's images are global ids 24,25,26 (8+8+8 .. +3)
    small = ids[(ids >= 24) & (ids < 27)]
    assert small.size > 300  # enough draws for a tight bound
    counts = np.bincount(small - 24, minlength=3)
    # uniform => counts within ~5 sigma of each other
    assert counts.min() > 0.8 * counts.max(), counts


def test_epoch_iterator(dds):
    batches = list(dds.epoch(seed=0, n_way=3, n_support=1, n_query=2,
                             n_episodes=5, episode_batch=2))
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    # reseeded epoch reproduces exactly
    again = list(dds.epoch(seed=0, n_way=3, n_support=1, n_query=2,
                           n_episodes=5, episode_batch=2))
    np.testing.assert_array_equal(np.asarray(batches[0]), np.asarray(again[0]))


def test_fits_budget(filelist):
    assert fits_budget(filelist, 16)
    assert not fits_budget(filelist, 16, budget_bytes=1000)


# ---------------------------------------------------------------- device aug

def _smooth_image(s):
    y, x = np.mgrid[0:s, 0:s].astype(np.float32)
    r = 128 + 90 * np.sin(x / 6.0)
    g = 128 + 90 * np.cos(y / 7.0)
    b = (x + y) / (2 * s) * 255
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def test_crop_resize_matches_pil():
    img = _smooth_image(46)  # canvas for 40px target
    left, top, cw, ch = 5, 9, 30, 24
    ours = _crop_resize(jnp.asarray(img, jnp.float32), left, top, cw, ch, 40)
    ref = Image.fromarray(img).crop((left, top, left + cw, top + ch)).resize(
        (40, 40), Image.BILINEAR)
    diff = np.abs(np.asarray(ours) - np.asarray(ref, np.float32))
    assert diff.max() <= 3.0  # PIL uses uint8 fixed-point accumulation


def test_jitter_matches_pil():
    img = _smooth_image(32)
    factors = (0.7, 1.3, 0.6)  # Brightness, Contrast, Color
    ours = np.asarray(apply_jitter(jnp.asarray(img, jnp.float32),
                                   jnp.asarray(factors)))
    pil = Image.fromarray(img)
    pil = ImageEnhance.Brightness(pil).enhance(factors[0]).convert("RGB")
    pil = ImageEnhance.Contrast(pil).enhance(factors[1]).convert("RGB")
    pil = ImageEnhance.Color(pil).enhance(factors[2]).convert("RGB")
    diff = np.abs(ours - np.asarray(pil, np.float32))
    # PIL rounds to uint8 after EVERY enhancer; we stay in float
    assert diff.max() <= 3.0


def test_augment_end_to_end():
    rng = np.random.RandomState(0)
    x = (rng.rand(2, 3, 4, 18, 18, 3) * 255).astype(np.uint8)
    out = augment(jax.random.PRNGKey(0), jnp.asarray(x), 16)
    assert out.shape == (2, 3, 4, 16, 16, 3)
    assert out.dtype == jnp.uint8
    out2 = augment(jax.random.PRNGKey(0), jnp.asarray(x), 16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = augment(jax.random.PRNGKey(1), jnp.asarray(x), 16)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_canvas_staging(filelist):
    ds = DeviceDataset(filelist, image_size=16, canvas=True)
    s0 = int(16 * 1.15)
    assert ds.images.shape[1:] == (s0, s0, 3)
    x = ds.sample_episodes(jax.random.PRNGKey(0), 3, 1, 2, batch=2)
    out = augment(jax.random.PRNGKey(1), x, 16)
    assert out.shape == (2, 3, 3, 16, 16, 3)


def test_fused_epoch_and_eval(filelist):
    """make_fused_epoch / make_fused_eval: deterministic per seed, state
    advances, metrics/accs have the scan shape, last_batch is a real
    episode batch (train.py/test.py fast paths)."""
    from deep_kernel_transfer_tpu.data.device_dataset import (
        make_fused_epoch,
        make_fused_eval,
    )
    from deep_kernel_transfer_tpu.methods import ProtoNet
    from deep_kernel_transfer_tpu.models.backbones import Conv4S

    ds = DeviceDataset(filelist, image_size=16, canvas=True)
    model = ProtoNet(Conv4S(), n_way=3, n_support=1)
    state = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((3, 3, 16, 16, 3), jnp.float32))
    chunk = make_fused_epoch(model, ds, 3, 1, 2, episode_batch=2,
                             augment_to=16)
    key = jax.random.PRNGKey(5)
    s1, ms, last_x = chunk(state, key, 3)
    assert ms["loss"].shape == (3,)
    assert last_x.shape == (2, 3, 3, 16, 16, 3) and last_x.dtype == jnp.uint8
    assert not np.array_equal(np.asarray(jax.tree.leaves(s1.params)[0]),
                              np.asarray(jax.tree.leaves(state.params)[0]))
    s2, ms2, _ = chunk(state, key, 3)
    np.testing.assert_array_equal(np.asarray(ms["loss"]),
                                  np.asarray(ms2["loss"]))

    eval_ds = DeviceDataset(filelist, image_size=16)
    ev = make_fused_eval(model, eval_ds, 3, 1, 2, episode_batch=2)
    a1 = ev(state.params, key, 4)
    assert a1.shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(a1),
                                  np.asarray(ev(state.params, key, 4)))


def test_stage_cache_roundtrip(tmp_path, monkeypatch):
    """The staging decode cache: a second DeviceDataset construction reads
    the memoised uint8 tensor (the decoder is never called), and touching a
    source image invalidates the key."""
    import os

    from deep_kernel_transfer_tpu.data import device_dataset as dd

    rng = np.random.RandomState(3)
    names, labels = [], []
    for cl in range(2):
        for i in range(3):
            p = str(tmp_path / f"c{cl}_{i}.jpg")
            Image.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)
                            ).save(p)
            names.append(p)
            labels.append(cl)
    jf = str(tmp_path / "novel.json")
    with open(jf, "w") as f:
        json.dump({"label_names": ["a", "b"], "image_names": names,
                   "image_labels": labels}, f)

    ds1 = DeviceDataset(jf, image_size=16)
    imgs1 = np.asarray(ds1.images)
    npy, keyf = dd._stage_cache_paths(jf, 16, False)
    assert os.path.isfile(npy) and os.path.isfile(keyf)

    def boom(self, paths):
        raise AssertionError("decoder called despite a valid stage cache")

    monkeypatch.setattr(TransformPipeline, "load_batch", boom)
    ds2 = DeviceDataset(jf, image_size=16)
    np.testing.assert_array_equal(np.asarray(ds2.images), imgs1)

    # a touched source image invalidates the key -> cache miss
    os.utime(names[0], ns=(1, 1))
    assert dd._stage_cache_load(jf, names, 16, False)[0] is None

    # DKT_NO_STAGE_CACHE opts out entirely
    monkeypatch.setenv("DKT_NO_STAGE_CACHE", "1")
    assert dd._stage_cache_load(jf, names, 16, False)[0] is None
