"""Data pipeline tests: JSON filelist episodic sampling, transforms,
feature cache, sines/QMUL trajectory math."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from deep_kernel_transfer_tpu.data import (
    EpisodicDataLoader,
    SimpleDataLoader,
    TransformPipeline,
    init_loader,
    sample_feature_episode,
    save_features,
    sample_trajectory,
)


@pytest.fixture(scope="module")
def filelist(tmp_path_factory):
    """Tiny on-disk dataset: 6 classes x 8 images, 20x20 px."""
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    names, labels = [], []
    for cl in range(6):
        for i in range(8):
            arr = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
            p = str(root / f"c{cl}_{i}.jpg")
            Image.fromarray(arr).save(p)
            names.append(p)
            labels.append(cl)
    jf = str(root / "base.json")
    with open(jf, "w") as f:
        json.dump(
            {"label_names": [f"class_{i}" for i in range(6)],
             "image_names": names, "image_labels": labels}, f
        )
    return jf


def test_episodic_loader_shapes(filelist):
    loader = EpisodicDataLoader(
        filelist, image_size=16, n_way=5, n_support=2, n_query=3,
        n_episodes=4, episode_batch=2, aug=False, seed=0,
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].shape == (2, 5, 5, 16, 16, 3)
    assert batches[0].dtype == np.float32


def test_episodic_loader_aug_differs(filelist):
    a = EpisodicDataLoader(filelist, 16, 3, 2, 2, n_episodes=1, aug=True, seed=0)
    b = EpisodicDataLoader(filelist, 16, 3, 2, 2, n_episodes=1, aug=False, seed=0)
    xa = next(iter(a))
    xb = next(iter(b))
    assert xa.shape == xb.shape
    assert not np.allclose(xa, xb)


def test_simple_loader(filelist):
    loader = SimpleDataLoader(filelist, image_size=16, batch_size=8, aug=False)
    x, y = next(iter(loader))
    assert x.shape == (8, 16, 16, 3)
    assert y.shape == (8,)
    assert len(loader) == 6


def test_transform_normalization():
    img = Image.fromarray(np.full((20, 20, 3), 128, np.uint8))
    t = TransformPipeline(16, aug=False)
    out = t(img)
    # (128/255 - mean)/std per channel
    expected = (128 / 255 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-2)


def test_feature_cache_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    feats = rng.randn(40, 16).astype(np.float32)
    labels = np.repeat(np.arange(4), 10)
    p = str(tmp_path / "novel.hdf5")
    save_features(p, feats, labels)
    cl_data = init_loader(p)
    assert sorted(cl_data.keys()) == [0, 1, 2, 3]
    assert len(cl_data[0]) == 10
    ep = sample_feature_episode(cl_data, rng, n_way=3, n_support=2, n_query=4)
    assert ep.shape == (3, 6, 16)


def test_qmul_trajectory_math():
    rng = np.random.RandomState(0)
    curve = sample_trajectory(rng)
    assert len(curve) == 19
    pitches = [p for p, a in curve]
    angles = [a for p, a in curve]
    assert angles == [x * 10 for x in range(19)]
    # pitches land on the 10-degree grid within [60, 120]
    assert all(p % 10 == 0 for p in pitches)
    assert all(0 <= p <= 130 for p in pitches)


def test_eval_loader_cache_reuses_and_matches(tmp_path):
    """aug=False loaders cache transformed arrays (LRU); cached and
    uncached loaders yield identical episodes, and the cache is bounded."""
    import json

    import numpy as np
    from PIL import Image

    from deep_kernel_transfer_tpu.data import EpisodicDataLoader

    rng = np.random.RandomState(0)
    names, labels = [], []
    for cl in range(4):
        for i in range(6):
            p = tmp_path / f"c{cl}_{i}.jpg"
            Image.fromarray((rng.rand(28, 28, 3) * 255).astype(np.uint8)).save(p)
            names.append(str(p)); labels.append(cl)
    meta = {"label_names": list("abcd"), "image_names": names,
            "image_labels": labels}
    f = tmp_path / "novel.json"
    json.dump(meta, open(f, "w"))

    kw = dict(image_size=28, n_way=3, n_support=2, n_query=2, n_episodes=6,
              episode_batch=2, aug=False, seed=7, prefetch=False)
    cached = EpisodicDataLoader(str(f), cache_bytes=1 << 26, **kw)
    uncached = EpisodicDataLoader(str(f), cache_bytes=0, **kw)
    for a, b in zip(cached, uncached):
        np.testing.assert_allclose(a, b)
    assert cached._cache.nbytes > 0
    # tiny cap forces eviction but never exceeds the cap
    tiny = EpisodicDataLoader(str(f), cache_bytes=2 * 28 * 28 * 3 * 4 + 1, **kw)
    for _ in tiny:
        pass
    assert tiny._cache.nbytes <= tiny._cache.cap


def test_uint8_pipeline_matches_f32(tmp_path):
    """uint8 host pipeline + device-side normalisation == the f32 pipeline
    within one quantisation step (TPU-first: 4x less host->device bytes)."""
    import json

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from deep_kernel_transfer_tpu.data import EpisodicDataLoader
    from deep_kernel_transfer_tpu.models.backbones import (
        ConvNetS,
        preprocess_input,
    )

    rng = np.random.RandomState(0)
    names, labels = [], []
    for cl in range(3):
        for i in range(5):
            p = tmp_path / f"c{cl}_{i}.jpg"
            Image.fromarray((rng.rand(28, 28, 3) * 255).astype(np.uint8)).save(p)
            names.append(str(p)); labels.append(cl)
    f = tmp_path / "novel.json"
    json.dump({"label_names": list("abc"), "image_names": names,
               "image_labels": labels}, open(f, "w"))

    kw = dict(image_size=28, n_way=3, n_support=2, n_query=2, n_episodes=2,
              episode_batch=1, aug=False, seed=3, prefetch=False)
    xb_f32 = next(iter(EpisodicDataLoader(str(f), **kw)))
    xb_u8 = next(iter(EpisodicDataLoader(str(f), output_uint8=True, **kw)))
    assert xb_u8.dtype == np.uint8
    # device-side normalisation of the uint8 batch == the f32 batch
    normed = np.asarray(preprocess_input(jnp.asarray(xb_u8)))
    assert np.abs(normed - xb_f32).max() < (1.0 / 255.0 / 0.22) + 1e-5

    # trunk features agree within quantisation
    bb = ConvNetS(depth=2)
    v = bb.init(jax.random.PRNGKey(0), jnp.asarray(xb_f32[0, 0]))
    z32 = bb.apply(v, jnp.asarray(xb_f32[0].reshape(-1, 28, 28, 3)), train=False)
    zu8 = bb.apply(v, jnp.asarray(xb_u8[0].reshape(-1, 28, 28, 3)), train=False)
    assert float(jnp.abs(z32 - zu8).max()) < 0.15


def test_prefetch_early_exit_joins_producer(filelist):
    """Abandoning an epoch mid-iteration must leave no live producer thread
    racing the next epoch over the shared LRU cache and RNG."""
    import threading

    loader = EpisodicDataLoader(
        filelist, image_size=16, n_way=3, n_support=1, n_query=1,
        n_episodes=8, episode_batch=2, aug=False, seed=3, prefetch=True)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # what breaking out of a for-loop does
    assert threading.active_count() == before  # producer joined
    # second epoch runs cleanly end to end with the full batch count
    batches = list(loader)
    assert len(batches) == len(loader)


def test_fallback_crop_box_is_centered_min_square():
    from deep_kernel_transfer_tpu.data.transforms import fallback_crop_box

    assert fallback_crop_box(500, 330) == (85, 0, 330, 330)
    assert fallback_crop_box(330, 500) == (0, 85, 330, 330)
    assert fallback_crop_box(64, 64) == (0, 0, 64, 64)


def test_aug_rng_parity_native_vs_pil(tmp_path):
    """A native-unsupported format (GIF) mid-list must not shift the RNG
    stream: a native-built pipeline and a PIL-only pipeline with the same
    seed must produce the same augmentations for every image."""
    from deep_kernel_transfer_tpu import native

    if not native.available():
        pytest.skip("native pipeline not built")
    rng = np.random.RandomState(1)
    paths = []
    for i, ext in enumerate(["jpg", "gif", "jpg"]):
        arr = (rng.rand(40, 30, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img{i}.{ext}")
        Image.fromarray(arr).save(p)
        paths.append(p)
    mk = lambda use_native: TransformPipeline(
        image_size=16, aug=True, seed=11, use_native=use_native,
        output_uint8=True)
    pil_pipe, nat_pipe = mk(False), mk(True)
    assert nat_pipe.use_native
    for p in paths:
        a = pil_pipe.load(p)
        b = nat_pipe.load(p)
        # same draws -> same geometry/flip; decode/resample differs by
        # <= a couple of u8 LSBs between PIL and the native resampler
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 3.0, p
    # streams fully consumed in lockstep
    assert pil_pipe.rng.randint(1 << 30) == nat_pipe.rng.randint(1 << 30)


def test_byte_capped_lru_evicts_lru_first():
    from deep_kernel_transfer_tpu.data.lru import ByteCappedLRU

    item = lambda v: np.full(4, v, np.uint8)  # 4 bytes each
    loads = []

    def load(key):
        loads.append(key)
        return item(int(key))

    lru = ByteCappedLRU(8)  # fits two items
    lru.get_or_load("1", load)
    lru.get_or_load("2", load)
    lru.get_or_load("1", load)  # hit; refreshes recency
    lru.get_or_load("3", load)  # evicts "2" (least recent), not "1"
    assert loads == ["1", "2", "3"]
    lru.get_or_load("1", load)  # still cached
    assert loads == ["1", "2", "3"]
    lru.get_or_load("2", load)  # was evicted -> reloaded
    assert loads == ["1", "2", "3", "2"]
    assert lru.nbytes <= 8
    # oversized item returned uncached without flushing
    big = lru.get_or_load("9", lambda k: np.zeros(64, np.uint8))
    assert big.nbytes == 64 and lru.nbytes <= 8
    # cap 0 disables caching entirely
    off = ByteCappedLRU(0)
    off.get_or_load("1", load)
    off.get_or_load("1", load)
    assert loads[-2:] == ["1", "1"] and len(off) == 0
