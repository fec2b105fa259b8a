"""Native C++ image pipeline vs the PIL reference implementation."""
import numpy as np
import pytest
from PIL import Image

from deep_kernel_transfer_tpu import native
from deep_kernel_transfer_tpu.data.transforms import (
    TransformPipeline,
    load_image,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native pipeline did not build")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    arr = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
    jpg, png = str(d / "t.jpg"), str(d / "t.png")
    Image.fromarray(arr).save(jpg, quality=95)
    Image.fromarray(arr).save(png)
    gray = str(d / "g.png")
    Image.fromarray((rng.rand(50, 60) * 255).astype(np.uint8), "L").save(gray)
    return jpg, png, gray


def test_image_size(images):
    jpg, png, _ = images
    assert native.image_size(jpg) == (120, 100)
    assert native.image_size(png) == (120, 100)


def test_eval_matches_pil_within_quantisation(images):
    # PIL rounds to uint8 after its resize; the native path stays float, so
    # agreement is bounded by one u8 LSB in normalised units (~0.0175)
    for path in images:
        pil = TransformPipeline(84, aug=False, use_native=False)(
            load_image(path))
        nat = native.load_eval(path, 84)
        assert nat.shape == (84, 84, 3)
        assert np.abs(pil - nat).max() < 0.02, path


def test_aug_path_runs_and_flips(images):
    jpg = images[0]
    a = native.load_aug(jpg, 64, (5, 5, 80, 90), (1.0, 1.0, 1.0), False)
    b = native.load_aug(jpg, 64, (5, 5, 80, 90), (1.0, 1.0, 1.0), True)
    assert a.shape == (64, 64, 3)
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-6)
    # identity jitter == no jitter; non-identity changes pixels
    c = native.load_aug(jpg, 64, (5, 5, 80, 90), (1.3, 0.8, 1.1), False)
    assert np.abs(c - a).max() > 0.01


def test_aug_jitter_matches_pil_enhancers(images):
    # deterministic comparison: full-image crop, fixed factors, PIL chain
    from deep_kernel_transfer_tpu.data.transforms import (
        image_jitter,
        to_array,
    )
    jpg = images[0]
    img = load_image(jpg)
    w, h = img.size
    factors = (1.2, 0.7, 1.3)

    class FixedRng:
        def rand(self, n=None):
            # image_jitter uses alpha*(rand*2-1)+1 with alphas 0.4
            import numpy as _np
            return _np.array([(f - 1) / 0.4 / 2 + 0.5 for f in factors])

    resized = img.resize((64, 64), Image.BILINEAR)
    pil = to_array(image_jitter(resized, FixedRng()))
    nat = native.load_aug(jpg, 64, (0, 0, w, h), factors, False)
    # two rounds of u8 quantisation in the PIL chain -> a few LSB tolerance
    assert np.abs(pil - nat).mean() < 0.03


def test_pipeline_uses_native_and_matches(images):
    jpg = images[0]
    tp_nat = TransformPipeline(84, aug=False, use_native=True)
    tp_pil = TransformPipeline(84, aug=False, use_native=False)
    assert np.abs(tp_nat.load(jpg) - tp_pil.load(jpg)).max() < 0.02
    # aug path produces valid shapes through the native branch
    tp_aug = TransformPipeline(84, aug=True, use_native=True, seed=3)
    out = tp_aug.load(jpg)
    assert out.shape == (84, 84, 3) and np.isfinite(out).all()


def test_eval_batch_matches_per_image(images):
    """dkt_load_eval_batch == a load_eval loop, any thread count, and the
    TransformPipeline.load_batch wrapper preserves the uint8 contract."""
    jpg, png, gray = images
    paths = [jpg, png, gray, jpg, png, gray, jpg]
    ref = np.stack([native.load_eval(p, 84) for p in paths])
    for n_threads in (1, 4, 0):
        out = native.load_eval_batch(paths, 84, n_threads=n_threads)
        np.testing.assert_array_equal(out, ref)

    tp = TransformPipeline(84, aug=False, output_uint8=True)
    batch = tp.load_batch(paths)
    assert batch.dtype == np.uint8
    loop = np.stack([tp.load(p) for p in paths])
    np.testing.assert_array_equal(batch, loop)


def test_canvas_batch_matches_per_image_and_pil(images):
    """dkt_load_canvas_batch == a load_canvas loop at any thread count, and
    stays within resampling tolerance of the PIL canvas (uint8 LSBs)."""
    from deep_kernel_transfer_tpu.data.device_dataset import (
        _load_canvas,
        _load_canvas_batch,
    )

    jpg, png, gray = images
    paths = [jpg, png, gray, jpg, png]
    ref = np.stack([native.load_canvas(p, 96) for p in paths])
    assert ref.dtype == np.uint8 and ref.shape == (5, 96, 96, 3)
    for n_threads in (1, 4, 0):
        out = native.load_canvas_batch(paths, 96, n_threads=n_threads)
        np.testing.assert_array_equal(out, ref)

    pil = np.stack([_load_canvas(p, 96) for p in paths])
    # float triangle filter vs PIL's fixed-point: a few u8 LSBs
    assert np.abs(ref.astype(int) - pil.astype(int)).max() <= 6
    assert np.abs(ref.astype(float) - pil.astype(float)).mean() < 1.0

    # the staging helper routes through the native batch when available
    staged = _load_canvas_batch(paths, 96)
    np.testing.assert_array_equal(staged, ref)


def test_eval_batch_reports_failed_path(images, tmp_path):
    bad = str(tmp_path / "nope.jpg")
    with pytest.raises(IOError, match="nope"):
        native.load_eval_batch([images[0], bad, images[1]], 84)
