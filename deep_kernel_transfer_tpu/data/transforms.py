"""Host-side image transforms — PIL/numpy rebuild of the reference pipeline.

The reference composes torchvision transforms (reference data/datamgr.py:38-46):
  aug:   RandomSizedCrop, ImageJitter, RandomHorizontalFlip, ToTensor, Normalize
  eval:  Scale(1.15x), CenterCrop, ToTensor, Normalize
plus the custom PIL-enhancer ImageJitter (data/additional_transforms.py:15-28).

torchvision is not a dependency here; transforms are implemented directly on
PIL images and emit float32 NHWC arrays (TPU conv layout), normalised with
the ImageNet statistics the reference uses (data/datamgr.py:15).
"""
from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

JITTER_PARAMS = dict(Brightness=0.4, Contrast=0.4, Color=0.4)
_ENHANCERS = dict(
    Brightness=ImageEnhance.Brightness,
    Contrast=ImageEnhance.Contrast,
    Sharpness=ImageEnhance.Sharpness,
    Color=ImageEnhance.Color,
)


def to_array(img: Image.Image, normalize: bool = True) -> np.ndarray:
    """PIL -> float32 HWC in [0,1], optionally ImageNet-normalised."""
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if normalize:
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr


def scale(img: Image.Image, size: int) -> Image.Image:
    """torchvision Scale([1.15*s, 1.15*s]) (reference data/datamgr.py:32)."""
    s = int(size * 1.15)
    return img.resize((s, s), Image.BILINEAR)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def fallback_crop_box(w: int, h: int) -> tuple[int, int, int, int]:
    """Deterministic crop when all 10 RandomSizedCrop attempts fail: the
    centered min-side square (torchvision's aspect-preserving
    Scale(shorter->size) + CenterCrop fallback, expressed as a crop box so
    the PIL and native backends share one code path)."""
    m = min(w, h)
    return (w - m) // 2, (h - m) // 2, m, m


def random_sized_crop(img: Image.Image, size: int, rng: np.random.RandomState) -> Image.Image:
    """torchvision RandomSizedCrop/RandomResizedCrop: random area in
    [0.08, 1.0], aspect in [3/4, 4/3], 10 attempts then the centered-square
    fallback. Parameter sampling is shared with the native path
    (sample_crop_box)."""
    w, h = img.size
    box = sample_crop_box(w, h, rng)
    if box is None:
        box = fallback_crop_box(w, h)
    left, top, cw, ch = box
    return img.crop((left, top, left + cw, top + ch)).resize(
        (size, size), Image.BILINEAR)


def image_jitter(img: Image.Image, rng: np.random.RandomState,
                 params=JITTER_PARAMS) -> Image.Image:
    """reference data/additional_transforms.py:15-28."""
    out = img
    rand = rng.rand(len(params))
    for i, (name, alpha) in enumerate(params.items()):
        r = alpha * (rand[i] * 2.0 - 1.0) + 1
        out = _ENHANCERS[name](out).enhance(r).convert("RGB")
    return out


def random_hflip(img: Image.Image, rng: np.random.RandomState) -> Image.Image:
    if rng.rand() < 0.5:
        return img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


def sample_crop_box(w: int, h: int, rng: np.random.RandomState):
    """RandomSizedCrop parameter sampling (same rules as random_sized_crop);
    returns (left, top, cw, ch) or None for the deterministic fallback."""
    area = w * h
    for _ in range(10):
        target_area = rng.uniform(0.08, 1.0) * area
        aspect = np.exp(rng.uniform(np.log(3.0 / 4.0), np.log(4.0 / 3.0)))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw + 1)
            top = rng.randint(0, h - ch + 1)
            return left, top, cw, ch
    return None


class TransformPipeline:
    """aug/eval pipelines matching reference data/datamgr.py:38-46.

    When the native C++ pipeline (deep_kernel_transfer_tpu/native) builds,
    `load(path)` decodes and transforms in one native pass (~1.5x faster on
    this host, within one u8 LSB of the PIL result); randomness stays in
    the numpy RNG for seed control either way. `use_native=False` forces
    the PIL path.
    """

    def __init__(self, image_size: int, aug: bool, normalize: bool = True,
                 seed: int = 0, use_native: bool | None = None,
                 output_uint8: bool = False):
        self.image_size = image_size
        self.aug = aug
        # output_uint8: ship raw pixels and let the trunk normalise on
        # device (models.backbones.preprocess_input) — 4x less host->device
        # traffic than normalised f32
        self.output_uint8 = output_uint8
        self.normalize = normalize and not output_uint8
        self.rng = np.random.RandomState(seed)
        if use_native is None:
            from .. import native

            use_native = native.available()
        self.use_native = use_native

    def __call__(self, img: Image.Image) -> np.ndarray:
        if self.aug:
            # same draw order as the native path: crop box, jitter, flip
            w, h = img.size
            box, factors, flip = self._draw_aug_params(w, h)
            return self._apply_aug(img, box, factors, flip)
        img = scale(img, self.image_size)
        img = center_crop(img, self.image_size)
        return self._emit(img)

    def _emit(self, img: Image.Image) -> np.ndarray:
        if self.output_uint8:
            return np.asarray(img.convert("RGB"), np.uint8)
        return to_array(img, self.normalize)

    def _draw_aug_params(self, w: int, h: int):
        """Consume the aug draws (crop box, jitter factors, flip) in the
        fixed stream order shared by the PIL and native backends."""
        box = sample_crop_box(w, h, self.rng)
        rand = self.rng.rand(len(JITTER_PARAMS))
        factors = tuple(
            alpha * (rand[i] * 2.0 - 1.0) + 1
            for i, alpha in enumerate(JITTER_PARAMS.values()))
        flip = bool(self.rng.rand() < 0.5)
        return box, factors, flip

    def _apply_aug(self, img: Image.Image, box, factors,
                   flip: bool) -> np.ndarray:
        """Apply pre-drawn aug parameters via PIL (consumes no RNG)."""
        if box is None:
            box = fallback_crop_box(*img.size)
        left, top, cw, ch = box
        img = img.crop((left, top, left + cw, top + ch)).resize(
            (self.image_size, self.image_size), Image.BILINEAR)
        for name, r in zip(JITTER_PARAMS, factors):
            img = _ENHANCERS[name](img).enhance(r).convert("RGB")
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return self._emit(img)

    def load(self, path: str) -> np.ndarray:
        """Decode + transform a file (native fast path when available)."""
        if not self.use_native:
            return self(load_image(path))
        from .. import native

        if not self.aug:
            try:
                arr = native.load_eval(path, self.image_size, self.normalize)
                return self._finish(arr)
            except IOError:
                return self(load_image(path))  # unsupported format -> PIL
        try:
            with Image.open(path) as img:  # header-only size read
                w, h = img.size
        except IOError:
            return self(load_image(path))  # no draws consumed yet
        box, factors, flip = self._draw_aug_params(w, h)
        if box is None:  # concrete centered-square fallback, one law
            box = fallback_crop_box(w, h)
        try:
            arr = native.load_aug(path, self.image_size, box, factors, flip,
                                  self.normalize)
            return self._finish(arr)
        except IOError:
            # Unsupported format -> PIL, REUSING the drawn parameters: a
            # fresh draw here would double-advance the RNG stream and break
            # seed parity between native-built and PIL-only hosts.
            return self._apply_aug(load_image(path), box, factors, flip)

    def load_batch(self, paths: list[str]) -> np.ndarray:
        """Decode + transform many files: [n, size, size, 3].

        The eval pipeline goes through the native threaded batch entry
        (ONE C call for the whole list — multi-core hosts decode in
        parallel); aug mode stays per-image because its random parameters
        come from the Python RNG. Falls back per-image on unsupported
        formats. Output matches a `load` loop exactly."""
        if self.use_native and not self.aug and paths:
            from .. import native

            try:
                arr = native.load_eval_batch(paths, self.image_size,
                                             self.normalize)
                return self._finish(arr)
            except IOError:
                pass  # e.g. a non-JPEG/PNG in the list -> per-image below
        return np.stack([self.load(p) for p in paths])

    def _finish(self, arr: np.ndarray) -> np.ndarray:
        if self.output_uint8:  # native emits [0,1] f32 when normalize=False
            return np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return arr


def load_image(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")
