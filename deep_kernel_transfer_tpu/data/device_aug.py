"""On-device image augmentation under jit — RandomSizedCrop + ImageJitter +
RandomHorizontalFlip on uint8 canvases resident in HBM.

Device-side rebuild of the reference's host aug pipeline (reference
data/datamgr.py:38-43 RandomSizedCrop/ImageJitter/RandomHorizontalFlip and
data/additional_transforms.py:15-28), operating on the square
int(1.15 * image_size) canvases staged by DeviceDataset(canvas=True):

  * RandomSizedCrop: area in [0.08, 1] of the canvas, aspect in [3/4, 4/3],
    10 candidate draws with first-valid selection, center-crop fallback —
    the same parameter law as torchvision's RandomSizedCrop (mirrored on
    host in transforms.sample_crop_box), executed as a per-image
    scale_and_translate (bilinear, antialiased) so every shape is static.
  * ImageJitter: PIL ImageEnhance semantics — Brightness blends toward
    black, Contrast toward the mean-of-grayscale constant, Color toward the
    per-pixel grayscale, each with factor alpha*(2u-1)+1, alpha=0.4
    (transforms.JITTER_PARAMS), applied in that dict order.
  * RandomHorizontalFlip with p=0.5.

The aug law matches the host path; individual pixels differ at the level
of PIL-vs-XLA bilinear rounding (PIL resamples in uint8 with fixed-point
weights). Training uses it as an opt-in fast path (`train.py
--device_data`); eval never augments so eval parity is untouched.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .transforms import JITTER_PARAMS

# PIL ITU-R 601-2 luma transform (Image.convert("L")). Kept as a python
# tuple: a module-level jnp.array would become a leaked tracer if this
# module is first imported inside a jax trace.
_LUMA_W = (0.299, 0.587, 0.114)


def _sample_crop_boxes(key, batch: int, canvas: int, out_size: int):
    """Vectorised 10-attempt RandomSizedCrop sampling -> per-image
    (left, top, cw, ch) float32 [batch]."""
    k_area, k_aspect, k_left, k_top = jax.random.split(key, 4)
    area = canvas * canvas
    ta = jax.random.uniform(k_area, (batch, 10), minval=0.08, maxval=1.0) * area
    log_r = jax.random.uniform(k_aspect, (batch, 10),
                               minval=jnp.log(3.0 / 4.0),
                               maxval=jnp.log(4.0 / 3.0))
    aspect = jnp.exp(log_r)
    cw = jnp.round(jnp.sqrt(ta * aspect))
    ch = jnp.round(jnp.sqrt(ta / aspect))
    valid = (cw > 0) & (cw <= canvas) & (ch > 0) & (ch <= canvas)
    # first valid attempt; if none, fall back to the centered out_size
    # window. NOTE: the host law's fallback is the centered min-side square
    # of the ORIGINAL image (transforms.fallback_crop_box); the canvas was
    # already resampled square, so aspect can't be recovered here — an
    # accepted canvas-mode approximation on a ~1e-4-probability branch.
    idx = jnp.argmax(valid, axis=1)                       # first True
    any_valid = jnp.any(valid, axis=1)
    take = lambda a: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    cw, ch = take(cw), take(ch)
    u_l = jax.random.uniform(k_left, (batch, 10))
    u_t = jax.random.uniform(k_top, (batch, 10))
    left = jnp.floor(take(u_l) * (canvas - cw + 1))
    top = jnp.floor(take(u_t) * (canvas - ch + 1))
    c_off = float((canvas - out_size) // 2)
    cw = jnp.where(any_valid, cw, out_size)
    ch = jnp.where(any_valid, ch, out_size)
    left = jnp.where(any_valid, left, c_off)
    top = jnp.where(any_valid, top, c_off)
    return left, top, cw, ch


def _crop_resize(img, left, top, cw, ch, out_size: int):
    """Bilinear crop->resize of one HWC image with static output shape."""
    s = jnp.stack([out_size / ch, out_size / cw])
    t = jnp.stack([-top * out_size / ch, -left * out_size / cw])
    return jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[-1]), (0, 1), s, t,
        method="linear")


def apply_jitter(img, factors):
    """PIL ImageEnhance chain on a float HWC image in [0, 255]; `factors`
    is an array of enhancement factors in JITTER_PARAMS order."""
    for i, name in enumerate(JITTER_PARAMS):
        f = factors[i]
        if name == "Brightness":
            degenerate = jnp.zeros_like(img)
        elif name == "Contrast":
            mean = jnp.round(jnp.mean(img @ jnp.asarray(_LUMA_W)))
            degenerate = jnp.full_like(img, mean)
        elif name == "Color":
            degenerate = (img @ jnp.asarray(_LUMA_W))[..., None] * jnp.ones_like(img)
        else:  # Sharpness is in PIL's enhancer table but never in the law
            continue
        img = jnp.clip(degenerate * (1.0 - f) + img * f, 0.0, 255.0)
    return img


def _jitter(key, img, params=JITTER_PARAMS):
    """Sample per-image factors (alpha*(2u-1)+1) and apply the chain."""
    rand = jax.random.uniform(key, (len(params),))
    alphas = jnp.asarray(list(params.values()))
    return apply_jitter(img, alphas * (rand * 2.0 - 1.0) + 1.0)


@functools.partial(jax.jit, static_argnums=(2,))
def augment(key, images_u8, out_size: int):
    """[..., canvas, canvas, 3] uint8 -> [..., out_size, out_size, 3] uint8.

    Leading axes are flattened, each image gets independent crop / jitter /
    flip randomness, and the result is re-shaped back. Output stays uint8 so
    the trunk's device-side normalisation (models.backbones.preprocess_input)
    applies unchanged.
    """
    lead = images_u8.shape[:-3]
    canvas = images_u8.shape[-3]
    flat = images_u8.reshape((-1,) + images_u8.shape[-3:]).astype(jnp.float32)
    n = flat.shape[0]
    k_box, k_jit, k_flip = jax.random.split(key, 3)
    left, top, cw, ch = _sample_crop_boxes(k_box, n, canvas, out_size)
    out = jax.vmap(_crop_resize, in_axes=(0, 0, 0, 0, 0, None))(
        flat, left, top, cw, ch, out_size)
    out = jax.vmap(_jitter)(jax.random.split(k_jit, n), out)
    flip = jax.random.bernoulli(k_flip, 0.5, (n,))
    out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    out = jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out.reshape(lead + (out_size, out_size, 3))
