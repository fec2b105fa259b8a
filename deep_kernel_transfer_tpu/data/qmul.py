"""QMUL head-pose trajectory loader — rebuild of reference data/qmul_loader.py.

Samples a random sine "trajectory" (amp in [-3,3], phase in [-5,5]) mapped
onto the (pitch, yaw) grid of face images; targets are normalised pitches.
Returns [n_people, 19, H, W, C] float32 NHWC arrays
(reference data/qmul_loader.py:41-59; images are 100x100 RGB jpgs produced
by filelists/QMUL/write_QMUL_filelist.py).
"""
from __future__ import annotations

import os

import numpy as np

from .lru import ByteCappedLRU
from .transforms import load_image

# Fixed person splits (reference data/qmul_loader.py:9-10)
train_people = [
    "DennisPNoGlassesGrey", "JohnGrey", "SimonBGrey", "SeanGGrey", "DanJGrey",
    "AdamBGrey", "JackGrey", "RichardHGrey", "YongminYGrey", "TomKGrey",
    "PaulVGrey", "DennisPGrey", "CarlaBGrey", "JamieSGrey", "KateSGrey",
    "DerekCGrey", "KatherineWGrey", "ColinPGrey", "SueWGrey", "GrahamWGrey",
    "KrystynaNGrey", "SeanGNoGlassesGrey", "KeithCGrey", "HeatherLGrey",
]
test_people = [
    "RichardBGrey", "TasosHGrey", "SarahLGrey", "AndreeaVGrey", "YogeshRGrey",
]

NUM_SAMPLES = 19  # points per trajectory


def _num_to_str(num: int) -> str:
    if num == 0:
        return "000"
    if num < 100:
        return "0" + str(int(num))
    return str(int(num))


def sample_trajectory(rng: np.random.RandomState, num_samples: int = NUM_SAMPLES):
    """Random sine curve -> list of (pitch, yaw) grid coordinates
    (reference data/qmul_loader.py:42-49)."""
    amp = rng.uniform(-3, 3)
    phase = rng.uniform(-5, 5)
    wave = [amp * np.sin(phase + x) for x in range(num_samples)]
    angles = [x * 10 for x in range(num_samples)]
    pitches = [int(round(((y + 3) * 10) + 60, -1)) for y in wave]
    return list(zip(pitches, angles))


def _default_prefix() -> str:
    """Reference layout first, then this repo's prep-script location."""
    for p in ("filelists/QMUL/images/", "filelists_tpu/QMUL/images/"):
        if os.path.isdir(p):
            return p
    return "filelists/QMUL/images/"


# decode cache: every epoch resamples 19 of the same 13x19 grid per person,
# so a QMUL training run re-decodes each JPEG hundreds of times otherwise.
# uint8 storage keeps the full 29-person grid ~215 MB. Cap via env.
_DECODE_CACHE = ByteCappedLRU(
    int(os.environ.get("DKT_QMUL_CACHE_BYTES", 1 << 30)))


def _load_face(fname: str) -> np.ndarray:
    return _DECODE_CACHE.get_or_load(
        fname, lambda f: np.asarray(load_image(f), np.uint8))


def get_person_at_curve(person: str, curve, prefix: str | None = None):
    """Load one person's images along a trajectory; targets = normalised
    pitch (reference data/qmul_loader.py:22-39). Images are NOT ImageNet-
    normalised (the reference uses bare ToTensor)."""
    if prefix is None:
        prefix = _default_prefix()
    faces, targets = [], []
    for pitch, angle in curve:
        fname = os.path.join(
            prefix, person,
            f"{person[:-4]}_{_num_to_str(pitch)}_{_num_to_str(angle)}.jpg",
        )
        faces.append(_load_face(fname).astype(np.float32) / 255.0)
        pitch_norm = 2 * ((pitch - 60) / (120 - 60)) - 1
        targets.append(pitch_norm)
    return np.stack(faces), np.asarray(targets, np.float32)


def get_batch(people=train_people, rng: np.random.RandomState | None = None,
              num_samples: int = NUM_SAMPLES,
              prefix: str | None = None):
    """[n_people, 19, H, W, C] inputs + [n_people, 19] targets
    (reference data/qmul_loader.py:41-59)."""
    if rng is None:
        rng = np.random.RandomState()
    curve = sample_trajectory(rng, num_samples)
    inputs, targets = [], []
    for person in people:
        inps, targs = get_person_at_curve(person, curve, prefix)
        inputs.append(inps)
        targets.append(targs)
    return np.stack(inputs), np.stack(targets)
