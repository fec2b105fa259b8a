"""Device-resident episodic dataset — the whole split staged in HBM once,
episodes sampled and gathered on device under jit.

TPU-native replacement for streaming episodes over the host->device link.
The reference streams every episode through 12 DataLoader workers + PCIe
(reference data/datamgr.py:82); this framework's EpisodicDataLoader
streams uint8 batches over the transfer link, which on a tunnelled TPU is
the hard wall (~10-60 MB/s measured). Few-shot splits are small — novel
splits are tens of MB as 84px uint8 and every base split of the
reference's five datasets fits in at most ~1 GB — so the TPU-first design
is:

  1. decode + eval-transform every unique image ONCE on host (uint8,
     native C++ fast path when built),
  2. ship the whole split as one [n_images, H, W, 3] uint8 device array,
  3. sample episode index tensors with jax.random INSIDE jit and gather —
     a 600-episode eval does ZERO host->device transfers after staging.

Episode-composition parity (reference data/dataset.py:29-87 SetDataset +
EpisodicBatchSampler): n_way classes are drawn without replacement; S+Q
images per class are drawn without replacement, falling back to
with-replacement only when the class holds fewer than S+Q images
(EpisodicDataLoader._one_episode implements the same rules on host).
Pixels are bit-identical to the host eval path — the same
TransformPipeline decodes them; only the RNG sampling the episode
composition differs (jax.random instead of np.random).

For training, `canvas=True` stages full images resized to a square
int(1.15 * image_size) canvas instead of the eval scale+center-crop, so
the on-device augmentation pipeline (data/device_aug.py) can take random
crops under jit.
"""
from __future__ import annotations

import functools
import os
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .filelist import FileListMeta
from .transforms import TransformPipeline, load_image


# ------------------------------------------------------------- stage cache
# Staging decodes every image of a split; on the 1-core host that is the
# whole cost of a --device_data run (~1,100 img/s native). The decoded
# uint8 tensor is memoised on disk next to the filelist json, keyed by the
# path list + each file's (mtime, size) + the staging geometry, so every
# later CLI invocation (test.py --repeat seeds run in-process, but
# train->test or repeated test.py runs are separate processes) stages at
# disk-read speed instead of decode speed. Opt out: DKT_NO_STAGE_CACHE=1.


def _stage_cache_paths(data_file: str, image_size: int,
                       canvas: bool) -> tuple[str, str]:
    tag = f"{image_size}{'c' if canvas else ''}"
    base = f"{data_file}.stage{tag}"
    return base + ".npy", base + ".key"


def _stage_cache_key(paths: list[str], image_size: int, canvas: bool) -> str:
    import hashlib

    h = hashlib.sha1()
    h.update(f"v1|{image_size}|{canvas}".encode())
    for p in paths:
        try:
            st = os.stat(p)
            h.update(f"{p}|{st.st_mtime_ns}|{st.st_size}".encode())
        except OSError:
            h.update(f"{p}|missing".encode())
    return h.hexdigest()


def _stage_cache_load(data_file: str, paths: list[str], image_size: int,
                      canvas: bool) -> tuple["np.ndarray | None", str]:
    """(cached tensor or None, computed key — reusable by the store so the
    per-file stat sweep runs once per cold staging)."""
    if os.environ.get("DKT_NO_STAGE_CACHE"):
        return None, ""
    key = _stage_cache_key(paths, image_size, canvas)
    npy, keyf = _stage_cache_paths(data_file, image_size, canvas)
    try:
        with open(keyf) as f:
            if f.read().strip() != key:
                return None, key
        host = np.load(npy, mmap_mode="r")
    except (OSError, ValueError):
        return None, key
    if host.shape[0] != len(paths) or host.dtype != np.uint8:
        return None, key
    return host, key


def _stage_cache_store(data_file: str, key: str, image_size: int,
                       canvas: bool, host: np.ndarray) -> None:
    if os.environ.get("DKT_NO_STAGE_CACHE") or not key:
        return
    npy, keyf = _stage_cache_paths(data_file, image_size, canvas)
    try:
        tmp = npy + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:  # np.save(str) would append .npy
            np.save(f, host)
        os.replace(tmp, npy)
        with open(keyf, "w") as f:
            f.write(key)
    except OSError:
        pass  # read-only filelist dir: caching is best-effort


def _batch_axis_extent(sharding) -> int:
    """Product of mesh-axis extents sharding the LEADING (batch) dim.

    episode_sharding uses P(axis) so only the first spec entry matters;
    entries can be a name, a tuple of names, or None (replicated)."""
    if not sharding.spec:
        return 1
    first = sharding.spec[0]
    if first is None:
        return 1
    names = first if isinstance(first, tuple) else (first,)
    extent = 1
    for name in names:
        extent *= int(sharding.mesh.shape[name])
    return extent


class DeviceDataset:
    """One split resident in device memory + jitted episode sampler."""

    def __init__(
        self,
        data_file: str,
        image_size: int,
        canvas: bool = False,
        min_slots: int = 128,
        verbose: bool = False,
    ):
        meta = FileListMeta(data_file)
        sub = meta.by_class()
        classes = sorted(sub.keys())

        # decode each unique (path, label) once: dedup within a class is
        # free, but a path listed under TWO classes must stage twice or the
        # feature path (save_features --device_data) would drop one label
        # that the streaming loader emits
        paths: list[str] = []
        labels: list[int] = []
        path_id: dict[tuple[str, int], int] = {}
        for c in classes:
            for p in sub[c]:
                if (p, c) not in path_id:
                    path_id[(p, c)] = len(paths)
                    paths.append(p)
                    labels.append(c)

        host, cache_key = _stage_cache_load(data_file, paths, image_size,
                                            canvas)
        from_cache = host is not None
        if host is None:
            if canvas:
                size = int(image_size * 1.15)
                host = np.empty((len(paths), size, size, 3), np.uint8)
                chunk = 1024
                for i in range(0, len(paths), chunk):
                    host[i:i + chunk] = _load_canvas_batch(
                        paths[i:i + chunk], size)
            else:
                # chunked threaded batch decode (native C++ pool when
                # built); chunking bounds the f32 intermediate to ~100 MB
                tp = TransformPipeline(image_size, aug=False,
                                       output_uint8=True)
                host = np.empty((len(paths), image_size, image_size, 3),
                                np.uint8)
                chunk = 1024
                for i in range(0, len(paths), chunk):
                    host[i:i + chunk] = tp.load_batch(paths[i:i + chunk])
            _stage_cache_store(data_file, cache_key, image_size, canvas, host)
        if verbose:
            print(f"[device_data] staged {len(paths)} images "
                  f"({host.nbytes / 1e6:.1f} MB uint8"
                  f"{', decode cache' if from_cache else ''}) -> device")

        counts = np.array([len(sub[c]) for c in classes], np.int32)
        # per-class image-id table: slot j of class c is image j % count(c).
        # Only the first count(c) slots are ever indexed (_sample_ids);
        # the wrap padding just keeps the array rectangular
        width = max(int(counts.max()), min_slots)
        table = np.empty((len(classes), width), np.int32)
        for ci, c in enumerate(classes):
            ids = np.array([path_id[(p, c)] for p in sub[c]], np.int32)
            reps = -(-width // len(ids))
            table[ci] = np.tile(ids, reps)[:width]

        self.image_size = image_size
        self.canvas = canvas
        self.n_class = len(classes)
        self.class_labels = np.asarray(classes, np.int32)
        self.image_labels = np.asarray(labels, np.int32)  # staged-order labels
        self.images = jax.device_put(host)          # [n_img, H, W, 3] u8
        self.table = jax.device_put(table)          # [n_class, width] i32
        self.counts = jax.device_put(counts)        # [n_class] i32
        self.nbytes = int(host.nbytes)
        self._episode_sharding = None

    def shard(self, mesh) -> "DeviceDataset":
        """Multi-device placement: replicate the staged split over the mesh
        (gathers stay chip-local) and emit episode batches sharded over the
        data axis, ready for make_sharded_train_step / make_sharded_eval
        (parallel/mesh.py).

        Returns a shallow COPY with the new placement — the receiver (often
        the process-level cached_dataset singleton) is left untouched, so a
        later caller without a mesh still gets single-device behavior."""
        import copy

        from ..parallel.mesh import episode_sharding, replicated

        rep = replicated(mesh)
        new = copy.copy(self)
        new.images = jax.device_put(self.images, rep)
        new.table = jax.device_put(self.table, rep)
        new.counts = jax.device_put(self.counts, rep)
        new._episode_sharding = episode_sharding(mesh)
        return new

    # ---------------------------------------------------------------- sample
    def sample_episode_ids(self, key, n_way: int, k: int, batch: int):
        """[batch, n_way, k] image ids, sampled per the reference's rules."""
        assert k <= self.table.shape[1], (
            f"S+Q={k} exceeds slot table width {self.table.shape[1]}")
        return _sample_ids(self.table, self.counts, key, n_way, k, batch)

    def sample_episodes(self, key, n_way: int, n_support: int, n_query: int,
                        batch: int = 1):
        """[batch, n_way, S+Q, H, W, 3] uint8, entirely on device(s)."""
        ids = self.sample_episode_ids(key, n_way, n_support + n_query, batch)
        x = jnp.take(self.images, ids, axis=0)
        if self._episode_sharding is not None:
            # divisibility by the sharded axis extent (dp), not the total
            # device count — on a 2-D dp x tp mesh only dp splits the batch
            sh = self._episode_sharding
            extent = _batch_axis_extent(sh)
            if batch % extent == 0:
                x = jax.device_put(x, sh)
        return x

    # ---------------------------------------------------------------- loader
    def epoch(self, seed: int, n_way: int, n_support: int, n_query: int,
              n_episodes: int, episode_batch: int = 1,
              augment_to: Optional[int] = None) -> Iterator[jnp.ndarray]:
        """EpisodicDataLoader-shaped iterator (device arrays out).

        `augment_to` runs the on-device aug pipeline (device_aug.augment)
        per batch — only valid on canvas-staged datasets."""
        assert augment_to is None or self.canvas, (
            "augmentation needs canvas staging (DeviceDataset(canvas=True))")
        assert not (self.canvas and augment_to is None), (
            "canvas-staged images must be augmented down to the model size")
        key = jax.random.PRNGKey(seed)
        remaining = n_episodes
        while remaining > 0:
            b = min(episode_batch, remaining)
            key, sub = jax.random.split(key)
            x = self.sample_episodes(sub, n_way, n_support, n_query, b)
            if augment_to is not None:
                from .device_aug import augment

                key, sub2 = jax.random.split(key)
                x = augment(sub2, x, augment_to)
            yield x
            remaining -= b


def make_fused_epoch(model, ds: "DeviceDataset", n_way: int, n_support: int,
                     n_query: int, episode_batch: int,
                     augment_to: Optional[int] = None):
    """Fuse sample -> (augment) -> train_step into ONE device dispatch.

    With the split HBM-resident, nothing in a training step needs the
    host, so a whole run of steps can be a single `lax.scan` under jit —
    measured 1.36x over the per-batch dispatch chain on the tunnelled
    chip (sample/aug/step dispatches no longer serialise with compute).

    Returns chunk_fn(state, key, length) -> (state, metrics, last_batch):
    `length` (static; one compile per distinct value — the caller chunks
    by print_freq) training iterations; `metrics` is the train_step
    metrics dict with a leading [length] axis, `last_batch` the final
    augmented episode batch (for telemetry parity with the streaming
    loop). Episode-composition rules match `epoch()` (same _sample_ids);
    only the key-splitting schedule differs, so a given seed selects
    different (equally distributed) episodes than the iterator path.
    """
    assert augment_to is None or ds.canvas, (
        "augmentation needs canvas staging (DeviceDataset(canvas=True))")
    assert not (ds.canvas and augment_to is None), (
        "canvas-staged images must be augmented down to the model size")
    k_total = n_support + n_query
    if augment_to is not None:
        # import at BUILD time: importing inside the traced scan body would
        # execute device_aug's module-level jnp constants under tracing and
        # leak tracers into the module namespace
        from .device_aug import augment

    @functools.partial(jax.jit, static_argnums=(5,))
    def chunk(state, key, images, table, counts, length: int):
        def body(carry, kk):
            state, _ = carry
            k_sample, k_aug = jax.random.split(kk)
            ids = _sample_ids(table, counts, k_sample, n_way, k_total,
                              episode_batch)
            x = jnp.take(images, ids, axis=0)
            if augment_to is not None:
                x = augment(k_aug, x, augment_to)
            state, m = model.train_step(state, x)
            # last batch rides the carry (stacking every batch as an
            # output would hold length x batch images live in HBM)
            return (state, x), m

        out = augment_to if augment_to is not None else ds.images.shape[-3]
        x0 = jnp.zeros((episode_batch, n_way, k_total, out, out, 3),
                       jnp.uint8)
        keys = jax.random.split(key, length)
        (state, last_x), ms = jax.lax.scan(body, (state, x0), keys)
        return state, ms, last_x

    def chunk_fn(state, key, length: int):
        return chunk(state, key, ds.images, ds.table, ds.counts, length)

    return chunk_fn


def make_fused_eval(model, ds: "DeviceDataset", n_way: int, n_support: int,
                    n_query: int, episode_batch: int):
    """Fused evaluation: sample -> batch_correct under one lax.scan.

    Returns eval_chunk(params, key, length) -> per-episode accuracy%
    [length, episode_batch] (device array; read back after the loop).
    The 600-episode test protocol becomes a couple of dispatches instead
    of ~40, with no host round-trips between batches."""
    k_total = n_support + n_query

    @functools.partial(jax.jit, static_argnums=(5,))
    def chunk(params, key, images, table, counts, length: int):
        def body(_, kk):
            ids = _sample_ids(table, counts, kk, n_way, k_total,
                              episode_batch)
            x = jnp.take(images, ids, axis=0)
            return None, model.batch_correct(params, x)

        keys = jax.random.split(key, length)
        _, accs = jax.lax.scan(body, None, keys)
        return accs

    def eval_chunk(params, key, length: int):
        return chunk(params, key, ds.images, ds.table, ds.counts, length)

    return eval_chunk


def fused_protocol_accs(eval_chunk, model, ds: "DeviceDataset", params, key,
                        n_way: int, n_support: int, n_query: int,
                        n_episodes: int, episode_batch: int):
    """Run an n_episodes eval protocol through a prebuilt fused eval chunk
    (make_fused_eval): full batches as ONE scan dispatch, the remainder as
    a single extra batch. Returns per-episode accuracy% [n_episodes] on
    device. Shared by train.py's per-epoch validation and test.py's
    600-episode protocol."""
    nb_full, rem = divmod(n_episodes, episode_batch)
    parts = []
    if nb_full:
        key, sub = jax.random.split(key)
        parts.append(jnp.reshape(eval_chunk(params, sub, nb_full), (-1,)))
    if rem:
        key, sub = jax.random.split(key)
        xr = ds.sample_episodes(sub, n_way, n_support, n_query, batch=rem)
        parts.append(model.batch_correct(params, xr))
    return jnp.concatenate(parts)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _sample_ids(table, counts, key, n_way: int, k: int, batch: int):
    """Episode composition on device: n_way distinct classes, then k images
    per class without replacement; a class with fewer than k images falls
    back to EXACTLY uniform with-replacement draws over its count (the
    wrap-tiled slot table is non-uniform when width % count != 0, so the
    fallback indexes floor(u * count) directly — matching the host path's
    rng.choice(replace=True))."""
    n_class, width = table.shape

    def one(key):
        kw, ki = jax.random.split(key)
        ways = jax.random.permutation(kw, n_class)[:n_way]
        cnt = counts[ways]                                     # [n_way]
        u = jax.random.uniform(ki, (n_way, width))
        # without replacement among each class's first cnt (real) slots
        u_masked = jnp.where(jnp.arange(width)[None, :] < cnt[:, None],
                             u, jnp.inf)
        picks_wo = jnp.argsort(u_masked, axis=1)[:, :k]        # [n_way, k]
        # with replacement: k iid uniform slots in [0, cnt)
        picks_w = jnp.floor(u[:, :k] * cnt[:, None]).astype(jnp.int32)
        picks = jnp.where((cnt >= k)[:, None], picks_wo, picks_w)
        return table[ways[:, None], picks]

    return jax.vmap(one)(jax.random.split(key, batch))


_CACHE: dict = {}


def cached_dataset(data_file: str, image_size: int, canvas: bool = False,
                   verbose: bool = False) -> "DeviceDataset":
    """Process-level cache so repeated runs (--repeat seeds, train+val on
    the same split) stage each split once."""
    key = (os.path.abspath(data_file), os.path.getmtime(data_file),
           image_size, canvas)
    if key not in _CACHE:
        _CACHE[key] = DeviceDataset(data_file, image_size, canvas=canvas,
                                    verbose=verbose)
    return _CACHE[key]


def _load_canvas(path: str, size: int) -> np.ndarray:
    """Full image resized to a square canvas (reference's Scale step only,
    data/datamgr.py:32 — no crop), as uint8 HWC."""
    img = load_image(path).resize((size, size), 2)  # 2 = PIL BILINEAR
    return np.asarray(img, np.uint8)


def _load_canvas_batch(paths: list[str], size: int) -> np.ndarray:
    """Canvas-stage many files, threaded through the native batch decoder
    when built (the same pool the eval staging path uses — one C call per
    chunk instead of a serial PIL loop); PIL fallback otherwise. Native
    pixels match PIL within the pipeline's resampling tolerance
    (tests/test_native_pipeline.py)."""
    from .. import native

    if native.available() and paths:
        try:
            return native.load_canvas_batch(paths, size)
        except IOError:
            pass  # e.g. an unsupported format in the list -> PIL below
    return np.stack([_load_canvas(p, size) for p in paths])


def fits_budget(data_file: str, image_size: int, canvas: bool = False,
                budget_bytes: int = 4 << 30) -> bool:
    """Cheap pre-check: would the staged split fit in `budget_bytes`?"""
    meta = FileListMeta(data_file)
    size = int(image_size * 1.15) if canvas else image_size
    return len(meta.image_names) * size * size * 3 <= budget_bytes
