"""Episodic data pipeline over JSON filelists.

Rebuild of reference data/dataset.py + data/datamgr.py. The same on-disk
format is consumed: base/val/novel.json with
  {"label_names": [...], "image_names": [...], "image_labels": [...]}
(written by the filelists/ prep scripts; reference
filelists/omniglot/write_omniglot_filelist.py:38-57).

TPU-native differences from the reference's torch DataLoader stack:
  * Episodes are batched: the sampler yields [B, n_way, S+Q, H, W, C]
    float32 NHWC arrays ready for jax.device_put — the episode batch axis is
    what gets vmapped/sharded on device (SURVEY.md §2.2).
  * A background prefetch thread overlaps PIL decode with TPU compute
    (replaces the reference's 12 DataLoader workers, data/datamgr.py:82;
    this host has one core, so one decode thread + double buffering is the
    right shape).
"""
from __future__ import annotations

import json
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from .lru import ByteCappedLRU
from .transforms import TransformPipeline


class FileListMeta:
    def __init__(self, data_file: str):
        with open(data_file) as f:
            self.meta = json.load(f)
        self.image_names = self.meta["image_names"]
        self.image_labels = np.asarray(self.meta["image_labels"])
        self.label_names = self.meta.get("label_names", [])

    def by_class(self) -> dict[int, list[str]]:
        sub: dict[int, list[str]] = {}
        for name, label in zip(self.image_names, self.image_labels):
            sub.setdefault(int(label), []).append(name)
        return sub


class SimpleDataLoader:
    """Shuffled flat (image, label) minibatches — reference SimpleDataset +
    SimpleDataManager (data/dataset.py:10-26, data/datamgr.py:54-66)."""

    def __init__(self, data_file: str, image_size: int, batch_size: int,
                 aug: bool, seed: int = 0, output_uint8: bool = False):
        self.meta = FileListMeta(data_file)
        self.batch_size = batch_size
        self.transform = TransformPipeline(image_size, aug, seed=seed,
                                           output_uint8=output_uint8)
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        """Number of batches, INCLUDING a final partial one (torch
        DataLoader drop_last=False semantics, reference data/datamgr.py:63)."""
        return -(-len(self.meta.image_names) // self.batch_size)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        order = self.rng.permutation(len(self.meta.image_names))
        for i in range(len(self)):
            idx = order[i * self.batch_size:(i + 1) * self.batch_size]
            imgs = np.stack(
                [self.transform.load(self.meta.image_names[j]) for j in idx]
            )
            labels = self.meta.image_labels[idx]
            yield imgs, labels


class EpisodicDataLoader:
    """Batched episodic sampler — reference SetDataset + EpisodicBatchSampler
    (data/dataset.py:29-87) with an added episode-batch axis.

    Each episode: n_way classes sampled without replacement, then
    n_support+n_query images per class without replacement (with replacement
    only if a class is too small). Yields [B, n_way, S+Q, H, W, C].

    Eval loaders (aug=False) keep a size-bounded LRU of transformed arrays:
    the deterministic transform makes caching sound, and a 600-episode test
    run re-decodes each novel-class image many times otherwise (the
    reference amortised this with 12 DataLoader workers; this host has one
    core). `cache_bytes=0` disables it; augmented loaders never cache.
    """

    def __init__(
        self,
        data_file: str,
        image_size: int,
        n_way: int,
        n_support: int,
        n_query: int,
        n_episodes: int = 100,
        episode_batch: int = 1,
        aug: bool = False,
        seed: int = 0,
        prefetch: bool = True,
        cache_bytes: int = 1 << 30,
        output_uint8: bool = False,
    ):
        self.sub_meta = FileListMeta(data_file).by_class()
        self.classes = sorted(self.sub_meta.keys())
        self.n_way = n_way
        self.k = n_support + n_query
        self.n_episodes = n_episodes
        self.episode_batch = episode_batch
        self.transform = TransformPipeline(image_size, aug, seed=seed,
                                           output_uint8=output_uint8)
        self.rng = np.random.RandomState(seed)
        self.prefetch = prefetch
        # decoded-image LRU: eval only (aug output is never reusable)
        self._cache = ByteCappedLRU(0 if aug else cache_bytes)

    def __len__(self) -> int:
        """Number of yielded batches (episodes / batch)."""
        return -(-self.n_episodes // self.episode_batch)

    def _load(self, path: str) -> np.ndarray:
        return self._cache.get_or_load(path, self.transform.load)

    def _one_episode(self) -> np.ndarray:
        way_ids = self.rng.permutation(len(self.classes))[: self.n_way]
        episode = []
        for w in way_ids:
            paths = self.sub_meta[self.classes[w]]
            replace = len(paths) < self.k
            img_ids = self.rng.choice(len(paths), self.k, replace=replace)
            episode.append(
                np.stack([self._load(paths[j]) for j in img_ids])
            )
        return np.stack(episode)  # [n_way, S+Q, H, W, C]

    def _batches(self) -> Iterator[np.ndarray]:
        remaining = self.n_episodes
        while remaining > 0:
            b = min(self.episode_batch, remaining)
            yield np.stack([self._one_episode() for _ in range(b)])
            remaining -= b

    def __iter__(self) -> Iterator[np.ndarray]:
        if not self.prefetch:
            yield from self._batches()
            return
        q: queue.Queue = queue.Queue(maxsize=2)
        _SENTINEL = object()
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self._batches():
                    if not put_or_stop(batch):
                        return
                put_or_stop(_SENTINEL)
            except BaseException as e:  # propagate decode errors, don't
                put_or_stop(e)          # silently truncate the epoch

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()  # unblock the producer if the consumer bailed early
            # Wait for it to actually exit: the loader is reused across
            # epochs, and an abandoned producer left running would race the
            # next epoch's producer over the shared LRU cache and RNG
            # (put_or_stop polls `stop` every 0.5 s, so the join is bounded
            # by one in-flight episode-batch decode).
            t.join()
