"""Batched, prefetching host→device data pipeline.

TPU-native replacement for ``torch.utils.data.DataLoader`` as the reference
uses it (/root/reference/train.py:222-236 with ``num_workers=0``,
eval.py:125-133 with 4 workers): a thread pool decodes/transforms clips ahead
of the training step, batches collate to pinned numpy, and (optionally) batches
are device_put with a NamedSharding so the H2D copy of step N+1 overlaps step
N's compute. Frames ship as **uint8 NHWC** and are normalized on device
(ewvit_tpu.ops.preprocess), which quarters H2D bytes vs. the reference's
float32 CHW tensors — on a single-host TPU VM the input pipeline, not the
chip, is the 5k frames/s bottleneck (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


class BatchLoader:
    """Iterates ``(frames [B,T,H,W,3] uint8, labels [B] int32)`` batches.

    Args:
      dataset: map-style dataset with __len__/__getitem__ -> (clip, label).
      batch_size: clips per batch.
      shuffle: reshuffle indices each epoch (numpy RNG, seeded).
      drop_last: drop the ragged tail batch (keeps XLA shapes static — the
        TPU-native default for training; eval pads instead via ``pad_last``).
      num_workers: decode threads. cv2 releases the GIL during imdecode/resize
        so threads scale on a multi-core host; 0 = synchronous.
      prefetch: max batches resident ahead of the consumer.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 8,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def true_len(self) -> int:
        """Number of real (non-pad) items this loader yields.

        The loader protocol ``evaluate()``/``Trainer`` use to trim
        ``pad_last`` rows out of metrics; wrapper loaders that expand items
        (e.g. plot_celebdf_roc.PerFrameLoader) override it.
        """
        return len(self.dataset)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        return idx

    def _collate(self, items) -> Tuple[np.ndarray, np.ndarray]:
        clips, labels = zip(*items)
        frames = np.stack(clips)  # [B, T, H, W, 3]
        if self.pad_last and frames.shape[0] < self.batch_size:
            pad = self.batch_size - frames.shape[0]
            frames = np.concatenate(
                [frames, np.zeros((pad,) + frames.shape[1:], frames.dtype)])
            labels = labels + (0,) * pad
        return frames, np.asarray(labels, np.int32)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self._epoch_indices()
        self._epoch += 1
        batches = [
            idx[i:i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        if self.num_workers <= 0:
            for b in batches:
                yield self._collate([self.dataset[int(i)] for i in b])
            return

        # Pipelined decode: a worker pool fills a bounded queue ahead of the
        # consumer; batch order is preserved.
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(
                            self.dataset.__getitem__, [int(i) for i in b]))
                        q.put(self._collate(items))
                except BaseException as e:  # surface in the consumer
                    q.put(e)
                    return
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class DevicePrefetcher:
    """Wraps a batch iterator; device_puts the next batch eagerly.

    With a sharding, the put distributes [B, K, ...] over the mesh ('data'
    [, 'frames']) axes; the transfer overlaps the consumer's compute because
    jax transfers are async until the array is used.

    Batches are ``(frames, labels, *rest)`` tuples: frames are always put;
    labels only when ``put_labels`` (the training/eval loops keep labels
    host-side for sklearn metrics — re-pulling them through the axon tunnel
    costs ~1.5 s per pull, CLAUDE.md); ``rest`` passes through untouched.
    """

    def __init__(self, loader, sharding=None, label_sharding=None,
                 lookahead: int = 1, put_labels: bool = True):
        self.loader = loader
        self.sharding = sharding
        self.label_sharding = label_sharding
        self.lookahead = max(1, lookahead)
        self.put_labels = put_labels

    def _put(self, batch):
        import jax

        frames, labels, *rest = batch
        frames = (jax.device_put(frames, self.sharding)
                  if self.sharding is not None else jax.device_put(frames))
        if self.put_labels:
            labels = (jax.device_put(labels, self.label_sharding)
                      if self.label_sharding is not None
                      else jax.device_put(labels))
        return (frames, labels, *rest)

    def __iter__(self):
        from collections import deque

        pending = deque()
        it = iter(self.loader)
        try:
            for _ in range(self.lookahead):
                pending.append(self._put(next(it)))
        except StopIteration:
            pass
        for batch in it:
            nxt = self._put(batch)
            yield pending.popleft()
            pending.append(nxt)
        while pending:
            yield pending.popleft()

    def __len__(self):
        return len(self.loader)
