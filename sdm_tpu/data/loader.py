"""Host-side batched loader with threaded decode + batch prefetch.

Replaces torch.utils.data.DataLoader(num_workers=4)
(/root/reference/train_diffusion.py:148-157) with a TPU-friendly pipeline:
whole batches are decoded straight into one contiguous NHWC array by the
native C++ batch decoder (csrc/sdm_decode.cc — its own thread pool, zero
Python-side stacking; engaged only after a bit-identity canary against cv2,
see data/native.py), falling back to cv2 decode fanned out over a Python
thread pool (cv2 releases the GIL), and a small queue keeps
`prefetch` batches ready so the accelerator never waits on the host. Batch
shapes are static (drop_last defaults True for training) so every step hits
the same compiled executable — the reference's variable final batch would
force an XLA recompile per epoch.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def _collate(samples) -> dict:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


class DatasetShard:
    """Per-process view of a dataset for multi-host training: a fixed index
    subset (strided split from sdm_tpu.parallel.multihost.shard_indices,
    truncated so every process has the same length — SPMD programs must run
    in lockstep). Other attributes (e.g. get_labels) delegate to the base."""

    def __init__(self, dataset, indices):
        self._dataset = dataset
        self._indices = list(indices)

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self._dataset[self._indices[i]]

    def batch_paths(self, indices):
        # Must translate shard-local indices before delegating — the
        # __getattr__ fallback would hand the base dataset the wrong rows.
        bp = getattr(self._dataset, "batch_paths", None)
        if bp is None:
            return None
        return bp([self._indices[i] for i in indices])

    def __getattr__(self, name):
        return getattr(self._dataset, name)


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 8, drop_last: bool = True,
                 prefetch: int = 2, seed: Optional[int] = None,
                 native_decode: bool = True):
        self.dataset = dataset
        self.batch_size = min(batch_size, len(dataset)) if len(dataset) else batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last and len(dataset) >= batch_size
        self.prefetch = prefetch
        self._rng = random.Random(seed)
        self._epoch = 0
        # Native batched decode (csrc/sdm_decode.cc via data/native.py):
        # one C call decodes the whole batch into a contiguous NHWC array.
        # Engaged only when the library builds AND its canary decode is
        # bit-identical to cv2 (native.available()); any runtime failure
        # permanently falls back to the Python path for this loader.
        self._native = bool(native_decode)
        self._native_dims: dict = {}

    def _native_batch(self, indices) -> Optional[dict]:
        """Decode one batch natively, or None to use the Python path."""
        if not self._native:
            return None
        bp = getattr(self.dataset, "batch_paths", None)
        if bp is None:
            return None
        try:
            from sdm_tpu.data import native
            if not native.available():
                self._native = False
                return None
            plan = bp(indices)
            if plan is None:
                return None
            img_fields, extras = plan
            out = {}
            for key, paths in img_fields.items():
                if key not in self._native_dims:
                    self._native_dims[key] = native.probe(paths[0])
                h, w = self._native_dims[key]
                arr = native.decode_batch(paths, h, w,
                                          num_threads=self.num_workers)
                # Same normalization contract as the per-item path
                # (datasets._DecodeCache.norm_batch; uint8 or [-1, 1]).
                out[key] = self.dataset._cache.norm_batch(arr)
            for key, vals in extras.items():
                out[key] = (np.stack(vals)
                            if isinstance(vals[0], np.ndarray) else vals)
            return out
        except Exception as e:
            import logging
            logging.info(f"native decode failed ({e}); using Python loader")
            self._native = False
            return None

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(idx)
        batches = []
        for i in range(0, len(idx), self.batch_size):
            b = idx[i:i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                continue
            batches.append(b)
        return batches

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        batches = self._batch_indices()
        if not batches:
            return iter(())

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put that gives up if the consumer abandoned the epoch
            # (e.g. early break) so the producer thread can exit.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        batch = self._native_batch(b)
                        if batch is None:
                            samples = list(pool.map(
                                self.dataset.__getitem__, b))
                            batch = _collate(samples)
                        if not _put(batch):
                            return
            except Exception as e:  # surface decode errors to the consumer
                _put(e)
            finally:
                _put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()

        def gen():
            try:
                while True:
                    item = q.get()
                    if item is sentinel:
                        break
                    if isinstance(item, Exception):
                        raise item
                    yield item
            finally:
                stop.set()
        return gen()
