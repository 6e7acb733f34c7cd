"""Datasets reproducing the reference's cv2 loading semantics, NHWC-native.

Capability parity with /root/reference/custom_dataset/ (ImageDataset,
ConditionalImgDataset, DoodleImgDataset): cv2.imread (note: **BGR** channel
order, deliberately preserved — the plot writer un-permutes it exactly like
the reference, utils/utils.py:41-42), scaled to [-1, 1] via (x - 127.5)/127.5.
Unlike the reference there is no CHW permute: batches stay HWC/NHWC, the
TPU-native layout.

Labelled datasets read the reference's TinyDB JSON files directly
(sdm_tpu/data/tinydb_compat.py) and shuffle once at construction, as the
reference does (conditional_img_dataset.py:28).
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import numpy as np

from sdm_tpu.data.tinydb_compat import read_tables


def _imread_u8(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(f"cv2 failed to read image: {path}")
    return img  # HWC, BGR, uint8


def _norm(img_u8: np.ndarray) -> np.ndarray:
    return (img_u8.astype(np.float32) - 127.5) / 127.5  # [-1, 1]


class _DecodeCache:
    """Optional in-RAM cache of decoded uint8 images.

    The reference re-decodes every image every epoch
    (img_dataset.py:26-29); on hosts where decode is the training
    bottleneck, caching the (much smaller) uint8 pixels and normalizing at
    batch time keeps the accelerator fed. Thread-safe for the loader's
    decode pool (dict ops are atomic; duplicate decodes are benign).

    With normalized=False the raw uint8 pixels are returned: the training
    loop ships those to the device (4x less host->device traffic) and the
    train step normalizes on-device — bit-exact, since (u8 - 127.5)/127.5
    is the same computation either side of the transfer."""

    def __init__(self, enabled: bool, normalized: bool = True):
        self.enabled = enabled
        self.normalized = normalized
        self._cache = {}

    def norm_batch(self, arr: np.ndarray) -> np.ndarray:
        """Apply this cache's normalization contract to a whole uint8 batch
        (the native decoder's output) — same math as _norm, vectorized."""
        return _norm(arr) if self.normalized else arr

    def read(self, path: str) -> np.ndarray:
        if not self.enabled:
            img = _imread_u8(path)
        else:
            img = self._cache.get(path)
            if img is None:
                img = _imread_u8(path)
                self._cache[path] = img
        return _norm(img) if self.normalized else img


def _imread_norm(path: str) -> np.ndarray:
    return _norm(_imread_u8(path))


class ImageDataset:
    """Plain list-of-paths image dataset (img_dataset.py:10-39)."""

    def __init__(self, img_paths: Sequence[str] = (), return_filepaths: bool = False,
                 cache_decoded: bool = False, normalized: bool = True):
        self.img_paths = list(img_paths)
        self.return_filepaths = return_filepaths
        self._cache = _DecodeCache(cache_decoded, normalized)

    def __len__(self) -> int:
        return len(self.img_paths)

    def __getitem__(self, index: int):
        path = self.img_paths[index]
        img = self._cache.read(path)
        if self.return_filepaths:
            return {"image": img, "path": path}
        return {"image": img}

    def batch_paths(self, indices):
        """Native-decode plan for the loader's batched fast path
        (data/native.py): ({field: [image paths]}, {field: [plain values]}),
        or None when this dataset must go through __getitem__ (RAM cache
        enabled — its decode-once semantics would be bypassed)."""
        if self._cache.enabled:
            return None
        paths = [self.img_paths[i] for i in indices]
        extras = {"path": paths} if self.return_filepaths else {}
        return {"image": paths}, extras


class ConditionalImgDataset:
    """TinyDB-backed labelled dataset (conditional_img_dataset.py:14-64):
    table `Data` rows carry `filename` + one float field per label name from
    table `Labels`."""

    def __init__(self, dataset_path: Optional[str] = None, seed: Optional[int] = None,
                 cache_decoded: bool = False, normalized: bool = True):
        tables = read_tables(dataset_path)
        data_rows = tables.get("Data", [])
        if len(data_rows) <= 0:
            raise Exception("No data found in Data table.")
        label_rows = tables.get("Labels", [])
        if len(label_rows) <= 0:
            raise Exception("No data found in Labels table.")
        self.all_labels: List[str] = label_rows[0]["labels"]
        rng = random.Random(seed)
        rng.shuffle(data_rows)  # initial shuffle (conditional_img_dataset.py:28)
        self.dataset: List[Tuple[str, List[float]]] = [
            (row["filename"], [float(row[lbl]) for lbl in self.all_labels])
            for row in data_rows]
        self._cache = _DecodeCache(cache_decoded, normalized)

    def get_labels(self) -> List[str]:
        return self.all_labels

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int):
        path, labels = self.dataset[index]
        return {"image": self._cache.read(path),
                "labels": np.asarray(labels, dtype=np.float32)}

    def batch_paths(self, indices):
        """See ImageDataset.batch_paths."""
        if self._cache.enabled:
            return None
        rows = [self.dataset[i] for i in indices]
        return ({"image": [p for p, _ in rows]},
                {"labels": [np.asarray(l, dtype=np.float32)
                            for _, l in rows]})


class DoodleImgDataset:
    """TinyDB-backed image/conditional-image pairs (doodle_dataset.py:14-65):
    `Data` rows map `filename` -> cond-image path stored under the first
    label name."""

    def __init__(self, dataset_path: Optional[str] = None, seed: Optional[int] = None,
                 cache_decoded: bool = False, normalized: bool = True):
        tables = read_tables(dataset_path)
        data_rows = tables.get("Data", [])
        if len(data_rows) <= 0:
            raise Exception("No data found in Data table.")
        label_rows = tables.get("Labels", [])
        if len(label_rows) <= 0:
            raise Exception("No data found in Labels table.")
        self.all_labels: List[str] = label_rows[0]["labels"]
        rng = random.Random(seed)
        rng.shuffle(data_rows)
        label = self.all_labels[0]
        self.dataset: List[Tuple[str, str]] = [
            (row["filename"], row[label]) for row in data_rows]
        self._cache = _DecodeCache(cache_decoded, normalized)

    def get_labels(self) -> List[str]:
        return self.all_labels

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int):
        img_path, cond_path = self.dataset[index]
        return {"image": self._cache.read(img_path),
                "cond_img": self._cache.read(cond_path)}

    def batch_paths(self, indices):
        """See ImageDataset.batch_paths."""
        if self._cache.enabled:
            return None
        rows = [self.dataset[i] for i in indices]
        return ({"image": [p for p, _ in rows],
                 "cond_img": [c for _, c in rows]}, {})
