"""Datasets over line-image stores.

Two dataset flavors, mirroring the reference's formats exactly so artifacts
interoperate:

- `LinesDataset` (reference `Dataset`, common/dataset.py:11-105): a text
  "lines file" of `"<image_id> [label label ...]"` rows indexing a JPEG KV
  store; crops to max_width; labels truncated to max_width // label_step;
  optional paired second view with independent augmentation; `skip` offset
  for sharded offline label production.
- `PackedDataset` (reference `DatasetLMDB`, common/dataset.py:108-267): the
  lines "file" is itself a KV store of JSON records keyed `f"{idx:10d}"` with
  `labels` and `image` or `images` (multi-segment). `fill_width` packs
  consecutive lines with an 8-px striped-red EOL patch and label-0 separators
  until max_width — the TPU-preferred mode (static shapes, no padding waste).

JPEG decode uses cv2 when available (BGR, like the reference), PIL otherwise.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from pero_pretraining_tpu.data.storage import KVStore, open_store

logger = logging.getLogger(__name__)

try:
    import cv2  # type: ignore

    HAS_CV2 = True
except ImportError:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


def decode_image(data: bytes) -> Optional[np.ndarray]:
    """JPEG/PNG bytes -> (H, W, 3) uint8, BGR channel order (cv2 convention,
    matching the reference's cv2.imdecode at common/dataset.py:57).

    JPEGs go through the native libjpeg path (bit-identical to cv2, no
    Python-level dependency, decodes in the persistent no-GIL pool when
    batched); other formats fall back to cv2/PIL."""
    if data[:2] == b"\xff\xd8":  # JPEG magic
        from pero_pretraining_tpu.data import native

        if native.available():
            img = native.decode_jpeg(data)
            if img is not None:
                return img
    if HAS_CV2:
        img = cv2.imdecode(np.frombuffer(data, dtype=np.uint8), cv2.IMREAD_COLOR)
        return img
    import io

    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return img[:, :, ::-1].copy()  # RGB -> BGR


def encode_image(img: np.ndarray, ext: str = ".jpg", quality: Optional[int] = None) -> bytes:
    if HAS_CV2:
        flags = [int(cv2.IMWRITE_JPEG_QUALITY), quality] if quality is not None else []
        ok, data = cv2.imencode(ext, img, flags)
        if not ok:
            raise ValueError("image encode failed")
        return data.tobytes()
    import io

    from PIL import Image

    buf = io.BytesIO()
    is_jpeg = ext in (".jpg", ".jpeg")
    kwargs = {"quality": quality} if (is_jpeg and quality is not None) else {}
    Image.fromarray(img[:, :, ::-1]).save(buf, format="JPEG" if is_jpeg else "PNG", **kwargs)
    return buf.getvalue()


def parse_line(line: str) -> Tuple[str, Optional[List[int]]]:
    """`"<image_id> [l1 l2 ...]"` (reference: common/dataset.py:64-72)."""
    line = line.strip()
    if " " in line:
        image_id, *labels = line.split()
        return image_id, [int(l) for l in labels]
    return line, None


def make_eol_patch(height: int, label_step: int = 8) -> np.ndarray:
    """8-px striped red separator patch (reference: common/dataset.py:215-219:
    columns 0,1,2 mod 3 all get B-channel 255 -> a solid blue-channel stripe
    in BGR; we reproduce the exact pattern)."""
    patch = np.zeros((height, label_step, 3), dtype=np.uint8)
    patch[:, 0::3, 0] = 255
    patch[:, 1::3, 0] = 255
    patch[:, 2::3, 0] = 255
    return patch


class SupportsItemRng:
    """Mixin for datasets whose `__getitem__(idx)` is exactly `get(idx)`.

    The loaders then call `get(idx, rng=...)` with a pure per-item rng so
    augmentation draws don't depend on thread scheduling, process count, or
    resume point (loader.py determinism contract). A subclass that overrides
    `__getitem__` opts OUT automatically: the loaders detect the override and
    fall back to plain `__getitem__`, so custom behavior is never bypassed."""

    def __getitem__(self, idx: int) -> Dict:
        return self.get(idx)

    def get(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict:
        raise NotImplementedError


class LinesDataset(SupportsItemRng):
    """Map-style dataset over (image KV store, lines file)."""

    def __init__(
        self,
        store_path: str,
        lines_path: str,
        augmentations: Optional[Callable] = None,
        pair_images: bool = False,
        max_width: int = 2048,
        label_step: int = 8,
        skip: int = 0,
    ):
        self.store_path = store_path
        self.lines_path = lines_path
        self.augmentations = augmentations
        self.pair_images = pair_images
        self.max_width = max_width
        self.label_step = label_step
        self.skip = skip

        self._image_ids: List[str] = []
        self._labels: Dict[str, List[int]] = {}
        self._has_labels = False
        self._load_lines()
        self._store: Optional[KVStore] = None  # opened lazily (worker-safe)

    def name(self) -> str:
        return os.path.basename(self.lines_path)

    def _load_lines(self) -> None:
        with open(self.lines_path, "r") as f:
            for line in f:
                if not line.strip():
                    continue
                image_id, labels = parse_line(line)
                self._image_ids.append(image_id)
                if labels is not None:
                    self._labels[image_id] = labels
                    self._has_labels = True
        logger.info("Dataset '%s': %d images, %d labeled", self.lines_path, len(self._image_ids), len(self._labels))

    def store(self) -> KVStore:
        if self._store is None:
            self._store = open_store(self.store_path)
        return self._store

    def __len__(self) -> int:
        return len(self._image_ids) - self.skip

    def get(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict:
        """`__getitem__` with an explicit augmentation rng — the loaders pass
        one derived from (seed, global batch index, position) so augmented
        content is pure in the stream position (loader.py contract)."""
        idx = idx + self.skip
        image_id = self._image_ids[idx]
        data = self.store().get(image_id)
        if data is None:
            raise KeyError(f"image '{image_id}' not in store '{self.store_path}'")
        image = decode_image(data)
        if image is None:
            raise ValueError(f"cannot decode image '{image_id}'")
        image = image[:, : self.max_width]

        labels = None
        if self._has_labels and image_id in self._labels:
            labels = self._labels[image_id][: self.max_width // self.label_step]

        image2 = None
        if self.pair_images:
            image2 = np.copy(image)
            if self.augmentations is not None:
                image2 = self.augmentations(image=image2, rng=rng)
        if self.augmentations is not None:
            image = self.augmentations(image=image, rng=rng)

        return {"image": image, "image2": image2, "labels": labels, "image_id": image_id}


class TranscriptionDataset(SupportsItemRng):
    """(image store, transcription file) dataset for CTC fine-tuning.

    Transcription rows: `"<image_id>\\t<text>"` (tab-separated; text may
    contain spaces). Items carry the raw text; charset encoding happens in
    collation (data/batching.py CTCBatchCreator).
    """

    def __init__(
        self,
        store_path: str,
        transcriptions_path: str,
        augmentations: Optional[Callable] = None,
        max_width: int = 2048,
    ):
        self.store_path = store_path
        self.transcriptions_path = transcriptions_path
        self.augmentations = augmentations
        self.max_width = max_width

        self._items: List[Tuple[str, str]] = []
        with open(transcriptions_path, "r") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                if "\t" in line:
                    image_id, text = line.split("\t", 1)
                else:
                    image_id, _, text = line.partition(" ")
                self._items.append((image_id, text))
        self._store: Optional[KVStore] = None

    def name(self) -> str:
        return os.path.basename(self.transcriptions_path)

    def texts(self) -> List[str]:
        return [t for _, t in self._items]

    def store(self) -> KVStore:
        if self._store is None:
            self._store = open_store(self.store_path)
        return self._store

    def __len__(self) -> int:
        return len(self._items)

    def get(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict:
        image_id, text = self._items[idx]
        data = self.store().get(image_id)
        if data is None:
            raise KeyError(f"image '{image_id}' not in store '{self.store_path}'")
        image = decode_image(data)[:, : self.max_width]
        if self.augmentations is not None:
            image = self.augmentations(image=image, rng=rng)
        return {"image": image, "image2": None, "labels": None, "text": text, "image_id": image_id}


class PackedDataset(SupportsItemRng):
    """Dataset over a records KV store (JSON per line), with `fill_width`
    packing (reference DatasetLMDB, common/dataset.py:108-267)."""

    def __init__(
        self,
        store_path: str,
        records_path: str,
        augmentations: Optional[Callable] = None,
        pair_images: bool = False,
        max_width: int = 2048,
        label_step: int = 8,
        fill_width: bool = False,
        exact_width: bool = False,
    ):
        self.store_path = store_path
        self.records_path = records_path
        self.augmentations = augmentations
        self.pair_images = pair_images
        self.max_width = max_width
        self.label_step = label_step
        self.fill_width = fill_width
        self.exact_width = exact_width

        self._image_store: Optional[KVStore] = None
        self._records_store: Optional[KVStore] = None
        with open_store(records_path) as store:
            self.image_count = len(store)
        self._eol_patch: Optional[np.ndarray] = None

    def name(self) -> str:
        return os.path.basename(self.records_path)

    def _stores(self) -> Tuple[KVStore, KVStore]:
        if self._image_store is None:
            self._image_store = open_store(self.store_path)
            self._records_store = open_store(self.records_path)
        return self._image_store, self._records_store

    def __len__(self) -> int:
        return self.image_count

    def _load_record(self, idx: int) -> Tuple[np.ndarray, List[int]]:
        images_store, records_store = self._stores()
        record = records_store.get(f"{idx:10d}")
        if record is None:
            raise KeyError(f"record {idx} not in '{self.records_path}'")
        info = json.loads(record)
        labels = info["labels"]

        if "image" in info:
            data = images_store.get(info["image"])
            if data is None:
                raise KeyError(f"image '{info['image']}' not in store")
            img = decode_image(data)
        elif "images" in info:
            segments = []
            for image_id in info["images"]:
                data = images_store.get(image_id)
                if data is None:
                    raise KeyError(f"image '{image_id}' not in store")
                seg = decode_image(data)
                # per-segment pad to label_step + one extra step
                # (reference: common/dataset.py:182-185)
                pad = self.label_step - seg.shape[1] % self.label_step + self.label_step
                seg = np.concatenate([seg, np.zeros((seg.shape[0], pad, 3), dtype=np.uint8)], axis=1)
                segments.append(seg)
            img = np.concatenate(segments, axis=1)
        else:
            raise ValueError(f"record {idx} has neither 'image' nor 'images'")
        return img, list(labels)

    def _get_fixed_width_image(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Pack consecutive lines with EOL separators until max_width
        (reference: common/dataset.py:206-236)."""
        all_images, all_labels = [], []
        width = 0
        while True:
            image, labels = self._load_record(idx)
            width += image.shape[1]
            if width >= self.max_width and not self.exact_width:
                break
            if self._eol_patch is None:
                self._eol_patch = make_eol_patch(image.shape[0], self.label_step)
            if image.shape[1] % self.label_step != 0:
                pad = self.label_step - image.shape[1] % self.label_step
                image = np.concatenate([image, np.zeros((image.shape[0], pad, 3), dtype=np.uint8)], axis=1)
            labels = labels + [0]
            all_images.append(image)
            all_images.append(self._eol_patch)
            all_labels.append(labels)
            idx = (idx + 1) % self.image_count
            if width >= self.max_width:
                break
        image = np.concatenate(all_images, axis=1)
        labels = np.concatenate(all_labels)
        return image, labels

    def get(self, idx: int, rng: Optional[np.random.RandomState] = None) -> Dict:
        if self.fill_width:
            image, labels = self._get_fixed_width_image(idx)
        else:
            image, labels = self._load_record(idx)
            labels = np.asarray(labels)
        image = image[:, : self.max_width]
        labels = labels[: self.max_width // self.label_step]

        image2 = None
        if self.pair_images:
            # unlike the reference (which augments the already-augmented view
            # and marks it TODO at dataset.py:250), both views are independent
            # augmentations of the ORIGINAL image
            image2 = np.copy(image)
            if self.augmentations is not None:
                image2 = self.augmentations(image=image2, rng=rng)
        if self.augmentations is not None:
            image = self.augmentations(image=image, rng=rng)

        return {"image": image, "image2": image2, "labels": labels, "image_id": idx}
