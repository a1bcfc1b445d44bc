"""Synthetic batch generators shaped exactly like the real data pipeline.

Used by tests, the benchmark, and the multi-chip dry-run: same keys, dtypes,
and mask/shift semantics as data/batching.py produces from real LMDB data
(which mirrors the reference's collation, common/dataloader.py:30-155).
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np


def synthetic_masked_batch(
    rng: np.random.RandomState,
    batch_size: int = 16,
    width: int = 2048,
    height: int = 40,
    channels: int = 3,
    num_labels: int = 4096,
    subsampling: int = 8,
) -> Dict[str, np.ndarray]:
    """Random "text lines": uint8 images with random content width placed at a
    random left padding, per-frame labels (-1 outside content)."""
    s = width // subsampling
    images = np.zeros((batch_size, height, width, channels), dtype=np.uint8)
    labels = np.full((batch_size, s), -1, dtype=np.int32)
    image_masks = np.zeros((batch_size, s), dtype=np.int32)

    for i in range(batch_size):
        content_frames = rng.randint(s // 4, s + 1)
        left = rng.randint(0, s - content_frames + 1)
        px0, px1 = left * subsampling, (left + content_frames) * subsampling
        images[i, :, px0:px1] = rng.randint(0, 256, size=(height, px1 - px0, channels), dtype=np.uint8)
        labels[i, left : left + content_frames] = rng.randint(0, num_labels, size=content_frames)
        image_masks[i, left : left + content_frames] = 1

    return {"images": images, "labels": labels, "image_masks": image_masks}


def synthetic_paired_batch(
    rng: np.random.RandomState,
    batch_size: int = 16,
    width: int = 1024,
    height: int = 40,
    channels: int = 3,
    subsampling: int = 8,
) -> Dict[str, np.ndarray]:
    """Two views of the same content at different left paddings, with shift
    masks built exactly like the reference collation
    (common/dataloader.py:106-138): 1 = shared real content, 0 = outside the
    shared region, 2 = shared but padding."""
    s = width // subsampling
    images1 = np.zeros((batch_size, height, width, channels), dtype=np.uint8)
    images2 = np.zeros_like(images1)
    image_masks1 = np.zeros((batch_size, s), dtype=np.int32)
    image_masks2 = np.zeros_like(image_masks1)
    shifts = np.zeros(batch_size, dtype=np.int32)

    for i in range(batch_size):
        content_frames = rng.randint(s // 4, (3 * s) // 4)
        content = rng.randint(0, 256, size=(height, content_frames * subsampling, channels), dtype=np.uint8)
        lp1 = rng.randint(0, s - content_frames + 1)
        lp2 = rng.randint(0, s - content_frames + 1)
        images1[i, :, lp1 * subsampling : (lp1 + content_frames) * subsampling] = content
        images2[i, :, lp2 * subsampling : (lp2 + content_frames) * subsampling] = content
        image_masks1[i, lp1 : lp1 + content_frames] = 1
        image_masks2[i, lp2 : lp2 + content_frames] = 1
        shifts[i] = lp1 - lp2

    shift_masks1 = np.zeros((batch_size, s), dtype=np.int32)
    for i, shift in enumerate(shifts):
        if shift < 0:
            shift_masks1[i, :shift] = 1
        else:
            shift_masks1[i, shift:] = 1
    shift_masks2 = np.copy(shift_masks1[:, ::-1])
    shift_masks1[(shift_masks1 == 1) & (image_masks1 == 0)] = 2
    shift_masks2[(shift_masks2 == 1) & (image_masks2 == 0)] = 2

    return {
        "images": images1,
        "images2": images2,
        "image_masks": image_masks1,
        "image_masks2": image_masks2,
        "shifts": shifts,
        "shift_masks": shift_masks1,
        "shift_masks2": shift_masks2,
    }


def synthetic_batches(kind: str = "masked", seed: int = 0, **kwargs) -> Iterator[Dict[str, np.ndarray]]:
    rng = np.random.RandomState(seed)
    make = synthetic_masked_batch if kind == "masked" else synthetic_paired_batch
    while True:
        yield make(rng, **kwargs)
