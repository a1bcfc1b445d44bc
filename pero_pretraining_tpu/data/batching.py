"""Fixed-shape batch collation.

Behavioral port of the reference's BatchCreator (common/dataloader.py:22-196)
with one deliberate change for TPU: the target width is STATIC (`pad_to` or
`crop_width`), not max-in-batch+32 — XLA compiles once per shape, and a fixed
canvas is what makes the whole train step one cached program. All mask/shift
semantics are identical:

- each line lands at a random left padding quantized to the subsampling
  factor (dataloader.py:85-97),
- `image_masks` are 1 on real-content frames, 0 on padding (:81, :94-95),
- paired views get independent left paddings unless `same_left_paddings`,
  optional random crops with a random relative shift (:106-193),
- `shift_masks`: 1 = shared region, 0 = not shared, value 2 = shared-but-
  padding; mask2 is mask1 reversed (:128-138),
- labels stacked into (N, S) int32 filled with -1, offset by left padding
  (:56-66).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class CTCBatchCreator:
    """Collation for CTC fine-tuning: images via the base BatchCreator, plus
    charset-encoded label sequences padded to `max_label_len` with 0 and a
    float padding mask (1 = padded) in the optax.ctc_loss convention."""

    def __init__(self, charset, base: "BatchCreator", max_label_len: int = 256):
        self.charset = charset
        self.base = base
        self.seed = base.seed  # content-seed passthrough for the loader
        self.max_label_len = max_label_len

    def create_batch(self, items: List[Dict], rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
        batch = self.base.create_batch(items, rng=rng)
        n = len(items)
        labels = np.zeros((n, self.max_label_len), dtype=np.int32)
        paddings = np.ones((n, self.max_label_len), dtype=np.float32)
        texts = []
        for i, item in enumerate(items):
            ids = self.charset.encode(item["text"])[: self.max_label_len]
            labels[i, : len(ids)] = ids
            paddings[i, : len(ids)] = 0.0
            texts.append(item["text"])
        batch["ctc_labels"] = labels
        batch["ctc_label_paddings"] = paddings
        batch["texts"] = texts
        return batch


class BatchCreator:
    def __init__(
        self,
        pad_to: int = 2048,
        subsampling_factor: int = 8,
        crop_width: Optional[int] = None,
        crop_step: int = 1,
        same_left_paddings: bool = False,
        seed: Optional[int] = None,
        use_native: bool = True,
        left_align: bool = False,
    ):
        self.pad_to = pad_to
        self.subsampling_factor = subsampling_factor
        self.crop_width = crop_width
        self.crop_step = crop_step
        self.same_left_paddings = same_left_paddings
        self.seed = seed
        # Stateful fallback RNG for direct create_batch() calls. The loaders
        # never use it: they pass an explicit per-batch rng derived from
        # (seed, global batch index), making batch CONTENT a pure function of
        # the stream position (see loader.py "determinism contracts").
        self.rng = np.random.RandomState(seed)
        self.use_native = use_native
        # left_align: place every line at padding 0 and emit content widths —
        # the on-device fused preprocessing (ops/preprocess.py) then does the
        # shift augmentation inside the jitted step
        self.left_align = left_align

    def _native(self):
        if not self.use_native:
            return None
        from pero_pretraining_tpu.data import native

        return native if native.available() else None

    # ------------------------------------------------------------------ crops
    def _crop_image(self, image: np.ndarray, rng: np.random.RandomState, start: Optional[int] = None):
        if image.shape[1] <= self.crop_width:
            return image, 0
        if start is None:
            diff = image.shape[1] - self.crop_width
            start = rng.randint(0, diff) // self.crop_step * self.crop_step
        start = int(np.clip(start, 0, image.shape[1] - self.crop_width))
        return image[:, start : start + self.crop_width, :], start

    def _crop_pair(self, item: Dict, rng: np.random.RandomState) -> int:
        """Crop both views with a random relative shift (reference:
        dataloader.py:157-181). Returns the crop shift in frames."""
        f = self.subsampling_factor
        item["image_original"] = item["image"]
        item["image2_original"] = item["image2"]

        item["image"], start = self._crop_image(item["image"], rng)
        min_shift = -min(start // f, self.crop_width // f - 1)
        max_shift = max(
            0, min((item["image_original"].shape[1] - start - self.crop_width) // f, self.crop_width // f - 1)
        )
        shift = min_shift if min_shift == max_shift else rng.randint(min_shift, max_shift)
        start += shift * f
        item["image2"], _ = self._crop_image(item["image2"], rng, start=start)
        return shift

    # ------------------------------------------------------------------ views
    def _draw_left_padding(self, width: int, target: int, rng: np.random.RandomState) -> int:
        if width >= target:
            return 0
        return rng.randint(0, target - width) // self.subsampling_factor

    def _place(self, canvas: np.ndarray, mask: np.ndarray, image: np.ndarray, left_padding: int):
        """Place a line at the given left padding; fill the frame mask."""
        f = self.subsampling_factor
        target = canvas.shape[1]
        w = image.shape[1]
        lp_px = left_padding * f
        canvas[:, lp_px : lp_px + w] = image[:, : target - lp_px]
        mask[:left_padding] = 0
        mask[left_padding + int(np.ceil(w / f)) :] = 0
        return left_padding

    def _pack_view(self, images: List[np.ndarray], left_paddings: List[int], target: int):
        """(n, H, W, C) canvas + (n, S) masks, native when available."""
        native = self._native()
        if native is not None:
            return native.pack_lines(images, left_paddings, target, self.subsampling_factor)
        n = len(images)
        height, _, channels = images[0].shape
        canvas = np.zeros((n, height, target, channels), dtype=np.uint8)
        masks = np.ones((n, target // self.subsampling_factor), dtype=np.int32)
        for i in range(n):
            self._place(canvas[i], masks[i], images[i], left_paddings[i])
        return canvas, masks

    # ------------------------------------------------------------------ main
    def create_batch(self, items: List[Dict], rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
        if rng is None:
            rng = self.rng
        f = self.subsampling_factor
        has_pairs = any(d.get("image2") is not None for d in items)

        if self.crop_width is not None:
            crop_shifts = [self._crop_pair(d, rng) if has_pairs else 0 for d in items]
            target = self.crop_width
        else:
            crop_shifts = [0] * len(items)
            target = self.pad_to

        n = len(items)
        s = target // f

        view1 = [d["image"] for d in items]
        if self.left_align:
            left_paddings = [0] * n
        else:
            left_paddings = [self._draw_left_padding(img.shape[1], target, rng) for img in view1]
        images, image_masks = self._pack_view(view1, left_paddings, target)

        labels = None
        if any(d.get("labels") is not None for d in items):
            native = self._native()
            if native is not None:
                labels = native.stack_labels([d.get("labels") for d in items], left_paddings, s)
            else:
                labels = np.full((n, s), -1, dtype=np.int32)
                for i, (d, lp) in enumerate(zip(items, left_paddings)):
                    if d.get("labels") is not None:
                        lab = np.asarray(d["labels"], dtype=np.int32)[: s - lp]
                        labels[i, lp : lp + len(lab)] = lab

        batch: Dict[str, np.ndarray] = {
            "images": images,
            "image_masks": image_masks,
            "ids": np.asarray([d["image_id"] for d in items], dtype=object),
        }
        if self.left_align:
            batch["widths"] = np.asarray(
                [-(-d["image"].shape[1] // f) for d in items], dtype=np.int32
            )
        if labels is not None:
            batch["labels"] = labels

        if has_pairs:
            view2 = [d["image2"] for d in items]
            if self.same_left_paddings:
                left_paddings2 = list(left_paddings)
            else:
                left_paddings2 = [self._draw_left_padding(img.shape[1], target, rng) for img in view2]
            images2, image_masks2 = self._pack_view(view2, left_paddings2, target)

            shifts = np.asarray(
                [cs + (lp1 - lp2) for cs, lp1, lp2 in zip(crop_shifts, left_paddings, left_paddings2)],
                dtype=np.int32,
            )
            shift_masks1 = np.zeros((n, s), dtype=np.int32)
            for i, shift in enumerate(shifts):
                if shift < 0:
                    shift_masks1[i, :shift] = 1
                else:
                    shift_masks1[i, shift:] = 1
            shift_masks2 = np.copy(shift_masks1[:, ::-1])
            shift_masks1[(shift_masks1 == 1) & (image_masks == 0)] = 2
            shift_masks2[(shift_masks2 == 1) & (image_masks2 == 0)] = 2

            batch.update(
                {
                    "images2": images2,
                    "image_masks2": image_masks2,
                    "shifts": shifts,
                    "shift_masks": shift_masks1,
                    "shift_masks2": shift_masks2,
                }
            )
            for key in ("image_original", "image2_original"):
                if any(key in d for d in items):
                    out_key = "original_images" if key == "image_original" else "original_images2"
                    max_w = max(d[key].shape[1] for d in items if key in d)
                    height, channels = items[0][key].shape[0], items[0][key].shape[2]
                    originals = np.zeros((n, height, max_w, channels), dtype=np.uint8)
                    for i, d in enumerate(items):
                        if key in d:
                            originals[i, :, : d[key].shape[1]] = d[key]
                    batch[out_key] = originals

        return batch
