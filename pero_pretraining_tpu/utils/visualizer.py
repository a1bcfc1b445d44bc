"""Batch visualization: render lines + per-frame annotation strips to PNG.

Behavioral port of the reference's common Visualizer
(reference: common/visualizer.py:5-139): each text line is drawn with colored
8-px strips underneath for image masks (blue=padding/green=content), shift
masks (red/green/orange), labels and predictions (24-bit colormap), and a
correct/incorrect strip. Operates on NHWC uint8 batches (this framework's
native layout; the reference uses the same HWC per line).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

IMAGE_MASK_COLORS = {0: (64, 64, 255), 1: (64, 255, 64)}  # BGR: red padding, green content
SHIFT_MASK_COLORS = {0: (64, 64, 255), 1: (64, 255, 64), 2: (0, 192, 255)}  # + orange shared-padding
CORRECTNESS_COLORS = {0: (0, 0, 0), 1: (0, 255, 0), 2: (0, 0, 255)}  # unmasked/correct/incorrect


def label_to_color(label: int, num_labels: int) -> tuple:
    """24-bit colormap (reference: common/visualizer.py:122-139)."""
    if num_labels is None or num_labels <= 1 or label < 0:
        return (0, 0, 0)
    n = int((256**3 - 1) * label / (num_labels - 1))
    n = max(0, min(n, 256**3 - 1))
    r = (n >> 16) & 0xFF
    g = (n >> 8) & 0xFF
    b = n & 0xFF
    return (b, g, r)


def write_png(path: str, image: np.ndarray) -> None:
    """Write a BGR uint8 image."""
    try:
        import cv2

        cv2.imwrite(path, image)
    except ImportError:  # pragma: no cover
        import imageio

        imageio.imwrite(path, image[:, :, ::-1])


class Visualizer:
    def __init__(self, subsampling_factor: int = 8):
        self.subsampling_factor = subsampling_factor

    def visualize(
        self,
        images: np.ndarray,
        images2: Optional[np.ndarray] = None,
        image_masks: Optional[np.ndarray] = None,
        image_masks2: Optional[np.ndarray] = None,
        shift_masks: Optional[np.ndarray] = None,
        shift_masks2: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        predicted_labels: Optional[np.ndarray] = None,
        mask: Optional[np.ndarray] = None,
        num_labels: Optional[int] = None,
        original_images: Optional[np.ndarray] = None,
        original_images2: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        image = self.visualize_column(
            images, predictions=predicted_labels, labels=labels, num_labels=num_labels,
            image_masks=image_masks, shift_masks=shift_masks, mask=mask,
        )
        separator = np.full((image.shape[0], 10, 3), 255, dtype=np.uint8)
        if images2 is not None:
            column2 = self.visualize_column(
                images2, predictions=predicted_labels, labels=labels, num_labels=num_labels,
                image_masks=image_masks2, shift_masks=shift_masks2,
            )
            image = np.concatenate([image, separator, column2], axis=1)
        # pre-crop originals, line-padded to match the annotated rows
        # (reference: common/visualizer.py:33-47)
        for originals in (original_images, original_images2):
            if originals is None:
                continue
            line_padding = image.shape[0] // len(originals) - originals.shape[1]
            column = self.visualize_column(originals, line_padding=max(line_padding, 0))
            if column.shape[0] < image.shape[0]:
                column = np.pad(column, ((0, image.shape[0] - column.shape[0]), (0, 0), (0, 0)))
            image = np.concatenate([image, separator, column[: image.shape[0]]], axis=1)
        return image

    def visualize_column(
        self,
        images: np.ndarray,
        predictions: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        num_labels: Optional[int] = None,
        image_masks: Optional[np.ndarray] = None,
        shift_masks: Optional[np.ndarray] = None,
        mask: Optional[np.ndarray] = None,
        line_padding: int = 0,
    ) -> np.ndarray:
        lines = []
        for i, line_image in enumerate(np.asarray(images)):
            if line_image.dtype != np.uint8:
                line_image = np.clip(line_image * 255.0, 0, 255).astype(np.uint8)
            parts = [line_image]
            if line_padding > 0:
                parts.append(np.zeros((line_padding, line_image.shape[1], 3), dtype=np.uint8))
            if image_masks is not None:
                parts.append(self.annotation_strip(line_image.shape[1], image_masks[i], colors=IMAGE_MASK_COLORS))
            if shift_masks is not None:
                parts.append(self.annotation_strip(line_image.shape[1], shift_masks[i], colors=SHIFT_MASK_COLORS))
            if labels is not None:
                parts.append(self.annotation_strip(line_image.shape[1], labels[i], num_labels=num_labels))
                if predictions is not None:
                    parts.append(self.annotation_strip(line_image.shape[1], predictions[i], num_labels=num_labels))
                    correctness = np.where(
                        (mask[i] == 0) if mask is not None else np.zeros_like(labels[i], dtype=bool),
                        0,
                        np.where(predictions[i] == labels[i], 1, 2),
                    )
                    parts.append(self.annotation_strip(line_image.shape[1], correctness, colors=CORRECTNESS_COLORS))
            lines.append(np.concatenate(parts, axis=0))
        return np.concatenate(lines, axis=0)

    def annotation_strip(
        self,
        width: int,
        annotation: np.ndarray,
        num_labels: Optional[int] = None,
        colors: Optional[Dict[int, tuple]] = None,
    ) -> np.ndarray:
        f = self.subsampling_factor
        strip = np.zeros((f, width, 3), dtype=np.uint8)
        for j, value in enumerate(np.asarray(annotation)):
            value = int(value)
            color = colors[value] if colors is not None and value in colors else label_to_color(value, num_labels)
            strip[:, j * f : (j + 1) * f] = color
        return strip
