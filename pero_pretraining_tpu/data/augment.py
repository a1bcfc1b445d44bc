"""Line-image augmentations.

The reference accepts an `--augmentations` name whose definitions live
outside the repo (in the PERO-OCR ecosystem; reference:
masked_pretraining/train.py:28 passes the string straight to the Dataset).
Here a small registry of standard text-line photometric augmentations fills
that role: callables with the reference's `aug(image=img) -> img` signature
operating on uint8 BGR arrays.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


class PhotometricAugment:
    """Brightness/contrast jitter + gaussian noise + occasional blur."""

    def __init__(
        self,
        brightness: float = 0.2,
        contrast: float = 0.2,
        noise_std: float = 8.0,
        blur_prob: float = 0.2,
        seed: Optional[int] = None,
    ):
        self.brightness = brightness
        self.contrast = contrast
        self.noise_std = noise_std
        self.blur_prob = blur_prob
        self.rng = np.random.RandomState(seed)

    def __call__(self, image: np.ndarray, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        # The loaders pass a per-item rng derived from (seed, global batch
        # index, position) so augmented content is a pure function of the
        # stream position — independent of thread scheduling, process count,
        # and resume point. self.rng is the fallback for direct calls.
        if rng is None:
            rng = self.rng
        img = image.astype(np.float32)
        img = img * (1.0 + rng.uniform(-self.contrast, self.contrast))
        img = img + 255.0 * rng.uniform(-self.brightness, self.brightness)
        if self.noise_std > 0:
            img = img + rng.randn(*img.shape).astype(np.float32) * self.noise_std
        if self.blur_prob > 0 and rng.rand() < self.blur_prob:
            k = np.array([0.25, 0.5, 0.25], dtype=np.float32)
            img = (
                img * 0.5
                + 0.25 * np.roll(img, 1, axis=1)
                + 0.25 * np.roll(img, -1, axis=1)
            )
        return np.clip(img, 0, 255).astype(np.uint8)


class _Named:
    def __init__(self, fn: Callable, name: str):
        self.fn = fn
        self.name = name

    def __call__(self, image: np.ndarray, rng=None) -> np.ndarray:
        return self.fn(image, rng=rng)


def _registry(seed: Optional[int]) -> Dict[str, Callable]:
    return {
        "none": lambda image, rng=None: image,
        "universal": PhotometricAugment(seed=seed),
        "light": PhotometricAugment(brightness=0.1, contrast=0.1, noise_std=4.0, blur_prob=0.1, seed=seed),
        "strong": PhotometricAugment(brightness=0.3, contrast=0.3, noise_std=14.0, blur_prob=0.35, seed=seed),
    }


def build_augmentations(name: Optional[str], seed: Optional[int] = None) -> Optional[Callable]:
    """Returns a callable with the reference signature `aug(image=img)` plus
    an optional `rng=` keyword (the loaders pass a pure per-item rng), or
    None for no augmentation."""
    if name is None or name == "none":
        return None
    registry = _registry(seed)
    if name not in registry:
        raise ValueError(f"Unknown augmentations '{name}'; available: {sorted(registry)}")
    aug = registry[name]
    return lambda image, rng=None: aug(image, rng=rng)
