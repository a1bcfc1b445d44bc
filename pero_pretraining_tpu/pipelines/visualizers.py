"""Per-pipeline visualizers: first-batch qualitative renders.

Ports of MaskedVisualizer (reference: masked_pretraining/visualizer.py:6-54),
JointEmbeddingVisualizer (joint_embedding_pretraining/visualizer.py:8-121)
and AutoEncodersVisualizer (autoencoders/visualizer.py:15-29). The retrieval
collage keeps the reference's shape but retrieves the MOST similar frames
(the reference's `largest=False` at visualizer.py:91 retrieves least-similar
— a bug we do not replicate).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pero_pretraining_tpu.ops.masking import apply_patch_mask, make_mask_tile, sample_patch_mask
from pero_pretraining_tpu.training.state import TrainState
from pero_pretraining_tpu.utils.visualizer import Visualizer


def _first_batch(dataloader):
    return next(iter(dataloader))


class MaskedVisualizer:
    """Render inputs (optionally with the pixel mask applied), labels,
    argmax predictions and a correctness strip."""

    def __init__(self, task, dataloader, show_masked_images: bool = False, seed: int = 11):
        self.task = task
        self.dataloader = dataloader
        self.show_masked_images = show_masked_images
        self.seed = seed
        self.visualizer = Visualizer()

        def forward(params, model_state, images, mask):
            logits, _ = task._apply(params, model_state, images, mask, jax.random.PRNGKey(0), train=False)
            return jnp.argmax(logits, axis=-1)

        self._forward = jax.jit(forward)

    def visualize(self, state: TrainState) -> np.ndarray:
        batch = _first_batch(self.dataloader)
        labels = batch["labels"]
        mask = np.asarray(
            sample_patch_mask(jax.random.PRNGKey(self.seed), jnp.asarray(labels), self.task.masking_prob)
        )
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        predictions = np.asarray(self._forward(state.params, state.model_state, images, jnp.asarray(mask)))

        shown = np.asarray(batch["images"])
        if self.show_masked_images:
            cfg = self.task.backbone_config
            tile = jnp.asarray(make_mask_tile(cfg.patch_size[0], cfg.patch_size[1], cfg.in_channels))
            shown = np.asarray(apply_patch_mask(images, jnp.asarray(mask), tile))

        return self.visualizer.visualize(
            images=shown,
            image_masks=batch.get("image_masks"),
            labels=labels,
            predicted_labels=predictions,
            mask=mask,
            num_labels=self.task.head_config.out_features,
        )


class JointEmbeddingVisualizer:
    """Both views with masks + a nearest-neighbour retrieval collage: one
    random query frame per line from view 1, top-k most similar frames across
    all view-2 frames."""

    def __init__(self, task, dataloader, top_k: int = 5, patch_width: int = 64, seed: int = 11):
        self.task = task
        self.dataloader = dataloader
        self.top_k = top_k
        self.patch_width = patch_width
        self.seed = seed
        self.visualizer = Visualizer()

        def forward(params, model_state, images1, images2):
            out1, out2, _ = task._apply(params, model_state, images1, images2, jax.random.PRNGKey(0), train=False)
            return out1, out2

        self._forward = jax.jit(forward)

    def visualize(self, state: TrainState) -> np.ndarray:
        batch = _first_batch(self.dataloader)
        images1 = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        images2 = jnp.asarray(batch["images2"], dtype=jnp.float32) / 255.0
        out1, out2 = self._forward(state.params, state.model_state, images1, images2)
        out1, out2 = np.asarray(out1, dtype=np.float32), np.asarray(out2, dtype=np.float32)

        base = self.visualizer.visualize(
            images=batch["images"],
            images2=batch["images2"],
            image_masks=batch.get("image_masks"),
            image_masks2=batch.get("image_masks2"),
            shift_masks=batch.get("shift_masks"),
            shift_masks2=batch.get("shift_masks2"),
            original_images=batch.get("original_images"),
            original_images2=batch.get("original_images2"),
        )
        collage = self._retrieval_collage(batch, out1, out2)
        if collage is not None:
            separator = np.full((10, max(base.shape[1], collage.shape[1]), 3), 255, dtype=np.uint8)
            width = separator.shape[1]

            def pad(img):
                out = np.zeros((img.shape[0], width, 3), dtype=np.uint8)
                out[:, : img.shape[1]] = img
                return out

            base = np.concatenate([pad(base), separator, pad(collage)], axis=0)
        return base

    def _retrieval_collage(self, batch, out1, out2) -> Optional[np.ndarray]:
        rng = np.random.RandomState(self.seed)
        n, s, _ = out1.shape
        f = self.visualizer.subsampling_factor
        half = self.patch_width // 2
        im1 = batch["image_masks"]
        im2 = batch["image_masks2"]
        rows = []
        flat2 = out2.reshape(n * s, -1)
        flat2 = flat2 / np.maximum(np.linalg.norm(flat2, axis=1, keepdims=True), 1e-12)
        valid2 = im2.reshape(-1).astype(bool)
        for i in range(n):
            content = np.nonzero(im1[i])[0]
            if len(content) == 0:
                continue
            q = int(rng.choice(content))
            qv = out1[i, q]
            qv = qv / max(np.linalg.norm(qv), 1e-12)
            sims = flat2 @ qv
            sims[~valid2] = -np.inf
            top = np.argsort(sims)[::-1][: self.top_k]  # MOST similar (reference bug fixed)
            patches = [self._crop_frame(batch["images"][i], q, f, half)]
            for t in top:
                line, frame = divmod(int(t), s)
                patches.append(self._crop_frame(batch["images2"][line], frame, f, half))
            rows.append(np.concatenate(patches, axis=1))
        if not rows:
            return None
        return np.concatenate(rows, axis=0)

    @staticmethod
    def _crop_frame(image: np.ndarray, frame: int, f: int, half: int) -> np.ndarray:
        center = frame * f + f // 2
        h, w, _ = image.shape
        out = np.zeros((h, 2 * half, 3), dtype=np.uint8)
        lo, hi = max(0, center - half), min(w, center + half)
        out[:, half - (center - lo) : half + (hi - center)] = image[:, lo:hi]
        return out


class AutoencoderVisualizer:
    """Input vs reconstruction columns (reference: autoencoders/visualizer.py)."""

    def __init__(self, task, dataloader):
        self.task = task
        self.dataloader = dataloader
        self.visualizer = Visualizer()

        def forward(params, model_state, images):
            out, _ = task._apply(params, model_state, images, jax.random.PRNGKey(0), train=False)
            return out["reconstructions"]

        self._forward = jax.jit(forward)

    def visualize(self, state: TrainState) -> np.ndarray:
        batch = _first_batch(self.dataloader)
        images = jnp.asarray(batch["images"], dtype=jnp.float32) / 255.0
        recon = np.asarray(self._forward(state.params, state.model_state, images), dtype=np.float32)
        left = self.visualizer.visualize_column(batch["images"])
        right = self.visualizer.visualize_column(np.clip(recon, 0.0, 1.0))
        separator = np.full((left.shape[0], 10, 3), 255, dtype=np.uint8)
        return np.concatenate([left, separator, right], axis=1)
