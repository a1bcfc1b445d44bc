"""Visualizer rendering tests (shape/semantics; the reference's equivalent is
eyeballing PNGs — common/visualizer.py)."""

import numpy as np

from pero_pretraining_tpu.utils.visualizer import Visualizer, label_to_color


def test_label_to_color_range():
    assert label_to_color(0, 64) == (0, 0, 0)
    b, g, r = label_to_color(63, 64)
    assert (b, g, r) == (255, 255, 255)
    assert label_to_color(-1, 64) == (0, 0, 0)


def test_visualize_full_stack(rng):
    n, h, w = 3, 40, 128
    s = w // 8
    images = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
    image_masks = rng.randint(0, 2, size=(n, s))
    labels = rng.randint(0, 16, size=(n, s))
    predictions = rng.randint(0, 16, size=(n, s))
    mask = rng.randint(0, 2, size=(n, s))

    vis = Visualizer()
    out = vis.visualize(
        images=images,
        image_masks=image_masks,
        labels=labels,
        predicted_labels=predictions,
        mask=mask,
        num_labels=16,
    )
    # per line: image (40) + image-mask strip (8) + labels (8) + preds (8) + correctness (8)
    assert out.shape == (n * (h + 4 * 8), w, 3)
    assert out.dtype == np.uint8


def test_visualize_with_originals(rng):
    n, h, w = 2, 40, 128
    images = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
    originals = rng.randint(0, 256, size=(n, h, 200, 3)).astype(np.uint8)
    vis = Visualizer()
    out = vis.visualize(images=images, image_masks=np.ones((n, w // 8), np.int32), original_images=originals)
    # originals column appended after a 10-px separator
    assert out.shape[1] == w + 10 + 200
