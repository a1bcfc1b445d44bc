"""Patch extraction as reshape + matmul.

The reference patchifies with a Conv2d of kernel == stride == (40, 8)
(reference: models/transformers.py:99-109). On TPU a stride-equals-kernel conv
is exactly a reshape followed by one large matmul — expressed that way, XLA
tiles it straight onto the MXU with no im2col overhead.

Flatten order of each patch is (c, h, w) — the same order torch uses to
flatten its Conv2d weight (D, C, H, W) — so weights are interchangeable with
the reference for parity testing.
"""

from __future__ import annotations

import jax


def patchify(x: jax.Array, patch_h: int, patch_w: int) -> jax.Array:
    """(N, H, W, C) -> (N, S, patch_h * patch_w * C) with S = (H//ph) * (W//pw).

    For text lines H == patch_h, so S = W // patch_w (one frame per 8 px).
    Each patch vector is ordered (c, h, w) to match torch Conv2d weight layout.
    """
    n, h, w, c = x.shape
    gh = h // patch_h
    gw = w // patch_w
    x = x.reshape(n, gh, patch_h, gw, patch_w, c)
    # -> (N, gh, gw, C, patch_h, patch_w): patch-major grid, (c, h, w) inside
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, gh * gw, c * patch_h * patch_w)
