"""Non-overlapping max-pool as reshape + max reduction.

The reference pools with torch MaxPool2d (reference: models/helpers.py:4-130
layer factories); the straight port is `flax.linen.max_pool`, which lowers to
`lax.reduce_window` and — crucially — differentiates through XLA's
`select-and-scatter`, a sequential window scan that costs ~1.9 ms of the
24.1 ms flagship VggT step on v5e (docs/PROFILE.md "VggT conv-stack trace").

Every pool in the VGG stacks is non-overlapping (strides == window), so the
same computation is exactly a reshape that splits each spatial axis into
(outer, window) and a `max` over the window axes. Forward is bit-identical to
`nn.max_pool`; backward becomes the VJP of a plain max reduction — a fused
elementwise compare/divide/multiply over the activations instead of
select-and-scatter.

Tie semantics differ in the backward ONLY: select-and-scatter routes the
cotangent to the first maximal element of a window, while the max-reduction
VJP splits it evenly across ties. Both are valid subgradients; ties occur at
ReLU zeros (where the upstream ReLU VJP masks the difference for strictly
negative pre-activations) and have no measurable training effect — training
equality is asserted against the framework's own reference semantics in
tests/test_pooling.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def max_pool_nonoverlap(x: jax.Array, window: Tuple[int, int]) -> jax.Array:
    """Max-pool NHWC `x` with strides == `window`, padding VALID.

    Equivalent to nn.max_pool(x, window, strides=window, padding="VALID")
    in the forward pass, with a cheap (elementwise) backward.
    """
    wh, ww = window
    if wh == 1 and ww == 1:
        return x
    n, h, w, c = x.shape
    oh, ow = h // wh, w // ww
    if oh * wh != h or ow * ww != w:  # VALID: drop the partial windows
        x = x[:, : oh * wh, : ow * ww, :]
    x = x.reshape(n, oh, wh, ow, ww, c)
    return jnp.max(x, axis=(2, 4))
