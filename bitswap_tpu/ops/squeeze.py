"""Space-to-depth / depth-to-space in NHWC layout.

TPU-native replacements for the reference's `Squeeze2d` / `UnSqueeze2d`
(utils/torch/modules.py:169-211), which operate on NCHW.  We keep NHWC
throughout (the layout XLA:TPU prefers for convolutions) and reproduce the
reference's exact channel ordering so that a converted checkpoint would see
identical feature ordering: the reference maps (C,H,W) -> (C*f*f, H/f, W/f)
with the factor indices ordered (c, fh, fw) fastest-last — i.e. output
channel index = c * f*f + fh * f + fw.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x, factor: int = 2):
    """(B, H, W, C) -> (B, H/f, W/f, C*f*f) with reference channel order."""
    if factor == 1:
        return x
    b, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    # (b, h', fh, w', fw, c) -> (b, h', w', c, fh, fw): channel-major like the
    # reference's permute(0, 1, 3, 5, 2, 4) on NCHW (modules.py:183-185)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def depth_to_space(x, factor: int = 2):
    """(B, H, W, C*f*f) -> (B, H*f, W*f, C), inverse of space_to_depth."""
    if factor == 1:
        return x
    b, h, w, cff = x.shape
    c = cff // (factor * factor)
    assert c * factor * factor == cff, (cff, factor)
    x = x.reshape(b, h, w, c, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h, fh, w, fw, c)
    return x.reshape(b, h * factor, w * factor, c)
