"""Contour-distance-based device features: extrema points, ROI radius,
radial intensity distribution.

References: src/nyx/features/extrema.cpp:?-60, roi_radius.cpp:14-35,
radial_distribution.cpp:43-240, pixel.cpp:146-168.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import take_per_row


def extrema(ctx, cfg):
    """8 extremal boundary points P1..P8 in global coordinates
    (extrema.cpp): P1/P2 on the top row (left/right), P3/P4 on the right
    column (top/bottom), P5/P6 on the bottom row (right/left), P7/P8 on the
    left column (bottom/top)."""
    dt = ctx.intens.dtype
    m = ctx.mask
    B, H, W = m.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    BIGX = jnp.int32(W + 1)
    BIGY = jnp.int32(H + 1)

    y_top = ctx.y0 * 0  # local top row is always 0 (crop starts at AABB)
    y_bot = ctx.heights - 1
    x_left = ctx.x0 * 0
    x_right = ctx.widths - 1

    def min_x_at_row(row):
        sel = m & (ys == row[:, None, None])
        return jnp.min(jnp.where(sel, xs, BIGX), axis=(1, 2))

    def max_x_at_row(row):
        sel = m & (ys == row[:, None, None])
        return jnp.max(jnp.where(sel, xs, -1), axis=(1, 2))

    def min_y_at_col(colv):
        sel = m & (xs == colv[:, None, None])
        return jnp.min(jnp.where(sel, ys, BIGY), axis=(1, 2))

    def max_y_at_col(colv):
        sel = m & (xs == colv[:, None, None])
        return jnp.max(jnp.where(sel, ys, -1), axis=(1, 2))

    gx = lambda v: (v + ctx.x0).astype(dt)
    gy = lambda v: (v + ctx.y0).astype(dt)

    out = {
        "EXTREMA_P1_Y": gy(y_top), "EXTREMA_P1_X": gx(min_x_at_row(y_top)),
        "EXTREMA_P2_Y": gy(y_top), "EXTREMA_P2_X": gx(max_x_at_row(y_top)),
        "EXTREMA_P3_Y": gy(min_y_at_col(x_right)), "EXTREMA_P3_X": gx(x_right),
        "EXTREMA_P4_Y": gy(max_y_at_col(x_right)), "EXTREMA_P4_X": gx(x_right),
        "EXTREMA_P5_Y": gy(y_bot), "EXTREMA_P5_X": gx(max_x_at_row(y_bot)),
        "EXTREMA_P6_Y": gy(y_bot), "EXTREMA_P6_X": gx(min_x_at_row(y_bot)),
        "EXTREMA_P7_Y": gy(max_y_at_col(x_left)), "EXTREMA_P7_X": gx(x_left),
        "EXTREMA_P8_Y": gy(min_y_at_col(x_left)), "EXTREMA_P8_X": gx(x_left),
    }
    return out
