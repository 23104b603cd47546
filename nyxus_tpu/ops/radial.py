"""Contour-distance-based device features: extrema points, ROI radius,
radial intensity distribution.

References: src/nyx/features/extrema.cpp:?-60, roi_radius.cpp:14-35,
radial_distribution.cpp:43-240, pixel.cpp:146-168.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .common import safe_div, take_per_row


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


def _pixel_contour_sqdist(ctx):
    """Per-pixel min and max SQUARED distance to the contour, [B, H, W].

    Pixel coords are AABB-local; contour coords carry the reference's +1
    shift -- faithful to apply_dist2contour_weighting / min_sqdist usage
    where both live in the same (global) frame: pixel global = local + base,
    contour global = local + base + 1, so the relative offset is contour_local
    + 1 - pixel_local.  We therefore use the shifted contour as-is against
    local+0 pixels, matching the reference's absolute-frame arithmetic.
    """
    dt = ctx.intens.dtype
    B = ctx.B
    H, W = ctx.shape

    def build():
        from .common import pix_contour_sqdist
        return pix_contour_sqdist(B, H, W, ctx.contour_xy,
                                  ctx.contour_valid, dt, want_max=True)

    return ctx.cached("pix_contour_sqdist", build)


def roi_radius(ctx, cfg):
    """ROI_RADIUS_{MEAN,MAX,MEDIAN} (roi_radius.cpp:14-35): statistics of the
    per-pixel min SQUARED distance to the contour; the median is taken over
    uint-truncated values (TrivialHistogram of HistoItem)."""
    dt = ctx.intens.dtype
    mind, _ = _pixel_contour_sqdist(ctx)
    m = ctx.mask
    n = ctx.area.astype(dt)
    vals = jnp.where(m, mind, 0)
    mean_r = jnp.sum(vals, axis=(1, 2)) / n
    max_r = jnp.max(jnp.where(m, mind, -jnp.inf), axis=(1, 2))

    B, H, W = m.shape
    trunc = jnp.where(m, jnp.floor(mind), jnp.inf).reshape(B, -1)
    s = jnp.sort(trunc, axis=1)
    half = ctx.area // 2
    hi = take_per_row(s, jnp.clip(half, 0, H * W - 1).astype(jnp.int32))
    lo = take_per_row(s, jnp.clip(half - 1, 0, H * W - 1).astype(jnp.int32))
    median_r = jnp.where(ctx.area % 2 != 0, hi, (lo + hi) / 2.0)

    return {"ROI_RADIUS_MEAN": mean_r, "ROI_RADIUS_MAX": max_r,
            "ROI_RADIUS_MEDIAN": median_r}


NUM_RADIAL_BINS = 8
EPS = 1e-9


def radial_distribution(ctx, cfg):
    """FRAC_AT_D / MEAN_FRAC / RADIAL_CV (radial_distribution.cpp:43-240)."""
    dt = ctx.intens.dtype
    m = ctx.mask
    B, H, W = m.shape
    n = NUM_RADIAL_BINS
    mind, maxd = _pixel_contour_sqdist(ctx)

    # center pixel: ROI pixel minimizing (max_sqdist - min_sqdist)
    dif = jnp.where(m, maxd - mind, jnp.inf).reshape(B, -1)
    cidx = jnp.argmin(dif, axis=1)
    cy = (cidx // W).astype(dt)
    cx = (cidx % W).astype(dt)
    dstOC = jnp.sqrt(take_per_row(maxd.reshape(B, -1), cidx.astype(jnp.int32)))

    xs = jnp.arange(W, dtype=dt)[None, None, :] * jnp.ones((1, H, 1), dt)
    ys = jnp.arange(H, dtype=dt)[None, :, None] * jnp.ones((1, 1, W), dt)
    dx = xs - cx[:, None, None]
    dy = ys - cy[:, None, None]
    dstOA = jnp.sqrt(dx * dx + dy * dy)
    rat = safe_div(dstOA, dstOC[:, None, None])
    bi = jnp.clip((rat * (n - 1)).astype(jnp.int32), 0, n - 1)

    ang = jnp.arctan2(dy, dx)
    ang = jnp.where(ang < 0, 2 * math.pi + ang, ang)
    wbin = jnp.clip((ang / (2 * math.pi / n)).astype(jnp.int32), 0, n)
    wbin = jnp.minimum(wbin, n - 1)

    wm = m.reshape(B, -1).astype(dt)
    bif = bi.reshape(B, -1)
    wbf = wbin.reshape(B, -1)
    inten = ctx.masked_intens.reshape(B, -1)

    oh_b = (bif[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(dt)
    oh_w = (wbf[..., None] == jnp.arange(n, dtype=jnp.int32)).astype(dt)
    counts = jnp.einsum("bp,bpi->bi", wm, oh_b, preferred_element_type=dt)
    inten_b = jnp.einsum("bp,bpi->bi", inten * wm, oh_b, preferred_element_type=dt)
    wedges = jnp.einsum("bp,bpi,bpj->bij", inten * wm, oh_b, oh_w,
                        preferred_element_type=dt)

    npix = ctx.area.astype(dt)
    frac = counts / (npix[:, None] + EPS)
    meanfrac = inten_b / (counts + EPS)
    wmean = jnp.sum(wedges, axis=2) / n
    wvar = jnp.sum((wedges - wmean[..., None]) ** 2, axis=2) / n
    radialcv = jnp.sqrt(wvar) / (wmean + EPS)

    return {"FRAC_AT_D": frac, "MEAN_FRAC": meanfrac, "RADIAL_CV": radialcv}
