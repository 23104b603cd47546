"""Basic morphology + ellipse-fitting features, batched.

Reference: src/nyx/features/basic_morphology.cpp:16-70,
ellipse_fitting.cpp:20-65.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .common import safe_div


def coordinate_grids(ctx):
    """Global-coordinate grids [B, H, W] for the batch (x = x0 + col, ...)."""
    H, W = ctx.shape
    dt = ctx.intens.dtype
    xs = jnp.arange(W, dtype=dt)[None, None, :] + ctx.x0[:, None, None].astype(dt)
    ys = jnp.arange(H, dtype=dt)[None, :, None] + ctx.y0[:, None, None].astype(dt)
    return xs, ys


def basic_morphology(ctx, cfg):
    dt = ctx.intens.dtype
    m = ctx.mask
    w = m.astype(dt)
    n = ctx.area.astype(dt)
    xs, ys = coordinate_grids(ctx)

    sum_x = jnp.sum(w * xs, axis=(1, 2))
    sum_y = jnp.sum(w * ys, axis=(1, 2))
    cx = sum_x / n
    cy = sum_y / n

    # COMPACTNESS = Moments2(dist to centroid).std / n: the Moments2 object
    # counts the FED pixels (k = raw_pixels.size(), moments.h:14-39) while
    # the final division uses aux_area n (basic_morphology.cpp:50-58);
    # k != n only under anisotropy (virtual resampling)
    k = jnp.sum(w, axis=(1, 2))
    dx = jnp.where(m, xs - cx[:, None, None], 0)
    dy = jnp.where(m, ys - cy[:, None, None], 0)
    dist = jnp.sqrt(dx * dx + dy * dy)
    dmean = jnp.sum(jnp.where(m, dist, 0), axis=(1, 2)) / jnp.maximum(k, 1)
    m2 = jnp.sum(jnp.where(m, (dist - dmean[:, None, None]) ** 2, 0), axis=(1, 2))
    dstd = jnp.where(k > 2, jnp.sqrt(m2 / jnp.maximum(k - 1, 1)), 0.0)
    compactness = dstd / n

    inten = ctx.masked_intens
    mass = jnp.sum(inten, axis=(1, 2))
    wcx = safe_div(jnp.sum(inten * xs, axis=(1, 2)), mass)
    wcy = safe_div(jnp.sum(inten * ys, axis=(1, 2)), mass)
    mass_disp = jnp.sqrt((wcx - cx) ** 2 + (wcy - cy) ** 2)
    mass_disp = jnp.where(mass > 0, mass_disp,
                          jnp.sqrt(cx * cx + cy * cy))  # wc=(0,0) if mass==0

    hw = ctx.heights.astype(dt)
    ww = ctx.widths.astype(dt)

    out = {
        "AREA_PIXELS_COUNT": n,
        "DIAMETER_EQUAL_AREA": 2.0 * jnp.sqrt(n / math.pi),
        "BBOX_XMIN": ctx.x0.astype(dt),
        "BBOX_YMIN": ctx.y0.astype(dt),
        "BBOX_WIDTH": ww,
        "BBOX_HEIGHT": hw,
        "CENTROID_X": cx,
        "CENTROID_Y": cy,
        "COMPACTNESS": compactness,
        "WEIGHTED_CENTROID_X": jnp.where(mass > 0, wcx, 0.0),
        "WEIGHTED_CENTROID_Y": jnp.where(mass > 0, wcy, 0.0),
        "MASS_DISPLACEMENT": mass_disp,
        "EXTENT": n / (hw * ww),
        "ASPECT_RATIO": ww / hw,
    }
    # AREA_UM2: basic_morphology.cpp:23-28 gates on the Fsettings XYRES slot,
    # but Environment::refresh_feature_settings (env_features.cpp:711-737)
    # never populates that slot -- only PIXELSIZEUM -- so the reference
    # binary emits the fvals default 0 for every ROI regardless of
    # --pixelsPerCentimeter / pixels_per_micron (pinned by
    # tests/data/ref_aniso_320x320_seed11.csv.gz, generated with
    # --pixelsPerCentimeter=5000).  Mirror that: always unassigned.
    out["AREA_UM2"] = jnp.full_like(n, -0.0)
    return out


def ellipse_fitting(ctx, cfg):
    """EllipseFittingFeature (ellipse_fitting.cpp:20-65)."""
    dt = ctx.intens.dtype
    m = ctx.mask
    n = ctx.area.astype(dt)
    xs, ys = coordinate_grids(ctx)
    cx = jnp.sum(jnp.where(m, xs, 0), axis=(1, 2)) / n
    cy = jnp.sum(jnp.where(m, ys, 0), axis=(1, 2)) / n

    dx = jnp.where(m, cx[:, None, None] - xs, 0)
    dy = jnp.where(m, cy[:, None, None] - ys, 0)
    # second moments normalize by the FED pixel count k = raw_pixels.size()
    # (ellipse_fitting.cpp:47-50), around the aux_area-based centroid
    k = jnp.maximum(jnp.sum(m.astype(dt), axis=(1, 2)), 1)
    uxx = jnp.sum(dx * dx, axis=(1, 2)) / k + 1.0 / 12.0
    uyy = jnp.sum(dy * dy, axis=(1, 2)) / k + 1.0 / 12.0
    uxy = jnp.sum(dx * dy, axis=(1, 2)) / k

    common = jnp.sqrt((uxx - uyy) ** 2 + 4.0 * uxy * uxy)
    major = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(uxx + uyy + common)
    minor = 2.0 * jnp.sqrt(2.0) * jnp.sqrt(jnp.maximum(uxx + uyy - common, 0))
    ecc = jnp.sqrt(1.0 - (minor * minor) / (major * major))
    elong = minor / major
    roundness = (4.0 * n) / (math.pi * major * major)

    num = jnp.where(uyy > uxx,
                    uyy - uxx + jnp.sqrt((uyy - uxx) ** 2 + 4 * uxy * uxy),
                    2 * uxy)
    den = jnp.where(uyy > uxx, 2 * uxy,
                    uxx - uyy + jnp.sqrt((uxx - uyy) ** 2 + 4 * uxy * uxy))
    orient = jnp.where(
        uxy == 0.0,
        jnp.where(uxx >= uyy, 0.0, 90.0),
        180.0 / math.pi * jnp.arctan(safe_div(num, den)))

    return {
        "MAJOR_AXIS_LENGTH": major,
        "MINOR_AXIS_LENGTH": minor,
        "ECCENTRICITY": ecc,
        "ELONGATION": elong,
        "ORIENTATION": orient,
        "ROUNDNESS": roundness,
    }
