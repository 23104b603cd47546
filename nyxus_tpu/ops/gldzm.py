"""GLDZM (grey-level distance-zone matrix) features, batched.

Reference: src/nyx/features/gldzm.cpp:55-470.  Zones are found with the same
directed scan as GLSZM; each zone's metric is the minimum over its pixels of
``dist2border`` -- 1 + the number of steps along a row/column to the nearest
zero-level pixel or to the AABB margin (whichever is nearer), where a pixel
sitting on the margin has distance 1 (gldzm.cpp:306-352).

Faithful notes:
* MATLAB binning has no zero levels (background -> level 1), so the distance
  reduces to the distance to the AABB margin
* Ns (normalizer) counts zones with non-zero grey level; ZP = Ns / roi_area;
  GLE == ZDE (gldzm.cpp:418-421)
* blank ROI (min == max) -> all 19 members soft-NAN
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

from . import zones
from .common import shifted2d

EPS = 2.2e-16  # gldzm.h:68

MEMBERS = [
    "GLDZM_SDE", "GLDZM_LDE", "GLDZM_LGLZE", "GLDZM_HGLZE", "GLDZM_SDLGLE",
    "GLDZM_SDHGLE", "GLDZM_LDLGLE", "GLDZM_LDHGLE", "GLDZM_GLNU",
    "GLDZM_GLNUN", "GLDZM_ZDNU", "GLDZM_ZDNUN", "GLDZM_ZP", "GLDZM_GLM",
    "GLDZM_GLV", "GLDZM_ZDM", "GLDZM_ZDV", "GLDZM_ZDE",
]


def border_distance(levels, heights, widths):
    """Per-pixel dist2border (gldzm.cpp:306-352), vectorized.

    levels: [B, H, W] int32 binned levels over the bucket crop (pixels outside
    the per-ROI AABB are ignored via the heights/widths margins).
    Returns [B, H, W] int32 distances (valid inside AABB).
    """
    B, H, W = levels.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    zero = levels == 0

    # nearest zero strictly left/right/up/down along the scan line
    NEG = jnp.int32(-(1 << 30))
    POS = jnp.int32(1 << 30)
    zl = lax.cummax(jnp.where(zero, xs, NEG), axis=2)
    zl = shifted2d(zl, -1, 0, fill=NEG)           # strictly left
    zr = lax.cummin(jnp.where(zero, xs, POS), axis=2, reverse=True)
    zr = shifted2d(zr, 1, 0, fill=POS)            # strictly right
    zt = lax.cummax(jnp.where(zero, ys, NEG), axis=1)
    zt = shifted2d(zt, 0, -1, fill=NEG)
    zb = lax.cummin(jnp.where(zero, ys, POS), axis=1, reverse=True)
    zb = shifted2d(zb, 0, 1, fill=POS)

    w1 = widths[:, None, None] - 1                # AABB right margin
    h1 = heights[:, None, None] - 1
    d_l = jnp.minimum(xs - zl, xs)                # margin column 0
    d_r = jnp.minimum(zr - xs, w1 - xs)
    d_t = jnp.minimum(ys - zt, ys)
    d_b = jnp.minimum(zb - ys, h1 - ys)
    d = jnp.minimum(jnp.minimum(d_l, d_r), jnp.minimum(d_t, d_b)) + 1
    return jnp.maximum(d, 1)


def gldzm_features(levels, valid, heights, widths, roi_area, vmin, vmax,
                   noval: float, dtype):
    """levels/valid as in GLSZM; roi_area: [B] ROI pixel count (Nv).
    Returns dict member -> [B]."""
    B, H, W = levels.shape
    A = H * W
    # GLDZM zones are FULL 4-connected components (E/S/W/N DFS,
    # gldzm.cpp:121-210), unlike GLSZM's forward E/SE/S/SW scan
    anc = zones.zone_labels_cc4(levels, valid)
    dist = border_distance(levels, heights, widths)
    # zone metric: min pixel distance over the zone, carried by the head of
    # each sorted (zone, dist) run -- no segment-min / gather round trip
    zlev_i, _, zd_i, ok = zones.zone_list(anc, levels, valid, dist=dist)
    zlev = zlev_i.astype(dtype)
    zd = zd_i.astype(dtype)
    gnz = zlev > 0          # zones with non-zero grey level count toward Ns
    wz = (ok & gnz).astype(dtype)
    return gldzm_features_from_zones(zlev, zd, wz, roi_area, vmin, vmax,
                                     noval, dtype, float(H + W + 2))


def gldzm_features_from_zones(zlev, zd, wz, roi_area, vmin, vmax,
                              noval: float, dtype, maxd: float):
    """The 18 statistics from per-zone (level, min border distance) lists.

    zlev/zd: [B, Z] zone grey level and distance (0 where wz == 0); wz: [B, Z]
    1.0 at counted zones (non-zero grey); maxd: any constant > max distance
    (ZDE grouping key stride).  Shared by the dense kernel above and the
    tile-streamed oversized path (pipeline/oversized_tex.py)."""
    ns = jnp.sum(wz, axis=1)
    s = jnp.maximum(ns, 1)

    inv = lambda x: 1.0 / jnp.where(x > 0, x, 1)
    g2 = zlev * zlev
    d2 = zd * zd

    out = {}
    out["GLDZM_SDE"] = jnp.sum(wz * inv(d2), axis=1) / s
    out["GLDZM_LDE"] = jnp.sum(wz * d2, axis=1) / s
    out["GLDZM_LGLZE"] = jnp.sum(wz * inv(g2), axis=1) / s
    out["GLDZM_HGLZE"] = jnp.sum(wz * g2, axis=1) / s
    out["GLDZM_SDLGLE"] = jnp.sum(wz * inv(g2) * inv(d2), axis=1) / s
    out["GLDZM_SDHGLE"] = jnp.sum(wz * g2 * inv(d2), axis=1) / s
    out["GLDZM_LDLGLE"] = jnp.sum(wz * d2 * inv(g2), axis=1) / s
    out["GLDZM_LDHGLE"] = jnp.sum(wz * g2 * d2, axis=1) / s

    inf = jnp.asarray(jnp.inf, dtype)
    # GLNU: zones grouped by level (non-zero levels only).  Weight-aware:
    # each row contributes w * (group weight sum), so Sum_g (Sum w)^2 --
    # exact whether zones arrive one-per-row or pre-aggregated
    _, wg, sum_g, v_g = zones.grouped_weight_sums(
        jnp.where(wz > 0, zlev, inf), wz)
    glnu = jnp.sum(jnp.where(v_g, wg * sum_g, 0).astype(dtype), axis=1)
    out["GLDZM_GLNU"] = glnu / s
    out["GLDZM_GLNUN"] = glnu / (s * s)
    # ZDNU: zones grouped by distance (the reference's Md sums include all
    # rows, but zero-grey zones don't exist in MATLAB mode and are skipped
    # from Ns; group over counted zones)
    _, wd, sum_d, v_d = zones.grouped_weight_sums(
        jnp.where(wz > 0, zd, inf), wz)
    zdnu = jnp.sum(jnp.where(v_d, wd * sum_d, 0).astype(dtype), axis=1)
    out["GLDZM_ZDNU"] = zdnu / s
    out["GLDZM_ZDNUN"] = zdnu / (s * s)

    out["GLDZM_ZP"] = ns / jnp.maximum(roi_area.astype(dtype), 1)
    glm = jnp.sum(wz * zlev, axis=1) / s
    out["GLDZM_GLM"] = glm
    zdm = jnp.sum(wz * zd, axis=1) / s
    out["GLDZM_ZDM"] = zdm
    out["GLDZM_GLV"] = jnp.sum(wz * (zlev - glm[:, None]) ** 2, axis=1) / s
    out["GLDZM_ZDV"] = jnp.sum(wz * (zd - zdm[:, None]) ** 2, axis=1) / s

    # ZDE over (level, distance) cells: each row contributes
    # w * log2(p_cell), p_cell = (cell weight sum)/Ns
    key = jnp.where(wz > 0, zlev * maxd + zd, inf)
    _, wc, sum_c, v_c = zones.grouped_weight_sums(key, wz)
    zde = -jnp.sum(
        jnp.where(v_c,
                  wc * jnp.log2(sum_c.astype(dtype) / s[:, None] + EPS), 0),
        axis=1) / s
    out["GLDZM_ZDE"] = zde

    bad = (vmin == vmax) | (ns == 0)
    nv = jnp.asarray(noval, dtype)
    return {k: jnp.where(bad, nv, v) for k, v in out.items()}
