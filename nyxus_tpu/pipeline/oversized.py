"""Oversized-ROI streaming path (the reference's "nontrivial" phase 3).

ROIs whose padded AABB crop exceeds the RAM/HBM budget never materialize as a
dense matrix.  Instead one tile-streamed pass over the ROI's AABB accumulates
sufficient statistics (reference analog: per-feature ``osized_calculate``
over an ``OutOfRamPixelCloud``, phase3.cpp:24-127, image_matrix_nontriv.h):

* an exact sparse value histogram (unique intensity -> count) -- every
  first-order intensity and IBSI-IH feature is a functional of it, so those
  families reuse the SAME jitted kernels via their weighted-sample form
* raw geometric moment sums ``S[p][q] = sum w x^p y^q`` (AABB-local, orders
  0..3) for shape and intensity weightings -- computed per tile as two tiny
  matmuls ``Y (4xH) @ M (HxW) @ X^T (Wx4)`` so the hot contraction rides the
  MXU/BLAS; raw/central/normalized/Hu moments, basic morphology, and ellipse
  fit all derive from them
* an optional second pass for centroid-dependent non-polynomial sums
  (distance-to-centroid mean/std for COMPACTNESS)

Texture/contour families genuinely need the dense neighborhood structure and
stay unassigned (-0.0) for oversized ROIs in this build.
"""

from __future__ import annotations

import math

import numpy as np

# cap on tracked unique intensity values; beyond it (float slides) the
# histogram degrades to 2^16 equal bins over [vmin, vmax]
_MAX_UNIQUES = 1 << 20
_FALLBACK_BINS = 1 << 16


def is_oversized(rec, budget_bytes: int, bytes_per_px: int = 16) -> bool:
    """True when the ROI's padded crop cannot fit the batch budget
    (reference RAM gate: workflow_2d_segmented.cpp:124-139)."""
    from . import batching
    if rec.height > batching._LADDER[-1] or rec.width > batching._LADDER[-1]:
        return True
    hb, wb = batching.bucket_shape(rec.height, rec.width)
    return hb * wb * bytes_per_px > budget_bytes


class OversizedAccums:
    __slots__ = ("vals", "cnts", "exact", "S_shape", "S_int", "area",
                 "vmin", "vmax")

    def __init__(self):
        self.vals = np.zeros(0, np.float64)   # unique intensities (sorted)
        self.cnts = np.zeros(0, np.float64)
        self.exact = True
        self.S_shape = np.zeros((4, 4), np.float64)  # sum x^p y^q over mask
        self.S_int = np.zeros((4, 4), np.float64)    # sum I x^p y^q
        self.area = 0
        self.vmin = np.inf
        self.vmax = -np.inf


def _merge_hist(acc: OversizedAccums, bu: np.ndarray, bc: np.ndarray):
    allv = np.concatenate([acc.vals, bu])
    allc = np.concatenate([acc.cnts, bc])
    vals, inv = np.unique(allv, return_inverse=True)
    cnts = np.zeros(vals.size, np.float64)
    np.add.at(cnts, inv, allc)
    acc.vals, acc.cnts = vals, cnts


def _to_binned(acc: OversizedAccums, vmin: float, vmax: float):
    """Degrade the exact histogram to fixed equal-width bins (bin centers
    stand in for values)."""
    rng = max(vmax - vmin, 1e-300)
    idx = np.clip(((acc.vals - vmin) * (_FALLBACK_BINS / rng)).astype(np.int64),
                  0, _FALLBACK_BINS - 1)
    cnts = np.zeros(_FALLBACK_BINS, np.float64)
    np.add.at(cnts, idx, acc.cnts)
    centers = vmin + (np.arange(_FALLBACK_BINS) + 0.5) * (rng / _FALLBACK_BINS)
    keep = cnts > 0
    acc.vals, acc.cnts, acc.exact = centers[keep], cnts[keep], False


def accumulate(rec, source, block: int = 2048) -> OversizedAccums:
    """One streamed pass over the ROI's AABB."""
    acc = OversizedAccums()
    p4 = np.arange(4, dtype=np.float64)
    for by in range(rec.y0, rec.y1 + 1, block):
        bh = min(block, rec.y1 + 1 - by)
        for bx in range(rec.x0, rec.x1 + 1, block):
            bw = min(block, rec.x1 + 1 - bx)
            ii, ll = source.read_pair(by, bx, bh, bw)
            m = ll == rec.label
            if not m.any():
                continue
            vals = ii[m]
            acc.area += vals.size
            acc.vmin = min(acc.vmin, vals.min())
            acc.vmax = max(acc.vmax, vals.max())
            bu, bc = np.unique(vals, return_counts=True)
            _merge_hist(acc, bu, bc.astype(np.float64))
            if acc.exact and acc.vals.size > _MAX_UNIQUES:
                _to_binned(acc, rec.vmin, rec.vmax)
            # moment sums: Y^T M X with Vandermonde factors in local coords
            ylocal = (by - rec.y0) + np.arange(bh, dtype=np.float64)
            xlocal = (bx - rec.x0) + np.arange(bw, dtype=np.float64)
            Y = ylocal[None, :] ** p4[:, None]           # [4, bh]
            X = xlocal[None, :] ** p4[:, None]           # [4, bw]
            Ms = m.astype(np.float64)
            Mi = np.where(m, ii, 0.0)
            # S[p, q] += sum_y sum_x w[y,x] x^p y^q
            acc.S_shape += (Y @ Ms @ X.T).T
            acc.S_int += (Y @ Mi @ X.T).T
    return acc


def compactness_pass(rec, source, cx: float, cy: float,
                     block: int = 2048):
    """Second pass: mean/std of pixel distance to the GLOBAL centroid
    (basic_morphology.cpp Moments2 over dist)."""
    s1 = s2 = 0.0
    n = 0
    for by in range(rec.y0, rec.y1 + 1, block):
        bh = min(block, rec.y1 + 1 - by)
        for bx in range(rec.x0, rec.x1 + 1, block):
            bw = min(block, rec.x1 + 1 - bx)
            _, ll = source.read_pair(by, bx, bh, bw)
            m = ll == rec.label
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            d = np.hypot(xs + bx - cx, ys + by - cy)
            s1 += d.sum()
            s2 += (d * d).sum()
            n += d.size
    if n == 0:
        return 0.0
    mean = s1 / n
    m2 = s2 - n * mean * mean
    std = math.sqrt(m2 / (n - 1)) if n > 2 else 0.0
    return std / n


# ---------------------------------------------------------------------------
# feature synthesis from the accumulators

def _pad_pow2(n: int) -> int:
    p = 8
    while p < n:
        p <<= 1
    return p


def intensity_members(acc: OversizedAccums, slide_min, slide_max, cfg):
    """PixelIntensityFeatures via the weighted form of the SAME kernel."""
    import jax.numpy as jnp
    from ..ops.intensity import pixel_intensity_features

    U = _pad_pow2(acc.vals.size)
    vals = np.full((1, U), np.inf)
    wts = np.zeros((1, U))
    vals[0, :acc.vals.size] = acc.vals
    wts[0, :acc.vals.size] = acc.cnts
    out = pixel_intensity_features(
        jnp.asarray(vals), jnp.asarray([acc.area], jnp.int64),
        jnp.asarray([acc.vmin]), jnp.asarray([acc.vmax]),
        jnp.asarray([float(slide_max - slide_min)]),
        int(cfg.coarse_gray_depth), cfg.noval, weights=jnp.asarray(wts))
    return {k: np.asarray(v)[0] for k, v in out.items()}


def ih_members(acc: OversizedAccums, cfg, slide_min=0.0):
    import jax.numpy as jnp
    from ..ops.ih import MEMBERS, ih_features_from_freq

    if not cfg.ibsi:  # IBSI gate mirrors the trivial path (registry._ih_family)
        return {m: cfg.noval for m in MEMBERS}
    # HU mode undoes the load-time slope-1 offset (intensity_histogram.cpp:341)
    pscale = 1.0
    poffset = math.floor(slide_min) if cfg.preserve_hu else 0.0
    N = int(cfg.coarse_gray_depth)
    rng = acc.vmax - acc.vmin if acc.vmax > acc.vmin else 1.0
    idx = np.clip(np.floor((acc.vals - acc.vmin) * (N / rng)),
                  0, N - 1).astype(np.int64)
    freq = np.zeros((1, N))
    np.add.at(freq[0], idx, acc.cnts)
    out = ih_features_from_freq(
        jnp.asarray(freq), jnp.asarray([acc.area], jnp.int64),
        jnp.asarray([acc.vmin]), jnp.asarray([acc.vmax]), N, cfg.noval,
        jnp.asarray([pscale]), jnp.asarray([poffset]))
    return {k: float(np.asarray(v)[0]) for k, v in out.items()}


def _central_from_raw(S: np.ndarray):
    """C[p][q] from raw local sums via the binomial shift identity."""
    m00 = S[0, 0]
    if m00 <= 0:
        return np.zeros((4, 4)), 0.0, 0.0
    ox, oy = S[1, 0] / m00, S[0, 1] / m00
    C = np.zeros((4, 4))
    for p in range(4):
        for q in range(4):
            v = 0.0
            for i in range(p + 1):
                for j in range(q + 1):
                    v += (math.comb(p, i) * math.comb(q, j) *
                          (-ox) ** (p - i) * (-oy) ** (q - j) * S[i, j])
            C[p, q] = v
    return C, ox, oy


def moments_members(acc: OversizedAccums):
    """IMOM_*/SMOM_* (raw/central/normalized/Hu) from streamed sums; the
    distance-to-contour weighted members stay unassigned."""
    from ..ops import moments as mm

    out = {}
    for prefix, S in (("IMOM", acc.S_int), ("SMOM", acc.S_shape)):
        m00 = S[0, 0]
        C, _, _ = _central_from_raw(S)
        for p, q in mm.RAW_PQ:
            out["%s_RM_%d%d" % (prefix, p, q)] = S[p, q]
        for p, q in mm.CENTRAL_PQ:
            out["%s_CM_%d%d" % (prefix, p, q)] = C[p, q]
        denom = m00 if m00 > 0 else 1.0
        for p, q in mm.NORM_RAW_PQ:
            k = (p + q) / 2.0 + 1.0
            out["%s_NRM_%d%d" % (prefix, p, q)] = (
                S[p, q] / denom ** k if m00 > 0 else 0.0)
        nu = {}
        for p, q in mm.NORM_CENTRAL_PQ:
            k = (p + q) / 2.0 + 1.0
            nu[(p, q)] = C[p, q] / denom ** k if m00 > 0 else 0.0
            out["%s_NCM_%d%d" % (prefix, p, q)] = nu[(p, q)]
        hu = mm._hu({k: np.asarray([v]) for k, v in nu.items()})
        for i in range(7):
            out["%s_HU%d" % (prefix, i + 1)] = float(np.asarray(hu[i])[0])
    return out


def basic_morphology_members(rec, acc: OversizedAccums, compactness: float):
    S, Si = acc.S_shape, acc.S_int
    n = float(acc.area)
    cx = S[1, 0] / n + rec.x0
    cy = S[0, 1] / n + rec.y0
    mass = Si[0, 0]
    if mass > 0:
        wcx = Si[1, 0] / mass + rec.x0
        wcy = Si[0, 1] / mass + rec.y0
        mass_disp = math.hypot(wcx - cx, wcy - cy)
    else:
        wcx = wcy = 0.0
        mass_disp = math.hypot(cx, cy)
    h, w = float(rec.height), float(rec.width)
    return {
        "AREA_PIXELS_COUNT": n,
        "AREA_UM2": -0.0,
        "DIAMETER_EQUAL_AREA": 2.0 * math.sqrt(n / math.pi),
        "BBOX_XMIN": float(rec.x0),
        "BBOX_YMIN": float(rec.y0),
        "BBOX_WIDTH": w,
        "BBOX_HEIGHT": h,
        "CENTROID_X": cx,
        "CENTROID_Y": cy,
        "COMPACTNESS": compactness,
        "WEIGHTED_CENTROID_X": wcx,
        "WEIGHTED_CENTROID_Y": wcy,
        "MASS_DISPLACEMENT": mass_disp,
        "EXTENT": n / (h * w),
        "ASPECT_RATIO": w / h,
    }


def ellipse_members(acc: OversizedAccums):
    """EllipseFittingFeature from second central moments
    (ellipse_fitting.cpp:20-65)."""
    n = float(acc.area)
    C, _, _ = _central_from_raw(acc.S_shape)
    uxx = C[2, 0] / n + 1.0 / 12.0
    uyy = C[0, 2] / n + 1.0 / 12.0
    uxy = C[1, 1] / n
    common = math.sqrt((uxx - uyy) ** 2 + 4.0 * uxy * uxy)
    major = 2.0 * math.sqrt(2.0) * math.sqrt(uxx + uyy + common)
    minor = 2.0 * math.sqrt(2.0) * math.sqrt(max(uxx + uyy - common, 0.0))
    ecc = math.sqrt(max(1.0 - (minor * minor) / (major * major), 0.0))
    if uxy == 0.0:
        orient = 0.0 if uxx >= uyy else 90.0
    elif uyy > uxx:
        num = uyy - uxx + math.sqrt((uyy - uxx) ** 2 + 4 * uxy * uxy)
        orient = 180.0 / math.pi * math.atan(num / (2 * uxy))
    else:
        den = uxx - uyy + math.sqrt((uxx - uyy) ** 2 + 4 * uxy * uxy)
        orient = 180.0 / math.pi * math.atan(2 * uxy / den)
    return {
        "MAJOR_AXIS_LENGTH": major,
        "MINOR_AXIS_LENGTH": minor,
        "ECCENTRICITY": ecc,
        "ELONGATION": minor / major,
        "ORIENTATION": orient,
        "ROUNDNESS": (4.0 * n) / (math.pi * major * major),
    }


# which families this path can serve
STREAMABLE = ("PixelIntensityFeatures", "IntensityHistogramFeatures",
              "BasicMorphologyFeatures", "EllipseFittingFeature",
              "Imoms2D_feature", "Smoms2D_feature")


def process(rec, source, cfg, families, slide_min, slide_max,
            block: int = 2048):
    """Full oversized-ROI pass.  Returns {family: {member: value}} for the
    streamable subset of ``families``."""
    want = [f for f in families if f in STREAMABLE]
    if not want:
        return {}
    acc = accumulate(rec, source, block)
    if acc.area == 0:
        return {}
    out = {}
    for fam in want:
        if fam == "PixelIntensityFeatures":
            out[fam] = intensity_members(acc, slide_min, slide_max, cfg)
        elif fam == "IntensityHistogramFeatures":
            out[fam] = ih_members(acc, cfg, slide_min)
        elif fam == "BasicMorphologyFeatures":
            cx = acc.S_shape[1, 0] / acc.area + rec.x0
            cy = acc.S_shape[0, 1] / acc.area + rec.y0
            comp = compactness_pass(rec, source, cx, cy, block)
            out[fam] = basic_morphology_members(rec, acc, comp)
        elif fam == "EllipseFittingFeature":
            out[fam] = ellipse_members(acc)
        else:  # moments: one dict covers both prefixes, split by family
            mem = moments_members(acc)
            if fam == "Imoms2D_feature":
                out[fam] = {k: v for k, v in mem.items()
                            if k.startswith("IMOM")}
            else:
                # Smoms uses the legacy member names (registry._SMOM_RENAME)
                from .. import registry
                renamed = {}
                for k, v in mem.items():
                    if not k.startswith("SMOM"):
                        continue
                    tag = k[len("SMOM_"):]
                    if tag.startswith("HU"):
                        renamed["HU_M" + tag[2:]] = v
                    else:
                        kind, pq = tag.rsplit("_", 1)
                        renamed["%s_%s" % (registry._SMOM_RENAME[kind], pq)] = v
                out[fam] = renamed
    return out
