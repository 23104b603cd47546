"""GLSZM (grey-level size-zone matrix) features, batched.

Reference: src/nyx/features/glszm.cpp:60-770.  Zones found by the reference's
directed zone scan (see ops/zones.py); 16 statistics over the implicit
(level, zone size) matrix, computed from per-zone quantities without
materializing the [Ng, H*W] matrix:

* per-zone sums for SAE/LAE/GLV/ZV/LGLZE/HGLZE/SALGLE/SAHGLE/LALGLE/LAHGLE
* sorted-run counting for the marginal-squared features GLN(N)/SZN(N) and
  the (level, size)-grouped entropy ZE

Faithful notes:
* MATLAB binning: AABB background (level 1) forms zones; Np = AABB area
  (glszm.cpp:166-179 counts VISITED-marked pixels)
* blank ROI (min == max) or empty matrix -> all members soft-NAN
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import fast_log2

from . import zones

EPS = 2.2e-16  # reference: glrlm.h:169 / glszm.h:138 / gldm.h:105

MEMBERS = [
    "GLSZM_SAE", "GLSZM_LAE", "GLSZM_GLN", "GLSZM_GLNN", "GLSZM_SZN",
    "GLSZM_SZNN", "GLSZM_ZP", "GLSZM_GLV", "GLSZM_ZV", "GLSZM_ZE",
    "GLSZM_LGLZE", "GLSZM_HGLZE", "GLSZM_SALGLE", "GLSZM_SAHGLE",
    "GLSZM_LALGLE", "GLSZM_LAHGLE",
]


def glszm_features(levels, valid, np_pixels, vmin, vmax, noval: float, dtype):
    """levels: [B, H, W] int32 binned (1-based; 0 = non-participating);
    valid: participation mask; np_pixels: [B] the Np normalizer.
    Returns dict member -> [B]."""
    B, H, W = levels.shape
    A = H * W
    anc = zones.zone_labels(levels, valid)
    zlev_i, zsize_i, _, ok = zones.zone_list(anc, levels, valid)
    zlev = zlev_i.astype(dtype)
    zsize = zsize_i.astype(dtype)
    w = ok.astype(dtype)
    return glszm_features_from_zones(zlev, zsize, w, np_pixels, vmin, vmax,
                                     noval, dtype, float(A + 1))


def glszm_features_from_zones(zlev, zsize, w, np_pixels, vmin, vmax,
                              noval: float, dtype, size_key: float):
    """The 16 statistics from per-zone (level, size) lists.

    zlev/zsize: [B, Z] zone grey level and pixel count (0 where w == 0);
    w: [B, Z] 1.0 at real zones; size_key: any constant > max zone size
    (ZE grouping key stride).  Shared by the dense kernel above and the
    tile-streamed oversized path (pipeline/oversized_tex.py)."""
    nz = jnp.sum(w, axis=1)                       # sum_p = number of zones
    s = jnp.maximum(nz, 1)

    inv = lambda x: 1.0 / jnp.where(x > 0, x, 1)
    l2 = zlev * zlev
    s2 = zsize * zsize

    # every sum carries the zone weight w (multiplicity): dense callers pass
    # w in {0, 1} (identical results), the streamed path ships aggregated
    # unique (level, size) pairs with w = count
    out = {}
    out["GLSZM_SAE"] = jnp.sum(w * inv(s2), axis=1) / s
    out["GLSZM_LAE"] = jnp.sum(w * s2, axis=1) / s
    out["GLSZM_ZP"] = nz / jnp.maximum(np_pixels.astype(dtype), 1)
    mu_g = jnp.sum(w * zlev, axis=1) / s
    out["GLSZM_GLV"] = jnp.sum(w * (zlev - mu_g[:, None]) ** 2, axis=1) / s
    mu_z = jnp.sum(w * zsize, axis=1) / s
    out["GLSZM_ZV"] = jnp.sum(w * (zsize - mu_z[:, None]) ** 2, axis=1) / s
    out["GLSZM_LGLZE"] = jnp.sum(w * inv(l2), axis=1) / s
    out["GLSZM_HGLZE"] = jnp.sum(w * l2, axis=1) / s
    out["GLSZM_SALGLE"] = jnp.sum(w * inv(l2) * inv(s2), axis=1) / s
    out["GLSZM_SAHGLE"] = jnp.sum(w * l2 * inv(s2), axis=1) / s
    out["GLSZM_LALGLE"] = jnp.sum(w * s2 * inv(l2), axis=1) / s
    out["GLSZM_LAHGLE"] = jnp.sum(w * l2 * s2, axis=1) / s

    inf = jnp.asarray(jnp.inf, dtype)

    # GLN / GLNN: sum_i si^2; weight-aware group sums (see gldzm.py)
    _, wl, sum_l, v_l = zones.grouped_weight_sums(
        jnp.where(w > 0, zlev, inf), w)
    gln = jnp.sum(jnp.where(v_l, wl * sum_l, 0).astype(dtype), axis=1)
    out["GLSZM_GLN"] = gln / s
    out["GLSZM_GLNN"] = gln / (s * s)

    # SZN / SZNN by zone size
    _, ws_, sum_s, v_s = zones.grouped_weight_sums(
        jnp.where(w > 0, zsize, inf), w)
    szn = jnp.sum(jnp.where(v_s, ws_ * sum_s, 0).astype(dtype), axis=1)
    out["GLSZM_SZN"] = szn / s
    out["GLSZM_SZNN"] = szn / (s * s)

    # ZE: cells grouped by (level, size); per zone: w * log2(c/Nz + EPS)/Nz
    key = jnp.where(w > 0, zlev * size_key + zsize, inf)
    _, wc, sum_c, v_c = zones.grouped_weight_sums(key, w)
    ze = -jnp.sum(
        jnp.where(v_c,
                  wc * fast_log2(sum_c.astype(dtype) / s[:, None] + EPS), 0),
        axis=1) / s
    out["GLSZM_ZE"] = ze

    bad = (vmin == vmax) | (nz == 0)
    nv = jnp.asarray(noval, dtype)
    return {k: jnp.where(bad, nv, v) for k, v in out.items()}
