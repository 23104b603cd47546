"""NGTDM (neighbourhood grey tone difference matrix) features, batched.

Reference: src/nyx/features/ngtdm.cpp:40-330.  For every non-zero-level pixel
with at least one non-zero-level 8-neighbor, record (level, mean of non-zero
neighbor levels); accumulate per-level counts N and absolute differences
S = sum |level - neighborhood mean|; 5 scalar statistics follow.

Faithful notes:
* MATLAB binning maps original 0 -> level 1 (texture_feature.h), so AABB
  background participates as level 1 (the reference scans the binned matrix
  and never sees a 0 in MATLAB mode)
* degenerate gate: fewer than 2 distinct non-zero levels -> all soft-NAN
  (ngtdm.cpp:76-84)
* Ngp = number of distinct non-zero levels over the whole (binned) AABB
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import NEIGHBORS8, masked_bincount, shifted2d

MEMBERS = ["NGTDM_COARSENESS", "NGTDM_CONTRAST", "NGTDM_BUSYNESS",
           "NGTDM_COMPLEXITY", "NGTDM_STRENGTH"]


def ngtdm_features(levels, valid, nmax: int, vmin, vmax, noval: float, dtype,
                   ibsi: bool = False):
    """levels: [B, H, W] int32 binned levels; valid: participation mask
    (AABB for MATLAB binning, AABB & level>0 otherwise); nmax: static level
    cap (levels <= nmax).  Returns dict member -> [B]."""
    B = levels.shape[0]
    lev = jnp.where(valid, levels, 0)
    lev_f = lev.astype(dtype)
    nz = lev > 0

    neig_sum = jnp.zeros_like(lev_f)
    neig_cnt = jnp.zeros_like(lev_f)
    for dx, dy in NEIGHBORS8:
        nl = shifted2d(lev_f, dx, dy)
        ok = (shifted2d(nz.astype(jnp.int32), dx, dy) > 0).astype(dtype)
        neig_sum = neig_sum + nl * ok
        neig_cnt = neig_cnt + ok

    is_zone = nz & (neig_cnt > 0)
    ave = jnp.where(is_zone, neig_sum / jnp.maximum(neig_cnt, 1), 0)

    nb = nmax + 1
    flat_lev = lev.reshape(B, -1)
    wzone = is_zone.reshape(B, -1).astype(dtype)
    N = masked_bincount(flat_lev, wzone, nb)                     # [B, nb]
    diff = jnp.abs(lev_f - ave).reshape(B, -1)
    S = masked_bincount(flat_lev, wzone * diff, nb)

    # distinct non-zero levels over the whole valid matrix
    present = masked_bincount(flat_lev, valid.reshape(B, -1).astype(dtype), nb) > 0
    present = present.at[:, 0].set(False)
    return ngtdm_stats(N, S, present, levels, valid, noval, dtype, ibsi)


def ngtdm_stats(N, S, present, levels, valid, noval: float, dtype,
                ibsi: bool = False):
    """The 5 NGTDM statistics from per-level counts N and diff sums S.
    Shared by the 2D and 3D builders."""
    B, nb = N.shape
    ngp = jnp.sum(present, axis=1).astype(dtype)                 # Ngp

    nvc = jnp.sum(N, axis=1)                                     # = Nvp
    P = N / jnp.maximum(nvc[:, None], 1)

    ival = jnp.arange(nb, dtype=dtype)                           # level values

    coarseness = 1.0 / jnp.sum(P * S, axis=1)

    dij2 = (ival[:, None] - ival[None, :]) ** 2
    pp = P[:, :, None] * P[:, None, :]
    ngp_p2 = jnp.where(ngp > 1, ngp * (ngp - 1), jnp.maximum(ngp, 1))
    term1 = jnp.sum(pp * dij2, axis=(1, 2)) / ngp_p2
    term2 = jnp.sum(S, axis=1) / jnp.maximum(nvc, 1)
    contrast = term1 * term2

    both = (P[:, :, None] != 0) & (P[:, None, :] != 0)
    pi_i = P * ival
    busy_den = jnp.sum(jnp.where(both, jnp.abs(pi_i[:, :, None] - pi_i[:, None, :]), 0),
                       axis=(1, 2))
    busy_num = jnp.sum(P * S, axis=1)
    busyness = jnp.where((ngp == 1) | (busy_den == 0), 0.0,
                         busy_num / jnp.where(busy_den == 0, 1, busy_den))

    ps = P * S
    num_c = jnp.abs(ival[:, None] - ival[None, :]) * (
        ps[:, :, None] + ps[:, None, :])
    den_c = P[:, :, None] + P[:, None, :]
    complexity = jnp.sum(jnp.where(both, num_c / jnp.where(both, den_c, 1), 0),
                         axis=(1, 2)) / jnp.maximum(nvc, 1)

    strength_num = jnp.sum(jnp.where(both, (P[:, :, None] + P[:, None, :]) * dij2, 0),
                           axis=(1, 2))
    strength = strength_num / jnp.sum(S, axis=1)

    out = {
        "NGTDM_COARSENESS": coarseness,
        "NGTDM_CONTRAST": contrast,
        "NGTDM_BUSYNESS": busyness,
        "NGTDM_COMPLEXITY": complexity,
        "NGTDM_STRENGTH": strength,
    }
    if ibsi:
        # IBSI: I = 0..max, gate I.size() < 2 means max level < 1
        maxlev = jnp.max(jnp.where(valid, levels, 0).reshape(B, -1), axis=1)
        degenerate = maxlev < 1
    else:
        degenerate = ngp < 2
    nv = jnp.asarray(noval, dtype)
    return {k: jnp.where(degenerate, nv, v) for k, v in out.items()}
