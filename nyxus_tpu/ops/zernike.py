"""Zernike polynomial moments (order 9, 30 outputs), batched.

Reference: src/nyx/features/zernike.cpp mb_zernike2D: intensity-weighted
Zernike moments over the unit disk of radius N = min(W, H) centered at the
intensity centroid (1-based pixel coordinates), radial polynomials via the
Prata recurrence with precomputed H1/H2/H3 coefficients, outputs
|A_{nm}| = sqrt(AR^2 + AI^2) for (n - m) even, n <= 9.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

ORDER = 9
MAX_L = 32


def _h_tables(L=ORDER):
    H1 = np.zeros((L + 1, L + 1))
    H2 = np.zeros((L + 1, L + 1))
    H3 = np.zeros((L + 1, L + 1))
    for n_ in range(L + 1):
        for m_ in range(n_ + 1):
            if n_ != m_:
                H3[n_][m_] = -(4.0 * (m_ + 2.0) * (m_ + 1.0)) / ((n_ + m_ + 2.0) * (n_ - m_))
                H2[n_][m_] = (H3[n_][m_] * (n_ + m_ + 4.0) * (n_ - m_ - 2.0)) / (4.0 * (m_ + 3.0)) + (m_ + 2.0)
                H1[n_][m_] = ((m_ + 4.0) * (m_ + 3.0)) / 2.0 - (m_ + 4.0) * H2[n_][m_] \
                    + (H3[n_][m_] * (n_ + m_ + 6.0) * (n_ - m_ - 4.0)) / 8.0
    return H1, H2, H3


_H1, _H2, _H3 = _h_tables()


def zernike_features(intens_masked, heights, widths, vmin, vmax,
                     noval: float, dtype):
    """ZERNIKE2D: [B, 30]."""
    img = intens_masked.astype(dtype)
    B, H, W = img.shape
    L = ORDER

    rad = jnp.minimum(heights, widths).astype(dtype)    # N = min(w, h)
    xs = jnp.arange(1, W + 1, dtype=dtype)[None, None, :] * jnp.ones((1, H, 1), dtype)
    ys = jnp.arange(1, H + 1, dtype=dtype)[None, :, None] * jnp.ones((1, 1, W), dtype)

    s = jnp.sum(img, axis=(1, 2))
    m10 = jnp.sum(xs * img, axis=(1, 2))
    m01 = jnp.sum(ys * img, axis=(1, 2))
    cx = m10 / jnp.maximum(s, 1e-30)
    cy = m01 / jnp.maximum(s, 1e-30)

    x = (xs - cx[:, None, None]) / rad[:, None, None]
    y = (ys - cy[:, None, None]) / rad[:, None, None]
    r2 = x * x + y * y
    r = jnp.sqrt(r2)
    ok = (r >= jnp.finfo(jnp.float64).eps) & (r <= 1.0)
    f = jnp.where(ok, img / jnp.maximum(s[:, None, None], 1e-30), 0.0)

    rs = jnp.where(ok, r, 1.0)
    inv_r = 1.0 / rs
    cost = [x * inv_r]
    sint = [y * inv_r]
    for m_ in range(1, L + 1):
        cost.append(cost[0] * cost[-1] - sint[0] * sint[-1])
        sint.append(cost[0] * sint[-1] + sint[0] * cost[m_ - 1])

    R = [jnp.ones_like(r)]
    for n_ in range(1, L + 1):
        R.append(rs * R[-1])

    inv_r2 = 1.0 / jnp.where(ok, r2, 1.0)

    out = []
    for n_ in range(L + 1):
        const_t = (n_ + 1) / math.pi
        Rn = R[n_]
        Rnm2 = R[n_ - 2] if n_ >= 2 else None
        Rnmp2 = Rnmp4 = None
        # m descending n, n-2, ...
        rnm_by_m = {}
        for m_ in range(n_, -1, -2):
            if m_ == n_:
                Rnm = Rn
                Rnmp4 = Rn
            elif m_ == n_ - 2:
                Rnm = n_ * Rn - (n_ - 1) * Rnm2
                Rnmp2 = Rnm
            else:
                Rnm = _H1[n_][m_] * Rnmp4 + (_H2[n_][m_] + _H3[n_][m_] * inv_r2) * Rnmp2
                Rnmp4 = Rnmp2
                Rnmp2 = Rnm
            rnm_by_m[m_] = Rnm
        for m_ in range(n_ + 1):
            if (n_ - m_) % 2 != 0:
                continue
            Rnm = rnm_by_m[m_]
            ar = jnp.sum(jnp.where(ok, const_t * f * Rnm * cost[m_], 0), axis=(1, 2))
            ai = -jnp.sum(jnp.where(ok, const_t * f * Rnm * sint[m_], 0), axis=(1, 2))
            out.append(jnp.sqrt(ar * ar + ai * ai))

    vals = jnp.stack(out, axis=1)   # [B, 30]
    blank = (vmax == vmin)[:, None]
    return {"ZERNIKE2D": jnp.where(blank, jnp.asarray(noval, dtype), vals)}
