"""Binary-mask features: erosion count, Euler number, box-count fractal
dimension.  Batched over the ROI bucket.

References:
* ErosionPixelsFeature (erosion.cpp:16-80): iterated 3x3 cross erosion over
  the AABB INTERIOR (cols/rows 2..dim-2; border pixels are frozen at their
  initial value), counting iterations until the interior empties (cap 1000).
  Only EROSIONS_2_VANISH is emitted (save_value, erosion.cpp:214-217).
* EulerNumberFeature (euler_number.cpp:10-100): 2x2 quad pattern counting
  over a 1-padded mask, mode 8: (C1 - C3 - 2*Cd) / 4 with C++ integer
  division.
* FractalDimensionFeature box count (fractal_dim.cpp:16-77): pow2 grids;
  for padded sides > 32, plain origin-0 tile counts; for small ROIs the
  minimum over a 2x2 grid of origin shifts; FD = -slope of log count vs
  log s.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp

EROSION_CAP = 1000  # SANITY_MAX_NUM_EROSIONS (erosion.h:42)


def erosions_to_vanish(mask, heights, widths, dtype):
    """EROSIONS_2_VANISH: [B]."""
    B, H, W = mask.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    # interior update region: 2 <= x <= w-2, 2 <= y <= h-2 (erosion.cpp:38-40)
    interior = ((xs >= 2) & (xs <= widths[:, None, None] - 2) &
                (ys >= 2) & (ys <= heights[:, None, None] - 2))

    img0 = mask.astype(jnp.int32)

    def erode_once(img):
        padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), constant_values=0)
        mn = jnp.minimum(
            jnp.minimum(padded[:, :-2, 1:-1], padded[:, 2:, 1:-1]),
            jnp.minimum(padded[:, 1:-1, :-2], padded[:, 1:-1, 2:]))
        mn = jnp.minimum(mn, img)
        return jnp.where(interior, mn, img)

    def cond(state):
        img, n, done = state
        return jnp.any(~done)

    def body(state):
        img, n, done = state
        new = erode_once(img)
        nonzero = jnp.sum(jnp.where(interior, new, 0), axis=(1, 2))
        now_done = nonzero == 0
        n = jnp.where(done | now_done, n, n + 1)
        done = done | now_done | (n >= EROSION_CAP)
        return jnp.where(done[:, None, None], img, new), n, done

    _, n_final, _ = lax.while_loop(
        cond, body, (img0, jnp.zeros(B, jnp.int32), jnp.zeros(B, bool)))
    return n_final.astype(dtype)


# Euler quad patterns (euler_number.h:42-58): C1 singles, C3 triples, Cd diag
_P1 = (8, 4, 2, 1)
_P3 = (7, 11, 13, 14)
_PD = (9, 6)


def euler_number(mask, dtype):
    """EULER_NUMBER, mode 8: [B]. Mask crop is embedded in a (h+2, w+2)
    zero-padded image; bucket padding already supplies the zeros."""
    B, H, W = mask.shape
    p = jnp.pad(mask, ((0, 0), (1, 1), (1, 1))).astype(jnp.int32)
    # quads over every 2x2 window of the 1-padded image
    q = (p[:, :-1, :-1] * 8 + p[:, :-1, 1:] * 4
         + p[:, 1:, :-1] * 2 + p[:, 1:, 1:])
    c1 = jnp.zeros((B,), jnp.int32)
    c3 = jnp.zeros((B,), jnp.int32)
    cd = jnp.zeros((B,), jnp.int32)
    for v in _P1:
        c1 = c1 + jnp.sum((q == v).astype(jnp.int32), axis=(1, 2))
    for v in _P3:
        c3 = c3 + jnp.sum((q == v).astype(jnp.int32), axis=(1, 2))
    for v in _PD:
        cd = cd + jnp.sum((q == v).astype(jnp.int32), axis=(1, 2))
    # C++ integer division truncates toward zero
    num = c1 - c3 - 2 * cd
    e = jnp.sign(num) * (jnp.abs(num) // 4)
    return e.astype(dtype)


def _box_count_at_scale(mask, s: int, ox: int, oy: int):
    """# of s x s boxes (grid shifted by (ox, oy)) containing mask pixels."""
    B, H, W = mask.shape
    ph = (-(H + oy)) % s
    pw = (-(W + ox)) % s
    p = jnp.pad(mask, ((0, 0), (oy, ph), (ox, pw)))
    Hp, Wp = p.shape[1], p.shape[2]
    t = p.reshape(B, Hp // s, s, Wp // s, s)
    occupied = jnp.any(t, axis=(2, 4))
    return jnp.sum(occupied, axis=(1, 2)).astype(jnp.int32)


def fract_dim_boxcount(mask, heights, widths, dtype):
    """FRACT_DIM_BOXCOUNT: [B]."""
    B, H, W = mask.shape
    SB = 1
    while SB < max(H, W):
        SB *= 2

    # per-ROI padded side (pow2 of max AABB dim)
    big = jnp.maximum(heights, widths)
    padded_side = 2 ** jnp.ceil(jnp.log2(jnp.maximum(big, 1).astype(jnp.float32))).astype(jnp.int32)
    padded_side = jnp.maximum(padded_side, 2)

    scales = []
    s = SB
    while s > 1:
        scales.append(s)
        s //= 2

    sx, sy, sxy, sx2, cnt_used = [jnp.zeros(B, dtype) for _ in range(5)]
    for s in scales:
        plain = _box_count_at_scale(mask, s, 0, 0)
        if s <= 32:
            mins = plain
            for oyi in (0, 1):
                for oxi in (0, 1):
                    if oxi == 0 and oyi == 0:
                        continue
                    mins = jnp.minimum(
                        mins, _box_count_at_scale(mask, s, oxi * s // 2, oyi * s // 2))
        else:
            mins = plain
        count = jnp.where(padded_side > 32, plain, mins).astype(dtype)
        use = (s <= padded_side) & (count > 0)
        lx = jnp.log(jnp.asarray(float(s), dtype))
        ly = jnp.log(jnp.where(count > 0, count, 1))
        w = use.astype(dtype)
        sx = sx + w * lx
        sy = sy + w * ly
        sxy = sxy + w * lx * ly
        sx2 = sx2 + w * lx * lx
        cnt_used = cnt_used + w

    denom = cnt_used * sx2 - sx * sx
    slope = jnp.where(denom != 0, (cnt_used * sxy - sx * sy) / jnp.where(denom != 0, denom, 1), 0.0)
    return -slope
