"""Texture grey-level binning.

Three modes, selected by the SIGN of the grey-depth setting
(reference: src/nyx/features/texture_feature.h:78-198):

* ``greyinfo > 0``  MATLAB binning (1-based): slope = n/max, intercept = 1,
  y = clamp(floor(slope*x + 1), 1, n), with x == 0 -> 1
* ``greyinfo < 0``  radiomics binning (1-based): binW = (max-min)/|n|,
  y = min(floor((x-min)/binW) + 1, n), with x == 0 -> 0
* ``greyinfo == 0`` IBSI: no binning, raw intensities
"""

from __future__ import annotations

import jax.numpy as jnp


def bin_matlab(x, vmax, n_levels: int):
    """MATLAB-style binning. x: float array; vmax: per-ROI max (broadcastable).
    Returns int32 levels in 1..n_levels (x == 0 -> 1).

    The product is passed through an optimization barrier so XLA cannot fuse
    ``slope * x + 1`` into an FMA: the reference binary (built without
    -march=native) rounds the product before the add, and for integer
    intensities the product lands exactly on bin boundaries often enough
    that single-rounded FMA flips bins (seen vs both the reference CSV and
    the numpy-streamed oversized path)."""
    import jax
    slope = n_levels / jnp.maximum(vmax, 1e-30)
    prod = jax.lax.optimization_barrier(slope * x)
    y = jnp.floor(prod + 1.0).astype(jnp.int32)
    y = jnp.clip(y, 1, n_levels)
    return jnp.where(x == 0, 1, y)


def bin_radiomics(x, vmin, vmax, n_levels: int):
    """Radiomics-style binning. Returns int32 levels in 1..n (x == 0 -> 0);
    the last bin is one unit wider."""
    binw = (vmax - vmin) / n_levels
    y = (jnp.floor((x - vmin) / jnp.maximum(binw, 1e-30)) + 1).astype(jnp.int32)
    y = jnp.minimum(y, n_levels)
    return jnp.where(x == 0, 0, y)


def bin_levels(x, vmin, vmax, greyinfo: int):
    """Dispatch on the sign of greyinfo like TextureFeature::bin_pixel."""
    if greyinfo > 0:
        return bin_matlab(x, vmax, greyinfo)
    if greyinfo < 0:
        return bin_radiomics(x, vmin, vmax, -greyinfo)
    return x.astype(jnp.int32)  # IBSI: raw


def binned_range_degenerate(vmin, vmax, greyinfo: int):
    """True where bin(min) == bin(max): the whole family emits soft-NAN
    (reference: glcm.cpp:27-97)."""
    lo = bin_levels(vmin, vmin, vmax, greyinfo)
    hi = bin_levels(vmax, vmin, vmax, greyinfo)
    return lo == hi
