"""Feature-family registry: the declarative equivalent of the reference's
FeatureManager + FeatureMethod (reference: src/nyx/feature_mgr.h:7-54,
feature_method.h:9-75, feature_mgr_init.cpp:46-95).

Each family declares the feature codes it provides and a batched kernel
``fn(ctx, cfg) -> {enum_member_name: [B] or [B, K] array}``.  The runner
selects families whose provided codes intersect the user's FeatureSet
(the reference's per-family ``required(fs)`` gate) and runs them inside one
jitted program per bucket shape.
"""

from __future__ import annotations

import dataclasses
import typing

import jax.numpy as jnp

from . import taxonomy as tx
from .config import EngineConfig
from .ops import intensity as ops_intensity
from .ops import common as ops_common


class BatchContext:
    """Per-bucket shared tensors + lazily traced derived data.

    Derived tensors (sorted pixel values, binned grey matrices, ...) are
    computed at most once per jit trace and shared across families.
    """

    def __init__(self, intens, mask, area, vmin, vmax, y0, x0,
                 slide_min, slide_max, cfg: EngineConfig):
        self.intens = intens          # [B, H, W] compute dtype, raw crop
        self.mask = mask              # [B, H, W] bool
        self.area = area              # [B] int32
        self.vmin = vmin              # [B] per-ROI min intensity
        self.vmax = vmax              # [B] per-ROI max intensity
        self.y0 = y0                  # [B] AABB origin (global coords)
        self.x0 = x0
        self.slide_min = slide_min    # [B]
        self.slide_max = slide_max    # [B]
        self.cfg = cfg
        self._cache: dict = {}

    @property
    def B(self):
        return self.intens.shape[0]

    @property
    def shape(self):
        return self.intens.shape[1:]

    def cached(self, key, builder):
        if key not in self._cache:
            self._cache[key] = builder()
        return self._cache[key]

    @property
    def sorted_values(self):
        """[B, A] per-ROI pixel values ascending, +inf padding."""
        return self.cached(
            "sorted_values",
            lambda: ops_common.sort_masked_values(self.intens, self.mask))


@dataclasses.dataclass
class Family:
    name: str                          # reference calculator class name
    codes: typing.Tuple[int, ...]      # provided global feature codes
    fn: typing.Callable                # (ctx, cfg) -> {member: array}
    domain: str = "2d"                 # member-name enum domain: 2d|3d|imq

    def member_code(self, member: str):
        table = {"2d": tx.F2D, "3d": tx.F3D, "imq": tx.FIMQ}[self.domain]
        return table.get(member)


FAMILIES: dict = {}


def register(name: str, fn, extra_codes=(), domain="2d"):
    codes = tuple(tx.CLASS_FEATURES.get(name, ())) + tuple(extra_codes)
    FAMILIES[name] = Family(name, codes, fn, domain)
    return fn


def families_for(fset: tx.FeatureSet):
    """Names of families providing at least one enabled feature, in
    registration order."""
    return tuple(n for n, fam in FAMILIES.items() if fset.any_enabled(fam.codes))


# ---------------------------------------------------------------------------
# Family kernels


def _intensity_family(ctx: BatchContext, cfg: EngineConfig):
    nbins = cfg.coarse_gray_depth
    return ops_intensity.pixel_intensity_features(
        ctx.sorted_values, ctx.area, ctx.vmin, ctx.vmax,
        ctx.slide_max - ctx.slide_min, nbins, cfg.noval)


register("PixelIntensityFeatures", _intensity_family,
         extra_codes=(tx.F2D["HISTOGRAM"],))
