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
                 slide_min, slide_max, cfg: EngineConfig, static_meta=(),
                 heights=None, widths=None):
        # static_meta: hashable (key, value) pairs of per-batch static scalars
        # (e.g. max integer intensity for IBSI level counts)
        self.static_meta = dict(static_meta)
        self.heights = heights        # [B] AABB height per ROI
        self.widths = widths          # [B] AABB width per ROI
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

    @property
    def masked_intens(self):
        """[B, H, W] intensities with off-ROI pixels zeroed (the reference's
        AABB ImageMatrix convention)."""
        return self.cached(
            "masked_intens",
            lambda: jnp.where(self.mask, self.intens, 0))

    @property
    def aabb_mask(self):
        """[B, H, W] True inside each ROI's AABB (excludes bucket padding)."""
        def build():
            H, W = self.shape
            ys = jnp.arange(H, dtype=jnp.int32)
            xs = jnp.arange(W, dtype=jnp.int32)
            return ((ys[None, :, None] < self.heights[:, None, None]) &
                    (xs[None, None, :] < self.widths[:, None, None]))
        return self.cached("aabb_mask", build)

    def texture_levels(self, greyinfo: int):
        """Binned grey levels for a texture family's greyinfo setting."""
        from . import ops
        from .ops import quant
        return self.cached(
            ("levels", greyinfo),
            lambda: quant.bin_levels(
                self.masked_intens, self.vmin[:, None, None],
                self.vmax[:, None, None], greyinfo))


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


def _glcm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import glcm as ops_glcm
    if cfg.ibsi:
        greyinfo = 0
        ng = int(ctx.static_meta.get("max_int", 256))
        symmetric = True
    else:
        greyinfo = cfg.texture_greydepth("glcm")
        if greyinfo < 0:
            raise NotImplementedError("radiomics grey binning lands later")
        ng = greyinfo
        symmetric = False
    levels = ctx.texture_levels(greyinfo)
    return ops_glcm.glcm_all(
        ctx.masked_intens, levels, ctx.vmin, ctx.vmax,
        cfg.glcm_angles, cfg.glcm_offset, ng, symmetric, greyinfo, cfg.noval)


register("GLCMFeature", _glcm_family)


def _glrlm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import glrlm as ops_glrlm
    if cfg.ibsi:
        greyinfo = 0
        ng = int(ctx.static_meta.get("max_int", 256))
    else:
        greyinfo = cfg.texture_greydepth("glrlm")
        if greyinfo < 0:
            raise NotImplementedError("radiomics grey binning lands later")
        ng = greyinfo
    levels = ctx.texture_levels(greyinfo)
    if greyinfo > 0:
        valid = ctx.aabb_mask        # MATLAB binning: background participates
    else:
        valid = ctx.aabb_mask & (levels > 0)
    H, W = ctx.shape
    nr = max(H, W)
    P = ops_glrlm.run_matrices(levels, valid, ng, nr)
    n_pixels = jnp.sum((ctx.masked_intens > 0).reshape(ctx.B, -1), axis=1)
    dtype = ctx.intens.dtype
    return ops_glrlm.glrlm_features(P, n_pixels, ctx.vmin, ctx.vmax,
                                    cfg.noval, dtype)


register("GLRLMFeature", _glrlm_family)


def _texture_setup(ctx, cfg, family: str):
    """(greyinfo, ng, levels, valid) shared by NGTDM/GLDM-style families."""
    if cfg.ibsi:
        greyinfo = 0
        ng = int(ctx.static_meta.get("max_int", 256))
    else:
        greyinfo = cfg.texture_greydepth(family)
        if greyinfo < 0:
            raise NotImplementedError("radiomics grey binning lands later")
        ng = greyinfo
    levels = ctx.texture_levels(greyinfo)
    if greyinfo > 0:
        valid = ctx.aabb_mask
    else:
        valid = ctx.aabb_mask & (levels > 0)
    return greyinfo, ng, levels, valid


def _ngtdm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import ngtdm as ops_ngtdm
    greyinfo, ng, levels, valid = _texture_setup(ctx, cfg, "ngtdm")
    return ops_ngtdm.ngtdm_features(levels, valid, ng, ctx.vmin, ctx.vmax,
                                    cfg.noval, ctx.intens.dtype,
                                    ibsi=greyinfo == 0)


register("NGTDMFeature", _ngtdm_family)


def _gldm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import gldm as ops_gldm
    greyinfo, ng, levels, _ = _texture_setup(ctx, cfg, "gldm")
    P = ops_gldm.gldm_matrix(ctx.masked_intens, levels, ng, ctx.intens.dtype)
    return ops_gldm.gldm_features(P, ctx.vmin, ctx.vmax, cfg.noval)


register("GLDMFeature", _gldm_family)


def _ngldm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import ngldm as ops_ngldm
    if cfg.ibsi:
        n_levels = 0
        nmax = int(ctx.static_meta.get("max_int", 256))
    else:
        n_levels = cfg.coarse_gray_depth
        nmax = n_levels  # to_grayscale yields 0..n
    return ops_ngldm.ngldm_features(
        ctx.intens, ctx.mask, ctx.vmin, ctx.vmax, n_levels, nmax,
        cfg.ibsi, cfg.noval, ctx.intens.dtype)


register("NGLDMfeature", _ngldm_family)


def _glszm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import glszm as ops_glszm
    greyinfo, ng, levels, valid = _texture_setup(ctx, cfg, "glszm")
    if greyinfo > 0:
        # MATLAB mode: Np counts the VISITED-marked matrix = whole AABB
        np_pixels = ctx.heights * ctx.widths
    else:
        np_pixels = jnp.sum((ctx.masked_intens > 0).reshape(ctx.B, -1), axis=1)
    return ops_glszm.glszm_features(
        jnp.where(valid, levels, 0), valid, np_pixels, ctx.vmin, ctx.vmax,
        cfg.noval, ctx.intens.dtype)


register("GLSZMFeature", _glszm_family)


def _gldzm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import gldzm as ops_gldzm
    greyinfo, ng, levels, valid = _texture_setup(ctx, cfg, "gldzm")
    return ops_gldzm.gldzm_features(
        jnp.where(valid, levels, 0), valid, ctx.heights, ctx.widths,
        ctx.area, ctx.vmin, ctx.vmax, cfg.noval, ctx.intens.dtype)


register("GLDZMFeature", _gldzm_family)
