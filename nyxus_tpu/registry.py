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
                 heights=None, widths=None, logw=None, hu_offset=None):
        # hu_offset: [B] floor(original slide min) under --preserve-hu --
        # the load-time slope-1 shift IH_* must undo (slideprops.h:48-66,
        # intensity_histogram.cpp:341-372); None/0 otherwise
        self.hu_offset = hu_offset
        # static_meta: hashable (key, value) pairs of per-batch static scalars
        # (e.g. max integer intensity for IBSI level counts)
        self.static_meta = dict(static_meta)
        self.heights = heights        # [B] AABB height per ROI
        self.widths = widths          # [B] AABB width per ROI
        self.logw = logw  # [B, H, W] log(sqrt(approx d2 to contour) + eps)
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
    fn: typing.Callable = None         # device: (ctx, cfg) -> {member: array}
    domain: str = "2d"                 # member-name enum domain: 2d|3d|imq
    host_fn: typing.Callable = None    # host: (hostctx, cfg) -> {member: [N]}
    needs_contour: bool = False        # pipeline must build contours for it
    deps: typing.Tuple[str, ...] = ()  # dependency feature member names
    host_needs_contour: bool = True    # host fn reads hc.contours
    needs_logw: bool = False           # device kernel consumes ctx.logw

    def member_code(self, member: str):
        table = {"2d": tx.F2D, "3d": tx.F3D, "imq": tx.FIMQ}[self.domain]
        return table.get(member)


FAMILIES: dict = {}


def register(name: str, fn=None, extra_codes=(), domain="2d", host_fn=None,
             needs_contour=False, deps=(), host_needs_contour=True,
             needs_logw=False):
    codes = tuple(tx.CLASS_FEATURES.get(name, ())) + tuple(extra_codes)
    FAMILIES[name] = Family(name, codes, fn, domain, host_fn, needs_contour,
                            tuple(deps), host_needs_contour, needs_logw)
    return fn


def activated_families(fset: tx.FeatureSet):
    """Dependency closure of families needed for the enabled feature set
    (the reference's build_user_requested_set, feature_mgr.cpp:?).
    Returns names in registration order."""
    active = {n for n, fam in FAMILIES.items() if fset.any_enabled(fam.codes)}
    changed = True
    while changed:
        changed = False
        for name in list(active):
            for dep_member in FAMILIES[name].deps:
                dep_code = tx.NAME2CODE_2D.get(dep_member)
                for n2, fam2 in FAMILIES.items():
                    if n2 not in active and dep_code in fam2.codes:
                        active.add(n2)
                        changed = True
    return tuple(n for n in FAMILIES if n in active)


def families_for(fset: tx.FeatureSet):
    """Names of activated device families (dependency closure included)."""
    return tuple(n for n in activated_families(fset)
                 if FAMILIES[n].fn is not None)


def host_families_for(fset: tx.FeatureSet):
    return tuple(n for n in activated_families(fset)
                 if FAMILIES[n].host_fn is not None)


def split_host_families(fset: tx.FeatureSet):
    """(pre, post) host families.  ``pre`` families' declared deps avoid
    (transitively) any device-computed member, so they can run on the host
    WHILE the dispatched device batches execute; ``post`` families read
    device results (centroids, areas) and must run after collection.
    Relative order within each tuple preserves the registration order that
    dependency chains rely on (hull <- contour, hexagonality <- neighbors)."""
    act = tuple(activated_families(fset))
    code2fam = {}
    for n in act:
        for c in FAMILIES[n].codes:
            code2fam[c] = n
    memo = {}

    def reads_device(n):
        if n in memo:
            return memo[n]
        memo[n] = False          # cycle guard
        for m in FAMILIES[n].deps:
            code = tx.NAME2CODE_2D.get(m)
            p = code2fam.get(code)
            if p is None:
                continue
            pf = FAMILIES[p]
            if pf.fn is not None and (pf.host_fn is None
                                      or m not in _HOST_PROVIDED.get(p, ())):
                memo[n] = True
                break
            if pf.host_fn is not None and reads_device(p):
                memo[n] = True
                break
        return memo[n]

    host = [n for n in act if FAMILIES[n].host_fn is not None]
    return (tuple(n for n in host if not reads_device(n)),
            tuple(n for n in host if reads_device(n)))


# members produced by the HOST half of mixed device+host families (so a dep
# on these does not force post-collect ordering)
_HOST_PROVIDED = {
    "ContourFeature": ("PERIMETER", "PERIMETER_MM", "EDGE_MEAN_INTENSITY",
                       "EDGE_MAX_INTENSITY", "EDGE_MIN_INTENSITY",
                       "EDGE_STDDEV_INTENSITY", "EDGE_INTEGRATED_INTENSITY"),
    "ConvexHullFeature": ("CONVEX_HULL_AREA", "SOLIDITY"),
}


def contour_needed(fset: tx.FeatureSet):
    return any(FAMILIES[n].needs_contour
               or (FAMILIES[n].host_fn is not None and FAMILIES[n].host_needs_contour)
               for n in activated_families(fset))


# ---------------------------------------------------------------------------
# Family kernels


def _intensity_family(ctx: BatchContext, cfg: EngineConfig):
    # the SIGN of coarse_gray_depth selects the texture binning mode only;
    # histogram bin counts always use the magnitude
    nbins = abs(cfg.coarse_gray_depth)
    return ops_intensity.pixel_intensity_features(
        ctx.sorted_values, ctx.area, ctx.vmin, ctx.vmax,
        ctx.slide_max - ctx.slide_min, nbins, cfg.noval)


register("PixelIntensityFeatures", _intensity_family,
         extra_codes=(tx.F2D["HISTOGRAM"],))


def _ih_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import ih as ops_ih
    dt = ctx.intens.dtype
    if not cfg.ibsi:
        # defensive compute-time gate (intensity_histogram.cpp:305-309);
        # enablement is already IBSI-gated at parse time
        nv = jnp.full((ctx.B,), cfg.noval, dt)
        return {m: nv for m in ops_ih.MEMBERS}
    # float-domain map (intensity_histogram.cpp:341-372): HU mode undoes the
    # load-time slope-1 offset (the ORIGINAL pre-shift slide min, carried in
    # ctx.hu_offset -- the in-memory slide min is 0 after the shift);
    # integer non-HU images are a no-op
    if cfg.preserve_hu and ctx.hu_offset is not None:
        poffset = ctx.hu_offset.astype(dt)
        pscale = jnp.ones((ctx.B,), dt)
    else:
        poffset = pscale = None
    return ops_ih.ih_features(ctx.sorted_values, ctx.area, ctx.vmin, ctx.vmax,
                              abs(cfg.coarse_gray_depth), cfg.noval,
                              pscale, poffset)


register("IntensityHistogramFeatures", _ih_family)


def _glcm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import glcm as ops_glcm
    ng_val = None
    if cfg.ibsi:
        greyinfo = 0
        ng = int(ctx.static_meta.get("max_int", 256))
        symmetric = True
        ng_val = ctx.vmax     # per-ROI Ng (reference sizes by the ROI max)
    else:
        greyinfo = cfg.texture_greydepth("glcm")
        ng = abs(greyinfo)
        symmetric = False
    levels = ctx.texture_levels(greyinfo)
    return ops_glcm.glcm_all(
        ctx.masked_intens, levels, ctx.vmin, ctx.vmax,
        cfg.glcm_angles, cfg.glcm_offset, ng, symmetric, greyinfo, cfg.noval,
        ng_val)


register("GLCMFeature", _glcm_family)


def _glrlm_family(ctx: BatchContext, cfg: EngineConfig):
    from .ops import glrlm as ops_glrlm
    if cfg.ibsi:
        greyinfo = 0
        ng = int(ctx.static_meta.get("max_int", 256))
    else:
        greyinfo = cfg.texture_greydepth("glrlm")
        ng = abs(greyinfo)
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
        ng = abs(greyinfo)
    levels = ctx.texture_levels(greyinfo)
    if greyinfo > 0:
        valid = ctx.aabb_mask
    else:
        # IBSI raw mode and radiomics mode both map background/zero to level 0
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
        n_levels = abs(cfg.coarse_gray_depth)
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


# ---------------------------------------------------------------------------
# Morphology / geometry


def _basic_morphology_family(ctx, cfg):
    from .ops import morphology
    return morphology.basic_morphology(ctx, cfg)


register("BasicMorphologyFeatures", _basic_morphology_family)


def _ellipse_family(ctx, cfg):
    from .ops import morphology
    return morphology.ellipse_fitting(ctx, cfg)


register("EllipseFittingFeature", _ellipse_family)


def _erosion_family(ctx, cfg):
    from .ops import binary
    import jax.numpy as jnp
    return {
        "EROSIONS_2_VANISH": binary.erosions_to_vanish(
            ctx.mask, ctx.heights, ctx.widths, ctx.intens.dtype),
        # the reference DECLARES this member (erosion.cpp:16) but its
        # save_value never writes it (erosion.cpp:196-199), so the binary
        # emits the fvals default 0.0 for every ROI -- pinned by
        # tests/data/ref_all_320x320_seed11.csv.gz.  Emit the same constant.
        "EROSIONS_2_VANISH_COMPLEMENT": jnp.zeros((ctx.B,),
                                                  ctx.intens.dtype),
    }


register("ErosionPixelsFeature", _erosion_family,
         deps=("CONVEX_HULL_AREA",))


def _euler_family(ctx, cfg):
    from .ops import binary
    return {"EULER_NUMBER": binary.euler_number(ctx.mask, ctx.intens.dtype)}


register("EulerNumberFeature", _euler_family)


def _fractal_family(ctx, cfg):
    from .ops import binary
    return {"FRACT_DIM_BOXCOUNT": binary.fract_dim_boxcount(
        ctx.mask, ctx.heights, ctx.widths, ctx.intens.dtype)}


register("FractalDimensionFeature", _fractal_family,
         host_fn=lambda hc, cfg: _fractal_perimeter_host(hc, cfg),
         deps=("PERIMETER",))


def _extrema_family(ctx, cfg):
    from .ops import radial
    return radial.extrema(ctx, cfg)


register("ExtremaFeature", _extrema_family)


def _hf(fn_name):
    def fn(hc, cfg):
        from .pipeline import hostfeats
        return getattr(hostfeats, fn_name)(hc, cfg)
    return fn


# ROI radius and radial distribution consume the reference's APPROXIMATE
# ordered-contour distance search (pixel.cpp:36-143) -- a sequential
# coarse-to-fine sampling that is part of the numeric contract; they run as
# host families over the native approx-distance kernel.
register("RoiRadiusFeature", host_fn=_hf("roi_radius"),
         deps=("PERIMETER",))

register("RadialDistributionFeature", host_fn=_hf("radial_distribution"),
         deps=("PERIMETER",))


# Smoms uses the legacy member names (SPAT_MOMENT_*, HU_M*, ...) while Imoms
# uses the IMOM_* scheme (featureset.h)
_SMOM_RENAME = {
    "RM": "SPAT_MOMENT", "WRM": "WEIGHTED_SPAT_MOMENT",
    "CM": "CENTRAL_MOMENT", "WCM": "WEIGHTED_CENTRAL_MOMENT",
    "NCM": "NORM_CENTRAL_MOMENT", "WNCM": "WT_NORM_CTR_MOM",
    "NRM": "NORM_SPAT_MOMENT",
}


def _moments_family(prefix):
    def fn(ctx, cfg):
        from .ops import moments
        if prefix == "IMOM":
            weights = ctx.masked_intens
        else:
            weights = ctx.mask.astype(ctx.intens.dtype)
        out = moments.moments_all(ctx, weights, prefix, ctx.logw)
        if prefix == "SMOM":
            renamed = {}
            for k, v in out.items():
                tag = k[len("SMOM_"):]
                if tag.startswith("WHU"):
                    renamed["WEIGHTED_HU_M" + tag[3:]] = v
                elif tag.startswith("HU"):
                    renamed["HU_M" + tag[2:]] = v
                else:
                    kind, pq = tag.rsplit("_", 1)
                    renamed["%s_%s" % (_SMOM_RENAME[kind], pq)] = v
            return renamed
        return out
    return fn


register("Imoms2D_feature", _moments_family("IMOM"), needs_contour=True,
         deps=("PERIMETER",), needs_logw=True)
register("Smoms2D_feature", _moments_family("SMOM"), needs_contour=True,
         deps=("PERIMETER",), needs_logw=True)


def _gabor_family(ctx, cfg):
    from .ops import gabor as ops_gabor
    return ops_gabor.gabor_features(ctx.masked_intens, ctx.aabb_mask,
                                    ctx.vmin, ctx.vmax, cfg, ctx.intens.dtype)


register("GaborFeature", _gabor_family)


def _zernike_family(ctx, cfg):
    from .ops import zernike as ops_zernike
    return ops_zernike.zernike_features(
        ctx.masked_intens, ctx.heights, ctx.widths, ctx.vmin, ctx.vmax,
        cfg.noval, ctx.intens.dtype)


register("ZernikeFeature", _zernike_family)


# ---------------------------------------------------------------------------
# Host families (sequential / contour-based; reference runs these on CPU too)


def _contour_host(hc, cfg):
    """ContourFeature (contour.cpp:935-987)."""
    import numpy as np
    g = getattr(hc, "geom", None)
    if g is not None:
        return {"PERIMETER": g[:, 0].copy(),
                "DIAMETER_EQUAL_PERIMETER": g[:, 1].copy(),
                "EDGE_MEAN_INTENSITY": g[:, 2].copy(),
                "EDGE_STDDEV_INTENSITY": g[:, 3].copy(),
                "EDGE_MAX_INTENSITY": g[:, 4].copy(),
                "EDGE_MIN_INTENSITY": g[:, 5].copy(),
                "EDGE_INTEGRATED_INTENSITY": g[:, 6].copy()}
    n = len(hc.recs)
    out = {m: np.full(n, 0.0) for m in
           ("PERIMETER", "DIAMETER_EQUAL_PERIMETER", "EDGE_MEAN_INTENSITY",
            "EDGE_STDDEV_INTENSITY", "EDGE_MAX_INTENSITY",
            "EDGE_MIN_INTENSITY", "EDGE_INTEGRATED_INTENSITY")}
    for i, K in enumerate(hc.contours):
        if K.shape[0] == 0:
            continue
        pts = K[:, :2].astype(np.float64)
        d = pts - np.roll(pts, 1, axis=0)
        out["PERIMETER"][i] = np.sqrt((d * d).sum(1)).sum()
        out["DIAMETER_EQUAL_PERIMETER"][i] = out["PERIMETER"][i] / np.pi
        inten = K[:, 2].astype(np.float64)
        out["EDGE_MEAN_INTENSITY"][i] = inten.mean()
        m2 = ((inten - inten.mean()) ** 2).sum()
        out["EDGE_STDDEV_INTENSITY"][i] = (
            np.sqrt(m2 / (len(inten) - 1)) if len(inten) > 2 else 0.0)
        out["EDGE_MAX_INTENSITY"][i] = inten.max()
        out["EDGE_MIN_INTENSITY"][i] = inten.min()
        out["EDGE_INTEGRATED_INTENSITY"][i] = inten.sum()
    return out


register("ContourFeature", host_fn=_contour_host)


register("ConvexHullFeature", host_fn=_hf("convex_hull_features"),
         deps=("PERIMETER",))
register("CaliperFeretFeature", host_fn=_hf("caliper_feret"),
         deps=("CONVEX_HULL_AREA",))
register("CaliperMartinFeature", host_fn=_hf("caliper_martin"),
         deps=("CONVEX_HULL_AREA",))
register("CaliperNassensteinFeature", host_fn=_hf("caliper_nassenstein"),
         deps=("CONVEX_HULL_AREA",))
register("ChordsFeature", host_fn=_hf("chords"))
register("EnclosingInscribingCircumscribingCircleFeature",
         host_fn=_hf("circle_features"),
         deps=("PERIMETER", "CENTROID_X", "CENTROID_Y"))
register("GeodeticLengthThicknessFeature", host_fn=_hf("geodetic_features"),
         deps=("AREA_PIXELS_COUNT", "PERIMETER"))
register("NeighborsFeature", host_fn=_hf("neighbors_features"),
         deps=("CENTROID_X", "CENTROID_Y"))
register("HexagonalityPolygonalityFeature",
         host_fn=_hf("hexagonality_features"),
         deps=("NUM_NEIGHBORS", "PERIMETER", "CONVEX_HULL_AREA",
               "STAT_FERET_DIAM_MAX", "STAT_FERET_DIAM_MIN"))


# ---------------------------------------------------------------------------
# IMQ (image quality) families -- whole-slide oriented, host-side


def _imq_crop(hc, i):
    import numpy as np
    if not hc.pixels_ok(i):     # oversized: no dense crop; IMQ unassigned
        return np.zeros((1, 1))
    ii, m = hc.pair_crop(i)
    return np.where(m, ii, 0)


def _focus_host(hc, cfg):
    import numpy as np
    from .ops import imq
    n = len(hc.recs)
    fs = np.zeros(n)
    lfs = np.zeros(n)
    for i in range(n):
        fs[i], lfs[i] = imq.focus_score(_imq_crop(hc, i))
    return {"FOCUS_SCORE": fs, "LOCAL_FOCUS_SCORE": lfs}


register("FocusScoreFeature", host_fn=_focus_host, domain="imq",
         host_needs_contour=False)


def _powerspectrum_host(hc, cfg):
    import numpy as np
    from .ops import imq
    return {"POWER_SPECTRUM_SLOPE": np.array(
        [imq.power_spectrum_slope(_imq_crop(hc, i)) for i in range(len(hc.recs))])}


register("PowerSpectrumFeature", host_fn=_powerspectrum_host, domain="imq",
         host_needs_contour=False)


def _saturation_host(hc, cfg):
    import numpy as np
    from .ops import imq
    n = len(hc.recs)
    mn = np.zeros(n)
    mx = np.zeros(n)
    for i in range(n):
        mn[i], mx[i] = imq.saturation(_imq_crop(hc, i))
    return {"MIN_SATURATION": mn, "MAX_SATURATION": mx}


register("SaturationFeature", host_fn=_saturation_host, domain="imq",
         host_needs_contour=False)


def _sharpness_host(hc, cfg):
    import numpy as np
    from .ops import imq
    return {"SHARPNESS": np.array(
        [imq.sharpness(_imq_crop(hc, i)) for i in range(len(hc.recs))])}


register("SharpnessFeature", host_fn=_sharpness_host, domain="imq",
         host_needs_contour=False)


def _fractal_perimeter_host(hc, cfg):
    """FRACT_DIM_PERIMETER (fractal_dim.cpp:96-125)."""
    import numpy as np
    g = getattr(hc, "geom", None)
    if g is not None:
        from .pipeline.hostfeats import _GC_FRACT
        return {"FRACT_DIM_PERIMETER": g[:, _GC_FRACT].copy()}
    n = len(hc.recs)
    vals = np.zeros(n)
    for i, K in enumerate(hc.contours):
        clen = K.shape[0]
        if clen < 3:
            continue
        pts = K[:, :2].astype(np.float64)
        cov = []
        s = clen // 4
        while s > 0:
            # stride-s ruler walk, vectorized: j = 0, s, 2s, ... while
            # j + s < clen, then close back to pts[0]
            j_idx = np.arange(0, clen - s, s) if clen - s > 0 \
                else np.zeros(0, np.int64)
            seg = pts[j_idx + s] - pts[j_idx]
            perim = float(np.sqrt((seg * seg).sum(1)).sum())
            j_last = len(j_idx) * s
            perim += float(np.sqrt(((pts[j_last] - pts[0]) ** 2).sum()))
            nsteps = len(j_idx) + 1
            cov.append((perim / nsteps, perim))
            s //= 2
        vals[i] = 1.0 - _loglog_slope(cov)
    return {"FRACT_DIM_PERIMETER": vals}


def _loglog_slope(cov):
    import numpy as np
    pts = [(np.log(a), np.log(b)) for a, b in cov if a > 0 and b > 0]
    if len(pts) < 2:
        return 0.0
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    n = len(pts)
    denom = (x * x).sum() * n - x.sum() ** 2
    if denom == 0:
        return 0.0
    return ((x * y).sum() * n - x.sum() * y.sum()) / denom
