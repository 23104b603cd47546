"""Anisotropy parity against the reference BINARY (VERDICT r1 next-step #7).

tests/data/ref_aniso_320x320_seed11.csv.gz is the reference CLI's `*ALL*`
output on the parity slide with --anisox=1.4 --anisoy=0.75 (and
--pixelsPerCentimeter=5000, which the reference silently ignores -- see
ops/morphology.py AREA_UM2).  Regenerate with tools/gen_aniso_fixture.py.

Pinned semantics (all verified against the binary):
* the CLI narrows anisotropy factors to C float (cli_anisotropy_options.cpp)
* phase-1 metrics (area, min/max, slide extrema) stay PHYSICAL; the virtual
  slide is the nearest-neighbor resample ph = floor(v / a)
* BBOX_* come from AABB::apply_anisotropy's truncation + fixup arithmetic
* statistics over raw_pixels divide by aux_area (physical) or by the
  virtual sample count exactly as intensity.cpp / moments.h mix them

EXCLUDED families: the reference builds each ROI's image matrix on the
scaled AABB, but its one-step max-edge fixup leaves the last virtual
column/row of member pixels OUTSIDE that box, and
ImageMatrix::calculate_from_pixelcloud (image_matrix.h:298-303) then writes
them OUT OF BOUNDS -- wrapping into the next matrix row (or past the
buffer).  Every matrix-fed family (textures, Gabor, Zernike, Euler,
extrema, erosions, and the contour traced on that matrix) is therefore
corrupted in the reference under anisotropy; this engine computes them from
the clean virtual pixel set instead and intentionally diverges there.
"""

import gzip
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from nyxus_tpu import columns as col  # noqa: E402
from nyxus_tpu import taxonomy as tx  # noqa: E402
from nyxus_tpu.config import EngineConfig  # noqa: E402
from nyxus_tpu.pipeline.runner import PairRunner  # noqa: E402

# full fixture sweeps: heavy; the quick per-commit tier deselects these
import pytest as _pt
pytestmark = _pt.mark.nightly

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                       "ref_aniso_320x320_seed11.csv.gz")

# families corrupted in the reference by the out-of-bounds matrix feed (see
# module docstring); our values are computed from the uncorrupted virtual
# pixel set and legitimately differ
MATRIX_CASCADE_PREFIXES = (
    "GLCM_", "GLRLM_", "GLSZM_", "GLDZM_", "GLDM_", "NGLDM_", "NGTDM_",
    "GABOR", "ZERNIKE2D", "EULER_NUMBER", "EXTREMA_", "EROSIONS_",
)
# ratios of contour-traced quantities: the contour is traced on the
# corrupted matrix for the handful of ROIs with out-of-AABB members, and
# these ratios amplify those few ROIs past the p90 gate
MATRIX_CASCADE_EXACT = {"CIRCULARITY", "SOLIDITY",
                        "DIAMETER_MIN_ENCLOSING_CIRCLE"}
# identically-zero first central moments: FP residue only
ZERO_BY_CONSTRUCTION = {"CENTRAL_MOMENT_01", "CENTRAL_MOMENT_10",
                        "IMOM_CM_01", "IMOM_CM_10"}

TOL = 2e-4          # p90 of per-ROI relative error, at CSV print precision


@pytest.fixture(scope="module")
def frames():
    ref = pd.read_csv(gzip.open(FIXTURE, "rt"))
    ref = ref.sort_values("ROI_label").set_index("ROI_label")
    intens, labels = bench.make_dsb_like(h=320, w=320, n_blobs=40, seed=11)
    cfg = EngineConfig(precision="f64",
                       aniso_x=float(np.float32(1.4)),
                       aniso_y=float(np.float32(0.75)))
    fset = tx.parse_feature_request(["*ALL*"])
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    ours = pd.DataFrame(values, columns=cols[4:])
    ours["ROI_label"] = labs
    return ref, ours.set_index("ROI_label")


def _excluded(c: str) -> bool:
    return (c.startswith(MATRIX_CASCADE_PREFIXES)
            or c in MATRIX_CASCADE_EXACT or c in ZERO_BY_CONSTRUCTION)


def test_aniso_rows(frames):
    ref, ours = frames
    assert list(ref.index) == list(ours.index)


def test_aniso_column_values(frames):
    ref, ours = frames
    common = [c for c in ours.columns if c in ref.columns]
    assert len(common) > 700
    checked = 0
    failures = []
    for c in common:
        if _excluded(c):
            continue
        a = ours[c].to_numpy(float)
        b = ref[c].to_numpy(float)
        both = np.isfinite(a) & np.isfinite(b)
        if both.sum() == 0:
            continue
        denom = np.maximum(np.abs(b[both]), 1e-8)
        rel = np.abs(a[both] - b[both]) / denom
        p90 = float(np.quantile(rel, 0.9))
        checked += 1
        if p90 > TOL:
            failures.append((c, round(p90, 6)))
    assert checked > 350, "exclusion list swallowed the test"
    assert not failures, ("anisotropy columns beyond tolerance vs the "
                          "reference binary: %r" % failures[:25])


def test_aniso_bbox_and_area_semantics(frames):
    """The load-bearing quirks, asserted explicitly."""
    ref, ours = frames
    for c in ("AREA_PIXELS_COUNT", "BBOX_XMIN", "BBOX_YMIN", "BBOX_WIDTH",
              "BBOX_HEIGHT", "CENTROID_X", "CENTROID_Y", "MEAN", "MIN",
              "MAX", "MEDIAN", "SKEWNESS", "COMPACTNESS",
              "MAJOR_AXIS_LENGTH"):
        a = ours[c].to_numpy(float)
        b = ref[c].to_numpy(float)
        denom = np.maximum(np.abs(b), 1e-8)
        assert float(np.quantile(np.abs(a - b) / denom, 0.9)) < TOL, c


def test_aniso_identity_invariance(monkeypatch):
    """aniso == (1, 1) forced through the anisotropy code path must
    reproduce the no-aniso run EXACTLY for every *ALL* column -- including
    the matrix-fed families excluded from the binary-fixture comparison
    above (VERDICT r2 next-step #5: intentionally-divergent families must
    not be test-free)."""
    intens, labels = bench.make_dsb_like(h=256, w=256, n_blobs=25, seed=5)
    fset = tx.parse_feature_request(["*ALL*"])
    base_labs, base_vals = PairRunner(
        fset, EngineConfig(precision="f64")).run(intens, labels)
    monkeypatch.setattr(EngineConfig, "aniso_customized",
                        property(lambda self: True))
    labs2, vals2 = PairRunner(
        fset, EngineConfig(precision="f64")).run(intens, labels)
    np.testing.assert_array_equal(base_labs, labs2)
    np.testing.assert_allclose(vals2, base_vals, rtol=0, atol=0)


def test_aniso_texture_virtual_oracle():
    """GLCM/GLRLM under anisotropy against an independent oracle computed
    on the nearest-neighbor-resampled virtual slide: this engine's
    documented aniso-texture semantics (clean virtual pixel set over the
    widened crop box, PHYSICAL aux vmax for binning) -- the reference's own
    matrix feed goes out of bounds there (image_matrix.h:298-303)."""
    import oracle_glcm
    import oracle_glrlm
    from nyxus_tpu.pipeline import labels as L
    from nyxus_tpu.pipeline import batching

    ax, ay = 1.4, 0.75
    intens, labels = bench.make_dsb_like(h=160, w=160, n_blobs=8, seed=3)
    cfg = EngineConfig(precision="f64", aniso_x=ax, aniso_y=ay)
    fset = tx.parse_feature_request(["*ALL_GLCM*", "*ALL_GLRLM*"])
    labs, vals = PairRunner(fset, cfg).run(intens, labels)
    hdr, _ = col.build_header(fset, EngineConfig())
    ours = pd.DataFrame(vals, columns=hdr[4:])
    ours["ROI_label"] = labs

    H, W = intens.shape
    vH, vW = int(H * ay), int(W * ax)
    pr = np.minimum((np.arange(vH) / ay).astype(np.int64), H - 1)
    pc = np.minimum((np.arange(vW) / ax).astype(np.int64), W - 1)
    V_I = intens[pr][:, pc]
    V_L = labels[pr][:, pc]
    phys, _, _ = L._discover_rois_np(intens, labels)
    virt, _, _ = L._discover_rois_np(V_I, V_L)
    nat = {r.label: (r.y0, r.y1, r.x0, r.x1) for r in virt}

    ng = 64
    checked = 0
    for k, r0 in enumerate(phys):
        rr = L.aniso_bbox(r0, ax, ay, nat.get(r0.label))
        ci = V_I[rr.y0:rr.y1 + 1, rr.x0:rr.x1 + 1].astype(np.float64)
        cl = V_L[rr.y0:rr.y1 + 1, rr.x0:rr.x1 + 1]
        img = np.where(cl == rr.label, ci, 0.0)
        # PHYSICAL aux vmax drives the binning (aniso quirk)
        if r0.vmax <= r0.vmin:
            continue
        lev = np.vectorize(
            lambda v: oracle_glcm.bin_matlab(v, r0.vmax, ng))(img)
        row = ours[ours.ROI_label == r0.label].iloc[0]
        # GLCM: pair counts with background skipped, angled members
        for ai, ang in enumerate((0, 45, 90, 135)):
            dx, dy = oracle_glcm.ANGLE_OFFSETS[ang]
            h, w = img.shape
            M = np.zeros((ng, ng))
            for y in range(h):
                for x in range(w):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        if img[y, x] == 0 or img[yy, xx] == 0:
                            continue
                        M[lev[yy, xx] - 1, lev[y, x] - 1] += 1
            feats = oracle_glcm.glcm_features(M, ng)
            for m, v in feats.items():
                col_name = "%s_%d" % (m, ang)
                if col_name in ours.columns:
                    np.testing.assert_allclose(
                        row[col_name], v, rtol=1e-6, atol=1e-9,
                        err_msg="%s label %d" % (col_name, r0.label))
                    checked += 1
        # GLRLM: background participates (level 1), Np = virtual nonzero
        hb, wb = batching.bucket_shape(rr.height, rr.width)
        nr = max(hb, wb)
        npx = int((img > 0).sum())
        for ai, ang in enumerate((0, 45, 90, 135)):
            P = oracle_glrlm.run_matrix(lev, np.ones_like(lev, bool), ang,
                                        ng, nr)
            feats = oracle_glrlm.glrlm_features(P, npx)
            for m, v in feats.items():
                col_name = "%s_%d" % (m, ang)
                if col_name in ours.columns:
                    np.testing.assert_allclose(
                        row[col_name], v, rtol=1e-6, atol=1e-9,
                        err_msg="%s label %d" % (col_name, r0.label))
                    checked += 1
    assert checked > 500, "oracle comparison covered too little"
