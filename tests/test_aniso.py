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
