"""Morphology / moments / contour parity tests vs numpy oracles."""

import numpy as np
import pytest

from nyxus_tpu import taxonomy as tx
from nyxus_tpu import columns as col
from nyxus_tpu.config import EngineConfig
from nyxus_tpu.pipeline.runner import PairRunner

RTOL = 1e-9


def run_feats(intens, labels, feats, **cfg_kw):
    cfg = EngineConfig(precision="f64", **cfg_kw)
    fset = tx.parse_feature_request(feats)
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    return labs, values, cols[4:]


@pytest.fixture(scope="module")
def morph(blob_pair):
    intens, labels = blob_pair
    labs, values, cols = run_feats(
        intens, labels,
        ["*BASIC_MORPHOLOGY*", "MAJOR_AXIS_LENGTH", "MINOR_AXIS_LENGTH",
         "ECCENTRICITY", "ELONGATION", "ORIENTATION", "ROUNDNESS",
         "EROSIONS_2_VANISH", "EULER_NUMBER", "FRACT_DIM_BOXCOUNT",
         "PERIMETER", "DIAMETER_EQUAL_PERIMETER", "EDGE_MEAN_INTENSITY",
         "EDGE_STDDEV_INTENSITY", "EDGE_MAX_INTENSITY", "EDGE_MIN_INTENSITY",
         "EDGE_INTEGRATED_INTENSITY"])
    return intens, labels, labs, values, cols


def test_basic_morphology(morph):
    intens, labels, labs, values, cols = morph
    for i, lab in enumerate(labs):
        ys, xs = np.nonzero(labels == lab)
        n = len(ys)
        row = dict(zip(cols, values[i]))
        assert row["AREA_PIXELS_COUNT"] == n
        assert row["CENTROID_X"] == pytest.approx(xs.mean(), rel=RTOL)
        assert row["CENTROID_Y"] == pytest.approx(ys.mean(), rel=RTOL)
        assert row["BBOX_XMIN"] == xs.min()
        assert row["BBOX_YMIN"] == ys.min()
        assert row["BBOX_WIDTH"] == xs.max() - xs.min() + 1
        assert row["BBOX_HEIGHT"] == ys.max() - ys.min() + 1
        assert row["EXTENT"] == pytest.approx(
            n / (row["BBOX_WIDTH"] * row["BBOX_HEIGHT"]), rel=RTOL)
        assert row["ASPECT_RATIO"] == pytest.approx(
            row["BBOX_WIDTH"] / row["BBOX_HEIGHT"], rel=RTOL)
        v = intens[ys, xs].astype(np.float64)
        mass = v.sum()
        wcx, wcy = (xs * v).sum() / mass, (ys * v).sum() / mass
        assert row["WEIGHTED_CENTROID_X"] == pytest.approx(wcx, rel=RTOL)
        assert row["MASS_DISPLACEMENT"] == pytest.approx(
            np.hypot(wcx - xs.mean(), wcy - ys.mean()), rel=RTOL, abs=1e-12)
        assert row["DIAMETER_EQUAL_AREA"] == pytest.approx(
            2 * np.sqrt(n / np.pi), rel=RTOL)
        # compactness: std (unbiased) of distances to centroid / n
        d = np.hypot(xs - xs.mean(), ys - ys.mean())
        sd = np.sqrt(((d - d.mean()) ** 2).sum() / (n - 1)) if n > 2 else 0.0
        assert row["COMPACTNESS"] == pytest.approx(sd / n, rel=1e-8)


def test_ellipse(morph):
    intens, labels, labs, values, cols = morph
    for i, lab in enumerate(labs):
        ys, xs = np.nonzero(labels == lab)
        n = len(ys)
        cx, cy = xs.mean(), ys.mean()
        uxx = ((cx - xs) ** 2).sum() / n + 1 / 12
        uyy = ((cy - ys) ** 2).sum() / n + 1 / 12
        uxy = ((cx - xs) * (cy - ys)).sum() / n
        common = np.sqrt((uxx - uyy) ** 2 + 4 * uxy**2)
        major = 2 * np.sqrt(2) * np.sqrt(uxx + uyy + common)
        minor = 2 * np.sqrt(2) * np.sqrt(uxx + uyy - common)
        row = dict(zip(cols, values[i]))
        assert row["MAJOR_AXIS_LENGTH"] == pytest.approx(major, rel=1e-8)
        assert row["MINOR_AXIS_LENGTH"] == pytest.approx(minor, rel=1e-8)
        assert row["ECCENTRICITY"] == pytest.approx(
            np.sqrt(1 - minor**2 / major**2), rel=1e-8)
        assert row["ROUNDNESS"] == pytest.approx(
            4 * n / (np.pi * major**2), rel=1e-8)


def _erosion_oracle(mask_crop):
    """Literal reference loop (erosion.cpp:16-75)."""
    h, w = mask_crop.shape
    img = mask_crop.astype(np.int64)
    for it in range(1000):
        prev = img.copy()
        nnz = 0
        for col in range(2, w - 1):
            for row in range(2, h - 1):
                vals = [prev[row, col], prev[row - 1, col], prev[row + 1, col],
                        prev[row, col - 1], prev[row, col + 1]]
                m = min(vals)
                img[row, col] = m
                if m > 0:
                    nnz += 1
        if nnz == 0:
            return it
    return 1000


def test_erosion(morph):
    intens, labels, labs, values, cols = morph
    for i, lab in enumerate(labs[:4]):
        ys, xs = np.nonzero(labels == lab)
        crop = (labels[ys.min():ys.max() + 1, xs.min():xs.max() + 1] == lab)
        want = _erosion_oracle(crop)
        row = dict(zip(cols, values[i]))
        assert row["EROSIONS_2_VANISH"] == want, lab


def test_euler(morph):
    """Euler number (8-conn) = #components - #holes, checked via scipy."""
    from scipy import ndimage
    intens, labels, labs, values, cols = morph
    for i, lab in enumerate(labs):
        m = labels == lab
        ncomp = ndimage.label(m, structure=np.ones((3, 3)))[1]
        filled = ndimage.binary_fill_holes(m)
        nholes = ndimage.label(filled & ~m, structure=np.array(
            [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))[1]
        row = dict(zip(cols, values[i]))
        assert row["EULER_NUMBER"] == ncomp - nholes, lab

    # donut
    img = np.zeros((32, 32), np.uint16)
    lab = np.zeros((32, 32), np.int32)
    yy, xx = np.mgrid[0:32, 0:32]
    ring = ((yy - 16) ** 2 + (xx - 16) ** 2 <= 100) & ((yy - 16) ** 2 + (xx - 16) ** 2 >= 20)
    img[ring] = 7 + (xx[ring] % 5).astype(np.uint16)
    lab[ring] = 1
    _, v2, c2 = run_feats(img, lab, ["EULER_NUMBER"])
    assert dict(zip(c2, v2[0]))["EULER_NUMBER"] == 0.0


def test_perimeter_square():
    """A filled k x k square has contour = its border ring; the reference's
    Moore chain gives perimeter = ring length (all unit steps)."""
    img = np.zeros((20, 20), np.uint16)
    lab = np.zeros((20, 20), np.int32)
    img[5:15, 5:15] = 9
    lab[5:15, 5:15] = 3
    _, v, c = run_feats(img, lab, ["PERIMETER", "EDGE_MEAN_INTENSITY",
                                   "EDGE_INTEGRATED_INTENSITY"])
    row = dict(zip(c, v[0]))
    assert row["PERIMETER"] == pytest.approx(36.0)   # 10x10 ring = 36 px
    assert row["EDGE_MEAN_INTENSITY"] == 9.0
    assert row["EDGE_INTEGRATED_INTENSITY"] == 9.0 * 36


def test_moments_against_oracle(blob_pair):
    intens, labels = blob_pair
    labs, values, cols = run_feats(intens, labels, ["*IGEOMOMS*", "*SGEOMOMS*"])
    from nyxus_tpu.pipeline import contour as cmod
    for i, lab in enumerate(labs[:5]):
        ys, xs = np.nonzero(labels == lab)
        y0, x0 = ys.min(), xs.min()
        lx = (xs - x0).astype(np.float64)
        ly = (ys - y0).astype(np.float64)
        v = intens[ys, xs].astype(np.float64)
        row = dict(zip(cols, values[i]))
        smom = {"RM_00": "SPAT_MOMENT_00", "RM_10": "SPAT_MOMENT_10",
                "RM_21": "SPAT_MOMENT_21", "CM_20": "CENTRAL_MOMENT_20",
                "CM_11": "CENTRAL_MOMENT_11", "NCM_20": "NORM_CENTRAL_MOMENT_20",
                "HU1": "HU_M1", "HU2": "HU_M2"}
        def key(prefix, tag):
            return f"{prefix}_{tag}" if prefix == "IMOM" else smom[tag]
        for prefix, wgt in (("IMOM", v), ("SMOM", np.ones_like(v))):
            m00 = wgt.sum()
            m10 = (wgt * lx).sum()
            m01 = (wgt * ly).sum()
            assert row[key(prefix, "RM_00")] == pytest.approx(m00, rel=RTOL)
            assert row[key(prefix, "RM_10")] == pytest.approx(m10, rel=RTOL)
            assert row[key(prefix, "RM_21")] == pytest.approx(
                (wgt * lx**2 * ly).sum(), rel=RTOL)
            ox, oy = m10 / m00, m01 / m00
            mu20 = (wgt * (lx - ox) ** 2).sum()
            mu11 = (wgt * (lx - ox) * (ly - oy)).sum()
            assert row[key(prefix, "CM_20")] == pytest.approx(mu20, rel=1e-8)
            assert row[key(prefix, "CM_11")] == pytest.approx(mu11, rel=1e-8, abs=1e-6)
            nu20 = mu20 / m00**2
            nu02 = (wgt * (ly - oy) ** 2).sum() / m00**2
            nu11 = mu11 / m00**2
            assert row[key(prefix, "NCM_20")] == pytest.approx(nu20, rel=1e-8)
            assert row[key(prefix, "HU1")] == pytest.approx(nu20 + nu02, rel=1e-8)
            assert row[key(prefix, "HU2")] == pytest.approx(
                (nu20 - nu02) ** 2 + 4 * nu11**2, rel=1e-7, abs=1e-12)

        # weighted moments: the reference's APPROXIMATE min distance to the
        # (+1,+1)-shifted merged contour (pixel.cpp:36-71), not the exact one
        from nyxus_tpu import native
        sl = (slice(y0, ys.max() + 1), slice(x0, xs.max() + 1))
        K = cmod.merged_contour(labels[sl] == lab, intens[sl])
        cpts = K[:, :2].astype(np.float64)
        d2, _ = native.contour_sqdist_approx(lx, ly, cpts[:, 0], cpts[:, 1])
        wv = v * np.log(np.sqrt(d2) + 0.001)
        assert row["IMOM_WRM_00"] == pytest.approx(wv.sum(), rel=1e-8)
        wox = (wv * lx).sum() / wv.sum()
        woy = (wv * ly).sum() / wv.sum()
        wmu20 = (wv * (lx - wox) ** 2).sum()
        assert row["IMOM_WCM_20"] == pytest.approx(wmu20, rel=1e-7)


def test_fractal_boxcount_square():
    """Box-count FD of a filled square ~= 2."""
    img = np.zeros((80, 80), np.uint16)
    lab = np.zeros((80, 80), np.int32)
    img[5:70, 5:70] = 3
    lab[5:70, 5:70] = 1
    _, v, c = run_feats(img, lab, ["FRACT_DIM_BOXCOUNT"])
    fd = dict(zip(c, v[0]))["FRACT_DIM_BOXCOUNT"]
    # the reference's estimator is biased low at the coarsest scales; the
    # exact reference value for a 65x65 square in a 128-pow2 grid is 1.6352
    assert fd == pytest.approx(1.6352193243783693, rel=1e-9)
