"""Oversized-ROI streaming path: parity with the trivial (dense-crop) path.

The reference routes ROIs that exceed the RAM budget through per-feature
streaming accumulation (phase3.cpp); here a tiny ram_limit forces the same
split and the streamed values must match the dense-batch values.
"""

import numpy as np
import pytest

from nyxus_tpu import Nyxus

FEATS = ["*ALL_INTENSITY*", "*BASIC_MORPHOLOGY*",
         "MAJOR_AXIS_LENGTH", "MINOR_AXIS_LENGTH", "ECCENTRICITY",
         "ELONGATION", "ORIENTATION", "ROUNDNESS",
         "IMOM_RM_00", "IMOM_CM_22", "IMOM_HU1", "IMOM_NCM_30",
         "SPAT_MOMENT_00", "CENTRAL_MOMENT_22", "HU_M1",
         "NORM_CENTRAL_MOMENT_30"]


def make_pair():
    r = np.random.default_rng(11)
    intens = r.integers(1, 3000, (700, 800)).astype(np.uint16)
    labels = np.zeros((700, 800), np.int32)
    # big irregular ROI (bucket 1024x512 > 1 MB budget -> oversized)
    yy, xx = np.mgrid[0:700, 0:800]
    blob = ((yy - 350) ** 2 / 300.0 ** 2 + (xx - 380) ** 2 / 330.0 ** 2) <= 1
    labels[blob] = 5
    # small trivial ROI for same-run contrast
    labels[10:30, 10:40] = 2
    return intens, labels


def test_oversized_matches_trivial():
    intens, labels = make_pair()
    # f64 on both sides so the comparison isolates the streaming math
    mem = Nyxus(FEATS, precision="f64").featurize(intens, labels)
    ovr = Nyxus(FEATS, ram_limit=1, precision="f64").featurize(intens, labels)
    assert (mem.ROI_label == ovr.ROI_label).all()
    moment_pref = ("IMOM", "SMOM")
    for c in mem.columns[4:]:
        a = mem[c].to_numpy()
        b = ovr[c].to_numpy()
        # COMPACTNESS & moments go through algebraically-equivalent but
        # reordered float paths; everything else is near-exact
        tol = 1e-5 if (c.startswith(moment_pref) or c == "COMPACTNESS") \
            else 1e-8
        np.testing.assert_allclose(b, a, rtol=tol, atol=1e-12, err_msg=c)


def test_oversized_texture_unassigned():
    intens, labels = make_pair()
    df = Nyxus(["GLCM_CONTRAST", "MEAN"], ram_limit=1).featurize(
        intens, labels)
    big = df[df.ROI_label == 5].iloc[0]
    small = df[df.ROI_label == 2].iloc[0]
    # textures need the dense matrix: unassigned (-0.0) for oversized only
    assert big.GLCM_CONTRAST_0 == 0.0 and np.signbit(big.GLCM_CONTRAST_0)
    assert small.GLCM_CONTRAST_0 != 0.0
    assert big.MEAN == pytest.approx(intens[labels == 5].mean())


def test_oversized_streamed_file(tmp_path):
    from nyxus_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    intens, labels = make_pair()
    ip = str(tmp_path / "i.tif")
    lp = str(tmp_path / "s.tif")
    native.write_tiff(ip, intens, tile_size=256)
    native.write_tiff(lp, labels.astype(np.uint16), tile_size=256)
    feats = ["MEAN", "MEDIAN", "P10", "P90", "CENTROID_X", "CENTROID_Y",
             "AREA_PIXELS_COUNT"]
    mem = Nyxus(feats, precision="f64").featurize(intens, labels)
    st = Nyxus(feats, ram_limit=1,
               precision="f64").featurize_files([ip], [lp])
    for c in mem.columns[4:]:
        np.testing.assert_allclose(st[c].to_numpy(), mem[c].to_numpy(),
                                   rtol=1e-9, err_msg=c)
