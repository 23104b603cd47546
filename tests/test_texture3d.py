"""3D texture family parity vs brute-force voxel-loop oracles
(oracle_texture3d, mirroring src/nyx/features/3d_*.cpp)."""

import numpy as np
import pytest

from nyxus_tpu import columns as col
from nyxus_tpu import taxonomy as tx
from nyxus_tpu.config import EngineConfig
from nyxus_tpu.pipeline.runner3d import VolumeRunner

import oracle_glcm
import oracle_glrlm
import oracle_texture3d as o3

RTOL = 1e-8


# entropy members flow through the reference's float32 fast-log
# approximation (ops/common.fast_log2); a 1-ulp float32 boundary flip
# between production and oracle inputs shows up at ~1e-7 relative
_ENTROPY_MEMBERS = ("ENTRO", "_JE", "_RE", "_ZE", "_DE", "INFOMEAS", "_HXY",
                    "_ZDE", "DCENT")


def _rtol(member, tight):
    return 5e-7 if any(t in member for t in _ENTROPY_MEMBERS) else tight


@pytest.fixture(scope="module")
def extracted(blob_volume):
    intens, labels = blob_volume
    # The reference DEFAULT 3D config leaves the per-family
    # GLRLM/GLSZM/GLDM/NGTDM greydepths and the NGTDM radius at zero
    # (env_features.cpp:712-736): no binning / all-zero NGTDM.  That
    # default is pinned against the reference binary in
    # test_config_parity.test_3d_reference_binary_parity; HERE we cover the
    # matlab-binned path by selecting it explicitly (the metaparam route:
    # --featureParams=3glrlm/greydepth=64,3ngtdm/radius=1,...).
    cfg = EngineConfig(precision="f64", d3_glrlm_greydepth=64,
                       d3_glszm_greydepth=64, d3_gldm_greydepth=64,
                       d3_ngtdm_greydepth=64, d3_ngtdm_radius=1)
    fset = tx.parse_feature_request(["*3D_ALL_TEXTURE*", "*3D_NGLDM*",
                                     "*3D_NGTDM*"], dim=3)
    runner = VolumeRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    return intens, labels, labs, values, cols[4:], cfg


def _crop(intens, labels, lab):
    zs, ys, xs = np.nonzero(labels == lab)
    sl = (slice(zs.min(), zs.max() + 1), slice(ys.min(), ys.max() + 1),
          slice(xs.min(), xs.max() + 1))
    return np.where(labels[sl] == lab, intens[sl], 0)


def _rows(extracted):
    intens, labels, labs, values, colnames, cfg = extracted
    for i, lab in enumerate(labs):
        crop = _crop(intens, labels, lab)
        row = dict(zip(colnames, values[i]))
        yield lab, crop, row, (labels == lab).sum()


def test_glcm3d(extracted):
    _, _, _, _, _, cfg = extracted
    ng = cfg.coarse_gray_depth
    checked = 0
    for lab, crop, row, _area in _rows(extracted):
        lev = o3.bin_matlab_img(crop, ng)
        per_dir = {}
        for shift in o3.GLCM_SHIFTS:
            M = o3.glcm3d_matrix(lev, shift, cfg.glcm_offset, ng)
            feats = oracle_glcm.glcm_features(M, ng)
            for m, v in feats.items():
                per_dir.setdefault(m, []).append(v)
        for m, vals in per_dir.items():
            name = "3" + m
            if name in row:
                assert row[name] == pytest.approx(vals[0], rel=RTOL, abs=1e-9), \
                    (name, lab)
                checked += 1
            if "3" + m + "_AVE" in row:
                assert row["3" + m + "_AVE"] == pytest.approx(
                    np.mean(vals), rel=RTOL, abs=1e-9), (m + "_AVE", lab)
    assert checked > 40


def test_glrlm3d(extracted):
    intens, labels, labs, values, colnames, cfg = extracted
    ng = cfg.coarse_gray_depth
    for lab, crop, row, area in _rows(extracted):
        lev = o3.bin_matlab_img(crop, ng)
        nr = max(crop.shape)
        per_dir = {}
        for shift in o3.GLRLM_SHIFTS:
            P = o3.glrlm3d_matrix(lev, shift, ng, nr)
            feats = oracle_glrlm.glrlm_features(P, area)
            for m, v in feats.items():
                per_dir.setdefault(m, []).append(v)
        for m, vals in per_dir.items():
            assert row["3" + m] == pytest.approx(vals[0], rel=RTOL, abs=1e-9), \
                ("3" + m, lab)
            assert row["3" + m + "_AVE"] == pytest.approx(
                np.mean(vals), rel=RTOL, abs=1e-9), (m + "_AVE", lab)


def test_glszm3d(extracted):
    _, _, _, _, _, cfg = extracted
    for lab, crop, row, area in _rows(extracted):
        ref = o3.glszm3d_features(crop, area, cfg.coarse_gray_depth)
        if ref is None:
            continue
        for m, want in ref.items():
            assert row["3" + m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-9), \
                ("3" + m, lab)


def test_gldzm3d(extracted):
    _, _, _, _, _, cfg = extracted
    for lab, crop, row, area in _rows(extracted):
        ref = o3.gldzm3d_features(crop, area, cfg.coarse_gray_depth)
        if ref is None:
            continue
        for m, want in ref.items():
            assert row["3" + m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-9), \
                ("3" + m, lab)


def test_gldm3d(extracted):
    _, _, _, _, _, cfg = extracted
    for lab, crop, row, _area in _rows(extracted):
        ref = o3.gldm3d_features(crop, cfg.coarse_gray_depth)
        if ref is None:
            continue
        for m, want in ref.items():
            assert row["3" + m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-9), \
                ("3" + m, lab)


def test_ngtdm3d(extracted):
    _, _, _, _, _, cfg = extracted
    for lab, crop, row, _area in _rows(extracted):
        ref = o3.ngtdm3d_features(crop, cfg.coarse_gray_depth,
                                  cfg.d3_ngtdm_radius)
        if ref is None:
            continue
        for m, want in ref.items():
            assert row["3" + m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-9), \
                ("3" + m, lab)


def test_ngldm3d(extracted):
    _, _, _, _, _, cfg = extracted
    for lab, crop, row, _area in _rows(extracted):
        ref = o3.ngldm3d_features(crop, cfg.coarse_gray_depth)
        if ref is None:
            continue
        for m, want in ref.items():
            assert row["3" + m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-9), \
                ("3" + m, lab)


def test_3d_wholevolume_intensity_numpy_oracle():
    """Whole-volume (singleROI) 3D voxel-intensity features vs the direct
    numpy oracle.  The reference binary ABORTS on
    D3_VoxelIntensityFeatures in whole-volume mode ("illegal call of
    D3_VoxelIntensityFeatures::reduce", reduce_trivial_rois.cpp:657-707
    has no wholevolume branch for it), so this cell cannot be
    binary-pinned; the engine computes the natural semantic -- the stats
    of every voxel of the volume (the one-past pad plane of the vROI cube
    stays outside the mask) -- and is pinned here against
    oracle_intensity.intensity_features."""
    import oracle_intensity as oi

    r = np.random.default_rng(6)
    vol = r.integers(1, 900, (14, 18, 20)).astype(np.uint16)
    names = ["3COV", "3COVERED_IMAGE_INTENSITY_RANGE", "3ENERGY",
             "3ENTROPY", "3EXCESS_KURTOSIS", "3HYPERFLATNESS",
             "3HYPERSKEWNESS", "3INTEGRATED_INTENSITY",
             "3INTERQUARTILE_RANGE", "3KURTOSIS", "3MAX", "3MEAN",
             "3MEAN_ABSOLUTE_DEVIATION", "3MEDIAN",
             "3MEDIAN_ABSOLUTE_DEVIATION", "3MIN", "3MODE", "3P01",
             "3P10", "3P25", "3P75", "3P90", "3P99", "3QCOD", "3RANGE",
             "3ROBUST_MEAN", "3ROBUST_MEAN_ABSOLUTE_DEVIATION",
             "3ROOT_MEAN_SQUARED", "3SKEWNESS", "3STANDARD_DEVIATION",
             "3STANDARD_DEVIATION_BIASED", "3STANDARD_ERROR",
             "3UNIFORMITY", "3UNIFORMITY_PIU", "3VARIANCE",
             "3VARIANCE_BIASED"]
    cfg = EngineConfig(precision="f64")
    fset = tx.parse_feature_request(names, dim=3)
    runner = VolumeRunner(fset, cfg)
    labs, values = runner.run(vol, np.ones(vol.shape, np.int32),
                              wholeslide=True)
    hdr, _ = col.build_header(fset, cfg)
    got = dict(zip(hdr[4:], values[0]))
    v = vol.astype(np.float64).ravel()
    exp = oi.intensity_features(v, float(v.max() - v.min()),
                                cfg.coarse_gray_depth)
    n_checked = 0
    for name in names:
        key = name[1:]
        if key not in exp or name not in got:
            continue
        np.testing.assert_allclose(got[name], exp[key], rtol=1e-9,
                                   atol=1e-12, err_msg=name)
        n_checked += 1
    assert n_checked >= 30, n_checked
