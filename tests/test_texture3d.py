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
