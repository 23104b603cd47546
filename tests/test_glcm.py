"""GLCM parity tests vs the independent numpy oracle + the IBSI phantom."""

import numpy as np
import pytest

from nyxus_tpu import Nyxus
from nyxus_tpu import taxonomy as tx
from nyxus_tpu import columns as col
from nyxus_tpu.config import EngineConfig
from nyxus_tpu.pipeline.runner import PairRunner

import oracle_glcm as oracle

RTOL = 1e-9


# entropy members flow through the reference's float32 fast-log
# approximation (ops/common.fast_log2); a 1-ulp float32 boundary flip
# between production and oracle inputs shows up at ~1e-7 relative
_ENTROPY_MEMBERS = ("ENTRO", "_JE", "_RE", "_ZE", "_DE", "INFOMEAS", "_HXY",
                    "_ZDE", "DCENT")


def _rtol(member, tight):
    return 5e-7 if any(t in member for t in _ENTROPY_MEMBERS) else tight

# The IBSI digital phantom (IBSI-1 reference manual, 5x4 grid): a standard
# public test image for texture features.
IBSI_PHANTOM = np.array([
    [1, 2, 2, 2, 3],
    [1, 2, 3, 3, 2],
    [4, 2, 4, 1, 1],
    [4, 1, 2, 1, 1],
], dtype=np.uint16)


def run_glcm(intens, labels, **cfg_kw):
    cfg = EngineConfig(precision="f64", **cfg_kw)
    fset = tx.parse_feature_request(["*ALL_GLCM*"], ibsi=cfg.ibsi)
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    return labs, values, cols[4:], cfg


def test_glcm_matches_oracle_matlab_binning(blob_pair):
    intens, labels = blob_pair
    labs, values, colnames, cfg = run_glcm(intens, labels)
    ng = cfg.coarse_gray_depth
    checked = 0
    for i, lab in enumerate(labs):
        ys, xs = np.nonzero(labels == lab)
        crop = np.where(labels[ys.min():ys.max() + 1, xs.min():xs.max() + 1] == lab,
                        intens[ys.min():ys.max() + 1, xs.min():xs.max() + 1], 0)
        row = dict(zip(colnames, values[i]))
        for ai, ang in enumerate(cfg.glcm_angles):
            M = oracle.cooc(crop.astype(np.float64), ang, cfg.glcm_offset, ng, ng)
            ref = oracle.glcm_features(M, ng)
            for m in oracle.ALL:
                got = row["%s_%d" % (m, ang)]
                want = ref[m]
                assert got == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-10), (
                    "%s angle %d lab %d: got %r want %r" % (m, ang, lab, got, want))
                checked += 1
    assert checked > 1000


def test_glcm_ave_is_mean_of_angles(blob_pair):
    intens, labels = blob_pair
    labs, values, colnames, cfg = run_glcm(intens, labels)
    row = dict(zip(colnames, values[0]))
    for m in oracle.ALL:
        if m == "GLCM_HOM2":
            continue
        vals = [row["%s_%d" % (m, a)] for a in cfg.glcm_angles]
        assert row[m + "_AVE"] == pytest.approx(np.mean(vals), rel=1e-12)


def test_glcm_uniform_roi_softnan():
    intens = np.zeros((16, 16), np.uint16)
    labels = np.zeros((16, 16), np.int32)
    intens[2:8, 2:8] = 77       # uniform intensity -> binned min == max
    labels[2:8, 2:8] = 1
    labs, values, colnames, cfg = run_glcm(intens, labels)
    row = dict(zip(colnames, values[0]))
    for m in ("GLCM_CONTRAST_0", "GLCM_CORRELATION_90", "GLCM_CONTRAST_AVE"):
        assert row[m] == -0.0


def test_glcm_ibsi_phantom():
    """IBSI mode on the IBSI-1 digital phantom: check a few hand-computable
    values (symmetric matrix, no binning)."""
    labels = np.ones_like(IBSI_PHANTOM, dtype=np.int32)
    labs, values, colnames, cfg = run_glcm(IBSI_PHANTOM, labels, ibsi=True)
    row = dict(zip(colnames, values[0]))
    ng = int(IBSI_PHANTOM.max())
    for ang in cfg.glcm_angles:
        M = oracle.cooc(IBSI_PHANTOM.astype(np.float64), ang, 1, ng, ng, ibsi=True)
        ref = oracle.glcm_features(M, ng)
        for m in oracle.ALL:
            got = row["%s_%d" % (m, ang)]
            assert got == pytest.approx(ref[m], rel=_rtol(m, RTOL), abs=1e-10), (
                "%s angle %d" % (m, ang))
    # IBSI reference value: joint maximum of the phantom, delta=1, 0 deg,
    # symmetric: most frequent co-occurrence is (1,1)&(2,2) pairs
    assert 0 < row["GLCM_JMAX_0"] < 1


def test_glcm_matches_oracle_radiomics_binning(blob_pair):
    """Negative grey depth selects radiomics binning
    (texture_feature.h:106-118); parity vs the numpy oracle."""
    intens, labels = blob_pair
    labs, values, colnames, cfg = run_glcm(intens, labels,
                                           coarse_gray_depth=-32)
    ng = 32
    checked = 0
    for i, lab in enumerate(labs):
        ys, xs = np.nonzero(labels == lab)
        crop = np.where(labels[ys.min():ys.max() + 1, xs.min():xs.max() + 1] == lab,
                        intens[ys.min():ys.max() + 1, xs.min():xs.max() + 1], 0)
        row = dict(zip(colnames, values[i]))
        for ang in cfg.glcm_angles:
            M, I = oracle.cooc(crop.astype(np.float64), ang, cfg.glcm_offset,
                               ng, ng, radiomics=True)
            ref = oracle.glcm_features(M, ng, I=I)
            for m in oracle.ALL:
                got = row["%s_%d" % (m, ang)]
                assert got == pytest.approx(ref[m], rel=_rtol(m, RTOL), abs=1e-10), (
                    "%s angle %d lab %d" % (m, ang, lab))
                checked += 1
    assert checked > 1000


def test_all_texture_families_accept_radiomics_binning(blob_pair):
    """Every 2D texture family runs (finite, non-erroring) with a negative
    grey depth."""
    intens, labels = blob_pair
    cfg = EngineConfig(precision="f64", coarse_gray_depth=-16)
    fset = tx.parse_feature_request(
        ["*ALL_GLCM*", "*ALL_GLRLM*", "*ALL_GLSZM*", "*ALL_GLDM*",
         "*ALL_GLDZM*", "*ALL_NGLDM*", "*ALL_NGTDM*"], ibsi=False)
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    assert np.isfinite(values).all()
