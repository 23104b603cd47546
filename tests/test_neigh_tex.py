"""NGTDM / GLDM / NGLDM parity tests vs independent numpy oracles."""

import numpy as np
import pytest

from nyxus_tpu import taxonomy as tx
from nyxus_tpu import columns as col
from nyxus_tpu.config import EngineConfig
from nyxus_tpu.pipeline.runner import PairRunner

import oracle_neigh_tex as oracle

RTOL = 1e-9


# entropy members flow through the reference's float32 fast-log
# approximation (ops/common.fast_log2); a 1-ulp float32 boundary flip
# between production and oracle inputs shows up at ~1e-7 relative
_ENTROPY_MEMBERS = ("ENTRO", "_JE", "_RE", "_ZE", "_DE", "INFOMEAS", "_HXY",
                    "_ZDE", "DCENT")


def _rtol(member, tight):
    return 5e-7 if any(t in member for t in _ENTROPY_MEMBERS) else tight


@pytest.fixture(scope="module")
def extracted(blob_pair):
    intens, labels = blob_pair
    cfg = EngineConfig(precision="f64")
    fset = tx.parse_feature_request(["*ALL_NGTDM*", "*ALL_GLDM*", "*ALL_NGLDM*"])
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    return intens, labels, labs, values, cols[4:], cfg


def _crops(intens, labels, lab):
    ys, xs = np.nonzero(labels == lab)
    sl = (slice(ys.min(), ys.max() + 1), slice(xs.min(), xs.max() + 1))
    roi_mask = labels[sl] == lab
    crop = np.where(roi_mask, intens[sl], 0)
    return crop, roi_mask


def test_ngtdm(extracted):
    intens, labels, labs, values, colnames, cfg = extracted
    checked = 0
    for i, lab in enumerate(labs):
        crop, _ = _crops(intens, labels, lab)
        if crop.max() == crop.min():
            continue
        ref = oracle.ngtdm(crop, cfg.coarse_gray_depth)
        row = dict(zip(colnames, values[i]))
        if ref is None:
            assert row["NGTDM_COARSENESS"] == -0.0
            continue
        for m, want in ref.items():
            assert row[m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-10), (m, lab)
            checked += 1
    assert checked > 30


def test_gldm(extracted):
    intens, labels, labs, values, colnames, cfg = extracted
    checked = 0
    for i, lab in enumerate(labs):
        crop, _ = _crops(intens, labels, lab)
        if crop.max() == crop.min():
            continue
        ref = oracle.gldm(crop, cfg.coarse_gray_depth)
        row = dict(zip(colnames, values[i]))
        for m, want in ref.items():
            assert row[m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-10), (m, lab)
            checked += 1
    assert checked > 100


def test_ngldm(extracted):
    intens, labels, labs, values, colnames, cfg = extracted
    checked = 0
    for i, lab in enumerate(labs):
        crop, roi_mask = _crops(intens, labels, lab)
        if crop.max() == crop.min():
            continue
        ref = oracle.ngldm(intens[labels == 0].reshape(0, 0) if False else
                           np.where(roi_mask, crop, 0), roi_mask,
                           cfg.coarse_gray_depth)
        row = dict(zip(colnames, values[i]))
        for m, want in ref.items():
            assert row[m] == pytest.approx(want, rel=_rtol(m, RTOL), abs=1e-10), (m, lab)
            checked += 1
    assert checked > 100


def test_blank_roi_all_nan():
    intens = np.zeros((12, 12), np.uint16)
    labels = np.zeros((12, 12), np.int32)
    intens[2:6, 2:6] = 9
    labels[2:6, 2:6] = 1
    cfg = EngineConfig(precision="f64")
    fset = tx.parse_feature_request(["*ALL_NGTDM*", "*ALL_GLDM*", "*ALL_NGLDM*"])
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    row = dict(zip(cols[4:], values[0]))
    for m in ("GLDM_SDE", "NGLDM_LDE"):
        assert row[m] == -0.0
