"""Parity tests: batched IBSI Intensity Histogram kernel vs numpy oracle."""

import numpy as np
import pytest

from nyxus_tpu import Nyxus
from nyxus_tpu import taxonomy as tx
from nyxus_tpu.config import EngineConfig
from nyxus_tpu.pipeline.runner import PairRunner

import oracle_ih as oracle

RTOL = 1e-9


@pytest.fixture(scope="module")
def extracted(blob_pair):
    intens, labels = blob_pair
    cfg = EngineConfig(precision="f64", ibsi=True)
    fset = tx.parse_feature_request(["*ALL_IH*"], ibsi=True)
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    from nyxus_tpu import columns as col
    cols, _ = col.build_header(fset, cfg)
    return intens, labels, labs, values, cols[4:], cfg


def test_all_ih_members_match_oracle(extracted):
    intens, labels, labs, values, colnames, cfg = extracted
    assert len(labs) > 5
    checked = 0
    for i, lab in enumerate(labs):
        v = intens[labels == lab].astype(np.float64)
        ref = oracle.ih_features(v, cfg.coarse_gray_depth)
        if ref is None:
            continue
        row = dict(zip(colnames, values[i]))
        for key, want in ref.items():
            got = row[key]
            assert got == pytest.approx(want, rel=RTOL, abs=1e-9), (
                "feature %s: lab=%d got=%r want=%r" % (key, lab, got, want))
            checked += 1
    assert checked > 5 * 46


def test_ih_gated_off_without_ibsi():
    """IH family only computes in IBSI mode (env_features.cpp:514-527)."""
    fset = tx.parse_feature_request(["*ALL*"], ibsi=False)
    ih_codes = tx.CLASS_FEATURES["IntensityHistogramFeatures"]
    assert not fset.any_enabled(ih_codes)
    fset_on = tx.parse_feature_request(["*ALL*"], ibsi=True)
    assert fset_on.any_enabled(ih_codes)


def test_ih_degenerate_roi_nan():
    intens = np.zeros((24, 24), np.uint16)
    labels = np.zeros((24, 24), np.int32)
    intens[2:8, 2:8] = 77            # uniform ROI: max == min -> noval
    labels[2:8, 2:8] = 1
    intens[12:20, 12:20] = np.arange(64).reshape(8, 8) + 1
    labels[12:20, 12:20] = 2
    nyx = Nyxus(["IH_MEAN_VAL", "IH_NUM_BINS"], ibsi=True)
    df = nyx.featurize(intens, labels)
    r1 = df[df.ROI_label == 1].iloc[0]
    assert r1.IH_MEAN_VAL == -0.0 and r1.IH_NUM_BINS == -0.0
    r2 = df[df.ROI_label == 2].iloc[0]
    assert r2.IH_NUM_BINS == 64
    ref = oracle.ih_features(np.arange(64.0) + 1, 64)
    assert r2.IH_MEAN_VAL == pytest.approx(ref["IH_MEAN_VAL"], rel=RTOL)


def test_ih_affine_float_domain():
    """The affine (pscale, poffset) map shifts reported values but not bin
    indices (intensity_histogram.cpp:318-372)."""
    r = np.random.default_rng(3)
    v = r.integers(10, 4000, 500).astype(np.float64)
    a = oracle.ih_features(v, 32)
    b = oracle.ih_features(v, 32, pscale=2.5, poffset=-100.0)
    assert b["IH_MEAN_IDX"] == a["IH_MEAN_IDX"]
    assert b["IH_MODE_IDX"] == a["IH_MODE_IDX"]
    assert b["IH_MEAN_VAL"] == pytest.approx(-100.0 + 2.5 * a["IH_MEAN_VAL"])
