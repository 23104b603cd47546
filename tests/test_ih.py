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


def test_preserve_hu_end_to_end():
    """--preserve-hu: first-order stats run on the offset uints while IH_*
    report in the ORIGINAL HU domain (the load-time slope-1 offset
    u = round(x - floor(slide_min)) is undone; reference:
    slideprops.h:48-66, intensity_histogram.cpp:341-372).  r3: the offset
    was previously lost after the load-time shift (hu config gap exposed by
    the per-config vetting matrix)."""
    from nyxus_tpu import Nyxus
    r = np.random.default_rng(0)
    hu = r.integers(-400, 900, (64, 64)).astype(np.int32)
    ll = np.zeros((64, 64), np.int32)
    ll[8:40, 8:40] = 1
    nyx = Nyxus(["MEAN", "MIN", "MAX", "IH_MEAN_VAL", "IH_MINIMUM_VAL",
                 "IH_MAXIMUM_VAL", "IH_MEDIAN_VAL"],
                ibsi=True, preserve_hu=True, precision="f64")
    df = nyx.featurize(hu, ll)
    sel = hu[ll == 1].astype(np.float64)
    off = np.floor(hu.min())
    # uint-domain first-order stats (reference runs them on the shifted img)
    np.testing.assert_allclose(df.MEAN[0], (sel - off).mean(), rtol=1e-12)
    assert df.MIN[0] == sel.min() - off and df.MAX[0] == sel.max() - off
    # IH_* back in HU: min/max exact, mean within one bin width
    binw = (sel.max() - sel.min()) / 64
    assert abs(df.IH_MINIMUM_VAL[0] - sel.min()) <= binw
    assert abs(df.IH_MAXIMUM_VAL[0] - sel.max()) <= binw
    assert abs(df.IH_MEAN_VAL[0] - sel.mean()) <= binw
    assert df.IH_MEAN_VAL[0] < 0 or sel.mean() > 0
