"""Taxonomy parsing and column-contract tests."""

import numpy as np
import pytest

from nyxus_tpu import columns as col
from nyxus_tpu import taxonomy as tx
from nyxus_tpu.config import EngineConfig


def test_code_space_sizes():
    assert tx.FEATURE2D_COUNT == 539
    assert tx.FEATURE3D_COUNT == 752
    assert tx.TOTAL_CODES == 758


def test_all_2d_codes_named():
    for code in range(tx.FEATURE2D_COUNT):
        assert not tx.display_name(code).startswith("2D-feature")


def test_parse_single_feature():
    fs = tx.parse_feature_request(["MEAN"])
    assert fs.is_enabled(tx.NAME2CODE_2D["MEAN"])
    assert fs.enabled.sum() == 1


def test_parse_group_all_intensity():
    fs = tx.parse_feature_request(["*ALL_INTENSITY*"])
    codes = tx.CLASS_FEATURES["PixelIntensityFeatures"]
    assert all(fs.is_enabled(c) for c in codes)
    assert fs.enabled.sum() == len(codes)


def test_parse_all_enables_all_2d():
    fs = tx.parse_feature_request(["*ALL*"])
    # IH family stripped without IBSI mode
    ih = set(tx.CLASS_FEATURES["IntensityHistogramFeatures"])
    n_expected = tx.FEATURE2D_COUNT - len(ih)
    assert fs.enabled.sum() == n_expected
    fs_ibsi = tx.parse_feature_request(["*ALL*"], ibsi=True)
    assert fs_ibsi.enabled.sum() == tx.FEATURE2D_COUNT


def test_minus_operator():
    fs = tx.parse_feature_request(["*ALL_INTENSITY*", "-MEAN"])
    assert not fs.is_enabled(tx.NAME2CODE_2D["MEAN"])
    assert fs.is_enabled(tx.NAME2CODE_2D["MEDIAN"])


def test_minus_group():
    fs = tx.parse_feature_request(["*ALL_INTENSITY*", "-*ALL_INTENSITY*", "MEAN"])
    assert fs.enabled.sum() == 1


def test_case_insensitive():
    fs = tx.parse_feature_request(["mean"])
    assert fs.is_enabled(tx.NAME2CODE_2D["MEAN"])


def test_invalid_name_raises():
    with pytest.raises(ValueError):
        tx.parse_feature_request(["NOT_A_FEATURE"])


def test_unexpanded_group_raises():
    # *ALL_BUT_GABOR* is a recognized nickname without an expansion in the
    # reference -> falls through to the feature-name lookup and errors
    with pytest.raises(ValueError):
        tx.parse_feature_request(["*ALL_BUT_GABOR*"])


def test_3d_group():
    fs = tx.parse_feature_request(["*3D_ALL_INTENSITY*"], dim=3)
    codes = tx.CLASS_FEATURES["D3_VoxelIntensityFeatures"]
    assert all(fs.is_enabled(c) for c in codes)


def test_header_mandatory_columns():
    fs = tx.parse_feature_request(["MEAN", "MEDIAN"])
    cols, slots = col.build_header(fs, EngineConfig())
    assert cols[:4] == ["intensity_image", "mask_image", "ROI_label", "t_index"]
    assert set(cols[4:]) == {"MEAN", "MEDIAN"}


def test_header_enum_order():
    fs = tx.parse_feature_request(["MEDIAN", "MEAN"])  # order given backwards
    cols, _ = col.build_header(fs, EngineConfig())
    i_mean = tx.NAME2CODE_2D["MEAN"]
    i_median = tx.NAME2CODE_2D["MEDIAN"]
    expect = ["MEAN", "MEDIAN"] if i_mean < i_median else ["MEDIAN", "MEAN"]
    assert cols[4:] == expect


def test_histogram_expands_bins():
    fs = tx.parse_feature_request(["HISTOGRAM"])
    cfg = EngineConfig(coarse_gray_depth=16)
    cols, _ = col.build_header(fs, cfg)
    assert cols[4:] == ["HISTOGRAM_BIN_%d" % i for i in range(16)]


def test_glcm_angled_columns():
    fs = tx.parse_feature_request(["GLCM_CONTRAST", "GLCM_CONTRAST_AVE"])
    cols, _ = col.build_header(fs, EngineConfig())
    assert "GLCM_CONTRAST_0" in cols and "GLCM_CONTRAST_135" in cols
    assert "GLCM_CONTRAST_AVE" in cols  # non-angled stays scalar
