"""Nested-ROI hierarchy tests (reference: nested_roi_py.cpp, nyxus.py:2190)."""

import numpy as np
import pandas as pd
import pytest

from nyxus_tpu import Nested, Nyxus
from nyxus_tpu.nested import aggregate_children, find_hierarchy
from nyxus_tpu.io import readers


def _channel_pair():
    """Parent channel: two big boxes.  Child channel: small blobs inside."""
    par = np.zeros((64, 64), np.uint16)
    chi = np.zeros((64, 64), np.uint16)
    par[4:30, 4:30] = 1
    par[34:60, 34:60] = 2
    chi[8:12, 8:12] = 10      # inside parent 1
    chi[20:24, 16:22] = 11    # inside parent 1
    chi[40:44, 40:46] = 12    # inside parent 2
    chi[1:3, 50:60] = 13      # orphan (inside neither box)
    return par, chi


def test_find_hierarchy():
    par, chi = _channel_pair()
    h = find_hierarchy(par, chi)
    assert h == {1: [10, 11], 2: [12]}


@pytest.fixture(scope="module")
def nested_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nested")
    par, chi = _channel_pair()
    for k in range(2):
        readers.write_gray(str(root / ("p%d_c1.tif" % k)), par)
        readers.write_gray(str(root / ("p%d_c0.tif" % k)), chi)
    return str(root)


def test_find_relations(nested_dir):
    nn = Nested()
    rels = nn.find_relations(nested_dir, r"p.*_c1\.tif", r"p.*_c0\.tif")
    assert list(rels.columns) == ["Image", "Parent_Label", "Child_Label"]
    assert len(rels) == 6   # 3 relations x 2 file pairs
    one = rels[rels.Image.str.contains("p0_c1")]
    assert set(map(tuple, one[["Parent_Label", "Child_Label"]].values)) == \
        {(1, 10), (1, 11), (2, 12)}


def test_find_relations_errors(nested_dir):
    nn = Nested()
    with pytest.raises(IOError):
        nn.find_relations("/nonexistent_dir_xyz", ".*", ".*")
    with pytest.raises(RuntimeError):
        nn.find_relations(nested_dir, r"nomatch\.tif", r"p.*_c0\.tif")
    with pytest.raises(RuntimeError):
        nn.find_relations(nested_dir, r"p0_c1\.tif", r"p.*_c0\.tif")  # 1 vs 2


def test_nested_featurize_aggregate(nested_dir):
    par, chi = _channel_pair()
    feats = Nyxus(["AREA_PIXELS_COUNT", "MEAN"]).featurize(
        (chi * 3).astype(np.uint16), chi.astype(np.int32))
    nn = Nested(aggregate=[("mymin", "min"), ("mymax", "max")])
    rels = nn.find_relations(nested_dir, r"p0_c1\.tif", r"p0_c0\.tif")
    agg = nn.featurize(rels, feats)
    # parent 1 has children 10 (area 16) and 11 (area 24)
    assert agg.loc[1, ("AREA_PIXELS_COUNT", "mymin")] == 16
    assert agg.loc[1, ("AREA_PIXELS_COUNT", "mymax")] == 24
    assert agg.loc[2, ("AREA_PIXELS_COUNT", "mymin")] == 24  # child 12


def test_nested_featurize_pivot(nested_dir):
    par, chi = _channel_pair()
    feats = Nyxus(["AREA_PIXELS_COUNT"]).featurize(
        chi.astype(np.uint16), chi.astype(np.int32))
    nn = Nested()
    rels = nn.find_relations(nested_dir, r"p0_c1\.tif", r"p0_c0\.tif")
    piv = nn.featurize(rels, feats)
    assert piv.loc[1, ("AREA_PIXELS_COUNT", 10)] == 16
    assert np.isnan(piv.loc[2, ("AREA_PIXELS_COUNT", 10)])


def test_aggregate_children_cli(nested_dir):
    par, chi = _channel_pair()
    feats = Nyxus(["AREA_PIXELS_COUNT"]).featurize(
        chi.astype(np.uint16), chi.astype(np.int32))
    nn = Nested()
    rels = nn.find_relations(nested_dir, r"p0_c1\.tif", r"p0_c0\.tif")
    s = aggregate_children(rels, feats, "SUM").droplevel("Image")
    assert s.loc[1, "AREA_PIXELS_COUNT"] == 40
    m = aggregate_children(rels, feats, "WMA").droplevel("Image")
    assert m.loc[1, "AREA_PIXELS_COUNT"] == 20   # reference WMA == mean
    with pytest.raises(ValueError):
        aggregate_children(rels, feats, "BOGUS")
