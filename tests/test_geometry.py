"""Geometry families: extrema, radius, radial distribution, hull, calipers,
chords, circles, geodetic, neighbors, hexagonality."""

import math

import numpy as np
import pytest

from nyxus_tpu import taxonomy as tx
from nyxus_tpu import columns as col
from nyxus_tpu.config import EngineConfig
from nyxus_tpu.pipeline.runner import PairRunner


def run_feats(intens, labels, feats, **cfg_kw):
    cfg = EngineConfig(precision="f64", **cfg_kw)
    fset = tx.parse_feature_request(feats)
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    return labs, values, cols[4:]


@pytest.fixture(scope="module")
def geo(blob_pair):
    intens, labels = blob_pair
    feats = ["*ALL_MORPHOLOGY*", "FRAC_AT_D", "MEAN_FRAC", "RADIAL_CV",
             "POLYGONALITY_AVE", "HEXAGONALITY_AVE", "HEXAGONALITY_STDDEV"]
    labs, values, cols = run_feats(intens, labels, feats)
    return intens, labels, labs, values, cols


def test_extrema(geo):
    intens, labels, labs, values, cols = geo
    for i, lab in enumerate(labs):
        ys, xs = np.nonzero(labels == lab)
        row = dict(zip(cols, values[i]))
        top = ys.min()
        assert row["EXTREMA_P1_Y"] == top
        assert row["EXTREMA_P1_X"] == xs[ys == top].min()
        assert row["EXTREMA_P2_X"] == xs[ys == top].max()
        right = xs.max()
        assert row["EXTREMA_P3_X"] == right
        assert row["EXTREMA_P3_Y"] == ys[xs == right].min()
        assert row["EXTREMA_P4_Y"] == ys[xs == right].max()
        bot = ys.max()
        assert row["EXTREMA_P5_Y"] == bot
        assert row["EXTREMA_P5_X"] == xs[ys == bot].max()
        assert row["EXTREMA_P6_X"] == xs[ys == bot].min()
        left = xs.min()
        assert row["EXTREMA_P7_Y"] == ys[xs == left].max()
        assert row["EXTREMA_P8_Y"] == ys[xs == left].min()


def test_roi_radius(geo):
    """ROI radius uses the reference's APPROXIMATE ordered-contour distance
    search (pixel.cpp:36-71), not the exact minimum; the oracle here is the
    pure-Python port of that search, and exact distances bound it below."""
    from nyxus_tpu.pipeline import contour as cmod
    from nyxus_tpu import native
    intens, labels, labs, values, cols = geo
    for i, lab in enumerate(labs[:4]):
        ys, xs = np.nonzero(labels == lab)
        y0, x0 = ys.min(), xs.min()
        sl = (slice(y0, ys.max() + 1), slice(x0, xs.max() + 1))
        K = cmod.merged_contour(labels[sl] == lab, intens[sl])[:, :2].astype(float)
        pts = np.stack([xs - x0, ys - y0], 1).astype(float)
        d2, _ = native.contour_sqdist_approx(pts[:, 0], pts[:, 1],
                                             K[:, 0], K[:, 1])
        exact = ((pts[:, None, :] - K[None]) ** 2).sum(-1).min(1)
        assert (d2 >= exact - 1e-12).all()   # approx never below exact min
        row = dict(zip(cols, values[i]))
        assert row["ROI_RADIUS_MEAN"] == pytest.approx(d2.mean(), rel=1e-9)
        assert row["ROI_RADIUS_MAX"] == pytest.approx(d2.max(), rel=1e-9)
        t = np.sort(d2.astype(np.uint32))
        n = len(t)
        med = t[n // 2] if n % 2 else (float(t[n // 2 - 1]) + float(t[n // 2])) / 2
        assert row["ROI_RADIUS_MEDIAN"] == med


def test_convex_hull_square():
    img = np.zeros((20, 20), np.uint16)
    lab = np.zeros((20, 20), np.int32)
    img[5:15, 5:15] = 9
    lab[5:15, 5:15] = 3
    _, v, c = run_feats(img, lab, ["CONVEX_HULL_AREA", "SOLIDITY", "CIRCULARITY"])
    row = dict(zip(c, v[0]))
    # 10x10 square: shoelace 81 + B/2 (36/2) + 1 = 100
    assert row["CONVEX_HULL_AREA"] == pytest.approx(100.0)
    assert row["SOLIDITY"] == pytest.approx(1.0)
    # perimeter 36 -> circularity sqrt(4*pi*100/36^2)
    assert row["CIRCULARITY"] == pytest.approx(math.sqrt(400 * math.pi / 1296), rel=1e-9)


def test_feret_square():
    img = np.zeros((24, 24), np.uint16)
    lab = np.zeros((24, 24), np.int32)
    img[4:14, 4:14] = 5
    lab[4:14, 4:14] = 1
    _, v, c = run_feats(img, lab, ["STAT_FERET_DIAM_MIN", "STAT_FERET_DIAM_MAX",
                                   "MIN_FERET_ANGLE", "MAX_FERET_ANGLE"])
    row = dict(zip(c, v[0]))
    # 9x9 vertex square: min feret 9 (at 0/90 deg); the 10-degree sweep
    # misses 45 deg, so max lands on 40/50 deg: 9*(cos40+sin40)
    assert row["STAT_FERET_DIAM_MIN"] == pytest.approx(9.0, abs=1e-5)
    want_max = 9 * (math.cos(math.radians(40)) + math.sin(math.radians(40)))
    assert row["STAT_FERET_DIAM_MAX"] == pytest.approx(want_max, rel=1e-5)
    assert row["MIN_FERET_ANGLE"] in (0.0, 90.0, 180.0)


def test_circles_disk():
    img = np.zeros((40, 40), np.uint16)
    lab = np.zeros((40, 40), np.int32)
    yy, xx = np.mgrid[0:40, 0:40]
    m = (yy - 20) ** 2 + (xx - 20) ** 2 <= 144  # radius 12
    img[m] = 7
    lab[m] = 1
    _, v, c = run_feats(img, lab, ["DIAMETER_MIN_ENCLOSING_CIRCLE",
                                   "DIAMETER_INSCRIBING_CIRCLE",
                                   "DIAMETER_CIRCUMSCRIBING_CIRCLE"])
    row = dict(zip(c, v[0]))
    assert 23 < row["DIAMETER_MIN_ENCLOSING_CIRCLE"] < 27
    # the reference measures in/circumscribing distances from (centroid - 1)
    # against the (+1, +1)-shifted contour -> a ~2*sqrt(2) off-center bias
    assert 15 < row["DIAMETER_INSCRIBING_CIRCLE"] < 24
    assert 24 < row["DIAMETER_CIRCUMSCRIBING_CIRCLE"] < 32


def test_geodetic(geo):
    """Reference quirk: the pq-formula runs on the int-truncated perimeter
    with integer division (geo_len_thickness.cpp:18-34)."""
    intens, labels, labs, values, cols = geo
    for i in range(len(labs)):
        row = dict(zip(cols, values[i]))
        p = int(row["PERIMETER"])
        a = row["AREA_PIXELS_COUNT"]
        sq = max(p * p // 16 - a, 0)
        gl = p // 4 + math.sqrt(sq)
        assert row["GEODETIC_LENGTH"] == pytest.approx(gl, rel=1e-9)
        assert row["THICKNESS"] == pytest.approx(p // 2 - gl, rel=1e-9, abs=1e-9)


def test_neighbors_two_squares():
    img = np.zeros((30, 30), np.uint16)
    lab = np.zeros((30, 30), np.int32)
    img[5:10, 5:10] = 3; lab[5:10, 5:10] = 1
    img[5:10, 12:17] = 4; lab[5:10, 12:17] = 2   # 2 px gap -> within radius 5
    img[22:27, 22:27] = 5; lab[22:27, 22:27] = 7  # far away
    labs, v, c = run_feats(img, lab, ["NUM_NEIGHBORS", "PERCENT_TOUCHING",
                                      "CLOSEST_NEIGHBOR1_DIST", "CLOSEST_NEIGHBOR1_ANG"])
    rows = {int(l): dict(zip(c, v[i])) for i, l in enumerate(labs)}
    assert rows[1]["NUM_NEIGHBORS"] == 1
    assert rows[2]["NUM_NEIGHBORS"] == 1
    assert rows[7]["NUM_NEIGHBORS"] == 0
    assert rows[1]["CLOSEST_NEIGHBOR1_DIST"] == pytest.approx(7.0)  # centroid gap
    assert rows[1]["CLOSEST_NEIGHBOR1_ANG"] == pytest.approx(0.0)
    assert rows[2]["CLOSEST_NEIGHBOR1_ANG"] == pytest.approx(180.0)


def test_radial_distribution_columns(geo):
    intens, labels, labs, values, cols = geo
    row = dict(zip(cols, values[0]))
    fr = np.array([row["FRAC_AT_D_%d" % k] for k in range(8)])
    assert fr.sum() == pytest.approx(1.0, rel=1e-6)  # fractions sum to ~1
    assert all(np.isfinite(fr))


def test_hexagonality_runs(geo):
    intens, labels, labs, values, cols = geo
    hexv = [dict(zip(cols, values[i]))["HEXAGONALITY_AVE"] for i in range(len(labs))]
    # ROIs with <3 neighbors get the -1 sentinel; all values finite
    assert all(np.isfinite(h) for h in hexv)
