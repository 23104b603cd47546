"""Bit-parity of the vectorized chords/caliper kernels vs the loop oracles.

The production kernels in pipeline/hostfeats.py are vectorized rewrites of
the reference's per-pixel / per-edge loops (chords.cpp, caliper_*.cpp); the
oracles in oracle_chords_calipers.py keep the loop form.  Agreement must be
exact — both sides perform the same IEEE operations in the same order.
"""

import numpy as np
import pytest

from nyxus_tpu.pipeline import hostfeats as hf
from oracle_chords_calipers import (caliper_feret_loop, caliper_martin_loop,
                                    caliper_nassenstein_loop, chords_loop)


class _Rec:
    report_bbox = None

    def __init__(self, ys, xs):
        self.y0, self.y1 = int(ys.min()), int(ys.max())
        self.x0, self.x1 = int(xs.min()), int(xs.max())
        self.area = len(ys)
        self.height = self.y1 - self.y0 + 1
        self.width = self.x1 - self.x0 + 1


class _HC:
    """Minimal HostContext stand-in: ROIs from a label image."""

    def pixels_ok(self, i):
        return True

    def __init__(self, label_img, intens=None):
        if intens is None:
            # nonzero intensities incl. a few 0-valued ROI pixels to
            # exercise the chord-breaking semantics
            r = np.random.default_rng(7)
            intens = r.integers(0, 50, label_img.shape).astype(np.float64)
        labs = np.unique(label_img)
        labs = labs[labs != 0]
        self.recs = []
        self._pts = []
        self._crops = []
        self.hulls = []
        for lab in labs:
            ys, xs = np.nonzero(label_img == lab)
            rec = _Rec(ys, xs)
            self.recs.append(rec)
            loc = (ys - ys.min(), xs - xs.min())
            self._pts.append(loc)
            sl = (slice(rec.y0, rec.y1 + 1), slice(rec.x0, rec.x1 + 1))
            self._crops.append((intens[sl], label_img[sl] == lab))
            self.hulls.append(hf.build_convex_hull(loc[1], loc[0]))

    def roi_points(self, i):
        return self._pts[i]

    def pair_crop(self, i):
        return self._crops[i]


class _Cfg:
    noval = -0.0


def _blob_image(seed=3, n=24, hw=256):
    r = np.random.default_rng(seed)
    lab = np.zeros((hw, hw), np.int32)
    yy, xx = np.mgrid[0:hw, 0:hw]
    k = 1
    for _ in range(n):
        cy, cx = r.uniform(10, hw - 10, 2)
        ry, rx = r.uniform(2.5, 14, 2)
        ang = r.uniform(0, np.pi)
        u = (yy - cy) * np.cos(ang) + (xx - cx) * np.sin(ang)
        v = -(yy - cy) * np.sin(ang) + (xx - cx) * np.cos(ang)
        m = ((u / ry) ** 2 + (v / rx) ** 2 <= 1) & (lab == 0)
        if m.sum() >= 4:
            lab[m] = k
            k += 1
    return lab


@pytest.fixture(scope="module")
def hc():
    return _HC(_blob_image())


def _assert_equal_dicts(got, want):
    assert set(got) == set(want)
    for k in want:
        if k.endswith(("_MEAN", "_STDDEV")):
            # the native path accumulates sequentially like the reference;
            # numpy's pairwise summation differs in the last bit
            np.testing.assert_allclose(got[k], want[k], rtol=1e-12,
                                       atol=1e-12, err_msg=k)
        else:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_chords_parity(hc):
    _assert_equal_dicts(hf.chords(hc, _Cfg()), chords_loop(hc, _Cfg()))


def test_feret_parity(hc):
    _assert_equal_dicts(hf.caliper_feret(hc, _Cfg()),
                        caliper_feret_loop(hc, _Cfg()))


def test_martin_parity(hc):
    _assert_equal_dicts(hf.caliper_martin(hc, _Cfg()),
                        caliper_martin_loop(hc, _Cfg()))


def test_nassenstein_parity(hc):
    _assert_equal_dicts(hf.caliper_nassenstein(hc, _Cfg()),
                        caliper_nassenstein_loop(hc, _Cfg()))


def test_chords_degenerate_single_pixel():
    lab = np.zeros((8, 8), np.int32)
    lab[3, 4] = 1
    hc1 = _HC(lab)
    got = hf.chords(hc1, _Cfg())
    want = chords_loop(hc1, _Cfg())
    _assert_equal_dicts(got, want)
    # get_chlen never counts a run that touches the raster's bottom edge
    # (image_matrix.cpp:206-236), so a 1-px ROI yields NO chords and the
    # members stay at the unassigned sentinel
    assert got["MAXCHORDS_MAX"][0] == -0.0


def test_chords_line_rois():
    lab = np.zeros((32, 32), np.int32)
    lab[5, 2:30] = 1      # horizontal line
    lab[10:28, 3] = 2     # vertical line
    lab[range(12, 24), range(12, 24)] = 3   # diagonal
    hc1 = _HC(lab)
    _assert_equal_dicts(hf.chords(hc1, _Cfg()), chords_loop(hc1, _Cfg()))
