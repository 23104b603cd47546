"""Native C++ layer: libtiff region server, prescan, TIFF/CSV writers."""

import os

import numpy as np
import pytest

from nyxus_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("dtype,tile,comp", [
    (np.uint16, 256, "lzw"), (np.float32, 128, "deflate"),
    (np.uint32, 0, "none"), (np.uint8, 512, "lzw")])
def test_tiff_roundtrip(tmp_path, dtype, tile, comp):
    p = str(tmp_path / "t.tif")
    arr = np.random.default_rng(1).integers(0, 255, (777, 513)).astype(dtype)
    native.write_tiff(p, arr, tile_size=tile, compression=comp)
    with native.TiffReader(p) as r:
        assert r.tiled == (tile > 0)
        assert (r.width, r.height) == (513, 777)
        np.testing.assert_array_equal(r.read_all("f64"), arr)
        # unaligned region straddling block boundaries + out-of-image margin
        reg = r.read_region(250, 120, 300, 600, "f64")
        want = np.zeros((300, 600))
        want[:300, :393] = arr[250:550, 120:513]
        np.testing.assert_array_equal(reg, want)
        mn, mx, nz = r.prescan()
        assert (mn, mx, nz) == (arr.min(), arr.max(), (arr != 0).sum())


def test_reader_feeds_pipeline(tmp_path):
    """End-to-end: native tiled TIFF -> featurize_files."""
    from nyxus_tpu import Nyxus
    intens = np.zeros((100, 100), np.uint16)
    labels = np.zeros((100, 100), np.uint16)
    intens[10:30, 10:40] = (np.arange(600).reshape(20, 30) + 7) % 1000
    labels[10:30, 10:40] = 3
    ip = str(tmp_path / "i.tif")
    lp = str(tmp_path / "s.tif")
    native.write_tiff(ip, intens, tile_size=64)
    native.write_tiff(lp, labels, tile_size=64)
    df = Nyxus(["MEAN", "AREA_PIXELS_COUNT"]).featurize_files([ip], [lp])
    row = df.iloc[0]
    assert row.AREA_PIXELS_COUNT == 600
    assert row.MEAN == pytest.approx(intens[labels == 3].mean())


def test_native_csv(tmp_path):
    p = str(tmp_path / "o.csv")
    native.write_csv(p, "a,b,X,Y", ["m,i", "m,i"],
                     np.array([[1.5, -0.0], [float("nan"), 2e-7]]),
                     noval_text="NaN", precision=6, sub_negzero=False)
    lines = open(p).read().splitlines()
    assert lines[0] == "a,b,X,Y"
    assert lines[1] == "m,i,1.5,-0"
    assert lines[2] == "m,i,NaN,2e-07"


def test_float_tiff_preserved(tmp_path):
    p = str(tmp_path / "f.tif")
    arr = np.random.default_rng(2).normal(0, 100, (64, 64)).astype(np.float32)
    native.write_tiff(p, arr, tile_size=0, compression="deflate")
    from nyxus_tpu.io import readers
    got = readers.read_gray(p)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, arr)


def test_streamed_matches_inmemory(tmp_path):
    """Big-slide gate: a pair forced through run_streamed (tiny RAM limit)
    must match the in-memory path feature-for-feature."""
    from conftest import make_blobs
    from nyxus_tpu import Nyxus

    intens, labels = make_blobs(300, 400, 12, seed=5)
    ip = str(tmp_path / "i.tif")
    lp = str(tmp_path / "s.tif")
    native.write_tiff(ip, intens.astype(np.uint16), tile_size=128)
    native.write_tiff(lp, labels.astype(np.uint16), tile_size=128)

    feats = ["*ALL_INTENSITY*", "*BASIC_MORPHOLOGY*", "PERIMETER",
             "CONVEX_HULL_AREA", "GLCM_CONTRAST", "NUM_NEIGHBORS"]
    mem = Nyxus(feats).featurize_files([ip], [lp])
    # ram_limit 1 MB << 300*400*16 B forces the streamed path
    st = Nyxus(feats, ram_limit=1).featurize_files([ip], [lp])
    assert (st.ROI_label == mem.ROI_label).all()
    for c in mem.columns[4:]:
        np.testing.assert_allclose(st[c].to_numpy(), mem[c].to_numpy(),
                                   rtol=1e-9, atol=1e-9, err_msg=c)


def test_streamed_wholeslide(tmp_path):
    from nyxus_tpu import Nyxus
    rng = np.random.default_rng(3)
    intens = rng.integers(1, 500, (200, 300)).astype(np.uint16)
    ip = str(tmp_path / "w.tif")
    native.write_tiff(ip, intens, tile_size=128)
    feats = ["MEAN", "AREA_PIXELS_COUNT", "MAX", "MIN"]
    df = Nyxus(feats, ram_limit=1).featurize_files([ip], None,
                                                   single_roi=True)
    row = df.iloc[0]
    assert row.AREA_PIXELS_COUNT == 200 * 300
    assert row.MEAN == pytest.approx(intens.mean())
    assert row.MAX == intens.max() and row.MIN == intens.min()


def test_native_contour_parity():
    """Native Moore-trace port must match the Python oracle bit-for-bit."""
    from conftest import make_blobs
    from nyxus_tpu.pipeline import contour as cm

    for seed in range(8):
        intens, labels = make_blobs(80, 80, 5, seed=seed)
        for lab in np.unique(labels)[1:]:
            ys, xs = np.nonzero(labels == lab)
            y0, y1, x0, x1 = ys.min(), ys.max(), xs.min(), xs.max()
            m = labels[y0:y1 + 1, x0:x1 + 1] == lab
            ii = intens[y0:y1 + 1, x0:x1 + 1]
            a = cm.merged_contour_py(m, ii)
            b = native.contour(m, ii.astype(np.int64))
            assert a.shape == b.shape and (a == b).all()
    for m in (np.zeros((3, 3), bool), np.ones((1, 1), bool),
              np.eye(5, dtype=bool)):
        a = cm.merged_contour_py(m, np.ones(m.shape) * 7)
        b = native.contour(m, (np.ones(m.shape) * 7).astype(np.int64))
        assert a.shape == b.shape and (a == b).all()


def test_native_hull_parity():
    from conftest import make_blobs
    from nyxus_tpu.pipeline.hostfeats import build_convex_hull_py

    for seed in range(8):
        _, labels = make_blobs(90, 90, 6, seed=seed)
        for lab in np.unique(labels)[1:]:
            ys, xs = np.nonzero(labels == lab)
            a = build_convex_hull_py(xs, ys)
            b = native.convex_hull(xs, ys)
            assert a.shape == b.shape and np.array_equal(a, b)
    for xs, ys in (([3], [4]), ([1, 1], [2, 9]), ([0, 1, 2], [0, 0, 0])):
        a = build_convex_hull_py(np.array(xs), np.array(ys))
        b = native.convex_hull(xs, ys)
        assert a.shape == b.shape and np.array_equal(a, b)
