"""File I/O, dataset pairing, output writers, blacklist, and CLI tests."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from nyxus_tpu import Nyxus
from nyxus_tpu.io import dataset as ds
from nyxus_tpu.io import readers

from conftest import make_blobs


@pytest.fixture(scope="module")
def tiff_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    int_dir = root / "int"
    seg_dir = root / "seg"
    int_dir.mkdir()
    seg_dir.mkdir()
    for k in range(3):
        intens, labels = make_blobs(96, 96, 6, seed=k)
        readers.write_gray(str(int_dir / ("img%d.tif" % k)), intens)
        readers.write_gray(str(seg_dir / ("img%d.tif" % k)),
                           labels.astype(np.uint16))
    return str(int_dir), str(seg_dir)


def test_pairing(tiff_dirs):
    int_dir, seg_dir = tiff_dirs
    i, l, ws = ds.read_2d_dataset(int_dir, seg_dir, ".*")
    assert len(i) == 3 and not ws
    i2, l2, ws2 = ds.read_2d_dataset(int_dir, int_dir, ".*")
    assert ws2 and all(x == "" for x in l2)
    i3, _, _ = ds.read_2d_dataset(int_dir, seg_dir, "img[01].tif")
    assert len(i3) == 2


def test_featurize_directory(tiff_dirs):
    int_dir, seg_dir = tiff_dirs
    nyx = Nyxus(["MEAN", "AREA_PIXELS_COUNT"])
    df = nyx.featurize_directory(int_dir, seg_dir)
    assert set(df.columns[:4]) == {"intensity_image", "mask_image",
                                   "ROI_label", "t_index"}
    assert df.intensity_image.nunique() == 3
    # cross-check one ROI against direct featurize
    img = readers.read_gray(os.path.join(int_dir, "img0.tif"))
    lab = readers.read_gray(os.path.join(seg_dir, "img0.tif")).astype(np.int32)
    df0 = nyx.featurize(img, lab)
    sub = df[df.intensity_image.str.endswith("img0.tif")]
    np.testing.assert_allclose(sub.MEAN.to_numpy(), df0.MEAN.to_numpy())


def test_arrow_parquet_output(tiff_dirs, tmp_path):
    int_dir, seg_dir = tiff_dirs
    nyx = Nyxus(["MEAN"])
    p = nyx.featurize_directory(int_dir, seg_dir, output_type="parquet",
                                output_path=str(tmp_path))
    assert p.endswith("NyxusFeatures.parquet") and os.path.exists(p)
    back = pd.read_parquet(p)
    assert "MEAN" in back.columns and len(back) > 0

    a = nyx.featurize_directory(int_dir, seg_dir, output_type="arrowipc",
                                output_path=str(tmp_path / "f.arrow"))
    import pyarrow as pa
    with pa.memory_map(a) as src:
        t = pa.ipc.open_file(src).read_all()
    assert "MEAN" in t.column_names


def test_blacklist(tiff_dirs):
    int_dir, seg_dir = tiff_dirs
    nyx = Nyxus(["MEAN"])
    nyx.blacklist_roi("1,2")
    df = nyx.featurize_directory(int_dir, seg_dir)
    b = df[df.ROI_label.isin([1, 2])]
    assert len(b) > 0 and (b.MEAN == -0.0).all()
    ok = df[~df.ROI_label.isin([1, 2])]
    assert (ok.MEAN > 0).all()
    assert "global blacklist: 1,2" in nyx.roi_blacklist_get_summary()
    nyx.clear_roi_blacklist()
    df2 = nyx.featurize_directory(int_dir, seg_dir)
    assert (df2[df2.ROI_label == 1].MEAN > 0).all()


def test_cli(tiff_dirs, tmp_path):
    int_dir, seg_dir = tiff_dirs
    out_dir = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from nyxus_tpu.cli import main; import sys; sys.exit(main())",
         ],
        env=env, capture_output=True, text=True)
    # run the real CLI invocation with args
    r = subprocess.run(
        [sys.executable, "-m", "nyxus_tpu.cli",
         "--intDir=%s" % int_dir, "--segDir=%s" % seg_dir,
         "--outDir=%s" % out_dir, "--features=MEAN,MAX",
         "--outputType=singlecsv"],
        env=env, capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    csv = out_dir / "NyxusFeatures.csv"
    assert csv.exists()
    df = pd.read_csv(csv)
    assert {"MEAN", "MAX", "ROI_label"} <= set(df.columns)


def test_strpat_layoutA():
    from nyxus_tpu.io.strpat import StringPattern, group_zstack
    sp = StringPattern("BRATS_{d+}_z{set d+}_t{d+}.ome.tif")
    assert sp.good() and sp.is_25d
    key, z = sp.match("BRATS_001_z004_t002.ome.tif")
    assert key == "BRATS_001_z*_t002.ome.tif" and z == "004"
    assert sp.match("BRATS_x_z004_t002.ome.tif") is None
    vols = group_zstack(["a_z2.tif", "a_z10.tif", "a_z1.tif"],
                        StringPattern("a_z{set d+}.tif"))
    assert vols == {"a_z*.tif": ["1", "2", "10"]}
    bad = StringPattern("x{q+}.tif")
    assert not bad.good() and "{Expression}" in bad.ermsg


def test_25d_zstack_directory(tmp_path):
    """2.5D: per-z 2D slice files grouped into one volume must match the
    in-memory 3D result (reference: phase2_25d.cpp z-stack scan)."""
    from nyxus_tpu import Nyxus3D

    r = np.random.default_rng(4)
    Z, H, W = 4, 48, 64
    ivol = r.integers(1, 900, (Z, H, W)).astype(np.uint16)
    lvol = np.zeros((Z, H, W), np.uint16)
    lvol[1:3, 10:30, 15:45] = 2
    lvol[0:4, 35:44, 5:20] = 7
    int_dir = tmp_path / "int"
    seg_dir = tmp_path / "seg"
    int_dir.mkdir()
    seg_dir.mkdir()
    for z in range(Z):
        readers.write_gray(str(int_dir / ("vol1_z0%d.tif" % z)), ivol[z])
        readers.write_gray(str(seg_dir / ("vol1_z0%d.tif" % z)), lvol[z])

    feats = ["3VOXEL_VOLUME", "3MEAN", "3MAX", "3GLCM_CONTRAST"]
    nyx = Nyxus3D(feats)
    df = nyx.featurize_directory(str(int_dir), str(seg_dir),
                                 file_pattern="vol{d+}_z{set d+}.tif")
    ref = nyx.featurize([ivol], [lvol])
    assert list(df.ROI_label) == list(ref.ROI_label) == [2, 7]
    for c in df.columns[4:]:
        np.testing.assert_allclose(df[c].to_numpy(), ref[c].to_numpy(),
                                   rtol=1e-12, err_msg=c)


def test_timing_stopwatch(tmp_path):
    """CHECKTIMING equivalent: stage accumulators, exclusive mode, CSV dump
    (reference: helpers/timing.h:9-39)."""
    import time
    from nyxus_tpu.timing import Stopwatch, stopwatch

    Stopwatch.reset()
    Stopwatch.enable()
    try:
        with stopwatch("Outer/Stage/#ff0000"):
            time.sleep(0.02)
            with stopwatch("Outer/Inner/#00ff00"):
                time.sleep(0.02)
        inc = Stopwatch.totals(exclusive=False)
        exc = Stopwatch.totals(exclusive=True)
        assert inc["Outer/Stage/#ff0000"] >= 0.039
        assert exc["Outer/Stage/#ff0000"] < inc["Outer/Stage/#ff0000"] - 0.015
        p = str(tmp_path / "t_nyxustiming.csv")
        Stopwatch.save_csv(p)
        lines = open(p).read().splitlines()
        assert lines[0] == "h1,h2,h3,color,seconds,calls"
        assert any("Outer,Inner" in ln and "#00ff00" in ln for ln in lines)
        assert "no timing" not in Stopwatch.summary()
    finally:
        Stopwatch.enable(False)
        Stopwatch.reset()


def test_timing_in_pipeline():
    from nyxus_tpu import Nyxus
    from nyxus_tpu.timing import Stopwatch

    Stopwatch.reset()
    Stopwatch.enable()
    try:
        intens, labels = make_blobs(64, 64, 4, seed=9)
        Nyxus(["MEAN", "PERIMETER", "NUM_NEIGHBORS"]).featurize(
            intens, labels.astype(np.int32))
        tot = Stopwatch.totals()
        assert any(k.startswith("Pipeline/Phase1_discovery") for k in tot)
        assert any(k.startswith("Pipeline/Phase2_device_batches") for k in tot)
        assert any(k.startswith("Pipeline/Host/") for k in tot)
    finally:
        Stopwatch.enable(False)
        Stopwatch.reset()


def test_25d_zstack_ram_gated_stream(tmp_path):
    """Forced-streamed 2.5D: an over-RAM-gate layout-A z-stack must stream
    per slice (LayoutAStack lazy volume; the whole stack never np.stacks)
    and produce the exact resident-path results, including an oversized
    ROI that exercises the per-z phase-3 pass (reference tile-streams
    2.5D like 2D: phase1.cpp:130 gatherRoisMetrics_25D, phase2_25d.cpp)."""
    from nyxus_tpu import Nyxus3D
    from nyxus_tpu.pipeline import sources as src_mod

    r = np.random.default_rng(9)
    Z, H, W = 6, 96, 96                 # 6*96*96*16 B > the 1 MB gate/2
    ivol = r.integers(1, 900, (Z, H, W)).astype(np.uint16)
    lvol = np.zeros((Z, H, W), np.uint16)
    lvol[1:4, 8:28, 10:40] = 2          # trivial ROI
    lvol[0:6, 34:90, 4:88] = 7          # big ROI -> oversized under tiny gate
    int_dir = tmp_path / "int"
    seg_dir = tmp_path / "seg"
    int_dir.mkdir()
    seg_dir.mkdir()
    for z in range(Z):
        readers.write_gray(str(int_dir / ("vol1_z0%d.tif" % z)), ivol[z])
        readers.write_gray(str(seg_dir / ("vol1_z0%d.tif" % z)), lvol[z])

    feats = ["*3D_ALL*"]
    ref = Nyxus3D(feats, precision="f64").featurize([ivol], [lvol])

    # gate: stack footprint 6*56*72*16 = 387 KB > (1 MB // 2) -> streams
    n_lazy = []
    orig_plane = src_mod.LayoutAStack.plane

    def counting_plane(self, z, ch):
        n_lazy.append(z)
        return orig_plane(self, z, ch)

    src_mod.LayoutAStack.plane = counting_plane
    try:
        df = Nyxus3D(feats, ram_limit=1,
                     precision="f64").featurize_directory(
            str(int_dir), str(seg_dir),
            file_pattern="vol{d+}_z{set d+}.tif")
    finally:
        src_mod.LayoutAStack.plane = orig_plane
    assert n_lazy, "RAM gate did not route through the lazy stack"

    assert list(df.ROI_label) == list(ref.ROI_label) == [2, 7]
    for c in df.columns[4:]:
        a = df[c].to_numpy(float)
        b = ref[c].to_numpy(float)
        # same tolerance story as the 2D trivial-vs-streamed pins
        # (tests/test_oversized.py): FMA'd binning can flip one boundary
        # voxel's bin in the fused kernel vs the streamed numpy pass
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=1e-9, err_msg=c)
