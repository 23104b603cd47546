"""Streamed (region-read) pair sources for non-TIFF formats.

The reference tile-streams every format through per-format loaders
(omezarr.h:10-48, nyxus_dicom_loader.h:4-19, raw_nifti.h:189); these tests
pin that an over-RAM OME-Zarr v2/v3 or tiled-DICOM pair takes the streamed
path (forced via ram_limit=1) and produces the same values as the in-memory
path, and that uncompressed NIfTI reads are memmap-backed (z-slab consumers
page only what they touch).
"""

import numpy as np
import pytest

from nyxus_tpu import Nyxus

FEATS = ["MEAN", "MEDIAN", "P10", "P90", "CENTROID_X", "CENTROID_Y",
         "AREA_PIXELS_COUNT", "PERIMETER", "CONVEX_HULL_AREA",
         "STAT_FERET_DIAM_MAX", "GLCM_CONTRAST_AVE"]


def make_pair(h=256, w=256, seed=11):
    r = np.random.default_rng(seed)
    intens = r.integers(1, 40000, (h, w)).astype(np.uint16)
    labels = np.zeros((h, w), np.uint16)
    labels[16:120, 20:200] = 1
    labels[140:240, 40:100] = 2
    labels[150:200, 150:250] = 3
    return intens, labels


def _assert_match(mem, st):
    assert list(mem.ROI_label) == list(st.ROI_label)
    for c in mem.columns[4:]:
        np.testing.assert_allclose(st[c].to_numpy(), mem[c].to_numpy(),
                                   rtol=1e-9, atol=1e-12, err_msg=c)


@pytest.mark.parametrize("version", ["v2", "v3"])
def test_zarr_streamed_parity(tmp_path, version):
    from nyxus_tpu.io import zarr as z
    intens, labels = make_pair()
    ip = str(tmp_path / "i.zarr")
    lp = str(tmp_path / "s.zarr")
    if version == "v2":
        z.write_zarr(ip, intens, chunks=(1, 1, 1, 64, 64))
        z.write_zarr(lp, labels, chunks=(1, 1, 1, 64, 64))
    else:
        z.write_zarr_v3(ip, intens, chunks=(1, 1, 1, 64, 64))
        z.write_zarr_v3(lp, labels, chunks=(1, 1, 1, 64, 64))
    mem = Nyxus(FEATS, precision="f64").featurize(intens, labels)
    st = Nyxus(FEATS, ram_limit=1, precision="f64").featurize_files([ip],
                                                                    [lp])
    _assert_match(mem, st)


def test_zarr_source_region_reads(tmp_path):
    from nyxus_tpu.io import zarr as z
    from nyxus_tpu.pipeline.sources import ZarrPairSource
    intens, labels = make_pair(130, 170)
    ip = str(tmp_path / "i.zarr")
    lp = str(tmp_path / "s.zarr")
    z.write_zarr(ip, intens, chunks=(1, 1, 1, 48, 48))
    z.write_zarr(lp, labels, chunks=(1, 1, 1, 48, 48))
    src = ZarrPairSource(ip, lp)
    assert src.shape == (130, 170)
    ii, ll = src.read_pair(100, 150, 64, 64)   # spans the image edge
    exp = np.zeros((64, 64))
    exp[:30, :20] = intens[100:130, 150:170]
    np.testing.assert_array_equal(ii, exp)
    expl = np.zeros((64, 64), np.int64)
    expl[:30, :20] = labels[100:130, 150:170]
    np.testing.assert_array_equal(ll, expl)


def test_dicom_tiled_reader_roundtrip(tmp_path):
    from nyxus_tpu.io.dicom import DicomTiledReader, write_dicom_tiled
    intens, _ = make_pair(200, 300)
    p = str(tmp_path / "a.dcm")
    write_dicom_tiled(p, intens, tile=128)
    with DicomTiledReader(p) as r:
        assert (r.height, r.width) == (200, 300)
        np.testing.assert_array_equal(r.read_region(0, 0, 200, 300), intens)
        np.testing.assert_array_equal(r.read_region(100, 200, 64, 64),
                                      intens[100:164, 200:264])
        # out-of-bounds margin reads zero
        got = r.read_region(190, 290, 32, 32)
        assert (got[10:, :] == 0).all() and (got[:, 10:] == 0).all()
        np.testing.assert_array_equal(got[:10, :10], intens[190:, 290:])


def test_dicom_streamed_parity(tmp_path):
    from nyxus_tpu.io.dicom import write_dicom_tiled
    intens, labels = make_pair()
    ip = str(tmp_path / "i.dcm")
    lp = str(tmp_path / "s.dcm")
    write_dicom_tiled(ip, intens, tile=128)
    write_dicom_tiled(lp, labels, tile=128)
    mem = Nyxus(FEATS, precision="f64").featurize(intens, labels)
    st = Nyxus(FEATS, ram_limit=1, precision="f64").featurize_files([ip],
                                                                    [lp])
    _assert_match(mem, st)


def test_single_frame_dicom_still_decodes_whole(tmp_path):
    """Non-tiled DICOM has no region reads; the whole-image path serves it
    (and the values still match the in-memory run)."""
    from nyxus_tpu.io.dicom import write_dicom_gray
    intens, labels = make_pair(128, 128)
    ip = str(tmp_path / "i.dcm")
    lp = str(tmp_path / "s.dcm")
    write_dicom_gray(ip, intens)
    write_dicom_gray(lp, labels)
    mem = Nyxus(FEATS, precision="f64").featurize(intens, labels)
    st = Nyxus(FEATS, ram_limit=1, precision="f64").featurize_files([ip],
                                                                    [lp])
    _assert_match(mem, st)


def test_nifti_memmap_backed(tmp_path):
    from nyxus_tpu.io import readers
    vol = np.arange(4 * 8 * 6, dtype=np.uint16).reshape(4, 8, 6)
    p = str(tmp_path / "v.nii")
    readers.write_nifti(p, vol)
    back = readers.read_nifti(p)
    assert isinstance(back, np.memmap)
    np.testing.assert_array_equal(np.asarray(back), vol)
    # gz path still decodes fully (no memmap possible) with equal values
    pg = str(tmp_path / "v.nii.gz")
    readers.write_nifti(pg, vol)
    np.testing.assert_array_equal(np.asarray(readers.read_nifti(pg)), vol)


def test_3d_pipelined_matches_serial(tmp_path):
    """featurize_files (prefetch-pipelined volume loop) must equal the
    per-volume serial path (VERDICT r3 next-step 7)."""
    import pandas as pd
    from nyxus_tpu.api import Nyxus3D
    from nyxus_tpu.io import readers
    r = np.random.default_rng(4)
    ips, lps = [], []
    for k in range(3):
        vol = r.integers(1, 300, (6, 24, 20)).astype(np.uint16)
        lab = np.zeros((6, 24, 20), np.uint16)
        lab[1:5, 3:12, 2:10] = 1
        lab[2:6, 14:22, 8:18] = 2
        ip = str(tmp_path / ("v%d.nii" % k))
        lp = str(tmp_path / ("m%d.nii" % k))
        readers.write_nifti(ip, vol)
        readers.write_nifti(lp, lab)
        ips.append(ip)
        lps.append(lp)
    nyx = Nyxus3D(["3MEAN", "3AREA", "3VOLUME_CONVEXHULL"], precision="f64")
    piped = nyx.featurize_files(ips, lps)
    serial = pd.concat([nyx._featurize_volume_pair(i, l)
                        for i, l in zip(ips, lps)], ignore_index=True)
    assert len(piped) == len(serial) == 6
    for c in piped.columns[4:]:
        np.testing.assert_allclose(piped[c].to_numpy(),
                                   serial[c].to_numpy(), err_msg=c)
