#!/usr/bin/env python3
"""Generate reference-binary fixtures for the non-default engine
configurations the vetting matrix tracks: IBSI mode and radiomics binning.

Same slide/protocol as gen_parity_fixture.py; writes
  tests/data/ref_ibsi_320x320_seed11.csv.gz       (--ibsi=true)
  tests/data/ref_radiomics_320x320_seed11.csv.gz  (--coarseGrayDepth=-32)
"""
import gzip
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    binary = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/nyxus"
    import numpy as np
    import bench
    from nyxus_tpu import native
    intens, labels = bench.make_dsb_like(h=320, w=320, n_blobs=40, seed=11)
    # IBSI raw mode sizes co-occurrence axes by the max integer intensity:
    # compress the dynamic range so the reference's dense matrices stay
    # tractable (Ng <= 60) while every feature still exercises real variety
    intens = (intens % 59 + 1).astype(np.uint16)
    base = "/tmp/parity_fix_cfg"
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    native.write_tiff(os.path.join(base, "int", "slide.ome.tif"),
                      intens.astype(np.uint16), tile_size=0)
    native.write_tiff(os.path.join(base, "seg", "slide.ome.tif"),
                      labels.astype(np.uint16), tile_size=0)
    for tag, extra in (("ibsi", ["--ibsi=true"]),
                       ("radiomics", ["--coarseGrayDepth=-32"])):
        out = os.path.join(base, "out_" + tag)
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        subprocess.run([binary, "--features=*ALL*",
                        "--intDir=%s/int" % base, "--segDir=%s/seg" % base,
                        "--outDir=" + out, "--outputType=singlecsv",
                        "--reduceThreads=2"] + extra,
                       check=True, capture_output=True)
        dst = os.path.join(HERE, "tests", "data",
                           "ref_%s_320x320_seed11.csv.gz" % tag)
        with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
                gzip.open(dst, "wb") as g:
            g.write(f.read())
        print("wrote", dst)


if __name__ == "__main__":
    main()


def gen_3d(binary="/tmp/refbuild/nyxus"):
    """tests/data/ref_3d_48x56x60_seed4.csv.gz: the reference CLI's
    *3D_ALL* CSV on the 3D parity volume (test_oversized._blob3d seed 4,
    intensities compressed to 1..59), via NIfTI pairs and --dim=3."""
    import numpy as np
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_oversized import _blob3d
    from nyxus_tpu.io.readers import write_nifti
    intens, labels = _blob3d(seed=4, shape=(48, 56, 60))
    intens = (intens % 59 + 1).astype(np.uint16)
    base = "/tmp/parity3d"
    shutil.rmtree(base, ignore_errors=True)
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    write_nifti(os.path.join(base, "int", "vol1.nii"), intens)
    write_nifti(os.path.join(base, "seg", "vol1.nii"),
                labels.astype(np.uint16))
    out = os.path.join(base, "out")
    os.makedirs(out, exist_ok=True)
    subprocess.run([binary, "--features=*3D_ALL*", "--dim=3",
                    "--intDir=%s/int" % base, "--segDir=%s/seg" % base,
                    "--outDir=" + out, "--outputType=singlecsv",
                    "--reduceThreads=2"], check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data", "ref_3d_48x56x60_seed4.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)


def gen_hu_2d(binary="/tmp/refbuild/nyxus"):
    """tests/data/ref_hu_320x320_seed11.csv.gz: *ALL* under --preserve-hu on
    a float32 Hounsfield-style slide (integral-valued floats in [-900, 840]
    so the round() step is unambiguous across languages)."""
    import numpy as np
    import bench
    from nyxus_tpu import native
    intens, labels = bench.make_dsb_like(h=320, w=320, n_blobs=40, seed=11)
    # POSITIVE float HU-like values: the reference CLI's float-TIFF prescan
    # clamps negatives to 0 before taking the slide min (verified against
    # the binary: a [-900, 840] slide came back clamped, offset 0 -- its
    # own documented offset map never engages for negative float TIFFs).
    # A positive-domain slide pins the meaningful preserve-hu contract:
    # offset by the floored slide min, report IH_* in the original domain.
    hu = ((intens.astype(np.int64) % 59) * 30 + 100).astype(np.float32)
    base = "/tmp/parity_hu"
    shutil.rmtree(base, ignore_errors=True)
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    native.write_tiff(os.path.join(base, "int", "slide.ome.tif"), hu,
                      tile_size=0)
    native.write_tiff(os.path.join(base, "seg", "slide.ome.tif"),
                      labels.astype(np.uint16), tile_size=0)
    out = os.path.join(base, "out")
    os.makedirs(out, exist_ok=True)
    subprocess.run([binary, "--features=*ALL*", "--preserve-hu=true",
                    "--intDir=%s/int" % base, "--segDir=%s/seg" % base,
                    "--outDir=" + out, "--outputType=singlecsv",
                    "--reduceThreads=2"], check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data", "ref_hu_320x320_seed11.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)


def gen_3d_aniso(binary="/tmp/refbuild/nyxus"):
    """tests/data/ref_3d_aniso_48x56x60_seed4.csv.gz: *3D_ALL* with
    --anisox=1.4 --anisoy=1.2 --anisoz=1.5 on the 3D parity volume."""
    import numpy as np
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_oversized import _blob3d
    from nyxus_tpu.io.readers import write_nifti
    intens, labels = _blob3d(seed=4, shape=(48, 56, 60))
    intens = (intens % 59 + 1).astype(np.uint16)
    base = "/tmp/parity3d_aniso"
    shutil.rmtree(base, ignore_errors=True)
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    write_nifti(os.path.join(base, "int", "vol1.nii"), intens)
    write_nifti(os.path.join(base, "seg", "vol1.nii"),
                labels.astype(np.uint16))
    out = os.path.join(base, "out")
    os.makedirs(out, exist_ok=True)
    subprocess.run([binary, "--features=*3D_ALL*", "--dim=3",
                    "--anisox=1.4", "--anisoy=1.2", "--anisoz=1.5",
                    "--intDir=%s/int" % base, "--segDir=%s/seg" % base,
                    "--outDir=" + out, "--outputType=singlecsv",
                    "--reduceThreads=2"], check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data",
                       "ref_3d_aniso_48x56x60_seed4.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)


def gen_3d_whole(binary="/tmp/refbuild/nyxus"):
    """tests/data/ref_3d_whole_48x56x60_seed4.csv.gz: *3D_ALL* in
    whole-volume mode (--intDir == --segDir -> singleROI)."""
    import numpy as np
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_oversized import _blob3d
    from nyxus_tpu.io.readers import write_nifti
    intens, _ = _blob3d(seed=4, shape=(48, 56, 60))
    intens = (intens % 59 + 1).astype(np.uint16)
    base = "/tmp/parity3d_whole"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(os.path.join(base, "int"), exist_ok=True)
    write_nifti(os.path.join(base, "int", "vol1.nii"), intens)
    out = os.path.join(base, "out")
    os.makedirs(out, exist_ok=True)
    # the reference BINARY aborts on *3D_ALL* in whole-volume mode
    # ("illegal call of D3_VoxelIntensityFeatures::calculate"): only the
    # morphology + texture families have whole-volume variants there
    feats = ("*3D_ALL_MORPHOLOGY*,*3D_GLCM*,*3D_GLDM*,*3D_GLDZM*,"
             "*3D_GLRLM*,*3D_GLSZM*,*3D_NGLDM*,*3D_NGTDM*")
    subprocess.run([binary, "--features=" + feats, "--dim=3",
                    "--intDir=%s/int" % base, "--segDir=%s/int" % base,
                    "--outDir=" + out, "--outputType=singlecsv",
                    "--reduceThreads=2"], check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data",
                       "ref_3d_whole_48x56x60_seed4.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)


def gen_3d_ibsi(binary="/tmp/refbuild/nyxus"):
    """tests/data/ref_3d_ibsi_48x56x60_seed4.csv.gz: *3D_ALL* with
    --ibsi=true on the 3D parity volume."""
    import numpy as np
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_oversized import _blob3d
    from nyxus_tpu.io.readers import write_nifti
    intens, labels = _blob3d(seed=4, shape=(48, 56, 60))
    intens = (intens % 59 + 1).astype(np.uint16)
    base = "/tmp/parity3d_ibsi"
    shutil.rmtree(base, ignore_errors=True)
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    write_nifti(os.path.join(base, "int", "vol1.nii"), intens)
    write_nifti(os.path.join(base, "seg", "vol1.nii"),
                labels.astype(np.uint16))
    out = os.path.join(base, "out")
    os.makedirs(out, exist_ok=True)
    subprocess.run([binary, "--features=*3D_ALL*", "--dim=3", "--ibsi=true",
                    "--intDir=%s/int" % base, "--segDir=%s/seg" % base,
                    "--outDir=" + out, "--outputType=singlecsv",
                    "--reduceThreads=2"], check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data",
                       "ref_3d_ibsi_48x56x60_seed4.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)


def gen_3d_hu(binary="/tmp/refbuild/nyxus"):
    """tests/data/ref_3d_hu_48x56x60_seed4.csv.gz: *3D_ALL* with
    --preserve-hu=true on an int16 HU-like volume (NIfTI keeps the signed
    dtype, so the offset map is exercised for real)."""
    import numpy as np
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_oversized import _blob3d
    from nyxus_tpu.io.readers import write_nifti
    intens, labels = _blob3d(seed=4, shape=(48, 56, 60))
    hu = ((intens.astype(np.int64) % 59) * 30 - 900).astype(np.int16)
    base = "/tmp/parity3d_hu"
    shutil.rmtree(base, ignore_errors=True)
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    write_nifti(os.path.join(base, "int", "vol1.nii"), hu)
    write_nifti(os.path.join(base, "seg", "vol1.nii"),
                labels.astype(np.uint16))
    out = os.path.join(base, "out")
    os.makedirs(out, exist_ok=True)
    subprocess.run([binary, "--features=*3D_ALL*", "--dim=3",
                    "--preserve-hu=true",
                    "--intDir=%s/int" % base, "--segDir=%s/seg" % base,
                    "--outDir=" + out, "--outputType=singlecsv",
                    "--reduceThreads=2"], check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data",
                       "ref_3d_hu_48x56x60_seed4.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)
