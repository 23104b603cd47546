#!/usr/bin/env python3
"""Generate tests/data/ref_aniso_320x320_seed11.csv.gz: the reference CLI's
`*ALL*` output on the parity slide with custom anisotropy
(--anisox=1.4 --anisoy=0.75) and calibrated resolution
(--pixelsPerCentimeter=5000 -> pixelSizeUm=2.0, AREA_UM2 = 4n).

Build the reference first:
  cmake -DNOEXTRAS=ON -DBUILD_CLI=ON -DBUILD_LIB=OFF \
        -DCMAKE_BUILD_TYPE=Release -GNinja /root/reference && ninja nyxus
Usage: python tools/gen_aniso_fixture.py [path-to-nyxus-binary]
"""
import gzip
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

ANISO_X = 1.4
ANISO_Y = 0.75
PPCM = 5000.0


def main():
    binary = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/nyxus"
    import numpy as np
    import bench
    from nyxus_tpu import native
    intens, labels = bench.make_dsb_like(h=320, w=320, n_blobs=40, seed=11)
    base = "/tmp/aniso_fix"
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    native.write_tiff(os.path.join(base, "int", "slide.ome.tif"),
                      intens.astype(np.uint16), tile_size=0)
    native.write_tiff(os.path.join(base, "seg", "slide.ome.tif"),
                      labels.astype(np.uint16), tile_size=0)
    out = os.path.join(base, "out")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    subprocess.run([binary, "--features=*ALL*", "--intDir=%s/int" % base,
                    "--segDir=%s/seg" % base, "--outDir=" + out,
                    "--outputType=singlecsv", "--reduceThreads=2",
                    "--anisox=%g" % ANISO_X, "--anisoy=%g" % ANISO_Y,
                    "--pixelsPerCentimeter=%g" % PPCM],
                   check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data", "ref_aniso_320x320_seed11.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)


if __name__ == "__main__":
    main()
