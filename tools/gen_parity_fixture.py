#!/usr/bin/env python3
"""Regenerate tests/data/ref_all_320x320_seed11.csv.gz from the reference CLI.

Build the reference first:
  cmake -DNOEXTRAS=ON -DBUILD_CLI=ON -DBUILD_LIB=OFF \
        -DCMAKE_BUILD_TYPE=Release -GNinja /root/reference && ninja nyxus
Usage: python tools/gen_parity_fixture.py [path-to-nyxus-binary]
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
    base = "/tmp/parity_fix"
    for d in ("int", "seg"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    native.write_tiff(os.path.join(base, "int", "slide.ome.tif"),
                      intens.astype(np.uint16), tile_size=0)  # strip TIFF: raster-order pixel feed
    native.write_tiff(os.path.join(base, "seg", "slide.ome.tif"),
                      labels.astype(np.uint16), tile_size=0)  # strip TIFF: raster-order pixel feed
    out = os.path.join(base, "out")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    subprocess.run([binary, "--features=*ALL*", "--intDir=%s/int" % base,
                    "--segDir=%s/seg" % base, "--outDir=" + out,
                    "--outputType=singlecsv", "--reduceThreads=2"],
                   check=True, capture_output=True)
    dst = os.path.join(HERE, "tests", "data", "ref_all_320x320_seed11.csv.gz")
    with open(os.path.join(out, "NyxusFeatures.csv"), "rb") as f, \
            gzip.open(dst, "wb") as g:
        g.write(f.read())
    print("wrote", dst)


if __name__ == "__main__":
    main()
