"""Command-line interface mirroring the reference CLI
(reference: src/nyx/main_nyxus.cpp:12-227, cli_option_constants.h:4-77).

Usage:
    python -m nyxus_tpu.cli --intDir=<dir> --segDir=<dir> --outDir=<dir> \
        --features=*ALL* [--outputType=singlecsv|separatecsv|arrowipc|parquet] ...
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser():
    p = argparse.ArgumentParser(
        prog="nyxus_tpu",
        description="TPU-native scalable image feature extraction")
    a = p.add_argument
    a("--intDir", required=True, help="intensity image directory")
    a("--segDir", required=True, help="segmentation mask directory")
    a("--outDir", required=True, help="output directory")
    a("--features", default="*ALL*", help="feature list / group nicknames")
    a("--filePattern", default=".*", help="regex file pattern")
    a("--outputType", default="separatecsv",
      choices=["separatecsv", "singlecsv", "arrowipc", "parquet"])
    a("--resultFname", default="NyxusFeatures")
    a("--coarseGrayDepth", type=int, default=64)
    a("--pixelDistance", type=int, default=5)
    a("--reduceThreads", type=int, default=4)
    a("--ramLimit", type=int, default=4096)
    a("--ibsi", default="false")
    a("--skiproi", default="")
    a("--verbose", type=int, default=0)
    a("--glcmAngles", default="0,45,90,135")
    a("--glcmOff", type=int, default=1)
    a("--gaborfreqs", default="4,16,32,64")
    a("--gabortheta", default="0,45,90,135")
    a("--gaborgamma", type=float, default=0.1)
    a("--gaborsig2lam", type=float, default=0.8)
    a("--gaborkersize", type=int, default=16)
    a("--gaborf0", type=float, default=0.1)
    a("--gaborthold", type=float, default=0.025)
    a("--noval", type=float, default=-0.0)
    a("--tinyval", type=float, default=1e-10)
    a("--fpimgdr", type=float, default=1e4)
    a("--fpimgmin", type=float, default=0.0)
    a("--fpimgmax", type=float, default=1.0)
    a("--preserve-hu", dest="preserve_hu", action="store_true")
    a("--anisox", type=float, default=1.0)
    a("--anisoy", type=float, default=1.0)
    a("--anisoz", type=float, default=1.0)
    a("--dim", type=int, default=2)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # the reference also accepts --opt=value tokens; argparse handles both

    from .api import Nyxus

    nyx = Nyxus(
        features=[t for t in args.features.split(",") if t],
        coarse_gray_depth=args.coarseGrayDepth,
        neighbor_distance=args.pixelDistance,
        ibsi=args.ibsi.lower() in ("true", "1", "yes", "on"),
        gabor_kersize=args.gaborkersize,
        gabor_gamma=args.gaborgamma,
        gabor_sig2lam=args.gaborsig2lam,
        gabor_f0=args.gaborf0,
        gabor_thold=args.gaborthold,
        gabor_thetas=[float(v) for v in args.gabortheta.split(",")],
        gabor_freqs=[float(v) for v in args.gaborfreqs.split(",")],
        dynamic_range=args.fpimgdr,
        min_intensity=args.fpimgmin,
        max_intensity=args.fpimgmax,
        preserve_hu=args.preserve_hu,
        ram_limit=args.ramLimit,
    )
    nyx.cfg = nyx.cfg.replace(
        glcm_angles=tuple(int(v) for v in args.glcmAngles.split(",")),
        glcm_offset=args.glcmOff,
        noval=args.noval, tinyval=args.tinyval)
    nyx._compile()
    if args.skiproi:
        nyx.blacklist_roi(args.skiproi)

    os.makedirs(args.outDir, exist_ok=True)

    if args.outputType in ("arrowipc", "parquet"):
        out = nyx.featurize_directory(args.intDir, args.segDir,
                                      args.filePattern,
                                      output_type=args.outputType,
                                      output_path=args.outDir)
        print("wrote", out)
        return 0

    df = nyx.featurize_directory(args.intDir, args.segDir, args.filePattern)
    if args.outputType == "singlecsv":
        out = os.path.join(args.outDir, args.resultFname + ".csv")
        df.to_csv(out, index=False)
        print("wrote", out)
    else:  # separatecsv: one CSV per slide (mask image)
        for seg, gdf in df.groupby("mask_image", sort=False):
            base = os.path.splitext(os.path.basename(seg or "wholeslide"))[0]
            out = os.path.join(args.outDir, base + ".csv")
            gdf.to_csv(out, index=False)
            print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
