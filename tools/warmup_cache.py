#!/usr/bin/env python3
"""Precompile the standard bucket ladder into the persistent compile cache.

One-time (per machine / per engine version) warmup: compiles the *ALL*
megakernel for the standard (Bq, h, w) bucket signatures so a production
run's time-to-first-row is trace + cache-load only (runner.py dispatches
one executable per bucket; chunk caps bound the signature space, so this
ladder COVERS dense 2D slides of any ROI population).

Usage:
    python tools/warmup_cache.py [--full] [--precision f32|f64]

Default ladder: nucleus-scale shapes (16/32/64) x batch sizes (64/128/256)
plus the small-batch tails; --full adds the 128/256-pixel shapes.
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np  # noqa: E402


def warm(shapes, precision):
    from nyxus_tpu import taxonomy as tx
    from nyxus_tpu.config import EngineConfig
    import nyxus_tpu.pipeline.runner as rmod

    cfg = EngineConfig(precision=precision)
    runner = rmod.PairRunner(tx.parse_feature_request(["*ALL*"]), cfg)
    np_dt = np.float32 if precision == "f32" else np.float64
    rng = np.random.default_rng(0)
    for (B, H, W) in shapes:
        t0 = time.perf_counter()
        ci = rng.integers(1, 40000, (B, H, W)).astype(np.uint16)
        cm = np.zeros((B, H, W), bool)
        yy, xx = np.mgrid[0:H, 0:W]
        cm[:, ((yy - H // 2) ** 2 + (xx - W // 2) ** 2)
           <= (H // 2 - 1) ** 2] = True
        meta_i = np.tile(np.asarray(
            [[int(cm[0].sum()), 0, 0, H, W]], np.int32), (B, 1))
        meta_f = np.tile(np.asarray(
            [[1.0, 40000.0, 1.0, 40000.0, 0.0]], np_dt), (B, 1))
        d2 = rng.integers(0, (H - 1) ** 2, (B, H, W))
        lw = (d2.astype(np.uint16) if precision == "f32"
              else np.log(np.sqrt(d2.astype(np.float64)) + 1e-2))
        import jax.numpy as jnp
        args = (jnp.asarray(ci), jnp.asarray(np.packbits(cm, axis=2)),
                jnp.asarray(meta_i), jnp.asarray(meta_f), jnp.asarray(lw))
        lkey = rmod._bucket_key(runner.families, cfg, (),
                                (B, H, W), True)
        out = rmod._extract_pair_packed((args,), runner.families, cfg, (),
                                        layout_key=lkey)
        jax.block_until_ready(out)
        print("warmed (%3d, %3d, %3d): %.1f s"
              % (B, H, W, time.perf_counter() - t0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--precision", default="f32", choices=["f32", "f64"])
    args = ap.parse_args()
    shapes = [(B, d, d) for d in (16, 32, 64)
              for B in (8, 16, 32, 64, 128, 256)]
    if args.full:
        shapes += [(B, 128, 128) for B in (8, 16, 32, 64)]
        shapes += [(B, 256, 256) for B in (8, 16)]
    t0 = time.perf_counter()
    warm(shapes, args.precision)
    print("ladder warm in %.1f s (%d signatures)"
          % (time.perf_counter() - t0, len(shapes)))


if __name__ == "__main__":
    main()
