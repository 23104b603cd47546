#!/usr/bin/env python3
"""Benchmark: ROI feature-extraction throughput on the default accelerator.

Workload: a DSB2018-like synthetic segmented slide (many nucleus-scale ROIs)
featurized with every device-native family currently implemented (intensity,
all seven texture families, morphology, erosion/Euler/fractal, moments).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the same pipeline pinned to the multicore
host CPU (the reference implementation is CPU-only, so the self-measured CPU
run stands in for the reference baseline until a native reference build is
available; see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

FEATURES = [
    "*ALL_INTENSITY*", "*ALL_GLCM*", "*ALL_GLRLM*", "*ALL_GLSZM*",
    "*ALL_GLDZM*", "*ALL_GLDM*", "*ALL_NGLDM*", "*ALL_NGTDM*",
    "*BASIC_MORPHOLOGY*", "MAJOR_AXIS_LENGTH", "MINOR_AXIS_LENGTH",
    "ECCENTRICITY", "ELONGATION", "ORIENTATION", "ROUNDNESS",
    "EROSIONS_2_VANISH", "EULER_NUMBER", "FRACT_DIM_BOXCOUNT",
]


def make_dsb_like(h=1024, w=1024, n_blobs=300, seed=7):
    """Nucleus-like elliptical ROIs, DSB2018-ish density and sizes."""
    r = np.random.default_rng(seed)
    labels = np.zeros((h, w), np.int32)
    intens = (r.normal(120, 30, (h, w))).clip(1, 255)
    yy, xx = np.mgrid[0:h, 0:w]
    lab = 1
    for _ in range(n_blobs):
        cy, cx = r.uniform(12, h - 12), r.uniform(12, w - 12)
        ry, rx = r.uniform(4, 18), r.uniform(4, 18)
        ang = r.uniform(0, np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        u = (yy - cy) * ca + (xx - cx) * sa
        v = -(yy - cy) * sa + (xx - cx) * ca
        m = ((u / ry) ** 2 + (v / rx) ** 2 <= 1.0) & (labels == 0)
        if m.sum() < 12:
            continue
        base = r.uniform(400, 40000)
        intens[m] = np.clip(base + r.normal(0, base * 0.15, m.sum()), 1, 65535)
        labels[m] = lab
        lab += 1
    return np.floor(intens).astype(np.uint16), labels


def run_once(intens, labels, runner):
    t0 = time.perf_counter()
    labs, values = runner.run(intens, labels)
    return len(labs), time.perf_counter() - t0


def bench_platform(intens, labels, platform=None):
    """Throughput (ROIs/sec) on a platform; platform=None = default (TPU)."""
    from nyxus_tpu import taxonomy as tx
    from nyxus_tpu.config import EngineConfig
    from nyxus_tpu.pipeline.runner import PairRunner

    cfg = EngineConfig(precision="f32")
    fset = tx.parse_feature_request(FEATURES)
    runner = PairRunner(fset, cfg)
    n, _ = run_once(intens, labels, runner)          # warmup + compile
    times = []
    for _ in range(3):
        _, dt = run_once(intens, labels, runner)
        times.append(dt)
    return n, n / min(times)


def main():
    intens, labels = make_dsb_like()

    # main measurement on the default platform (TPU under axon)
    n, tpu_rps = bench_platform(intens, labels)
    platform = jax.devices()[0].platform

    # baseline: same pipeline on the multicore host CPU in a subprocess
    # (jax can't switch platforms in-process after init).  The number is
    # workload-determined (fixed synth slide + feature list), so it is
    # cached on disk and re-measured only when the workload key changes.
    baseline_rps = None
    if platform != "cpu":
        here = os.path.dirname(os.path.abspath(__file__))
        cache_path = os.path.join(here, ".bench_cpu_baseline.json")
        key = "1024x1024x300:" + ",".join(FEATURES)
        try:
            with open(cache_path) as f:
                c = json.load(f)
            if c.get("key") == key:
                baseline_rps = c["rois_per_sec"]
        except Exception:
            pass
        if baseline_rps is None:
            import subprocess
            code = (
                "import jax; jax.config.update('jax_platforms','cpu');"
                "import bench, json;"
                "i, l = bench.make_dsb_like();"
                "n, rps = bench.bench_platform(i, l);"
                "print('BASELINE', rps)"
            )
            try:
                out = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True,
                    text=True, timeout=3600, cwd=here)
                for line in out.stdout.splitlines():
                    if line.startswith("BASELINE"):
                        baseline_rps = float(line.split()[1])
                if baseline_rps:
                    with open(cache_path, "w") as f:
                        json.dump({"key": key,
                                   "rois_per_sec": baseline_rps}, f)
            except Exception:
                pass

    vs = (tpu_rps / baseline_rps) if baseline_rps else 1.0
    print(json.dumps({
        "metric": "rois_per_sec_device_families_%s" % platform,
        "value": round(tpu_rps, 2),
        "unit": "ROIs/sec (1024x1024 DSB-like slide, %d ROIs, 281 feature columns)" % n,
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
