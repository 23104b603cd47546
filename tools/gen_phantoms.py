#!/usr/bin/env python3
"""Extract the reference's test phantom pixel arrays into numpy form.

The IBSI digital phantom slices and other `NyxusPixel {x, y, intensity}`
fixtures in /root/reference/tests/test_data.h are public IBSI/third-party
test data (IBSI Documentation digital phantom, IBSI figure samples); this
extracts them — data only — into tests/phantoms_ref.py as dense 2D arrays.

Usage: python tools/gen_phantoms.py
"""

import os
import re
import sys

ARR_RE = re.compile(
    r"const\s+static\s+NyxusPixel\s+(\w+)\s*\[\]\s*=?\s*\{(.*?)\};", re.S)
PX_RE = re.compile(r"\{\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\}")

WANTED = [
    "ibsi_phantom_z1_intensity", "ibsi_phantom_z2_intensity",
    "ibsi_phantom_z3_intensity", "ibsi_phantom_z4_intensity",
    "ibsi_phantom_z1_mask", "ibsi_phantom_z2_mask",
    "ibsi_phantom_z3_mask", "ibsi_phantom_z4_mask",
    "ibsi_fig3_19_ngldm_sample_image_int",
    "ibsi_fig3_19_ngldm_sample_image_mask",
    "nonibsi_rayryeng_ngldm_sample_image_int",
    "nonibsi_rayryeng_ngldm_sample_image_mask",
    "ibsi_fig3_17a_gldzm_sample_image_int",
    "ibsi_fig3_17a_gldzm_sample_image_mask",
    "shape2d_morphology_intensity", "shape2d_morphology_mask",
    "pixelIntensityFeaturesTestData",
    "im_quality_intensity", "im_quality_mask",
]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/test_data.h"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "phantoms_ref.py")
    text = open(src, errors="replace").read()
    arrays = {}
    for m in ARR_RE.finditer(text):
        name = m.group(1)
        if name not in WANTED:
            continue
        px = [(int(x), int(y), int(v)) for x, y, v in
              PX_RE.findall(m.group(2))]
        arrays[name] = px
    with open(out, "w") as f:
        f.write('"""Reference test phantoms (IBSI digital phantom et al.) '
                'as dense arrays.\n\nMechanically extracted from '
                '/root/reference/tests/test_data.h by\n'
                'tools/gen_phantoms.py.  Pixel lists are {x, y, intensity} '
                'with 1-based or\n0-based coords as in the source; '
                '``grid()`` densifies.\n"""\n\n'
                'import numpy as np\n\n\n'
                'def grid(pixels):\n'
                '    """[(x, y, v), ...] -> dense [H, W] array anchored at '
                'min coords."""\n'
                '    xs = [p[0] for p in pixels]\n'
                '    ys = [p[1] for p in pixels]\n'
                '    x0, y0 = min(xs), min(ys)\n'
                '    a = np.zeros((max(ys) - y0 + 1, max(xs) - x0 + 1), '
                'np.int64)\n'
                '    for x, y, v in pixels:\n'
                '        a[y - y0, x - x0] = v\n'
                '    return a\n\n\n')
        f.write("PIXELS = {\n")
        for name in WANTED:
            if name not in arrays:
                continue
            f.write('    "%s": [\n' % name)
            px = arrays[name]
            for i in range(0, len(px), 8):
                f.write("        " + ", ".join("(%d, %d, %d)" % p
                                               for p in px[i:i + 8]) + ",\n")
            f.write("    ],\n")
        f.write("}\n")
    print("wrote %s: %d arrays" % (out, len(arrays)))


if __name__ == "__main__":
    main()
