#!/usr/bin/env python3
"""Extract pinned golden-value tables from the reference's GTest headers.

The reference pins IBSI reference-table values and pyradiomics/skimage/
MATLAB golden values as `std::unordered_map<std::string, double>` literals
in tests/test_*_{ibsi,pyradiomics,regression}.h.  Those numbers ARE the
shared public contract (IBSI consensus values, third-party oracle outputs),
so they are extracted mechanically — data only, no logic — into
tests/goldens_ref.py with per-table provenance.

Usage: python tools/gen_goldens.py [/root/reference/tests] [out.py]
"""

import os
import re
import sys

MAP_RE = re.compile(
    r"unordered_map\s*<\s*std::string\s*,\s*double\s*>\s*(\w+)\s*"
    r"(?:=\s*)?\{(.*?)\};",
    re.S)
ENTRY_RE = re.compile(r'\{\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)\s*\}')


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests"
    out = (sys.argv[2] if len(sys.argv) > 2 else
           os.path.join(os.path.dirname(os.path.dirname(
               os.path.abspath(__file__))), "tests", "goldens_ref.py"))
    tables = {}
    for fn in sorted(os.listdir(src)):
        if not (fn.startswith("test_") and fn.endswith(".h")):
            continue
        text = open(os.path.join(src, fn), errors="replace").read()
        for m in MAP_RE.finditer(text):
            name, body = m.group(1), m.group(2)
            entries = {k: float(v) for k, v in ENTRY_RE.findall(body)}
            if entries:
                tables.setdefault(fn, {})[name] = entries
    with open(out, "w") as f:
        f.write('"""Golden feature values pinned by the reference test '
                'suite.\n\nMechanically extracted from /root/reference/'
                'tests/test_*.h by tools/gen_goldens.py.\nThese are IBSI '
                'consensus-table values and third-party oracle outputs\n'
                '(pyradiomics, skimage, MATLAB, FracLac) — the numeric '
                'contract this engine\nmust satisfy.  Do not edit by hand; '
                'regenerate instead.\n"""\n\n')
        f.write("GOLDENS = {\n")
        for fn in sorted(tables):
            for name in sorted(tables[fn]):
                f.write('    # %s\n' % fn)
                f.write('    "%s": {\n' % name)
                for k in sorted(tables[fn][name]):
                    f.write('        "%s": %r,\n' % (k, tables[fn][name][k]))
                f.write("    },\n")
        f.write("}\n")
    n = sum(len(v) for t in tables.values() for v in t.values())
    print("wrote %s: %d tables, %d pinned values"
          % (out, sum(len(t) for t in tables.values()), n))


if __name__ == "__main__":
    main()
