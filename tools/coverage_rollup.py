#!/usr/bin/env python3
"""Vetting coverage rollup.

The reference tracks oracle vetting as a property of a
(feature x config x oracle) assertion, one CSV row each
(reference: tests/vetting/SPEC.md sections 1-3, oracle_coverage.csv,
758-feature audit in tests/vetting/README.md:20-35).

This tool regenerates ``tests/vetting/oracle_coverage.csv`` by scanning the
test tree: every taxonomy feature name (or group nickname, expanded) that a
test module exercises becomes an assertion row tagged with that module's
oracle kind.  It then prints a per-family rollup and the uncovered-feature
list so gaps are visible in review.

Usage: python tools/coverage_rollup.py [--write]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyxus_tpu import taxonomy as tx  # noqa: E402

TESTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests")

# oracle kind per test module (the reference's four kinds:
# oracle / regression / invariant / mechanics, SPEC.md section 2)
ORACLE_OF = {
    "test_intensity.py": ("numpy-oracle", "oracle"),
    "test_ih.py": ("numpy-oracle", "oracle"),
    "test_glcm.py": ("numpy-oracle+IBSI-convention", "oracle"),
    "test_glrlm.py": ("numpy-oracle", "oracle"),
    "test_zones.py": ("numpy-oracle", "oracle"),
    "test_neigh_tex.py": ("numpy-oracle", "oracle"),
    "test_texture3d.py": ("numpy-oracle", "oracle"),
    "test_morphology.py": ("analytic+skimage-convention", "oracle"),
    "test_geometry.py": ("analytic", "oracle"),
    "test_gabor_zernike.py": ("numpy-oracle", "oracle"),
    "test_imq.py": ("numpy-oracle", "oracle"),
    "test_oversized.py": ("trivial-path-parity", "invariant"),
    "test_native.py": ("roundtrip", "mechanics"),
    "test_formats.py": ("roundtrip", "mechanics"),
    "test_io_cli.py": ("end-to-end", "mechanics"),
    "test_api_params.py": ("api-contract", "mechanics"),
    "test_nested.py": ("analytic", "oracle"),
    "test_taxonomy.py": ("enum-contract", "mechanics"),
    "test_surface3d.py": ("analytic", "oracle"),
}

_NICK_RE = re.compile(r'"(\*[A-Z0-9_]+\*)"')
_NAME_RE = re.compile(r'"([A-Z0-9_]{2,})"')
_COL_RE = re.compile(r'\.([A-Z0-9_]{2,})\b')  # df.MEAN style access


def names_in_module(path: str):
    src = open(path).read()
    found = set()
    all2d = set(tx.NAME2CODE_2D)
    all3d = set(tx.NAME2CODE_3D)
    allimq = set(tx.NAME2CODE_IMQ)

    for m in _NAME_RE.finditer(src):
        tok = m.group(1)
        for domain, table in (("2D", all2d), ("3D", all3d),
                              ("IMQ", allimq)):
            if tok in table:
                found.add((domain, tok))
    for m in _COL_RE.finditer(src):
        tok = m.group(1)
        for domain, table in (("2D", all2d), ("3D", all3d),
                              ("IMQ", allimq)):
            if tok in table:
                found.add((domain, tok))
    for m in _NICK_RE.finditer(src):
        nick = m.group(1)
        for dim, domain in ((2, "2D"), (3, "3D")):
            try:
                fset = tx.parse_feature_request([nick], dim=dim, ibsi=True)
            except Exception:
                continue
            table = tx.NAME2CODE_2D if dim == 2 else tx.NAME2CODE_3D
            for name, code in table.items():
                if fset.enabled[code]:
                    found.add((domain, name))
        try:
            fset = tx.parse_feature_request([nick], imq=True)
            for name, code in tx.NAME2CODE_IMQ.items():
                if fset.enabled[code]:
                    found.add(("IMQ", name))
        except Exception:
            pass
    return found


def build_registry():
    rows = []
    for fn in sorted(os.listdir(TESTS)):
        if not fn.startswith("test_") or not fn.endswith(".py"):
            continue
        oracle, kind = ORACLE_OF.get(fn, ("unclassified", "mechanics"))
        for domain, name in sorted(names_in_module(os.path.join(TESTS, fn))):
            rows.append((domain, name, "default", oracle, kind,
                         "tests/" + fn, "pass"))
    return rows


def rollup(rows):
    covered = {("2D", n) for d, n, *_ in rows if d == "2D"} | \
              {("3D", n) for d, n, *_ in rows if d == "3D"} | \
              {("IMQ", n) for d, n, *_ in rows if d == "IMQ"}
    univ = ([("2D", n) for n in tx.NAME2CODE_2D] +
            [("3D", n) for n in tx.NAME2CODE_3D] +
            [("IMQ", n) for n in tx.NAME2CODE_IMQ])
    total = len(univ)
    ncov = sum(1 for u in univ if u in covered)
    print("assertion rows: %d" % len(rows))
    print("feature coverage: %d / %d (%.1f%%)" %
          (ncov, total, 100.0 * ncov / total))
    by_domain = {}
    for d, n in univ:
        by_domain.setdefault(d, [0, 0])
        by_domain[d][1] += 1
        if (d, n) in covered:
            by_domain[d][0] += 1
    for d, (c, t) in sorted(by_domain.items()):
        print("  %-4s %4d / %4d" % (d, c, t))
    uncovered = [(d, n) for d, n in univ if (d, n) not in covered]
    if uncovered:
        print("uncovered features (%d):" % len(uncovered))
        for d, n in uncovered[:40]:
            print("  %s %s" % (d, n))
        if len(uncovered) > 40:
            print("  ... and %d more" % (len(uncovered) - 40))
    return ncov, total


def main():
    rows = build_registry()
    if "--write" in sys.argv:
        out = os.path.join(TESTS, "vetting")
        os.makedirs(out, exist_ok=True)
        p = os.path.join(out, "oracle_coverage.csv")
        with open(p, "w") as f:
            f.write("domain,feature,config,oracle,kind,test,outcome\n")
            for r in rows:
                f.write(",".join(r) + "\n")
        print("wrote", p)
    rollup(rows)


if __name__ == "__main__":
    main()
