#!/usr/bin/env python3
"""Derive the feature taxonomy data module from the reference implementation.

The reference (PolusAI/nyxus) defines its public feature-code space in
`src/nyx/featureset.{h,cpp}` (Feature2D/Feature3D/FeatureIMQ enums, user-facing
name maps, group nicknames) and per-calculator feature lists in
`src/nyx/features/*.h` (`featureset = {...}` initializers).  Those names and
integer codes are the public API contract (output column names, feature-request
strings), so we extract them mechanically and emit
`nyxus_tpu/taxonomy/_data.py`.  Only *data* (names/codes/groupings) is
extracted -- all behavior is implemented independently in this repo.

Usage: python tools/gen_taxonomy.py [/root/reference]
"""
import glob
import json
import os
import re
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
NYX = os.path.join(REF, "src", "nyx")
OUT = os.path.join(os.path.dirname(__file__), "..", "nyxus_tpu", "taxonomy", "_data.py")

SENTINELS = {"_COUNT_", "_FIRST_", "__COUNT__", "__FIRST__"}


def parse_enum(src, name):
    """Parse a C++ `enum class NAME { ... };` body into {member: int_value}."""
    m = re.search(r"enum class %s\b[^{]*\{(.*?)\};" % name, src, re.S)
    body = re.sub(r"//.*", "", m.group(1))
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    body = re.sub(r"#if\s+0.*?#endif", "", body, flags=re.S)  # disabled members
    body = re.sub(r"^\s*#.*$", "", body, flags=re.M)  # other preprocessor lines
    body = body.replace("__COUNT_", "_COUNT_")  # FgroupIMQ typo variant
    values = {}
    next_val = 0
    for tok in body.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "=" in tok:
            lhs, rhs = [t.strip() for t in tok.split("=", 1)]
            rhs = rhs.replace("(int)", "").strip()
            if re.match(r"^-?\d+$", rhs):
                next_val = int(rhs)
            elif "::" in rhs:
                en2, mem2 = rhs.split("::")
                en2 = en2.split()[-1].strip()
                next_val = ENUMS[en2][mem2]
            else:
                # alias to a member of the same enum (e.g. _FIRST_ = COV)
                if rhs in values:
                    if lhs not in SENTINELS:
                        values[lhs] = values[rhs]
                    continue
                raise ValueError("unhandled enum rhs: %r" % rhs)
            tok = lhs
        if not re.match(r"^\w+$", tok):
            continue
        if tok in SENTINELS:
            # _COUNT_ still consumes the running value in C++ but adds no code
            if tok.startswith("_COUNT"):
                values["_COUNT_"] = next_val
            continue
        values[tok] = next_val
        next_val += 1
    return values


fs_h = open(os.path.join(NYX, "featureset.h"), errors="replace").read()
ENUMS = {}
for en in ["Feature2D", "Feature3D", "FeatureIMQ", "Fgroup2D", "Fgroup3D", "FgroupIMQ"]:
    ENUMS[en] = parse_enum(fs_h, en)

fs_cpp = open(os.path.join(NYX, "featureset.cpp"), errors="replace").read()
fs_cpp = re.sub(r"#if\s+0.*?#endif", "", fs_cpp, flags=re.S)
name_pairs = re.findall(
    r'\{\s*"([^"]+)"\s*,\s*(?:Nyxus::)?(Feature2D|Feature3D|FeatureIMQ|Fgroup2D|Fgroup3D|FgroupIMQ)::(\w+)\s*\}',
    fs_cpp,
)
NAMES = {en: [] for en in ENUMS}
for disp, en, mem in name_pairs:
    if mem in ENUMS[en]:
        NAMES[en].append((disp, mem))

# per-calculator featureset lists
CLASS_SETS = {}
for f in sorted(glob.glob(os.path.join(NYX, "features", "*.h")) + glob.glob(os.path.join(NYX, "*.h"))):
    src = open(f, errors="replace").read()
    starts = [
        (m.start(), m.group(1))
        for m in re.finditer(r"^\s*class\s+(\w+)", src, re.M)
        if m.group(1) not in ("const", "static")
    ]
    for i, (pos, cls) in enumerate(starts):
        end = starts[i + 1][0] if i + 1 < len(starts) else len(src)
        fm = re.search(r"featureset\s*=\s*\{(.*?)\}\s*;", src[pos:end], re.S)
        if fm:
            codes = re.findall(r"(?:Nyxus::)?(Feature2D|Feature3D|FeatureIMQ)::(\w+)", fm.group(1))
            if codes:
                CLASS_SETS[cls] = [[en, c] for en, c in codes]
# HexagonalityPolygonality declares provides inline (hexagonality_polygonality.cpp)
CLASS_SETS.setdefault(
    "HexagonalityPolygonalityFeature",
    [["Feature2D", "POLYGONALITY_AVE"], ["Feature2D", "HEXAGONALITY_AVE"],
     ["Feature2D", "HEXAGONALITY_STDDEV"]],
)
CLASS_SETS.pop("uses", None)

# nonAngled feature lists for GLCM/GLRLM output shaping
NONANGLED = {}
for cls, hdr in [("GLCMFeature", "features/glcm.h"), ("GLRLMFeature", "features/glrlm.h")]:
    src = open(os.path.join(NYX, hdr), errors="replace").read()
    fm = re.search(r"nonAngledFeatures\s*=\s*\{(.*?)\}\s*;", src, re.S)
    NONANGLED[cls] = [c for _, c in re.findall(r"(?:Nyxus::)?(Feature2D)::(\w+)", fm.group(1))]

with open(os.path.abspath(OUT), "w") as fh:
    fh.write('"""Feature taxonomy data extracted from the reference (see tools/gen_taxonomy.py).\n\n')
    fh.write("Data provenance: /root/reference/src/nyx/featureset.{h,cpp} and\n")
    fh.write("src/nyx/features/*.h featureset initializers.  Auto-generated; do not edit.\n")
    fh.write('"""\n\n')
    for en in ["Feature2D", "Feature3D", "FeatureIMQ", "Fgroup2D", "Fgroup3D", "FgroupIMQ"]:
        vals = {k: v for k, v in ENUMS[en].items() if k != "_COUNT_"}
        fh.write("%s_CODES = %s\n\n" % (en.upper(), json.dumps(vals, indent=0)))
        fh.write("%s_COUNT = %d\n\n" % (en.upper(), ENUMS[en]["_COUNT_"]))
        fh.write("%s_NAMES = %s\n\n" % (en.upper(), json.dumps(NAMES[en], indent=0)))
    fh.write("CLASS_FEATURESETS = %s\n\n" % json.dumps(CLASS_SETS, indent=0))
    fh.write("NONANGLED = %s\n" % json.dumps(NONANGLED, indent=0))

print("wrote", os.path.abspath(OUT))
for en in ENUMS:
    print(en, len(ENUMS[en]) - 1, "codes; count =", ENUMS[en]["_COUNT_"])
