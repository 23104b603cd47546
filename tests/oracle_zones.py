"""Independent numpy oracle for GLSZM/GLDZM: literal re-enactment of the
reference's backtracking zone scan (E/SE/S/SW moves, raster seeds)."""

import numpy as np

from oracle_fastlog import fast_log2

EPS = 2.2e-16  # glszm.h:138 (GLDZM ZDE keeps its own)


def bin_matlab_img(img, n):
    vmax = img.max()
    out = np.ones_like(img, dtype=np.int64)
    nz = img != 0
    out[nz] = np.clip(np.floor(n / vmax * img[nz] + 1.0).astype(np.int64), 1, n)
    return out


def scan_zones(lev, valid, moves=None):
    """Returns list of (level, [pixels]) zones via the directed DFS.
    Default moves: GLSZM's E/SE/S/SW; GLDZM passes the 4-connected set."""
    h, w = lev.shape
    visited = np.zeros_like(lev, dtype=bool)
    zones = []
    if moves is None:
        moves = [(0, 1), (1, 1), (1, 0), (1, -1)]  # E, SE, S, SW as (dy, dx)
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or visited[r, c]:
                continue
            pi = lev[r, c]
            visited[r, c] = True
            pixels = [(r, c)]
            stack = []
            y, x = r, c
            while True:
                moved = False
                for dy, dx in moves:
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and valid[yy, xx] \
                            and not visited[yy, xx] and lev[yy, xx] == pi:
                        visited[yy, xx] = True
                        pixels.append((yy, xx))
                        stack.append((y, x))
                        y, x = yy, xx
                        moved = True
                        break
                if moved:
                    continue
                if stack:
                    y, x = stack.pop()
                    continue
                break
            zones.append((pi, pixels))
    return zones


def dist2border(lev, y, x):
    """1 + steps to nearest zero level or AABB margin (gldzm.cpp:306-352)."""
    h, w = lev.shape
    d2l = 0
    for x0 in range(x - 1, -1, -1):
        if lev[y, x0] == 0 or x0 == 0:
            d2l = x - x0
            break
    d2r = 0
    for x0 in range(x + 1, w):
        if lev[y, x0] == 0 or x0 == w - 1:
            d2r = x0 - x
            break
    d2t = 0
    for y0 in range(y - 1, -1, -1):
        if lev[y0, x] == 0 or y0 == 0:
            d2t = y - y0
            break
    d2b = 0
    for y0 in range(y + 1, h):
        if lev[y0, x] == 0 or y0 == h - 1:
            d2b = y0 - y
            break
    return max(min(d2l + 1, d2r + 1, d2t + 1, d2b + 1), 1)


def glszm_features(crop, n_levels, noval=-0.0):
    """crop: AABB with off-ROI = 0 (MATLAB binning)."""
    if crop.max() == crop.min():
        return None
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    zones = scan_zones(lev, np.ones_like(lev, bool))
    nz = len(zones)
    np_pix = lev.size  # MATLAB mode: all AABB pixels get visited
    levels = np.array([z[0] for z in zones], np.float64)
    sizes = np.array([len(z[1]) for z in zones], np.float64)
    out = {}
    out["GLSZM_SAE"] = (1 / sizes**2).sum() / nz
    out["GLSZM_LAE"] = (sizes**2).sum() / nz
    from collections import Counter
    cl = Counter(levels)
    out["GLSZM_GLN"] = sum(c * c for c in cl.values()) / nz
    out["GLSZM_GLNN"] = out["GLSZM_GLN"] / nz
    cs = Counter(sizes)
    out["GLSZM_SZN"] = sum(c * c for c in cs.values()) / nz
    out["GLSZM_SZNN"] = out["GLSZM_SZN"] / nz
    out["GLSZM_ZP"] = nz / np_pix
    mu = levels.mean()
    out["GLSZM_GLV"] = ((levels - mu) ** 2).mean()
    muz = sizes.mean()
    out["GLSZM_ZV"] = ((sizes - muz) ** 2).mean()
    cc = Counter(zip(levels, sizes))
    out["GLSZM_ZE"] = -sum(c / nz * fast_log2(c / nz + EPS) for c in cc.values())
    out["GLSZM_LGLZE"] = (1 / levels**2).mean()
    out["GLSZM_HGLZE"] = (levels**2).mean()
    out["GLSZM_SALGLE"] = (1 / levels**2 / sizes**2).mean()
    out["GLSZM_SAHGLE"] = (levels**2 / sizes**2).mean()
    out["GLSZM_LALGLE"] = (sizes**2 / levels**2).mean()
    out["GLSZM_LAHGLE"] = (levels**2 * sizes**2).mean()
    return out


def gldzm_features(crop, roi_area, n_levels):
    if crop.max() == crop.min():
        return None
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    # GLDZM zones: FULL 4-connected flood fill (E/S/W/N, gldzm.cpp:121-210)
    zones = scan_zones(lev, np.ones_like(lev, bool),
                       moves=[(0, 1), (1, 0), (0, -1), (-1, 0)])
    levels = np.array([z[0] for z in zones], np.float64)
    dists = np.array([min(dist2border(lev, y, x) for y, x in z[1])
                      for z in zones], np.float64)
    ns = len(zones)  # MATLAB: no zero-grey zones
    out = {}
    out["GLDZM_SDE"] = (1 / dists**2).mean()
    out["GLDZM_LDE"] = (dists**2).mean()
    out["GLDZM_LGLZE"] = (1 / levels**2).mean()
    out["GLDZM_HGLZE"] = (levels**2).mean()
    out["GLDZM_SDLGLE"] = (1 / levels**2 / dists**2).mean()
    out["GLDZM_SDHGLE"] = (levels**2 / dists**2).mean()
    out["GLDZM_LDLGLE"] = (dists**2 / levels**2).mean()
    out["GLDZM_LDHGLE"] = (levels**2 * dists**2).mean()
    from collections import Counter
    cl = Counter(levels)
    out["GLDZM_GLNU"] = sum(c * c for c in cl.values()) / ns
    out["GLDZM_GLNUN"] = out["GLDZM_GLNU"] / ns
    cd = Counter(dists)
    out["GLDZM_ZDNU"] = sum(c * c for c in cd.values()) / ns
    out["GLDZM_ZDNUN"] = out["GLDZM_ZDNU"] / ns
    out["GLDZM_ZP"] = ns / roi_area
    out["GLDZM_GLM"] = levels.mean()
    out["GLDZM_GLV"] = ((levels - levels.mean()) ** 2).mean()
    out["GLDZM_ZDM"] = dists.mean()
    out["GLDZM_ZDV"] = ((dists - dists.mean()) ** 2).mean()
    cc = Counter(zip(levels, dists))
    zde = -sum(c / ns * np.log2(c / ns + EPS) for c in cc.values())
    out["GLDZM_ZDE"] = zde
    return out
