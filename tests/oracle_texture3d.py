"""Independent numpy oracles for the 3D texture families (MATLAB-binning mode).

Brute-force voxel loops mirroring the reference implementations:
src/nyx/features/3d_{glcm,glrlm,glszm,gldzm,gldm,ngldm,ngtdm}.cpp.
"""

import numpy as np

from oracle_fastlog import fast_log2

EPS = 2.2e-16  # 3d_*.h

# (dx, dy, dz) -- 3d_glcm.cpp:16-31
GLCM_SHIFTS = [(1, 1, 1), (1, 1, 0), (1, 1, -1), (1, 0, 1), (1, 0, 0),
               (1, 0, -1), (1, -1, 1), (1, -1, 0), (1, -1, -1), (0, 1, 1),
               (0, 1, 0), (0, 1, -1), (0, 0, 1)]
# (dz, dy, dx) -- 3d_glrlm.cpp:17-33
GLRLM_SHIFTS = [(1, 1, 1), (1, 1, 0), (1, 1, -1), (1, 0, 1), (1, 0, 0),
                (1, 0, -1), (1, -1, 1), (1, -1, 0), (1, -1, -1), (0, 1, 1),
                (0, 1, 0), (0, 1, -1), (0, 0, 1)]

# 3d_ngldm.cpp:12-40's shift table omits the axial (0,0,+-1) pair: the 3D
# NGLDM neighborhood is 24 voxels, not 26 (unlike 3d_gldm.cpp:16-48)
N26 = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
       for dx in (-1, 0, 1) if (dz, dy, dx) != (0, 0, 0)]
N24_NGLDM = [s for s in N26 if not (s[1] == 0 and s[2] == 0)]
N6 = [(0, 0, 1), (0, 0, -1), (0, 1, 0), (0, -1, 0), (1, 0, 0), (-1, 0, 0)]


def bin_matlab_img(img, n):
    """MATLAB grey binning: 0 -> 1, else clamp(floor(n/max*x + 1), 1, n)."""
    vmax = img.max()
    out = np.ones_like(img, dtype=np.int64)
    nz = img != 0
    out[nz] = np.clip(np.floor(n / vmax * img[nz] + 1.0).astype(np.int64), 1, n)
    return out


# ---------------------------------------------------------------------------
# GLCM (3d_glcm.cpp:268-377): matlab mode counts EVERY in-cube voxel pair
# (background participates as level 1); not symmetric in matlab mode.


def glcm3d_matrix(lev, shift, offset, ng):
    dx, dy, dz = shift
    dx, dy, dz = dx * offset, dy * offset, dz * offset
    D, H, W = lev.shape
    M = np.zeros((ng, ng))
    for z in range(D):
        for y in range(H):
            for x in range(W):
                zz, yy, xx = z + dz, y + dy, x + dx
                if 0 <= zz < D and 0 <= yy < H and 0 <= xx < W:
                    a = lev[zz, yy, xx] - 1      # neighbor
                    b = lev[z, y, x] - 1         # center
                    M[a, b] += 1
    return M


# ---------------------------------------------------------------------------
# GLRLM (3d_glrlm.cpp:34-260): maximal runs along 13 directions


def glrlm3d_matrix(lev, shift, ng, nr):
    dz, dy, dx = shift
    D, H, W = lev.shape
    seen = np.zeros(lev.shape, bool)
    P = np.zeros((ng, nr))
    for z in range(D):
        for y in range(H):
            for x in range(W):
                if seen[z, y, x] or lev[z, y, x] == 0:
                    continue
                pi = lev[z, y, x]
                seen[z, y, x] = True
                length = 1
                zz, yy, xx = z, y, x
                while True:
                    z2, y2, x2 = zz + dz, yy + dy, xx + dx
                    if 0 <= z2 < D and 0 <= y2 < H and 0 <= x2 < W \
                            and not seen[z2, y2, x2] and lev[z2, y2, x2] == pi:
                        seen[z2, y2, x2] = True
                        length += 1
                        zz, yy, xx = z2, y2, x2
                    else:
                        break
                P[pi - 1, min(length, nr) - 1] += 1
    return P


# ---------------------------------------------------------------------------
# connected components (shared by GLSZM 26-conn / GLDZM 6-conn)


def _components(lev, valid, neighborhood):
    D, H, W = lev.shape
    seen = np.zeros(lev.shape, bool)
    comps = []
    for z in range(D):
        for y in range(H):
            for x in range(W):
                if not valid[z, y, x] or seen[z, y, x]:
                    continue
                pi = lev[z, y, x]
                stack = [(z, y, x)]
                seen[z, y, x] = True
                members = []
                while stack:
                    cz, cy, cx = stack.pop()
                    members.append((cz, cy, cx))
                    for dz, dy, dx in neighborhood:
                        z2, y2, x2 = cz + dz, cy + dy, cx + dx
                        if 0 <= z2 < D and 0 <= y2 < H and 0 <= x2 < W \
                                and valid[z2, y2, x2] and not seen[z2, y2, x2] \
                                and lev[z2, y2, x2] == pi:
                            seen[z2, y2, x2] = True
                            stack.append((z2, y2, x2))
                comps.append((pi, members))
    return comps


def glszm3d_features(crop, roi_voxels, n_levels, noval=-0.0):
    """crop: AABB cube, off-ROI = 0.  zeroI=1: level-1 voxels excluded
    (3d_glszm.cpp:517-521); Np = ROI voxel count (:529)."""
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    comps = _components(lev, lev != 1, N26)
    if not comps:
        return None
    zl = np.array([c[0] for c in comps], np.float64)
    zs = np.array([len(c[1]) for c in comps], np.float64)
    s = len(comps)
    out = {}
    out["GLSZM_SAE"] = (1.0 / zs**2).sum() / s
    out["GLSZM_LAE"] = (zs**2).sum() / s
    out["GLSZM_ZP"] = s / float(roi_voxels)
    mu_g = zl.sum() / s
    out["GLSZM_GLV"] = ((zl - mu_g) ** 2).sum() / s
    mu_z = zs.sum() / s
    out["GLSZM_ZV"] = ((zs - mu_z) ** 2).sum() / s
    out["GLSZM_LGLZE"] = (1.0 / zl**2).sum() / s
    out["GLSZM_HGLZE"] = (zl**2).sum() / s
    out["GLSZM_SALGLE"] = (1.0 / (zl**2 * zs**2)).sum() / s
    out["GLSZM_SAHGLE"] = (zl**2 / zs**2).sum() / s
    out["GLSZM_LALGLE"] = (zs**2 / zl**2).sum() / s
    out["GLSZM_LAHGLE"] = (zl**2 * zs**2).sum() / s
    # non-uniformities over grouped counts
    import collections
    cl = collections.Counter(zl)
    out["GLSZM_GLN"] = sum(v * v for v in cl.values()) / s
    out["GLSZM_GLNN"] = out["GLSZM_GLN"] / s
    cs = collections.Counter(zs)
    out["GLSZM_SZN"] = sum(v * v for v in cs.values()) / s
    out["GLSZM_SZNN"] = out["GLSZM_SZN"] / s
    cc = collections.Counter(zip(zl, zs))
    out["GLSZM_ZE"] = -sum(v * fast_log2(v / s + EPS)
                           for v in cc.values()) / s
    return out


def _dist2border_inplane(lev, z, y, x):
    """In-plane 4-ray scan to the first 0 voxel or cube margin
    (3d_gldzm.cpp:330-375)."""
    D, H, W = lev.shape
    dl = 0
    for x0 in range(x - 1, -1, -1):
        if lev[z, y, x0] == 0 or x0 == 0:
            dl = x - x0
            break
    dr = 0
    for x0 in range(x + 1, W):
        if lev[z, y, x0] == 0 or x0 == W - 1:
            dr = x0 - x
            break
    dt = 0
    for y0 in range(y - 1, -1, -1):
        if lev[z, y0, x] == 0 or y0 == 0:
            dt = y - y0
            break
    db = 0
    for y0 in range(y + 1, H):
        if lev[z, y0, x] == 0 or y0 == H - 1:
            db = y0 - y
            break
    d = min(dl + 1, dr + 1, dt + 1, db + 1)
    return max(d, 1)


def gldzm3d_features(crop, roi_voxels, n_levels, noval=-0.0):
    """6-connected zones over ALL cube voxels (matlab mode keeps background);
    zone distance = min member in-plane dist2border."""
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    comps = _components(lev, np.ones(lev.shape, bool), N6)
    zones = []
    for pi, members in comps:
        dmin = min(_dist2border_inplane(lev, z, y, x) for z, y, x in members)
        zones.append((float(pi), float(dmin)))
    zones = [(g, d) for g, d in zones if g > 0]
    if not zones:
        return None
    zl = np.array([z[0] for z in zones])
    zd = np.array([z[1] for z in zones])
    s = len(zones)
    out = {}
    out["GLDZM_SDE"] = (1.0 / zd**2).sum() / s
    out["GLDZM_LDE"] = (zd**2).sum() / s
    out["GLDZM_LGLZE"] = (1.0 / zl**2).sum() / s
    out["GLDZM_HGLZE"] = (zl**2).sum() / s
    out["GLDZM_SDLGLE"] = (1.0 / (zl**2 * zd**2)).sum() / s
    out["GLDZM_SDHGLE"] = (zl**2 / zd**2).sum() / s
    out["GLDZM_LDLGLE"] = (zd**2 / zl**2).sum() / s
    out["GLDZM_LDHGLE"] = (zl**2 * zd**2).sum() / s
    import collections
    cg = collections.Counter(zl)
    out["GLDZM_GLNU"] = sum(v * v for v in cg.values()) / s
    out["GLDZM_GLNUN"] = out["GLDZM_GLNU"] / s
    cd = collections.Counter(zd)
    out["GLDZM_ZDNU"] = sum(v * v for v in cd.values()) / s
    out["GLDZM_ZDNUN"] = out["GLDZM_ZDNU"] / s
    out["GLDZM_ZP"] = s / float(roi_voxels)
    glm = zl.sum() / s
    out["GLDZM_GLM"] = glm
    zdm = zd.sum() / s
    out["GLDZM_ZDM"] = zdm
    out["GLDZM_GLV"] = ((zl - glm) ** 2).sum() / s
    out["GLDZM_ZDV"] = ((zd - zdm) ** 2).sum() / s
    cc = collections.Counter(zip(zl, zd))
    out["GLDZM_ZDE"] = -sum(v * np.log2(v / s + EPS) for v in cc.values()) / s
    return out


# ---------------------------------------------------------------------------
# GLDM (3d_gldm.cpp:120-230): 26-neighbor dependence; matlab zeroI=1 skips
# level-1 centers; neighbor equality on binned levels


def gldm3d_features(crop, n_levels):
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    D, H, W = lev.shape
    ng, nd_max = n_levels, 27
    P = np.zeros((ng, nd_max))
    for z in range(D):
        for y in range(H):
            for x in range(W):
                if lev[z, y, x] == 1:   # zeroI (matlab)
                    continue
                nd = 1
                for dz, dy, dx in N26:
                    z2, y2, x2 = z + dz, y + dy, x + dx
                    if 0 <= z2 < D and 0 <= y2 < H and 0 <= x2 < W \
                            and lev[z2, y2, x2] == lev[z, y, x]:
                        nd += 1
                P[lev[z, y, x] - 1, nd - 1] += 1
    nz = P.sum()
    if nz == 0:
        return None
    ival = np.arange(1, ng + 1, dtype=np.float64)
    jval = np.arange(1, nd_max + 1, dtype=np.float64)
    si, sj = P.sum(1), P.sum(0)
    out = {}
    out["GLDM_SDE"] = (sj / jval**2).sum() / nz
    out["GLDM_LDE"] = (sj * jval**2).sum() / nz
    out["GLDM_GLN"] = (si**2).sum() / nz
    out["GLDM_DN"] = (sj**2).sum() / nz
    out["GLDM_DNN"] = (sj**2).sum() / nz**2
    mu = (si * ival).sum() / nz
    out["GLDM_GLV"] = (si * (ival - mu) ** 2).sum() / nz
    mud = (sj * jval).sum() / nz
    out["GLDM_DV"] = (sj * (jval - mud) ** 2).sum() / nz
    p = P / nz
    out["GLDM_DE"] = -(p * fast_log2(p + EPS)).sum()
    out["GLDM_LGLE"] = (si / ival**2).sum() / nz
    out["GLDM_HGLE"] = (si * ival**2).sum() / nz
    out["GLDM_SDLGLE"] = (P / ival[:, None]**2 / jval[None, :]**2).sum() / nz
    out["GLDM_SDHGLE"] = (P * ival[:, None]**2 / jval[None, :]**2).sum() / nz
    out["GLDM_LDLGLE"] = (P / ival[:, None]**2 * jval[None, :]**2).sum() / nz
    out["GLDM_LDHGLE"] = (P * ival[:, None]**2 * jval[None, :]**2).sum() / nz
    return out


# ---------------------------------------------------------------------------
# NGTDM (3d_ngtdm.cpp:69-262): Chebyshev window, matlab zeroI=1 center skip,
# ALL in-bounds neighbors contribute


def ngtdm3d_features(crop, n_levels, radius=1):
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    D, H, W = lev.shape
    uniq = np.unique(lev)
    if len(uniq) < 2:
        return None
    nb = n_levels + 1
    N = np.zeros(nb)
    S = np.zeros(nb)
    for z in range(D):
        for y in range(H):
            for x in range(W):
                pi = lev[z, y, x]
                if pi == 1:     # zeroI (matlab)
                    continue
                neigs, nd = 0.0, 0
                for dz in range(-radius, radius + 1):
                    for dy in range(-radius, radius + 1):
                        for dx in range(-radius, radius + 1):
                            if (dz, dy, dx) == (0, 0, 0):
                                continue
                            z2, y2, x2 = z + dz, y + dy, x + dx
                            if 0 <= z2 < D and 0 <= y2 < H and 0 <= x2 < W:
                                neigs += lev[z2, y2, x2]
                                nd += 1
                if nd > 0:
                    N[pi] += 1
                    S[pi] += abs(pi - neigs / nd)
    nvc = N.sum()
    if nvc == 0:
        return None
    P = N / nvc
    ngp = len(uniq)           # Ngp = |U| incl. the background level
    ival = np.arange(nb, dtype=np.float64)
    out = {}
    out["NGTDM_COARSENESS"] = 1.0 / (P * S).sum()
    dij2 = (ival[:, None] - ival[None, :]) ** 2
    ngp_p2 = ngp * (ngp - 1) if ngp > 1 else ngp
    out["NGTDM_CONTRAST"] = ((P[:, None] * P[None, :] * dij2).sum() / ngp_p2
                             * (S.sum() / nvc))
    both = (P[:, None] != 0) & (P[None, :] != 0)
    pii = P * ival
    den = np.abs(pii[:, None] - pii[None, :])[both].sum()
    out["NGTDM_BUSYNESS"] = 0.0 if (ngp == 1 or den == 0) else (P * S).sum() / den
    ps = P * S
    with np.errstate(invalid="ignore", divide="ignore"):
        cm = np.abs(ival[:, None] - ival[None, :]) * (ps[:, None] + ps[None, :]) \
            / (P[:, None] + P[None, :])
    out["NGTDM_COMPLEXITY"] = cm[both].sum() / nvc
    out["NGTDM_STRENGTH"] = ((P[:, None] + P[None, :]) * dij2)[both].sum() / S.sum()
    return out


# ---------------------------------------------------------------------------
# NGLDM (3d_ngldm.cpp): interior voxels, no background skip, faithful quirks


def ngldm3d_features(crop, n_levels):
    vmax = crop.max()
    lev = np.floor(crop.astype(np.float64) * n_levels / vmax).astype(np.int64)
    D, H, W = lev.shape
    U = np.unique(lev)                               # whole-cube unique
    ordinal = {v: i + 1 for i, v in enumerate(U)}    # 1-based rank in U
    P = np.zeros((len(U), 27))
    uidx = {v: i for i, v in enumerate(U)}
    for z in range(1, D - 1):
        for y in range(1, H - 1):
            for x in range(1, W - 1):
                m = 0
                for dz, dy, dx in N24_NGLDM:
                    z2, y2, x2 = z + dz, y + dy, x + dx
                    if 0 <= z2 < D and 0 <= y2 < H and 0 <= x2 < W \
                            and lev[z2, y2, x2] == lev[z, y, x]:
                        m += 1
                P[uidx[lev[z, y, x]], m] += 1
    ns = P.sum()
    if ns == 0:
        return None
    out = {k: 0.0 for k in
           ["NGLDM_LDE", "NGLDM_HDE", "NGLDM_LGLCE", "NGLDM_HGLCE",
            "NGLDM_LDLGLE", "NGLDM_LDHGLE", "NGLDM_HDLGLE", "NGLDM_HDHGLE",
            "NGLDM_GLNU", "NGLDM_GLNUN", "NGLDM_DCNU", "NGLDM_DCNUN",
            "NGLDM_GLM", "NGLDM_DCM", "NGLDM_GLV", "NGLDM_DCV",
            "NGLDM_DCENT", "NGLDM_DCENE"]}
    for i, v in enumerate(U):
        sj = 0.0
        for j in range(1, 27):
            sij = P[i, j]
            k = j + 1
            pij = sij / ns
            out["NGLDM_LDE"] += sij / j / j
            out["NGLDM_HDE"] += sij * j * j
            if v != 0:
                out["NGLDM_LGLCE"] += sij / v / v
            out["NGLDM_HGLCE"] += sij * v * v
            if v != 0:
                out["NGLDM_LDLGLE"] += sij / j / j / v / v
            out["NGLDM_LDHGLE"] += sij * v * v / k / k
            if v != 0:
                out["NGLDM_HDLGLE"] += sij * k * k / v / v
            out["NGLDM_HDHGLE"] += sij * k * k * v * v
            out["NGLDM_GLM"] += v * pij
            out["NGLDM_DCM"] += k * pij
            if pij > 0:
                out["NGLDM_DCENT"] -= pij * np.log2(pij)
            out["NGLDM_DCENE"] += pij * pij
            sj += sij
        out["NGLDM_GLNU"] += sj * sj
        out["NGLDM_GLNUN"] += sj * sj
        out["NGLDM_DCNU"] += sj * sj       # faithful: re-sums rows
        out["NGLDM_DCNUN"] += sj * sj
    for i, v in enumerate(U):
        for j in range(1, 27):
            pij = P[i, j] / ns
            k = j + 1
            out["NGLDM_GLV"] += (ordinal[v] - out["NGLDM_GLM"]) ** 2 * pij
            out["NGLDM_DCV"] += (k - out["NGLDM_DCM"]) ** 2 * pij
    for key in ["NGLDM_LDE", "NGLDM_HDE", "NGLDM_LGLCE", "NGLDM_HGLCE",
                "NGLDM_LDLGLE", "NGLDM_LDHGLE", "NGLDM_HDLGLE",
                "NGLDM_HDHGLE", "NGLDM_GLNU", "NGLDM_DCNU"]:
        out[key] /= ns
    out["NGLDM_GLNUN"] /= ns * ns
    out["NGLDM_DCNUN"] /= ns * ns
    out["NGLDM_DCP"] = 1.0
    return out
