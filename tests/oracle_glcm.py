"""Independent numpy oracle for GLCM features (MATLAB-binning + IBSI modes).

Implements the documented contract (SURVEY.md Appendix B; reference
src/nyx/features/glcm.cpp) with plain per-pixel loops in float64.
"""

import numpy as np

from oracle_fastlog import fast_log2

EPS = 1e-9
ANGLE_OFFSETS = {0: (1, 0), 45: (1, 1), 90: (0, 1), 135: (-1, 1)}


def bin_matlab(x, vmax, n):
    if x == 0:
        return 1
    slope = n / vmax
    y = int(np.floor(slope * x + 1.0))
    return min(max(y, 1), n)


def bin_radiomics(x, vmin, vmax, n):
    """Radiomics binning (texture_feature.h:106-118): 1-based, x==0 -> 0,
    last bin one unit wider."""
    if x == 0:
        return 0
    binw = (vmax - vmin) / n
    y = int(np.floor((x - vmin) / max(binw, 1e-30))) + 1
    return min(y, n)


def cooc(img, angle, offset, ng, n_levels, ibsi=False, radiomics=False):
    """img: 2D masked intensities (0 = background). Returns [ng, ng] counts,
    axis 0 = neighbor level-1, axis 1 = center level-1.

    Radiomics binning (glcm.cpp:389-398, 452-478): the matrix axes index the
    RANK of each level within the sorted present-level set I, the matrix is
    SYMMETRIC, and I also supplies the level values for the weighted
    members -- returns (M [|I|, |I|], I list) in that mode."""
    h, w = img.shape
    if ibsi:
        lev = img.astype(np.int64)
    elif radiomics:
        vals = img[img > 0]
        vmin, vmax = vals.min(), vals.max()
        lev = np.vectorize(
            lambda v: bin_radiomics(v, vmin, vmax, n_levels))(img)
        I = sorted(set(lev[img > 0].ravel().tolist()))
        rank = {l: i for i, l in enumerate(I)}
    else:
        lev = np.vectorize(lambda v: bin_matlab(v, img.max(), n_levels))(img)
    dx, dy = ANGLE_OFFSETS[angle]
    dx, dy = dx * offset, dy * offset
    nm = len(I) if radiomics else ng
    M = np.zeros((nm, nm))
    for r in range(h):
        for c in range(w):
            rr, cc = r + dy, c + dx
            if 0 <= rr < h and 0 <= cc < w:
                if img[r, c] == 0 or img[rr, cc] == 0:
                    continue
                if radiomics:
                    a, b = rank[lev[rr, cc]], rank[lev[r, c]]
                else:
                    a, b = lev[rr, cc] - 1, lev[r, c] - 1
                M[a, b] += 1
                if ibsi or radiomics:
                    M[b, a] += 1
    if radiomics:
        return M, I
    return M


def glcm_features(M, ng, noval=-0.0, I=None):
    """All 30 angled features from one count matrix.  ``I``: level values
    per matrix index (radiomics rank compaction); default contiguous."""
    out = {}
    s = M.sum()
    if s == 0:
        return {m: noval for m in ALL}
    nm = M.shape[0]
    p = M / s
    idx = np.arange(nm, dtype=np.float64)
    if I is None:
        val = idx + 1
        Ngn = float(ng)
        kvs = np.arange(2 * nm - 1) + 2.0
        kvd = idx.copy()
    else:
        val = np.asarray(I, np.float64)
        Ngn = float(nm)
        # kValuesSum/Diff last-writer quirks (glcm.cpp:503-513)
        kvs = np.zeros(2 * nm - 1)
        kvd = np.zeros(nm)
        for x in range(nm):
            for y in range(nm):
                kvs[x + y] = val[x] + val[y]
                kvd[abs(x - y)] = abs(val[x] - val[y])
    ng = nm

    px_n = p.sum(axis=1)   # neighbor marginal
    px_c = p.sum(axis=0)   # center marginal
    mr = (px_c * val).sum()
    mc = (px_n * val).sum()

    pxmy = np.zeros(ng)
    pxpy = np.zeros(2 * ng - 1)
    for i in range(ng):
        for j in range(ng):
            pxmy[abs(i - j)] += p[i, j]
            pxpy[i + j] += p[i, j]

    out["GLCM_ASM"] = (p * p).sum()
    out["GLCM_ENERGY"] = out["GLCM_ASM"]
    dv = val[:, None] - val[None, :]
    out["GLCM_CONTRAST"] = (p * dv * dv).sum()

    s2r = (px_c * (val - mr) ** 2).sum()
    s2c = (px_n * (val - mc) ** 2).sum()
    cov = sum(p[i, j] * (val[i] - mc) * (val[j] - mr)
              for i in range(ng) for j in range(ng))
    den = np.sqrt(s2r) * np.sqrt(s2c)
    out["GLCM_CORRELATION"] = cov / den if den > 0 else noval

    out["GLCM_VARIANCE"] = (px_c * (val - mr) ** 2).sum()
    k = idx
    out["GLCM_IDM"] = (pxmy / (1 + k * k)).sum()
    out["GLCM_SUMAVERAGE"] = (pxpy * kvs).sum()
    out["GLCM_SUMENTROPY"] = -(pxpy * fast_log2(pxpy + EPS)).sum()
    out["GLCM_ENTROPY"] = -(p * fast_log2(p + EPS)).sum()
    difavg = (pxmy * kvd).sum()
    out["GLCM_DIFAVE"] = difavg
    out["GLCM_DIFVAR"] = ((k - difavg) ** 2 * pxmy).sum()
    out["GLCM_DIFENTRO"] = -(pxmy * fast_log2(pxmy + EPS)).sum()

    hxy = (p * fast_log2(p + EPS)).sum()
    pp = px_n[:, None] * px_c[None, :]
    hxy1 = (p * fast_log2(pp + EPS)).sum()
    hxy2 = (pp * fast_log2(pp + EPS)).sum()
    hx = (px_n * fast_log2(px_n + EPS)).sum()
    with np.errstate(divide="ignore", invalid="ignore"):
        im1 = (hxy - hxy1) / hx
    out["GLCM_INFOMEAS1"] = im1 if np.isfinite(im1) else noval
    out["GLCM_INFOMEAS2"] = np.sqrt(abs(1 - np.exp(-2 * (hxy - hxy2))))

    out["GLCM_ACOR"] = sum(p[i, j] * val[i] * val[j]
                           for i in range(ng) for j in range(ng))
    m_clu = val[:, None] + val[None, :] - 2 * mc
    out["GLCM_CLUTEND"] = (m_clu ** 2 * p).sum()
    out["GLCM_CLUSHADE"] = (m_clu ** 3 * p).sum()
    out["GLCM_CLUPROM"] = (m_clu ** 4 * p).sum()
    out["GLCM_SUMVARIANCE"] = out["GLCM_CLUTEND"]
    ad = np.abs(idx[:, None] - idx[None, :])
    out["GLCM_DIS"] = (ad * p).sum()
    out["GLCM_HOM1"] = (p / (1 + ad)).sum()
    out["GLCM_HOM2"] = (p / (1 + ad * ad)).sum()
    out["GLCM_IDMN"] = (pxmy / (1 + k * k / Ngn**2)).sum()
    out["GLCM_ID"] = (pxmy / (1 + k)).sum()
    out["GLCM_IDN"] = (pxmy / (1 + k / Ngn)).sum()
    out["GLCM_IV"] = sum(pxmy[i] / kvd[i]**2 for i in range(1, ng))
    out["GLCM_JAVE"] = mr
    out["GLCM_JE"] = out["GLCM_ENTROPY"]
    out["GLCM_JMAX"] = p.max()
    out["GLCM_JVAR"] = (px_n * (idx + 1 - mr) ** 2).sum()
    return out


ALL = [
    "GLCM_ACOR", "GLCM_ASM", "GLCM_CLUPROM", "GLCM_CLUSHADE", "GLCM_CLUTEND",
    "GLCM_CONTRAST", "GLCM_CORRELATION", "GLCM_DIFAVE", "GLCM_DIFENTRO",
    "GLCM_DIFVAR", "GLCM_DIS", "GLCM_ENERGY", "GLCM_ENTROPY", "GLCM_HOM1",
    "GLCM_HOM2", "GLCM_ID", "GLCM_IDN", "GLCM_IDM", "GLCM_IDMN",
    "GLCM_INFOMEAS1", "GLCM_INFOMEAS2", "GLCM_IV", "GLCM_JAVE", "GLCM_JE",
    "GLCM_JMAX", "GLCM_JVAR", "GLCM_SUMAVERAGE", "GLCM_SUMENTROPY",
    "GLCM_SUMVARIANCE", "GLCM_VARIANCE",
]
