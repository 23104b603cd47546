"""Independent numpy oracle for GLRLM: explicit run scanning per direction."""

import numpy as np

from oracle_fastlog import fast_log2

EPS = 2.2e-16  # glrlm.h:169
DIRS = {0: (1, 0), 45: (1, 1), 90: (0, 1), 135: (-1, 1)}


def bin_matlab_img(img, n):
    vmax = img.max()
    out = np.ones_like(img, dtype=np.int64)
    nz = img != 0
    y = np.floor(n / vmax * img[nz] + 1.0).astype(np.int64)
    out[nz] = np.clip(y, 1, n)
    return out


def run_matrix(lev, valid, angle, ng, nr):
    """Scan maximal runs the way the reference's state machine does."""
    h, w = lev.shape
    dx, dy = DIRS[angle]
    seen = np.zeros_like(lev, dtype=bool)
    P = np.zeros((ng, nr))
    for r in range(h):
        for c in range(w):
            if not valid[r, c] or seen[r, c]:
                continue
            pi = lev[r, c]
            seen[r, c] = True
            length = 1
            y, x = r, c
            while True:
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w and valid[yy, xx] \
                        and not seen[yy, xx] and lev[yy, xx] == pi:
                    seen[yy, xx] = True
                    length += 1
                    y, x = yy, xx
                else:
                    break
            P[pi - 1, min(length, nr) - 1] += 1
    return P


def glrlm_features(P, n_pixels):
    ng, nr = P.shape
    s = P.sum()
    out = {}
    if s == 0:
        return {m: 0.0 for m in ALL}
    ival = np.arange(1, ng + 1, dtype=np.float64)
    jval = np.arange(1, nr + 1, dtype=np.float64)
    ri = P.sum(axis=1)
    rj = P.sum(axis=0)
    out["GLRLM_SRE"] = (rj / jval**2).sum() / s
    out["GLRLM_LRE"] = (rj * jval**2).sum() / s
    out["GLRLM_GLN"] = (ri**2).sum() / s
    out["GLRLM_GLNN"] = (ri**2).sum() / s**2
    out["GLRLM_RLN"] = (rj**2).sum() / s
    out["GLRLM_RLNN"] = (rj**2).sum() / s**2
    out["GLRLM_RP"] = s / n_pixels
    mu = (ri * ival).sum() / s
    out["GLRLM_GLV"] = (ri * (ival - mu) ** 2).sum() / s
    mur = (rj * jval).sum() / s
    out["GLRLM_RV"] = (rj * (jval - mur) ** 2).sum() / s
    p = P / s
    out["GLRLM_RE"] = -(p * fast_log2(p + EPS)).sum()
    out["GLRLM_LGLRE"] = (ri / ival**2).sum() / s
    out["GLRLM_HGLRE"] = (ri * ival**2).sum() / s
    out["GLRLM_SRLGLE"] = (P / ival[:, None]**2 / jval[None, :]**2).sum() / s
    out["GLRLM_SRHGLE"] = (P * ival[:, None]**2 / jval[None, :]**2).sum() / s
    out["GLRLM_LRLGLE"] = (P / ival[:, None]**2 * jval[None, :]**2).sum() / s
    out["GLRLM_LRHGLE"] = (P * ival[:, None]**2 * jval[None, :]**2).sum() / s
    return out


ALL = [
    "GLRLM_SRE", "GLRLM_LRE", "GLRLM_GLN", "GLRLM_GLNN", "GLRLM_RLN",
    "GLRLM_RLNN", "GLRLM_RP", "GLRLM_GLV", "GLRLM_RV", "GLRLM_RE",
    "GLRLM_LGLRE", "GLRLM_HGLRE", "GLRLM_SRLGLE", "GLRLM_SRHGLE",
    "GLRLM_LRLGLE", "GLRLM_LRHGLE",
]
