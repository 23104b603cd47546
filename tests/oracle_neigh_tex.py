"""Independent numpy oracles for NGTDM, GLDM, NGLDM (per-pixel loops)."""

import numpy as np

from oracle_fastlog import fast_log2

EPS = 2.2e-16  # gldm.h:105
N8 = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def bin_matlab_img(img, n):
    vmax = img.max()
    out = np.ones_like(img, dtype=np.int64)
    nz = img != 0
    out[nz] = np.clip(np.floor(n / vmax * img[nz] + 1.0).astype(np.int64), 1, n)
    return out


def ngtdm(crop, n_levels):
    """crop: AABB with off-ROI = 0 (MATLAB mode: background -> level 1)."""
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    h, w = lev.shape
    uniq = np.unique(lev)
    if len(uniq) < 2:
        return None  # degenerate
    nb = n_levels + 1
    N = np.zeros(nb)
    S = np.zeros(nb)
    for r in range(h):
        for c in range(w):
            pi = lev[r, c]
            neigs, nd = 0.0, 0
            for dy, dx in N8:
                rr, cc = r + dy, c + dx
                if 0 <= rr < h and 0 <= cc < w and lev[rr, cc] != 0:
                    neigs += lev[rr, cc]
                    nd += 1
            if nd > 0:
                N[pi] += 1
                S[pi] += abs(pi - neigs / nd)
    nvc = N.sum()
    P = N / nvc
    ngp = len([u for u in uniq if u > 0])
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


def gldm(crop, n_levels):
    """crop: AABB with off-ROI = 0; background excluded by original value."""
    lev = bin_matlab_img(crop.astype(np.float64), n_levels)
    h, w = crop.shape
    ng, nd_max = n_levels, 9
    P = np.zeros((ng, nd_max))
    for r in range(h):
        for c in range(w):
            if crop[r, c] == 0:
                continue
            nd = 1
            for dy, dx in N8:
                rr, cc = r + dy, c + dx
                if 0 <= rr < h and 0 <= cc < w and crop[rr, cc] != 0 \
                        and lev[rr, cc] == lev[r, c]:
                    nd += 1
            P[lev[r, c] - 1, nd - 1] += 1
    nz = P.sum()
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


def ngldm(crop, roi_mask, n_levels):
    """crop: AABB intensities; roi_mask: ROI membership (in-ROI zeros count)."""
    vmax = crop[roi_mask].max()
    lev = np.floor(crop.astype(np.float64) * n_levels / vmax).astype(np.int64)
    h, w = crop.shape
    nb = n_levels + 1
    P = np.zeros((nb, 9))
    for r in range(h):
        for c in range(w):
            if not roi_mask[r, c]:
                continue
            m = 0
            for dy, dx in N8:
                rr, cc = r + dy, c + dx
                if 0 <= rr < h and 0 <= cc < w and roi_mask[rr, cc] \
                        and lev[rr, cc] == lev[r, c]:
                    m += 1
            P[lev[r, c], m] += 1
    ns = P.sum()
    gval = np.arange(nb, dtype=np.float64)
    dval = np.arange(1, 10, dtype=np.float64)
    sg, sr = P.sum(1), P.sum(0)
    p = P / ns
    out = {}
    out["NGLDM_LDE"] = (sr / dval**2).sum() / ns
    out["NGLDM_HDE"] = (sr * dval**2).sum() / ns
    nzg = gval > 0
    out["NGLDM_LGLCE"] = (sg[nzg] / gval[nzg]**2).sum() / ns
    out["NGLDM_HGLCE"] = (sg * gval**2).sum() / ns
    out["NGLDM_LDLGLE"] = (P[nzg] / gval[nzg, None]**2 / dval[None]**2).sum() / ns
    out["NGLDM_LDHGLE"] = (P * gval[:, None]**2 / dval[None]**2).sum() / ns
    out["NGLDM_HDLGLE"] = (P[nzg] / gval[nzg, None]**2 * dval[None]**2).sum() / ns
    out["NGLDM_HDHGLE"] = (P * gval[:, None]**2 * dval[None]**2).sum() / ns
    out["NGLDM_GLNU"] = (sg**2).sum() / ns
    out["NGLDM_GLNUN"] = (sg**2).sum() / ns**2
    out["NGLDM_DCNU"] = (sr**2).sum() / ns
    out["NGLDM_DCNUN"] = (sr**2).sum() / ns**2
    out["NGLDM_DCP"] = 1.0
    out["NGLDM_GLM"] = (p * gval[:, None]).sum()
    out["NGLDM_DCM"] = (p * dval[None, :]).sum()
    out["NGLDM_GLV"] = (p * (gval[:, None] - out["NGLDM_GLM"]) ** 2).sum()
    out["NGLDM_DCV"] = (p * (dval[None, :] - out["NGLDM_DCM"]) ** 2).sum()
    pnz = p[p > 0]
    out["NGLDM_DCENT"] = -(pnz * np.log2(pnz)).sum()
    out["NGLDM_DCENE"] = (p * p).sum()
    return out
