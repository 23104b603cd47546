"""Loop-based oracles for chords and caliper families.

These are the original straightforward per-pixel / per-edge loop
implementations (reference semantics: chords.cpp, caliper_*.cpp).  The
production code in nyxus_tpu/pipeline/hostfeats.py is a vectorized rewrite;
tests assert exact (bit-level) agreement against these loops.
"""

import math

import numpy as np

from nyxus_tpu.pipeline.hostfeats import _common_stats, _rotate_fp


def _hull_width_at_y(poly, y):
    n = len(poly)
    have = False
    xlo = xhi = 0.0
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        lo, hi = min(a[1], b[1]), max(a[1], b[1])
        if y < lo or y > hi:
            continue
        if b[1] != a[1]:
            x = a[0] + (b[0] - a[0]) * (y - a[1]) / (b[1] - a[1])
            e0 = e1 = x
        else:
            e0, e1 = min(a[0], b[0]), max(a[0], b[0])
        if not have:
            xlo, xhi, have = e0, e1, True
        else:
            xlo, xhi = min(xlo, e0), max(xhi, e1)
    return (xhi - xlo) if have else 0.0


def _hull_height_at_x(poly, x):
    n = len(poly)
    have = False
    ylo = yhi = 0.0
    for i in range(n):
        a, b = poly[i], poly[(i + 1) % n]
        lo, hi = min(a[0], b[0]), max(a[0], b[0])
        if x < lo or x > hi:
            continue
        if b[0] != a[0]:
            y = a[1] + (b[1] - a[1]) * (x - a[0]) / (b[0] - a[0])
            e0 = e1 = y
        else:
            e0, e1 = min(a[1], b[1]), max(a[1], b[1])
        if not have:
            ylo, yhi, have = e0, e1, True
        else:
            ylo, yhi = min(ylo, e0), max(yhi, e1)
    return (yhi - ylo) if have else 0.0


def caliper_feret_loop(hc, cfg):
    n = len(hc.recs)
    nv = cfg.noval
    names = ("MIN_FERET_ANGLE", "MAX_FERET_ANGLE", "STAT_FERET_DIAM_MIN",
             "STAT_FERET_DIAM_MAX", "STAT_FERET_DIAM_MEAN",
             "STAT_FERET_DIAM_MEDIAN", "STAT_FERET_DIAM_STDDEV",
             "STAT_FERET_DIAM_MODE")
    out = {k: np.full(n, nv) for k in names}
    for i in range(n):
        hull = hc.hulls[i]
        if hull is None or len(hull) == 0:
            continue
        angles, ferets = [], []
        th = 0.0
        while th <= 180.0:
            rot = _rotate_fp(hull, th)
            feret = rot[:, 0].max() - rot[:, 0].min()
            if feret > 0:
                angles.append(th)
                ferets.append(feret)
            th += 10.0
        if not ferets:
            continue
        ferets = np.asarray(ferets)
        st = _common_stats(ferets)
        out["MIN_FERET_ANGLE"][i] = angles[int(np.argmin(ferets))]
        out["MAX_FERET_ANGLE"][i] = angles[int(np.argmax(ferets))]
        out["STAT_FERET_DIAM_MIN"][i] = st["min"]
        out["STAT_FERET_DIAM_MAX"][i] = st["max"]
        out["STAT_FERET_DIAM_MEAN"][i] = st["mean"]
        out["STAT_FERET_DIAM_MEDIAN"][i] = st["median"]
        out["STAT_FERET_DIAM_STDDEV"][i] = st["stdev"]
        out["STAT_FERET_DIAM_MODE"][i] = st["mode"]
    return out


def caliper_martin_loop(hc, cfg):
    n = len(hc.recs)
    out = {k: np.full(n, cfg.noval) for k in (
        "STAT_MARTIN_DIAM_MIN", "STAT_MARTIN_DIAM_MAX", "STAT_MARTIN_DIAM_MEAN",
        "STAT_MARTIN_DIAM_MEDIAN", "STAT_MARTIN_DIAM_STDDEV",
        "STAT_MARTIN_DIAM_MODE")}
    NGRID = 100
    for i in range(n):
        hull = hc.hulls[i]
        if hull is None or len(hull) == 0:
            continue
        D = []
        th = 0.0
        while th < 180.0:
            rot = _rotate_fp(hull, th)
            miny, maxy = rot[:, 1].min(), rot[:, 1].max()
            th += 10.0
            if maxy <= miny:
                continue
            stepy = (maxy - miny) / NGRID
            yy = miny + (np.arange(NGRID) + 0.5) * stepy
            widths = np.array([_hull_width_at_y(rot, y) for y in yy])
            total = widths.sum()
            if total <= 0:
                continue
            cum = np.cumsum(widths)
            k = int(np.argmax(cum >= 0.5 * total))
            D.append(widths[k])
        if not D:
            continue
        st = _common_stats(np.asarray(D))
        out["STAT_MARTIN_DIAM_MIN"][i] = st["min"]
        out["STAT_MARTIN_DIAM_MAX"][i] = st["max"]
        out["STAT_MARTIN_DIAM_MEAN"][i] = st["mean"]
        out["STAT_MARTIN_DIAM_MEDIAN"][i] = st["median"]
        out["STAT_MARTIN_DIAM_STDDEV"][i] = st["stdev"]
        out["STAT_MARTIN_DIAM_MODE"][i] = st["mode"]
    return out


def caliper_nassenstein_loop(hc, cfg):
    n = len(hc.recs)
    out = {k: np.full(n, cfg.noval) for k in (
        "STAT_NASSENSTEIN_DIAM_MIN", "STAT_NASSENSTEIN_DIAM_MAX",
        "STAT_NASSENSTEIN_DIAM_MEAN", "STAT_NASSENSTEIN_DIAM_MEDIAN",
        "STAT_NASSENSTEIN_DIAM_STDDEV", "STAT_NASSENSTEIN_DIAM_MODE")}
    for i in range(n):
        hull = hc.hulls[i]
        if hull is None or len(hull) < 3:
            continue
        D = []
        th = 0.0
        while th < 180.0:
            rot = _rotate_fp(hull, th)
            th += 10.0
            ymax = rot[:, 1].max()
            sel = np.abs(rot[:, 1] - ymax) < 1e-3
            xc = rot[sel, 0].sum() / max(sel.sum(), 1)
            D.append(_hull_height_at_x(rot, xc))
        if not D:
            continue
        st = _common_stats(np.asarray(D))
        out["STAT_NASSENSTEIN_DIAM_MIN"][i] = st["min"]
        out["STAT_NASSENSTEIN_DIAM_MAX"][i] = st["max"]
        out["STAT_NASSENSTEIN_DIAM_MEAN"][i] = st["mean"]
        out["STAT_NASSENSTEIN_DIAM_MEDIAN"][i] = st["median"]
        out["STAT_NASSENSTEIN_DIAM_STDDEV"][i] = st["stdev"]
        out["STAT_NASSENSTEIN_DIAM_MODE"][i] = st["mode"]
    return out


def chords_loop(hc, cfg):
    n = len(hc.recs)
    names = ("MAXCHORDS_MAX", "MAXCHORDS_MAX_ANG", "MAXCHORDS_MIN",
             "MAXCHORDS_MIN_ANG", "MAXCHORDS_MEDIAN", "MAXCHORDS_MEAN",
             "MAXCHORDS_MODE", "MAXCHORDS_STDDEV", "ALLCHORDS_MAX",
             "ALLCHORDS_MAX_ANG", "ALLCHORDS_MIN", "ALLCHORDS_MIN_ANG",
             "ALLCHORDS_MEDIAN", "ALLCHORDS_MEAN", "ALLCHORDS_MODE",
             "ALLCHORDS_STDDEV")
    out = {k: np.full(n, -0.0) for k in names}
    n_angle_segments, n_side_segments = 20, 100
    ang_step = math.pi / n_angle_segments
    for i, r in enumerate(hc.recs):
        ys, xs = hc.roi_points(i)
        ii_crop, _ = hc.pair_crop(i)
        inten = ii_crop[ys, xs]
        cenx = (r.x0 + r.x1) / 2.0
        ceny = (r.y0 + r.y1) / 2.0
        gx = xs + r.x0
        gy = ys + r.y0
        AC, ACang, MC, MCang = [], [], [], []
        ang = 0.0
        while ang < math.pi:
            # reference: float theta parameter + FLOAT-overload trig
            ang32 = float(np.float32(ang))
            s = float(np.float32(math.sin(ang32)))
            c = float(np.float32(math.cos(ang32)))
            # rotate_cloud + Pixel2(float) truncation toward zero
            xr = ((gx - cenx) * c - (gy - ceny) * s + cenx).astype(np.float32)
            yr = ((gy - ceny) * c + (gx - cenx) * s + ceny).astype(np.float32)
            xi = xr.astype(np.int64)
            yi = yr.astype(np.int64)
            x0r, y0r = xi.min(), yi.min()
            wr = xi.max() - x0r + 1
            hr = yi.max() - y0r + 1
            # intensity raster, last writer wins (image_matrix.h:270-276)
            img = np.zeros((hr, wr))
            img[yi - y0r, xi - x0r] = inten
            step = wr // n_side_segments if wr >= 2 * n_side_segments else 1
            TC = []
            for col in range(0, wr, step):
                colv = img[:, col]
                # get_chlen (image_matrix.cpp:206-236): longest NONZERO run
                # TERMINATED by a zero -- a run reaching the bottom edge is
                # never folded into maxChlen (faithful quirk)
                best = cur = 0
                for v in colv:
                    if v != 0:
                        cur += 1
                    else:
                        best = max(best, cur)
                        cur = 0
                if best > 0:
                    TC.append(best)
                    AC.append(best)
                    ACang.append(ang)
            if TC:
                MC.append(max(TC))
                MCang.append(ang)
            ang += ang_step
        if not MC:
            continue
        # un-cleared histogram reuse: ALLCHORDS mode/median over MC + AC
        for pre, V, A, H in (("MAXCHORDS", MC, MCang, MC),
                             ("ALLCHORDS", AC, ACang, MC + AC)):
            V = np.asarray(V, np.float64)
            H = np.asarray(H, np.float64)
            mean = V.mean()
            std = math.sqrt(((V - mean) ** 2).sum() / (len(V) - 1)) if len(V) > 2 else 0.0
            sv = np.sort(H)
            half = len(sv) // 2
            median = sv[half] if len(sv) % 2 else (sv[half - 1] + sv[half]) / 2.0
            vals, counts = np.unique(H, return_counts=True)
            mode = vals[int(np.argmax(counts))]
            out[pre + "_MAX"][i] = V.max()
            out[pre + "_MIN"][i] = V.min()
            out[pre + "_MEAN"][i] = mean
            out[pre + "_STDDEV"][i] = std
            out[pre + "_MEDIAN"][i] = median
            out[pre + "_MODE"][i] = mode
            out[pre + "_MIN_ANG"][i] = A[int(np.argmin(V))]
            out[pre + "_MAX_ANG"][i] = A[int(np.argmax(V))]
    return out
