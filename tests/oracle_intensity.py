"""Independent numpy oracle for first-order intensity features.

Implements the reference's documented semantics (SURVEY.md Appendix B,
reference: src/nyx/features/intensity.cpp, histogram.h) directly in plain
numpy, so kernel bugs and oracle bugs are unlikely to coincide.
"""

import numpy as np


def trivial_histogram_stats(v, vmin, vmax, nbins):
    """v: 1D float array of ROI pixel values. Returns dict of stats."""
    v = np.asarray(v, np.float64)
    n = v.size
    rng = float(vmax - vmin)

    # 100-bin percentile histogram
    binw = rng / 100.0
    idx = ((v - vmin) / binw).astype(np.int64)
    idx = np.minimum(idx, 99)
    bins100 = np.bincount(idx, minlength=100)[:100].astype(np.float64)

    pct = {}
    for p in (0.01, 0.10, 0.25, 0.75, 0.90, 0.99):
        cnt = n * p
        run = 0.0
        val = 0.0
        for i in range(100):
            if run <= cnt <= run + bins100[i]:
                with np.errstate(invalid="ignore", divide="ignore"):
                    val = (cnt - run) * binw / bins100[i] + vmin + binw * i
            run += bins100[i]
        pct[p] = val

    # custom histogram (to_grayscale binning)
    ci = ((v - vmin) / rng * nbins).astype(np.int64)
    ci = np.minimum(ci, nbins - 1)
    hist = np.bincount(ci, minlength=nbins)[:nbins].astype(np.float64)
    p_ = hist / n
    entropy = -np.sum(p_ * np.log2(p_ + 2.2e-16))
    uniformity = np.sum(p_ * p_)

    s = np.sort(v)
    median = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

    vals, counts = np.unique(s, return_counts=True)
    mode = vals[np.argmax(counts)]  # first max -> smallest value

    sel = (v >= pct[0.10]) & (v <= pct[0.90])
    if sel.any():
        m1090 = v[sel].mean()
        rmad = np.abs(v[sel] - m1090).mean()
        robust_mean = m1090
    else:
        rmad = 0.0
        robust_mean = 0.0

    return dict(median=median, mode=mode, entropy=entropy,
                uniformity=uniformity, hist=hist, rmad=rmad,
                robust_mean=robust_mean, **{"p%02d" % int(p * 100): pct[p] for p in pct})


def intensity_features(v, slide_range, nbins, noval=-0.0):
    """All PixelIntensityFeatures members for one ROI pixel vector."""
    v = np.asarray(v, np.float64)
    n = v.size
    vmin, vmax = v.min(), v.max()
    out = {}
    if vmax == vmin:
        for k in ALL_KEYS:
            out[k] = noval
        out.update(MEAN=vmin, MEDIAN=vmin, MIN=vmin, MAX=vmin, RANGE=0.0)
        out["HISTOGRAM"] = np.zeros(nbins)
        return out

    mean = v.mean()
    d = v - mean
    m2, m3, m4 = (d**2).sum(), (d**3).sum(), (d**4).sum()
    m5, m6 = (d**5).sum(), (d**6).sum()
    var_u = m2 / (n - 1) if n > 1 else 0.0
    var_b = m2 / n if n > 1 else 0.0
    sd = np.sqrt(var_u)

    hs = trivial_histogram_stats(v, vmin, vmax, nbins)

    out["INTEGRATED_INTENSITY"] = v.sum()
    out["MEAN"] = mean
    out["MEDIAN"] = hs["median"]
    out["MIN"] = vmin
    out["MAX"] = vmax
    out["RANGE"] = vmax - vmin
    out["COVERED_IMAGE_INTENSITY_RANGE"] = (vmax - vmin) / slide_range
    out["STANDARD_DEVIATION"] = sd
    out["STANDARD_DEVIATION_BIASED"] = np.sqrt(var_b)
    out["VARIANCE"] = var_u
    out["VARIANCE_BIASED"] = var_b
    out["COV"] = sd / mean
    out["STANDARD_ERROR"] = sd / np.sqrt(n)
    out["SKEWNESS"] = np.sqrt(n) * m3 / (m2 * np.sqrt(m2)) if n > 3 and m2 != 0 else 0.0
    out["KURTOSIS"] = n * m4 / (m2 * m2) if n > 4 and m2 != 0 else 0.0
    out["EXCESS_KURTOSIS"] = out["KURTOSIS"] - 3 if n > 4 and m2 != 0 else 0.0
    sd2 = sd * sd
    out["HYPERSKEWNESS"] = m5 / (n * sd2 * sd2 * sd) if sd != 0 else 0.0
    out["HYPERFLATNESS"] = m6 / (n * sd2 * sd2 * sd2) if sd != 0 else 0.0
    out["MEAN_ABSOLUTE_DEVIATION"] = np.abs(d).mean()
    out["MEDIAN_ABSOLUTE_DEVIATION"] = np.abs(v - hs["median"]).mean()
    out["ENERGY"] = (v**2).sum()
    out["ROOT_MEAN_SQUARED"] = np.sqrt((v**2).sum() / n)
    out["ENTROPY"] = hs["entropy"]
    out["MODE"] = hs["mode"]
    out["UNIFORMITY"] = hs["uniformity"]
    out["UNIFORMITY_PIU"] = (1.0 - (vmax - vmin) / (vmax + vmin)) * 100.0
    out["P01"] = hs["p01"]
    out["P10"] = hs["p10"]
    out["P25"] = hs["p25"]
    out["P75"] = hs["p75"]
    out["P90"] = hs["p90"]
    out["P99"] = hs["p99"]
    out["QCOD"] = (hs["p75"] - hs["p25"]) / (hs["p75"] + hs["p25"])
    out["INTERQUARTILE_RANGE"] = hs["p75"] - hs["p25"]
    out["ROBUST_MEAN"] = hs["robust_mean"]
    out["ROBUST_MEAN_ABSOLUTE_DEVIATION"] = hs["rmad"]
    out["HISTOGRAM"] = hs["hist"]
    return out


ALL_KEYS = [
    "INTEGRATED_INTENSITY", "MEAN", "MEDIAN", "MIN", "MAX", "RANGE",
    "COVERED_IMAGE_INTENSITY_RANGE", "STANDARD_DEVIATION",
    "STANDARD_DEVIATION_BIASED", "VARIANCE", "VARIANCE_BIASED", "COV",
    "STANDARD_ERROR", "SKEWNESS", "KURTOSIS", "EXCESS_KURTOSIS",
    "HYPERSKEWNESS", "HYPERFLATNESS", "MEAN_ABSOLUTE_DEVIATION",
    "MEDIAN_ABSOLUTE_DEVIATION", "ENERGY", "ROOT_MEAN_SQUARED", "ENTROPY",
    "MODE", "UNIFORMITY", "UNIFORMITY_PIU", "P01", "P10", "P25", "P75",
    "P90", "P99", "QCOD", "INTERQUARTILE_RANGE", "ROBUST_MEAN",
    "ROBUST_MEAN_ABSOLUTE_DEVIATION",
]
