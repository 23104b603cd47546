"""Independent scalar numpy oracle for the IBSI Intensity Histogram family
(reference semantics: src/nyx/features/intensity_histogram.cpp:31-305)."""

import numpy as np

DBL_MIN = 2.2250738585072014e-308
DBL_MAX = 1.7976931348623157e+308


def ih_features(v, nbins, pscale=1.0, poffset=0.0):
    """v: 1D raw pixel intensities of one ROI. Returns dict of all 46 IH
    members, or None for a degenerate ROI."""
    v = np.asarray(v, np.float64)
    cnt = v.size
    mn_raw, mx_raw = v.min(), v.max()
    if mx_raw <= mn_raw or nbins < 2 or cnt == 0:
        return None
    N = int(nbins)
    mapped = poffset + pscale * v
    minV = poffset + pscale * mn_raw
    maxV = poffset + pscale * mx_raw
    binw = (maxV - minV) / N

    freq = np.zeros(N)
    for x in mapped:
        i = int(np.floor((x - minV) / binw))
        i = min(max(i, 0), N - 1)
        freq[i] += 1.0
    total = float(cnt)

    def bin_min(i):
        return minV + i * binw

    def bin_max(i):
        return minV + (i + 1) * binw

    def bin_center(i):
        return minV + (i + 0.5) * binw

    def index_of(x):
        i = int(np.floor((x - minV) / binw))
        return min(max(i, 0), N - 1)

    def quantile(p):
        if p < 0.5:
            cum = 0.0
            p_n = 0.0
            n = 0
            while True:
                f_n = freq[n]
                cum += f_n
                p_prev = p_n
                p_n = cum / total
                n += 1
                if not (n < N and p_n < p):
                    break
            prop = f_n / total
            mn = bin_min(n - 1)
            return mn + ((p - p_prev) / prop) * binw
        else:
            cum = 0.0
            p_n = 1.0
            n = N - 1
            m = 0
            while True:
                f_n = freq[n]
                cum += f_n
                p_prev = p_n
                p_n = 1.0 - cum / total
                n -= 1
                m += 1
                if not (m < N and p_n > p):
                    break
            prop = f_n / total
            mx = bin_max(n + 1)
            return mx - ((p_prev - p) / prop) * binw

    # bin-center median
    tot = 0.0
    half = float(cnt // 2)
    b = 0
    while tot <= half and b < N:
        tot += freq[b]
        b += 1
    median_v = bin_center(b - 1)
    median_i = index_of(median_v)

    p10_v, p25_v = quantile(0.10), quantile(0.25)
    p75_v, p90_v = quantile(0.75), quantile(0.90)
    p10_i, p25_i = index_of(p10_v), index_of(p25_v)
    p75_i, p90_i = index_of(p75_v), index_of(p90_v)
    min_i, max_i = index_of(minV), index_of(maxV)

    prob = freq / total
    centers = np.array([bin_center(i) for i in range(N)])
    iarr = np.arange(N, dtype=np.float64)
    mean_v = (prob * centers).sum()
    mean_i = (prob * iarr).sum()
    rob = (iarr >= p10_i) & (iarr <= p90_i)
    rob_cnt = freq[rob].sum()
    rmean_v = (freq[rob] * centers[rob]).sum() / rob_cnt
    rmean_i = (freq[rob] * iarr[rob]).sum() / rob_cnt

    dv = centers - mean_v
    di = iarr - mean_i
    var_v = (prob * dv ** 2).sum()
    var_i = (prob * di ** 2).sum()
    skew_v = (prob * dv ** 3).sum() / (var_v * np.sqrt(var_v))
    skew_i = (prob * di ** 3).sum() / (var_i * np.sqrt(var_i))
    kurt_v = (prob * dv ** 4).sum() / var_v ** 2 - 3
    kurt_i = (prob * di ** 4).sum() / var_i ** 2 - 3

    mode_bin = 0
    mode_f = 0.0
    for i in range(N):
        if freq[i] > mode_f:
            mode_f = freq[i]
            mode_bin = i
    mode_v = bin_center(mode_bin)

    mad_v = (prob * np.abs(dv)).sum()
    mad_i = (prob * np.abs(di)).sum()
    rmad_v = (freq[rob] * np.abs(centers[rob] - rmean_v)).sum() / rob_cnt
    rmad_i = (freq[rob] * np.abs(iarr[rob] - rmean_i)).sum() / rob_cnt
    medad_v = (prob * np.abs(centers - median_v)).sum()
    medad_i = (prob * np.abs(iarr - median_i)).sum()

    pg = prob > 1e-7
    entropy = -(prob[pg] * np.log2(prob[pg])).sum()
    uniformity = (prob ** 2).sum()

    cov_v = np.sqrt(var_v) / mean_v
    cov_i = np.sqrt(var_i) / (mean_i + 1)
    qcd_v = (p75_v - p25_v) / (p75_v + p25_v)
    qcd_i = (p75_i - p25_i) / (p75_i + p25_i + 2.0)

    maxg_v, maxg_i = DBL_MIN, 0.0
    ming_v, ming_i = DBL_MAX, 0.0
    for i in range(N):
        if i == 0:
            g = freq[1] - freq[0]
        elif i == N - 1:
            g = freq[i] - freq[i - 1]
        else:
            g = (freq[i + 1] - freq[i - 1]) / 2.0
        if g > maxg_v:
            maxg_v, maxg_i = g, i + 1
        if g < ming_v:
            ming_v, ming_i = g, i + 1

    return {
        "IH_MEAN_VAL": mean_v, "IH_VARIANCE_VAL": var_v,
        "IH_SKEWNESS_VAL": skew_v, "IH_EXCESS_KURTOSIS_VAL": kurt_v,
        "IH_MEDIAN_VAL": median_v, "IH_MINIMUM_VAL": minV,
        "IH_P10_VAL": p10_v, "IH_P90_VAL": p90_v, "IH_MAXIMUM_VAL": maxV,
        "IH_MODE_VAL": mode_v, "IH_INTERQUANTILE_RANGE_VAL": p75_v - p25_v,
        "IH_RANGE_VAL": maxV - minV,
        "IH_MEAN_ABSOLUTE_DEVIATION_VAL": mad_v,
        "IH_ROBUST_MEAN_ABSOLUTE_DEVIATION_VAL": rmad_v,
        "IH_MEDIAN_ABSOLUTE_DEVIATION_VAL": medad_v,
        "IH_COEFFICIENT_OF_VARIATION_VAL": cov_v,
        "IH_QUANTILE_COEFFICIENT_OF_DISPERSION_VAL": qcd_v,
        "IH_ENTROPY_VAL": entropy, "IH_UNIFORMITY_VAL": uniformity,
        "IH_ROBUST_MEAN_VAL": rmean_v,
        "IH_MEAN_IDX": mean_i + 1, "IH_VARIANCE_IDX": var_i,
        "IH_SKEWNESS_IDX": skew_i, "IH_EXCESS_KURTOSIS_IDX": kurt_i,
        "IH_MEDIAN_IDX": median_i + 1, "IH_MINIMUM_IDX": min_i + 1,
        "IH_P10_IDX": p10_i + 1, "IH_P90_IDX": p90_i + 1,
        "IH_MAXIMUM_IDX": max_i + 1, "IH_MODE_IDX": mode_bin + 1,
        "IH_INTERQUANTILE_RANGE_IDX": float(p75_i - p25_i),
        "IH_RANGE_IDX": float(max_i - min_i),
        "IH_MEAN_ABSOLUTE_DEVIATION_IDX": mad_i,
        "IH_ROBUST_MEAN_ABSOLUTE_DEVIATION_IDX": rmad_i,
        "IH_MEDIAN_ABSOLUTE_DEVIATION_IDX": medad_i,
        "IH_COEFFICIENT_OF_VARIATION_IDX": cov_i,
        "IH_QUANTILE_COEFFICIENT_OF_DISPERSION_IDX": qcd_i,
        "IH_ENTROPY_IDX": entropy, "IH_UNIFORMITY_IDX": uniformity,
        "IH_MAX_GRADIENT": maxg_v, "IH_MAX_GRADIENT_IDX": float(maxg_i),
        "IH_MIN_GRADIENT": ming_v, "IH_MIN_GRADIENT_IDX": float(ming_i),
        "IH_ROBUST_MEAN_IDX": rmean_i,
        "IH_NUM_BINS": float(N), "IH_BIN_SIZE": binw,
    }
