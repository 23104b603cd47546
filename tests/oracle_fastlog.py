"""Independent numpy port of the reference's fast_log10-based log2
(helpers.h:283-327) for the test oracles."""

import numpy as np


def fast_log2(x):
    xf = np.asarray(x, np.float32)
    ui = xf.view(np.uint32)
    exp = ((ui >> 23) & 0xFF).astype(np.float32)
    frac = ui & np.uint32(0x007FFFFF)
    greater = (ui & np.uint32(0x00400000)) != 0
    sig_g = (frac | np.uint32(0x3f000000)).view(np.float32)
    sig_l = (frac | np.uint32(0x3f800000)).view(np.float32)
    fexp = np.where(greater, exp - np.float32(126.0), exp - np.float32(127.0))
    signif = np.where(greater, sig_g, sig_l) - np.float32(1.0)
    a = np.float32(-0.6296735)
    b = np.float32(1.466967)
    lg2 = fexp + a * signif * signif + b * signif
    return lg2.astype(np.float64)
