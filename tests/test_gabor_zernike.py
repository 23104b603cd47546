"""Gabor and Zernike parity tests vs direct numpy implementations."""

import math

import numpy as np
import pytest
from scipy import signal

from nyxus_tpu import taxonomy as tx
from nyxus_tpu import columns as col
from nyxus_tpu.config import EngineConfig
from nyxus_tpu.pipeline.runner import PairRunner


def run_feats(intens, labels, feats, **cfg_kw):
    cfg = EngineConfig(precision="f64", **cfg_kw)
    fset = tx.parse_feature_request(feats)
    runner = PairRunner(fset, cfg)
    labs, values = runner.run(intens, labels)
    cols, _ = col.build_header(fset, cfg)
    return labs, values, cols[4:], cfg


def gabor_oracle(crop, cfg):
    """Direct scipy full-convolution implementation of gabor.cpp."""
    from nyxus_tpu.ops.gabor import gabor_kernel
    n = cfg.gabor_kersize

    def energy(f0, theta):
        kr, ki = gabor_kernel(f0, cfg.gabor_sig2lam, cfg.gabor_gamma, theta, n)
        cr = signal.convolve2d(crop, kr, mode="full")
        ci = signal.convolve2d(crop, ki, mode="full")
        off = int(math.ceil(n / 2))
        h, w = crop.shape
        mag = np.sqrt(cr ** 2 + ci ** 2)[off:off + h, off:off + w]
        return np.floor(mag)

    base = energy(cfg.gabor_f0, math.pi / 2)
    maxval, cmpval = base.max(), base.min()
    baseline = (base > cmpval).sum()
    out = []
    # reference swap quirk: angle (radians) acts as f0, frequency as theta
    # (gabor.cpp:19-25,107-111; see ops/gabor.py)
    for th, freq in zip(cfg.gabor_thetas, cfg.gabor_freqs):
        e = energy(math.radians(th), float(freq))
        out.append((e / maxval > cfg.gabor_thold).sum() / baseline)
    return out


def test_gabor(blob_pair):
    intens, labels = blob_pair
    labs, values, cols, cfg = run_feats(intens, labels, ["GABOR"])
    checked = 0
    for i, lab in enumerate(labs[:5]):
        ys, xs = np.nonzero(labels == lab)
        sl = (slice(ys.min(), ys.max() + 1), slice(xs.min(), xs.max() + 1))
        crop = np.where(labels[sl] == lab, intens[sl], 0).astype(np.float64)
        if crop.max() == crop.min():
            continue
        want = gabor_oracle(crop, cfg)
        row = dict(zip(cols, values[i]))
        for k in range(4):
            assert row["GABOR_%d" % k] == pytest.approx(want[k], rel=1e-6), (lab, k)
            checked += 1
    assert checked >= 8


def zernike_oracle(crop, order=9):
    """Literal port of mb_zernike2D in float64."""
    rows, cols_ = crop.shape
    N = min(rows, cols_)
    rad = float(N)
    L = order
    H1 = np.zeros((L + 1, L + 1)); H2 = np.zeros((L + 1, L + 1)); H3 = np.zeros((L + 1, L + 1))
    for n_ in range(L + 1):
        for m_ in range(n_ + 1):
            if n_ != m_:
                H3[n_][m_] = -(4.0 * (m_ + 2) * (m_ + 1)) / ((n_ + m_ + 2) * (n_ - m_))
                H2[n_][m_] = (H3[n_][m_] * (n_ + m_ + 4) * (n_ - m_ - 2)) / (4.0 * (m_ + 3)) + (m_ + 2)
                H1[n_][m_] = ((m_ + 4) * (m_ + 3)) / 2.0 - (m_ + 4) * H2[n_][m_] \
                    + (H3[n_][m_] * (n_ + m_ + 6) * (n_ - m_ - 4)) / 8.0
    s = crop.sum()
    ii, jj = np.meshgrid(np.arange(cols_), np.arange(rows), indexing="ij")
    m10 = ((ii + 1) * crop.T).sum()
    m01 = ((jj + 1) * crop.T).sum()
    cx, cy = m10 / s, m01 / s
    AR = np.zeros((L + 1, L + 1)); AI = np.zeros((L + 1, L + 1))
    for i in range(cols_):
        x = (i + 1 - cx) / rad
        for j in range(rows):
            y = (j + 1 - cy) / rad
            r2 = x * x + y * y
            r = math.sqrt(r2)
            if r < np.finfo(float).eps or r > 1.0:
                continue
            R = [1.0]
            for n_ in range(1, L + 1):
                R.append(r * R[-1])
            cost = [x / r]; sint = [y / r]
            for m_ in range(1, L + 1):
                cost.append(cost[0] * cost[m_ - 1] - sint[0] * sint[m_ - 1])
                sint.append(cost[0] * sint[m_ - 1] + sint[0] * cost[m_ - 1])
            f = crop[j, i] / s
            for n_ in range(L + 1):
                ct = (n_ + 1) * f / math.pi
                Rnm2 = R[n_ - 2] if n_ >= 2 else 0.0
                Rnmp2 = Rnmp4 = 0.0
                for m_ in range(n_, -1, -2):
                    if m_ == n_:
                        Rnm = R[n_]; Rnmp4 = R[n_]
                    elif m_ == n_ - 2:
                        Rnm = n_ * R[n_] - (n_ - 1) * Rnm2
                        Rnmp2 = Rnm
                    else:
                        Rnm = H1[n_][m_] * Rnmp4 + (H2[n_][m_] + H3[n_][m_] / r2) * Rnmp2
                        Rnmp4 = Rnmp2; Rnmp2 = Rnm
                    AR[n_][m_] += ct * Rnm * cost[m_]
                    AI[n_][m_] -= ct * Rnm * sint[m_]
    out = []
    for n_ in range(L + 1):
        for m_ in range(n_ + 1):
            if (n_ - m_) % 2 == 0:
                out.append(abs(math.sqrt(AR[n_][m_] ** 2 + AI[n_][m_] ** 2)))
    return out


def test_zernike(blob_pair):
    intens, labels = blob_pair
    labs, values, cols, cfg = run_feats(intens, labels, ["ZERNIKE2D"])
    for i, lab in enumerate(labs[:3]):
        ys, xs = np.nonzero(labels == lab)
        sl = (slice(ys.min(), ys.max() + 1), slice(xs.min(), xs.max() + 1))
        crop = np.where(labels[sl] == lab, intens[sl], 0).astype(np.float64)
        if crop.max() == crop.min():
            continue
        want = zernike_oracle(crop)
        row = dict(zip(cols, values[i]))
        for k in range(30):
            assert row["ZERNIKE2D_Z%d" % k] == pytest.approx(
                want[k], rel=1e-7, abs=1e-10), (lab, k)
