"""IMQ family tests: focus score vs direct numpy, saturation exactness."""

import numpy as np
import pytest
from scipy import signal

from nyxus_tpu import ImageQuality


@pytest.fixture(scope="module")
def imq_df():
    r = np.random.default_rng(11)
    img = r.integers(0, 4000, (48, 56)).astype(np.uint16)
    df = ImageQuality().featurize(img)
    return img, df.iloc[0]


def test_focus_score(imq_df):
    img, row = imq_df
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], float)
    lap = signal.convolve2d(img.astype(float), k, mode="same", boundary="fill")
    a = np.abs(lap)
    want = ((a - a.mean()) ** 2).mean()
    assert row.FOCUS_SCORE == pytest.approx(want, rel=1e-9)


def test_local_focus_score_quadrant(imq_df):
    """Even dims: the reference's tile loop visits only the top-left tile."""
    img, row = imq_df
    k = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], float)
    tile = img[:24, :28].astype(float)
    lap = signal.convolve2d(tile, k, mode="same", boundary="fill")
    a = np.abs(lap)
    want = ((a - a.mean()) ** 2).mean() / 4
    assert row.LOCAL_FOCUS_SCORE == pytest.approx(want, rel=1e-9)


def test_saturation(imq_df):
    img, row = imq_df
    assert row.MIN_SATURATION == (img == img.min()).sum() / img.size
    assert row.MAX_SATURATION == (img == img.max()).sum() / img.size


def test_sharpness_finite(imq_df):
    img, row = imq_df
    assert np.isfinite(row.SHARPNESS) and row.SHARPNESS >= 0
    assert np.isfinite(row.POWER_SPECTRUM_SLOPE)
