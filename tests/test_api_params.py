"""API-surface tests: metaparameters, Gabor customization, environment
params, and device introspection (reference: nyxus.py:252-289,660-770,
env_metaparams.cpp:63-382)."""

import numpy as np
import pytest

from nyxus_tpu import Nyxus, Nyxus3D, gpu_is_available, get_gpu_properties

from conftest import make_blobs


def test_metaparam_roundtrip():
    nyx = Nyxus(["GLCM_CONTRAST"])
    assert nyx.get_metaparam("glcm/greydepth") == 64.0   # default fallback
    nyx.set_metaparam("glcm/greydepth=25")
    assert nyx.get_metaparam("glcm/greydepth") == 25.0
    nyx.set_metaparam("glcm/offset=2")
    assert nyx.get_metaparam("glcm/offset") == 2.0


def test_metaparam_3d_paths():
    nyx = Nyxus3D(["3GLCM_CONTRAST"])
    for p, v in (("3glcm/greydepth", 32), ("3glcm/offset", 2),
                 ("3gldm/greydepth", 16), ("3ngtdm/greydepth", 8),
                 ("3ngtdm/radius", 2), ("3glrlm/greydepth", 12),
                 ("3glszm/greydepth", 10)):
        nyx.set_metaparam("%s=%d" % (p, v))
        assert nyx.get_metaparam(p) == float(v), p


def test_metaparam_errors():
    nyx = Nyxus(["MEAN"])
    with pytest.raises(ValueError):
        nyx.set_metaparam("glcm/greydepth")        # no '='
    with pytest.raises(ValueError):
        nyx.set_metaparam("glcm/bogus=1")          # unknown param
    with pytest.raises(ValueError):
        nyx.set_metaparam("bogusfam/greydepth=1")  # unknown family
    with pytest.raises(ValueError):
        nyx.set_metaparam("glcm/greydepth=abc")    # non-integer
    with pytest.raises(ValueError):
        nyx.set_metaparam("3ngtdm/radius=0")       # must be positive
    with pytest.raises(NameError):
        nyx.get_metaparam("glcm/bogus")


def test_metaparam_changes_glcm_result():
    intens, labels = make_blobs(64, 64, 3, seed=3)
    nyx = Nyxus(["GLCM_CONTRAST"])
    a = nyx.featurize(intens.astype(np.uint16), labels)
    nyx.set_metaparam("glcm/greydepth=8")
    b = nyx.featurize(intens.astype(np.uint16), labels)
    assert not np.allclose(a.iloc[:, 4:].values, b.iloc[:, 4:].values)


def test_set_gabor_feature_params():
    nyx = Nyxus(["GABOR"])
    nyx.set_gabor_feature_params(kersize=10, gamma=0.2, sig2lam=0.9,
                                 f0=0.2, thold=0.05,
                                 thetas=[0, 30, 60, 90],
                                 freqs=[2, 4, 8, 16])
    p = nyx.get_params()
    assert p["gabor_kersize"] == 10
    assert p["gabor_thetas"] == [0, 30, 60, 90]
    assert p["gabor_freqs"] == [2, 4, 8, 16]
    with pytest.raises(ValueError):
        nyx.set_gabor_feature_params(bogus=1)
    with pytest.raises(IOError):
        nyx.set_gabor_feature_params()
    with pytest.raises(ValueError):
        nyx.set_gabor_feature_params(thetas=[0, 45])   # freqs missing


def test_set_environment_params():
    nyx = Nyxus(["MEAN"])
    nyx.set_environment_params(coarse_gray_depth=32, neighbor_distance=7)
    p = nyx.get_params("coarse_gray_depth", "neighbor_distance")
    assert p == {"coarse_gray_depth": 32, "neighbor_distance": 7}


def test_device_introspection():
    # on the CPU test mesh there is no accelerator; the call contract is
    # what matters (reference: functions.py:3-6)
    avail = gpu_is_available()
    props = get_gpu_properties()
    assert isinstance(avail, bool) or avail in (True, False)
    assert isinstance(props, list)
    if avail:
        assert props and "platform" in props[0]


def test_inmemory_arrow_output(tmp_path):
    pytest.importorskip("pyarrow")
    intens, labels = make_blobs(64, 64, 3, seed=5)
    nyx = Nyxus(["MEAN", "AREA_PIXELS_COUNT"])
    out = nyx.featurize(intens.astype(np.uint16), labels,
                        output_type="arrowipc",
                        output_path=str(tmp_path / "out"))
    assert out == nyx.get_arrow_ipc_file()
    import pyarrow.ipc as ipc
    with ipc.open_file(out) as rd:
        t = rd.read_all()
    assert "MEAN" in t.column_names
    assert t.num_rows == 3


def test_mergerois_single_foreground_roi():
    """--mergerois collapses every nonzero label into one ROI
    (reference: environment.h:56-60, phase1.cpp:76)."""
    import numpy as np
    from nyxus_tpu import Nyxus
    intens = np.zeros((32, 32), np.uint16)
    labels = np.zeros((32, 32), np.int32)
    intens[2:10, 2:10] = 100; labels[2:10, 2:10] = 7
    intens[20:30, 20:30] = 200; labels[20:30, 20:30] = 9
    merged = Nyxus(["AREA_PIXELS_COUNT", "MEAN"], mergerois=True).featurize(
        intens, labels)
    assert len(merged) == 1
    assert merged["ROI_label"][0] == 1
    assert merged["AREA_PIXELS_COUNT"][0] == 8 * 8 + 10 * 10
    want_mean = (100 * 64 + 200 * 100) / 164
    assert merged["MEAN"][0] == pytest.approx(want_mean, rel=1e-6)  # f32 path
    # without the flag: two ROIs
    plain = Nyxus(["AREA_PIXELS_COUNT"]).featurize(intens, labels)
    assert sorted(plain["ROI_label"]) == [7, 9]
