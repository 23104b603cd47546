"""Multi-device scale-out: 1-device vs N-device mesh parity.

The JAX analog of the reference's thread-count invariance (results must not
depend on --reduceThreads): sharding the ROI batch axis over a mesh must
reproduce the single-device values exactly.
"""

import numpy as np
import pytest

import jax

from nyxus_tpu.api import Nyxus
from nyxus_tpu import parallel as par

FEATS = ["*ALL_INTENSITY*", "*ALL_GLCM*", "*BASIC_MORPHOLOGY*",
         "*ALL_NGTDM*", "PERIMETER", "SOLIDITY"]


def _vals(df):
    return df[df.columns[4:]].to_numpy(float)


def test_mesh_parity_8dev(blob_pair):
    I, L = blob_pair
    d1 = Nyxus(FEATS, precision="f64").featurize(I, L)
    d8 = Nyxus(FEATS, precision="f64", n_devices=-1).featurize(I, L)
    assert list(d1.columns) == list(d8.columns)
    np.testing.assert_allclose(_vals(d1), _vals(d8), rtol=1e-12, atol=1e-12)


def test_mesh_parity_8dev_f32(blob_pair):
    # f32 default: XLA may fuse differently per shard size, so only
    # round-off-level drift is allowed
    I, L = blob_pair
    d1 = Nyxus(FEATS).featurize(I, L)
    d8 = Nyxus(FEATS, n_devices=-1).featurize(I, L)
    np.testing.assert_allclose(_vals(d1), _vals(d8), rtol=2e-5, atol=1e-6)


def test_mesh_parity_batch_smaller_than_mesh():
    # 3 ROIs on an 8-device mesh exercises the row-padding path
    from conftest import make_blobs
    I, L = make_blobs(h=96, w=96, n_blobs=3, seed=3)
    d1 = Nyxus(FEATS, precision="f64").featurize(I, L)
    d8 = Nyxus(FEATS, precision="f64", n_devices=8).featurize(I, L)
    np.testing.assert_allclose(_vals(d1), _vals(d8), rtol=1e-12, atol=1e-12)


def test_mesh_parity_streamed(tmp_path, blob_pair):
    # file-backed (tile-streamed) path under a mesh
    from nyxus_tpu.native import write_tiff
    I, L = blob_pair
    ip = str(tmp_path / "int.tif")
    lp = str(tmp_path / "seg.tif")
    write_tiff(ip, I.astype(np.uint16))
    write_tiff(lp, L.astype(np.uint16))
    d1 = Nyxus(FEATS, precision="f64").featurize_files([ip], [lp])
    d4 = Nyxus(FEATS, precision="f64", n_devices=4).featurize_files([ip], [lp])
    np.testing.assert_allclose(_vals(d1), _vals(d4), rtol=1e-12, atol=1e-12)


def test_roi_mesh_sizes():
    m = par.roi_mesh()
    assert m.devices.size == len(jax.devices())
    m2 = par.roi_mesh(2)
    assert m2.devices.size == 2
    with pytest.raises(ValueError):
        par.roi_mesh(10_000)


def test_shard_batch_pads_and_shards():
    m = par.roi_mesh(4)
    a = np.arange(6, dtype=np.float32)[:, None] * np.ones((6, 3), np.float32)
    (sa,), b = par.shard_batch(m, (a,))
    assert b == 6 and sa.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(sa)[:6], a)
    np.testing.assert_array_equal(np.asarray(sa)[6:],
                                  np.tile(a[:1], (2, 1)))  # row-0 padding


def test_mesh_parity_3d(blob_volume):
    from nyxus_tpu.api import Nyxus3D
    I, L = blob_volume
    feats = ["*3D_ALL_INTENSITY*", "*3D_GLCM*"]
    d1 = Nyxus3D(feats, precision="f64").featurize(I, L)
    d8 = Nyxus3D(feats, precision="f64", n_devices=8).featurize(I, L)
    np.testing.assert_allclose(_vals(d1), _vals(d8), rtol=1e-12, atol=1e-12)


def test_use_gpu_device():
    nyx = Nyxus(["MEAN"])
    nyx.use_gpu_device(-1)          # default placement is always valid
    with pytest.raises(ValueError):
        nyx.use_gpu_device(10_000)


def test_process_shard_single_process():
    items = list(range(7))
    assert par.process_shard(items) == items  # 1 process -> everything
