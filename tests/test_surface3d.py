"""D3_SurfaceFeature oracle tests (reference: src/nyx/features/3d_surface.cpp).

Analytic oracles on a solid box, plus eigen-axis checks on an anisotropic
blob against a direct numpy covariance computation.
"""

import math

import numpy as np
import pytest

from nyxus_tpu import Nyxus3D

FEATS = ["3AREA", "3VOXEL_VOLUME", "3MESH_VOLUME", "3VOLUME_CONVEXHULL",
         "3AREA_2_VOLUME", "3COMPACTNESS1", "3COMPACTNESS2", "3SPHERICITY",
         "3SPHERICAL_DISPROPORTION", "3MAJOR_AXIS_LEN", "3MINOR_AXIS_LEN",
         "3LEAST_AXIS_LEN", "3ELONGATION", "3FLATNESS"]


def run(lvol, ivol=None):
    if ivol is None:
        ivol = np.full(lvol.shape, 7, np.uint16)
    return Nyxus3D(FEATS).featurize([ivol], [lvol]).iloc[0]


def test_box_surface():
    """A dz x dy x dx solid box: exposed-face area and packed voxel volume
    are closed-form."""
    dz, dy, dx = 4, 6, 10
    lvol = np.zeros((8, 12, 16), np.uint16)
    lvol[2:2 + dz, 3:3 + dy, 4:4 + dx] = 1
    row = run(lvol)
    n = dz * dy * dx
    assert row["3AREA"] == 2 * (dz * dy + dz * dx + dy * dx)
    # VOXEL_VOLUME = n * (4/3 pi (1/2)^3) / 0.5236 (3d_surface.cpp:361)
    want_vv = n * (4.0 / 3.0 * math.pi / 8.0) / 0.5236
    assert row["3VOXEL_VOLUME"] == pytest.approx(want_vv, rel=1e-12)
    a, vv = row["3AREA"], row["3VOXEL_VOLUME"]
    assert row["3AREA_2_VOLUME"] == pytest.approx(a / vv)
    assert row["3COMPACTNESS1"] == pytest.approx(vv / math.sqrt(math.pi * a ** 3))
    assert row["3COMPACTNESS2"] == pytest.approx(36 * math.pi * vv * vv / a ** 3)
    assert row["3SPHERICITY"] == pytest.approx(
        (36 * math.pi * vv * vv) ** (1 / 3) / a)
    assert row["3SPHERICAL_DISPROPORTION"] == pytest.approx(
        a / (36 * math.pi * vv * vv) ** (1 / 3))
    # hull of a box: its own volume (qhull over the voxel-center lattice)
    assert row["3VOLUME_CONVEXHULL"] == pytest.approx(
        (dz - 1) * (dy - 1) * (dx - 1))
    assert row["3MESH_VOLUME"] == row["3VOLUME_CONVEXHULL"]


def test_axis_lengths_vs_cov():
    """Eigen axes of an anisotropic ellipsoid vs direct covariance eigvals
    (3d_surface.cpp axis-length convention: 4 sqrt(lambda))."""
    zz, yy, xx = np.mgrid[0:20, 0:30, 0:40]
    m = (((zz - 10) / 4.0) ** 2 + ((yy - 15) / 8.0) ** 2 +
         ((xx - 20) / 14.0) ** 2) <= 1.0
    lvol = m.astype(np.uint16)
    row = run(lvol)
    pts = np.stack(np.nonzero(m), 1)[:, ::-1].astype(float)  # x, y, z
    L = np.sort(np.linalg.eigvalsh(np.cov(pts.T, bias=False)))[::-1]
    assert row["3MAJOR_AXIS_LEN"] == pytest.approx(4 * math.sqrt(L[0]), rel=1e-9)
    assert row["3MINOR_AXIS_LEN"] == pytest.approx(4 * math.sqrt(L[1]), rel=1e-9)
    assert row["3LEAST_AXIS_LEN"] == pytest.approx(4 * math.sqrt(L[2]), rel=1e-9)
    assert row["3ELONGATION"] == pytest.approx(math.sqrt(L[1] / L[0]), rel=1e-9)
    assert row["3FLATNESS"] == pytest.approx(math.sqrt(L[2] / L[0]), rel=1e-9)
    # sanity: axes ordered and elongation/flatness in (0, 1]
    assert row["3MAJOR_AXIS_LEN"] >= row["3MINOR_AXIS_LEN"] >= row["3LEAST_AXIS_LEN"]
    assert 0 < row["3FLATNESS"] <= row["3ELONGATION"] <= 1


def test_single_voxel():
    lvol = np.zeros((3, 3, 3), np.uint16)
    lvol[1, 1, 1] = 1
    row = run(lvol)
    assert row["3AREA"] == 6
    assert row["3MAJOR_AXIS_LEN"] == 0.0 and row["3FLATNESS"] == 0.0
