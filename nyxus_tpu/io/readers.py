"""Image readers.

The reference uses native libtiff/z5/DCMTK/NIfTI loaders (src/nyx/
grayscale_tiff.h, omezarr.h, nyxus_dicom_loader.h, raw_nifti.*).  Here the
interim reader stack is PIL/OpenCV-based (whole-image), with the native C++
tiled reader as the planned fast path for tile-streamed slides.
"""

from __future__ import annotations

import os

import numpy as np


def read_gray(path: str) -> np.ndarray:
    """Read a grayscale image (TIFF/PNG/...) as a 2D numpy array, preserving
    bit depth."""
    ext = os.path.splitext(path)[1].lower()
    try:
        from PIL import Image
        Image.MAX_IMAGE_PIXELS = None
        with Image.open(path) as im:
            arr = np.array(im)
            if arr.ndim == 3:
                arr = arr[..., 0]
            return arr
    except Exception:
        pass
    import cv2
    arr = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
    if arr is None:
        raise IOError("cannot read image: %s" % path)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr


def write_gray(path: str, arr: np.ndarray):
    from PIL import Image
    Image.fromarray(arr).save(path)
