"""Minimal DICOM grayscale reader/writer.

The reference reads DICOM through DCMTK behind the USE_DCMTK build gate
(reference: src/nyx/nyxus_dicom_loader.h:4-19, raw_dicom.h).  This
self-contained parser covers the grayscale-CT cases the pipeline needs:
implicit/explicit VR little endian, MONOCHROME1/2, 8/16-bit signed/unsigned
pixels, RescaleSlope/Intercept (Hounsfield).  Compressed transfer syntaxes
(JPEG/JPEG-LS/RLE) are rejected with a clear error.
"""

from __future__ import annotations

import struct

import numpy as np

IMPLICIT_LE = "1.2.840.10008.1.2"
EXPLICIT_LE = "1.2.840.10008.1.2.1"

_LONG_VRS = {b"OB", b"OW", b"OF", b"OD", b"OL", b"SQ", b"UC", b"UR",
             b"UT", b"UN"}


class _Stream:
    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos

    def u16(self):
        v = struct.unpack_from("<H", self.d, self.p)[0]
        self.p += 2
        return v

    def u32(self):
        v = struct.unpack_from("<I", self.d, self.p)[0]
        self.p += 4
        return v

    def raw(self, n):
        v = self.d[self.p:self.p + n]
        self.p += n
        return v

    def eof(self):
        return self.p >= len(self.d)


def _read_element(s: _Stream, explicit: bool):
    group = s.u16()
    elem = s.u16()
    if explicit or group == 0x0002:       # file meta is always explicit
        vr = s.raw(2)
        if vr in _LONG_VRS:
            s.p += 2
            length = s.u32()
        else:
            length = s.u16()
    else:
        vr = b""
        length = s.u32()
    return group, elem, vr, length


def _skip_undefined(s: _Stream):
    """Skip an undefined-length sequence: scan to (FFFE,E0DD) delimiter."""
    pat = struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    i = s.d.find(pat, s.p)
    if i < 0:
        raise ValueError("unterminated DICOM sequence")
    s.p = i + len(pat)


def read_dicom(path: str):
    """(pixel_array [rows, cols], meta dict).  Pixels carry the Rescale
    transform (HU) when slope/intercept are present."""
    with open(path, "rb") as f:
        data = f.read()
    if data[128:132] != b"DICM":
        raise ValueError("not a DICOM part-10 file: %s" % path)
    s = _Stream(data, 132)

    meta = {"ts": EXPLICIT_LE, "bits": 16, "signed": 0, "rows": 0, "cols": 0,
            "slope": None, "intercept": None, "photometric": "MONOCHROME2",
            "samples": 1}
    explicit = True
    pixel_data = None
    while not s.eof():
        group, elem, vr, length = _read_element(s, explicit)
        if length == 0xFFFFFFFF:
            if (group, elem) == (0x7FE0, 0x0010):
                raise ValueError("encapsulated (compressed) DICOM pixel data "
                                 "is not supported; transfer syntax %s"
                                 % meta["ts"])
            _skip_undefined(s)
            continue
        val = s.raw(length)
        if (group, elem) == (0x0002, 0x0010):
            meta["ts"] = val.decode("ascii").strip("\x00 ")
            if meta["ts"] == IMPLICIT_LE:
                explicit = False
            elif meta["ts"] != EXPLICIT_LE:
                raise ValueError("unsupported DICOM transfer syntax %s "
                                 "(only implicit/explicit little endian)"
                                 % meta["ts"])
        elif (group, elem) == (0x0028, 0x0010):
            meta["rows"] = struct.unpack("<H", val[:2])[0]
        elif (group, elem) == (0x0028, 0x0011):
            meta["cols"] = struct.unpack("<H", val[:2])[0]
        elif (group, elem) == (0x0028, 0x0100):
            meta["bits"] = struct.unpack("<H", val[:2])[0]
        elif (group, elem) == (0x0028, 0x0103):
            meta["signed"] = struct.unpack("<H", val[:2])[0]
        elif (group, elem) == (0x0028, 0x0002):
            meta["samples"] = struct.unpack("<H", val[:2])[0]
        elif (group, elem) == (0x0028, 0x0004):
            meta["photometric"] = val.decode("ascii").strip("\x00 ")
        elif (group, elem) == (0x0028, 0x1052):
            meta["intercept"] = float(val.decode("ascii").strip("\x00 "))
        elif (group, elem) == (0x0028, 0x1053):
            meta["slope"] = float(val.decode("ascii").strip("\x00 "))
        elif (group, elem) == (0x7FE0, 0x0010):
            pixel_data = val
            break

    if pixel_data is None:
        raise ValueError("no PixelData in %s" % path)
    if meta["samples"] != 1:
        raise ValueError("only single-sample (grayscale) DICOM is supported")
    dt = {(8, 0): np.uint8, (8, 1): np.int8,
          (16, 0): np.uint16, (16, 1): np.int16,
          (32, 0): np.uint32, (32, 1): np.int32}[(meta["bits"],
                                                  meta["signed"])]
    n = meta["rows"] * meta["cols"]
    arr = np.frombuffer(pixel_data, dt, n).reshape(meta["rows"], meta["cols"])
    if meta["photometric"] == "MONOCHROME1":   # inverted scale
        arr = arr.max() - arr
    if meta["slope"] is not None or meta["intercept"] is not None:
        sl = 1.0 if meta["slope"] is None else meta["slope"]
        ic = 0.0 if meta["intercept"] is None else meta["intercept"]
        hu = arr.astype(np.float64) * sl + ic
        if float(sl).is_integer() and float(ic).is_integer():
            arr = hu.astype(np.int32)
        else:
            arr = hu
    return arr, meta


def read_dicom_gray(path: str) -> np.ndarray:
    return read_dicom(path)[0]


def _el(group, elem, vr: bytes, val: bytes) -> bytes:
    if len(val) % 2:
        val += b"\x00" if vr != b"UI" else b"\x00"
    head = struct.pack("<HH", group, elem) + vr
    if vr in _LONG_VRS:
        return head + b"\x00\x00" + struct.pack("<I", len(val)) + val
    return head + struct.pack("<H", len(val)) + val


def write_dicom_gray(path: str, arr: np.ndarray, slope: float = None,
                     intercept: float = None):
    """Write a minimal explicit-VR-little-endian grayscale DICOM (tests and
    dataset fabrication)."""
    arr = np.ascontiguousarray(arr)
    signed = arr.dtype.kind == "i"
    bits = arr.dtype.itemsize * 8
    if bits not in (8, 16, 32):
        raise ValueError("unsupported dtype %s" % arr.dtype)
    meta_body = _el(0x0002, 0x0010, b"UI", EXPLICIT_LE.encode())
    out = [b"\x00" * 128, b"DICM",
           _el(0x0002, 0x0000, b"UL", struct.pack("<I", len(meta_body))),
           meta_body,
           _el(0x0008, 0x0060, b"CS", b"CT"),
           _el(0x0028, 0x0002, b"US", struct.pack("<H", 1)),
           _el(0x0028, 0x0004, b"CS", b"MONOCHROME2"),
           _el(0x0028, 0x0010, b"US", struct.pack("<H", arr.shape[0])),
           _el(0x0028, 0x0011, b"US", struct.pack("<H", arr.shape[1])),
           _el(0x0028, 0x0100, b"US", struct.pack("<H", bits)),
           _el(0x0028, 0x0101, b"US", struct.pack("<H", bits)),
           _el(0x0028, 0x0102, b"US", struct.pack("<H", bits - 1)),
           _el(0x0028, 0x0103, b"US", struct.pack("<H", 1 if signed else 0))]
    if intercept is not None:
        out.append(_el(0x0028, 0x1052, b"DS", str(intercept).encode()))
    if slope is not None:
        out.append(_el(0x0028, 0x1053, b"DS", str(slope).encode()))
    vr = b"OW" if bits > 8 else b"OB"
    out.append(_el(0x7FE0, 0x0010, vr, arr.tobytes()))
    with open(path, "wb") as f:
        f.write(b"".join(out))
