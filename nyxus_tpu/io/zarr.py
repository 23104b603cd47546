"""OME-Zarr (zarr v2) reader/writer.

The reference reads OME-Zarr through z5+blosc behind the USE_Z5 build gate
(reference: src/nyx/omezarr.h:25-60 -- multiscales[0].datasets[0].path, 5D
TCZYX arrays, chunked).  This implementation is self-contained: JSON metadata
parsed here, chunk payloads decoded natively (``native.blosc_decompress``)
or via stdlib zlib/gzip; supports compressor null/zlib/gzip/blosc(lz4|zlib).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np


def _decode_chunk(raw: bytes, compressor, nbytes: int) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    if cid == "blosc":
        from .. import native
        return native.blosc_decompress(raw, nbytes)
    if cid in ("zlib", "gzip"):
        # gzip chunks carry the gzip wrapper; zlib the bare stream
        return zlib.decompress(raw, 47)  # auto-detect zlib/gzip headers
    raise ValueError("unsupported zarr compressor: %r" % cid)


def _encode_chunk(buf: bytes, compressor, itemsize: int) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    if cid == "blosc":
        from .. import native
        return native.blosc_compress_lz4(buf, itemsize, shuffle=True)
    if cid == "zlib":
        return zlib.compress(buf, compressor.get("level", 1))
    raise ValueError("unsupported zarr compressor: %r" % cid)


class ZarrArray:
    """One zarr-v2 array directory (.zarray + chunk files)."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, ".zarray")) as f:
            meta = json.load(f)
        if meta.get("zarr_format", 2) != 2:
            raise ValueError("only zarr v2 is supported")
        if meta.get("order", "C") != "C":
            raise ValueError("only C-order zarr arrays are supported")
        self.shape = tuple(meta["shape"])
        self.chunks = tuple(meta["chunks"])
        self.dtype = np.dtype(meta["dtype"])
        self.compressor = meta.get("compressor")
        self.fill_value = meta.get("fill_value", 0) or 0
        self.sep = meta.get("dimension_separator", ".")
        if len(self.chunks) != len(self.shape):
            raise ValueError("chunks/shape rank mismatch")

    def _chunk_path(self, idx):
        return os.path.join(self.path, self.sep.join(str(i) for i in idx))

    def read_chunk(self, idx):
        """Dense chunk [self.chunks]; missing chunk files = fill_value."""
        p = self._chunk_path(idx)
        n = int(np.prod(self.chunks))
        if not os.path.exists(p):
            return np.full(self.chunks, self.fill_value, self.dtype)
        with open(p, "rb") as f:
            raw = f.read()
        buf = _decode_chunk(raw, self.compressor, n * self.dtype.itemsize)
        return np.frombuffer(buf, self.dtype, n).reshape(self.chunks)

    def read_full(self) -> np.ndarray:
        out = np.full(self.shape, self.fill_value, self.dtype)
        grid = [range(-(-s // c)) for s, c in zip(self.shape, self.chunks)]
        import itertools
        for idx in itertools.product(*grid):
            ch = self.read_chunk(idx)
            sl_out, sl_in = [], []
            for d, (i, c, s) in enumerate(zip(idx, self.chunks, self.shape)):
                lo = i * c
                hi = min(lo + c, s)
                sl_out.append(slice(lo, hi))
                sl_in.append(slice(0, hi - lo))
            out[tuple(sl_out)] = ch[tuple(sl_in)]
        return out

    def read_region(self, starts, sizes) -> np.ndarray:
        """Dense region [sizes] at [starts]; only touched chunks decode."""
        out = np.full(tuple(sizes), self.fill_value, self.dtype)
        import itertools
        grid = []
        for st, sz, c in zip(starts, sizes, self.chunks):
            grid.append(range(st // c, -(-(st + sz) // c)))
        for idx in itertools.product(*grid):
            ch = self.read_chunk(idx)
            sl_out, sl_in = [], []
            skip = False
            for d, i in enumerate(idx):
                c = self.chunks[d]
                lo = max(i * c, starts[d])
                hi = min((i + 1) * c, starts[d] + sizes[d], self.shape[d])
                if hi <= lo:
                    skip = True
                    break
                sl_out.append(slice(lo - starts[d], hi - starts[d]))
                sl_in.append(slice(lo - i * c, hi - i * c))
            if not skip:
                out[tuple(sl_out)] = ch[tuple(sl_in)]
        return out


class OmeZarrReader:
    """OME-Zarr container: resolves multiscales[0].datasets[0].path like the
    reference loader (omezarr.h:44-48) and views the array as 5D TCZYX."""

    def __init__(self, path: str):
        attrs_p = os.path.join(path, ".zattrs")
        ds_path = path
        if os.path.exists(attrs_p):
            with open(attrs_p) as f:
                attrs = json.load(f)
            ms = attrs.get("multiscales")
            if ms:
                ds_path = os.path.join(path, ms[0]["datasets"][0]["path"])
        self.arr = ZarrArray(ds_path)
        # left-pad shape to 5D TCZYX
        s = self.arr.shape
        if len(s) > 5:
            raise ValueError("zarr arrays beyond 5D are not supported")
        self.shape5 = (1,) * (5 - len(s)) + tuple(s)
        self.nt, self.nc, self.nz, self.height, self.width = self.shape5

    def read_slice(self, t=0, c=0, z=0) -> np.ndarray:
        """[Y, X] plane."""
        nd = len(self.arr.shape)
        lead = [t, c, z][5 - nd:] if nd > 2 else []
        starts = lead + [0, 0]
        sizes = [1] * (nd - 2) + [self.height, self.width]
        return self.arr.read_region(starts, sizes).reshape(self.height,
                                                           self.width)

    def read_volume(self, t=0, c=0) -> np.ndarray:
        """[Z, Y, X] volume."""
        nd = len(self.arr.shape)
        if nd == 2:
            return self.read_slice()[None]
        lead = [t, c][5 - nd:] if nd > 3 else []
        starts = lead + [0, 0, 0]
        sizes = [1] * (nd - 3) + [self.nz, self.height, self.width]
        return self.arr.read_region(starts, sizes).reshape(
            self.nz, self.height, self.width)


def write_zarr(path: str, arr: np.ndarray, chunks=None, compressor="blosc"):
    """Write an OME-Zarr container (root .zattrs multiscales -> dataset '0')
    with the array stored 5D TCZYX, mirroring the layout the reference
    expects (omezarr.h:44-56)."""
    a5 = arr.reshape((1,) * (5 - arr.ndim) + arr.shape)
    if chunks is None:
        chunks = (1, 1, 1, min(256, a5.shape[3]), min(256, a5.shape[4]))
    comp = None
    if compressor == "blosc":
        comp = {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1,
                "blocksize": 0}
    elif compressor == "zlib":
        comp = {"id": "zlib", "level": 1}
    ds = os.path.join(path, "0")
    os.makedirs(ds, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": 2}, f)
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump({"multiscales": [{"version": "0.4", "name": "image",
                                    "datasets": [{"path": "0"}]}]}, f)
    meta = {
        "zarr_format": 2,
        "shape": list(a5.shape),
        "chunks": list(chunks),
        "dtype": a5.dtype.str,
        "compressor": comp,
        "fill_value": 0,
        "order": "C",
        "filters": None,
        "dimension_separator": ".",
    }
    with open(os.path.join(ds, ".zarray"), "w") as f:
        json.dump(meta, f)
    import itertools
    grid = [range(-(-s // c)) for s, c in zip(a5.shape, chunks)]
    for idx in itertools.product(*grid):
        block = np.zeros(chunks, a5.dtype)
        sl_src, sl_dst = [], []
        for d, i in enumerate(idx):
            lo = i * chunks[d]
            hi = min(lo + chunks[d], a5.shape[d])
            sl_src.append(slice(lo, hi))
            sl_dst.append(slice(0, hi - lo))
        block[tuple(sl_dst)] = a5[tuple(sl_src)]
        payload = _encode_chunk(block.tobytes(), comp, a5.dtype.itemsize)
        with open(os.path.join(ds, ".".join(str(i) for i in idx)), "wb") as f:
            f.write(payload)
