"""OME-Zarr reader/writer: zarr v2 and zarr v3 (incl. sharding).

The reference reads OME-Zarr through z5+blosc behind the USE_Z5 build gate
(reference: src/nyx/omezarr.h:25-60 -- multiscales[0].datasets[0].path, 5D
TCZYX arrays, chunked).  This implementation is self-contained: JSON metadata
parsed here, chunk payloads decoded natively (``native.blosc_decompress``)
or via stdlib zlib/gzip.

v2: .zarray/.zattrs, compressor null/zlib/gzip/blosc(lz4|zlib).
v3: zarr.json metadata, default/v2 chunk key encodings, codec chains
bytes(+endian)/blosc/gzip/crc32c, and the ``sharding_indexed`` codec
(inner-chunk grid with an offset/nbytes index at either end of the shard).
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


_V3_DTYPES = {
    "bool": "|b1", "int8": "|i1", "uint8": "|u1",
    "int16": "<i2", "uint16": "<u2", "int32": "<i4", "uint32": "<u4",
    "int64": "<i8", "uint64": "<u8", "float32": "<f4", "float64": "<f8",
}


class ZarrArrayV3(ZarrArray):
    """One zarr-v3 array directory (zarr.json + c/.. chunk keys)."""

    def __init__(self, path: str):           # noqa: super not called
        self.path = path
        with open(os.path.join(path, "zarr.json")) as f:
            meta = json.load(f)
        if meta.get("zarr_format") != 3 or meta.get("node_type") != "array":
            raise ValueError("not a zarr v3 array")
        self.shape = tuple(meta["shape"])
        grid = meta["chunk_grid"]
        if grid.get("name") != "regular":
            raise ValueError("only regular chunk grids are supported")
        self.chunks = tuple(grid["configuration"]["chunk_shape"])
        self.dtype = np.dtype(_V3_DTYPES[meta["data_type"]])
        self.fill_value = meta.get("fill_value", 0) or 0
        kenc = meta.get("chunk_key_encoding",
                        {"name": "default"})
        self._key_v2 = kenc.get("name") == "v2"
        self._sep = kenc.get("configuration", {}).get(
            "separator", "." if self._key_v2 else "/")
        self.codecs = meta.get("codecs",
                               [{"name": "bytes"}])
        # sharding: the outer "chunk" is a shard of inner chunks
        self.shard_cfg = None
        if self.codecs and self.codecs[0].get("name") == "sharding_indexed":
            self.shard_cfg = self.codecs[0]["configuration"]
        if len(self.chunks) != len(self.shape):
            raise ValueError("chunks/shape rank mismatch")

    def _chunk_path(self, idx):
        if self._key_v2:
            return os.path.join(self.path,
                                self._sep.join(str(i) for i in idx))
        return os.path.join(self.path,
                            "c" + self._sep + self._sep.join(
                                str(i) for i in idx))

    @staticmethod
    def _apply_codecs(raw, codecs, nbytes):
        for codec in reversed(codecs):
            name = codec.get("name")
            if name == "bytes":
                if codec.get("configuration", {}).get("endian",
                                                      "little") != "little":
                    raise ValueError("big-endian zarr v3 is not supported")
            elif name == "blosc":
                from .. import native
                raw = native.blosc_decompress(raw, nbytes)
            elif name in ("gzip", "zlib"):
                raw = zlib.decompress(raw, 47)
            elif name == "crc32c":
                raw = raw[:-4]                 # checksum not re-verified
            else:
                raise ValueError("unsupported zarr v3 codec: %r" % name)
        return raw

    def read_chunk(self, idx):
        p = self._chunk_path(idx)
        n = int(np.prod(self.chunks))
        nbytes = n * self.dtype.itemsize
        if not os.path.exists(p):
            return np.full(self.chunks, self.fill_value, self.dtype)
        with open(p, "rb") as f:
            raw = f.read()
        if self.shard_cfg is None:
            buf = self._apply_codecs(raw, self.codecs, nbytes)
            return np.frombuffer(buf, self.dtype, n).reshape(self.chunks)
        return self._read_shard(raw)

    def _read_shard(self, raw):
        """sharding_indexed: inner chunks + (offset, nbytes) u64-pair index
        at index_location (spec: C-order inner grid; 2^64-1 = missing)."""
        cfg = self.shard_cfg
        inner = tuple(cfg["chunk_shape"])
        per_ax = [s // i for s, i in zip(self.chunks, inner)]
        n_inner = int(np.prod(per_ax))
        idx_codecs = cfg.get("index_codecs", [{"name": "bytes"}])
        idx_bytes = n_inner * 16
        if any(c.get("name") == "crc32c" for c in idx_codecs):
            idx_bytes += 4
        if cfg.get("index_location", "end") == "start":
            idx_raw = raw[:idx_bytes]
        else:
            idx_raw = raw[-idx_bytes:]
        idx_raw = self._apply_codecs(idx_raw, idx_codecs, n_inner * 16)
        table = np.frombuffer(idx_raw, "<u8", n_inner * 2).reshape(-1, 2)
        n_in = int(np.prod(inner))
        out = np.full(self.chunks, self.fill_value, self.dtype)
        import itertools
        missing = np.uint64(0xFFFFFFFFFFFFFFFF)
        for k, ii in enumerate(itertools.product(*[range(p)
                                                   for p in per_ax])):
            off, nb = table[k]
            if off == missing:
                continue
            payload = raw[int(off):int(off) + int(nb)]
            buf = self._apply_codecs(payload, cfg.get("codecs",
                                                      [{"name": "bytes"}]),
                                     n_in * self.dtype.itemsize)
            block = np.frombuffer(buf, self.dtype, n_in).reshape(inner)
            sl = tuple(slice(i * c, (i + 1) * c)
                       for i, c in zip(ii, inner))
            out[sl] = block
        return out


def open_array(path: str) -> ZarrArray:
    """v2 or v3 array at ``path`` by metadata sniffing."""
    if os.path.exists(os.path.join(path, "zarr.json")):
        return ZarrArrayV3(path)
    return ZarrArray(path)


class OmeZarrReader:
    """OME-Zarr container: resolves multiscales[0].datasets[0].path like the
    reference loader (omezarr.h:44-48) and views the array as 5D TCZYX.
    Handles v2 (.zattrs) and v3 (zarr.json group attributes / OME 0.5)."""

    def __init__(self, path: str):
        ds_path = path
        v3_group = os.path.join(path, "zarr.json")
        attrs = None
        if os.path.exists(v3_group):
            with open(v3_group) as f:
                gmeta = json.load(f)
            if gmeta.get("node_type") == "group":
                a = gmeta.get("attributes", {})
                attrs = a.get("ome", a)     # OME 0.5 nests under "ome"
        elif os.path.exists(os.path.join(path, ".zattrs")):
            with open(os.path.join(path, ".zattrs")) as f:
                attrs = json.load(f)
        if attrs:
            ms = attrs.get("multiscales")
            if ms:
                ds_path = os.path.join(path, ms[0]["datasets"][0]["path"])
        self.arr = open_array(ds_path)
        # left-pad shape to 5D TCZYX
        s = self.arr.shape
        if len(s) > 5:
            raise ValueError("zarr arrays beyond 5D are not supported")
        self.shape5 = (1,) * (5 - len(s)) + tuple(s)
        self.nt, self.nc, self.nz, self.height, self.width = self.shape5

    def read_slice(self, t=0, c=0, z=0) -> np.ndarray:
        """[Y, X] plane."""
        return self.read_plane_region(0, 0, self.height, self.width, t, c, z)

    def read_plane_region(self, y0, x0, h, w, t=0, c=0, z=0) -> np.ndarray:
        """[h, w] region of one plane; only touched chunks decode (the
        reference's tile-loader access pattern, omezarr.h:10-48).  Regions
        beyond the image bounds read as the array fill value."""
        nd = len(self.arr.shape)
        lead = [t, c, z][5 - nd:] if nd > 2 else []
        h_in = max(0, min(self.height - y0, h))
        w_in = max(0, min(self.width - x0, w))
        if h_in < h or w_in < w:
            out = np.zeros((h, w), self.arr.dtype)
            if h_in > 0 and w_in > 0:
                out[:h_in, :w_in] = self.read_plane_region(
                    y0, x0, h_in, w_in, t, c, z)
            return out
        starts = lead + [y0, x0]
        sizes = [1] * (nd - 2) + [h, w]
        return self.arr.read_region(starts, sizes).reshape(h, w)

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


def write_zarr_v3(path: str, arr: np.ndarray, chunks=None, codec="gzip",
                  shards=None):
    """Write an OME-Zarr 0.5 container in zarr v3 layout (group zarr.json
    with ome.multiscales -> dataset '0').  ``shards``: outer shard shape in
    elements -> the array is stored with the sharding_indexed codec
    (index at end, bytes index codecs); ``chunks`` is then the INNER chunk
    shape."""
    import itertools
    a5 = arr.reshape((1,) * (5 - arr.ndim) + arr.shape)
    if chunks is None:
        chunks = (1, 1, 1, min(128, a5.shape[3]), min(128, a5.shape[4]))
    dt_name = {v: k for k, v in _V3_DTYPES.items()}[a5.dtype.str]
    inner_codecs = [{"name": "bytes",
                     "configuration": {"endian": "little"}}]
    if codec == "gzip":
        inner_codecs.append({"name": "gzip", "configuration": {"level": 1}})

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "group",
                   "attributes": {"ome": {"version": "0.5", "multiscales": [
                       {"name": "image",
                        "datasets": [{"path": "0"}]}]}}}, f)
    ds = os.path.join(path, "0")
    os.makedirs(ds, exist_ok=True)

    if shards is None:
        meta_codecs = inner_codecs
        outer = tuple(chunks)
    else:
        outer = tuple(shards)
        meta_codecs = [{"name": "sharding_indexed", "configuration": {
            "chunk_shape": list(chunks), "codecs": inner_codecs,
            "index_codecs": [{"name": "bytes",
                              "configuration": {"endian": "little"}}],
            "index_location": "end"}}]
    with open(os.path.join(ds, "zarr.json"), "w") as f:
        json.dump({"zarr_format": 3, "node_type": "array",
                   "shape": list(a5.shape), "data_type": dt_name,
                   "chunk_grid": {"name": "regular", "configuration":
                                  {"chunk_shape": list(outer)}},
                   "chunk_key_encoding": {"name": "default", "configuration":
                                          {"separator": "/"}},
                   "fill_value": 0, "codecs": meta_codecs}, f)

    def block_at(idx, shape_blk):
        block = np.zeros(shape_blk, a5.dtype)
        sl_src, sl_dst = [], []
        for d, i in enumerate(idx):
            lo = i * shape_blk[d]
            hi = min(lo + shape_blk[d], a5.shape[d])
            if hi <= lo:
                return None
            sl_src.append(slice(lo, hi))
            sl_dst.append(slice(0, hi - lo))
        block[tuple(sl_dst)] = a5[tuple(sl_src)]
        return block

    def enc(buf):
        return zlib.compress(buf, 1) if codec == "gzip" else buf

    grid = [range(-(-s // c)) for s, c in zip(a5.shape, outer)]
    for idx in itertools.product(*grid):
        key = os.path.join(ds, "c", *[str(i) for i in idx])
        os.makedirs(os.path.dirname(key), exist_ok=True)
        if shards is None:
            block = block_at(idx, outer)
            with open(key, "wb") as f:
                f.write(enc(block.tobytes()))
            continue
        # shard: inner chunks in C order + (offset, nbytes) index at end
        per_ax = [s // i for s, i in zip(outer, chunks)]
        payloads = []
        table = []
        off = 0
        base = [i * o for i, o in zip(idx, outer)]
        for ii in itertools.product(*[range(p) for p in per_ax]):
            gidx = []
            for d in range(len(ii)):
                gidx.append((base[d] + ii[d] * chunks[d]) // chunks[d])
            block = np.zeros(tuple(chunks), a5.dtype)
            sl_src, sl_dst = [], []
            empty = False
            for d in range(len(ii)):
                lo = base[d] + ii[d] * chunks[d]
                hi = min(lo + chunks[d], a5.shape[d])
                if hi <= lo:
                    empty = True
                    break
                sl_src.append(slice(lo, hi))
                sl_dst.append(slice(0, hi - lo))
            if empty:
                table.append((0xFFFFFFFFFFFFFFFF, 0))
                continue
            block[tuple(sl_dst)] = a5[tuple(sl_src)]
            p = enc(block.tobytes())
            payloads.append(p)
            table.append((off, len(p)))
            off += len(p)
        body = b"".join(payloads)
        tbl = np.asarray(table, "<u8").tobytes()
        with open(key, "wb") as f:
            f.write(body + tbl)
