"""Slice-streamed oversized-ROI path for 3D volumes (reference phase 3 for
3D: every family's ``osized_calculate``, phase3.cpp:94-114).

A 3D ROI whose padded cube exceeds the batch budget never materializes as a
dense [D, H, W] device tensor.  Instead one z-slice-streamed pass over the
ROI's AABB builds the same sufficient statistics the dense kernels consume
-- GLCM direction matrices, GLRLM run histograms (with cross-slice run
carries), GLSZM/GLDZM zone lists (union-find over per-slice runs),
GLDM/NGLDM dependence matrices, NGTDM neighbor sums, the exact intensity
histogram, and the surface sums -- then calls the SAME jitted finalize
functions as the trivial path (ops/texture3d.py ``*_finalize`` /
``*_from_*``), so values match the dense kernels exactly.

Only one (2*r+1)-slice window plus O(runs) union-find state is resident at
any time; the volume itself is accessed through numpy views.
"""

from __future__ import annotations

import math

import numpy as np

from ..ops.texture3d import GLCM_SHIFTS, GLRLM_SHIFTS
from . import batching
from .oversized_tex import bin_levels_np, _UnionFind


def _shift2(a, dy, dx, fill=0):
    """a[y + dy, x + dx] with constant fill outside (numpy, 2D)."""
    H, W = a.shape
    out = np.full_like(a, fill)
    ys = slice(max(dy, 0), H + min(dy, 0))
    yd = slice(max(-dy, 0), H + min(-dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    xd = slice(max(-dx, 0), W + min(-dx, 0))
    out[yd, xd] = a[ys, xs]
    return out


def _pair_hist_np(a, b, w, ni, nj, out):
    """out[a, b] += w for in-range index pairs (accumulating)."""
    ok = (a >= 0) & (a < ni) & (b >= 0) & (b < nj) & (w != 0)
    if not ok.any():
        return
    comp = a[ok].astype(np.int64) * nj + b[ok]
    out.ravel()[:] += np.bincount(comp, weights=w[ok],
                                  minlength=ni * nj)


# ---------------------------------------------------------------------------
# GLRLM runs with cross-slice carries


class Runs3DAccum:
    """Run-length histograms along the 13 directions; dz=0 directions are
    slice-local, dz=1 directions carry (level, length) state between
    consecutive slices."""

    def __init__(self, ng, nr, H, W):
        self.ng, self.nr = ng, nr
        self.P = np.zeros((13, ng, nr))
        # dz=1 carries: level (-1 = none) and length of the run ENDING at
        # each (y, x) of the previous slice
        self.carry = {}
        for di, (dz, dy, dx) in enumerate(GLRLM_SHIFTS):
            if dz == 1:
                self.carry[di] = (np.full((H, W), -1, np.int64),
                                  np.zeros((H, W), np.int64))

    def _flush(self, di, lev, length, mask):
        if not mask.any():
            return
        _pair_hist_np(lev[mask] - 1,
                      np.minimum(length[mask] - 1, self.nr - 1),
                      np.ones(int(mask.sum())), self.ng, self.nr, self.P[di])

    def _runs_inplane(self, di, dy, dx, lv, ok):
        """Maximal runs of one slice along (dy, dx): flatten along the
        direction via shear so runs become contiguous x-segments."""
        H, W = lv.shape
        if (dy, dx) == (0, 1):
            l2, o2 = lv, ok
        else:
            # shear rows so the (dy, dx) diagonal/column becomes horizontal:
            # row y shifted right by y (dx == -1), left-aligned (dx == 1),
            # or transpose (vertical)
            if (dy, dx) == (1, 0):
                l2, o2 = lv.T, ok.T
            else:
                K = W + H
                l2 = np.zeros((H, K), lv.dtype)
                o2 = np.zeros((H, K), bool)
                for y in range(H):
                    s = y if dx == -1 else H - 1 - y
                    l2[y, s:s + W] = lv[y]
                    o2[y, s:s + W] = ok[y]
                l2, o2 = l2.T, o2.T     # runs go down columns -> transpose
        # contiguous horizontal runs of same level among ok cells
        flat_l = l2.reshape(-1)
        flat_o = o2.reshape(-1)
        Wr = l2.shape[1]
        idx = np.arange(flat_l.size)
        rowstart = (idx % Wr) == 0
        same_prev = np.zeros(flat_l.size, bool)
        same_prev[1:] = (flat_o[1:] & flat_o[:-1]
                         & (flat_l[1:] == flat_l[:-1]))
        same_prev[rowstart] = False
        starts = flat_o & ~same_prev
        sidx = np.nonzero(starts)[0]
        if not len(sidx):
            return
        # run length: distance to the next break
        breaks = np.nonzero(~np.concatenate([same_prev[1:], [False]]))[0]
        ends = breaks[np.searchsorted(breaks, sidx)]
        lengths = ends - sidx + 1
        _pair_hist_np(flat_l[sidx] - 1,
                      np.minimum(lengths - 1, self.nr - 1),
                      np.ones(len(sidx)), self.ng, self.nr, self.P[di])

    def feed_slice(self, lv, ok):
        """lv: [H, W] levels; ok: validity."""
        for di, (dz, dy, dx) in enumerate(GLRLM_SHIFTS):
            if dz == 0:
                self._runs_inplane(di, dy, dx, lv, ok)
                continue
            plev, plen = self.carry[di]
            # chain: (z-1, y-dy, x-dx) -> (z, y, x)
            prev_lev = _shift2(plev, -dy, -dx, fill=-1)
            prev_len = _shift2(plen, -dy, -dx, fill=0)
            cont = ok & (prev_lev >= 0) & (lv == prev_lev)
            # previous runs whose chain does NOT continue are maximal: flush
            cont_back = _shift2(cont.astype(np.int64), dy, dx) > 0
            ended = (plev >= 0) & ~cont_back
            self._flush(di, plev, plen, ended)
            nlev = np.where(ok, lv, -1)
            nlen = np.where(ok, np.where(cont, prev_len + 1, 1), 0)
            self.carry[di] = (nlev.astype(np.int64), nlen.astype(np.int64))

    def finish(self):
        for di, (dz, dy, dx) in enumerate(GLRLM_SHIFTS):
            if dz == 1:
                plev, plen = self.carry[di]
                self._flush(di, plev, plen, plev >= 0)
        return self.P


# ---------------------------------------------------------------------------
# zone tracking (26-conn for GLSZM, 6-conn for GLDZM) via per-slice runs +
# union-find across rows and slices


class Zones3DAccum:
    def __init__(self, conn26: bool, want_dist: bool):
        self.conn26 = conn26
        self.want_dist = want_dist
        self.uf = _UnionFind()
        self.z_lev = []          # per UF node: level
        self.z_size = []
        self.z_dist = []
        self.prev_rows = None    # per-row run lists of the previous slice

    def _slice_runs(self, lv, ok, dist=None):
        """Label one slice's same-level runs and union them in-plane.

        Returns rows: list per y of (xstart, xend, level, node)."""
        H, W = lv.shape
        rows = []
        prev_row = []
        offs = ((-1, 0, 1) if self.conn26 else (0,))
        for y in range(H):
            o = ok[y]
            runs = []
            if o.any():
                l = lv[y]
                idx = np.nonzero(o)[0]
                brk = np.nonzero(np.diff(idx) > 1)[0]
                seg_starts = np.concatenate([[0], brk + 1])
                seg_ends = np.concatenate([brk, [len(idx) - 1]])
                for a, b in zip(seg_starts, seg_ends):
                    x0, x1 = int(idx[a]), int(idx[b])
                    # split by level changes within the contiguous segment
                    s = x0
                    for x in range(x0 + 1, x1 + 2):
                        if x > x1 or l[x] != l[s]:
                            node = self.uf.make()
                            self.z_lev.append(int(l[s]))
                            self.z_size.append(0)
                            self.z_dist.append(1 << 30)
                            cnt = x - s
                            self._bump(node, cnt,
                                       None if dist is None
                                       else int(dist[y, s:x].min()))
                            runs.append((s, x - 1, int(l[s]), node))
                            s = x
            # vertical unions with the previous row
            for (s, e, levv, node) in runs:
                for (ps, pe, plev, pnode) in prev_row:
                    if plev != levv:
                        continue
                    if (ps <= e + max(offs)) and (pe >= s + min(offs)):
                        self._union(node, pnode)
            rows.append(runs)
            prev_row = runs
        return rows

    def _bump(self, node, cnt, dist):
        r = self.uf.find(node)
        self.z_size[r] += cnt
        if dist is not None and dist < self.z_dist[r]:
            self.z_dist[r] = dist

    def _union(self, a, b):
        ra, rb = self.uf.find(a), self.uf.find(b)
        if ra == rb:
            return
        r = self.uf.union(ra, rb)
        o = rb if r == ra else ra
        self.z_size[r] += self.z_size[o]
        if self.z_dist[o] < self.z_dist[r]:
            self.z_dist[r] = self.z_dist[o]

    def feed_slice(self, lv, ok, dist=None):
        rows = self._slice_runs(lv, ok, dist)
        if self.prev_rows is not None:
            offs = ((-1, 0, 1) if self.conn26 else (0,))
            for dy in offs:
                for y, runs in enumerate(rows):
                    py = y + dy
                    if py < 0 or py >= len(self.prev_rows):
                        continue
                    prev = self.prev_rows[py]
                    for (s, e, levv, node) in runs:
                        for (ps, pe, plev, pnode) in prev:
                            if plev != levv:
                                continue
                            lo = min(offs)
                            hi = max(offs)
                            if (ps <= e + hi) and (pe >= s + lo):
                                self._union(node, pnode)
        self.prev_rows = rows

    def zone_lists(self):
        """(zlev, zsize, zdist) arrays, one entry per final zone."""
        roots = [i for i in range(len(self.z_size))
                 if self.uf.find(i) == i and self.z_size[i] > 0]
        zl = np.asarray([self.z_lev[r] for r in roots], np.float64)
        zs = np.asarray([self.z_size[r] for r in roots], np.float64)
        zd = np.asarray([self.z_dist[r] for r in roots], np.float64)
        return zl, zs, zd


def _border_distance_np(lev, h, w):
    """Per-pixel in-plane dist2border, mirroring ops/gldzm.border_distance
    (nearest zero-level strictly along each scanline, or the AABB margin)."""
    H, W = lev.shape
    xs = np.arange(W)[None, :]
    ys = np.arange(H)[:, None]
    zero = lev == 0
    NEG, POS = -(1 << 30), (1 << 30)
    zl = np.maximum.accumulate(np.where(zero, xs, NEG), axis=1)
    zl = _shift2(zl, 0, -1, fill=NEG)             # strictly left
    zr = np.minimum.accumulate(np.where(zero, xs, POS)[:, ::-1],
                               axis=1)[:, ::-1]
    zr = _shift2(zr, 0, 1, fill=POS)              # strictly right
    zt = np.maximum.accumulate(np.where(zero, ys, NEG), axis=0)
    zt = _shift2(zt, -1, 0, fill=NEG)
    zb = np.minimum.accumulate(np.where(zero, ys, POS)[::-1], axis=0)[::-1]
    zb = _shift2(zb, 1, 0, fill=POS)
    d = np.minimum(np.minimum(np.minimum(xs - zl, xs),
                              np.minimum(zr - xs, (w - 1) - xs)),
                   np.minimum(np.minimum(ys - zt, ys),
                              np.minimum(zb - ys, (h - 1) - ys))) + 1
    return np.maximum(d, 1)


# ---------------------------------------------------------------------------
# main pass


def is_oversized3d(rec, budget_bytes, bytes_per_px=16):
    dims = (rec.depth, rec.height, rec.width)
    if max(dims) > batching._LADDER[-1]:
        return True
    pd = batching.pad_dim(rec.depth)
    ph = batching.pad_dim(rec.height)
    pw = batching.pad_dim(rec.width)
    return pd * ph * pw * bytes_per_px > budget_bytes


def process3d(rec, intens, labels, cfg, families, smin, smax):
    """Streamed oversized pass for one 3D ROI.  intens/labels: whole-volume
    numpy arrays (views are sliced per z).  Returns {family: {member: val}}.
    """
    import jax.numpy as jnp
    from ..ops import texture3d as t3
    from ..ops import gldm as gldm2d
    from ..ops import glrlm as glrlm2d
    from ..ops import ngtdm as ngtdm2d
    from . import oversized as ovs

    D_, H_, W_ = rec.depth, rec.height, rec.width
    sub_i = intens[rec.z0:rec.z1 + 1, rec.y0:rec.y1 + 1,
                   rec.x0:rec.x1 + 1]
    sub_l = labels[rec.z0:rec.z1 + 1, rec.y0:rec.y1 + 1,
                   rec.x0:rec.x1 + 1]
    pd = batching.pad_dim(D_) if D_ <= batching._LADDER[-1] else \
        1 << (D_ - 1).bit_length()
    ph = batching.pad_dim(H_) if H_ <= batching._LADDER[-1] else \
        1 << (H_ - 1).bit_length()
    pw = batching.pad_dim(W_) if W_ <= batching._LADDER[-1] else \
        1 << (W_ - 1).bit_length()

    out = {}
    dtype = jnp.float64 if cfg.precision == "f64" else jnp.float32
    ibsi = cfg.ibsi
    if ibsi:
        ceil = max(int(smax), 2)
        ng_ibsi = 1 << (ceil - 1).bit_length()

    def grey(family=None):
        if ibsi:
            return 0, ng_ibsi
        g = cfg.texture_greydepth3(family) if family else cfg.coarse_gray_depth
        if g == 0:
            # per-family zero default -> raw-intensity levels sized by the
            # slide max (texture_feature.h:71-75)
            return 0, max(int(smax), 2)
        return g, g

    want = set(families)
    lev_cache = {}

    def lev_at(z, gi):
        key = (z, gi)
        if key not in lev_cache:
            m = sub_l[z] == rec.label
            mi = np.where(m, sub_i[z], 0).astype(np.float64)
            lev_cache[key] = bin_levels_np(mi, rec.vmin, rec.vmax, gi)
            # drop stale slices (keep a window of 5)
            for k in list(lev_cache):
                if k[0] < z - 4:
                    del lev_cache[k]
        return lev_cache[key]

    def mask_at(z):
        return sub_l[z] == rec.label

    # --- accumulators ---------------------------------------------------
    accs = {}
    if "D3_GLCM_feature" in want:
        gi_glcm, ng_glcm = grey("glcm")
        accs["glcm"] = np.zeros((13, ng_glcm, ng_glcm))
    if "D3_GLRLM_feature" in want:
        gi_glrlm, ng_glrlm = grey("glrlm")
        nr = max(pd, ph, pw)
        accs["glrlm"] = Runs3DAccum(ng_glrlm, nr, H_, W_)
    if "D3_GLSZM_feature" in want:
        gi_glszm, ng_glszm = grey("glszm")
        accs["glszm"] = Zones3DAccum(conn26=True, want_dist=False)
    if "D3_GLDZM_feature" in want:
        gi_gldzm, ng_gldzm = grey()
        accs["gldzm"] = Zones3DAccum(conn26=False, want_dist=True)
    if "D3_GLDM_feature" in want:
        gi_gldm, ng_gldm = grey("gldm")
        accs["gldm"] = np.zeros((ng_gldm, 27))
    if "D3_NGLDM_feature" in want:
        nb_ngldm = (ng_ibsi if ibsi else cfg.coarse_gray_depth) + 1
        accs["ngldm_P"] = np.zeros((nb_ngldm, 25))
        accs["ngldm_present"] = np.zeros(nb_ngldm, bool)
    if "D3_NGTDM_feature" in want:
        gi_ngtdm, ng_ngtdm = grey("ngtdm")
        nbt = ng_ngtdm + 1
        accs["ngtdm_N"] = np.zeros(nbt)
        accs["ngtdm_S"] = np.zeros(nbt)
        accs["ngtdm_present"] = np.zeros(nbt, bool)
        accs["ngtdm_maxlev"] = 0
    if "D3_VoxelIntensityFeatures" in want:
        hist = ovs.OversizedAccums()
    if "D3_SurfaceFeature" in want:
        surf = dict(n=0, faces=0, hull_pts=[],
                    s=np.zeros(3), ss=np.zeros((3, 3)))

    r_ngtdm = cfg.d3_ngtdm_radius if "D3_NGTDM_feature" in want else 1
    if r_ngtdm <= 0:
        # radius 0 short-circuits to all-zero members at finalize; skip the
        # per-slice neighborhood accumulation entirely
        want_ngtdm_accum = False
        r_ngtdm = 1
    else:
        want_ngtdm_accum = True
    off_glcm = cfg.glcm3_offset if "D3_GLCM_feature" in want else 1
    zwin = max(r_ngtdm, off_glcm, 1)

    def ngldm_lev(z):
        m = mask_at(z)
        mi = np.where(m, sub_i[z], 0).astype(np.float64)
        if ibsi:
            return mi.astype(np.int64)
        n_levels = cfg.coarse_gray_depth
        return (mi * n_levels / max(rec.vmax, 1e-30)).astype(np.int64)

    for z in range(D_):
        m = mask_at(z)

        if "D3_VoxelIntensityFeatures" in want:
            vals = sub_i[z][m]
            if vals.size:
                hist.area += vals.size
                hist.vmin = min(hist.vmin, float(vals.min()))
                hist.vmax = max(hist.vmax, float(vals.max()))
                bu, bc = np.unique(vals, return_counts=True)
                ovs._merge_hist(hist, bu.astype(np.float64),
                                bc.astype(np.float64))

        if "D3_SurfaceFeature" in want and m.any():
            yy, xx = np.nonzero(m)
            surf["n"] += len(yy)
            pts = np.stack([xx + rec.x0, yy + rec.y0,
                            np.full(len(yy), z + rec.z0)], 1).astype(float)
            surf["s"] += pts.sum(0)
            surf["ss"] += pts.T @ pts
            # exposed faces: 4 in-plane + 2 axial
            faces = 0
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                faces += int((m & ~_shift2(m, dy, dx, fill=False)).sum())
            up = mask_at(z - 1) if z > 0 else np.zeros_like(m)
            dn = mask_at(z + 1) if z + 1 < D_ else np.zeros_like(m)
            faces += int((m & ~up).sum()) + int((m & ~dn).sum())
            surf["faces"] += faces
            # 2D hull vertices of this slice bound the 3D hull vertices
            if len(yy) >= 3:
                try:
                    from scipy.spatial import ConvexHull
                    h2 = ConvexHull(pts[:, :2])
                    surf["hull_pts"].append(pts[h2.vertices])
                except Exception:
                    surf["hull_pts"].append(pts)
            else:
                surf["hull_pts"].append(pts)

        if "D3_GLCM_feature" in want:
            lv = lev_at(z, gi_glcm)
            b_idx = lv.astype(np.int64) - 1
            for di, (dx, dy, dz) in enumerate(GLCM_SHIFTS):
                zz = z + dz * off_glcm
                if zz < 0 or zz >= D_:
                    continue
                nlv = lev_at(zz, gi_glcm)
                a_idx = _shift2(nlv.astype(np.int64) - 1,
                                dy * off_glcm, dx * off_glcm, fill=-1)
                nb_ok = _shift2(np.ones_like(m, np.int64),
                                dy * off_glcm, dx * off_glcm) > 0
                valid = nb_ok
                if gi_glcm == 0:
                    valid = valid & (lv > 0) & (a_idx >= 0)
                _pair_hist_np(a_idx, b_idx, valid.astype(np.float64),
                              accs["glcm"].shape[1], accs["glcm"].shape[1],
                              accs["glcm"][di])

        if "D3_GLRLM_feature" in want:
            lv = lev_at(z, gi_glrlm).astype(np.int64)
            ok = np.ones_like(lv, bool) if gi_glrlm > 0 else (lv > 0)
            accs["glrlm"].feed_slice(lv, ok)

        if "D3_GLSZM_feature" in want:
            lv = lev_at(z, gi_glszm).astype(np.int64)
            zero_i = 1 if gi_glszm > 0 else 0
            ok = lv != zero_i
            accs["glszm"].feed_slice(np.where(ok, lv, -1), ok)

        if "D3_GLDZM_feature" in want:
            lv = lev_at(z, gi_gldzm).astype(np.int64)
            ok = np.ones_like(lv, bool) if gi_gldzm > 0 else (lv > 0)
            dist = _border_distance_np(lv, H_, W_)
            accs["gldzm"].feed_slice(lv, ok, dist)

        if "D3_GLDM_feature" in want:
            lv = lev_at(z, gi_gldm).astype(np.int64)
            zero_i = 1 if gi_gldm > 0 else 0
            nd = np.ones_like(lv, np.int64)
            for dz in (-1, 0, 1):
                zz = z + dz
                if zz < 0 or zz >= D_:
                    continue
                nlv = lev_at(zz, gi_gldm).astype(np.int64)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dz == 0 and dy == 0 and dx == 0:
                            continue
                        sh = _shift2(nlv, dy, dx, fill=-99)
                        inb = _shift2(np.ones_like(lv), dy, dx) > 0
                        nd += (inb & (sh == lv)).astype(np.int64)
            center_ok = lv != zero_i
            _pair_hist_np(lv - 1, nd - 1, center_ok.astype(np.float64),
                          accs["gldm"].shape[0], 27, accs["gldm"])

        if "D3_NGLDM_feature" in want:
            lv = ngldm_lev(z)
            nbv = accs["ngldm_P"].shape[0]
            matches = np.zeros_like(lv)
            for dz in (-1, 0, 1):
                zz = z + dz
                if zz < 0 or zz >= D_:
                    continue
                nlv = ngldm_lev(zz)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        # reference 3D NGLDM omits the axial (0,0,+-1)
                        # neighbors -- 24 shifts (3d_ngldm.cpp:12-40)
                        if dy == 0 and dx == 0:
                            continue
                        sh = _shift2(nlv, dy, dx, fill=-99)
                        inb = _shift2(np.ones_like(lv), dy, dx) > 0
                        matches += (inb & (sh == lv)).astype(np.int64)
            interior_z = 1 <= z < D_ - 1
            if interior_z:
                ys = np.arange(H_)[:, None]
                xs = np.arange(W_)[None, :]
                interior = ((ys >= 1) & (ys < H_ - 1) &
                            (xs >= 1) & (xs < W_ - 1))
                _pair_hist_np(np.clip(lv, 0, nbv - 1),
                              np.clip(matches, 0, 24),
                              interior.astype(np.float64), nbv, 25,
                              accs["ngldm_P"])
            accs["ngldm_present"][np.unique(np.clip(lv, 0, nbv - 1))] = True

        if "D3_NGTDM_feature" in want and want_ngtdm_accum:
            lv = lev_at(z, gi_ngtdm).astype(np.int64)
            zero_i = 1 if gi_ngtdm > 0 else 0
            lv_f = lv.astype(np.float64)
            neig_sum = np.zeros_like(lv_f)
            neig_cnt = np.zeros_like(lv_f)
            r = r_ngtdm
            for dz in range(-r, r + 1):
                zz = z + dz
                if zz < 0 or zz >= D_:
                    continue
                nlv = lev_at(zz, gi_ngtdm).astype(np.float64)
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        if dz == 0 and dy == 0 and dx == 0:
                            continue
                        sh = _shift2(nlv, dy, dx, fill=0.0)
                        inb = _shift2(np.ones_like(lv), dy, dx) > 0
                        neig_sum += np.where(inb, sh, 0)
                        neig_cnt += inb
            is_zone = (lv != zero_i) & (neig_cnt > 0)
            ave = np.where(is_zone, neig_sum / np.maximum(neig_cnt, 1), 0)
            nbt = len(accs["ngtdm_N"])
            cl = np.clip(lv, 0, nbt - 1)
            accs["ngtdm_N"] += np.bincount(cl[is_zone], minlength=nbt)
            accs["ngtdm_S"] += np.bincount(
                cl[is_zone], weights=np.abs(lv_f - ave)[is_zone],
                minlength=nbt)
            accs["ngtdm_present"][np.unique(cl)] = True
            accs["ngtdm_maxlev"] = max(accs["ngtdm_maxlev"], int(lv.max()))

    # --- finalize via the SAME jitted statistics as the dense path -------
    # (each call goes through oversized.jit_finish: one cached executable
    # per signature instead of eager per-op dispatch, see oversized.py)
    from .oversized import jit_finish
    j = lambda a: jnp.asarray(np.asarray(a, np.float64)[None])
    vmin1 = jnp.asarray([rec.vmin], dtype)
    vmax1 = jnp.asarray([rec.vmax], dtype)
    to_scalar = lambda d: {k: np.asarray(v)[0] for k, v in d.items()}

    if "D3_VoxelIntensityFeatures" in want and hist.area:
        from ..ops.intensity import pixel_intensity_features
        U = 8
        while U < hist.vals.size:
            U <<= 1
        va = np.full((1, U), np.inf)
        wt = np.zeros((1, U))
        va[0, :hist.vals.size] = hist.vals
        wt[0, :hist.vals.size] = hist.cnts
        nb = cfg.coarse_gray_depth
        fn = jit_finish(
            ("pif3", nb, cfg.noval),
            lambda: lambda v, n, a, b, sr, w: pixel_intensity_features(
                v, n, a, b, sr, nb, cfg.noval, weights=w))
        res = fn(
            jnp.asarray(va), jnp.asarray([hist.area], jnp.int64),
            vmin1, vmax1, jnp.asarray([smax - smin], dtype),
            jnp.asarray(wt))
        out["D3_VoxelIntensityFeatures"] = to_scalar(res)

    if "D3_GLCM_feature" in want:
        M_np = accs["glcm"][None]
        if ibsi:
            M_np = M_np + np.swapaxes(M_np, -1, -2)
        fn = jit_finish(
            ("glcm3", gi_glcm, cfg.noval, dtype, ibsi),
            lambda: (lambda M, a, b: t3.glcm3d_finalize(
                M, a, b, gi_glcm, cfg.noval, dtype, b if ibsi else None)))
        out["D3_GLCM_feature"] = to_scalar(fn(
            jnp.asarray(M_np, dtype), vmin1, vmax1))

    if "D3_GLRLM_feature" in want:
        P = jnp.asarray(accs["glrlm"].finish()[None], dtype)
        fn = jit_finish(
            ("glrlm3", cfg.noval, dtype),
            lambda: lambda P_, n, a, b: glrlm2d.glrlm_features(
                P_, n, a, b, cfg.noval, dtype))
        res = fn(P, jnp.asarray([rec.area], dtype), vmin1, vmax1)
        fin = {}
        for mname in glrlm2d.MEMBERS:
            fin[mname] = float(np.asarray(res[mname])[0, 0])
            fin[mname + "_AVE"] = float(np.asarray(res[mname + "_AVE"])[0])
        out["D3_GLRLM_feature"] = fin

    if "D3_GLSZM_feature" in want:
        zl, zs, _ = accs["glszm"].zone_lists()
        A = pd * ph * pw
        fn = jit_finish(
            ("glszm3", cfg.noval, dtype, A),
            lambda: lambda s_, l_, z_, n, a, b: t3._glszm_from_zones(
                s_, l_, z_, n, a, b, cfg.noval, dtype, A))
        out["D3_GLSZM_feature"] = to_scalar(fn(
            j(np.ones_like(zl)) > 0, j(zl), j(zs),
            jnp.asarray([rec.area], dtype), vmin1, vmax1))

    if "D3_GLDZM_feature" in want:
        zl, zs, zd = accs["gldzm"].zone_lists()
        wz = (zl > 0).astype(np.float64)
        maxd = ph + pw + 2.0
        fn = jit_finish(
            ("gldzm3", cfg.noval, dtype, maxd),
            lambda: lambda l_, d_, w_, n, a, b: t3.gldzm3d_from_zones(
                l_, d_, w_, n, a, b, cfg.noval, dtype, maxd))
        out["D3_GLDZM_feature"] = to_scalar(fn(
            j(zl).astype(dtype), j(zd).astype(dtype), j(wz).astype(dtype),
            jnp.asarray([rec.area], dtype), vmin1, vmax1))

    if "D3_GLDM_feature" in want:
        P = jnp.asarray(accs["gldm"][None], dtype)
        fn = jit_finish(
            ("gldm3", cfg.noval),
            lambda: lambda P_, a, b: gldm2d.gldm_features(
                P_, a, b, cfg.noval))
        out["D3_GLDM_feature"] = to_scalar(fn(P, vmin1, vmax1))

    if "D3_NGLDM_feature" in want:
        P = jnp.asarray(accs["ngldm_P"][None], dtype)
        pres = jnp.asarray(accs["ngldm_present"][None])
        fn = jit_finish(
            ("ngldm3", cfg.noval, dtype),
            lambda: lambda P_, pr, a, b: t3.ngldm3d_from_matrix(
                P_, pr, a, b, cfg.noval, dtype))
        out["D3_NGLDM_feature"] = to_scalar(fn(P, pres, vmin1, vmax1))

    if "D3_NGTDM_feature" in want and cfg.d3_ngtdm_radius <= 0:
        # reference default: radius 0 -> empty neighborhood -> all-zero
        # members (env_features.cpp:712-736, 3d_ngtdm.cpp:92-110)
        out["D3_NGTDM_feature"] = {
            m: 0.0 for m in ("NGTDM_COARSENESS", "NGTDM_CONTRAST",
                             "NGTDM_BUSYNESS", "NGTDM_COMPLEXITY",
                             "NGTDM_STRENGTH")}
    elif "D3_NGTDM_feature" in want:
        N = jnp.asarray(accs["ngtdm_N"][None], dtype)
        S = jnp.asarray(accs["ngtdm_S"][None], dtype)
        pres = np.array(accs["ngtdm_present"])
        pres[0] = False
        stub_lev = jnp.full((1, 1, 1, 1), accs["ngtdm_maxlev"], jnp.int32)
        stub_ok = jnp.ones((1, 1, 1, 1), bool)
        fn = jit_finish(
            ("ngtdm3", cfg.noval, dtype, gi_ngtdm == 0),
            lambda: lambda N_, S_, p, lv, v: ngtdm2d.ngtdm_stats(
                N_, S_, p, lv, v, cfg.noval, dtype, ibsi=gi_ngtdm == 0))
        out["D3_NGTDM_feature"] = to_scalar(fn(
            N, S, jnp.asarray(pres[None]), stub_lev, stub_ok))

    if "D3_SurfaceFeature" in want and surf["n"]:
        out["D3_SurfaceFeature"] = _surface_members(rec, surf)
    return out


def _surface_members(rec, surf):
    """D3_SurfaceFeature from streamed sums (mirrors
    runner3d.VolumeRunner._surface)."""
    n = surf["n"]
    out = {}
    ball_r3 = 1.0 / 8.0
    out["VOXEL_VOLUME"] = n * (4.0 / 3.0 * math.pi * ball_r3) / 0.5236
    out["AREA"] = float(surf["faces"])
    try:
        from scipy.spatial import ConvexHull
        pts = np.concatenate(surf["hull_pts"])
        hull = ConvexHull(pts)
        out["VOLUME_CONVEXHULL"] = hull.volume
    except Exception:
        out["VOLUME_CONVEXHULL"] = 0.0
    out["MESH_VOLUME"] = out["VOLUME_CONVEXHULL"]
    vv = out["VOXEL_VOLUME"]
    a = out["AREA"]
    out["AREA_2_VOLUME"] = a / vv
    out["COMPACTNESS1"] = vv / math.sqrt(math.pi * a ** 3) if a else 0.0
    out["COMPACTNESS2"] = 36 * math.pi * vv * vv / a ** 3 if a else 0.0
    out["SPHERICAL_DISPROPORTION"] = a / (36 * math.pi * vv * vv) ** (1 / 3)
    out["SPHERICITY"] = (36 * math.pi * vv * vv) ** (1 / 3) / a if a else 0.0
    # covariance from streamed first/second moments (bias=False)
    s, ss = surf["s"], surf["ss"]
    if n > 1:
        C = (ss - np.outer(s, s) / n) / (n - 1)
    else:
        C = np.zeros((3, 3))
    try:
        L = np.sort(np.linalg.eigvalsh(C))[::-1]
        if np.all(np.isfinite(L)) and L[0] > 0:
            out["MAJOR_AXIS_LEN"] = 4 * math.sqrt(max(L[0], 0))
            out["MINOR_AXIS_LEN"] = 4 * math.sqrt(max(L[1], 0))
            out["LEAST_AXIS_LEN"] = 4 * math.sqrt(max(L[2], 0))
            out["ELONGATION"] = math.sqrt(max(L[1], 0) / L[0])
            out["FLATNESS"] = math.sqrt(max(L[2], 0) / L[0])
        else:
            raise ValueError
    except Exception:
        for k in ("MAJOR_AXIS_LEN", "MINOR_AXIS_LEN", "LEAST_AXIS_LEN",
                  "ELONGATION", "FLATNESS"):
            out[k] = 0.0
    return out
