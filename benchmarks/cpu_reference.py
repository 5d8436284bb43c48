"""CPU reference comparator: a vectorized NumPy embodiment of the
reference step, for the BASELINE north-star measurement.

BASELINE.json's north star is "3D buckling at 128^3 >= 100x faster per
step than the CPU reference with identical surface evolution", but the
reference repo is CUDA-only and records no CPU number (SURVEY §6).  This
script IS that CPU reference: the same algorithm as the reference's
notebook cell 13 step (per-kernel semantics as catalogued in SURVEY §2,
including the engine's documented divergences: fixed wz face weight,
full-interior vz extrapolation, original positions for all displacement
axes), written the way a competent NumPy programmer would — np.add.at /
np.minimum.at scatters (the CPU analogue of the reference's CUDA
atomics), fancy-indexing gathers, shifted-slice stencils, and host-loop
CG with f64 solver math over f32 grid state (the reference's precision
split, SURVEY §0).

It is intentionally INDEPENDENT of the JAX package: only scene
construction (untimed) is imported.  It doubles as a second
cross-implementation oracle fast enough for multi-step surface-evolution
comparisons at 16^3-32^3 (tests/test_cpu_reference.py), where
tests/oracle3d.py's per-cell Python loops are too slow.

Usage:
  python benchmarks/cpu_reference.py --dx 0.0125 --steps 3      # flagship
  python benchmarks/cpu_reference.py --res 128 --steps 1        # 128^3-class
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

F = np.float64  # solver dtype (reference: f64 CG buffers)


# ---------------------------------------------------------------------------
# shifted-slice helpers (NumPy twins of ops/indexing.py semantics)
# ---------------------------------------------------------------------------

def sample(a, off, tshape, fill):
    """out[i] = a[i + off] over tshape; out-of-range -> fill."""
    out = a
    for axis, (o, t) in enumerate(zip(off, tshape)):
        s = out.shape[axis]
        front = max(0, -o)
        back = max(0, t + o - s)
        if front or back:
            pad = [(0, 0)] * out.ndim
            pad[axis] = (front, back)
            out = np.pad(out, pad, constant_values=fill)
        start = o + front
        idx = [slice(None)] * out.ndim
        idx[axis] = slice(start, start + t)
        out = out[tuple(idx)]
    return out


def shift(a, off, fill):
    return sample(a, off, a.shape, fill)


def dual_sample(dual, base_parity, off, tshape, fill):
    """dual[2*i + base_parity + off] over a primal grid of tshape."""
    q = [p + o for p, o in zip(base_parity, off)]
    cls = tuple(c % 2 for c in q)
    k = tuple((c - c % 2) // 2 for c in q)
    view = dual[tuple(slice(c, None, 2) for c in cls)]
    return sample(view, k, tshape, fill)


def face_parity(a, d=3):
    p = [1] * d
    p[a] = 0
    return tuple(p)


def interior_mask(shape, active_hi=None):
    masks = []
    for axis, n in enumerate(shape):
        i = np.arange(n)
        hi = active_hi[axis] if active_hi is not None else n - 1
        m = (i >= 1) & (i < hi)
        b = [1] * len(shape)
        b[axis] = n
        masks.append(m.reshape(b))
    out = masks[0]
    for m in masks[1:]:
        out = out & m
    return out


# ---------------------------------------------------------------------------
# cut-cell fractions (SolidFractionCommon/3D semantics)
# ---------------------------------------------------------------------------

def edge_frac(l, r):
    l_in, r_in = l < 0, r < 0
    diff = -np.abs(l - r)
    safe = np.where(diff == 0, -1.0, diff)
    mixed = np.where(l_in, l / safe, r / safe)
    return np.where(l_in & r_in, 1.0, np.where(~l_in & ~r_in, 0.0, mixed))


def tri_frac(v0, v1, v2):
    v = [v0, v1, v2]
    ins = [x < 0 for x in v]
    cnt = sum(i.astype(np.int32) for i in ins)

    def pick2(o):
        return 1.0 - edge_frac(v[(o + 1) % 3], v[(o + 2) % 3])

    two = np.where(~ins[0], pick2(0),
                   np.where(ins[0] & ~ins[1], pick2(1), pick2(2)))

    def pick1(i):
        return edge_frac(v[(i + 1) % 3], v[(i + 2) % 3])

    one = np.where(ins[0], pick1(0),
                   np.where(~ins[0] & ins[1], pick1(1), pick1(2)))
    return np.where(cnt == 3, 1.0,
                    np.where(cnt == 2, two,
                             np.where(cnt == 1, one, 0.0)))


def face_frac(bl, br, tl, tr):
    ce = 0.25 * (bl + br + tl + tr)
    return 0.25 * (tri_frac(bl, br, ce) + tri_frac(br, tr, ce)
                   + tri_frac(tr, tl, ce) + tri_frac(tl, bl, ce))


def solid_fractions(sphi, res):
    nodes = sphi[::2, ::2, ::2].astype(F)
    nx, ny, nz = res

    def c(i, j, k):
        return nodes[i:i + nx, j:j + ny, k:k + nz]

    wx = 1.0 - face_frac(c(0, 1, 0), c(0, 0, 0), c(0, 1, 1), c(0, 0, 1))
    wy = 1.0 - face_frac(c(1, 0, 0), c(0, 0, 0), c(1, 0, 1), c(0, 0, 1))
    wz = 1.0 - face_frac(c(1, 1, 0), c(0, 1, 0), c(1, 0, 0), c(0, 0, 0))
    return (np.pad(wx, ((0, 1), (0, 0), (0, 0))),
            np.pad(wy, ((0, 0), (0, 1), (0, 0))),
            np.pad(wz, ((0, 0), (0, 0), (0, 1))))


# ---------------------------------------------------------------------------
# rigid bodies: evaluate/project for the scene table (box + flip suffices
# for the benchmark scenes; sphere/cylinder included for completeness)
# ---------------------------------------------------------------------------

def _decode(rb):
    """(10,4) table layout (sdf3D.py:294-327): row 0 type/params, rows
    1:5 = 4x4 T (translation in column 3), rows 5:9 = 4x4 R, row 9 vel."""
    kind = (rb[:, 0, 0].astype(np.int64)) // 2
    flip = rb[:, 0, 0].astype(np.int64) % 2
    params = rb[:, 0, 1:4].astype(F)
    t = rb[:, 1:4, 3].astype(F)
    R = rb[:, 5:8, :3].astype(F)
    vel = rb[:, 9, :3].astype(F)
    return kind, flip, params, t, R, vel


def sdf_eval(rb, pts):
    """min-over-bodies SDF (+ owner velocity), seeded at 100."""
    kind, flip, params, t, R, vel = _decode(rb)
    P, B = pts.shape[0], rb.shape[0]
    sd_all = np.empty((P, B), F)
    for i in range(B):
        rel = pts - t[i]
        pl = rel @ R[i]  # R^T (p - t)
        if kind[i] == 0:
            sd = np.linalg.norm(rel, axis=-1) - params[i, 0]
        elif kind[i] == 1:
            d = np.abs(pl) - params[i] * 0.5
            sd = (np.linalg.norm(np.maximum(d, 0.0), axis=-1)
                  + np.minimum(d.max(axis=-1), 0.0))
        else:
            r, hh = params[i, 0], params[i, 1] * 0.5
            y = pl[:, 1]
            sd_r = np.sqrt(pl[:, 0] ** 2 + pl[:, 2] ** 2) - r
            dy = np.abs(np.clip(y, -hh, hh) - y)
            ab = np.abs(y) > hh
            inside = np.maximum(sd_r, np.maximum(y - hh, -(y + hh)))
            sd = np.where(sd_r < 0, np.where(ab, dy, inside),
                          np.where(ab, np.sqrt(sd_r**2 + dy**2), sd_r))
        sd_all[:, i] = -sd if flip[i] else sd
    min_sd = np.minimum(sd_all.min(axis=1), 100.0)
    owner = sd_all.argmin(axis=1)
    v = np.where((min_sd <= 0)[:, None], vel[owner], 0.0)
    return min_sd, v


def sdf_project(rb, pts):
    """Push points out of solids, body by body in table order."""
    kind, flip, params, t, R, _ = _decode(rb)
    pts = pts.astype(F).copy()
    for i in range(rb.shape[0]):
        rel = pts - t[i]
        pl = rel @ R[i]  # R^T (p - t)
        if kind[i] == 1:
            half = params[i] * 0.5
            if flip[i]:
                pl = np.clip(pl, -half, half)
                pts = pl @ R[i].T + t[i]
            else:
                inside = np.all((pl <= half) & (pl >= -half), axis=-1)
                d_hi = half[None, :] - pl
                d_lo = pl + half[None, :]
                six = np.stack([d_hi[:, 0], d_lo[:, 0], d_hi[:, 1],
                                d_lo[:, 1], d_hi[:, 2], d_lo[:, 2]], -1)
                idx = six.argmin(axis=-1)
                dist = np.take_along_axis(six, idx[:, None], -1)[:, 0]
                sign = np.where(idx % 2 == 0, 1.0, -1.0)
                delta = (sign * dist)[:, None] * (
                    np.arange(3)[None, :] == (idx // 2)[:, None])
                new = np.where(inside[:, None], pl + delta, pl)
                pts = np.where(inside[:, None], new @ R[i].T + t[i], pts)
        elif kind[i] == 0:
            rel_n = rel / np.maximum(
                np.linalg.norm(rel, axis=-1, keepdims=True), 1e-12)
            sd = np.linalg.norm(rel, axis=-1) - params[i, 0]
            sd = -sd if flip[i] else sd
            surf = rel_n * params[i, 0] + t[i]
            pts = np.where((sd < 0)[:, None], surf, pts)
        else:  # cylinder: only the non-flipped push (scenes use boxes)
            r, hh = params[i, 0], params[i, 1] * 0.5
            y = pl[:, 1]
            radial = np.sqrt(pl[:, 0] ** 2 + pl[:, 2] ** 2)
            sd_r = radial - r
            at_cap = np.abs(y) >= hh
            inside = (sd_r < 0) & ~at_cap
            safe = np.maximum(radial, 1e-12)
            which = np.stack([sd_r, y - hh, -(y + hh)], -1).argmax(-1)
            nx = np.where(which == 0, pl[:, 0] / safe * r, pl[:, 0])
            nz = np.where(which == 0, pl[:, 2] / safe * r, pl[:, 2])
            ny = np.where(which == 1, hh, np.where(which == 2, -hh, y))
            new = np.stack([nx, ny, nz], -1)
            pts = np.where(inside[:, None], new @ R[i].T + t[i], pts)
    return pts


# ---------------------------------------------------------------------------
# particle <-> grid (np.add.at scatters / fancy-index gathers)
# ---------------------------------------------------------------------------

def _corners(px, bmin, h, bias):
    gi = np.floor((px - bmin) / h - bias).astype(np.int64)
    gx = (gi + bias) * h + bmin
    w = np.abs(gx - px) / h
    return gi, gx - px, w


def fluid_levelset(px, res, bmin, h, gdx, mass=None):
    r = gdx * 0.5 * math.sqrt(3.0) * 1.02
    phi = np.full(res, 3.0 * gdx, F).ravel()
    gi = np.clip(np.floor((px - bmin) / h).astype(np.int64), 0,
                 np.asarray(res) - 1)
    if mass is not None:
        px = px[mass > 0]
        gi = gi[mass > 0]
    offs = np.array(np.meshgrid(*([range(-2, 3)] * 3),
                                indexing="ij")).reshape(3, -1).T
    for o in offs:
        tgt = np.clip(gi + o, 0, np.asarray(res) - 1)
        c = (tgt + 0.5) * h + bmin
        d = np.linalg.norm(c - px, axis=-1) - r
        flat = (tgt[:, 0] * res[1] + tgt[:, 1]) * res[2] + tgt[:, 2]
        np.minimum.at(phi, flat, d)
    return phi.reshape(res)


def fluid_volume(px, pvol, dual_res, bmin, fine_h, mass=None):
    vol = np.zeros(dual_res, F).ravel()
    if mass is not None:
        px = px[mass > 0]
    gi, _, w = _corners(px, bmin, fine_h, np.zeros(3))
    hi = np.asarray(dual_res) - 1
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                o = np.array([ox, oy, oz])
                tgt = np.clip(gi + o, 0, hi)
                wt = np.prod(np.where(o == 1, w, 1.0 - w), axis=-1)
                flat = ((tgt[:, 0] * dual_res[1] + tgt[:, 1])
                        * dual_res[2] + tgt[:, 2])
                np.add.at(vol, flat, wt * pvol)
    fine_vol = float(np.prod(fine_h))
    return np.minimum(vol.reshape(dual_res), fine_vol)


def p2g(px, pm, pv, pc, res, bmin, h):
    gms, gvs = [], []
    hi = np.asarray(res) - 1  # base-res clamp (cell 2 :128)
    for a in range(3):
        fshape = tuple(res[i] + (1 if i == a else 0) for i in range(3))
        bias = np.array([0.0 if i == a else 0.5 for i in range(3)])
        gm = np.zeros(fshape, F).ravel()
        gv = np.zeros(fshape, F).ravel()
        gi, disp, w = _corners(px, bmin, h, bias)
        for ox in (0, 1):
            for oy in (0, 1):
                for oz in (0, 1):
                    o = np.array([ox, oy, oz])
                    tgt = np.clip(gi + o, 0, hi)
                    wt = np.prod(np.where(o == 1, w, 1.0 - w), -1) * pm
                    cv = np.sum((disp + o * h) * pc[:, a, :], -1)
                    flat = ((tgt[:, 0] * fshape[1] + tgt[:, 1])
                            * fshape[2] + tgt[:, 2])
                    np.add.at(gm, flat, wt)
                    np.add.at(gv, flat, wt * (pv[:, a] + cv))
        gm = gm.reshape(fshape)
        gv = gv.reshape(fshape)
        gvs.append(np.where(gm > 0, gv / np.where(gm > 0, gm, 1.0), 0.0))
        gms.append(gm)
    return gms, gvs


def g2p(px, gvs, res, bmin, h):
    n = px.shape[0]
    pv = np.zeros((n, 3), F)
    pc = np.zeros((n, 3, 3), F)
    hi = np.asarray(res) - 1
    for a in range(3):
        bias = np.array([0.0 if i == a else 0.5 for i in range(3)])
        gi, _, w = _corners(px, bmin, h, bias)
        flat = gvs[a].ravel()
        sh = gvs[a].shape
        for ox in (0, 1):
            for oy in (0, 1):
                for oz in (0, 1):
                    o = np.array([ox, oy, oz])
                    tgt = np.clip(gi + o, 0, hi)
                    v = flat[(tgt[:, 0] * sh[1] + tgt[:, 1]) * sh[2]
                             + tgt[:, 2]]
                    wd = np.where(o == 1, w, 1.0 - w)
                    pv[:, a] += wd.prod(-1) * v
                    for k in range(3):
                        g = np.float64(2 * o[k] - 1)
                        for j in range(3):
                            if j != k:
                                g = g * wd[:, j]
                        pc[:, a, k] += g * v / h[k]
    return pv, pc


# ---------------------------------------------------------------------------
# extrapolation & boundary conditions
# ---------------------------------------------------------------------------

def extrapolate(v, valid, iters):
    interior = interior_mask(v.shape)
    dirs = [tuple(s if k == ax else 0 for k in range(3))
            for ax in range(3) for s in (1, -1)]
    for _ in range(iters):
        vf = np.where(valid, v, 0.0)
        nb = sum(shift(vf, o, 0.0) for o in dirs)
        cnt = sum(shift(valid.astype(F), o, 0.0) for o in dirs)
        upd = (~valid) & (cnt > 0) & interior
        v = np.where(upd, nb / np.maximum(cnt, 1.0), v)
        valid = valid | upd
    return v, valid


def boundary_condition(gvs, gms, sphi, sv, dx):
    out = []
    for a in range(3):
        shp = gvs[a].shape
        par = face_parity(a)

        def sph(off):
            return dual_sample(sphi, par, off, shp, 1e9)

        def svc(c):
            return dual_sample(sv[..., c], par, (0, 0, 0), shp, 0.0)

        ndist = sph((0, 0, 0)) / dx
        v_rel = [None] * 3
        mass_ok = np.ones(shp, bool)
        v_rel[a] = gvs[a] - svc(a)
        for t in range(3):
            if t == a:
                continue
            vm = np.zeros(shp, F)
            ms = np.zeros(shp, F)
            for ja in (0, 1):
                for jt in (0, 1):
                    off = [0, 0, 0]
                    off[a] = -ja
                    off[t] = jt
                    vm += (sample(gvs[t], tuple(off), shp, 0.0)
                           * sample(gms[t], tuple(off), shp, 0.0))
                    ms += sample(gms[t], tuple(off), shp, 0.0)
            mass_ok &= ms > 0
            v_rel[t] = vm / np.maximum(ms, 1e-30) - svc(t)
        sn = []
        for k in range(3):
            op = [0, 0, 0]
            om = [0, 0, 0]
            op[k], om[k] = 1, -1
            sn.append(sph(tuple(op)) - sph(tuple(om)))
        sn_sq = sum(s * s for s in sn)
        dot = sum(sn[k] * v_rel[k] for k in range(3))
        dv = -(np.minimum(0.0, dot) * sn[a]
               / np.maximum(sn_sq, 1e-30)) * (1.0 - ndist)
        act = interior_mask(shp) & (ndist < 1.0) & mass_ok
        out.append(gvs[a] + np.where(act, dv, 0.0))
    return out


# ---------------------------------------------------------------------------
# linear solves (host-loop PCG, f64 — the reference's CG structure)
# ---------------------------------------------------------------------------

def _ghost(phi, nphi):
    den = phi - nphi
    safe = np.where(den == 0, 1.0, den)
    return np.clip(phi / safe, 0.01, 1.0)


def poisson_coefs(w_faces, lphi, unit_diag):
    shp = lphi.shape
    active = interior_mask(shp) & (lphi < 0)
    diag = np.zeros(shp, F)
    coefs = []
    for a in range(3):
        for side in (1, -1):
            off = [0, 0, 0]
            off[a] = side
            nphi = shift(lphi, tuple(off), 1.0)
            woff = [0, 0, 0]
            if side > 0:
                woff[a] = 1
            w = sample(w_faces[a], tuple(woff), shp, 0.0)
            dw = np.ones_like(w) if unit_diag else w
            diag += np.where(nphi < 0, dw, dw / _ghost(lphi, nphi))
            coefs.append((tuple(off),
                          np.where(active & (nphi < 0), -w, 0.0)))
    diag = np.where(active, diag, 0.0)
    pd = np.where(active & (diag > 0), diag, 1.0)
    return diag, coefs, pd


def pcg(matvec, b, x0, pd, tol, rel_tol, max_iter):
    x = x0.copy()
    r = b - matvec(x)
    z = r / pd
    delta = float((r * z).sum())
    res = float((r * r).sum())
    res0 = res
    thresh = max(tol * tol, rel_tol * rel_tol * res0)
    d = z.copy()
    it = 0
    while res >= thresh and it < max_iter and delta != 0:
        q = matvec(d)
        dq = float((d * q).sum())
        alpha = delta / dq if dq != 0 else 0.0
        x += alpha * d
        r -= alpha * q
        z = r / pd
        nd = float((r * z).sum())
        res = float((r * r).sum())
        beta = nd / delta if delta != 0 else 0.0
        d = z + beta * d
        delta = nd
        it += 1
    return x, it


def cell_poisson_solve(b, diag, coefs, pd, tol, rel_tol, max_iter):
    def mv(p):
        out = diag * p
        for off, c in coefs:
            out = out + c * shift(p, off, 0.0)
        return out

    return pcg(mv, b, np.zeros_like(b), pd, tol, rel_tol, max_iter)


def pressure_solve(gvs, sv, lphi, w_faces, h, tol, rel_tol, max_iter):
    shp = lphi.shape
    b = np.zeros(shp, F)
    for a in range(3):
        for side in (1, -1):
            woff = [0, 0, 0]
            if side > 0:
                woff[a] = 1
            w = sample(w_faces[a], tuple(woff), shp, 0.0)
            v = sample(gvs[a], tuple(woff), shp, 0.0)
            sgn = 1.0 if side > 0 else -1.0
            b += sgn * w * v / h[a]
            off = [0, 0, 0]
            off[a] = side
            svf = dual_sample(sv[..., a], (1, 1, 1), tuple(off), shp, 0.0)
            b -= np.where(w < 1, sgn * w * svf / h[a], 0.0)
    active = interior_mask(shp) & (lphi < 0)
    b = np.where(active, b, 0.0)
    diag, coefs, pd = poisson_coefs(w_faces, lphi, False)
    x, it = cell_poisson_solve(b, diag, coefs, pd, tol, rel_tol, max_iter)
    out = []
    gres = shp
    for a in range(3):
        fshape = gvs[a].shape
        off_m = [0, 0, 0]
        off_m[a] = -1
        phi_c = sample(lphi, (0, 0, 0), fshape, 1.0)
        phi_m = sample(lphi, tuple(off_m), fshape, 1.0)
        p_c = sample(x, (0, 0, 0), fshape, 0.0)
        p_m = sample(x, tuple(off_m), fshape, 0.0)
        theta = np.clip(edge_frac(phi_c, phi_m), 0.01, 1.0)
        new_v = gvs[a] + (p_c - p_m) * h[a] / theta
        svf = dual_sample(sv[..., a], face_parity(a), (0, 0, 0), fshape, 0.0)
        blended = w_faces[a] * new_v + (1.0 - w_faces[a]) * svf
        act = (interior_mask(fshape, active_hi=gres)
               & ((phi_c < 0) | (phi_m < 0)))
        out.append(np.where(act, blended, gvs[a]))
    return out, it


def _visc_terms(a):
    """Term table of the coupled viscosity operator (ViscosityCGSolver3D
    matvecmul_{x,y,z}_kernel :248-456, via the engine's verified table)."""
    terms = []

    def e(k, n=1):
        v = [0, 0, 0]
        v[k] = n
        return tuple(v)

    for sgn in (1, -1):
        terms.append((e(a, 2 * sgn), a, e(a, sgn), e(a, sgn), 2.0, -1.0))
    for t in range(3):
        if t == a:
            continue
        for sgn in (1, -1):
            terms.append((e(t, 2 * sgn), a, e(t, sgn), e(t, sgn), 1.0, -1.0))
    for t in range(3):
        if t == a:
            continue
        ea, et = e(a), e(t)
        mea = tuple(-x for x in ea)
        met = tuple(-x for x in et)
        add = lambda u, v: tuple(x + y for x, y in zip(u, v))
        sub = lambda u, v: tuple(x - y for x, y in zip(u, v))
        terms.append((add(ea, et), t, et, et, 1.0, -1.0))
        terms.append((add(mea, et), t, sub(et, ea), et, 1.0, 1.0))
        terms.append((sub(ea, et), t, (0, 0, 0), met, 1.0, 1.0))
        terms.append((sub(mea, et), t, mea, met, 1.0, -1.0))
    return terms


def viscosity_solve(dt, mu, rho, gvs, sphi, lvol, cell_vol,
                    tol, rel_tol, max_iter):
    s_mu = dt / cell_vol / rho * mu
    vol = lvol / (cell_vol * 0.125)
    shapes = [v.shape for v in gvs]
    # extrapolate 3 layers into the solid (valid = sphi >= 0)
    ext = []
    for a in range(3):
        valid = dual_sample(sphi, face_parity(a), (0, 0, 0),
                            shapes[a], -1.0) >= 0
        ve, _ = extrapolate(gvs[a].astype(F), valid, 3)
        ext.append(ve)
    diags, per_axis, pdiags, actives = [], [], [], []
    for a in range(3):
        shp = shapes[a]
        par = face_parity(a)
        active = interior_mask(shp) & (
            dual_sample(sphi, par, (0, 0, 0), shp, -1.0) >= 0)
        dval = dual_sample(vol, par, (0, 0, 0), shp, 0.0)
        extra = np.zeros(shp, F)
        for k in range(3):
            f = 2.0 if k == a else 1.0
            for sgn in (1, -1):
                off = [0, 0, 0]
                off[k] = sgn
                extra += f * dual_sample(vol, par, tuple(off), shp, 0.0)
        diag_raw = dval + s_mu * extra
        diags.append(np.where(active, diag_raw, 0.0))
        pdiags.append(np.where(active & (diag_raw > 0), diag_raw, 1.0))
        actives.append(active)
        terms = []
        for cond, field, voff, voloff, fac, sgn in _visc_terms(a):
            fluid_n = dual_sample(sphi, par, cond, shp, -1.0) >= 0
            vc = dual_sample(vol, par, voloff, shp, 0.0)
            terms.append((field, voff, fluid_n, sgn * fac * s_mu * vc))
        per_axis.append(terms)
    # RHS: vol*v + solid-neighbour Dirichlet terms
    b = []
    for a in range(3):
        shp = shapes[a]
        bb = dual_sample(vol, face_parity(a), (0, 0, 0), shp, 0.0) * ext[a]
        for field, voff, fluid_n, coef in per_axis[a]:
            vv = sample(ext[field], voff, shp, 0.0)
            bb += np.where(~fluid_n, -coef * vv, 0.0)
        b.append(np.where(actives[a], bb, 0.0))

    def mv(vs):
        out = []
        for a in range(3):
            acc = diags[a] * vs[a]
            for field, voff, fluid_n, coef in per_axis[a]:
                acc = acc + np.where(
                    fluid_n, coef * sample(vs[field], voff, vs[a].shape, 0.0),
                    0.0)
            out.append(np.where(actives[a], acc, 0.0))
        return out

    # 3-field PCG (tree-structured over the tuple)
    x = [e.copy() for e in ext]
    r = [bb - q for bb, q in zip(b, mv(x))]
    z = [rr / pdd for rr, pdd in zip(r, pdiags)]
    delta = sum(float((rr * zz).sum()) for rr, zz in zip(r, z))
    res = sum(float((rr * rr).sum()) for rr in r)
    res0 = res
    thresh = max(tol * tol, rel_tol * rel_tol * res0)
    d = [zz.copy() for zz in z]
    it = 0
    while res >= thresh and it < max_iter and delta != 0:
        q = mv(d)
        dq = sum(float((dd * qq).sum()) for dd, qq in zip(d, q))
        alpha = delta / dq if dq != 0 else 0.0
        x = [xx + alpha * dd for xx, dd in zip(x, d)]
        r = [rr - alpha * qq for rr, qq in zip(r, q)]
        z = [rr / pdd for rr, pdd in zip(r, pdiags)]
        nd = sum(float((rr * zz).sum()) for rr, zz in zip(r, z))
        res = sum(float((rr * rr).sum()) for rr in r)
        beta = nd / delta if delta != 0 else 0.0
        d = [zz + beta * dd for zz, dd in zip(z, d)]
        delta = nd
        it += 1
    out = []
    gres = tuple(min(s) for s in zip(*shapes))
    for a in range(3):
        shp = shapes[a]
        act = (interior_mask(shp, active_hi=tuple(
            s - (1 if i == a else 0) for i, s in enumerate(shp)))
            & (dual_sample(sphi, face_parity(a), (0, 0, 0), shp, -1.0) >= 0))
        out.append(np.where(act, x[a], gvs[a]))
    return out, it


def density_solve(rho0, dt, px, pm, pvol, sphi, lphi, w_faces, bmin, h,
                  tol, rel_tol, max_iter):
    res = lphi.shape
    # mass/volume scatter at cell centers (bias 0.5)
    gm = np.zeros(res, F).ravel()
    gvol = np.zeros(res, F).ravel()
    gi, _, w = _corners(px, bmin, h, np.full(3, 0.5))
    hi = np.asarray(res) - 1
    pv = pvol * (pm > 0)
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                o = np.array([ox, oy, oz])
                tgt = np.clip(gi + o, 0, hi)
                wt = np.prod(np.where(o == 1, w, 1.0 - w), -1)
                flat = (tgt[:, 0] * res[1] + tgt[:, 1]) * res[2] + tgt[:, 2]
                np.add.at(gm, flat, wt * pm)
                np.add.at(gvol, flat, wt * pv)
    gm = gm.reshape(res)
    gvol = gvol.reshape(res)
    # fix_volume
    cvol = float(np.prod(h))
    dx = float(min(h))
    near_solid = dual_sample(sphi, (1, 1, 1), (0, 0, 0), res, 1e9) < dx
    fluid_int = lphi < 0
    for a in range(3):
        for side in (1, -1):
            off = [0, 0, 0]
            off[a] = side
            fluid_int = fluid_int & (shift(lphi, tuple(off), 1.0) < 0)
    fvol = np.where(fluid_int & ~near_solid, cvol, gvol)
    nsf = sum(
        sample(w_faces[a], (0, 0, 0), res, 0.0)
        + sample(w_faces[a],
                 tuple(1 if i == a else 0 for i in range(3)), res, 0.0)
        for a in range(3)
    ) / 6.0
    new = np.minimum(fvol, cvol * nsf)
    gvol = np.where(interior_mask(res), new, gvol)
    # rhs: b = (1 - clamp(rho_frac, .5, 1.5))/dt with solid imputation
    solid_vol = (1.0 - nsf) * cvol
    cell_mass = gm + rho0 * solid_vol
    cell_vol = gvol + solid_vol
    frac = cell_mass / np.maximum(cell_vol, 1e-10) / rho0
    frac = np.clip(np.where(cell_mass < 1e-10, 1.0, frac), 0.5, 1.5)
    active = interior_mask(res) & (lphi < 0)
    b = np.where(active, (1.0 - frac) / dt, 0.0)
    diag, coefs, pd = poisson_coefs(w_faces, lphi, True)
    x, it = cell_poisson_solve(b, diag, coefs, pd, tol, rel_tol, max_iter)
    # displacement + gather
    new_px = px.astype(F).copy()
    for a in range(3):
        fshape = tuple(res[i] + (1 if i == a else 0) for i in range(3))
        off_m = [0, 0, 0]
        off_m[a] = -1
        phi_c = sample(lphi, (0, 0, 0), fshape, 1.0)
        phi_m = sample(lphi, tuple(off_m), fshape, 1.0)
        theta = np.clip(edge_frac(phi_c, phi_m), 0.01, 1.0)
        p_c = sample(x, (0, 0, 0), fshape, 0.0)
        p_m = sample(x, tuple(off_m), fshape, 0.0)
        disp = np.where(interior_mask(fshape, active_hi=res),
                        (p_c - p_m) * dt * h[a] / theta, 0.0)
        bias = np.array([0.0 if i == a else 0.5 for i in range(3)])
        gi, _, w = _corners(px, bmin, h, bias)
        hi_f = np.asarray(fshape) - 1
        flat = disp.ravel()
        acc = np.zeros(px.shape[0], F)
        for ox in (0, 1):
            for oy in (0, 1):
                for oz in (0, 1):
                    o = np.array([ox, oy, oz])
                    tgt = np.clip(gi + o, 0, hi_f)
                    wt = np.prod(np.where(o == 1, w, 1.0 - w), -1)
                    acc += wt * flat[(tgt[:, 0] * fshape[1] + tgt[:, 1])
                                     * fshape[2] + tgt[:, 2]]
        new_px[:, a] += acc
    return new_px, it


# ---------------------------------------------------------------------------
# one step (cell 13 order) + CLI
# ---------------------------------------------------------------------------

def step(state, cfg, timers=None):
    g = cfg.grid
    ph = cfg.physics
    sol = cfg.solver
    res = tuple(g.res)
    h = np.asarray(g.cell_size, F)
    bmin = np.asarray(g.bound_min, F)
    px, pv, pc, pm = state["x"], state["v"], state["c"], state["m"]
    sphi, sv, rb = state["sphi"], state["sv"], state["rb"]
    pvol = cfg.particle_dx ** 3

    def t(name):
        if timers is not None:
            timers.setdefault(name, 0.0)
            return name
        return None

    t0 = time.perf_counter()
    vmax = float(np.max(np.linalg.norm(pv, axis=-1)))
    dt = min(ph.dt, g.dx / max(vmax, 1e-10)) \
        if cfg.dt_mode == "cfl" else ph.dt
    px = px + pv * dt
    px = sdf_project(rb, px)
    _mark(timers, "advect", t0)

    t0 = time.perf_counter()
    w_faces = solid_fractions(sphi, res)
    lphi = fluid_levelset(px, res, bmin, h, g.dx, pm)
    px, d_it = density_solve(ph.rho, dt, px, pm, pvol, sphi, lphi,
                             w_faces, bmin, h, sol.tol, sol.rel_tol,
                             sol.max_iter)
    lphi = fluid_levelset(px, res, bmin, h, g.dx, pm)
    _mark(timers, "density", t0)

    t0 = time.perf_counter()
    lvol = fluid_volume(px, pvol, tuple(2 * n + 1 for n in res), bmin,
                        np.asarray(g.dual_cell_size, F), pm)
    gms, gvs = p2g(px, pm, pv, pc, res, bmin, h)
    gvs[1] = gvs[1] + ph.gravity * dt
    _mark(timers, "p2g", t0)

    t0 = time.perf_counter()
    v_it = 0
    if ph.mu > 0:
        gvs, v_it = viscosity_solve(dt, ph.mu, ph.rho, gvs, sphi, lvol,
                                    float(np.prod(h)), sol.tol,
                                    sol.rel_tol, sol.max_iter)
    _mark(timers, "viscosity", t0)

    t0 = time.perf_counter()
    gvs, p_it = pressure_solve(gvs, sv, lphi, w_faces, h, sol.tol,
                               sol.rel_tol, sol.max_iter)
    _mark(timers, "pressure", t0)

    t0 = time.perf_counter()
    for a in range(3):
        gvs[a], _ = extrapolate(gvs[a], gms[a] > 0, 2)
    gvs = boundary_condition(gvs, gms, sphi, sv, g.dx)
    pv, pc = g2p(px, gvs, res, bmin, h)
    _mark(timers, "g2p", t0)

    state = dict(state, x=px.astype(np.float32).astype(F), v=pv, c=pc)
    return state, dict(dt=dt, density_iters=d_it, viscosity_iters=v_it,
                       pressure_iters=p_it)


def _mark(timers, name, t0):
    if timers is not None:
        timers[name] = timers.get(name, 0.0) + time.perf_counter() - t0


def state_from_engine(cfg, sim_state):
    """Convert the package's SimState (scene construction only — untimed)."""
    return {
        "x": np.asarray(sim_state.particles.x, F),
        "v": np.asarray(sim_state.particles.v, F),
        "c": np.asarray(sim_state.particles.c, F),
        "m": np.asarray(sim_state.particles.m, F),
        "sphi": np.asarray(sim_state.solid.phi, F),
        "sv": np.asarray(sim_state.solid.v, F),
        "rb": np.asarray(sim_state.solid.rb, F),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=0.0125)
    ap.add_argument("--res", type=int, default=None,
                    help="use scaled_buckling_config(res) instead of dx")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--mu", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from python_fluid_simulation_tpu.engine import scenes

    if args.res:
        cfg = scenes.scaled_buckling_config(res=args.res)
    else:
        cfg = scenes.buckling_config(dx=args.dx, mu=args.mu,
                                     viscosity_mode="apic")
    state0 = scenes.buckling_scene(cfg)
    state = state_from_engine(cfg, state0)
    n = state["x"].shape[0]

    timers = {}
    t_all = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, cfg, timers)
        print(f"step {i}: {m}", file=sys.stderr)
    elapsed = time.perf_counter() - t_all
    out = {
        "impl": "numpy-cpu-reference",
        "grid": list(cfg.grid.res),
        "particles": int(n),
        "steps": args.steps,
        "s_per_step": round(elapsed / args.steps, 3),
        "phase_s_per_step": {k: round(v / args.steps, 3)
                             for k, v in sorted(timers.items())},
        "threads": os.environ.get("OMP_NUM_THREADS", "default"),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
