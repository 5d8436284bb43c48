"""A complete, independent NumPy (f64, loop-based) implementation of one
reference simulation step — the golden cross-check oracle (SURVEY §4:
"golden-run regression vs. a NumPy port of the reference step").

Every function transliterates the corresponding reference CUDA kernel's
semantics (cited per function) with plain Python loops / dense linear
algebra — deliberately the *opposite* implementation style from the
vectorised parity/shift JAX code under test.  Where the build documents a
divergence from the reference (fixed wz bug, full-extent vz extrapolation,
explicit masks for the reference's NaN semantics), the oracle implements
the build's documented semantics — those quirks have their own dedicated
bit-parity tests elsewhere.

The three implicit systems are assembled as DENSE matrices over the
active sites and solved exactly (np.linalg.solve) — the limit of the
build's CG at tight tolerance.
"""

import itertools
import math

import numpy as np


# ---------------------------------------------------------------------------
# geometry: flipped-box projection (sdf3D.py box_project, :123 — the clamp
# applies unconditionally for flipped boxes)
# ---------------------------------------------------------------------------

def project_flipped_box(px, center, size):
    out = px.copy()
    half = np.asarray(size, np.float64) * 0.5
    c = np.asarray(center, np.float64)
    for i in range(out.shape[0]):
        out[i] = np.clip(out[i] - c, -half, half) + c
    return out


# ---------------------------------------------------------------------------
# general rigid-body projection, per body IN TABLE ORDER on the already-
# moved position (project_kernel, sdf3D.py:245-260).  Bodies are dicts
# {kind: 'sphere'|'box'|'cylinder', flip: bool, params: [..], center: (3,),
# R: (3,3) world-from-local rotation}; p_local = R^T (p - center).
# ---------------------------------------------------------------------------

def _project_sphere_one(p, center, r, flip):
    # sphere_project (sdf3D.py:69-85)
    disp = p - center
    dist = math.sqrt(disp @ disp)
    sd = dist - r
    if flip:
        sd = -sd
    if sd < 0:
        n = disp / dist if dist > 0 else disp
        return n * r + center
    return p


def _project_box_one(p, center, R, size, flip):
    # box_project (sdf3D.py:112-144).  Flipped: `if flipped and ~(in_out)`
    # — bitwise NOT of a non-negative int is always truthy, so the clamp
    # applies unconditionally (:123).  Non-flipped & inside: push through
    # the nearest face, faces scanned in (+x,-x,+y,-y,+z,-z) order with
    # strict `<` updates seeded at dist=100 (:132-141).
    pl = R.T @ (p - center)
    half = np.asarray(size, np.float64) * 0.5
    if flip:
        pl = np.clip(pl, -half, half)
        return R @ pl + center
    in_out = 0
    for i in range(3):
        if pl[i] > half[i] or pl[i] < -half[i]:
            in_out += 1
    if in_out == 0:
        index, dist = 0, 100.0
        for i in range(3):
            if half[i] - pl[i] < dist:
                dist = half[i] - pl[i]
                index = 2 * i
            if pl[i] + half[i] < dist:
                dist = pl[i] + half[i]
                index = 2 * i + 1
        pl[index // 2] += dist * (-1.0) ** (index % 2)
        return R @ pl + center
    return p


def _project_cylinder_one(p, center, R, r, height, flip):
    # cylinder_project (sdf3D.py:174-219); local y is the axis.
    pl = R.T @ (p - center)
    hh = height / 2.0
    y_clip = pl[1]
    if pl[1] < -hh:
        y_clip = -hh
    elif pl[1] > hh:
        y_clip = hh
    dist = math.sqrt(pl[0] ** 2 + pl[2] ** 2)
    sd = dist - r
    if flip:
        if abs(y_clip) == hh or sd > 0:
            if sd < 0:  # above/below the cylinder
                pl[1] = y_clip
            else:  # project onto the side face
                pl[0] = pl[0] / dist * r
                pl[2] = pl[2] / dist * r
                pl[1] = y_clip
        return R @ pl + center
    if sd < 0 and abs(y_clip) != hh:  # strictly inside
        mx = max(sd, pl[1] - hh, -(pl[1] + hh))
        if mx == sd:
            pl[0] = pl[0] / dist * r
            pl[2] = pl[2] / dist * r
        elif mx == pl[1] - hh:
            pl[1] = hh
        else:
            pl[1] = -hh
        return R @ pl + center
    return p


def project_bodies(px, bodies):
    out = px.astype(np.float64).copy()
    for i in range(out.shape[0]):
        p = out[i]
        for b in bodies:
            if b["kind"] == "sphere":
                p = _project_sphere_one(
                    p, np.asarray(b["center"], np.float64),
                    float(b["params"][0]), bool(b["flip"]),
                )
            elif b["kind"] == "box":
                p = _project_box_one(
                    p, np.asarray(b["center"], np.float64),
                    np.asarray(b["R"], np.float64), b["params"],
                    bool(b["flip"]),
                )
            else:
                p = _project_cylinder_one(
                    p, np.asarray(b["center"], np.float64),
                    np.asarray(b["R"], np.float64),
                    float(b["params"][0]), float(b["params"][1]),
                    bool(b["flip"]),
                )
        out[i] = p
    return out


# ---------------------------------------------------------------------------
# solid fractions (SolidFractionCommon.py:4-60, SolidFraction3D.py:6-26)
# ---------------------------------------------------------------------------

def edge_frac(l, r):
    li, ri = l < 0, r < 0
    if li and ri:
        return 1.0
    if not li and not ri:
        return 0.0
    diff = -abs(l - r)
    if diff == 0:
        diff = -1.0
    return (l if li else r) / diff


def tri_frac(v0, v1, v2):
    v = [v0, v1, v2]
    ins = [x < 0 for x in v]
    cnt = sum(ins)
    if cnt == 3:
        return 1.0
    if cnt == 0:
        return 0.0
    if cnt == 2:
        out_v = ins.index(False)
        k1, k2 = (out_v + 1) % 3, (out_v + 2) % 3
        return 1.0 - edge_frac(v[k1], v[k2])
    in_v = ins.index(True)
    k1, k2 = (in_v + 1) % 3, (in_v + 2) % 3
    return edge_frac(v[k1], v[k2])


def face_frac(bl, br, tl, tr):
    ce = 0.25 * (bl + br + tl + tr)
    return 0.25 * (
        tri_frac(bl, br, ce)
        + tri_frac(br, tr, ce)
        + tri_frac(tr, tl, ce)
        + tri_frac(tl, bl, ce)
    )


def solid_frac(sphi, res):
    nx, ny, nz = res
    wx = np.zeros((nx + 1, ny, nz))
    wy = np.zeros((nx, ny + 1, nz))
    wz = np.zeros((nx, ny, nz + 1))
    for x in range(nx):
        for y in range(ny):
            for z in range(nz):
                def s(i, j, k):
                    return sphi[2 * x + 2 * i, 2 * y + 2 * j, 2 * z + 2 * k]

                wx[x, y, z] = 1.0 - face_frac(s(0, 1, 0), s(0, 0, 0), s(0, 1, 1), s(0, 0, 1))
                wy[x, y, z] = 1.0 - face_frac(s(1, 0, 0), s(0, 0, 0), s(1, 0, 1), s(0, 0, 1))
                wz[x, y, z] = 1.0 - face_frac(s(1, 1, 0), s(0, 1, 0), s(1, 0, 0), s(0, 0, 0))
    return wx, wy, wz


# ---------------------------------------------------------------------------
# fluid level set (cell 4 :224-278) and fluid volume (cell 6 :442-500)
# ---------------------------------------------------------------------------

def fluid_levelset(px, res, bmin, h, gdx):
    phi = np.full(res, 3.0 * gdx)
    r = gdx * 0.5 * math.sqrt(3.0) * 1.02
    for p in range(px.shape[0]):
        gi = [
            int(np.clip(math.floor((px[p, a] - bmin[a]) / h[a]), 0, res[a] - 1))
            for a in range(3)
        ]
        for ox in range(-2, 3):
            for oy in range(-2, 3):
                for oz in range(-2, 3):
                    t = [
                        int(np.clip(gi[0] + ox, 0, res[0] - 1)),
                        int(np.clip(gi[1] + oy, 0, res[1] - 1)),
                        int(np.clip(gi[2] + oz, 0, res[2] - 1)),
                    ]
                    c = [(t[a] + 0.5) * h[a] + bmin[a] for a in range(3)]
                    d = math.sqrt(sum((c[a] - px[p, a]) ** 2 for a in range(3)))
                    phi[t[0], t[1], t[2]] = min(phi[t[0], t[1], t[2]], d - r)
    return phi


def _trilinear_corners(pos, bmin, h, bias, res_clip):
    """Lower corner index, per-axis fractional weights, and the 8 corner
    (index, weight) pairs with border clamping (cell 2 :117-128)."""
    gi = [int(math.floor((pos[a] - bmin[a]) / h[a] - bias[a])) for a in range(3)]
    gx = [(gi[a] + bias[a]) * h[a] + bmin[a] for a in range(3)]
    w = [abs(gx[a] - pos[a]) / h[a] for a in range(3)]
    out = []
    for offs in itertools.product((0, 1), repeat=3):
        weight = 1.0
        for a in range(3):
            weight *= w[a] if offs[a] == 1 else 1.0 - w[a]
        t = tuple(
            int(np.clip(gi[a] + offs[a], 0, res_clip[a] - 1)) for a in range(3)
        )
        out.append((t, offs, weight))
    return gi, w, out


def fluid_volume(px, pvol, dual_res, bmin, fine_h):
    vol = np.zeros(dual_res)
    for p in range(px.shape[0]):
        _, _, corners = _trilinear_corners(
            px[p], bmin, fine_h, (0.0, 0.0, 0.0), dual_res
        )
        for t, _, weight in corners:
            vol[t] += weight * pvol
    fine_vol = fine_h[0] * fine_h[1] * fine_h[2]
    return np.minimum(vol, fine_vol)


# ---------------------------------------------------------------------------
# APIC transfers (cells 2-3 :94-223)
# ---------------------------------------------------------------------------

def p2g(px, pm, pv, pc, res, bmin, h):
    """Per-axis scatter; corner clamp to res-1 even on the face axis
    (cell 2 :128).  Returns ([gmx,gmy,gmz], [gvx,gvy,gvz])."""
    gms, gvs = [], []
    for a in range(3):
        fshape = tuple(res[i] + (1 if i == a else 0) for i in range(3))
        bias = tuple(0.0 if i == a else 0.5 for i in range(3))
        gm = np.zeros(fshape)
        gmv = np.zeros(fshape)
        for p in range(px.shape[0]):
            gi = [
                int(math.floor((px[p, i] - bmin[i]) / h[i] - bias[i]))
                for i in range(3)
            ]
            gx = [(gi[i] + bias[i]) * h[i] + bmin[i] for i in range(3)]
            disp = [gx[i] - px[p, i] for i in range(3)]
            w = [abs(disp[i]) / h[i] for i in range(3)]
            for offs in itertools.product((0, 1), repeat=3):
                weight = 1.0
                for i in range(3):
                    weight *= w[i] if offs[i] == 1 else 1.0 - w[i]
                cv = sum(
                    (disp[i] + offs[i] * h[i]) * pc[p, a, i] for i in range(3)
                )
                t = tuple(
                    int(np.clip(gi[i] + offs[i], 0, res[i] - 1))
                    for i in range(3)
                )
                gm[t] += weight * pm[p]
                gmv[t] += weight * pm[p] * (pv[p, a] + cv)
        gv = np.where(gm > 0, gmv / np.where(gm > 0, gm, 1.0), 0.0)
        gms.append(gm)
        gvs.append(gv)
    return gms, gvs


def g2p(px, gvs, res, bmin, h):
    """Gather velocity + affine rows; corners clamped to res-1 (cell 3)."""
    n = px.shape[0]
    pv = np.zeros((n, 3))
    pc = np.zeros((n, 3, 3))
    for a in range(3):
        bias = tuple(0.0 if i == a else 0.5 for i in range(3))
        arr = gvs[a]
        for p in range(n):
            gi = [
                int(math.floor((px[p, i] - bmin[i]) / h[i] - bias[i]))
                for i in range(3)
            ]
            gx = [(gi[i] + bias[i]) * h[i] + bmin[i] for i in range(3)]
            w = [abs(gx[i] - px[p, i]) / h[i] for i in range(3)]
            for offs in itertools.product((0, 1), repeat=3):
                t = tuple(
                    int(np.clip(gi[i] + offs[i], 0, res[i] - 1))
                    for i in range(3)
                )
                v = arr[t]
                wd = [w[i] if offs[i] == 1 else 1.0 - w[i] for i in range(3)]
                pv[p, a] += wd[0] * wd[1] * wd[2] * v
                for k in range(3):
                    grad = float(2 * offs[k] - 1)
                    for j in range(3):
                        if j != k:
                            grad *= wd[j]
                    pc[p, a, k] += grad * v / h[k]
    return pv, pc


# ---------------------------------------------------------------------------
# extrapolation (cell 7; full-extent semantics — the build's documented fix
# of the reference's vz launch-shape bug)
# ---------------------------------------------------------------------------

def extrapolate(v, valid, iters):
    v = v.copy()
    valid = valid.copy()
    sh = v.shape
    for _ in range(iters):
        nv = v.copy()
        nvalid = valid.copy()
        for x in range(1, sh[0] - 1):
            for y in range(1, sh[1] - 1):
                for z in range(1, sh[2] - 1):
                    if valid[x, y, z]:
                        continue
                    s, c = 0.0, 0
                    for off in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
                        i, j, k = x + off[0], y + off[1], z + off[2]
                        if valid[i, j, k]:
                            s += v[i, j, k]
                            c += 1
                    if c > 0:
                        nv[x, y, z] = s / c
                        nvalid[x, y, z] = True
        v, valid = nv, nvalid
    return v, valid


# ---------------------------------------------------------------------------
# boundary condition (cell 5 :279-441; explicit-mask semantics per build)
# ---------------------------------------------------------------------------

def _face_parity(a):
    p = [1, 1, 1]
    p[a] = 0
    return tuple(p)


def _dual_at(sphi, q, fill):
    for a in range(3):
        if q[a] < 0 or q[a] >= sphi.shape[a]:
            return fill
    return sphi[q[0], q[1], q[2]]


def boundary_condition(gvs, gms, sphi, sv, dx):
    out = [g.copy() for g in gvs]
    for a in range(3):
        sh = gvs[a].shape
        par = _face_parity(a)
        for x in range(1, sh[0] - 1):
            for y in range(1, sh[1] - 1):
                for z in range(1, sh[2] - 1):
                    q = (2 * x + par[0], 2 * y + par[1], 2 * z + par[2])
                    ndist = _dual_at(sphi, q, 1e9) / dx
                    if ndist >= 1.0:
                        continue
                    v_rel = [0.0] * 3
                    v_rel[a] = gvs[a][x, y, z] - _dual_at(sv[..., a], q, 0.0)
                    ok = True
                    for t in range(3):
                        if t == a:
                            continue
                        vm, m = 0.0, 0.0
                        for ja in (0, 1):
                            for jt in (0, 1):
                                idx = [x, y, z]
                                idx[a] += -ja
                                idx[t] += jt
                                i, j, k = idx
                                if (
                                    0 <= i < gvs[t].shape[0]
                                    and 0 <= j < gvs[t].shape[1]
                                    and 0 <= k < gvs[t].shape[2]
                                ):
                                    vm += gvs[t][i, j, k] * gms[t][i, j, k]
                                    m += gms[t][i, j, k]
                        if m <= 0:
                            ok = False
                            break
                        v_rel[t] = vm / m - _dual_at(sv[..., t], q, 0.0)
                    if not ok:
                        continue
                    sn = []
                    for k3 in range(3):
                        qp = list(q)
                        qm = list(q)
                        qp[k3] += 1
                        qm[k3] -= 1
                        sn.append(
                            _dual_at(sphi, tuple(qp), 1e9)
                            - _dual_at(sphi, tuple(qm), 1e9)
                        )
                    sn_sq = sum(s * s for s in sn)
                    dot = sum(sn[k3] * v_rel[k3] for k3 in range(3))
                    gv_sn = min(0.0, dot) * sn[a] / max(sn_sq, 1e-30)
                    out[a][x, y, z] += -gv_sn * (1.0 - ndist)
    return out


# ---------------------------------------------------------------------------
# cell-centred ghost-fluid systems (pressure / density)
# PressureCGSolver3D.py:6-153, DensityCGSolver3D.py:86-238
# ---------------------------------------------------------------------------

def _clip_frac(phi, nphi):
    diff = phi - nphi
    f = phi / diff if diff != 0 else phi
    return min(1.0, max(0.01, f))


def _cell_neighbors(x, y, z, w):
    wx, wy, wz = w
    return [
        ((x + 1, y, z), wx[x + 1, y, z]),
        ((x - 1, y, z), wx[x, y, z]),
        ((x, y + 1, z), wy[x, y + 1, z]),
        ((x, y - 1, z), wy[x, y, z]),
        ((x, y, z + 1), wz[x, y, z + 1]),
        ((x, y, z - 1), wz[x, y, z]),
    ]


def solve_cell_system(b, lphi, w, unit_diag):
    """Exact solve of the 7-point ghost-fluid system over active cells.

    unit_diag=False: pressure (diag accumulates w);  True: density (diag
    accumulates 1).  Off-diagonal always -w to fluid neighbours.
    """
    res = lphi.shape
    active = {}
    sites = []
    for x in range(1, res[0] - 1):
        for y in range(1, res[1] - 1):
            for z in range(1, res[2] - 1):
                if lphi[x, y, z] < 0:
                    active[(x, y, z)] = len(sites)
                    sites.append((x, y, z))
    n = len(sites)
    if n == 0:
        return np.zeros(res)
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    for i, (x, y, z) in enumerate(sites):
        phi = lphi[x, y, z]
        diag = 0.0
        for nbr, ww in _cell_neighbors(x, y, z, w):
            nphi = lphi[nbr]
            if nphi < 0:
                diag += 1.0 if unit_diag else ww
                if nbr in active:
                    A[i, active[nbr]] -= ww
                # fluid-but-inactive neighbours hold value 0 in the build's
                # CG (x0 = 0, zero-masked matvec rows) — nothing to move
            else:
                dw = 1.0 if unit_diag else ww
                diag += dw / _clip_frac(phi, nphi)
        A[i, i] = diag if diag != 0 else 1.0
        rhs[i] = b[x, y, z]
    # lstsq, not solve: a fluid pocket sealed inside solid (all-Neumann
    # component, e.g. jittered particles inside the funnel slabs) makes A
    # singular-but-consistent; CG from x0=0 converges to the minimum-norm
    # solution, which for SPsemiD A is exactly the lstsq solution
    sol = np.linalg.lstsq(A, rhs, rcond=None)[0]
    out = np.zeros(res)
    for i, s in enumerate(sites):
        out[s] = sol[i]
    return out


def pressure_rhs(gvs, sv, lphi, w, h):
    res = lphi.shape
    wx, wy, wz = w
    b = np.zeros(res)
    for x in range(1, res[0] - 1):
        for y in range(1, res[1] - 1):
            for z in range(1, res[2] - 1):
                if lphi[x, y, z] >= 0:
                    continue
                val = 0.0
                faces = [
                    (0, (x + 1, y, z), +1, (2 * x + 2, 2 * y + 1, 2 * z + 1)),
                    (0, (x, y, z), -1, (2 * x, 2 * y + 1, 2 * z + 1)),
                    (1, (x, y + 1, z), +1, (2 * x + 1, 2 * y + 2, 2 * z + 1)),
                    (1, (x, y, z), -1, (2 * x + 1, 2 * y, 2 * z + 1)),
                    (2, (x, y, z + 1), +1, (2 * x + 1, 2 * y + 1, 2 * z + 2)),
                    (2, (x, y, z), -1, (2 * x + 1, 2 * y + 1, 2 * z)),
                ]
                for a, f, sgn, q in faces:
                    ww = w[a][f]
                    val += sgn * ww * gvs[a][f] / h[a]
                    if ww < 1:
                        val -= sgn * ww * sv[q[0], q[1], q[2], a] / h[a]
                b[x, y, z] = val
    return b


def apply_pressure(gvs, p, w, sv, lphi, h):
    res = lphi.shape
    out = [g.copy() for g in gvs]
    for a in range(3):
        par = _face_parity(a)
        # interior_mask(fshape, active_hi=gres): every axis runs [1, gres-1]
        # (the trailing face plane is never updated, apply_pressure_kernel
        # bounds PressureCGSolver3D.py:135)
        for x in range(1, res[0]):
            for y in range(1, res[1]):
                for z in range(1, res[2]):
                    idx = (x, y, z)
                    m_idx = list(idx)
                    m_idx[a] -= 1
                    phi_c = lphi[idx]
                    phi_m = lphi[tuple(m_idx)]
                    if not (phi_c < 0 or phi_m < 0):
                        continue
                    theta = min(1.0, max(0.01, edge_frac(phi_c, phi_m)))
                    new_v = gvs[a][idx] + (p[idx] - p[tuple(m_idx)]) * h[a] / theta
                    q = (2 * x + par[0], 2 * y + par[1], 2 * z + par[2])
                    svf = _dual_at(sv[..., a], q, 0.0)
                    ww = w[a][idx]
                    out[a][idx] = ww * new_v + (1.0 - ww) * svf
    return out


# ---------------------------------------------------------------------------
# density projection (DensityCGSolver3D.py:8-238; fixed-wz semantics)
# ---------------------------------------------------------------------------

def density_scatter(px, pm, pvol, res, bmin, h):
    gm = np.zeros(res)
    gvol = np.zeros(res)
    for p in range(px.shape[0]):
        _, _, corners = _trilinear_corners(
            px[p], bmin, h, (0.5, 0.5, 0.5), res
        )
        for t, _, weight in corners:
            gm[t] += weight * pm[p]
            gvol[t] += weight * pvol
    return gm, gvol


def _nonsolid_frac_at(w, x, y, z):
    wx, wy, wz = w
    return (
        wx[x, y, z] + wx[x + 1, y, z]
        + wy[x, y, z] + wy[x, y + 1, z]
        + wz[x, y, z] + wz[x, y, z + 1]
    ) / 6.0


def fix_volume(gvol, sphi, lphi, w, h):
    res = lphi.shape
    cvol = h[0] * h[1] * h[2]
    dx = min(h)
    out = gvol.copy()
    for x in range(1, res[0] - 1):
        for y in range(1, res[1] - 1):
            for z in range(1, res[2] - 1):
                near_solid = sphi[2 * x + 1, 2 * y + 1, 2 * z + 1] < dx
                fi = lphi[x, y, z] < 0
                for off in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
                    i, j, k = x + off[0], y + off[1], z + off[2]
                    fi = fi and lphi[i, j, k] < 0
                fv = cvol if (fi and not near_solid) else gvol[x, y, z]
                out[x, y, z] = min(fv, cvol * _nonsolid_frac_at(w, x, y, z))
    return out


def density_rhs(rho0, dt, gm, gvol, lphi, w, h):
    res = lphi.shape
    cvol = h[0] * h[1] * h[2]
    b = np.zeros(res)
    for x in range(1, res[0] - 1):
        for y in range(1, res[1] - 1):
            for z in range(1, res[2] - 1):
                if lphi[x, y, z] >= 0:
                    continue
                nsf = _nonsolid_frac_at(w, x, y, z)
                solid_vol = (1.0 - nsf) * cvol
                cm = gm[x, y, z] + rho0 * solid_vol
                cv = gvol[x, y, z] + solid_vol
                if cm < 1e-10:
                    frac = 1.0
                else:
                    frac = cm / max(cv, 1e-10) / rho0
                frac = min(1.5, max(0.5, frac))
                b[x, y, z] = (1.0 - frac) / dt
    return b


def displacement(p, lphi, dt, h):
    res = lphi.shape
    disps = []
    for a in range(3):
        fshape = tuple(res[i] + (1 if i == a else 0) for i in range(3))
        d = np.zeros(fshape)
        # interior_mask(fshape, active_hi=gres): [1, gres-1] per axis
        for x in range(1, res[0]):
            for y in range(1, res[1]):
                for z in range(1, res[2]):
                    idx = (x, y, z)
                    m_idx = list(idx)
                    m_idx[a] -= 1
                    theta = min(
                        1.0,
                        max(0.01, edge_frac(lphi[idx], lphi[tuple(m_idx)])),
                    )
                    d[idx] = (p[idx] - p[tuple(m_idx)]) * dt * h[a] / theta
        disps.append(d)
    return disps


def apply_displacement(px, disps, bmin, h):
    out = px.copy()
    for a in range(3):
        arr = disps[a]
        bias = tuple(0.0 if i == a else 0.5 for i in range(3))
        for p in range(px.shape[0]):
            # gather clamps to the FACE array dims (DensityCGSolver3D.py:
            # 211-238), unlike P2G's base-res clamp
            _, _, corners = _trilinear_corners(
                px[p], bmin, h, bias, arr.shape
            )
            acc = 0.0
            for t, _, weight in corners:
                acc += weight * arr[t]
            out[p, a] += acc
    return out


def oracle_step(px, pv, pc, pm, sphi, sv, scene, phys, return_dt=False):
    """One full reference step (notebook cell 13 :4552-4693 order) on
    NumPy f64 state.  `scene`: dict(res, bmin, h, dual_h, gdx, pvol) plus
    either (box_center, box_size) or `bodies` (see project_bodies);
    `phys`: dict(rho, mu, dt, gravity, cell_vol) and optionally
    dt_mode='cfl' (+ duration, t).  Returns (px, pv, pc[, dt])."""
    res = scene["res"]
    bmin = scene["bmin"]
    h = scene["h"]
    dt = phys["dt"]
    if phys.get("dt_mode") == "cfl":
        # dt selection (cell 13 :4572-4576): cap at one grid cell per
        # step from the START-of-step particle speeds
        vmax = float(np.max(np.sqrt(np.sum(pv * pv, axis=-1))))
        dt = min(dt, scene["gdx"] / max(1e-10, vmax))
        if "duration" in phys:
            dt = min(dt, max(phys["duration"] - phys.get("t", 0.0), 1e-6))

    # advect + project out of solids (:4582-4584)
    px = px + pv * dt
    if "bodies" in scene:
        px = project_bodies(px, scene["bodies"])
    else:
        px = project_flipped_box(px, scene["box_center"], scene["box_size"])

    w = solid_frac(sphi, res)

    # density/position projection (:4587-4590)
    lphi = fluid_levelset(px, res, bmin, h, scene["gdx"])
    px = density_solve(
        phys["rho"], dt, px, pm, scene["pvol"], sphi, lphi, w, bmin, h
    )
    lphi = fluid_levelset(px, res, bmin, h, scene["gdx"])
    lvol = fluid_volume(
        px, scene["pvol"], sphi.shape, bmin, scene["dual_h"]
    )

    # transfers & gravity (:4597-4608)
    gms, gvs = p2g(px, pm, pv, pc, res, bmin, h)
    gvs[1] = gvs[1] + phys["gravity"] * dt

    # implicit viscosity (:4623)
    if phys["mu"] > 0:
        gvs = viscosity_solve(
            dt, phys["mu"], phys["rho"], gvs, sphi, lvol, phys["cell_vol"]
        )

    # pressure projection (:4648)
    b = pressure_rhs(gvs, sv, lphi, w, h)
    p = solve_cell_system(b, lphi, w, unit_diag=False)
    gvs = apply_pressure(gvs, p, w, sv, lphi, h)

    # extrapolate 2 iterations, valid = mass > 0 (:4652)
    for a in range(3):
        gvs[a], _ = extrapolate(gvs[a], gms[a] > 0, 2)

    # boundary conditions (:4655)
    gvs = boundary_condition(gvs, gms, sphi, sv, scene["gdx"])

    # G2P (:4660)
    pv, pc = g2p(px, gvs, res, bmin, h)
    if return_dt:
        return px, pv, pc, dt
    return px, pv, pc


def density_solve(rho0, dt, px, pm, pvol, sphi, lphi, w, bmin, h):
    gm, gvol = density_scatter(px, pm, pvol, lphi.shape, bmin, h)
    gvol = fix_volume(gvol, sphi, lphi, w, h)
    b = density_rhs(rho0, dt, gm, gvol, lphi, w, h)
    p = solve_cell_system(b, lphi, w, unit_diag=True)
    disps = displacement(p, lphi, dt, h)
    return apply_displacement(px, disps, bmin, h)


# ---------------------------------------------------------------------------
# coupled viscosity system (ViscosityCGSolver3D.py:41-470).  Site indexing:
# face site (x,y,z) of axis a sits at dual coords 2*(x,y,z)+parity(a).
# Terms transcribed from matvecmul_{x,y,z}_kernel / initialize_solver_
# {x,y,z}_kernel; 3D fluid convention sphi >= 0.
# ---------------------------------------------------------------------------

def _viscosity_terms(a):
    """14 couplings of one face site: (cond_dual_off, field, v_off,
    vol_dual_off, factor, sign) — matvec convention val += sign * factor *
    s_mu * vol * v (solvers/viscosity.py term table, verified against the
    reference kernels)."""
    terms = []

    def e(k, n=1):
        v = [0, 0, 0]
        v[k] = n
        return tuple(v)

    for sgn in (+1, -1):
        terms.append((e(a, 2 * sgn), a, e(a, sgn), e(a, sgn), 2.0, -1.0))
    for t in range(3):
        if t == a:
            continue
        for sgn in (+1, -1):
            terms.append((e(t, 2 * sgn), a, e(t, sgn), e(t, sgn), 1.0, -1.0))
    for t in range(3):
        if t == a:
            continue
        ea, et = e(a), e(t)
        mea = tuple(-x for x in ea)
        met = tuple(-x for x in et)

        def add(u, v):
            return tuple(p + q for p, q in zip(u, v))

        terms.append((add(ea, et), t, et, et, 1.0, -1.0))
        terms.append((add(mea, et), t, add(et, mea), et, 1.0, +1.0))
        terms.append((add(ea, met), t, (0, 0, 0), met, 1.0, +1.0))
        terms.append((add(mea, met), t, mea, met, 1.0, -1.0))
    return terms


def _face_at(arr, idx):
    for a in range(3):
        if idx[a] < 0 or idx[a] >= arr.shape[a]:
            return 0.0
    return arr[idx]


def viscosity_solve(dt, mu, rho, gvs, sphi, lvol, cell_vol):
    scale = dt / cell_vol / rho
    s_mu = scale * mu
    vol = lvol / (cell_vol * 0.125)

    face_shapes = [g.shape for g in gvs]
    # 3 Jacobi layers of extrapolation into the solid (solve :573)
    ext = []
    for a in range(3):
        sh = face_shapes[a]
        par = _face_parity(a)
        valid = np.zeros(sh, dtype=bool)
        for x in range(sh[0]):
            for y in range(sh[1]):
                for z in range(sh[2]):
                    q = (2 * x + par[0], 2 * y + par[1], 2 * z + par[2])
                    valid[x, y, z] = _dual_at(sphi, q, -1.0) >= 0
        v_e, _ = extrapolate(gvs[a], valid, 3)
        ext.append(v_e)

    # enumerate active sites (interior & fluid) per axis
    site_id = {}
    sites = []
    for a in range(3):
        sh = face_shapes[a]
        par = _face_parity(a)
        for x in range(1, sh[0] - 1):
            for y in range(1, sh[1] - 1):
                for z in range(1, sh[2] - 1):
                    q = (2 * x + par[0], 2 * y + par[1], 2 * z + par[2])
                    if _dual_at(sphi, q, -1.0) >= 0:
                        site_id[(a, x, y, z)] = len(sites)
                        sites.append((a, x, y, z))
    n = len(sites)
    if n == 0:
        return [g.copy() for g in gvs]

    A = np.zeros((n, n))
    rhs = np.zeros(n)
    for i, (a, x, y, z) in enumerate(sites):
        par = _face_parity(a)
        q = (2 * x + par[0], 2 * y + par[1], 2 * z + par[2])

        def volq(off):
            return _dual_at(vol, tuple(qq + o for qq, o in zip(q, off)), 0.0)

        diag = volq((0, 0, 0))
        for k in range(3):
            factor = 2.0 if k == a else 1.0
            for sgn in (+1, -1):
                off = [0, 0, 0]
                off[k] = sgn
                diag += factor * s_mu * volq(tuple(off))
        if diag == 0.0:
            # zero row (no fluid volume anywhere in the stencil): every
            # coupling volume is 0 and b = 0, so the build's CG never
            # touches the site — it keeps its extrapolated value
            A[i, i] = 1.0
            rhs[i] = ext[a][x, y, z]
            continue
        A[i, i] = diag
        # b = vol_c * v + solid-neighbour Dirichlet terms on the
        # EXTRAPOLATED field (initialize_solver_{x,y,z}_kernel)
        b_val = volq((0, 0, 0)) * ext[a][x, y, z]
        for cond, field, voff, vol_off, factor, sign in _viscosity_terms(a):
            cond_q = tuple(qq + o for qq, o in zip(q, cond))
            coef = sign * factor * s_mu * volq(vol_off)
            vidx = (x + voff[0], y + voff[1], z + voff[2])
            if _dual_at(sphi, cond_q, -1.0) >= 0:
                # fluid neighbour: matvec coupling
                key = (field,) + vidx
                if key in site_id:
                    A[i, site_id[key]] += coef
                else:
                    # inactive fluid site: holds its extrapolated value
                    # through CG (zero residual row) — move to RHS
                    rhs[i] -= coef * _face_at(ext[field], vidx)
            else:
                # solid neighbour: Dirichlet contribution to b
                b_val += -coef * _face_at(ext[field], vidx)
        rhs[i] += b_val
    # The build's CG starts from x0 = the extrapolated field (viscosity.py
    # x0 = ext), so on a singular-but-consistent system (e.g. a cluster of
    # faces whose only nonzero control volumes are shared couplings, seen
    # in thin tilted-slab geometry) its limit is x0 + A^+ (b - A x0) —
    # which equals the exact solution whenever A is nonsingular.
    x0_vec = np.array(
        [_face_at(ext[a], (x, y, z)) for (a, x, y, z) in sites]
    )
    sol = x0_vec + np.linalg.lstsq(A, rhs - A @ x0_vec, rcond=None)[0]

    out = []
    for a in range(3):
        sh = face_shapes[a]
        par = _face_parity(a)
        o = gvs[a].copy()
        # apply mask (apply_viscosity_kernel :458-470 / build active_hi):
        # face axis runs [1, fshape_a-2], transverse axes [1, fshape_t-1]
        his = [sh[i] - (1 if i == a else 0) for i in range(3)]
        for x in range(1, his[0]):
            for y in range(1, his[1]):
                for z in range(1, his[2]):
                    q = (2 * x + par[0], 2 * y + par[1], 2 * z + par[2])
                    if _dual_at(sphi, q, -1.0) < 0:
                        continue
                    key = (a, x, y, z)
                    if key in site_id:
                        o[x, y, z] = sol[site_id[key]]
                    else:
                        # non-interior-in-CG sites hold the extrapolated
                        # initial guess (zero residual rows)
                        o[x, y, z] = ext[a][x, y, z]
        out.append(o)
    return out
