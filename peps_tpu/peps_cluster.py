"""Three-site L-shaped cluster simple update (NNN + triangle lattices).

Reference: `square_lattice_nnn_simple_update.h`, `triangle_nn_on_sqr_simple_update.h`
and the projection kernels `NextNearestNeighborSiteProject` /
`Upper*TriangleProject` (square_lattice_peps_projection_impl.h:222-406, HOSVD
variant in utility/hosvd). TPU re-design: ONE batched canonical kernel for the
L-shaped cluster

    A=(y,x) --h-- B=(y,x+1)
                   |v
                  C=(y+1,x+1)

(QR/LQ rank reduction on A and C, 3-site gate, two truncated SVDs — a 3-site
TEBD step), applied over site-disjoint plaquette sublattices (stride 2 in both
axes -> 4 groups, each one batched kernel call). Other cluster orientations
reduce to the canonical one by lattice reflections: anti-diagonal clusters =
horizontal flip; lower triangles = diagonal transpose.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.lattice import boundary_mask
from peps_tpu.linalg import TruncParams, blq, expm_taylor, safe_inverse, truncated_svd
from peps_tpu.peps import (PEPS, SimpleUpdateParams, SimpleUpdateResult,
                           _transpose_peps, simple_update_sweep)


def flip_horizontal(peps: PEPS) -> PEPS:
    """Mirror x -> Lx-1-x (swaps site legs l <-> r)."""
    g = peps.gammas[:, ::-1].transpose(0, 1, 2, 3, 6, 5, 4)
    return PEPS(g, peps.lam_v[:, ::-1], peps.lam_h[:, ::-1])


def _apply_cluster_batch(gA, gB, gC,
                         lu_a, ll_a, ld_a,      # ext lambdas of A (u, l, d)
                         lu_b, lr_b,            # ext lambdas of B (u, r)
                         ll_c, ld_c, lr_c,      # ext lambdas of C (l, d, r)
                         lam_ab, lam_bc,        # internal bonds
                         gate3, trunc: TruncParams):
    """3-site gate on a batch of canonical L-clusters.

    gate3: [N, d, d, d, d, d, d] = <A'B'C'|G|ABC>.
    Returns (gA', gB', gC', lam_ab', lam_bc', max_trunc_err).
    """
    n, d = gA.shape[0], gA.shape[1]
    D = gA.shape[3]
    k = min(D ** 3, d * D)

    a = jnp.einsum("npuldr,nu,nl,nd->npuldr", gA, lu_a, ll_a, ld_a)
    b = jnp.einsum("npuldr,nu,nr->npuldr", gB, lu_b, lr_b)
    c = jnp.einsum("npuldr,nl,nd,nr->npuldr", gC, ll_c, ld_c, lr_c)

    # A: rows (u,l,d), cols (p, r=internal)
    a_mat = jnp.transpose(a, (0, 2, 3, 4, 1, 5)).reshape(n, D ** 3, d * D)
    qa, ra = jnp.linalg.qr(a_mat, mode="reduced")     # [N,D^3,k],[N,k,d*D]
    ra = ra.reshape(n, k, d, D)                        # (kA, pA, r)
    # C: rows (p, u=internal), cols (l, d, r)
    c_mat = c.reshape(n, d * D, D ** 3)
    lc_mat, qc = blq(c_mat)                            # [N,d*D,k],[N,k,D^3]
    lc = lc_mat.reshape(n, d, D, k)                    # (pC, u, kC)

    ra_l = jnp.einsum("nkpr,nr->nkpr", ra, lam_ab)
    # b axes (q=pB, t=uB, l, w=dB, f=rB); contract l with r
    th = jnp.einsum("nkpr,nqtrwf->nkpqtwf", ra_l, b)
    th = jnp.einsum("nkpqtwf,nw->nkpqtwf", th, lam_bc)
    th = jnp.einsum("nkpqtwf,nswc->nkpqtfsc", th, lc)  # s=pC, c=kC
    thg = jnp.einsum("nPQSpqs,nkpqtfsc->nkPQtfSc", gate3, th)
    # thg axes: (kA, PA, PB, uB, rB, PC, kC)

    mat1 = thg.reshape(n, k * d, d * D * D * d * k)
    u1, s1, v1, err1 = jax.vmap(lambda m: truncated_svd(m, trunc))(mat1)
    nrm1 = jnp.linalg.norm(s1, axis=1)
    lam_ab_new = s1 / jnp.maximum(nrm1[:, None], jnp.finfo(s1.dtype).tiny)

    ga_new = jnp.einsum("nik,nkPm->niPm", qa, u1.reshape(n, k, d, D))
    ga_new = ga_new.reshape(n, D, D, D, d, D).transpose(0, 4, 1, 2, 3, 5)
    ga_new = jnp.einsum("npuldr,nu,nl,nd->npuldr", ga_new,
                        safe_inverse(lu_a), safe_inverse(ll_a),
                        safe_inverse(ld_a))

    th2 = lam_ab_new[:, :, None] * v1                  # [N, D, rest]
    th2 = th2.reshape(n, D, d, D, D, d, k)             # (ab, PB, uB, rB, PC, kC)
    mat2 = th2.reshape(n, D * d * D * D, d * k)
    u2, s2, v2, err2 = jax.vmap(lambda m: truncated_svd(m, trunc))(mat2)
    nrm2 = jnp.linalg.norm(s2, axis=1)
    lam_bc_new = s2 / jnp.maximum(nrm2[:, None], jnp.finfo(s2.dtype).tiny)

    gb_new = u2.reshape(n, D, d, D, D, D)              # (l=ab, p, u, r, d=bc)
    gb_new = gb_new.transpose(0, 2, 3, 1, 5, 4)        # (p, u, l, d, r)
    gb_new = jnp.einsum("npuldr,nl,nu,nr->npuldr", gb_new,
                        safe_inverse(lam_ab_new), safe_inverse(lu_b),
                        safe_inverse(lr_b))

    gc_new = jnp.einsum("nmsk,nki->nmsi", v2.reshape(n, D, d, k), qc)
    gc_new = gc_new.reshape(n, D, d, D, D, D)          # (u=bc, p, l, d, r)
    gc_new = gc_new.transpose(0, 2, 1, 3, 4, 5)
    gc_new = jnp.einsum("npuldr,nl,nd,nr->npuldr", gc_new,
                        safe_inverse(ll_c), safe_inverse(ld_c),
                        safe_inverse(lr_c))
    err = jnp.maximum(jnp.max(err1), jnp.max(err2))
    return ga_new, gb_new, gc_new, lam_ab_new, lam_bc_new, err


def _gather_clusters(peps: PEPS, ys, xs):
    """Gather batch inputs for clusters anchored at plaquettes (y, x),
    y in ys, x in xs (cartesian product)."""
    g, lam_v, lam_h = peps
    ly, lx = g.shape[:2]
    D = g.shape[3]
    yy, xx = jnp.meshgrid(jnp.asarray(ys), jnp.asarray(xs), indexing="ij")
    yy, xx = yy.reshape(-1), xx.reshape(-1)
    shp = (-1,) + g.shape[2:]
    gA = g[yy, xx].reshape(shp)
    gB = g[yy, xx + 1].reshape(shp)
    gC = g[yy + 1, xx + 1].reshape(shp)
    args = (gA, gB, gC,
            lam_v[yy, xx], lam_h[yy, xx], lam_v[yy + 1, xx],
            lam_v[yy, xx + 1], lam_h[yy, xx + 2],
            lam_h[yy + 1, xx + 1], lam_v[yy + 2, xx + 1], lam_h[yy + 1, xx + 2],
            lam_h[yy, xx + 1], lam_v[yy + 1, xx + 1])
    return yy, xx, args


def apply_cluster_gates(peps: PEPS, gate3_all: jnp.ndarray,
                        trunc: TruncParams) -> tuple[PEPS, jnp.ndarray]:
    """Apply per-plaquette 3-site gates gate3_all [Ly-1, Lx-1, d^6 shaped]
    over all four site-disjoint sublattices. Gates must be identity where no
    update is desired."""
    ly, lx = peps.ly, peps.lx
    max_err = jnp.zeros((), peps.gammas.real.dtype)
    for y0 in (0, 1):
        for x0 in (0, 1):
            ys = tuple(range(y0, ly - 1, 2))
            xs = tuple(range(x0, lx - 1, 2))
            if not ys or not xs:
                continue
            yy, xx, args = _gather_clusters(peps, ys, xs)
            gates = gate3_all[yy, xx]
            ga, gb, gc, lab, lbc, err = _apply_cluster_batch(
                *args, gates, trunc)
            g, lam_v, lam_h = peps
            shp = g.shape[2:]
            g = g.at[yy, xx].set(ga.reshape((-1,) + shp))
            g = g.at[yy, xx + 1].set(gb.reshape((-1,) + shp))
            g = g.at[yy + 1, xx + 1].set(gc.reshape((-1,) + shp))
            lam_h = lam_h.at[yy, xx + 1].set(lab)
            lam_v = lam_v.at[yy + 1, xx + 1].set(lbc)
            peps = PEPS(g, lam_v, lam_h)
            max_err = jnp.maximum(max_err, err)
    return peps, max_err


def _pair_to_cluster_gate(h_pair, sites, d, dtype):
    """Embed a two-site operator on cluster sites (i, j) (0=A,1=B,2=C) into a
    3-site operator [d^6]."""
    eye = np.eye(d)
    ops = [eye, eye, eye]
    h = np.asarray(h_pair).reshape(d, d, d, d)
    # general embedding via tensor algebra
    out = np.zeros((d,) * 6, dtype=np.asarray(h_pair).dtype)
    i, j = sites
    for a in range(d):
        for b in range(d):
            for ap in range(d):
                for bp in range(d):
                    v = h[ap, bp, a, b]
                    if v == 0:
                        continue
                    sl_new = [None, None, None]
                    sl_old = [None, None, None]
                    sl_new[i], sl_new[j] = ap, bp
                    sl_old[i], sl_old[j] = a, b
                    for kk in range(d):
                        idx_new = [kk if s is None else s for s in sl_new]
                        idx_old = [kk if s is None else s for s in sl_old]
                        out[tuple(idx_new + idx_old)] += v
    return jnp.asarray(out, dtype)


def nnn_cluster_hamiltonians(model, ly, lx, dtype):
    """Per-plaquette 3-site Hamiltonians for the DIAGONAL term h_d placed on
    (A, C), [Ly-1, Lx-1, d^6]. (NN terms are handled by the pair kernel.)"""
    d = model.phys_dim
    h3 = _pair_to_cluster_gate(model.h_d, (0, 2), d, np.float64)
    return jnp.broadcast_to(jnp.asarray(h3, dtype),
                            (ly - 1, lx - 1) + (d,) * 6)


def make_cluster_gates(h3_all, tau, d, dtype):
    ly1, lx1 = h3_all.shape[:2]
    mats = h3_all.reshape(-1, d ** 3, d ** 3).astype(dtype)
    gates = jax.vmap(lambda m: expm_taylor(-tau * m))(mats)
    return gates.reshape(ly1, lx1, *(d,) * 6)


def simple_update_nnn(peps: PEPS, model, params: SimpleUpdateParams,
                      step_observer: Callable | None = None) -> SimpleUpdateResult:
    """Simple update for models with NN + diagonal (NNN) terms: NN gates via
    the pair kernel, h_d via canonical clusters, h_ad via horizontally
    flipped clusters. Reference: SquareLatticeNNNSimpleUpdateExecutor."""
    ly, lx, d = peps.ly, peps.lx, peps.phys_dim
    dt = peps.gammas.dtype
    tau = params.tau
    hh = jnp.broadcast_to(jnp.asarray(model.h_h, dt), (ly, lx - 1, d, d, d, d))
    hv = jnp.broadcast_to(jnp.asarray(model.h_v, dt), (ly - 1, lx, d, d, d, d))
    gate_h = jax.vmap(lambda m: expm_taylor(-tau * m))(
        hh.reshape(-1, d * d, d * d)).reshape(ly, lx - 1, d, d, d, d)
    gate_v = jax.vmap(lambda m: expm_taylor(-tau * m))(
        hv.reshape(-1, d * d, d * d)).reshape(ly - 1, lx, d, d, d, d)
    hv_t = jnp.transpose(hv, (1, 0, 2, 3, 4, 5))
    gate_v_t = jnp.transpose(gate_v, (1, 0, 2, 3, 4, 5))

    gate3_d = None
    if model.h_d is not None:
        h3 = nnn_cluster_hamiltonians(model, ly, lx, dt)
        gate3_d = make_cluster_gates(h3, tau, d, dt)
    gate3_ad = None
    if model.h_ad is not None:
        # in the flipped frame the anti-diagonal becomes the main diagonal of
        # the cluster anchored at (y, Lx-2-x); table indices are unchanged
        # because A/C keep their roles under the flip.
        mdl = dataclasses.replace(model, h_d=model.h_ad)
        h3 = nnn_cluster_hamiltonians(mdl, ly, lx, dt)
        gate3_ad = make_cluster_gates(h3, tau, d, dt)

    def one_step(p):
        p, (e0, log_norm, terr) = simple_update_sweep(
            p, gate_h, gate_v_t, hh, hv_t, params.trunc)
        if gate3_d is not None:
            p, err = apply_cluster_gates(p, gate3_d, params.trunc)
            terr = jnp.maximum(terr, err)
        if gate3_ad is not None:
            pf = flip_horizontal(p)
            pf, err = apply_cluster_gates(pf, gate3_ad[:, ::-1], params.trunc)
            p = flip_horizontal(pf)
            terr = jnp.maximum(terr, err)
        return p, e0, log_norm, terr

    step_fn = jax.jit(one_step)
    history = []
    e_prev, stall, converged, en = None, 0, False, float("nan")
    step = 0
    for step in range(1, params.steps + 1):
        peps, e0, log_norm, terr = step_fn(peps)
        e0 = float(e0)
        en = -float(log_norm) / tau
        history.append(e0)
        if step_observer is not None:
            step_observer(step=step, e0=e0, en=en, trunc_err=float(terr))
        if params.energy_abs_tol > 0 and e_prev is not None and step >= params.min_steps:
            if abs(e0 - e_prev) < params.energy_abs_tol:
                stall += 1
                if stall >= params.patience:
                    converged = True
                    break
            else:
                stall = 0
        e_prev = e0
    return SimpleUpdateResult(peps, history[-1] if history else float("nan"),
                              en, step, converged, history)


def simple_update_triangle(peps: PEPS, model, params: SimpleUpdateParams,
                           step_observer: Callable | None = None) -> SimpleUpdateResult:
    """Triangle-lattice simple update on square PEPS: upper triangles
    (A,B,C) get h_AB/w + h_BC/w + h_AC, lower triangles (A,D,C) via the
    transposed lattice get h_AD/w + h_DC/w + h_AC2. Bond weights w account
    for how many triangles share each NN bond (interior: 2; boundary: 1 via
    the bond simply not appearing in a second triangle -> weight computed
    per-plaquette). Reference: TriangleNNOnSqrSimpleUpdateExecutor."""
    ly, lx, d = peps.ly, peps.lx, peps.phys_dim
    dt = peps.gammas.dtype
    tau = params.tau
    h_nn = np.asarray(model.h_h)
    h_di = np.asarray(model.h_d)
    h_ad = None if model.h_ad is None else np.asarray(model.h_ad)

    # count triangle membership of every NN bond: upper triangle at (y,x)
    # uses h-bond (y, x)-(y,x+1) and v-bond (y,x+1)-(y+1,x+1); lower triangle
    # at (y,x) uses v-bond (y,x)-(y+1,x) and h-bond (y+1,x)-(y+1,x+1).
    cnt_h = np.zeros((ly, lx - 1))
    cnt_v = np.zeros((ly - 1, lx))
    for y in range(ly - 1):
        for x in range(lx - 1):
            cnt_h[y, x] += 1          # upper
            cnt_v[y, x + 1] += 1
            cnt_v[y, x] += 1          # lower
            cnt_h[y + 1, x] += 1
    cnt_h[cnt_h == 0] = 1
    cnt_v[cnt_v == 0] = 1

    def upper_h3():
        out = np.zeros((ly - 1, lx - 1) + (d,) * 6)
        for y in range(ly - 1):
            for x in range(lx - 1):
                h3 = (np.asarray(_pair_to_cluster_gate(h_nn / cnt_h[y, x], (0, 1), d, np.float64))
                      + np.asarray(_pair_to_cluster_gate(h_nn / cnt_v[y, x + 1], (1, 2), d, np.float64))
                      + np.asarray(_pair_to_cluster_gate(h_di, (0, 2), d, np.float64)))
                out[y, x] = h3
        return jnp.asarray(out, dt)

    def lower_h3_transposed():
        # lower triangle (A=(y,x), D=(y+1,x), C=(y+1,x+1)) maps under
        # transpose to the canonical cluster at (x, y): A->A, D->B, C->C.
        out = np.zeros((lx - 1, ly - 1) + (d,) * 6)
        for y in range(ly - 1):
            for x in range(lx - 1):
                h3 = (np.asarray(_pair_to_cluster_gate(h_nn / cnt_v[y, x], (0, 1), d, np.float64))
                      + np.asarray(_pair_to_cluster_gate(h_nn / cnt_h[y + 1, x], (1, 2), d, np.float64)))
                out[x, y] = h3
        return jnp.asarray(out, dt)

    g_up = make_cluster_gates(upper_h3(), tau, d, dt)
    g_lo = make_cluster_gates(lower_h3_transposed(), tau, d, dt)
    g_ad = None
    if h_ad is not None:
        # anti-diagonal coupling (e.g. J2 of triangle_j1j2_heisenberg):
        # applied as a separate horizontally-flipped cluster pass, where the
        # anti-diagonal becomes the main (A,C) diagonal of the canonical
        # cluster (same construction as simple_update_nnn's gate3_ad).
        h3 = jnp.broadcast_to(
            jnp.asarray(_pair_to_cluster_gate(h_ad, (0, 2), d, np.float64),
                        dt), (ly - 1, lx - 1) + (d,) * 6)
        g_ad = make_cluster_gates(h3, tau, d, dt)

    def one_step(p):
        p, err1 = apply_cluster_gates(p, g_up, params.trunc)
        pt = _transpose_peps(p)
        pt, err2 = apply_cluster_gates(pt, g_lo, params.trunc)
        p = _transpose_peps(pt)
        err = jnp.maximum(err1, err2)
        if g_ad is not None:
            pf = flip_horizontal(p)
            pf, err3 = apply_cluster_gates(pf, g_ad[:, ::-1], params.trunc)
            p = flip_horizontal(pf)
            err = jnp.maximum(err, err3)
        return p, err

    step_fn = jax.jit(one_step)
    history = []
    for step in range(1, params.steps + 1):
        peps, terr = step_fn(peps)
        lam_sum = float(jnp.sum(peps.lam_h) + jnp.sum(peps.lam_v))
        history.append(lam_sum)
        if step_observer is not None:
            step_observer(step=step, e0=float("nan"), en=float("nan"),
                          trunc_err=float(terr))
    return SimpleUpdateResult(peps, float("nan"), float("nan"), step, False,
                              history)
