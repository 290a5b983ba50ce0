"""SquareLatticePEPS: Gamma/Lambda representation + simple update.

Re-design of the reference's ``SquareLatticePEPS`` + ``SimpleUpdateExecutor``
(`include/qlpeps/two_dim_tn/peps/square_lattice_peps.h:172`,
`algorithm/simple_update/simple_update_impl.h:262`,
`square_lattice_peps_projection_impl.h:61-122` for the NN projection kernel).

TPU-first differences from the reference:
* Gammas are ONE dense array [Ly, Lx, d, D, D, D, D]; lambdas are dense
  [Ly+1, Lx, D] (vertical bonds) and [Ly, Lx+1, D] (horizontal bonds) with
  boundary bonds = onehot(0).
* Trotter gates are applied in a CHECKERBOARD schedule: all even horizontal
  bonds simultaneously (they touch disjoint sites), then odd, then the two
  vertical sublattices — each as one batched QR->gate->SVD kernel over
  Ly * Lx/2 bonds. The reference applies bonds sequentially
  (`square_lattice_nn_simple_update.h`); a checkerboard is an equally valid
  first-order-in-tau Trotterization (the group order is not palindromic)
  and maps every step onto big batched MXU matmuls + batched SVDs.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.lattice import BoundaryCondition, boundary_mask
from peps_tpu.linalg import TruncParams, blq, expm_taylor, safe_inverse, truncated_svd


class PEPS(NamedTuple):
    """Gamma/Lambda PEPS state (open boundary).

    gammas: [Ly, Lx, d, D, D, D, D]  site axes (p, u, l, d, r)
    lam_v:  [Ly+1, Lx, D]  lam_v[y, x] = weights on bond between (y-1,x),(y,x);
            rows 0 and Ly are boundary bonds = onehot(0).
    lam_h:  [Ly, Lx+1, D]  lam_h[y, x] = weights on bond between (y,x-1),(y,x).
    """
    gammas: jnp.ndarray
    lam_v: jnp.ndarray
    lam_h: jnp.ndarray

    @property
    def ly(self):
        return self.gammas.shape[0]

    @property
    def lx(self):
        return self.gammas.shape[1]

    @property
    def phys_dim(self):
        return self.gammas.shape[2]

    @property
    def bond_dim(self):
        return self.gammas.shape[3]


def product_peps(ly: int, lx: int, bond_dim: int, occupancy: jnp.ndarray,
                 phys_dim: int, dtype=jnp.float32) -> PEPS:
    """Product-state PEPS |occupancy> (reference ctor
    `square_lattice_peps_basic_impl.h` product-state init)."""
    g = jnp.zeros((ly, lx, phys_dim, bond_dim, bond_dim, bond_dim, bond_dim), dtype)
    occ = jnp.asarray(occupancy)
    onehot = jax.nn.one_hot(occ, phys_dim, dtype=dtype)  # [Ly, Lx, d]
    g = g.at[:, :, :, 0, 0, 0, 0].set(onehot)
    lam_v = jnp.zeros((ly + 1, lx, bond_dim), dtype).at[:, :, 0].set(1.0)
    lam_h = jnp.zeros((ly, lx + 1, bond_dim), dtype).at[:, :, 0].set(1.0)
    return PEPS(g, lam_v, lam_h)


def to_tps(peps: PEPS) -> jnp.ndarray:
    """Absorb sqrt(lambda) of every bond into the site tensors
    (reference `ToTPS`, square_lattice_peps_basic_impl.h:627-640)."""
    g, lam_v, lam_h = peps
    ly, lx = g.shape[:2]
    su = jnp.sqrt(lam_v[:ly])        # up bonds   [Ly, Lx, D]
    sd = jnp.sqrt(lam_v[1:])         # down bonds [Ly, Lx, D]
    sl = jnp.sqrt(lam_h[:, :lx])     # left bonds [Ly, Lx, D]
    sr = jnp.sqrt(lam_h[:, 1:])      # right bonds
    a = jnp.einsum("yxpuldr,yxu,yxl,yxd,yxr->yxpuldr", g, su, sl, sd, sr)
    mask = jnp.asarray(boundary_mask(ly, lx, g.shape[2], g.shape[3]),
                       dtype=a.real.dtype)
    return a * mask


def product_peps_pbc(ly: int, lx: int, bond_dim: int, occupancy: jnp.ndarray,
                     phys_dim: int, dtype=jnp.float32) -> PEPS:
    """Product-state PEPS on the TORUS (reference PBC layout,
    square_lattice_peps.h:120-141: lam_v[0,x] wraps bottom-to-top,
    lam_h[y,0] wraps right-to-left). lam_v/lam_h are [Ly, Lx, D] — every
    bond is real; the OBC/PBC layout is distinguished by lam_v.shape[0]
    (Ly for PBC, Ly+1 for OBC)."""
    g = jnp.zeros((ly, lx, phys_dim, bond_dim, bond_dim, bond_dim, bond_dim), dtype)
    occ = jnp.asarray(occupancy)
    onehot = jax.nn.one_hot(occ, phys_dim, dtype=dtype)
    g = g.at[:, :, :, 0, 0, 0, 0].set(onehot)
    lam_v = jnp.zeros((ly, lx, bond_dim), dtype).at[:, :, 0].set(1.0)
    lam_h = jnp.zeros((ly, lx, bond_dim), dtype).at[:, :, 0].set(1.0)
    return PEPS(g, lam_v, lam_h)


def is_pbc(peps: PEPS) -> bool:
    """True iff the state uses the periodic lambda layout."""
    return peps.lam_v.shape[0] == peps.gammas.shape[0]


def to_tps_pbc(peps: PEPS) -> jnp.ndarray:
    """Absorb sqrt(lambda) of every torus bond into the site tensors
    (PBC counterpart of :func:`to_tps`; no boundary mask — all bonds real)."""
    g, lam_v, lam_h = peps
    su = jnp.sqrt(lam_v)                        # bond above each site
    sd = jnp.sqrt(jnp.roll(lam_v, -1, axis=0))  # bond below = above (y+1)%Ly
    sl = jnp.sqrt(lam_h)                        # bond left of each site
    sr = jnp.sqrt(jnp.roll(lam_h, -1, axis=1))  # bond right = left of (x+1)%Lx
    return jnp.einsum("yxpuldr,yxu,yxl,yxd,yxr->yxpuldr", g, su, sl, sd, sr)


def _transpose_peps(peps: PEPS) -> PEPS:
    """Reflect the lattice across the main diagonal: (y,x)->(x,y), u<->l,
    d<->r. Vertical bonds become horizontal, so one horizontal-bond kernel
    serves both orientations."""
    g = jnp.transpose(peps.gammas, (1, 0, 2, 4, 3, 6, 5))
    return PEPS(g, jnp.transpose(peps.lam_h, (1, 0, 2)),
                jnp.transpose(peps.lam_v, (1, 0, 2)))


class GateMetrics(NamedTuple):
    bond_energy: jnp.ndarray   # estimated <h> per bond (mean-field env)
    trunc_err: jnp.ndarray     # max truncation error
    log_norm: jnp.ndarray      # sum of log lambda-norms absorbed


def _apply_gate_batch(gA, gB, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid,
                      gate, h_bond, trunc: TruncParams):
    """Apply a two-site gate to a batch of horizontal bonds.

    gA, gB: [N, d, D, D, D, D] site tensors (p, u, l, d, r); A is the left
    site, B the right. l*_: [N, D] surrounding lambdas. lam_mid: [N, D] the
    shared bond. gate/h_bond: [N, d, d, d, d] as <p1' p2'| . |p1 p2> per bond.

    Returns (gA', gB', lam', metrics...) — the QR -> theta -> gate -> SVD ->
    split kernel (reference `NearestNeighborSiteProject`,
    square_lattice_peps_projection_impl.h:61-122).
    """
    n, d = gA.shape[0], gA.shape[1]
    D = gA.shape[3]
    k = min(D * D * D, d * D)

    # absorb surrounding lambdas
    a = jnp.einsum("npuldr,nu,nl,nd->npuldr", gA, lu_a, ll_a, ld_a)
    b = jnp.einsum("npuldr,nu,nd,nr->npuldr", gB, lu_b, ld_b, lr_b)

    # QR split: A = Q_A [uld, k] . R_A [k, p, r]
    a_mat = jnp.transpose(a, (0, 2, 3, 4, 1, 5)).reshape(n, D ** 3, d * D)
    qa, ra = jnp.linalg.qr(a_mat, mode="reduced")       # [N, D^3, k], [N, k, d*D]
    ra = ra.reshape(n, k, d, D)
    # B = R_B [(p,l), k] . Q_B [k, (u,d,r)]
    b_mat = jnp.transpose(b, (0, 1, 3, 2, 4, 5)).reshape(n, d * D, D ** 3)
    rb_mat, qb = blq(b_mat)                              # [N, d*D, k], [N, k, D^3]
    rb = rb_mat.reshape(n, d, D, k)                      # axes (p2, l, k)

    # theta with shared lambda and gate: [N, k_a, p1, p2, k_b]
    theta = jnp.einsum("napr,nr,nqrb->napqb", ra, lam_mid, rb)
    theta_g = jnp.einsum("nPQpq,napqb->naPQb", gate, theta)

    # local-energy estimate in the mean-field environment
    hth = jnp.einsum("nPQpq,napqb->naPQb", h_bond, theta_g)
    num = jnp.einsum("napqb,napqb->n", jnp.conj(theta_g), hth)
    den = jnp.einsum("napqb,napqb->n", jnp.conj(theta_g), theta_g)
    bond_e = jnp.real(num) / jnp.maximum(jnp.real(den), jnp.finfo(den.real.dtype).tiny)

    # SVD: [(a, P), (Q, b)] -> truncate to D
    mat = theta_g.reshape(n, k * d, d * k)
    u, s, vh, errs = jax.vmap(lambda m: truncated_svd(m, trunc))(mat)
    norm = jnp.linalg.norm(s, axis=1)
    lam_new = s / jnp.maximum(norm[:, None], jnp.finfo(s.dtype).tiny)

    # rebuild site tensors: Gamma_A' = Q_A . U, divide out surrounding lambdas
    ga_new = jnp.einsum("nik,nkPr->niPr", qa, u.reshape(n, k, d, D))
    ga_new = ga_new.reshape(n, D, D, D, d, D).transpose(0, 4, 1, 2, 3, 5)
    ga_new = jnp.einsum("npuldr,nu,nl,nd->npuldr", ga_new,
                        safe_inverse(lu_a), safe_inverse(ll_a), safe_inverse(ld_a))
    gb_new = jnp.einsum("nmQk,nki->nmQi", vh.reshape(n, D, d, k), qb)
    # gb_new axes: (m = new mid bond, Q = new phys, (u,d,r))
    gb_new = gb_new.reshape(n, D, d, D, D, D).transpose(0, 2, 3, 1, 4, 5)
    gb_new = jnp.einsum("npuldr,nu,nd,nr->npuldr", gb_new,
                        safe_inverse(lu_b), safe_inverse(ld_b), safe_inverse(lr_b))
    return ga_new, gb_new, lam_new, GateMetrics(bond_e, jnp.max(errs), jnp.sum(jnp.log(norm)))


def _gather_h_bonds(peps: PEPS, xs):
    """Gather batch inputs for horizontal bonds (y, x)-(y, x+1), x in xs."""
    g, lam_v, lam_h = peps
    ly, lx = g.shape[:2]
    xs = jnp.asarray(xs)
    gA = g[:, xs].reshape(-1, *g.shape[2:])
    gB = g[:, xs + 1].reshape(-1, *g.shape[2:])
    D = g.shape[3]
    lu_a = lam_v[:ly, xs].reshape(-1, D)
    ld_a = lam_v[1:, xs].reshape(-1, D)
    ll_a = lam_h[:, xs].reshape(-1, D)
    lam_mid = lam_h[:, xs + 1].reshape(-1, D)
    lu_b = lam_v[:ly, xs + 1].reshape(-1, D)
    ld_b = lam_v[1:, xs + 1].reshape(-1, D)
    lr_b = lam_h[:, xs + 2].reshape(-1, D)
    return gA, gB, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid


def _apply_h_sublattice(peps: PEPS, xs, gate, h_bond, trunc: TruncParams):
    """Apply gates on all horizontal bonds starting at columns xs
    (must be site-disjoint, i.e. a checkerboard sublattice).
    gate/h_bond: per-bond arrays [Ly, Lx-1, d, d, d, d]."""
    g, lam_v, lam_h = peps
    ly = g.shape[0]
    d = g.shape[2]
    xs_arr0 = jnp.asarray(xs)
    gate_b = gate[:, xs_arr0].reshape(-1, d, d, d, d)
    h_b = h_bond[:, xs_arr0].reshape(-1, d, d, d, d)
    inputs = _gather_h_bonds(peps, xs)
    ga, gb, lam_new, metrics = _apply_gate_batch(*inputs, gate_b, h_b, trunc)
    nb = len(xs)
    xs_arr = jnp.asarray(xs)
    g = g.at[:, xs_arr].set(ga.reshape(ly, nb, *g.shape[2:]))
    g = g.at[:, xs_arr + 1].set(gb.reshape(ly, nb, *g.shape[2:]))
    lam_h = lam_h.at[:, xs_arr + 1].set(lam_new.reshape(ly, nb, -1))
    return PEPS(g, lam_v, lam_h), metrics


def _pbc_bond_groups(l: int):
    """Site-disjoint groups of ring bonds (x, (x+1)%l). Even rings
    2-color like the OBC checkerboard; odd rings need a third group for
    the wrap bond (an odd cycle is not 2-colorable)."""
    if l < 2:
        return []
    if l % 2 == 0:
        groups = [tuple(range(0, l, 2)), tuple(range(1, l, 2))]
    else:
        # Bonds 1,3,...,l-2 stay site-disjoint ((1,2),(3,4),... never touch
        # site 0 or l-1, which only groups 1 and 3 use) and together the
        # three groups cover all l ring bonds.
        groups = [tuple(range(0, l - 1, 2)), tuple(range(1, l - 1, 2)),
                  (l - 1,)]
    return [g for g in groups if g]


def _gather_h_bonds_pbc(peps: PEPS, xs):
    """Gather batch inputs for torus bonds (y, x)-(y, (x+1)%Lx), x in xs."""
    g, lam_v, lam_h = peps
    lx = g.shape[1]
    xs = jnp.asarray(xs)
    x1 = (xs + 1) % lx
    x2 = (xs + 2) % lx
    D = g.shape[3]
    gA = g[:, xs].reshape(-1, *g.shape[2:])
    gB = g[:, x1].reshape(-1, *g.shape[2:])
    lam_v_dn = jnp.roll(lam_v, -1, axis=0)   # bond below each site
    lu_a = lam_v[:, xs].reshape(-1, D)
    ld_a = lam_v_dn[:, xs].reshape(-1, D)
    ll_a = lam_h[:, xs].reshape(-1, D)
    lam_mid = lam_h[:, x1].reshape(-1, D)
    lu_b = lam_v[:, x1].reshape(-1, D)
    ld_b = lam_v_dn[:, x1].reshape(-1, D)
    lr_b = lam_h[:, x2].reshape(-1, D)
    return gA, gB, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid


def _apply_h_sublattice_pbc(peps: PEPS, xs, gate, h_bond, trunc: TruncParams):
    """PBC counterpart of :func:`_apply_h_sublattice`; xs must be a
    site-disjoint ring-bond group from :func:`_pbc_bond_groups`.
    gate/h_bond: per-bond arrays [Ly, Lx, d, d, d, d] (bond x wraps)."""
    g, lam_v, lam_h = peps
    ly, lx = g.shape[:2]
    d = g.shape[2]
    xs_arr = jnp.asarray(xs)
    x1 = (xs_arr + 1) % lx
    gate_b = gate[:, xs_arr].reshape(-1, d, d, d, d)
    h_b = h_bond[:, xs_arr].reshape(-1, d, d, d, d)
    inputs = _gather_h_bonds_pbc(peps, xs)
    ga, gb, lam_new, metrics = _apply_gate_batch(*inputs, gate_b, h_b, trunc)
    nb = len(xs)
    g = g.at[:, xs_arr].set(ga.reshape(ly, nb, *g.shape[2:]))
    g = g.at[:, x1].set(gb.reshape(ly, nb, *g.shape[2:]))
    lam_h = lam_h.at[:, x1].set(lam_new.reshape(ly, nb, -1))
    return PEPS(g, lam_v, lam_h), metrics


def simple_update_sweep_pbc(peps: PEPS, gate_h: jnp.ndarray, gate_v: jnp.ndarray,
                            h_bond_h: jnp.ndarray, h_bond_v: jnp.ndarray,
                            trunc: TruncParams):
    """One full torus sweep: ring-bond groups on columns, then (through the
    transposed lattice) on rows. First-order Trotterization per step (the
    group order is not palindromic), same as :func:`simple_update_sweep`,
    with the wrap bonds in their own group on odd rings."""
    lx, ly = peps.lx, peps.ly
    e_sum = jnp.zeros((), peps.gammas.real.dtype)
    log_norm = jnp.zeros((), peps.gammas.real.dtype)
    terr = jnp.zeros((), peps.gammas.real.dtype)

    for xs in _pbc_bond_groups(lx):
        peps, m = _apply_h_sublattice_pbc(peps, xs, gate_h, h_bond_h, trunc)
        e_sum += jnp.sum(m.bond_energy)
        log_norm += m.log_norm
        terr = jnp.maximum(terr, m.trunc_err)

    peps = _transpose_peps(peps)
    for ys in _pbc_bond_groups(ly):
        peps, m = _apply_h_sublattice_pbc(peps, ys, gate_v, h_bond_v, trunc)
        e_sum += jnp.sum(m.bond_energy)
        log_norm += m.log_norm
        terr = jnp.maximum(terr, m.trunc_err)
    peps = _transpose_peps(peps)
    return peps, (e_sum, log_norm, terr)


def simple_update_sweep(peps: PEPS, gate_h: jnp.ndarray, gate_v: jnp.ndarray,
                        h_bond_h: jnp.ndarray, h_bond_v: jnp.ndarray,
                        trunc: TruncParams):
    """One full checkerboard sweep: even/odd horizontal then even/odd vertical
    sublattices. Returns (peps', SweepMetrics)."""
    lx, ly = peps.lx, peps.ly
    e_sum = jnp.zeros((), peps.gammas.real.dtype)
    log_norm = jnp.zeros((), peps.gammas.real.dtype)
    terr = jnp.zeros((), peps.gammas.real.dtype)

    for xs in (tuple(range(0, lx - 1, 2)), tuple(range(1, lx - 1, 2))):
        if not xs:
            continue
        peps, m = _apply_h_sublattice(peps, xs, gate_h, h_bond_h, trunc)
        e_sum += jnp.sum(m.bond_energy)
        log_norm += m.log_norm
        terr = jnp.maximum(terr, m.trunc_err)

    peps = _transpose_peps(peps)
    for ys in (tuple(range(0, ly - 1, 2)), tuple(range(1, ly - 1, 2))):
        if not ys:
            continue
        peps, m = _apply_h_sublattice(peps, ys, gate_v, h_bond_v, trunc)
        e_sum += jnp.sum(m.bond_energy)
        log_norm += m.log_norm
        terr = jnp.maximum(terr, m.trunc_err)
    peps = _transpose_peps(peps)
    return peps, (e_sum, log_norm, terr)


@dataclasses.dataclass(frozen=True)
class SimpleUpdateParams:
    """Reference `SimpleUpdatePara` (simple_update.h:34-79)."""
    steps: int
    tau: float
    trunc: TruncParams
    energy_abs_tol: float = 0.0      # advanced stop: |dE| tolerance (0 = off)
    lambda_rel_tol: float = 0.0      # advanced stop: lambda movement tol
    patience: int = 5
    min_steps: int = 10


class SimpleUpdateResult(NamedTuple):
    peps: PEPS
    estimated_e0: float
    estimated_en: float
    executed_steps: int
    converged: bool
    energy_history: list


def simple_update(peps: PEPS, h_bond_h: jnp.ndarray, h_bond_v: jnp.ndarray,
                  params: SimpleUpdateParams,
                  step_observer: Callable | None = None) -> SimpleUpdateResult:
    """Imaginary-time evolution driver (reference `SimpleUpdateExecutor::Execute`,
    simple_update_impl.h:262).

    h_bond_h: [d,d,d,d] uniform or [Ly, Lx-1, d,d,d,d] per-bond;
    h_bond_v: [d,d,d,d] uniform or [Ly-1, Lx, d,d,d,d] per-bond.
    Use :func:`fold_site_into_bonds` to absorb single-site fields exactly.

    PBC states (from :func:`product_peps_pbc`) are detected by their lambda
    layout and evolved with the torus sweep; per-bond arrays are then
    [Ly, Lx, ...] (bond x wraps to (x+1)%Lx), mirroring the reference's
    Periodic ham-set shapes (square_lattice_nn_simple_update.h:63-66).
    """
    d = peps.phys_dim
    ly, lx = peps.ly, peps.lx
    pbc = is_pbc(peps)
    nhx = lx if pbc else lx - 1
    nvy = ly if pbc else ly - 1
    dt = peps.gammas.dtype
    hh = jnp.asarray(h_bond_h, dt)
    hv = jnp.asarray(h_bond_v, dt)
    if hh.ndim == 4:
        hh = jnp.broadcast_to(hh, (ly, nhx, d, d, d, d))
    if hv.ndim == 4:
        hv = jnp.broadcast_to(hv, (nvy, lx, d, d, d, d))

    tau = params.tau
    make_gate = jax.vmap(lambda m: expm_taylor(-tau * m))
    gate_h = make_gate(hh.reshape(-1, d * d, d * d)).reshape(ly, nhx, d, d, d, d)
    gate_v = make_gate(hv.reshape(-1, d * d, d * d)).reshape(nvy, lx, d, d, d, d)
    # vertical arrays are used through the transposed lattice: (y,x)->(x,y)
    hv_t = jnp.transpose(hv, (1, 0, 2, 3, 4, 5))
    gate_v_t = jnp.transpose(gate_v, (1, 0, 2, 3, 4, 5))

    trunc = params.trunc
    sweep_fn = simple_update_sweep_pbc if pbc else simple_update_sweep
    sweep = jax.jit(lambda p: sweep_fn(p, gate_h, gate_v_t, hh, hv_t, trunc))
    history = []
    e_prev = None
    stall = 0
    converged = False
    step = 0
    en = float("nan")
    for step in range(1, params.steps + 1):
        peps, (e0, log_norm, terr) = sweep(peps)
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


def fold_site_into_bonds(h_bond_h: jnp.ndarray, h_bond_v: jnp.ndarray,
                         h_site: jnp.ndarray, ly: int, lx: int):
    """Fold a uniform single-site term exactly into bond Hamiltonians.

    Returns per-bond Hamiltonian ARRAYS h_h [Ly, Lx-1, d,d,d,d] and
    h_v [Ly-1, Lx, d,d,d,d] such that sum of bond terms = sum of bonds +
    sum of sites. Each site's coordination number z(y,x) determines the 1/z
    weight it contributes to each incident bond (exact on any rectangle).
    """
    import numpy as np
    d = h_site.shape[0]
    eye = np.eye(d)
    z = np.zeros((ly, lx))
    for y in range(ly):
        for x in range(lx):
            z[y, x] = (y > 0) + (y < ly - 1) + (x > 0) + (x < lx - 1)
    hs = np.asarray(h_site)
    hh = np.zeros((ly, lx - 1, d, d, d, d), dtype=np.result_type(h_bond_h, hs))
    hv = np.zeros((ly - 1, lx, d, d, d, d), dtype=hh.dtype)
    for y in range(ly):
        for x in range(lx - 1):
            hh[y, x] = (np.asarray(h_bond_h)
                        + np.einsum("ac,bd->abcd", hs / z[y, x], eye)
                        + np.einsum("ac,bd->abcd", eye, hs / z[y, x + 1]))
    for y in range(ly - 1):
        for x in range(lx):
            hv[y, x] = (np.asarray(h_bond_v)
                        + np.einsum("ac,bd->abcd", hs / z[y, x], eye)
                        + np.einsum("ac,bd->abcd", eye, hs / z[y + 1, x]))
    return jnp.asarray(hh), jnp.asarray(hv)
