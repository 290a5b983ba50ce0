"""Fermionic (Z2-graded) PEPS + fermionic simple update.

TPU re-design of the reference's graded simple update
(`square_lattice_peps_projection_impl.h:61-122` on fermionic qlten tensors;
validated there by `tests/test_algorithm/test_fermion_simple_update.cpp`).

Representation: same dense Gamma/Lambda arrays as the bosonic PEPS
([Ly, Lx, d, D, D, D, D], axes p,u,l,d,r) plus a STATIC `FermionSpace`
(physical parities + a fixed even/odd split of every virtual bond,
D = d_even + d_odd). Site tensors are parity-EVEN; odd site occupations are
made even by routing cumulative parity through the virtual bonds along the
snake path (see `product_fermion_peps`). All Koszul signs are static masks
fused by XLA (peps_tpu/fermion/graded.py).

State semantics (what "the state" means, incl. all signs):
`peps_tpu/fermion/exact.py` — snake-ordered Jordan-Wigner basis.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.fermion.graded import (GT, charged_svd_truncated, gcontract,
                                     graded_svd_truncated, gtranspose,
                                     operator_gt, sector_lq, sector_qr,
                                     split_parity)
from peps_tpu.lattice import boundary_mask
from peps_tpu.linalg import TruncParams, expm_taylor, safe_inverse
from peps_tpu.peps import PEPS, SimpleUpdateParams, SimpleUpdateResult


@dataclasses.dataclass(frozen=True)
class FermionSpace:
    """Static graded structure: physical parities + bond parity split."""
    phys_parity: tuple      # len d, 0/1
    d_even: int
    d_odd: int

    @property
    def bond_dim(self):
        return self.d_even + self.d_odd

    @property
    def bond_parity(self):
        return split_parity(self.d_even, self.d_odd)


def space_for_model(model, bond_dim: int) -> FermionSpace:
    """Default space: parity from n_up+n_dn; even/odd split D/2 each."""
    d = model.phys_dim
    pp = tuple(int(model.n_up[i] + model.n_dn[i]) % 2 for i in range(d))
    de = (bond_dim + 1) // 2
    return FermionSpace(pp, de, bond_dim - de)


# ---------------------------------------------------------------------------
# Optional U(1) particle-number resolution (reference: fermionic U(1)
# tensors, e.g. tests/test_data/tps_tJ_6x6Hole2_J0.3_D8_fU1). Static charge
# layout per bond + static per-site charge constants kappa; the SU SVD then
# truncates per flux sector, so particle number is conserved EXACTLY under
# truncation (the Z2-only split conserves just parity).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class U1Charges:
    """phys_charge[s] = particle number of local state s; bond_charge =
    static per-slot charge layout (q % 2 must equal the bond parity
    layout); keep = ((q, count), ...) in layout order; kappa[y][x] =
    static per-site covariance constants (a gauge fixed by the initial
    occupancy's snake charge routing)."""
    phys_charge: tuple
    bond_charge: tuple
    keep: tuple
    kappa: tuple

    @property
    def keep_counts(self):
        return tuple(c for _, c in self.keep)

    @property
    def sector_charges(self):
        return tuple(q for q, _ in self.keep)


def u1_bond_layout(space: FermionSpace):
    """Default static charge layout matching the space's parity split:
    two even slots at q=0, remaining even slots alternate q=+2/-2 (the
    +-2 flux sectors matter for doped systems — measured: 2x3 t-J with 2
    holes improves from 22% to 7% off sector-ED when a +2 slot exists);
    odd slots split between q=+1 and q=-1."""
    de, do = space.d_even, space.d_odd
    n0 = min(de, 2)
    n_p2 = (de - n0 + 1) // 2
    ext = [2] * n_p2 + [-2] * (de - n0 - n_p2)
    even_charges = (0,) * n0 + tuple(ext)
    c_plus = (do + 1) // 2
    charges = even_charges + (1,) * c_plus + (-1,) * (do - c_plus)
    keep = [(0, n0)]
    if ext.count(2):
        keep.append((2, ext.count(2)))
    if ext.count(-2):
        keep.append((-2, ext.count(-2)))
    keep.append((1, c_plus))
    if do - c_plus:
        keep.append((-1, do - c_plus))
    return charges, tuple(keep)


def u1_charges_for(model, space: FermionSpace, occupancy) -> U1Charges:
    """Build the static U(1) metadata for an initial occupancy: per-site
    kappa from the snake charge routing of `product_fermion_peps` (routed
    bond slot = first odd slot, charge +1), so the product start state is
    exactly U(1)-covariant with these constants."""
    from peps_tpu.fermion.exact import snake_order
    d = model.phys_dim
    qp = tuple(int(model.n_up[i] + model.n_dn[i]) for i in range(d))
    charges, keep = u1_bond_layout(space)
    occ = np.asarray(occupancy)
    ly, lx = occ.shape
    pp = space.phys_parity
    order = snake_order(ly, lx)
    sgn = {"u": -1, "l": -1, "d": 1, "r": 1}   # primal legs count +
    kappa = np.zeros((ly, lx), dtype=np.int64)
    c = 0
    for k, (y, x) in enumerate(order):
        n_s = int(occ[y, x])
        c_new = (c + pp[n_s]) % 2
        kap = qp[n_s]
        if k > 0:
            py, px = order[k - 1]
            leg_in = ("u" if py == y - 1 else ("l" if px == x - 1 else "r"))
            kap += sgn[leg_in] * c            # routed slot charge = c
        if k + 1 < len(order):
            ny, nx = order[k + 1]
            leg_out = ("d" if ny == y + 1 else ("r" if nx == x + 1 else "l"))
            kap += sgn[leg_out] * c_new
        kappa[y, x] = kap
        c = c_new
    return U1Charges(qp, charges, keep, tuple(map(tuple, kappa.tolist())))


def _group_flux(groups, signs):
    """Signed charge sum over a fused group (row-major): groups = list of
    per-slot charge tuples, signs = +-1 per group. Returns flat int array
    of length prod(dims)."""
    qs = [np.asarray(q) for q in groups]
    tot = np.zeros([len(q) for q in qs], dtype=np.int64)
    for ax, (q, s) in enumerate(zip(qs, signs)):
        shape = [1] * len(qs)
        shape[ax] = len(q)
        tot = tot + s * q.reshape(shape)
    return tot.reshape(-1)


def _u1_bond_masks(charges: U1Charges, space: FermionSpace, orient: str,
                   ly: int, lx: int):
    """Per-bond row/col flux-sector masks for the SU pair SVD.

    Row group (A side) and col group (B side) of the gated pair tensor,
    with arrow signs (primal +, dual -):
      h: rows (p+, u-, l-, d+) cut on A's r;  cols (p+, u-, d+, r+)
      v: rows (p+, u-, l-, r+) cut on A's d;  cols (p+, l-, d+, r+)
    Sector q: rows with g0 == kappaA - q; cols with h0 == q + kappaB.
    Returns (row_masks [Ny, Nx, S, R], col_masks [Ny, Nx, S, C]) numpy."""
    qp, qb = charges.phys_charge, charges.bond_charge
    if orient == "h":
        g0 = _group_flux([qp, qb, qb, qb], [1, -1, -1, 1])
        h0 = _group_flux([qp, qb, qb, qb], [1, -1, 1, 1])
        ka = np.asarray(charges.kappa)[:, :lx - 1]
        kb = np.asarray(charges.kappa)[:, 1:]
    else:
        g0 = _group_flux([qp, qb, qb, qb], [1, -1, -1, 1])
        h0 = _group_flux([qp, qb, qb, qb], [1, -1, 1, 1])
        ka = np.asarray(charges.kappa)[:ly - 1]
        kb = np.asarray(charges.kappa)[1:]
    secs = np.asarray(charges.sector_charges)
    row_masks = (g0[None, None, None, :]
                 == (ka[:, :, None] - secs[None, None, :])[..., None])
    col_masks = (h0[None, None, None, :]
                 == (kb[:, :, None] + secs[None, None, :])[..., None])
    return row_masks.astype(np.float64), col_masks.astype(np.float64)


class _ReducedLayout(NamedTuple):
    """Static metadata for the QR-reduced graded pair projection
    (reference's QR-QR-gate-SVD, square_lattice_peps_projection_impl.h:
    104-122). Inner bonds are laid out sector-major; sectors are flux
    values for U(1) (parities for Z2-only)."""
    cols_a: tuple        # per-sector col indices into (p, r_cut) fused
    rows_b: tuple        # per-sector row indices into (p, l_cut) fused
    sec_a: tuple         # sector flux values, A-side inner bond
    sec_b: tuple         # sector flux values, B-side inner bond
    pk_a: tuple          # inner-bond parities (per slot)
    pk_b: tuple
    svd_rm: tuple        # [S][d*Ka] static 0/1 row masks, core SVD
    svd_cm: tuple        # [S][d*Kb] static 0/1 col masks
    keep: tuple          # per-sector kept counts (sum = D)
    pbn: tuple           # new-bond parity layout
    a0: tuple            # spectator-group flux, A rows (u,l,d)/(u,l,r)
    d0: tuple            # spectator-group flux, B cols (u,d,r)/(l,d,r)


def _reduced_layout(space: FermionSpace,
                    charges: U1Charges | None) -> _ReducedLayout:
    """Build the static sector layout shared by both bond orientations
    (the A-row / B-col flux arrays coincide between h and v because the
    leg arrow patterns match: rows (dual,dual,primal), cols the same)."""
    pp = np.asarray(space.phys_parity)
    pb = np.asarray(space.bond_parity)
    if charges is None:
        qp, qb = pp, pb
        mod = 2
        keep = (space.d_even, space.d_odd)
        pbn = split_parity(space.d_even, space.d_odd)
        sec_new = (0, 1)
    else:
        qp = np.asarray(charges.phys_charge)
        qb = np.asarray(charges.bond_charge)
        mod = 0
        keep = charges.keep_counts
        pbn = tuple(q % 2 for q in charges.bond_charge)
        sec_new = charges.sector_charges

    def red(x):
        return x % 2 if mod else x

    c0 = red(_group_flux([tuple(qp), tuple(qb)], [1, 1]))    # (p+, cut+) A
    b0 = red(_group_flux([tuple(qp), tuple(qb)], [1, -1]))   # (p+, cut-) B
    sec_a = tuple(sorted(set(c0.tolist())))
    sec_b = tuple(sorted(set(b0.tolist())))
    cols_a = tuple(tuple(np.where(c0 == t)[0].tolist()) for t in sec_a)
    rows_b = tuple(tuple(np.where(b0 == s)[0].tolist()) for s in sec_b)
    qk_a = np.concatenate([np.full(len(c), t, dtype=np.int64)
                           for t, c in zip(sec_a, cols_a)])
    # L_B is covariant with constant 0: qp - ql + qk_b = 0 on sector s
    qk_b = np.concatenate([np.full(len(r), -s, dtype=np.int64)
                           for s, r in zip(sec_b, rows_b)])
    pk_a = tuple((qk_a % 2).tolist())
    pk_b = tuple((qk_b % 2).tolist())
    # core SVD sectors: rows (PA'+, k_a-) with qp - qk_a == -q;
    # cols (PB'+, k_b+) with qp + qk_b == q  (q = new-bond sector charge)
    rf = red(_group_flux([tuple(qp), tuple(qk_a)], [1, -1]))
    cf = red(_group_flux([tuple(qp), tuple(qk_b)], [1, 1]))
    svd_rm = tuple(tuple((rf == red(np.asarray(-q))).astype(np.float64)
                         .tolist()) for q in sec_new)
    svd_cm = tuple(tuple((cf == red(np.asarray(q))).astype(np.float64)
                         .tolist()) for q in sec_new)
    a0 = red(_group_flux([tuple(qb)] * 3, [-1, -1, 1]))      # (u-,l-,d/r+)
    d0 = red(_group_flux([tuple(qb)] * 3, [-1, 1, 1]))       # (u/l-,d+,r+)
    return _ReducedLayout(cols_a, rows_b, sec_a, sec_b, pk_a, pk_b,
                          svd_rm, svd_cm, keep, pbn,
                          tuple(a0.tolist()), tuple(d0.tolist()))


def _reduced_qr_masks(layout: _ReducedLayout, charges: U1Charges | None,
                      orient: str, ly: int, lx: int):
    """Per-bond row masks for the A-side sector QR ([.., T, D^3]) and col
    masks for the B-side sector LQ ([.., S, D^3]). Z2-only: static [T/S,
    D^3] shared by every bond (kappa == 0 mod 2); U(1): per-bond from the
    site kappa constants."""
    a0 = np.asarray(layout.a0)
    d0 = np.asarray(layout.d0)
    if charges is None:
        qr_rm = np.stack([(a0 % 2 == t % 2) for t in layout.sec_a]) \
            .astype(np.float64)
        lq_cm = np.stack([(d0 % 2 == s % 2) for s in layout.sec_b]) \
            .astype(np.float64)
        return qr_rm, lq_cm
    kap = np.asarray(charges.kappa)
    if orient == "h":
        ka, kb = kap[:, :lx - 1], kap[:, 1:]
    else:
        ka, kb = kap[:ly - 1], kap[1:]
    secs_a = np.asarray(layout.sec_a)
    secs_b = np.asarray(layout.sec_b)
    qr_rm = (a0[None, None, None, :]
             == (ka[:, :, None] - secs_a[None, None, :])[..., None])
    lq_cm = (d0[None, None, None, :]
             == (kb[:, :, None] - secs_b[None, None, :])[..., None])
    return qr_rm.astype(np.float64), lq_cm.astype(np.float64)


def _reduced_project(At: GT, Bt: GT, gate, h_bond, space: FermionSpace,
                     layout: _ReducedLayout, qr_rm, lq_cm):
    """QR-reduced shared tail of the graded pair projection.

    At: gated-pair A site with axes (row legs... | p, cut) — rows arrows
    (dual, dual, primal), cols (primal, primal). Bt: B site with axes
    (p, cut | col legs...) — rows (primal, dual), cols (dual, primal,
    primal). lam_mid is already absorbed into At's cut axis.

    Same singular spectrum as the full-theta SVD (`_svd_split`): theta =
    (Q_A x 1) core (1 x Q_B) with blockwise-isometric Q factors, so
    truncating the (d K_a) x (d K_b) core equals truncating the
    (d D^3) x (d D^3) theta — at ~(D^2/d)^3x less SVD cost.

    Returns (ga_t, gb_t, lam_new, bond_e, trunc_err, log_norm): ga_t axes
    (row legs..., PA', new), gb_t axes (new, PB', col legs...)."""
    pp, pb = space.phys_parity, space.bond_parity
    d, D = len(pp), space.bond_dim
    ka = sum(len(c) for c in layout.cols_a)
    kb = sum(len(r) for r in layout.rows_b)

    m_a = At.data.reshape(D ** 3, d * D)
    q_a, r_a = sector_qr(m_a, layout.cols_a, qr_rm)
    sgn_a = jnp.asarray(1.0 - 2.0 * np.asarray(layout.pk_a), r_a.dtype)
    RA = GT((sgn_a[:, None] * r_a).reshape(ka, d, D),
            (layout.pk_a, pp, pb), (True, False, False))
    QA = GT(q_a.reshape(D, D, D, ka), (pb, pb, pb, layout.pk_a),
            At.dual[:3] + (False,))

    m_b = Bt.data.reshape(d * D, D ** 3)
    l_b, q_b = sector_lq(m_b, layout.rows_b, lq_cm)
    sgn_b = jnp.asarray(1.0 - 2.0 * np.asarray(layout.pk_b), q_b.dtype)
    LB = GT(l_b.reshape(d, D, kb), (pp, pb, layout.pk_b),
            (False, True, False))
    QB = GT((sgn_b[:, None] * q_b).reshape(kb, D, D, D),
            (layout.pk_b, pb, pb, pb), (True,) + Bt.dual[2:])

    theta = gcontract(RA, (2,), LB, (1,))        # (k_a, pA, pB, k_b)
    G = operator_gt(jnp.asarray(gate, m_a.dtype), pp, pp, pp, pp)
    th = gcontract(G, (2, 3), theta, (1, 2))     # (PA', PB', k_a, k_b)
    bond_e = _bond_energy_diag(th, h_bond, theta, space)

    tht = gtranspose(th, (0, 2, 1, 3))           # (PA', k_a | PB', k_b)
    mat = tht.data.reshape(d * ka, d * kb)
    rm = jnp.asarray(np.asarray(layout.svd_rm), mat.dtype)
    cm = jnp.asarray(np.asarray(layout.svd_cm), mat.dtype)
    u, s, vt, terr = charged_svd_truncated(mat, rm, cm, layout.keep)
    norm = jnp.linalg.norm(s)
    lam_new = s / jnp.maximum(norm, jnp.finfo(s.dtype).tiny)
    pbn = layout.pbn
    sgn_n = jnp.asarray(1.0 - 2.0 * np.asarray(pbn), vt.dtype)

    U = GT(u.reshape(d, ka, len(pbn)), (pp, layout.pk_a, pbn),
           (False, True, False))
    ga_t = gcontract(QA, (3,), U, (1,))          # (rows..., PA', new)
    V = GT((sgn_n[:, None] * vt).reshape(len(pbn), d, kb),
           (pbn, pp, layout.pk_b), (True, False, False))
    gb_t = gcontract(V, (2,), QB, (0,))          # (new, PB', cols...)
    return ga_t, gb_t, lam_new, bond_e, terr, jnp.log(norm)


def product_fermion_peps(ly: int, lx: int, space: FermionSpace,
                         occupancy, dtype=None) -> PEPS:
    """Product state |occupancy> as an even graded PEPS: the cumulative
    occupation parity is routed through the virtual bonds along the snake
    path, keeping every site tensor parity-even (the reference instead adds
    a 1-dim parity leg per tensor; routing avoids the extra leg). Requires
    even TOTAL parity and d_odd >= 1 when any prefix parity is odd.

    ``dtype=None`` resolves to the widest available real dtype (float64
    under x64, else float32) without triggering a truncation warning."""
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    from peps_tpu.fermion.exact import snake_order
    occ = np.asarray(occupancy)
    d = len(space.phys_parity)
    D = space.bond_dim
    pp = space.phys_parity
    total = sum(pp[int(occ[y, x])] for y in range(ly) for x in range(lx)) % 2
    assert total == 0, "product_fermion_peps needs even total parity"
    odd_slot = space.d_even         # first odd index of the bond layout
    g = np.zeros((ly, lx, d, D, D, D, D))
    lam_v = np.zeros((ly + 1, lx, D))
    lam_h = np.zeros((ly, lx + 1, D))
    lam_v[:, :, 0] = 1.0
    lam_h[:, :, 0] = 1.0
    order = snake_order(ly, lx)
    c = 0                            # cumulative parity before current site
    for k, (y, x) in enumerate(order):
        n_s = int(occ[y, x])
        c_new = (c + pp[n_s]) % 2
        # incoming leg (from previous snake site) and outgoing leg
        idx = {"u": 0, "l": 0, "d": 0, "r": 0}
        if k > 0:
            py, px = order[k - 1]
            leg_in = ("u" if py == y - 1 else ("l" if px == x - 1 else "r"))
            if c:
                assert space.d_odd >= 1, "need d_odd >= 1 for parity routing"
                idx[leg_in] = odd_slot
        if k + 1 < len(order):
            ny, nx = order[k + 1]
            leg_out = ("d" if ny == y + 1 else ("r" if nx == x + 1 else "l"))
            if c_new:
                assert space.d_odd >= 1
                idx[leg_out] = odd_slot
                # the path bond's Schmidt weight sits at the routed slot
                if leg_out == "d":
                    lam_v[y + 1, x, 0] = 0.0
                    lam_v[y + 1, x, odd_slot] = 1.0
                elif leg_out == "r":
                    lam_h[y, x + 1, 0] = 0.0
                    lam_h[y, x + 1, odd_slot] = 1.0
                else:   # "l": bond between (y, x-1) and (y, x)
                    lam_h[y, x, 0] = 0.0
                    lam_h[y, x, odd_slot] = 1.0
        g[y, x, n_s, idx["u"], idx["l"], idx["d"], idx["r"]] = 1.0
        c = c_new
    return PEPS(jnp.asarray(g, dtype), jnp.asarray(lam_v, dtype),
                jnp.asarray(lam_h, dtype))


def to_tps_fermion(peps: PEPS) -> jnp.ndarray:
    """Absorb sqrt(lambda) into sites (lambdas are parity-neutral positive
    diagonals, so this is sign-free — same as the bosonic ToTPS)."""
    from peps_tpu.peps import to_tps
    return to_tps(peps)


# ---------------------------------------------------------------------------
# graded pair-update kernels (the fermionic NearestNeighborSiteProject)
# ---------------------------------------------------------------------------


def _fused_parity(groups):
    """Row-major XOR fuse of a list of parity tuples."""
    ps = [np.asarray(p) for p in groups]
    tot = np.zeros([len(p) for p in ps], dtype=np.int64)
    for ax, p in enumerate(ps):
        shape = [1] * len(ps)
        shape[ax] = len(p)
        tot = tot + p.reshape(shape)
    return tuple((tot % 2).reshape(-1).tolist())


def _svd_split(th_data, space: FermionSpace, u1=None):
    """Shared tail: blockwise truncated SVD of the gated pair tensor
    [P_A', legsA..., P_B', legsB...] (3 virtual legs per group) +
    evaluation-sign absorption so the decomposition reconstructs theta
    under gcontract (A's new primal leg contracts first against B's dual
    leg, a (-1)^p pairing).

    u1: optional (row_masks [S, R], col_masks [S, C], keep_counts,
    bond_parity) — switches to the U(1) flux-resolved SVD
    (charged_svd_truncated): truncation then conserves particle number
    exactly."""
    pp, pb = space.phys_parity, space.bond_parity
    d, D = len(pp), space.bond_dim
    de, do = space.d_even, space.d_odd
    mat = th_data.reshape(d * D ** 3, d * D ** 3)
    if u1 is None:
        gp = _fused_parity([pp, pb, pb, pb])
        u, s, vt, terr, pbn = graded_svd_truncated(mat, gp, gp, de, do)
    else:
        row_masks, col_masks, keep_counts, pbn = u1
        u, s, vt, terr = charged_svd_truncated(mat, row_masks, col_masks,
                                               keep_counts)
    norm = jnp.linalg.norm(s)
    lam_new = s / jnp.maximum(norm, jnp.finfo(s.dtype).tiny)
    sgn = jnp.asarray(1.0 - 2.0 * np.asarray(pbn), vt.dtype)
    vt = sgn[:, None] * vt
    return (u.reshape(d, D, D, D, D), vt.reshape(D, d, D, D, D),
            lam_new, terr, jnp.log(norm), pbn)


def _bond_energy_diag(th, h_bond, theta, space):
    """Heuristic mean-field bond energy <theta_g|h|theta_g>/<.|.> (the
    reference's local-energy estimate in the simple-update metrics;
    diagnostic only — exact energies come from the VMC path)."""
    pp = space.phys_parity
    Hh = operator_gt(jnp.asarray(h_bond, th.data.dtype), pp, pp, pp, pp)
    hth = gcontract(Hh, (2, 3), th, (0, 1))
    num = jnp.vdot(th.data, hth.data)
    den = jnp.vdot(th.data, th.data)
    return jnp.real(num) / jnp.maximum(jnp.real(den),
                                       jnp.finfo(den.real.dtype).tiny)


def _pair_kernel_h(a, b, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid,
                   gate, h_bond, space: FermionSpace, u1=None):
    """Graded two-site projection, horizontal bond. a = LEFT site, b = RIGHT.
    gate/h_bond [d,d,d,d] in (A', B', A, B) graded layout (A's modes first).
    Returns (a', b', lam', bond_e, trunc_err, log_norm)."""
    pp, pb = space.phys_parity, space.bond_parity
    duals = (False, True, True, False, False)
    par5 = (pp, pb, pb, pb, pb)

    a_abs = jnp.einsum("puldr,u,l,d,r->puldr", a, lu_a, ll_a, ld_a, lam_mid)
    b_abs = jnp.einsum("puldr,u,d,r->puldr", b, lu_b, ld_b, lr_b)
    A = GT(a_abs, par5, duals)
    B = GT(b_abs, par5, duals)
    theta = gcontract(A, (4,), B, (2,))
    # axes: pA uA lA dA | pB uB dB rB
    G = operator_gt(jnp.asarray(gate, a.dtype), pp, pp, pp, pp)
    th = gcontract(G, (2, 3), theta, (0, 4))
    # axes: PA' PB' uA lA dA uB dB rB
    bond_e = _bond_energy_diag(th, h_bond, theta, space)
    th = gtranspose(th, (0, 2, 3, 4, 1, 5, 6, 7))
    # axes: PA' uA lA dA | PB' uB dB rB
    u5, vt5, lam_new, terr, log_norm, pbn = _svd_split(th.data, space, u1)
    ga = u5                                          # (p,u,l,d,r_new)
    GB = GT(vt5, (pbn, pp, pb, pb, pb), (True, False, True, False, False))
    gb = gtranspose(GB, (1, 2, 0, 3, 4)).data        # (p,u,l_new,d,r)
    ga = jnp.einsum("puldr,u,l,d->puldr", ga, safe_inverse(lu_a),
                    safe_inverse(ll_a), safe_inverse(ld_a))
    gb = jnp.einsum("puldr,u,d,r->puldr", gb, safe_inverse(lu_b),
                    safe_inverse(ld_b), safe_inverse(lr_b))
    return ga, gb, lam_new, bond_e, terr, log_norm


def _pair_kernel_v(a, b, lu_a, ll_a, lr_a, ll_b, ld_b, lr_b, lam_mid,
                   gate, h_bond, space: FermionSpace, u1=None):
    """Graded two-site projection, vertical bond. a = UPPER site (earlier in
    snake order), b = LOWER. gate layout (A', B', A, B), A's modes first."""
    pp, pb = space.phys_parity, space.bond_parity
    duals = (False, True, True, False, False)
    par5 = (pp, pb, pb, pb, pb)

    a_abs = jnp.einsum("puldr,u,l,d,r->puldr", a, lu_a, ll_a, lam_mid, lr_a)
    b_abs = jnp.einsum("puldr,l,d,r->puldr", b, ll_b, ld_b, lr_b)
    A = GT(a_abs, par5, duals)
    B = GT(b_abs, par5, duals)
    theta = gcontract(A, (3,), B, (1,))
    # axes: pA uA lA rA | pB lB dB rB
    G = operator_gt(jnp.asarray(gate, a.dtype), pp, pp, pp, pp)
    th = gcontract(G, (2, 3), theta, (0, 4))
    # axes: PA' PB' uA lA rA lB dB rB
    bond_e = _bond_energy_diag(th, h_bond, theta, space)
    th = gtranspose(th, (0, 2, 3, 4, 1, 5, 6, 7))
    # axes: PA' uA lA rA | PB' lB dB rB
    u5, vt5, lam_new, terr, log_norm, pbn = _svd_split(th.data, space, u1)
    GA = GT(u5, (pp, pb, pb, pb, pbn), (False, True, True, False, False))
    ga = gtranspose(GA, (0, 1, 2, 4, 3)).data        # (p,u,l,d_new,r)
    GB = GT(vt5, (pbn, pp, pb, pb, pb), (True, False, True, False, False))
    gb = gtranspose(GB, (1, 0, 2, 3, 4)).data        # (p,u_new,l,d,r)
    ga = jnp.einsum("puldr,u,l,r->puldr", ga, safe_inverse(lu_a),
                    safe_inverse(ll_a), safe_inverse(lr_a))
    gb = jnp.einsum("puldr,l,d,r->puldr", gb, safe_inverse(ll_b),
                    safe_inverse(ld_b), safe_inverse(lr_b))
    return ga, gb, lam_new, bond_e, terr, log_norm


def _pair_kernel_h_qr(a, b, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid,
                      gate, h_bond, qr_rm, lq_cm, space: FermionSpace,
                      layout: _ReducedLayout):
    """QR-reduced variant of `_pair_kernel_h` (same contract, same
    returns; identical up to SVD gauge and float error)."""
    pp, pb = space.phys_parity, space.bond_parity
    duals = (False, True, True, False, False)
    par5 = (pp, pb, pb, pb, pb)
    a_abs = jnp.einsum("puldr,u,l,d,r->puldr", a, lu_a, ll_a, ld_a, lam_mid)
    b_abs = jnp.einsum("puldr,u,d,r->puldr", b, lu_b, ld_b, lr_b)
    At = gtranspose(GT(a_abs, par5, duals), (1, 2, 3, 0, 4))   # u,l,d|p,r
    Bt = gtranspose(GT(b_abs, par5, duals), (0, 2, 1, 3, 4))   # p,l|u,d,r
    ga_t, gb_t, lam_new, bond_e, terr, ln = _reduced_project(
        At, Bt, gate, h_bond, space, layout, qr_rm, lq_cm)
    ga = gtranspose(ga_t, (3, 0, 1, 2, 4)).data    # p,u,l,d,r_new
    gb = gtranspose(gb_t, (1, 2, 0, 3, 4)).data    # p,u,l_new,d,r
    ga = jnp.einsum("puldr,u,l,d->puldr", ga, safe_inverse(lu_a),
                    safe_inverse(ll_a), safe_inverse(ld_a))
    gb = jnp.einsum("puldr,u,d,r->puldr", gb, safe_inverse(lu_b),
                    safe_inverse(ld_b), safe_inverse(lr_b))
    return ga, gb, lam_new, bond_e, terr, ln


def _pair_kernel_v_qr(a, b, lu_a, ll_a, lr_a, ll_b, ld_b, lr_b, lam_mid,
                      gate, h_bond, qr_rm, lq_cm, space: FermionSpace,
                      layout: _ReducedLayout):
    """QR-reduced variant of `_pair_kernel_v`."""
    pp, pb = space.phys_parity, space.bond_parity
    duals = (False, True, True, False, False)
    par5 = (pp, pb, pb, pb, pb)
    a_abs = jnp.einsum("puldr,u,l,d,r->puldr", a, lu_a, ll_a, lam_mid, lr_a)
    b_abs = jnp.einsum("puldr,l,d,r->puldr", b, ll_b, ld_b, lr_b)
    At = gtranspose(GT(a_abs, par5, duals), (1, 2, 4, 0, 3))   # u,l,r|p,d
    Bt = GT(b_abs, par5, duals)                                # p,u|l,d,r
    ga_t, gb_t, lam_new, bond_e, terr, ln = _reduced_project(
        At, Bt, gate, h_bond, space, layout, qr_rm, lq_cm)
    ga = gtranspose(ga_t, (3, 0, 1, 4, 2)).data    # p,u,l,d_new,r
    gb = gtranspose(gb_t, (1, 0, 2, 3, 4)).data    # p,u_new,l,d,r
    ga = jnp.einsum("puldr,u,l,r->puldr", ga, safe_inverse(lu_a),
                    safe_inverse(ll_a), safe_inverse(lr_a))
    gb = jnp.einsum("puldr,l,d,r->puldr", gb, safe_inverse(ll_b),
                    safe_inverse(ld_b), safe_inverse(lr_b))
    return ga, gb, lam_new, bond_e, terr, ln


# ---------------------------------------------------------------------------
# checkerboard sweep + driver (mirrors peps_tpu.peps.simple_update)
# ---------------------------------------------------------------------------


def _apply_h_sublattice(peps: PEPS, xs, gate, h_bond, space: FermionSpace,
                        u1_masks=None, u1_meta=None, reduced=None):
    """Batched graded update of site-disjoint horizontal bonds (y, x)-(y,
    x+1) for x in xs, all rows. gate/h_bond: [Ly, Lx-1, d,d,d,d].
    u1_masks: optional ([Ly, Lx-1, S, R], [Ly, Lx-1, S, C]) per-bond flux
    masks; u1_meta: (keep_counts, bond_parity) static. reduced: optional
    (_ReducedLayout, qr_rm, lq_cm) switching to the QR-reduced kernel —
    qr/lq masks are [T, D^3] (Z2, shared) or [Ly, Lx-1, T, D^3] (U1,
    per-bond); takes precedence over u1_masks."""
    g, lam_v, lam_h = peps
    ly = g.shape[0]
    d = g.shape[2]
    D = g.shape[3]
    xs_arr = jnp.asarray(xs)
    gA = g[:, xs_arr].reshape(-1, *g.shape[2:])
    gB = g[:, xs_arr + 1].reshape(-1, *g.shape[2:])
    lu_a = lam_v[:ly, xs_arr].reshape(-1, D)
    ld_a = lam_v[1:, xs_arr].reshape(-1, D)
    ll_a = lam_h[:, xs_arr].reshape(-1, D)
    lam_mid = lam_h[:, xs_arr + 1].reshape(-1, D)
    lu_b = lam_v[:ly, xs_arr + 1].reshape(-1, D)
    ld_b = lam_v[1:, xs_arr + 1].reshape(-1, D)
    lr_b = lam_h[:, xs_arr + 2].reshape(-1, D)
    gate_b = gate[:, xs_arr].reshape(-1, d, d, d, d)
    h_b = h_bond[:, xs_arr].reshape(-1, d, d, d, d)
    if reduced is not None:
        layout, qr_rm, lq_cm = reduced
        if np.asarray(qr_rm).ndim == 2:        # Z2: shared static masks
            rm = jnp.asarray(qr_rm)
            cm = jnp.asarray(lq_cm)
            mask_axes = (None, None)
        else:                                  # U(1): per-bond masks
            rm = jnp.asarray(qr_rm[:, np.asarray(xs)]).reshape(
                -1, *qr_rm.shape[2:])
            cm = jnp.asarray(lq_cm[:, np.asarray(xs)]).reshape(
                -1, *lq_cm.shape[2:])
            mask_axes = (0, 0)
        ga, gb, lam_new, be, terr, ln = jax.vmap(
            _pair_kernel_h_qr,
            in_axes=(0,) * 11 + mask_axes + (None, None))(
            gA, gB, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid, gate_b,
            h_b, rm, cm, space, layout)
    elif u1_masks is None:
        ga, gb, lam_new, be, terr, ln = jax.vmap(
            _pair_kernel_h, in_axes=(0,) * 11 + (None,))(
            gA, gB, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid, gate_b,
            h_b, space)
    else:
        rmk, cmk = u1_masks
        ns = rmk.shape[2]
        rm = jnp.asarray(rmk[:, np.asarray(xs)]).reshape(-1, ns,
                                                         rmk.shape[-1])
        cm = jnp.asarray(cmk[:, np.asarray(xs)]).reshape(-1, ns,
                                                         cmk.shape[-1])
        keep_counts, pbn = u1_meta
        kern = lambda a, b, l1, l2, l3, l4, l5, l6, lm, gt_, hb, r, c: \
            _pair_kernel_h(a, b, l1, l2, l3, l4, l5, l6, lm, gt_, hb,
                           space, (r, c, keep_counts, pbn))
        ga, gb, lam_new, be, terr, ln = jax.vmap(kern)(
            gA, gB, lu_a, ll_a, ld_a, lu_b, ld_b, lr_b, lam_mid, gate_b,
            h_b, rm, cm)
    nb = len(xs)
    g = g.at[:, xs_arr].set(ga.reshape(ly, nb, *g.shape[2:]))
    g = g.at[:, xs_arr + 1].set(gb.reshape(ly, nb, *g.shape[2:]))
    lam_h = lam_h.at[:, xs_arr + 1].set(lam_new.reshape(ly, nb, -1))
    return (PEPS(g, lam_v, lam_h), jnp.sum(be), jnp.max(terr), jnp.sum(ln))


def _apply_v_sublattice(peps: PEPS, ys, gate, h_bond, space: FermionSpace,
                        u1_masks=None, u1_meta=None, reduced=None):
    """Batched graded update of vertical bonds (y, x)-(y+1, x) for y in ys."""
    g, lam_v, lam_h = peps
    lx = g.shape[1]
    d = g.shape[2]
    D = g.shape[3]
    ys_arr = jnp.asarray(ys)
    gA = g[ys_arr].reshape(-1, *g.shape[2:])
    gB = g[ys_arr + 1].reshape(-1, *g.shape[2:])
    lu_a = lam_v[ys_arr].reshape(-1, D)
    lam_mid = lam_v[ys_arr + 1].reshape(-1, D)
    ll_a = lam_h[ys_arr][:, :lx].reshape(-1, D)
    lr_a = lam_h[ys_arr][:, 1:].reshape(-1, D)
    ll_b = lam_h[ys_arr + 1][:, :lx].reshape(-1, D)
    lr_b = lam_h[ys_arr + 1][:, 1:].reshape(-1, D)
    ld_b = lam_v[ys_arr + 2].reshape(-1, D)
    gate_b = gate[ys_arr].reshape(-1, d, d, d, d)
    h_b = h_bond[ys_arr].reshape(-1, d, d, d, d)
    if reduced is not None:
        layout, qr_rm, lq_cm = reduced
        if np.asarray(qr_rm).ndim == 2:        # Z2: shared static masks
            rm = jnp.asarray(qr_rm)
            cm = jnp.asarray(lq_cm)
            mask_axes = (None, None)
        else:                                  # U(1): per-bond masks
            rm = jnp.asarray(qr_rm[np.asarray(ys)]).reshape(
                -1, *qr_rm.shape[2:])
            cm = jnp.asarray(lq_cm[np.asarray(ys)]).reshape(
                -1, *lq_cm.shape[2:])
            mask_axes = (0, 0)
        ga, gb, lam_new, be, terr, ln = jax.vmap(
            _pair_kernel_v_qr,
            in_axes=(0,) * 11 + mask_axes + (None, None))(
            gA, gB, lu_a, ll_a, lr_a, ll_b, ld_b, lr_b, lam_mid, gate_b,
            h_b, rm, cm, space, layout)
    elif u1_masks is None:
        ga, gb, lam_new, be, terr, ln = jax.vmap(
            _pair_kernel_v, in_axes=(0,) * 11 + (None,))(
            gA, gB, lu_a, ll_a, lr_a, ll_b, ld_b, lr_b, lam_mid, gate_b,
            h_b, space)
    else:
        rmk, cmk = u1_masks
        ns = rmk.shape[2]
        rm = jnp.asarray(rmk[np.asarray(ys)]).reshape(-1, ns,
                                                      rmk.shape[-1])
        cm = jnp.asarray(cmk[np.asarray(ys)]).reshape(-1, ns,
                                                      cmk.shape[-1])
        keep_counts, pbn = u1_meta
        kern = lambda a, b, l1, l2, l3, l4, l5, l6, lm, gt_, hb, r, c: \
            _pair_kernel_v(a, b, l1, l2, l3, l4, l5, l6, lm, gt_, hb,
                           space, (r, c, keep_counts, pbn))
        ga, gb, lam_new, be, terr, ln = jax.vmap(kern)(
            gA, gB, lu_a, ll_a, lr_a, ll_b, ld_b, lr_b, lam_mid, gate_b,
            h_b, rm, cm)
    ny = len(ys)
    g = g.at[ys_arr].set(ga.reshape(ny, lx, *g.shape[2:]))
    g = g.at[ys_arr + 1].set(gb.reshape(ny, lx, *g.shape[2:]))
    lam_v = lam_v.at[ys_arr + 1].set(lam_new.reshape(ny, lx, -1))
    return (PEPS(g, lam_v, lam_h), jnp.sum(be), jnp.max(terr), jnp.sum(ln))


def fermion_sweep(peps: PEPS, gate_h, gate_v, h_h, h_v,
                  space: FermionSpace, u1_h=None, u1_v=None, u1_meta=None,
                  reduced_h=None, reduced_v=None):
    """One checkerboard sweep over all horizontal then vertical bonds."""
    ly, lx = peps.ly, peps.lx
    e_sum = jnp.zeros((), peps.gammas.real.dtype)
    log_norm = jnp.zeros((), peps.gammas.real.dtype)
    terr = jnp.zeros((), peps.gammas.real.dtype)
    for xs in (tuple(range(0, lx - 1, 2)), tuple(range(1, lx - 1, 2))):
        if not xs:
            continue
        peps, e, t, ln = _apply_h_sublattice(peps, xs, gate_h, h_h, space,
                                             u1_h, u1_meta, reduced_h)
        e_sum, terr, log_norm = e_sum + e, jnp.maximum(terr, t), log_norm + ln
    for ys in (tuple(range(0, ly - 1, 2)), tuple(range(1, ly - 1, 2))):
        if not ys:
            continue
        peps, e, t, ln = _apply_v_sublattice(peps, ys, gate_v, h_v, space,
                                             u1_v, u1_meta, reduced_v)
        e_sum, terr, log_norm = e_sum + e, jnp.maximum(terr, t), log_norm + ln
    return peps, (e_sum, log_norm, terr)


def fermion_simple_update(peps: PEPS, model, space: FermionSpace,
                          params: SimpleUpdateParams,
                          step_observer: Callable | None = None,
                          charges: U1Charges | None = None,
                          qr_reduce: bool = True
                          ) -> SimpleUpdateResult:
    """Imaginary-time evolution of a fermionic PEPS (the reference's graded
    SimpleUpdateExecutor, validated by test_fermion_simple_update.cpp).

    Gates are exp(-tau h2) of the second-quantized bond Hamiltonian in the
    graded ordered basis (fermion/gates.py); single-site terms (mu, U) are
    folded into the bonds exactly.

    qr_reduce=True switches the bond projection to the reference's
    QR-QR-gate-SVD reduction (square_lattice_peps_projection_impl.h:
    104-122): same singular spectrum, ~(D^2/d)^3x cheaper SVD — the win
    that makes D>=8 graded SU practical."""
    from peps_tpu.fermion.gates import bond_h2
    from peps_tpu.peps import fold_site_into_bonds

    d = peps.phys_dim
    ly, lx = peps.ly, peps.lx
    dt = peps.gammas.dtype
    hh = jnp.asarray(bond_h2(model, "h"), dt)
    hv = jnp.asarray(bond_h2(model, "v"), dt)
    if model.h_site is not None:
        hh_b, hv_b = fold_site_into_bonds(hh, hv, jnp.asarray(model.h_site,
                                                              dt), ly, lx)
        hh_b, hv_b = jnp.asarray(hh_b, dt), jnp.asarray(hv_b, dt)
    else:
        hh_b = jnp.broadcast_to(hh, (ly, lx - 1, d, d, d, d))
        hv_b = jnp.broadcast_to(hv, (ly - 1, lx, d, d, d, d))
    tau = params.tau
    make_gate = jax.vmap(lambda m: expm_taylor(-tau * m))
    gate_h = make_gate(hh_b.reshape(-1, d * d, d * d)).reshape(
        ly, lx - 1, d, d, d, d)
    gate_v = make_gate(hv_b.reshape(-1, d * d, d * d)).reshape(
        ly - 1, lx, d, d, d, d)

    u1_h = u1_v = u1_meta = reduced_h = reduced_v = None
    if charges is not None:
        assert tuple(q % 2 for q in charges.bond_charge) \
            == space.bond_parity, "bond charges must refine the parity split"
        if qr_reduce:
            layout = _reduced_layout(space, charges)
            reduced_h = (layout,) + _reduced_qr_masks(layout, charges, "h",
                                                      ly, lx)
            reduced_v = (layout,) + _reduced_qr_masks(layout, charges, "v",
                                                      ly, lx)
        else:
            u1_h = _u1_bond_masks(charges, space, "h", ly, lx)
            u1_v = _u1_bond_masks(charges, space, "v", ly, lx)
            pbn = tuple(q % 2 for q in charges.bond_charge)
            u1_meta = (charges.keep_counts, pbn)
    elif qr_reduce:
        layout = _reduced_layout(space, None)
        reduced_h = (layout,) + _reduced_qr_masks(layout, None, "h", ly, lx)
        reduced_v = (layout,) + _reduced_qr_masks(layout, None, "v", ly, lx)

    sweep = jax.jit(lambda p: fermion_sweep(p, gate_h, gate_v, hh_b, hv_b,
                                            space, u1_h, u1_v, u1_meta,
                                            reduced_h, reduced_v))
    history = []
    e_prev, stall, converged, en = None, 0, False, float("nan")
    step = 0
    for step in range(1, params.steps + 1):
        peps, (e0, log_norm, terr) = sweep(peps)
        e0 = float(e0)
        en = -float(log_norm) / tau
        history.append(e0)
        if step_observer is not None:
            step_observer(step=step, e0=e0, en=en, trunc_err=float(terr))
        if params.energy_abs_tol > 0 and e_prev is not None \
                and step >= params.min_steps:
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


def expand_bond_dim_graded(tps: jnp.ndarray, space: FermionSpace,
                           new_space: FermionSpace,
                           noise: float = 0.0, key=None) -> jnp.ndarray:
    """Embed a graded TPS into a larger bond space, preserving the state
    exactly (reference: qlten `Expand` on graded indices, the D-increase
    workflow). Unlike the bosonic pad, slots must land INSIDE their parity
    block of the [even | odd] layout: even slots 0..de-1 -> 0..de'-1, odd
    slots de..D-1 -> de'..de'+do-1. Optional noise seeds the new slots on
    PARITY-CONSERVING entries only (anything else would leave the even
    sector and corrupt amplitudes)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    de, do = space.d_even, space.d_odd
    ne, no = new_space.d_even, new_space.d_odd
    assert ne >= de and no >= do, ((de, do), (ne, no))
    assert new_space.phys_parity == space.phys_parity
    dn = ne + no
    idx = np.concatenate([np.arange(de), ne + np.arange(do)])
    out = jnp.zeros((ly, lx, d) + (dn,) * 4, tps.dtype)
    out = out.at[np.ix_(range(ly), range(lx), range(d),
                        idx, idx, idx, idx)].set(tps)
    if noise > 0.0:
        assert key is not None, "noise > 0 needs a PRNG key"
        from peps_tpu.fermion.graded import parity_mask, GT
        from peps_tpu.lattice import boundary_mask
        pb = new_space.bond_parity
        pmask = parity_mask(GT(out[0, 0], (new_space.phys_parity,) + (pb,) * 4,
                               (False, True, True, False, False)))
        full = jax.random.normal(key, out.shape, out.dtype) * noise
        keep_old = jnp.zeros(out.shape, bool)
        keep_old = keep_old.at[np.ix_(range(ly), range(lx), range(d),
                                      idx, idx, idx, idx)].set(True)
        bmask = jnp.asarray(boundary_mask(ly, lx, d, dn),
                            dtype=out.real.dtype)
        out = out + jnp.where(keep_old, 0.0, full) \
            * jnp.asarray(pmask, out.dtype)[None, None] * bmask
    return out
