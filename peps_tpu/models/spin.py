"""Spin-1/2 Hamiltonian building blocks.

Declarative model spec: a square-lattice model is a set of dense coupling
tensors ``h_bond[d,d,d,d]`` (= <p1' p2'| h |p1 p2>) for horizontal/vertical/
diagonal bonds plus an onsite ``h_site[d,d]``. This replaces the reference's
per-model CRTP solver classes (`algorithm/vmc_update/model_solvers/`) for the
bosonic family: the generic evaluator contracts full amplitude-ratio tables,
so any model expressible through these tensors needs no custom code.

Basis convention: state 0 = spin up (+1/2), state 1 = spin down (-1/2).
"""
from __future__ import annotations

import dataclasses

import numpy as np


def spin_half_ops():
    sz = np.array([[0.5, 0.0], [0.0, -0.5]])
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])   # S^+
    sm = sp.T                                  # S^-
    sx = 0.5 * np.array([[0.0, 1.0], [1.0, 0.0]])
    sy = 0.5j * np.array([[0.0, -1.0], [1.0, 0.0]])
    return sz, sp, sm, sx, sy


def two_site(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a (x) b as [d,d,d,d] = <p1' p2'|a(x)b|p1 p2>."""
    return np.einsum("ac,bd->abcd", a, b)


def xxz_bond(jz: float = 1.0, jxy: float = 1.0) -> np.ndarray:
    """H_bond = jz Sz Sz + jxy/2 (S+ S- + S- S+). jz=jxy=1 is Heisenberg.

    Reference model: square_spin_onehalf_xxz_obc.h."""
    sz, sp, sm, _, _ = spin_half_ops()
    return (jz * two_site(sz, sz)
            + 0.5 * jxy * (two_site(sp, sm) + two_site(sm, sp)))


def heisenberg_bond(j: float = 1.0) -> np.ndarray:
    return j * xxz_bond(1.0, 1.0)


def ising_zz_bond(j: float = 1.0) -> np.ndarray:
    """-j Sz Sz convention of the reference TFIM solver uses sigma matrices;
    here: h_bond = -j sigma^z sigma^z (sigma = 2S).

    Reference model: transverse_field_ising_square_obc.h (H = -J sum sz sz
    - h sum sx with Pauli operators)."""
    sz = np.diag([1.0, -1.0])
    return -j * two_site(sz, sz)


def transverse_field_site(h: float) -> np.ndarray:
    """-h sigma^x onsite term of the TFIM."""
    sx = np.array([[0.0, 1.0], [1.0, 0.0]])
    return -h * sx


@dataclasses.dataclass(frozen=True)
class SquareLatticeModel:
    """Generic square-lattice two-body model (bosonic).

    h_h / h_v: NN bond terms [d,d,d,d]; h_d / h_ad: next-nearest-neighbour
    terms along the (dr) diagonal and (ur) anti-diagonal; h_site: onsite term.
    Any of them may be None.
    """
    phys_dim: int
    h_h: np.ndarray | None = None
    h_v: np.ndarray | None = None
    h_d: np.ndarray | None = None
    h_ad: np.ndarray | None = None
    h_site: np.ndarray | None = None
    # sqrt5-distance and third-NN couplings (reference:
    # ReplaceSqrt5DistTwoSiteTrace / ReplaceTNNSiteTrace,
    # bmps_contractor.h:904,923):
    # h_s5a on ((y+1, x), (y, x+2));  h_s5b on ((y+2, x), (y, x+1));
    # h_tnn_h on ((y, x), (y, x+2));  h_tnn_v on ((y, x), (y+2, x)).
    h_s5a: np.ndarray | None = None
    h_s5b: np.ndarray | None = None
    h_tnn_h: np.ndarray | None = None
    h_tnn_v: np.ndarray | None = None
    name: str = "model"


def heisenberg(j: float = 1.0) -> SquareLatticeModel:
    hb = heisenberg_bond(j)
    return SquareLatticeModel(2, hb, hb, name="heisenberg")


def xxz(jz: float, jxy: float) -> SquareLatticeModel:
    hb = xxz_bond(jz, jxy)
    return SquareLatticeModel(2, hb, hb, name="xxz")


def j1j2_xxz(j1z: float, j1xy: float, j2z: float, j2xy: float) -> SquareLatticeModel:
    """J1-J2 model (reference: square_spin_onehalf_j1j2_xxz_obc.h)."""
    h1 = xxz_bond(j1z, j1xy)
    h2 = xxz_bond(j2z, j2xy)
    return SquareLatticeModel(2, h1, h1, h2, h2, name="j1j2_xxz")


def transverse_field_ising(j: float = 1.0, h: float = 1.0) -> SquareLatticeModel:
    hb = ising_zz_bond(j)
    return SquareLatticeModel(2, hb, hb, h_site=transverse_field_site(h),
                              name="tfim")


def triangle_heisenberg(j: float = 1.0) -> SquareLatticeModel:
    """Triangular-lattice Heisenberg on square PEPS: NN + one diagonal
    (reference: spin_onehalf_triangle_heisenberg_sqrpeps.h)."""
    hb = heisenberg_bond(j)
    return SquareLatticeModel(2, hb, hb, h_d=hb, name="triangle_heisenberg")


def triangle_j1j2_heisenberg(j1: float, j2: float) -> SquareLatticeModel:
    """Triangle-lattice J1-J2 Heisenberg on square PEPS — the REFERENCE
    model (spin_onehalf_triangle_heisenbergJ1J2_sqrpeps.h:247-439):
    J1 on the triangular NN bonds = horizontal + vertical + ANTI-diagonal
    ((y+1,x)-(y,x+1)); J2 on the triangular NNN bonds = main diagonal
    ((y,x)-(y+1,x+1)) + both sqrt5 families ((y+1,x)-(y,x+2) and
    (y+2,x)-(y,x+1))."""
    h1 = heisenberg_bond(j1)
    h2 = heisenberg_bond(j2)
    return SquareLatticeModel(2, h1, h1, h_d=h2, h_ad=h1,
                              h_s5a=h2, h_s5b=h2,
                              name="triangle_j1j2")


def triangle_j1j2_nnn(j1: float, j2: float) -> SquareLatticeModel:
    """Simplified square-lattice NNN variant (J1 on NN + main diagonal, J2
    on the anti-diagonal) — kept for the NNN cluster simple-update tests."""
    h1 = heisenberg_bond(j1)
    h2 = heisenberg_bond(j2)
    return SquareLatticeModel(2, h1, h1, h_d=h1, h_ad=h2,
                              name="triangle_j1j2_nnn")
