"""Fermionic projection: graded TPS + config -> DRESSED bosonic network.

The central result powering the fermionic VMC fast path:

    <S|psi>  =  plain bosonic contraction of  M~[y,x] ,
    M~[y,x]  =  tps[y, x, S[y,x]] * (-1)^{E(y,x)} ,

where the exponent E is a GF(2) form in (pi = phys parity of the selected
component, the virtual leg parities, and Pi = the snake-order PREFIX parity
of the config). The prefix terms are the 2D Jordan-Wigner strings in
disguise: a per-site local function of leg parities alone provably does NOT
exist (the sign content has irreducible cross-row-gap quadratic terms), but
adding the config prefix parity makes the dressing exactly local.

The coefficient table below was solved as a GF(2) linear system over
monomials {pi, u, l, d, r, Pi_prev, Pi_cur} x 8 site classes against the
canonical graded contraction (peps_tpu/fermion/exact.py) on 720 random
parity-even delta networks spanning 9 lattice sizes (2x2 .. 4x4), with ZERO
inconsistencies; tests/test_fermion_convert.py re-verifies it against dense
random graded states on sizes beyond the fit.

Amplitudes agree EXACTLY with exact.exact_coefficients — the snake-order JW
basis — so local energies use the existing channel tables with snake string
signs. Because the dressed network is plain bosonic, the ENTIRE existing
contraction stack (BMPS, ratio tables, AD holes) applies unchanged.

Reference counterpart: the graded contraction path of qlten inside
BMPSContractor (bmps_contractor.h:808-829) — re-designed here so that the
hot path stays the (TPU-optimized) bosonic engine.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# class = (y%2)*4 + (x==0)*2 + (x==lx-1); monomials over
# {pi, u, l, d, r, Pp (prefix parity before site), Pc (including site)}
_CLS_TERMS = {
    0: (("pi",), ("l",), ("pi", "u"), ("pi", "l"), ("pi", "d"),
        ("u", "l"), ("u", "d"), ("l", "d"), ("u", "Pp")),
    1: (("l",), ("u", "l"), ("pi", "Pp"), ("l", "Pp")),
    2: (("pi",), ("pi", "u"), ("pi", "d"), ("u", "d")),
    3: (),
    4: (("l",), ("pi", "d"), ("u", "l"), ("u", "d"), ("l", "d"),
        ("d", "Pp")),
    5: (("pi",), ("u", "l"), ("pi", "Pp"), ("l", "Pp")),
    6: (("u", "d"),),
    7: (),
}

_LEGS = ("u", "l", "d", "r")


def _site_class(y, x, lx):
    return (y % 2) * 4 + (1 if x == 0 else 0) * 2 + (1 if x == lx - 1 else 0)


@lru_cache(maxsize=None)
def _static_tables(ly, lx, bond_parity):
    """Per-site static data: leg-pair masks [Ly, Lx, D, D, D, D], and 0/1
    coefficient tables for the config-dependent monomials."""
    pb = np.asarray(bond_parity)
    D = len(pb)
    pair_mask = np.ones((ly, lx, D, D, D, D))
    # coefficient tables: coef[term][y, x]
    coef = {t: np.zeros((ly, lx), dtype=np.int64)
            for t in (("pi",), ("pi", "Pp"), ("pi", "Pc"), ("Pp",), ("Pc",))}
    leg_static = {g: np.zeros((ly, lx), dtype=np.int64) for g in _LEGS}
    leg_pi = {g: np.zeros((ly, lx), dtype=np.int64) for g in _LEGS}
    leg_pp = {g: np.zeros((ly, lx), dtype=np.int64) for g in _LEGS}
    leg_pc = {g: np.zeros((ly, lx), dtype=np.int64) for g in _LEGS}
    axis_of = {"u": 0, "l": 1, "d": 2, "r": 3}
    for y in range(ly):
        for x in range(lx):
            for term in _CLS_TERMS[_site_class(y, x, lx)]:
                if term in coef:
                    coef[term][y, x] ^= 1
                elif len(term) == 1 and term[0] in _LEGS:
                    leg_static[term[0]][y, x] ^= 1
                elif len(term) == 2 and term[0] == "pi" and term[1] in _LEGS:
                    leg_pi[term[1]][y, x] ^= 1
                elif len(term) == 2 and term[1] == "Pp" and term[0] in _LEGS:
                    leg_pp[term[0]][y, x] ^= 1
                elif len(term) == 2 and term[1] == "Pc" and term[0] in _LEGS:
                    leg_pc[term[0]][y, x] ^= 1
                elif (len(term) == 2 and term[0] in _LEGS
                      and term[1] in _LEGS):
                    a1, a2 = axis_of[term[0]], axis_of[term[1]]
                    m = np.outer(pb, pb) % 2
                    shape = [1, 1, 1, 1]
                    shape[a1] = D
                    shape[a2] = D
                    mm = (1.0 - 2.0 * m).reshape(
                        [D if i in (a1, a2) else 1 for i in range(4)])
                    pair_mask[y, x] = pair_mask[y, x] * mm
                else:
                    raise AssertionError(term)
    leg_sign = 1.0 - 2.0 * pb       # (-1)^{p}
    return (pair_mask, coef, leg_static, leg_pi, leg_pp, leg_pc, leg_sign)


def snake_prefix_parity(config, phys_parity):
    """(Pi_prev, Pi_cur) [Ly, Lx] int arrays: cumulative config parity along
    the snake order, before / including each site."""
    ly, lx = config.shape
    pp = jnp.asarray(np.asarray(phys_parity), jnp.int32)
    pi_site = pp[config]                         # [Ly, Lx]
    # snake-flatten: reverse odd rows
    rev = jnp.where((jnp.arange(ly) % 2 == 1)[:, None],
                    pi_site[:, ::-1], pi_site)
    flat = rev.reshape(-1)
    cur = jnp.cumsum(flat) % 2
    prev = jnp.concatenate([jnp.zeros((1,), cur.dtype), cur[:-1]])
    def unflatten(v):
        m = v.reshape(ly, lx)
        return jnp.where((jnp.arange(ly) % 2 == 1)[:, None], m[:, ::-1], m)
    return unflatten(prev), unflatten(cur)


def fermion_project(tps, config, space):
    """Dressed projected network [Ly, Lx, D, D, D, D] (axes u, l, d, r)
    whose PLAIN bosonic contraction equals the snake-JW amplitude <S|psi>.

    Drop-in fermionic replacement for tps.project()."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    pp = space.phys_parity
    pb = space.bond_parity
    (pair_mask, coef, leg_static, leg_pi, leg_pp, leg_pc,
     leg_sign) = _static_tables(ly, lx, pb)
    # project
    idx = config[..., None, None, None, None, None]
    proj = jnp.take_along_axis(tps, idx, axis=2)[:, :, 0]   # [Ly,Lx,D,D,D,D]

    pp_arr = jnp.asarray(np.asarray(pp), jnp.int32)
    pi_s = pp_arr[config]                                    # [Ly, Lx]
    Pp, Pc = snake_prefix_parity(config, pp)

    # scalar terms
    sc_exp = (jnp.asarray(coef[("pi",)]) * pi_s
              + jnp.asarray(coef[("pi", "Pp")]) * pi_s * Pp
              + jnp.asarray(coef[("pi", "Pc")]) * pi_s * Pc
              + jnp.asarray(coef[("Pp",)]) * Pp
              + jnp.asarray(coef[("Pc",)]) * Pc) % 2
    sign = (1.0 - 2.0 * sc_exp).astype(proj.dtype)           # [Ly, Lx]
    out = proj * sign[:, :, None, None, None, None]
    # static leg-pair masks
    out = out * jnp.asarray(pair_mask, proj.dtype)
    # per-leg exponents: e_leg = static + pi*c1 + Pp*c2 + Pc*c3 (mod 2)
    lv = jnp.asarray(leg_sign, proj.dtype)                   # [D]
    for gi, g in enumerate(_LEGS):
        e = (jnp.asarray(leg_static[g]) + jnp.asarray(leg_pi[g]) * pi_s
             + jnp.asarray(leg_pp[g]) * Pp
             + jnp.asarray(leg_pc[g]) * Pc) % 2              # [Ly, Lx]
        shape = [1, 1, 1, 1]
        shape[gi] = len(pb)
        mask = jnp.where(e[:, :, None, None, None, None] == 1,
                         lv.reshape([1, 1] + shape),
                         jnp.ones([1] * 6, proj.dtype))
        out = out * mask
    return out
