"""Exact coefficient extraction for fermionic (graded) PEPS — test oracle.

Defines the physical meaning of a graded PEPS: the state is

    |psi> = sum_n c(n) (f_s0^dag)^{n_s0} (f_s1^dag)^{n_s1} ... |vac>

with sites s0, s1, ... in SNAKE (boustrophedon) order — even rows left to
right, odd rows right to left — the planar-compatible Jordan-Wigner order.
`exact_coefficients` contracts the network site-by-site in snake order with
the graded algebra (Koszul signs explicit), keeping physical legs open and
ordered; the resulting tensor's entries ARE c(n).

Exponential cost — small lattices / tests only. The production path is the
local sign absorption in `peps_tpu/fermion/convert.py`, which is verified
against this routine.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from peps_tpu.fermion.graded import GT, gcontract, gtranspose


def snake_order(ly: int, lx: int):
    out = []
    for y in range(ly):
        xs = range(lx) if y % 2 == 0 else range(lx - 1, -1, -1)
        for x in xs:
            out.append((y, x))
    return out


def _squeeze(t: GT, labels, drop):
    keep = [i for i, lbl in enumerate(labels) if lbl not in drop]
    if len(keep) == len(labels):
        return t, labels
    for i, lbl in enumerate(labels):
        if lbl in drop:
            assert t.shape[i] == 1 and t.parity[i] == (0,), (lbl, t.parity[i])
    data = t.data.reshape([t.shape[i] for i in keep])
    return (GT(data, tuple(t.parity[i] for i in keep),
               tuple(t.dual[i] for i in keep)),
            [labels[i] for i in keep])


def exact_coefficients(tps: jnp.ndarray, phys_parity, bond_parity,
                       edge_index: int = 0) -> np.ndarray:
    """Contract a graded TPS [Ly, Lx, d, D, D, D, D] (axes p,u,l,d,r; arrows
    p/d/r out, u/l in; boundary bonds = content at `edge_index`, which must
    be parity-even) into the full coefficient tensor c[n_s0, n_s1, ...]
    (snake-ordered axes, d per axis)."""
    ly, lx = tps.shape[0], tps.shape[1]
    pp = tuple(int(x) for x in phys_parity)
    pb = tuple(int(x) for x in bond_parity)
    assert pb[edge_index] == 0, "boundary slot must be even"
    duals = (False, True, True, False, False)       # p,u,l,d,r
    arr = np.asarray(tps)
    BOUND = "boundary"

    def site(y, x):
        a = arr[y, x]
        if y == 0:
            a = a[:, edge_index:edge_index + 1]
        if x == 0:
            a = a[:, :, edge_index:edge_index + 1]
        if y == ly - 1:
            a = a[:, :, :, edge_index:edge_index + 1]
        if x == lx - 1:
            a = a[:, :, :, :, edge_index:edge_index + 1]
        par = (pp,
               (0,) if y == 0 else pb,
               (0,) if x == 0 else pb,
               (0,) if y == ly - 1 else pb,
               (0,) if x == lx - 1 else pb)
        # labels for t's 5 axes once contracted legs are removed
        lbl = ["p",
               BOUND if y == 0 else ("v", x),          # u
               BOUND if x == 0 else ("h",),            # l
               BOUND if y == ly - 1 else ("v", x),     # d
               BOUND if x == lx - 1 else ("h",)]       # r
        return GT(jnp.asarray(a), par, duals), lbl

    acc = GT(jnp.ones(()), (), ())
    labels: list = []      # labels of acc axes; "P" for phys, else frontier
    nphys = 0

    for y, x in snake_order(ly, lx):
        t, t_lbl = site(y, x)
        going_right = (y % 2 == 0)
        axes_acc, axes_t = [], []
        if y > 0:
            axes_acc.append(labels.index(("v", x)))
            axes_t.append(1)                          # t's u (dual)
        if (going_right and x > 0) or (not going_right and x < lx - 1):
            axes_acc.append(labels.index(("h",)))
            axes_t.append(2 if going_right else 4)    # l if ->, r if <-
        res = gcontract(acc, tuple(axes_acc), t, tuple(axes_t))
        rem = [lbl for i, lbl in enumerate(labels) if i not in axes_acc]
        t_rem = [t_lbl[i] for i in range(5) if i not in axes_t]
        labels = rem + t_rem
        # move the new phys axis right after the previous phys axes
        p_pos = labels.index("p")
        perm = list(range(len(labels)))
        perm.remove(p_pos)
        perm.insert(nphys, p_pos)
        res = gtranspose(res, tuple(perm))
        labels = [labels[i] for i in perm]
        labels[nphys] = "P"
        nphys += 1
        acc, labels = _squeeze(res, labels, {BOUND})

    assert acc.ndim == nphys == ly * lx, (acc.ndim, nphys)
    return np.asarray(acc.data)
