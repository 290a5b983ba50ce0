"""Lattice conventions shared across the framework.

Site-tensor axis convention (TPU-native, chosen for scan-friendly row
absorption — NOT the reference's (W,S,E,N,P) order,
cf. `include/qlpeps/two_dim_tn/peps/square_lattice_peps.h:96-170`):

    TPS site tensor   A[p, u, l, d, r]   shape (d, D, D, D, D)
    projected tensor  S[u, l, d, r]      shape (D, D, D, D)

with `u` contracting the site above's `d`, and `l` contracting the left
neighbour's `r`. The full TPS is ONE dense array `[Ly, Lx, d, D, D, D, D]`
(this doubles as the reference's SplitIndexTPS: axis 2 is the split physical
index, `include/qlpeps/two_dim_tn/tps/split_index_tps.h:81`).

Boundary convention (open BC): lattice-edge virtual bonds are physically
one-dimensional; they are *embedded at index 0* of a D-dimensional axis and the
remaining slots are exact zeros, enforced by :func:`boundary_mask`. Zero
padding is preserved by all contractions (zeros in = zeros out), so shapes are
fully static.
"""
from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class BoundaryCondition(enum.Enum):
    OPEN = "open"
    PERIODIC = "periodic"


# Axis indices of a TPS site tensor A[p, u, l, d, r]
P, U, L, D_, R = 0, 1, 2, 3, 4


def boundary_mask(ly: int, lx: int, d: int, D: int,
                  bc: BoundaryCondition = BoundaryCondition.OPEN) -> np.ndarray:
    """0/1 mask of shape [Ly, Lx, d, D, D, D, D] zeroing padded boundary slots.

    For OBC, a site at row 0 has its `u` leg restricted to index 0, etc.
    For PBC all bonds are genuine, mask is all-ones.
    """
    mask = np.ones((ly, lx, d, D, D, D, D), dtype=np.float32)
    if bc == BoundaryCondition.PERIODIC:
        return mask
    edge = np.zeros(D, dtype=np.float32)
    edge[0] = 1.0
    for y in range(ly):
        for x in range(lx):
            if y == 0:
                mask[y, x] *= edge[None, :, None, None, None]
            if x == 0:
                mask[y, x] *= edge[None, None, :, None, None]
            if y == ly - 1:
                mask[y, x] *= edge[None, None, None, :, None]
            if x == lx - 1:
                mask[y, x] *= edge[None, None, None, None, :]
    return mask


def nn_bonds_h(ly: int, lx: int, bc: BoundaryCondition = BoundaryCondition.OPEN):
    """Horizontal nearest-neighbour bonds as list of ((y,x),(y,x+1))."""
    xs = range(lx - 1) if bc == BoundaryCondition.OPEN else range(lx)
    return [((y, x), (y, (x + 1) % lx)) for y in range(ly) for x in xs]


def nn_bonds_v(ly: int, lx: int, bc: BoundaryCondition = BoundaryCondition.OPEN):
    """Vertical nearest-neighbour bonds as list of ((y,x),(y+1,x))."""
    ys = range(ly - 1) if bc == BoundaryCondition.OPEN else range(ly)
    return [((y, x), ((y + 1) % ly, x)) for y in ys for x in range(lx)]


def transpose_lattice(tn: jnp.ndarray) -> jnp.ndarray:
    """Transpose a projected network [.., Ly, Lx, u, l, d, r] -> [.., Lx, Ly, ...]
    swapping tensor axes u<->l and d<->r so that vertical structures of the
    original lattice become horizontal in the transposed one."""
    nd = tn.ndim
    # lattice axes are nd-6, nd-5; tensor axes are the last 4
    perm = list(range(nd - 6)) + [nd - 5, nd - 6, nd - 3, nd - 4, nd - 1, nd - 2]
    return jnp.transpose(tn, perm)


def transpose_tps(tps: jnp.ndarray) -> jnp.ndarray:
    """Same as :func:`transpose_lattice` for a TPS array
    [.., Ly, Lx, p, u, l, d, r]."""
    nd = tps.ndim
    perm = list(range(nd - 7)) + [nd - 6, nd - 7, nd - 5, nd - 3, nd - 4, nd - 1, nd - 2]
    return jnp.transpose(tps, perm)
