"""Density-density Jastrow factor (wavefunction dress).

Reference: `vmc_basic/jastrow_factor.h` (packed upper-triangular v_ij with
field-at-site ratio updates) and the Jastrow-dressed t-J solver
(`square_nnn_energy_solver_jastrow_dressed`). Dense TPU version: v is a full
symmetric [N, N] matrix (N = Ly*Lx), densities come from a per-state lookup
table, and replacement ratios are evaluated directly from the config field.

The dressed wavefunction is psi_J(s) = exp(-1/2 sum_ij v_ij n_i n_j) psi(s).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class JastrowDress(NamedTuple):
    v: jnp.ndarray        # [N, N] symmetric, zero diagonal
    nvals: jnp.ndarray    # [d] density of each local state

    def densities(self, config):
        return self.nvals[config].reshape(-1)          # [N]

    def log_factor(self, config):
        n = self.densities(config)
        return -0.5 * n @ (self.v @ n)

    def field(self, config):
        """F_i = sum_j v_ij n_j, [N] (the reference's field-at-site)."""
        return self.v @ self.densities(config)


def one_site_log_ratios(dress: JastrowDress, config, ly, lx):
    """log(J(s')/J(s)) for replacing site (y,x) by each state p: [Ly,Lx,d]."""
    n = dress.nvals[config].reshape(-1)                 # [N]
    f = (dress.v @ n).reshape(ly, lx)                   # field
    cur = dress.nvals[config]                           # [Ly, Lx]
    delta = dress.nvals[None, None, :] - cur[:, :, None]   # [Ly, Lx, d]
    # J = -1/2 n V n: change = -delta_i * (F_i - v_ii n_i) - 1/2 v_ii delta^2;
    # v_ii = 0 by convention.
    return -delta * f[:, :, None]


def two_site_log_ratios(dress: JastrowDress, config, idx1, idx2):
    """log Jastrow ratios for replacing flat sites idx1[k], idx2[k] by (p, q):
    returns [K, d, d]. idx1/idx2: int arrays of flat site indices."""
    n = dress.nvals[config].reshape(-1)
    f = dress.v @ n
    d = dress.nvals.shape[0]
    n1 = n[idx1]
    n2 = n[idx2]
    d1 = dress.nvals[None, :, None] - n1[:, None, None]   # [K, d, 1]
    d2 = dress.nvals[None, None, :] - n2[:, None, None].transpose(0, 2, 1)
    v12 = dress.v[idx1, idx2]                             # [K]
    f1 = f[idx1] - dress.v[idx1, idx2] * n2               # field w/o partner
    f2 = f[idx2] - dress.v[idx1, idx2] * n1
    out = (-d1 * f1[:, None, None] - d2 * f2[:, None, None]
           - v12[:, None, None] * ((n1[:, None, None] + d1)
                                   * (n2[:, None, None] + d2)
                                   - (n1 * n2)[:, None, None]))
    return out
