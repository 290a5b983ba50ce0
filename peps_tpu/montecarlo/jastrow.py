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


def hole_attraction_dress(hole_vals, ly: int, lx: int, kappa: float,
                          diagonal: bool = False) -> JastrowDress:
    """Support-conditioning dress for the t-J pair-correlation estimator.

    Builds the hole-attraction dress J(s) = 2*kappa * sum_<ij> h_i h_j
    (h = per-state hole indicator, <ij> = OBC nearest neighbours, plus the
    diagonal neighbours with diagonal=True): the dressed sampler draws from
    |psi * e^J|^2, boosting configurations with adjacent holes by
    e^{4 kappa}. The <Delta^dag Delta> estimator is supported exactly on
    hole-bond configurations (~0.2% of unbiased samples at the 6x6 2-hole
    flagship), so conditioned sampling targets the support directly
    instead of waiting for it.

    The production recipe (examples/flagship_pc_cond.py, validated against
    the exact sector sum in tests/test_pair_corr.py) is HARD conditioning:
    kappa ~ 50 makes every unbinding move's acceptance exactly 0 while
    moves inside the bound sector keep delta-J = 0 (for 2 holes the pair
    count is the 0/1 adjacency indicator), i.e. the chain samples
    |psi|^2 restricted to the bound sector with NO reweighting. Use
    diagonal=True for that: with Chebyshev-1 ("fat") adjacency the pair
    diffuses everywhere through diagonal intermediate states using the
    ordinary sweep moves (strict-NN conditioning freezes the pair in
    place and the position distribution never mixes). The estimator is
    then C = P(A) * E[table | A], with P(A) counted from an unconditioned
    (cheap, table-free) run.

    hole_vals: [d] hole indicator per local state (t-J: [1, 0, 0])."""
    n = ly * lx
    v = jnp.zeros((n, n))
    idx = jnp.arange(n).reshape(ly, lx)
    pairs = [(idx[:, :-1].reshape(-1), idx[:, 1:].reshape(-1)),
             (idx[:-1, :].reshape(-1), idx[1:, :].reshape(-1))]
    if diagonal:
        pairs += [(idx[:-1, :-1].reshape(-1), idx[1:, 1:].reshape(-1)),
                  (idx[:-1, 1:].reshape(-1), idx[1:, :-1].reshape(-1))]
    # J = -1/2 n V n with v_ij = -2 kappa on NN pairs (both triangle halves)
    for (a, b) in pairs:
        v = v.at[a, b].set(-2.0 * kappa)
        v = v.at[b, a].set(-2.0 * kappa)
    return JastrowDress(v, jnp.asarray(hole_vals, v.dtype))


def holes_adjacent(config, hole_vals, diagonal: bool = True):
    """1.0 where some pair of holes is (Chebyshev-)adjacent — the counting
    observable for P(A) in the conditioned pair-correlation estimator."""
    h = jnp.asarray(hole_vals)[config] > 0.5
    hits = jnp.any(h[:, :-1] & h[:, 1:]) | jnp.any(h[:-1, :] & h[1:, :])
    if diagonal:
        hits = hits | jnp.any(h[:-1, :-1] & h[1:, 1:]) \
            | jnp.any(h[:-1, 1:] & h[1:, :-1])
    return hits.astype(jnp.float32)


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
