"""Local energy + holes for PERIODIC lattices via the coarse-graining
contractor.

Reference: PBC model solvers (transverse_field_ising_square_pbc.h,
heisenberg_square_pbc.h, square_spin_onehalf_j1j2_xxz_pbc.h) built on
TRGContractor trial/commit replacements. TPU version:

* gradient holes + ALL one-site replacement ratios come from ONE reverse-mode
  pass (`punch_all_holes_pbc`) — the reference's `PunchAllHoles`;
* two-site (bond) replacement amplitudes are FULL RECOMPUTES of the
  contraction, batched over (bond, candidate-pair) with vmap. The reference's
  trial/commit re-propagates the influence cone (trg_contractor.h:350-421);
  a batched full recompute has the same accuracy, is embarrassingly parallel
  on the MXU, and needs no cache machinery.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from peps_tpu.algorithm.energy import EnergyHoles, ModelTensors, rdtype
from peps_tpu.contraction.pbc import contract_pbc, punch_all_holes_pbc
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import project


def _bond_tables_pbc(tps, tn, config, bonds, chi, trunc):
    """Amplitude tables for two-site replacements on a static bond list.

    bonds: int array [Nb, 4] rows (y1, x1, y2, x2). Returns table [Nb, d, d]
    of raw mantissas (shared log-weight dropped — all entries are compared
    within a bond, and ratios to the current amplitude cancel it) and the
    current-config mantissa psi0.
    """
    d = tps.shape[2]
    nb = bonds.shape[0]

    def one(bond, p, q):
        y1, x1, y2, x2 = bond[0], bond[1], bond[2], bond[3]
        t = tn.at[y1, x1].set(tps[y1, x1, p]).at[y2, x2].set(tps[y2, x2, q])
        mant, logw = contract_pbc(t, chi, trunc)
        return mant, logw

    pp, qq = jnp.meshgrid(jnp.arange(d), jnp.arange(d), indexing="ij")
    pq = jnp.stack([pp.reshape(-1), qq.reshape(-1)], axis=1)  # [d*d, 2]

    def per_bond(bond):
        mants, logws = jax.vmap(lambda s: one(bond, s[0], s[1]))(pq)
        # bring to common scale within the bond
        lmax = jnp.max(logws)
        return (mants * jnp.exp(logws - lmax)).reshape(d, d)

    return jax.vmap(per_bond)(bonds)


def local_energy_and_holes_pbc(tps: jnp.ndarray, config: jnp.ndarray,
                               model: ModelTensors, chi: int,
                               trunc: TruncParams,
                               with_holes: bool = True) -> EnergyHoles:
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    tn = project(tps, config)
    holes, mant, logw = punch_all_holes_pbc(tn, chi, trunc)
    safe_mant = jnp.where(mant == 0, 1.0, mant)

    e = jnp.zeros((), rdtype(tn))
    # one-site terms from holes (free)
    if model.h_site is not None:
        ratio1 = jnp.einsum("yxuldr,yxpuldr->yxp", holes, tps) / safe_mant
        e = e + jnp.sum(model.h_site[config] * ratio1)

    import numpy as np
    bond_specs = []
    if model.h_h is not None:
        bonds = np.array([[y, x, y, (x + 1) % lx]
                          for y in range(ly) for x in range(lx)])
        bond_specs.append((model.h_h, bonds))
    if model.h_v is not None:
        bonds = np.array([[y, x, (y + 1) % ly, x]
                          for y in range(ly) for x in range(lx)])
        bond_specs.append((model.h_v, bonds))
    if model.h_d is not None:
        bonds = np.array([[y, x, (y + 1) % ly, (x + 1) % lx]
                          for y in range(ly) for x in range(lx)])
        bond_specs.append((model.h_d, bonds))
    if model.h_ad is not None:
        bonds = np.array([[(y + 1) % ly, x, y, (x + 1) % lx]
                          for y in range(ly) for x in range(lx)])
        bond_specs.append((model.h_ad, bonds))

    for h, bonds_np in bond_specs:
        bonds = jnp.asarray(bonds_np)
        tables = _bond_tables_pbc(tps, tn, config, bonds, chi, trunc)
        c1 = config[bonds[:, 0], bonds[:, 1]]
        c2 = config[bonds[:, 2], bonds[:, 3]]
        nb = bonds.shape[0]
        psi_b = tables[jnp.arange(nb), c1, c2]
        safe_b = jnp.where(psi_b == 0, 1.0, psi_b)
        e = e + jnp.sum(h[c1, c2] * tables / safe_b[:, None, None])

    o_tensor = None
    if with_holes:
        sel = jax.nn.one_hot(config, d, dtype=tps.dtype)
        o_tensor = (holes / safe_mant)[:, :, None] \
            * sel[:, :, :, None, None, None, None]

    log_abs = jnp.log(jnp.maximum(jnp.abs(mant), jnp.finfo(rdtype(tn)).tiny)) + logw
    return EnergyHoles(e, o_tensor, log_abs, mant)
