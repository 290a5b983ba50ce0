"""Monte Carlo sweep for periodic lattices (coarse-graining contractor).

Reference: the PBC sweep base picks random bonds with TRG trial/commit
(`square_nn_updater.h:90-128`, `BeginTrialWithReplacement`/`CommitTrial`).
TPU version: a deterministic scan over all NN bonds; each bond computes its
full [d, d] candidate amplitude table by batched recompute of the
contraction, then applies Metropolis-exchange or Suwa-Todo. Full recompute
per bond is O(n^2 d^2) contractions per sweep — embarrassingly batched, no
cache invalidation logic.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from peps_tpu.contraction.pbc import contract_pbc
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.suwa_todo import suwa_todo_pick
from peps_tpu.montecarlo.sweep import SweepStats, UpdateRule
from peps_tpu.tps import project


def _all_nn_bonds(ly, lx):
    h = [[y, x, y, (x + 1) % lx] for y in range(ly) for x in range(lx)]
    v = [[y, x, (y + 1) % ly, x] for y in range(ly) for x in range(lx)]
    return np.array(h + v, dtype=np.int32)


def mc_sweep_pbc(tps, config, key, chi: int, trunc: TruncParams,
                 rule: UpdateRule):
    """One full sweep over all PBC NN bonds. Returns (config', key', stats)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    bonds = jnp.asarray(_all_nn_bonds(ly, lx))
    cmask = rule.mask_array(d)

    pp, qq = jnp.meshgrid(jnp.arange(d), jnp.arange(d), indexing="ij")
    pq = jnp.stack([pp.reshape(-1), qq.reshape(-1)], axis=1)

    def bond_table(config, bond):
        tn = project(tps, config)

        def one(s):
            t = tn.at[bond[0], bond[1]].set(tps[bond[0], bond[1], s[0]])
            t = t.at[bond[2], bond[3]].set(tps[bond[2], bond[3], s[1]])
            mant, logw = contract_pbc(t, chi, trunc)
            return mant, logw

        mants, logws = jax.vmap(one)(pq)
        lmax = jnp.max(logws)
        return (mants * jnp.exp(logws - lmax)).reshape(d, d)

    def bond_step(carry, bond):
        config, key, acc, tri = carry
        key, k_pick = jax.random.split(key)
        table = bond_table(config, bond)
        c1 = config[bond[0], bond[1]]
        c2 = config[bond[2], bond[3]]
        cur_idx = (c1 * d + c2).astype(jnp.int32)
        if rule.mode == "exchange":
            psi_cur = table[c1, c2]
            psi_new = table[c2, c1]
            ratio2 = jnp.abs(psi_new) ** 2 / jnp.maximum(
                jnp.abs(psi_cur) ** 2, jnp.finfo(table.real.dtype).tiny)
            u = jax.random.uniform(k_pick, (), table.real.dtype)
            differ = c1 != c2
            accept = differ & (u < ratio2)
            new1 = jnp.where(accept, c2, c1)
            new2 = jnp.where(accept, c1, c2)
            acc = acc + accept.astype(jnp.int32)
            tri = tri + differ.astype(jnp.int32)
        else:
            w = jnp.abs(table.reshape(-1)) ** 2
            if cmask is not None:
                w = w * cmask[cur_idx].astype(w.dtype)
            new_idx = suwa_todo_pick(w, cur_idx, k_pick)
            new1 = (new_idx // d).astype(config.dtype)
            new2 = (new_idx % d).astype(config.dtype)
            acc = acc + (new_idx != cur_idx).astype(jnp.int32)
            tri = tri + 1
        config = config.at[bond[0], bond[1]].set(new1)
        config = config.at[bond[2], bond[3]].set(new2)
        return (config, key, acc, tri), None

    init = (config, key, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    (config, key, acc, tri), _ = jax.lax.scan(bond_step, init, bonds)
    return config, key, SweepStats(acc, tri)
