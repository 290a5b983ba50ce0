"""Monte Carlo sweep: sequential in-chain bond updates with environment reuse.

TPU re-design of the reference sweep updaters
(`vmc_basic/configuration_update_strategies/square_nn_updater.h:26-81`,
`monte_carlo_engine.h:180`): the same environment-reuse schedule (bottom
stack precomputed; top boundary grown row by row with the *updated* rows;
per-row right BTens from the pre-update row; left BTen carried through the
bond scan) — but expressed as nested `lax.scan`s over rows/bonds so the whole
sweep jit-compiles once and `vmap`s over thousands of chains (replacing MPI
rank walkers).

Because a projected site tensor is always tps[y, x, c], updating a site means
updating only its CONFIG value — the scans carry integers, not tensors.

A sweep does horizontal bonds (row pass) then vertical bonds (same kernel on
the diagonal-reflected lattice). Update rules:
* "exchange": swap the two site values if different, Metropolis accept
  (reference MCUpdateSquareNNExchange, square_nn_updater.h:142).
* "suwa_todo": rejection-free pick over all d^2 two-site states, optionally
  masked by a conservation table (covers MCUpdateSquareNNFullSpaceUpdate and
  the Hubbard U1xU1 updater, square_hubbard_u1u1_updater.h:30-45).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.contraction import bmps
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.suwa_todo import suwa_todo_pick
from peps_tpu.tps import project


@dataclasses.dataclass(frozen=True)
class UpdateRule:
    """mode: 'exchange' or 'suwa_todo'. conserve_mask: optional static
    [d*d, d*d] 0/1 table of allowed (current-pair -> new-pair) transitions
    applied in suwa_todo mode."""
    mode: str = "exchange"
    conserve_mask: tuple | None = None  # hashable static; converted lazily

    def mask_array(self, d):
        if self.conserve_mask is None:
            return None
        import numpy as np
        return jnp.asarray(np.array(self.conserve_mask).reshape(d * d, d * d))


def _project_row(tps_row: jnp.ndarray, cfg_row: jnp.ndarray) -> jnp.ndarray:
    """tps_row: [Lx, d, u,l,d,r], cfg_row: [Lx] -> [Lx, u,l,d,r]."""
    idx = cfg_row[:, None, None, None, None, None]
    return jnp.take_along_axis(tps_row, idx, axis=1).squeeze(1)


def _right_btens(top, bot, row, dtype):
    """Right BTens [Lx+1, chi, D, chi] of a row sandwich (normalized)."""
    chi, dv = top.shape[1], row.shape[1]
    rdt = row.real.dtype if jnp.iscomplexobj(row) else row.dtype
    init = jnp.zeros((chi, dv, chi), dtype).at[0, 0, 0].set(1.0)

    def step(env, xs):
        t_x, s_x, b_x = xs
        new = bmps._col_transfer_right(env, t_x, s_x, b_x)
        n = jnp.maximum(jnp.linalg.norm(new), jnp.finfo(rdt).tiny)
        new = new / n
        return new, new

    _, rs = jax.lax.scan(step, init, (top, row, bot), reverse=True)
    return jnp.concatenate([rs, init[None]], axis=0)


def _pair_table(lenv, renv, t1, t2, b1, b2, cands1, cands2):
    """Amplitude table [K1, K2] for a horizontal pair with shared envs."""
    h1 = jnp.einsum("alc,auA->luAc", lenv, t1)
    h1 = jnp.einsum("luAc,kuldr->kdArc", h1, cands1)
    h1 = jnp.einsum("kdArc,cdC->kArC", h1, b1)
    h2 = jnp.einsum("ArC,auA->urCa", renv, t2)
    h2 = jnp.einsum("urCa,juldr->jdCla", h2, cands2)
    h2 = jnp.einsum("jdCla,cdC->jalc", h2, b2)
    return jnp.einsum("kABC,jABC->kj", h1, h2)


class SweepStats(NamedTuple):
    accepted: jnp.ndarray
    trials: jnp.ndarray


def _sweep_rows(tps, config, key, chi, trunc: TruncParams, rule: UpdateRule):
    """One pass over all horizontal bonds. Returns (config', key', stats)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    dtype = tps.dtype
    tn = project(tps, config)
    # bottom environment stack from the pre-sweep network (rows below the
    # current row are untouched when we reach it, so these stay valid).
    fstacks, _ = bmps.all_top_envs(bmps.flip_vertical(tn), chi, trunc)
    bots = fstacks[::-1]       # bots[y] closes rows y..Ly-1
    cmask = rule.mask_array(d)

    def bond_step(carry, xs):
        lenv, c_cur, key, acc, tri = carry
        t1, b1, t2, b2, renv, cands1, cands2, c2 = xs
        key, k_pick = jax.random.split(key)
        table = _pair_table(lenv, renv, t1, t2, b1, b2, cands1, cands2)
        cur_idx = (c_cur * d + c2).astype(jnp.int32)
        if rule.mode == "exchange":
            psi_cur = table[c_cur, c2]
            psi_new = table[c2, c_cur]
            ratio2 = jnp.abs(psi_new) ** 2 / jnp.maximum(
                jnp.abs(psi_cur) ** 2, jnp.finfo(table.real.dtype).tiny)
            u = jax.random.uniform(k_pick, (), table.real.dtype)
            differ = c_cur != c2
            accept = differ & (u < ratio2)
            new1 = jnp.where(accept, c2, c_cur)
            new2 = jnp.where(accept, c_cur, c2)
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
        s1_new = cands1[new1]
        lenv = bmps._col_transfer_left(lenv, t1, s1_new, b1)
        n = jnp.maximum(jnp.linalg.norm(lenv),
                        jnp.finfo(lenv.real.dtype).tiny)
        lenv = lenv / n
        return (lenv, new2, key, acc, tri), new1

    def row_step(carry, xs):
        top, key = carry
        tps_row, cfg_row, bot = xs
        tn_row = _project_row(tps_row, cfg_row)
        rights = _right_btens(top, bot, tn_row, dtype)
        chi_ = top.shape[1]
        l0 = jnp.zeros((chi_, tn_row.shape[1], chi_), dtype).at[0, 0, 0].set(1.0)
        key, k_row = jax.random.split(key)
        init = (l0, cfg_row[0], k_row, jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32))
        xs_in = (top[:lx - 1], bot[:lx - 1], top[1:], bot[1:], rights[2:],
                 tps_row[:lx - 1], tps_row[1:], cfg_row[1:])
        (l_f, c_last, _, acc, tri), new_heads = jax.lax.scan(bond_step, init, xs_in)
        new_cfg = jnp.concatenate([new_heads, c_last[None]])
        tn_row_new = _project_row(tps_row, new_cfg)
        res = bmps.absorb_row(top, tn_row_new, chi, trunc)
        return (res.bmps, key), (new_cfg, acc, tri)

    top0 = bmps.init_boundary(lx, chi, tps.shape[3], dtype)
    (_, key), (new_config, accs, tris) = jax.lax.scan(
        row_step, (top0, key), (tps, config, bots[1:]))
    return new_config, key, SweepStats(jnp.sum(accs), jnp.sum(tris))


def mc_sweep(tps, tps_t, config, key, chi, trunc: TruncParams,
             rule: UpdateRule):
    """One full MC sweep: horizontal bonds then vertical bonds (via the
    diagonal-reflected lattice). tps_t = transpose_tps(tps) (precomputed).

    Returns (config', key', SweepStats)."""
    config, key, st_h = _sweep_rows(tps, config, key, chi, trunc, rule)
    cfg_t, key, st_v = _sweep_rows(tps_t, config.T, key, chi, trunc, rule)
    config = cfg_t.T
    return config, key, SweepStats(st_h.accepted + st_v.accepted,
                                   st_h.trials + st_v.trials)
