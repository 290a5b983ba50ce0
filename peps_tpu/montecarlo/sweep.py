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
import numpy as np

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


def _right_blocks(rights, top, bot, cands):
    """Right candidate blocks of every bond in a row, batched:
    rblk[x, j, a, l, c] = renv[x+2] * top[x+1] * cands[x+1, j] * bot[x+1].
    Precomputing these halves the sequential per-bond op count — the bond
    scan then does only the left chain + one dot (the left chain's
    candidate slice doubles as the accepted-site env transfer)."""
    h2 = jnp.einsum("xArC,xauA->xurCa", rights[2:], top[1:])
    h2 = jnp.einsum("xurCa,xjuldr->xjdCla", h2, cands[1:])
    return jnp.einsum("xjdCla,xcdC->xjalc", h2, bot[1:])


class SweepStats(NamedTuple):
    accepted: jnp.ndarray
    trials: jnp.ndarray


def _sweep_rows(tps, config, key, chi, trunc: TruncParams, rule: UpdateRule,
                dress=None, bots=None):
    """One pass over all horizontal bonds. Returns (config', key', stats).

    dress: optional JastrowDress — amplitude ratios pick up the dress factor
    (reference: Jastrow-dressed t-J exchange, square_nn_updater.h:380).
    bots: optional precomputed bottom env stack [Ly+1, Lx, chi, D, chi] of
    the PRE-sweep network (e.g. the evaluator's stacks.bots from the same
    configuration — saves Ly BMPS absorbs per sweep)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    dtype = tps.dtype
    tn = project(tps, config)
    if bots is None:
        # bottom environment stack from the pre-sweep network (rows below
        # the current row are untouched when we reach it, so these stay
        # valid).
        fstacks, _ = bmps.all_top_envs(bmps.flip_vertical(tn), chi, trunc)
        bots = fstacks[::-1]   # bots[y] closes rows y..Ly-1
    cmask = rule.mask_array(d)
    if dress is not None:
        nv = dress.nvals
        field0 = dress.v @ nv[config].reshape(-1)   # F_i = sum_j v_ij n_j

    def bond_step(carry, xs):
        lenv, c_cur, field, key, acc, tri = carry
        t1, b1, rblk, cands1, c2, i1 = xs
        i2 = i1 + 1
        key, k_pick = jax.random.split(key)
        # left chain over all first-site candidates; the accepted slice IS
        # the transferred left env (no separate transfer contraction)
        h1 = jnp.einsum("alc,auA->luAc", lenv, t1)
        h1 = jnp.einsum("luAc,kuldr->kdArc", h1, cands1)
        h1 = jnp.einsum("kdArc,cdC->kArC", h1, b1)
        table = jnp.einsum("kABC,jABC->kj", h1, rblk)
        if dress is not None:
            n1, n2 = nv[c_cur], nv[c2]
            v12 = dress.v[i1, i2]
            f1 = field[i1] - v12 * n2
            f2 = field[i2] - v12 * n1
            d1 = nv[:, None] - n1          # [d, 1]
            d2 = nv[None, :] - n2          # [1, d]
            dlog = (-d1 * f1 - d2 * f2
                    - v12 * ((n1 + d1) * (n2 + d2) - n1 * n2))
            table = table * jnp.exp(dlog).astype(table.dtype)
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
        if dress is not None:
            field = field + dress.v[:, i1] * (nv[new1] - nv[c_cur])                 + dress.v[:, i2] * (nv[new2] - nv[c2])
        lenv = h1[new1]
        n = jnp.maximum(jnp.linalg.norm(lenv),
                        jnp.finfo(lenv.real.dtype).tiny)
        lenv = lenv / n
        return (lenv, new2, field, key, acc, tri), new1

    def row_step(carry, xs):
        top, key, field = carry
        tps_row, cfg_row, bot, y = xs
        tn_row = _project_row(tps_row, cfg_row)
        rights = _right_btens(top, bot, tn_row, dtype)
        chi_ = top.shape[1]
        l0 = jnp.zeros((chi_, tn_row.shape[1], chi_), dtype).at[0, 0, 0].set(1.0)
        key, k_row = jax.random.split(key)
        init = (l0, cfg_row[0], field, k_row, jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32))
        rblks = _right_blocks(rights, top, bot, tps_row)
        xs_in = (top[:lx - 1], bot[:lx - 1], rblks,
                 tps_row[:lx - 1], cfg_row[1:],
                 y * lx + jnp.arange(lx - 1))
        (l_f, c_last, field, _, acc, tri), new_heads = jax.lax.scan(
            bond_step, init, xs_in)
        new_cfg = jnp.concatenate([new_heads, c_last[None]])
        tn_row_new = _project_row(tps_row, new_cfg)
        res = bmps.absorb_row(top, tn_row_new, chi, trunc)
        return (res.bmps, key, field), (new_cfg, acc, tri)

    top0 = bmps.init_boundary(lx, chi, tps.shape[3], dtype)
    field_init = field0 if dress is not None else jnp.zeros((ly * lx,), dtype)
    (_, key, _), (new_config, accs, tris) = jax.lax.scan(
        row_step, (top0, key, field_init),
        (tps, config, bots[1:], jnp.arange(ly)))
    return new_config, key, SweepStats(jnp.sum(accs), jnp.sum(tris))


def _transpose_dress(dress, ly, lx):
    if dress is None:
        return None
    import numpy as _np
    perm = _np.arange(ly * lx).reshape(ly, lx).T.reshape(-1)
    v_t = dress.v[jnp.asarray(perm)][:, jnp.asarray(perm)]
    return type(dress)(v_t, dress.nvals)


def mc_sweep(tps, tps_t, config, key, chi, trunc: TruncParams,
             rule: UpdateRule, dress=None, bots=None):
    """One full MC sweep: horizontal bonds then vertical bonds (via the
    diagonal-reflected lattice). tps_t = transpose_tps(tps) (precomputed).
    Optional Jastrow dress multiplies all amplitude ratios. bots: optional
    precomputed bottom env stack of the pre-sweep network (see _sweep_rows).

    Returns (config', key', SweepStats)."""
    ly, lx = config.shape
    config, key, st_h = _sweep_rows(tps, config, key, chi, trunc, rule, dress,
                                    bots=bots)
    dress_t = _transpose_dress(dress, ly, lx)
    cfg_t, key, st_v = _sweep_rows(tps_t, config.T, key, chi, trunc, rule,
                                   dress_t)
    config = cfg_t.T
    return config, key, SweepStats(st_h.accepted + st_v.accepted,
                                   st_h.trials + st_v.trials)


# ---------------------------------------------------------------------------
# 3-site TNN cyclic-exchange pass (reference: square_3site_updater.h —
# permutation updates over three consecutive sites, needed for ergodicity of
# models with third-neighbour / ring terms).
# ---------------------------------------------------------------------------

_PERMS3 = np.array([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                    [1, 2, 0], [2, 0, 1], [2, 1, 0]], dtype=np.int32)


def _sweep_rows_3site(tps, config, key, chi, trunc: TruncParams):
    """One pass of Suwa-Todo permutation updates over all horizontal 3-site
    windows. Returns (config', key', stats)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    if lx < 3:
        return config, key, SweepStats(jnp.zeros((), jnp.int32),
                                       jnp.zeros((), jnp.int32))
    dtype = tps.dtype
    tn = project(tps, config)
    fstacks, _ = bmps.all_top_envs(bmps.flip_vertical(tn), chi, trunc)
    bots = fstacks[::-1]
    perms = jnp.asarray(_PERMS3)

    def window_table(lenv, renv, tops3, bots3, cands3, cand_vals):
        """Amplitudes of the candidate value-triples over the window."""
        def one_scaled(v):
            e = lenv
            logw = jnp.zeros((), lenv.real.dtype)
            for i in range(3):
                site = cands3[i][v[i]]
                e = bmps._col_transfer_left(e, tops3[i], site, bots3[i])
                n = jnp.maximum(jnp.linalg.norm(e),
                                jnp.finfo(e.real.dtype).tiny)
                e = e / n
                logw = logw + jnp.log(n)
            amp = jnp.einsum("alc,alc->", e, renv)
            return amp, logw

        amps, logws = jax.vmap(one_scaled)(cand_vals)
        lmax = jnp.max(logws)
        return amps * jnp.exp(logws - lmax)

    def win_step(carry, xs):
        lenv, v2, v3, key, acc, tri = carry
        t3, b3, renv, c3_in, cands1, cands2, cands3 = xs
        key, k_pick = jax.random.split(key)
        vals = jnp.stack([v2, v3, c3_in])
        # Suwa-Todo precondition: the state list must have a FIXED order
        # independent of the current arrangement (suwa_todo_update.h
        # preconditions). Enumerate permutations of the SORTED multiset and
        # zero duplicate configurations.
        vals_sorted = jnp.sort(vals)
        cand_vals = vals_sorted[perms]                    # [6, 3]
        dup = jnp.zeros((6,), bool)
        for i in range(1, 6):
            same = jnp.any(jnp.all(cand_vals[:i] == cand_vals[i][None, :],
                                   axis=1))
            dup = dup.at[i].set(same)
        amps = window_table(lenv, renv, t3, b3,
                            (cands1, cands2, cands3), cand_vals)
        w = jnp.abs(amps) ** 2 * (1.0 - dup.astype(amps.real.dtype))
        cur_match = jnp.all(cand_vals == vals[None, :], axis=1) & (~dup)
        cur_idx = jnp.argmax(cur_match).astype(jnp.int32)
        new_idx = suwa_todo_pick(w, cur_idx, k_pick)
        new_vals = cand_vals[new_idx]
        acc = acc + (new_idx != cur_idx).astype(jnp.int32)
        tri = tri + 1
        s_new = cands1[new_vals[0]]
        lenv = bmps._col_transfer_left(lenv, t3[0], s_new, b3[0])
        n = jnp.maximum(jnp.linalg.norm(lenv), jnp.finfo(lenv.real.dtype).tiny)
        lenv = lenv / n
        return (lenv, new_vals[1], new_vals[2], key, acc, tri), new_vals[0]

    def row_step(carry, xs):
        top_bmps, key = carry
        tps_row, cfg_row, bot = xs
        tn_row = _project_row(tps_row, cfg_row)
        rights = _right_btens(top_bmps, bot, tn_row, dtype)
        chi_ = top_bmps.shape[1]
        l0 = jnp.zeros((chi_, tn_row.shape[1], chi_), dtype).at[0, 0, 0].set(1.0)
        key, k_row = jax.random.split(key)
        nwin = lx - 2
        t3 = jnp.stack([top_bmps[:nwin], top_bmps[1:nwin + 1],
                        top_bmps[2:nwin + 2]], axis=1)   # [nwin, 3, ...]
        b3 = jnp.stack([bot[:nwin], bot[1:nwin + 1], bot[2:nwin + 2]], axis=1)
        xs_in = (t3, b3, rights[3:],
                 cfg_row[2:],
                 tps_row[:nwin], tps_row[1:nwin + 1], tps_row[2:nwin + 2])
        init = (l0, cfg_row[0], cfg_row[1], k_row,
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (l_f, v2, v3, _, acc, tri), heads = jax.lax.scan(win_step, init, xs_in)
        new_cfg = jnp.concatenate([heads, v2[None], v3[None]])
        tn_row_new = _project_row(tps_row, new_cfg)
        res = bmps.absorb_row(top_bmps, tn_row_new, chi, trunc)
        return (res.bmps, key), (new_cfg, acc, tri)

    top0 = bmps.init_boundary(lx, chi, tps.shape[3], dtype)
    (_, key), (new_config, accs, tris) = jax.lax.scan(
        row_step, (top0, key), (tps, config, bots[1:]))
    return new_config, key, SweepStats(jnp.sum(accs), jnp.sum(tris))


def mc_sweep_3site(tps, tps_t, config, key, chi, trunc: TruncParams):
    """Full 3-site permutation sweep: horizontal + vertical windows."""
    config, key, st_h = _sweep_rows_3site(tps, config, key, chi, trunc)
    cfg_t, key, st_v = _sweep_rows_3site(tps_t, config.T, key, chi, trunc)
    return cfg_t.T, key, SweepStats(st_h.accepted + st_v.accepted,
                                    st_h.trials + st_v.trials)
