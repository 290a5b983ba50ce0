"""Environment-shared MC sweep for graded fermionic states.

Replaces the O(N^2) full-recompute-per-bond sweep (fermion/vmc.py
mc_sweep_fermion) with the bosonic sweep's O(N) shared-environment
schedule (reference: MCUpdateSquareNNExchangeOBC env reuse,
square_nn_updater.h:26-81), adapted to the dressed-projection amplitude
(fermion/convert.py). Exchange moves only — they conserve every occupation
number, so the reference's particle-conserving fermionic updaters are
covered.

Why shared environments are sound here (the same snake-interval analysis as
fermion/tables.py): an exchange at a bond changes the snake prefix parity Pi
only on the interval between its two sites.

* Horizontal bonds are snake-adjacent: the interval is empty, and the pair's
  parity change cancels for every later site. Within a row scan (run in
  snake direction), the only bookkeeping is a carried flag g = the prefix
  flip at the current site caused by already-finalized sites of the row.
  Sites right of the bond keep their pass-start dressing in BOTH the
  current and the proposed state (the finalized prefix plus the displaced
  carry value is a permutation of the pass-start values), so ONE normal
  right-env stack closes every proposal.
* Vertical bonds (y,x)-(y+1,x): the interval is one full side of the
  two-row window (right of x for even y, left for odd y). A scan in snake
  direction carries one global pending flag g (each accepted exchange
  toggles it); the right stacks are the two-row envs of the normal and
  flip-masked pair rows.

Odd snake rows are handled by reflecting the row (pair) in x — reflection
maps the R->L snake frame onto the L->R kernel — and reflecting results
back.

Per-bond PRNG keys are fold_in-derived from (pass, y, x) so the
full-recompute oracle can replay the identical trajectory
(tests/test_fermion_sweep.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.algorithm.energy import _pair_row_envs
from peps_tpu.contraction import bmps
from peps_tpu.fermion.convert import fermion_project
from peps_tpu.fermion.peps import FermionSpace
from peps_tpu.fermion.tables import fermion_candidates, fermion_flip_mask
from peps_tpu.montecarlo.sweep import SweepStats


def _norm1(x, rdt):
    return x / jnp.maximum(jnp.linalg.norm(x), jnp.finfo(rdt).tiny)


def _refl_site(c):
    """Reflect site/candidate tensors in x and swap their l/r legs.
    Works for [..., u, l, d, r] trailing axes with x as axis 0."""
    return jnp.flip(jnp.swapaxes(c, -3, -1), 0)


def _refl_bmps(b):
    """Reflect a boundary MPS [Lx, a, v, b] in x (swap the chain axes)."""
    return jnp.flip(b, 0).transpose(0, 3, 2, 1)


def _right_btens_logs(top, bot, row, dtype):
    """Right single-row BTens [Lx+1, chi, D, chi] + accumulated log norms
    [Lx+1] (log of the factor scaled out of env x; logs[x] applies to
    envs[x])."""
    chi, dv = top.shape[1], row.shape[1]
    rdt = row.real.dtype if jnp.iscomplexobj(row) else row.dtype
    init = jnp.zeros((chi, dv, chi), dtype).at[0, 0, 0].set(1.0)
    zero = jnp.zeros((), rdt)

    def step(carry, xs):
        env, lw = carry
        t_x, s_x, b_x = xs
        new = bmps._col_transfer_right(env, t_x, s_x, b_x)
        n = jnp.maximum(jnp.linalg.norm(new), jnp.finfo(rdt).tiny)
        out = (new / n, lw + jnp.log(n))
        return out, out

    _, (rs, lws) = jax.lax.scan(step, (init, zero), (top, row, bot),
                                reverse=True)
    envs = jnp.concatenate([rs, init[None]], axis=0)
    logs = jnp.concatenate([lws, zero[None]])
    return envs, logs


def _bond_key(key, pass_id, y, x):
    return jax.random.fold_in(
        jax.random.fold_in(jax.random.fold_in(key, pass_id), y), x)


def _h_row_kernel(top, bot, cands, cfg0, pi_d, key, y, chi, trunc,
                  jrow=None):
    """One snake-direction (L->R frame) horizontal-bond pass over a row.

    top/bot: boundary rows [Lx, chi, D, chi]; cands: [Lx, d, 2, u,l,d,r]
    dressed candidates vs the CURRENT config; cfg0: row values at pass
    start [Lx]. jrow: optional Jastrow
    data (nvals [d], field0 [Lx] at this row's sites, vrow [Lx, Lx] the
    dress matrix restricted to this row, in kernel position order).
    Returns (new_cfg, new_top, acc, tri)."""
    lx = cands.shape[0]
    dtype = cands.dtype
    rdt = cands.real.dtype if jnp.iscomplexobj(cands) else dtype
    row_n = jnp.take_along_axis(
        cands[:, :, 0], cfg0[:, None, None, None, None, None],
        axis=1).squeeze(1)                                # current, flag 0
    # ONE right stack suffices: an in-row exchange permutes values within
    # the snake prefix of every site right of the bond, so the prefix
    # parity there is INVARIANT — identical for the current and proposed
    # states (and equal to its pass-start value, since sites > bond still
    # hold cfg0 values). Selecting a flip-masked stack per proposal was the
    # round-3 sampler bug: parity-changing exchanges (hole hops) got
    # acceptance ratios from mismatched environments.
    rights_n, _ = _right_btens_logs(top, bot, row_n, dtype)
    pi0 = pi_d[cfg0]                                      # [Lx]

    chi_ = top.shape[1]
    l0 = jnp.zeros((chi_, row_n.shape[1], chi_), dtype).at[0, 0, 0].set(1.0)

    def close2(lenv, t1, s1, b1, t2, s2, b2, renv):
        e = bmps._col_transfer_left(lenv, t1, s1, b1)
        e = bmps._col_transfer_left(e, t2, s2, b2)
        return jnp.sum(e * renv)

    if jrow is not None:
        nvals, field0, vrow = jrow
    else:
        nvals = field0 = vrow = None

    def bond_step(carry, xs):
        lenv, c_cur, g_cur, field, acc, tri = carry
        t1, b1, t2, b2, rn, cands1, cands2, c2, p0_1, x = xs
        k = _bond_key(key, 0, y, x)
        # pj_cur = g_cur ^ (pi(c_cur) ^ pi0[x]) is identically 0: the
        # finalized sites plus the displaced c_cur are a permutation of the
        # pass-start values on sites 0..x. Site2's current flag is 0 and
        # the right env is the normal stack for BOTH states.
        pj_new = g_cur ^ (pi_d[c2].astype(jnp.int32) ^ p0_1)
        s1_cur = cands1[c_cur, g_cur]
        s2_cur = cands2[c2, 0]
        s1_new = cands1[c2, g_cur]
        s2_new = cands2[c_cur, pj_new]
        psi_cur = close2(lenv, t1, s1_cur, b1, t2, s2_cur, b2, rn)
        psi_new = close2(lenv, t1, s1_new, b1, t2, s2_new, b2, rn)
        ratio2 = (jnp.abs(psi_new) ** 2
                  / jnp.maximum(jnp.abs(psi_cur) ** 2, jnp.finfo(rdt).tiny))
        if jrow is not None:
            # exchange (a, b) -> (b, a) at kernel positions (x, x+1):
            # dlogJ = -delta (F_i - F_j) + delta^2 v_ij  (J = -1/2 nVn)
            delta = nvals[c2] - nvals[c_cur]
            dlog = (-delta * (field[x] - field[x + 1])
                    + delta * delta * vrow[x, x + 1])
            ratio2 = ratio2 * jnp.exp(2.0 * dlog)
        u = jax.random.uniform(k, (), rdt)
        differ = c_cur != c2
        accept = differ & (u < ratio2)
        new1 = jnp.where(accept, c2, c_cur)
        new2 = jnp.where(accept, c_cur, c2)
        acc = acc + accept.astype(jnp.int32)
        tri = tri + differ.astype(jnp.int32)
        if jrow is not None:
            delta_acc = jnp.where(accept, nvals[c2] - nvals[c_cur], 0.0)
            field = field + delta_acc * (vrow[:, x] - vrow[:, x + 1])
        lenv = _norm1(bmps._col_transfer_left(lenv, t1, cands1[new1, g_cur],
                                              b1), rdt)
        g_next = g_cur ^ (pi_d[new1].astype(jnp.int32) ^ p0_1)
        return (lenv, new2, g_next, field, acc, tri), (new1, g_cur)

    xs = (top[:lx - 1], bot[:lx - 1], top[1:], bot[1:],
          rights_n[2:],
          cands[:lx - 1], cands[1:], cfg0[1:],
          pi0[:lx - 1].astype(jnp.int32), jnp.arange(lx - 1))
    field_init = field0 if jrow is not None else jnp.zeros((lx,), rdt)
    init = (l0, cfg0[0], jnp.zeros((), jnp.int32), field_init,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    (_, c_last, g_last, _, acc, tri), (heads, flags) = jax.lax.scan(
        bond_step, init, xs)
    new_cfg = jnp.concatenate([heads, c_last[None]])
    flags_all = jnp.concatenate([flags, g_last[None]])
    # final dressed row (values + final flags) -> absorb into the top stack
    row_new = jnp.take_along_axis(
        cands, new_cfg[:, None, None, None, None, None, None],
        axis=1).squeeze(1)
    row_new = jnp.take_along_axis(
        row_new, flags_all[:, None, None, None, None, None],
        axis=1).squeeze(1)
    res = bmps.absorb_row(top, row_new, chi, trunc)
    return new_cfg, res.bmps, acc, tri


def _v_pair_kernel(top, bot, cands1, cands2, cfg1, cfg2, pi_d, key, y,
                   flip1, flip2, jwin=None):
    """One snake-direction (L->R frame) vertical-bond pass over a row pair.

    cands1/cands2: [Lx, d, 2, u,l,d,r] dressed candidates of the two rows vs
    the current config; cfg1/cfg2: current values. jwin: optional Jastrow
    data (nvals [d], field0 [2*Lx] over (row1 ++ row2) window sites, vwin
    [2Lx, 2Lx]). Returns (new_cfg1, new_cfg2, row1_final, acc, tri) —
    row1_final is the finalized dressed upper row for the caller's top
    absorb."""
    lx, d = cands1.shape[0], cands1.shape[1]
    dtype = cands1.dtype
    rdt = cands1.real.dtype if jnp.iscomplexobj(cands1) else dtype
    chi = top.shape[1]
    dv = cands1.shape[-1]

    def take(c, vals, flags):
        out = jnp.take_along_axis(
            c, vals[:, None, None, None, None, None, None],
            axis=1).squeeze(1)
        return jnp.take_along_axis(
            out, flags[:, None, None, None, None, None], axis=1).squeeze(1)

    zeros = jnp.zeros((lx,), jnp.int32)
    ones = jnp.ones((lx,), jnp.int32)
    row1_n = take(cands1, cfg1, zeros)
    row2_n = take(cands2, cfg2, zeros)
    row1_f = row1_n * flip1
    row2_f = row2_n * flip2
    _, rights_n, _, lw_n = _pair_row_envs(top, bot, row1_n, row2_n, dtype,
                                          with_logs=True)
    _, rights_f, _, lw_f = _pair_row_envs(top, bot, row1_f, row2_f, dtype,
                                          with_logs=True)
    rn = rights_n.reshape(lx + 1, chi, dv * dv, chi)
    rf = rights_f.reshape(lx + 1, chi, dv * dv, chi)

    l0 = jnp.zeros((chi, dv * dv, chi), dtype).at[0, 0, 0].set(1.0)

    def fuse2(s1, s2):
        s = jnp.einsum("umdr,dnef->umnerf", s1, s2)
        return s.reshape(dv, dv * dv, dv, dv * dv)

    def close1(lenv, t_x, sf, b_x, renv):
        e = bmps._col_transfer_left(lenv, t_x, sf, b_x)
        return jnp.sum(e * renv)

    if jwin is not None:
        nvals, field0, vwin = jwin
    else:
        nvals = field0 = vwin = None

    def bond_step(carry, xs):
        lenv, g, field, acc, tri = carry
        t_x, b_x, rn1, rf1, lwn1, lwf1, c1s, c2s, s1v, s2v, x = xs
        k = _bond_key(key, 1, y, x)
        f = pi_d[s1v].astype(jnp.int32) ^ pi_d[s2v].astype(jnp.int32)
        gj_new = g ^ f
        sf_cur = fuse2(c1s[s1v, g], c2s[s2v, g])
        sf_new = fuse2(c1s[s2v, g], c2s[s1v, gj_new])
        r_cur = jnp.where(g == 1, rf1, rn1)
        r_new = jnp.where(gj_new == 1, rf1, rn1)
        lw_cur = jnp.where(g == 1, lwf1, lwn1)
        lw_new = jnp.where(gj_new == 1, lwf1, lwn1)
        psi_cur = close1(lenv, t_x, sf_cur, b_x, r_cur)
        psi_new = close1(lenv, t_x, sf_new, b_x, r_new)
        ratio2 = (jnp.abs(psi_new) ** 2
                  / jnp.maximum(jnp.abs(psi_cur) ** 2, jnp.finfo(rdt).tiny)
                  * jnp.exp(2.0 * (lw_new - lw_cur)))
        if jwin is not None:
            delta = nvals[s2v] - nvals[s1v]
            dlog = (-delta * (field[x] - field[lx + x])
                    + delta * delta * vwin[x, lx + x])
            ratio2 = ratio2 * jnp.exp(2.0 * dlog)
        u = jax.random.uniform(k, (), rdt)
        differ = s1v != s2v
        accept = differ & (u < ratio2)
        v1 = jnp.where(accept, s2v, s1v)
        v2 = jnp.where(accept, s1v, s2v)
        g_new = jnp.where(accept, gj_new, g)
        acc = acc + accept.astype(jnp.int32)
        tri = tri + differ.astype(jnp.int32)
        if jwin is not None:
            delta_acc = jnp.where(accept, nvals[s2v] - nvals[s1v], 0.0)
            field = field + delta_acc * (vwin[:, x] - vwin[:, lx + x])
        lenv = _norm1(bmps._col_transfer_left(
            lenv, t_x, fuse2(c1s[v1, g], c2s[v2, g_new]), b_x), rdt)
        return (lenv, g_new, field, acc, tri), (v1, v2, g)

    xs = (top, bot, rn[1:], rf[1:], lw_n[1:], lw_f[1:],
          cands1, cands2, cfg1, cfg2, jnp.arange(lx))
    field_init = field0 if jwin is not None else jnp.zeros((2 * lx,), rdt)
    init = (l0, jnp.zeros((), jnp.int32), field_init,
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    (_, _, _, acc, tri), (v1s, v2s, g1s) = jax.lax.scan(bond_step, init, xs)
    row1_final = take(cands1, v1s, g1s)
    return v1s, v2s, row1_final, acc, tri


def mc_sweep_fermion_shared(tps, space: FermionSpace, config, key, chi,
                            trunc, dress=None):
    """One full env-shared MC sweep (all horizontal bonds row by row, then
    all vertical bonds pair by pair), exchange moves. Drop-in replacement
    for the full-recompute mc_sweep_fermion: returns (config', key',
    SweepStats). Cost structure matches the bosonic mc_sweep (one boundary
    descent + O(1) contractions per bond) with a ~2x constant from the
    normal+flipped env stacks.

    dress: optional JastrowDress — every exchange ratio picks up the
    density-Jastrow factor via a carried field (reference: the dressed
    t-J updater, square_nn_updater.h:380)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    dtype = tps.dtype
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype
    pi_d = jnp.asarray(np.asarray(space.phys_parity), jnp.int32)
    ids = jnp.arange(ly * lx).reshape(ly, lx)
    key, kh, kv = jax.random.split(key, 3)

    # ---- horizontal pass ----
    net0 = fermion_project(tps, config, space)
    fstacks, _ = bmps.all_top_envs(bmps.flip_vertical(net0), chi, trunc)
    bots_h = fstacks[::-1]
    top0 = bmps.init_boundary(lx, chi, tps.shape[-1], dtype)

    def h_row_step(carry, xs):
        top, config = carry
        y, bot = xs
        odd = y % 2 == 1
        cands_full = fermion_candidates(tps, config, space)
        cands = jax.lax.dynamic_index_in_dim(cands_full, y, 0,
                                             keepdims=False)
        cfg_row = jax.lax.dynamic_index_in_dim(config, y, 0, keepdims=False)
        top_u = jnp.where(odd, _refl_bmps(top), top)
        bot_u = jnp.where(odd, _refl_bmps(bot), bot)
        cands_u = jnp.where(odd, _refl_site(cands), cands)
        cfg_u = jnp.where(odd, cfg_row[::-1], cfg_row)
        jrow = None
        if dress is not None:
            field_full = dress.field(config).astype(rdt)
            sid = jax.lax.dynamic_index_in_dim(ids, y, 0, keepdims=False)
            sid = jnp.where(odd, sid[::-1], sid)
            jrow = (dress.nvals.astype(rdt), field_full[sid],
                    dress.v[sid][:, sid].astype(rdt))
        new_cfg, new_top, acc, tri = _h_row_kernel(
            top_u, bot_u, cands_u, cfg_u, pi_d, kh, y, chi, trunc, jrow)
        new_cfg = jnp.where(odd, new_cfg[::-1], new_cfg)
        new_top = jnp.where(odd, _refl_bmps(new_top), new_top)
        config = jax.lax.dynamic_update_index_in_dim(config, new_cfg, y, 0)
        return (new_top, config), (acc, tri)

    (_, config), (accs_h, tris_h) = jax.lax.scan(
        h_row_step, (top0, config), (jnp.arange(ly), bots_h[1:]))

    # ---- vertical pass ----
    acc_v = jnp.zeros((), jnp.int32)
    tri_v = jnp.zeros((), jnp.int32)
    if ly > 1:
        net1 = fermion_project(tps, config, space)
        fstacks, _ = bmps.all_top_envs(bmps.flip_vertical(net1), chi, trunc)
        bots_v = fstacks[::-1]

        def v_pair_step(carry, xs):
            top, config = carry
            y, bot = xs
            odd = y % 2 == 1
            cands_full = fermion_candidates(tps, config, space)
            flip_full = fermion_flip_mask(config, space, ly, lx, dtype)
            c1 = jax.lax.dynamic_index_in_dim(cands_full, y, 0,
                                              keepdims=False)
            c2 = jax.lax.dynamic_index_in_dim(cands_full, y + 1, 0,
                                              keepdims=False)
            f1 = jax.lax.dynamic_index_in_dim(flip_full, y, 0,
                                              keepdims=False)
            f2 = jax.lax.dynamic_index_in_dim(flip_full, y + 1, 0,
                                              keepdims=False)
            cfg1 = jax.lax.dynamic_index_in_dim(config, y, 0,
                                                keepdims=False)
            cfg2 = jax.lax.dynamic_index_in_dim(config, y + 1, 0,
                                                keepdims=False)
            top_u = jnp.where(odd, _refl_bmps(top), top)
            bot_u = jnp.where(odd, _refl_bmps(bot), bot)
            c1u = jnp.where(odd, _refl_site(c1), c1)
            c2u = jnp.where(odd, _refl_site(c2), c2)
            f1u = jnp.where(odd, _refl_site(f1), f1)
            f2u = jnp.where(odd, _refl_site(f2), f2)
            cfg1u = jnp.where(odd, cfg1[::-1], cfg1)
            cfg2u = jnp.where(odd, cfg2[::-1], cfg2)
            jwin = None
            if dress is not None:
                field_full = dress.field(config).astype(rdt)
                sid1 = jax.lax.dynamic_index_in_dim(ids, y, 0,
                                                    keepdims=False)
                sid2 = jax.lax.dynamic_index_in_dim(ids, y + 1, 0,
                                                    keepdims=False)
                sid1 = jnp.where(odd, sid1[::-1], sid1)
                sid2 = jnp.where(odd, sid2[::-1], sid2)
                w = jnp.concatenate([sid1, sid2])
                jwin = (dress.nvals.astype(rdt), field_full[w],
                        dress.v[w][:, w].astype(rdt))
            v1, v2, row1_final, acc, tri = _v_pair_kernel(
                top_u, bot_u, c1u, c2u, cfg1u, cfg2u, pi_d, kv, y, f1u, f2u,
                jwin)
            v1 = jnp.where(odd, v1[::-1], v1)
            v2 = jnp.where(odd, v2[::-1], v2)
            row1_final = jnp.where(odd, _refl_site(row1_final), row1_final)
            config = jax.lax.dynamic_update_index_in_dim(config, v1, y, 0)
            config = jax.lax.dynamic_update_index_in_dim(config, v2, y + 1,
                                                         0)
            res = bmps.absorb_row(top, row1_final, chi, trunc)
            return (res.bmps, config), (acc, tri)

        (_, config), (accs_v, tris_v) = jax.lax.scan(
            v_pair_step, (top0, config), (jnp.arange(ly - 1), bots_v[2:]))
        acc_v = jnp.sum(accs_v)
        tri_v = jnp.sum(tris_v)

    stats = SweepStats(jnp.sum(accs_h) + acc_v, jnp.sum(tris_h) + tri_v)
    return config, key, stats


def mc_sweep_fermion_oracle(tps, space: FermionSpace, config, key, chi,
                            trunc, dress=None):
    """Full-recompute replay of mc_sweep_fermion_shared's exact trajectory
    (same bond order and per-bond fold_in keys) — the equivalence oracle.
    Python-level, O(N^2); for tests only."""
    from peps_tpu.fermion.vmc import log_abs_psi_fermion

    ly, lx = config.shape
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype
    key, kh, kv = jax.random.split(key, 3)
    cfg = np.asarray(config).copy()
    acc = tri = 0

    def logpsi(c):
        la, _ = log_abs_psi_fermion(tps, jnp.asarray(c), space, chi, trunc)
        out = float(la)
        if dress is not None:
            out += float(dress.log_factor(jnp.asarray(c)))
        return out

    def try_bond(s1, s2, k):
        nonlocal cfg, acc, tri
        (y1, x1), (y2, x2) = s1, s2
        a, b = cfg[y1, x1], cfg[y2, x2]
        if a == b:
            return
        tri += 1
        cand = cfg.copy()
        cand[y1, x1], cand[y2, x2] = b, a
        ratio2 = np.exp(2.0 * (logpsi(cand) - logpsi(cfg)))
        u = float(jax.random.uniform(k, (), rdt))
        if u < ratio2:
            cfg = cand
            acc += 1

    for y in range(ly):
        for xp in range(lx - 1):
            k = _bond_key(kh, 0, y, xp)
            if y % 2 == 0:
                try_bond((y, xp), (y, xp + 1), k)
            else:
                # reflected frame: kernel position xp = original col lx-1-xp
                try_bond((y, lx - 1 - xp), (y, lx - 2 - xp), k)
    for y in range(ly - 1):
        for xp in range(lx):
            k = _bond_key(kv, 1, y, xp)
            x = xp if y % 2 == 0 else lx - 1 - xp
            try_bond((y, x), (y + 1, x), k)

    return jnp.asarray(cfg), key, SweepStats(jnp.asarray(acc, jnp.int32),
                                             jnp.asarray(tri, jnp.int32))


def mc_teleport_fermion(tps, space: FermionSpace, config, key, chi, trunc,
                        dress=None, n_props: int = 4):
    """Non-local bond-content teleport pass (graded states).

    Proposes swapping the 2-site CONTENTS of two random disjoint NN bonds
    (uniform symmetric proposal; Metropolis on the full amplitude ratio,
    dressed if `dress` is given). Motivation: umbrella-biased
    pair-correlation sampling (jastrow.hole_attraction_dress) binds the
    two t-J holes into one pair whose local diffusion is slow — bound-pair
    episodes decorrelate only over many sweeps, so biased support events
    are few INDEPENDENT visits and the reweighted estimator gains nothing.
    A teleport relocates the bound pair anywhere in one accepted move
    (both configs keep the pair bound, so amplitudes are comparable and
    acceptance is healthy), restoring independent support visits.

    No analogue in the reference (its MC kernels are local NN/TNN
    updaters); this is a TPU-side variance-reduction addition. Cost:
    n_props full amplitude evaluations (one BMPS contraction each).

    Returns (config', key', SweepStats)."""
    from peps_tpu.fermion.vmc import log_abs_psi_fermion

    ly, lx, _ = tps.shape[0], tps.shape[1], tps.shape[2]
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype
    # all NN bonds: horizontal then vertical, as (y1, x1, y2, x2)
    hb = [(y, x, y, x + 1) for y in range(ly) for x in range(lx - 1)]
    vb = [(y, x, y + 1, x) for y in range(ly - 1) for x in range(lx)]
    bonds = jnp.asarray(np.array(hb + vb, dtype=np.int32))
    nb = bonds.shape[0]

    def log_amp(c):
        la, _ = log_abs_psi_fermion(tps, c, space, chi, trunc)
        if dress is not None:
            la = la + dress.log_factor(c)
        return la

    def body(carry, k):
        config, acc, tri = carry
        k1, k2, ku = jax.random.split(k, 3)
        i = jax.random.randint(k1, (), 0, nb)
        j = jax.random.randint(k2, (), 0, nb)
        b1, b2 = bonds[i], bonds[j]
        # disjoint sites only (shared-site swaps are ill-defined)
        s11 = b1[0] * lx + b1[1]
        s12 = b1[2] * lx + b1[3]
        s21 = b2[0] * lx + b2[1]
        s22 = b2[2] * lx + b2[3]
        disjoint = ((s11 != s21) & (s11 != s22)
                    & (s12 != s21) & (s12 != s22))
        c11, c12 = config[b1[0], b1[1]], config[b1[2], b1[3]]
        c21, c22 = config[b2[0], b2[1]], config[b2[2], b2[3]]
        changed = (c11 != c21) | (c12 != c22)
        prop = config.at[b1[0], b1[1]].set(c21) \
                     .at[b1[2], b1[3]].set(c22) \
                     .at[b2[0], b2[1]].set(c11) \
                     .at[b2[2], b2[3]].set(c12)
        la0 = log_amp(config)
        la1 = log_amp(prop)
        ratio2 = jnp.exp(2.0 * (la1 - la0))
        u = jax.random.uniform(ku, (), rdt)
        ok = disjoint & changed
        accept = ok & (u < ratio2)
        config = jnp.where(accept, prop, config)
        return (config, acc + accept.astype(jnp.int32),
                tri + ok.astype(jnp.int32)), None

    key, ks = jax.random.split(key)
    (config, acc, tri), _ = jax.lax.scan(
        body, (config, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
        jax.random.split(ks, n_props))
    return config, key, SweepStats(acc, tri)
