"""Environment-shared amplitude-ratio tables for graded fermionic states.

Replaces the O(N d^2) full-recompute ratio path of fermion/vmc.py with the
same shared-environment cost as the bosonic evaluator (reference:
Replace*Trace on fermionic tensors inside BMPSContractor, with the local
psi recompute contract of fermion-sign-in-bmps-contraction.md).

Why this is possible with LOCAL machinery: the dressed projection's only
config-nonlocal ingredient is the snake PREFIX parity Pi. Replacing the two
sites of an NN bond with a parity-conserving candidate pair changes Pi only
on the snake interval BETWEEN the sites:

* horizontal bonds are snake-adjacent — the interval is empty; only the two
  candidate tensors change (the second conditioned on the first's parity
  flip);
* vertical bonds (y, x)-(y+1, x): the interval is exactly the remaining
  columns of rows y and y+1 (right of x for even y, left for odd y) — so a
  SECOND pair-row environment stack built from prefix-FLIPPED tensors
  covers every replacement, and everything stays inside the standard
  two-row window.

Parity-violating candidate entries get arbitrary values; they are only ever
multiplied by Hamiltonian elements that vanish (H conserves parity).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.algorithm.energy import _pair_row_envs, rdtype
from peps_tpu.contraction import bmps
from peps_tpu.fermion.convert import (_LEGS, _static_tables, fermion_project,
                                      snake_prefix_parity)
from peps_tpu.fermion.peps import FermionSpace


def fermion_candidates(tps, config, space: FermionSpace):
    """Dressed candidate tensors [Ly, Lx, d, 2, D, D, D, D]: entry
    (y, x, a, f) is tps[y, x, a] dressed for phys value a with the site's
    snake prefix parity XOR f (f = 1 when an upstream replacement flipped
    the prefix)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    pb = space.bond_parity
    (pair_mask, coef, leg_static, leg_pi, leg_pp, leg_pc,
     leg_sign) = _static_tables(ly, lx, pb)
    pp_arr = jnp.asarray(np.asarray(space.phys_parity), jnp.int32)
    Pp0, _ = snake_prefix_parity(config, space.phys_parity)

    pi_a = pp_arr[None, None, :, None]                    # [1, 1, d, 1]
    f = jnp.arange(2, dtype=jnp.int32)[None, None, None, :]
    Pp = (Pp0[:, :, None, None] + f) % 2                  # [Ly, Lx, d, 2]
    Pc = (Pp + pi_a) % 2

    out = tps[:, :, :, None]                              # [Ly,Lx,d,1,D..]
    sc = (jnp.asarray(coef[("pi",)])[:, :, None, None] * pi_a
          + jnp.asarray(coef[("pi", "Pp")])[:, :, None, None] * pi_a * Pp
          + jnp.asarray(coef[("pi", "Pc")])[:, :, None, None] * pi_a * Pc
          + jnp.asarray(coef[("Pp",)])[:, :, None, None] * Pp
          + jnp.asarray(coef[("Pc",)])[:, :, None, None] * Pc) % 2
    out = out * (1.0 - 2.0 * sc).astype(tps.dtype)[..., None, None,
                                                   None, None]
    out = out * jnp.asarray(pair_mask, tps.dtype)[:, :, None, None]
    lv = jnp.asarray(leg_sign, tps.dtype)
    for gi, g in enumerate(_LEGS):
        e = (jnp.asarray(leg_static[g])[:, :, None, None]
             + jnp.asarray(leg_pi[g])[:, :, None, None] * pi_a
             + jnp.asarray(leg_pp[g])[:, :, None, None] * Pp
             + jnp.asarray(leg_pc[g])[:, :, None, None] * Pc) % 2
        shape = [1, 1, 1, 1]
        shape[gi] = len(pb)
        mask = jnp.where(e[..., None, None, None, None] == 1,
                         lv.reshape([1, 1, 1, 1] + shape),
                         jnp.ones([1] * 8, tps.dtype))
        out = out * mask
    return out


def fermion_flip_mask(config, space: FermionSpace, ly, lx, dtype):
    """Sign tensor [Ly, Lx, D, D, D, D]: elementwise factor a DRESSED site
    tensor acquires when its snake prefix parity flips (both Pp and Pc flip;
    only Pp-coupled terms exist in the dressing table, checked here)."""
    pb = space.bond_parity
    (pair_mask, coef, leg_static, leg_pi, leg_pp, leg_pc,
     leg_sign) = _static_tables(ly, lx, pb)
    assert not any(np.any(v) for k, v in coef.items()
                   if "Pc" in k) and not any(np.any(leg_pc[g])
                                             for g in _LEGS), \
        "dressing table unexpectedly couples to Pc"
    pp_arr = jnp.asarray(np.asarray(space.phys_parity), jnp.int32)
    pi_s = pp_arr[config]                                  # [Ly, Lx]
    sc = (jnp.asarray(coef[("pi", "Pp")]) * pi_s
          + jnp.asarray(coef[("Pp",)])) % 2
    out = (1.0 - 2.0 * sc).astype(dtype)[:, :, None, None, None, None] \
        * jnp.ones((ly, lx) + (len(pb),) * 4, dtype)
    lv = jnp.asarray(1.0 - 2.0 * np.asarray(pb), dtype)
    for gi, g in enumerate(_LEGS):
        e = jnp.asarray(leg_pp[g]) % 2                     # static 0/1
        shape = [1, 1, 1, 1]
        shape[gi] = len(pb)
        mask = jnp.where(e[:, :, None, None, None, None] == 1,
                         lv.reshape([1, 1] + shape),
                         jnp.ones([1] * 6, dtype))
        out = out * mask
    return out


class FermionTables(NamedTuple):
    ratio_h: jnp.ndarray       # [Ly, Lx-1, d, d]
    ratio_v: jnp.ndarray       # [Ly-1, Lx, d, d]
    log_abs_psi: jnp.ndarray
    psi_mant: jnp.ndarray
    # NNN diagonal tables (None unless want_diag): ratio_d[y, x, a, b] with
    # a at (y,x), b at (y+1,x+1); ratio_ad[y, x, a, b] with a at (y+1,x),
    # b at (y,x+1) — reference ReplaceNNNSiteTrace (bmps_contractor.h:886)
    ratio_d: jnp.ndarray | None = None
    ratio_ad: jnp.ndarray | None = None


def _diag_tables_pair(kind, even, lefts_n, rights_n, lefts_f, rights_f,
                      lw_l_n, lw_r_n, lw_l_f, lw_r_f, top, bot,
                      row1, row2, frow1, frow2, cand1, cand2, lx):
    """Diagonal ("d": (y,x)-(y+1,x+1)) / anti-diagonal ("ad":
    (y+1,x)-(y,x+1)) replacement tables for one row pair from the SAME four
    env stacks the vertical tables use. Snake-interval analysis: replacing
    the pair flips the snake prefix parity Pi on (kind="d", even rows)
    row-1 cols > x and row-2 cols > x+1; (d, odd) row-1 cols < x and row-2
    cols <= x; (ad, even) row-1 cols > x+1 and row-2 cols > x; (ad, odd)
    row-1 cols <= x and row-2 cols < x. In every case the flipped region =
    {one in-window current tensor} + {one full side of the two-row window},
    so the normal/flipped left+right stacks plus the flip mask cover all
    replacements. The flag f (= parity change of the JW-earlier candidate)
    conditions the flip; the JW-later candidate carries flag f."""
    nb = lx - 1
    tl, bl = top[:nb], bot[:nb]
    tr, br = top[1:], bot[1:]

    def table_with(f):
        use_lf = (f == 1) and not even
        use_rf = (f == 1) and even
        L = (lefts_f if use_lf else lefts_n)[:nb]
        R = (rights_f if use_rf else rights_n)[2:]
        if kind == "d":
            r1a = cand1[:nb, :, 0]                       # candidate at i
            r2a = (frow2 if (f == 1 and not even) else row2)[:nb]
            r1c = (frow1 if (f == 1 and even) else row1)[1:]
            r2c = cand2[1:, :, f]                        # candidate at j
            t0 = jnp.einsum("xamnc,xauA->xmncuA", L, tl)
            t = jnp.einsum("xmncuA,xpumdr->xpncAdr", t0, r1a)
            t = jnp.einsum("xpncAdr,xdnef->xpcAref", t, r2a)
            lblk = jnp.einsum("xpcAref,xceC->xpArfC", t, bl)
            s0 = jnp.einsum("xauA,xArfC->xaurfC", tr, R)
            s = jnp.einsum("xaurfC,xumdr->xamdfC", s0, r1c)
            s = jnp.einsum("xamdfC,xqdnef->xqamneC", s, r2c)
            rblk = jnp.einsum("xqamneC,xceC->xqamnc", s, br)
            tab = jnp.einsum("xpABCE,xqABCE->xpq", lblk, rblk)
        else:
            r1a = (frow1 if (f == 1 and not even) else row1)[:nb]
            r2a = cand2[:nb, :, f]                       # candidate at j
            r1c = cand1[1:, :, 0]                        # candidate at i
            r2c = (frow2 if (f == 1 and even) else row2)[1:]
            t0 = jnp.einsum("xamnc,xauA->xmncuA", L, tl)
            t = jnp.einsum("xmncuA,xumdr->xncAdr", t0, r1a)
            t = jnp.einsum("xncAdr,xqdnef->xqcAref", t, r2a)
            lblk = jnp.einsum("xqcAref,xceC->xqArfC", t, bl)
            s0 = jnp.einsum("xauA,xArfC->xaurfC", tr, R)
            s = jnp.einsum("xaurfC,xpumdr->xpamdfC", s0, r1c)
            s = jnp.einsum("xpamdfC,xdnef->xpamneC", s, r2c)
            rblk = jnp.einsum("xpamneC,xceC->xpamnc", s, br)
            tab = jnp.einsum("xqABCE,xpABCE->xqp", lblk, rblk)
        if f == 1:
            comp = (jnp.exp(lw_r_f[2:] - lw_r_n[2:]) if even
                    else jnp.exp(lw_l_f[:nb] - lw_l_n[:nb]))
            tab = tab * comp[:, None, None]
        return tab

    return table_with(0), table_with(1)


def fermion_ratio_tables(tps, config, space: FermionSpace, chi, trunc,
                         want_diag: bool = False) -> FermionTables:
    """All NN amplitude-ratio tables of a graded state from SHARED
    environments: ratio[y, x, a, b] = psi(S with bond -> (a, b)) / psi(S),
    sign-consistent by construction (numerator and denominator close the
    same environments). want_diag additionally builds the NNN diagonal /
    anti-diagonal tables (t2 channels) from the SAME env stacks."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    net = fermion_project(tps, config, space)
    stacks = bmps.all_env_stacks(net, chi, trunc)
    cands = fermion_candidates(tps, config, space)         # [Ly,Lx,d,2,...]
    flip = fermion_flip_mask(config, space, ly, lx, tps.dtype)
    pp_arr = jnp.asarray(np.asarray(space.phys_parity), jnp.int32)
    pi_cfg = pp_arr[config]                                # [Ly, Lx]
    pi_d = pp_arr                                          # [d]

    # ---- horizontal tables (snake-adjacent pair) ----
    def per_row(top, bot, row, c_row, cand_row, even: bool):
        envs = bmps.row_envs(top, bot, row)
        t_f = []
        for f in (0, 1):
            if even:
                ca = cand_row[:lx - 1, :, 0]   # left = first in snake
                cb = cand_row[1:, :, f]
            else:
                ca = cand_row[:lx - 1, :, f]   # right = first in snake
                cb = cand_row[1:, :, 0]
            t_f.append(bmps.replace_nn_site_traces(envs, top, bot, ca, cb))
        t0, t1 = t_f
        pi_row = pp_arr[c_row]
        if even:
            # flip for entry (a, b) iff pi(a) != pi(current left)
            cond = (pi_d[None, :, None] != pi_row[:lx - 1, None, None])
        else:
            cond = (pi_d[None, None, :] != pi_row[1:, None, None])
        table = jnp.where(cond, t1, t0)
        psi_b = table[jnp.arange(lx - 1), c_row[:lx - 1], c_row[1:]]
        safe = jnp.where(psi_b == 0, 1.0, psi_b)
        return table / safe[:, None, None]

    ys_even = tuple(range(0, ly, 2))
    ys_odd = tuple(range(1, ly, 2))
    ratio_h = jnp.zeros((ly, lx - 1, d, d), tps.dtype)
    for ys, even in ((ys_even, True), (ys_odd, False)):
        if not ys:
            continue
        ys_a = jnp.asarray(ys)
        part = jax.vmap(lambda t, b, r, c, cd: per_row(t, b, r, c, cd,
                                                       even))(
            stacks.tops[ys_a], stacks.bots[ys_a + 1], net[ys_a],
            config[ys_a], cands[ys_a])
        ratio_h = ratio_h.at[ys_a].set(part)

    # ---- vertical tables (two-row window + prefix-flipped env stack) ----
    net_flip = net * flip

    def per_pair(top, bot, row1, row2, fr1, fr2, c1, c2, cand1, cand2,
                 even: bool):
        dtype = tps.dtype
        lefts_n, rights_n, lw_l_n, lw_r_n = _pair_row_envs(
            top, bot, row1, row2, dtype, with_logs=True)
        lefts_f, rights_f, lw_l_f, lw_r_f = _pair_row_envs(
            top, bot, fr1, fr2, dtype, with_logs=True)

        diag_out = ()
        if want_diag and lx > 1:
            stacks_args = (lefts_n, rights_n, lefts_f, rights_f,
                           lw_l_n, lw_r_n, lw_l_f, lw_r_f, top, bot,
                           row1, row2, fr1, fr2, cand1, cand2, lx)
            td0, td1 = _diag_tables_pair("d", even, *stacks_args)
            cond_d = (pi_d[None, :, None]
                      != pp_arr[c1][:lx - 1, None, None])
            tab_d = jnp.where(cond_d, td1, td0)
            psi_d = tab_d[jnp.arange(lx - 1), c1[:lx - 1], c2[1:]]
            safe_d = jnp.where(psi_d == 0, 1.0, psi_d)
            ta0, ta1 = _diag_tables_pair("ad", even, *stacks_args)
            cond_a = (pi_d[None, None, :]
                      != pp_arr[c1][1:, None, None])
            tab_a = jnp.where(cond_a, ta1, ta0)
            psi_a = tab_a[jnp.arange(lx - 1), c2[:lx - 1], c1[1:]]
            safe_a = jnp.where(psi_a == 0, 1.0, psi_a)
            diag_out = (tab_d / safe_d[:, None, None],
                        tab_a / safe_a[:, None, None])

        def table_with(f):
            # upper candidate unflipped; lower candidate and the interval
            # environments flip-conditioned (interval = right side of the
            # window for even rows, left side for odd rows). Mixed-stack
            # traces are rescaled by the log-norm difference so t0 and t1
            # entries share one normalization.
            ca = cand1[:, :, 0]
            cb = cand2[:, :, f]
            lefts = lefts_f if (f == 1 and not even) else lefts_n
            rights = rights_f if (f == 1 and even) else rights_n
            t = jnp.einsum("xamnc,xauA->xmncuA", lefts[:lx], top)
            t = jnp.einsum("xmncuA,xpumdr->xpncAdr", t, ca)
            br = jnp.einsum("xceC,xArfC->xceArf", bot, rights[1:])
            b4 = jnp.einsum("xceArf,xqdnef->xcArqdn", br, cb)
            tab = jnp.einsum("xpncAdr,xcArqdn->xpq", t, b4)
            if f == 1:
                if even:
                    comp = jnp.exp(lw_r_f[1:] - lw_r_n[1:])
                else:
                    comp = jnp.exp(lw_l_f[:lx] - lw_l_n[:lx])
                tab = tab * comp[:, None, None]
            return tab

        t0 = table_with(0)
        t1 = table_with(1)
        pi1 = pp_arr[c1]
        cond = (pi_d[None, :, None] != pi1[:, None, None])
        table = jnp.where(cond, t1, t0)
        psi_b = table[jnp.arange(lx), c1, c2]
        safe = jnp.where(psi_b == 0, 1.0, psi_b)
        return (table / safe[:, None, None],) + diag_out

    ratio_v = jnp.zeros((ly - 1, lx, d, d), tps.dtype)
    ratio_d = ratio_ad = None
    if want_diag and lx > 1 and ly > 1:
        ratio_d = jnp.zeros((ly - 1, lx - 1, d, d), tps.dtype)
        ratio_ad = jnp.zeros((ly - 1, lx - 1, d, d), tps.dtype)
    ys_even = tuple(range(0, ly - 1, 2))
    ys_odd = tuple(range(1, ly - 1, 2))
    for ys, even in ((ys_even, True), (ys_odd, False)):
        if not ys:
            continue
        ys_a = jnp.asarray(ys)
        part = jax.vmap(
            lambda t, b, r1, r2, f1, f2, c1, c2, cd1, cd2: per_pair(
                t, b, r1, r2, f1, f2, c1, c2, cd1, cd2, even))(
            stacks.tops[ys_a], stacks.bots[ys_a + 2], net[ys_a],
            net[ys_a + 1], net_flip[ys_a], net_flip[ys_a + 1],
            config[ys_a], config[ys_a + 1], cands[ys_a], cands[ys_a + 1])
        ratio_v = ratio_v.at[ys_a].set(part[0])
        if ratio_d is not None:
            ratio_d = ratio_d.at[ys_a].set(part[1])
            ratio_ad = ratio_ad.at[ys_a].set(part[2])

    # full-amplitude diagnostics from the top stack
    final = stacks.tops[ly]
    v0 = bmps.e0(final.shape[1], net.dtype)

    def close_step(v, b_x):
        return v @ b_x[:, 0, :], None

    v, _ = jax.lax.scan(close_step, v0, final)
    mant = v[0]
    log_abs = jnp.log(jnp.maximum(jnp.abs(mant),
                                  jnp.finfo(rdtype(net)).tiny)) \
        + stacks.log_tops[ly]
    return FermionTables(ratio_h, ratio_v, log_abs, mant, ratio_d, ratio_ad)
