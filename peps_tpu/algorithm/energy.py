"""Local energy + gradient holes for a configuration (the L4 evaluator core).

TPU-native replacement of the reference's CRTP model solvers
(`algorithm/vmc_update/model_solvers/base/square_nnn_energy_solver.h:81`,
`model_energy_solver.h:70`): instead of per-bond scalar traces, we compute
FULL amplitude-ratio tables [d, d] per bond with batched einsums from shared
row environments, then contract them against the model's coupling tensors.
One generic evaluator covers every bosonic model expressible as
(h_h, h_v, h_d, h_ad, h_site).

Design notes (vs the reference):
* Horizontal bonds, one-site terms and gradient holes come from single-row
  sandwiches (top/bottom BMPS + left/right BTens).
* Vertical NN bonds AND both diagonals come from TWO-ROW sandwiches (the
  reference's BTen2, `bmps_contractor.h:732-799`). The reference instead
  re-runs a transposed BMPS pass for vertical bonds
  (`base/bond_traversal_mixin.h`); the two-row route reuses the same top/
  bottom stacks and needs no extra SVD compressions — strictly cheaper.
* All ratios are formed within one shared environment product, so the
  log-weight normalization cancels exactly.

Everything is jit-able and vmap-able over configurations (the chain batch
axis replaces MPI rank parallelism).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.contraction import bmps
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import project


class ModelTensors(NamedTuple):
    """Dense coupling tensors of a square-lattice model (any may be None).

    Conventions: h[p1', p2', p1, p2] = <p1' p2'| h |p1 p2>; h_d acts on
    (y,x)-(y+1,x+1), h_ad on (y+1,x)-(y,x+1); h_site[p', p].

    Longer-range two-site couplings (reference traces
    ReplaceSqrt5DistTwoSiteTrace / ReplaceTNNSiteTrace,
    bmps_contractor.h:904,923): h_s5a on ((y+1,x),(y,x+2)) with index order
    (lower-left, upper-right); h_s5b on ((y+2,x),(y,x+1)) with index order
    (lower-left, upper-right); h_tnn_h on ((y,x),(y,x+2)); h_tnn_v on
    ((y,x),(y+2,x))."""
    h_h: jnp.ndarray | None
    h_v: jnp.ndarray | None
    h_d: jnp.ndarray | None
    h_ad: jnp.ndarray | None
    h_site: jnp.ndarray | None
    h_s5a: jnp.ndarray | None = None
    h_s5b: jnp.ndarray | None = None
    h_tnn_h: jnp.ndarray | None = None
    h_tnn_v: jnp.ndarray | None = None

    @classmethod
    def from_model(cls, model, dtype):
        conv = lambda m: None if m is None else jnp.asarray(m, dtype)
        return cls(conv(model.h_h), conv(model.h_v), conv(model.h_d),
                   conv(model.h_ad), conv(model.h_site),
                   conv(getattr(model, "h_s5a", None)),
                   conv(getattr(model, "h_s5b", None)),
                   conv(getattr(model, "h_tnn_h", None)),
                   conv(getattr(model, "h_tnn_v", None)))


class EnergyHoles(NamedTuple):
    e_loc: jnp.ndarray        # local energy E_loc(config), scalar
    o_tensor: jnp.ndarray | None  # O = d ln psi / d A, [Ly, Lx, d, D, D, D, D]
    log_abs_psi: jnp.ndarray  # log |psi|
    psi_mant: jnp.ndarray     # mantissa of the full contraction


def _cfg_lookup2(h, c1, c2):
    """h[d,d,d,d] -> h[c1, c2, :, :] for config arrays c1, c2 (any shape)."""
    return h[c1, c2]


def _row_pass(tps, tn, config, h_bond, with_holes: bool, stacks):
    """Single-row machinery: horizontal bond energies, one-site ratio tables,
    holes. Returns (bond_e, ratio1 [Ly, Lx, d], o_tensor|None, psi_loc)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]

    def per_row(top, bot, row, row_cands):
        envs = bmps.row_envs(top, bot, row)
        holes = bmps.punch_holes_row(envs, top, bot)        # [Lx, u,l,d,r]
        psi_loc = jnp.einsum("xuldr,xuldr->x", holes, row)  # [Lx]
        ones = jnp.einsum("xuldr,xpuldr->xp", holes, row_cands)  # [Lx, d]
        nn = bmps.replace_nn_site_traces(envs, top, bot,
                                         row_cands[:lx - 1], row_cands[1:])
        return holes, psi_loc, ones, nn

    holes, psi_loc, ones, nn = jax.vmap(per_row)(
        stacks.tops[:ly], stacks.bots[1:], tn, tps)

    safe_psi = jnp.where(psi_loc == 0, 1.0, psi_loc)
    ratio1 = ones / safe_psi[..., None]                     # [Ly, Lx, d]

    bond_e = jnp.zeros((), psi_loc.dtype)
    if h_bond is not None:
        c1, c2 = config[:, :lx - 1], config[:, 1:]
        psi_b = jnp.take_along_axis(
            jnp.take_along_axis(nn, c1[:, :, None, None], axis=2).squeeze(2),
            c2[:, :, None], axis=2).squeeze(2)              # [Ly, Lx-1]
        safe_b = jnp.where(psi_b == 0, 1.0, psi_b)
        ratios = nn / safe_b[:, :, None, None]
        bond_e = jnp.sum(_cfg_lookup2(h_bond, c1, c2) * ratios)

    o_tensor = None
    if with_holes:
        sel = jax.nn.one_hot(config, d, dtype=tps.dtype)    # [Ly, Lx, d]
        o_tensor = (holes / safe_psi[:, :, None, None, None, None])[:, :, None] \
            * sel[:, :, :, None, None, None, None]
    return bond_e, ratio1, o_tensor, psi_loc


def _fuse_pair_columns(row1, row2):
    """Fuse a two-row column stack into fat single-row site tensors.

    row1: [Lx, u, m, d, r], row2: [Lx, d, n, e, f] (row2's u-leg contracts
    row1's d-leg) -> S: [Lx, u, m*n, e, r*f]. A two-row (BTen2) transfer is
    then a plain one-row transfer with 64-wide horizontal legs — one fat
    MXU matmul per step instead of four skinny ones."""
    lx, dv = row1.shape[0], row1.shape[1]
    s = jnp.einsum("xumdr,xdnef->xumnerf", row1, row2)
    return s.reshape(lx, dv, dv * dv, dv, dv * dv)


def _pair_row_envs(top, bot, row1, row2, dtype, with_logs: bool = False,
                   fused=None):
    """Left/right two-row environments (BTen2). Axes of an env: (a=top bond,
    m1=row1 l-leg, m2=row2 l-leg, c=bot bond). Returns (lefts [Lx+1, ...],
    rights [Lx+1, ...]); with_logs=True appends the cumulative log of the
    per-step normalizations (log_lefts [Lx+1], log_rights [Lx+1]) so traces
    built from DIFFERENT env stacks can be rescaled consistently.

    Internally runs on column-fused site tensors (see _fuse_pair_columns) so
    every transfer step is a single [chi*dv^2, chi] x [..] contraction chain
    with MXU-sized inner dimensions."""
    lx = top.shape[0]
    chi = top.shape[1]
    dv = row1.shape[1]
    rdt = row1.real.dtype if jnp.iscomplexobj(row1) else row1.dtype
    if fused is None:
        fused = _fuse_pair_columns(row1, row2)
    init = jnp.zeros((chi, dv * dv, chi), dtype).at[0, 0, 0].set(1.0)

    def transfer_l(carry, xs):
        env, lw = carry
        t_x, s_x, b_x = xs
        t = bmps._col_transfer_left(env, t_x, s_x, b_x)
        n = jnp.maximum(jnp.linalg.norm(t), jnp.finfo(rdt).tiny)
        out = (t / n, lw + jnp.log(n))
        return out, out

    def transfer_r(carry, xs):
        env, lw = carry
        t_x, s_x, b_x = xs
        t = bmps._col_transfer_right(env, t_x, s_x, b_x)
        n = jnp.maximum(jnp.linalg.norm(t), jnp.finfo(rdt).tiny)
        out = (t / n, lw + jnp.log(n))
        return out, out

    xs = (top, fused, bot)
    zero = jnp.zeros((), rdt)
    _, (ls, lw_l) = jax.lax.scan(transfer_l, (init, zero), xs)
    _, (rs, lw_r) = jax.lax.scan(transfer_r, (init, zero), xs, reverse=True)
    lefts = jnp.concatenate([init[None], ls], axis=0) \
        .reshape(lx + 1, chi, dv, dv, chi)
    rights = jnp.concatenate([rs, init[None]], axis=0) \
        .reshape(lx + 1, chi, dv, dv, chi)
    if with_logs:
        log_lefts = jnp.concatenate([zero[None], lw_l])
        log_rights = jnp.concatenate([lw_r, zero[None]])
        return lefts, rights, log_lefts, log_rights
    return lefts, rights


def _vertical_pair_table(lefts, rights, top, bot, cands1, cands2,
                         chi, dv, d):
    """Vertical-pair amplitude table [Lx, d, d] via a fused two-row punch
    hole: ONE fat [(c,A)=chi^2-contraction] matmul per column gives the full
    column environment; both candidate substitutions then cost O(d) small
    contractions. Axis orders keep the last two dims >= (32, 64) so TPU
    tiling does not pad memory."""
    lx = top.shape[0]
    lf = lefts[:lx].reshape(lx, chi, dv * dv, chi)
    rt = rights[1:].reshape(lx, chi, dv * dv, chi)
    t1 = jnp.einsum("xaMc,xauA->xucMA", lf, top)          # last dims (M, A)
    t2 = jnp.einsum("xceC,xARC->xecAR", bot, rt)          # last dims (A, R)
    # hole2[x, u, e, M, R]: contract (c, A) — K = chi^2 fat matmul
    hole2 = jnp.einsum("xucMA,xecAR->xueMR", t1, t2)
    h6 = hole2.reshape(lx, dv, dv, dv, dv, dv, dv)        # [x,u,e,m,n,r,f]
    t3 = jnp.einsum("xuemnrf,xpumdr->xpnefd", h6, cands1)
    return jnp.einsum("xpnefd,xqdnef->xpq", t3, cands2)   # [Lx, d, d]


def _pair_pass(tps, tn, config, h_v, h_d, h_ad, stacks, h_s5=None):
    """Vertical + diagonal + anti-diagonal (+ sqrt5) bond energies from
    two-row sandwiches. h_s5 couples ((y+1, x), (y, x+2)) over a 3-column
    window (reference: ReplaceSqrt5DistTwoSiteTrace, bmps_contractor.h:923).
    Returns a scalar energy sum."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    dtype = tps.dtype
    rdt = tn.real.dtype if jnp.iscomplexobj(tn) else tn.dtype

    def per_pair(top, bot, row1, row2, cands1, cands2, c1, c2):
        """One row pair (y, y+1). cands1/cands2: [Lx, d, u, l, d, r]; c1/c2:
        the two config rows [Lx]."""
        fused = _fuse_pair_columns(row1, row2)
        lefts, rights = _pair_row_envs(top, bot, row1, row2, dtype,
                                       fused=fused)
        chi = top.shape[1]
        dv = row1.shape[1]
        e = jnp.zeros((), rdt)

        if h_v is not None:
            table = _vertical_pair_table(lefts, rights, top, bot,
                                         cands1, cands2, chi, dv, d)
            psi_b = table[jnp.arange(lx), c1, c2]
            safe = jnp.where(psi_b == 0, 1.0, psi_b)
            e = e + jnp.sum(h_v[c1, c2] * table / safe[:, None, None])

        nb = lx - 1
        if nb > 0 and ((h_d is not None) or (h_ad is not None)):
            tl, bl = top[:nb], bot[:nb]
            tr, br = top[1:], bot[1:]
            t0 = jnp.einsum("xamnc,xauA->xmncuA", lefts[:nb], tl)
            s0 = jnp.einsum("xauA,xArfC->xaurfC", tr, rights[2:])
            if h_d is not None:
                # replace row1@x (p) and row2@(x+1) (q)
                t = jnp.einsum("xmncuA,xpumdr->xpncAdr", t0, cands1[:nb])
                t = jnp.einsum("xpncAdr,xdnef->xpcAref", t, row2[:nb])
                lblk = jnp.einsum("xpcAref,xceC->xpArfC", t, bl)
                s = jnp.einsum("xaurfC,xumdr->xamdfC", s0, row1[1:])
                s = jnp.einsum("xamdfC,xqdnef->xqamneC", s, cands2[1:])
                rblk = jnp.einsum("xqamneC,xceC->xqamnc", s, br)
                table = jnp.einsum("xpABCE,xqABCE->xpq", lblk, rblk)
                cp, cq = c1[:nb], c2[1:]
                psi_b = table[jnp.arange(nb), cp, cq]
                safe = jnp.where(psi_b == 0, 1.0, psi_b)
                e = e + jnp.sum(h_d[cp, cq] * table / safe[:, None, None])
            if h_ad is not None:
                # replace row2@x (q) and row1@(x+1) (p)
                t = jnp.einsum("xmncuA,xumdr->xncAdr", t0, row1[:nb])
                t = jnp.einsum("xncAdr,xqdnef->xqcAref", t, cands2[:nb])
                lblk = jnp.einsum("xqcAref,xceC->xqArfC", t, bl)
                s = jnp.einsum("xaurfC,xpumdr->xpamdfC", s0, cands1[1:])
                s = jnp.einsum("xpamdfC,xdnef->xpamneC", s, row2[1:])
                rblk = jnp.einsum("xpamneC,xceC->xpamnc", s, br)
                table = jnp.einsum("xqABCE,xpABCE->xqp", lblk, rblk)
                cq, cp = c2[:nb], c1[1:]
                psi_b = table[jnp.arange(nb), cq, cp]
                safe = jnp.where(psi_b == 0, 1.0, psi_b)
                e = e + jnp.sum(h_ad[cq, cp] * table / safe[:, None, None])

        nb2 = lx - 2
        if nb2 > 0 and h_s5 is not None:
            # sqrt5 pair: lower-left (row2 @ x, index q) with upper-right
            # (row1 @ x+2, index p); middle column x+1 unchanged
            tl, bl = top[:nb2], bot[:nb2]
            t = jnp.einsum("xamnc,xauA->xmncuA", lefts[:nb2], tl)
            t = jnp.einsum("xmncuA,xumdr->xncAdr", t, row1[:nb2])
            t = jnp.einsum("xncAdr,xqdnef->xqcAref", t, cands2[:nb2])
            lblk = jnp.einsum("xqcAref,xceC->xqArfC", t, bl)
            # transfer through the unchanged middle column
            tm, bm = top[1:nb2 + 1], bot[1:nb2 + 1]
            t = jnp.einsum("xqamnc,xauA->xqmncuA", lblk, tm)
            t = jnp.einsum("xqmncuA,xumdr->xqncAdr", t, row1[1:nb2 + 1])
            t = jnp.einsum("xqncAdr,xdnef->xqcAref", t, row2[1:nb2 + 1])
            lblk2 = jnp.einsum("xqcAref,xceC->xqArfC", t, bm)
            # right column x+2: row1 replaced (p), row2 unchanged
            s = jnp.einsum("xauA,xArfC->xaurfC", top[2:], rights[3:])
            s = jnp.einsum("xaurfC,xpumdr->xpamdfC", s, cands1[2:])
            s = jnp.einsum("xpamdfC,xdnef->xpamneC", s, row2[2:])
            rblk = jnp.einsum("xpamneC,xceC->xpamnc", s, bot[2:])
            table = jnp.einsum("xqABCE,xpABCE->xqp", lblk2, rblk)
            cq, cp = c2[:nb2], c1[2:]
            psi_b = table[jnp.arange(nb2), cq, cp]
            safe = jnp.where(psi_b == 0, 1.0, psi_b)
            e = e + jnp.sum(h_s5[cq, cp] * table / safe[:, None, None])
        return e

    es = jax.vmap(per_pair)(stacks.tops[:ly - 1], stacks.bots[2:],
                            tn[:ly - 1], tn[1:], tps[:ly - 1], tps[1:],
                            config[:ly - 1], config[1:])
    return jnp.sum(es)


def _bond_pass(tps, tn, config, h_bond, stacks):
    """In-row NN bond energies only (no holes / one-site tables): the light
    kernel behind the transposed-frame vertical-bond fast path."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]

    def per_row(top, bot, row, row_cands):
        envs = bmps.row_envs(top, bot, row)
        return bmps.replace_nn_site_traces(envs, top, bot,
                                           row_cands[:lx - 1], row_cands[1:])

    nn = jax.vmap(per_row)(stacks.tops[:ly], stacks.bots[1:], tn, tps)
    c1, c2 = config[:, :lx - 1], config[:, 1:]
    psi_b = jnp.take_along_axis(
        jnp.take_along_axis(nn, c1[:, :, None, None], axis=2).squeeze(2),
        c2[:, :, None], axis=2).squeeze(2)
    safe_b = jnp.where(psi_b == 0, 1.0, psi_b)
    return jnp.sum(h_bond[c1, c2] * nn / safe_b[:, :, None, None])


def _tnn_row_pass(tps, tn, config, h_tnn, stacks):
    """Third-NN in-row bond energies ((y,x)-(y,x+2)) from single-row
    sandwiches (reference: ReplaceTNNSiteTrace, bmps_contractor.h:904)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]

    def per_row(top, bot, row, row_cands):
        envs = bmps.row_envs(top, bot, row)
        return bmps.replace_tnn_site_traces(
            envs, top, bot, row_cands[:lx - 2], row[1:lx - 1],
            row_cands[2:])

    tnn = jax.vmap(per_row)(stacks.tops[:ly], stacks.bots[1:], tn, tps)
    c1, c2 = config[:, :lx - 2], config[:, 2:]
    psi_b = jnp.take_along_axis(
        jnp.take_along_axis(tnn, c1[:, :, None, None], axis=2).squeeze(2),
        c2[:, :, None], axis=2).squeeze(2)
    safe = jnp.where(psi_b == 0, 1.0, psi_b)
    return jnp.sum(h_tnn[c1, c2] * tnn / safe[:, :, None, None])


def local_energy_and_holes(tps: jnp.ndarray, config: jnp.ndarray,
                           model: ModelTensors, chi: int, trunc: TruncParams,
                           with_holes: bool = True,
                           stacks: bmps.EnvStacks | None = None
                           ) -> EnergyHoles:
    """E_loc(config) and O = d ln psi / dA for one configuration.

    Reference: `ModelEnergySolver::CalEnergyAndHoles` (model_energy_solver.h:70)
    + `SquareNNNModelEnergySolver` traversal (square_nnn_energy_solver.h:81).

    stacks: optional precomputed env stacks for this configuration. The
    evaluator computes stacks for ALL chains in one vmapped pass (absorbs at
    full batch) and chunks only the table passes — chunked absorbs run at
    half throughput (latency-bound at small batch).
    """
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    tn = project(tps, config)
    if stacks is None:
        stacks = bmps.all_env_stacks(tn, chi, trunc)

    bond_e, ratio1, o_tensor, psi_loc = _row_pass(
        tps, tn, config, model.h_h, with_holes, stacks)

    e = bond_e
    if model.h_site is not None:
        # E_site = sum_x <c|h|p'> ratio1[p']
        hrows = model.h_site[config]          # [Ly, Lx, d]
        e = e + jnp.sum(hrows * ratio1)

    only_v = (model.h_v is not None) and (model.h_d is None) \
        and (model.h_ad is None) and (model.h_s5a is None)
    if only_v:
        # vertical bonds via the TRANSPOSED row pass: with the implicit
        # sketch absorb, a second (column) env-stack build is cheaper than
        # the two-row BTen2 transfers + pair tables (measured 0.16s vs
        # 0.39s per 32-chain eval at 8x8 D=8 chi=32). Diagonal models
        # still take the BTen2 route below.
        from peps_tpu.lattice import transpose_tps
        tps_t = transpose_tps(tps)
        cfg_t = config.T
        tn_t = project(tps_t, cfg_t)
        stacks_t = bmps.all_env_stacks(tn_t, chi, trunc)
        e = e + _bond_pass(tps_t, tn_t, cfg_t, model.h_v, stacks_t)
    elif (model.h_v is not None) or (model.h_d is not None) \
            or (model.h_ad is not None) or (model.h_s5a is not None):
        e = e + _pair_pass(tps, tn, config, model.h_v, model.h_d, model.h_ad,
                           stacks, h_s5=model.h_s5a)
    if model.h_tnn_h is not None:
        e = e + _tnn_row_pass(tps, tn, config, model.h_tnn_h, stacks)

    # sqrt5 family B ((y+2,x)-(y,x+1)) and vertical TNN live in the
    # TRANSPOSED frame, where they become family A / horizontal TNN
    # (reference evaluates them in the vertical BMPS approach,
    # spin_onehalf_triangle_heisenbergJ1J2_sqrpeps.h:423-446)
    if (model.h_s5b is not None) or (model.h_tnn_v is not None):
        from peps_tpu.lattice import transpose_tps
        tps_t = transpose_tps(tps)
        cfg_t = config.T
        tn_t = project(tps_t, cfg_t)
        stacks_t = bmps.all_env_stacks(tn_t, chi, trunc)
        if model.h_s5b is not None:
            # transposed roles: q = original site2 = (y, x+1),
            # p = original site1 = (y+2, x); h_s5b is given in (site1,
            # site2) order -> swap both bra and ket pairs
            h_eff = jnp.transpose(model.h_s5b, (1, 0, 3, 2))
            e = e + _pair_pass(tps_t, tn_t, cfg_t, None, None, None,
                               stacks_t, h_s5=h_eff)
        if model.h_tnn_v is not None:
            e = e + _tnn_row_pass(tps_t, tn_t, cfg_t, model.h_tnn_v,
                                  stacks_t)

    # full-amplitude diagnostics from the top stack
    final = stacks.tops[ly]
    v0 = bmps.e0(final.shape[1], tn.dtype)

    def close_step(v, b_x):
        return v @ b_x[:, 0, :], None
    v, _ = jax.lax.scan(close_step, v0, final)
    mant = v[0]
    log_abs = jnp.log(jnp.maximum(jnp.abs(mant), jnp.finfo(rdtype(tn)).tiny)) \
        + stacks.log_tops[ly]
    return EnergyHoles(e, o_tensor, log_abs, mant)


def rdtype(x):
    return x.real.dtype if jnp.iscomplexobj(x) else x.dtype


class RatioTables(NamedTuple):
    """Amplitude-ratio tables psi(s')/psi(s) from shared environments.

    ratio1:  [Ly, Lx, d]        one-site replacements
    ratio_h: [Ly, Lx-1, d, d]   horizontal NN pair replacements
    ratio_v: [Ly-1, Lx, d, d]   vertical NN pair replacements (or None)
    ratio_d: [Ly-1, Lx-1, d, d] diagonal (y,x)-(y+1,x+1) (or None)
    ratio_ad:[Ly-1, Lx-1, d, d] anti-diagonal (y+1,x)-(y,x+1) (or None)
    o_tensor: O = dlnpsi/dA (or None)
    psi_loc: [Ly, Lx] local psi mantissas
    """
    ratio1: jnp.ndarray
    ratio_h: jnp.ndarray
    ratio_v: jnp.ndarray | None
    ratio_d: jnp.ndarray | None
    ratio_ad: jnp.ndarray | None
    o_tensor: jnp.ndarray | None
    psi_loc: jnp.ndarray
    log_abs_psi: jnp.ndarray
    psi_mant: jnp.ndarray


def compute_ratio_tables(tps, config, chi, trunc, need=("h",),
                         with_holes=True) -> RatioTables:
    """All ratio tables needed by any (bosonic or fermionic) model.

    need: subset of {"h", "v", "d", "ad"} selecting which pair tables to
    compute (static)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    tn = project(tps, config)
    stacks = bmps.all_env_stacks(tn, chi, trunc)

    def per_row(top, bot, row, row_cands):
        envs = bmps.row_envs(top, bot, row)
        holes = bmps.punch_holes_row(envs, top, bot)
        psi_loc = jnp.einsum("xuldr,xuldr->x", holes, row)
        ones = jnp.einsum("xuldr,xpuldr->xp", holes, row_cands)
        nn = bmps.replace_nn_site_traces(envs, top, bot,
                                         row_cands[:lx - 1], row_cands[1:])
        return holes, psi_loc, ones, nn

    holes, psi_loc, ones, nn = jax.vmap(per_row)(
        stacks.tops[:ly], stacks.bots[1:], tn, tps)
    safe_psi = jnp.where(psi_loc == 0, 1.0, psi_loc)
    ratio1 = ones / safe_psi[..., None]

    c1, c2 = config[:, :lx - 1], config[:, 1:]
    psi_b = jnp.take_along_axis(
        jnp.take_along_axis(nn, c1[:, :, None, None], axis=2).squeeze(2),
        c2[:, :, None], axis=2).squeeze(2)
    safe_b = jnp.where(psi_b == 0, 1.0, psi_b)
    ratio_h = nn / safe_b[:, :, None, None]

    o_tensor = None
    if with_holes:
        sel = jax.nn.one_hot(config, d, dtype=tps.dtype)
        o_tensor = (holes / safe_psi[:, :, None, None, None, None])[:, :, None] \
            * sel[:, :, :, None, None, None, None]

    ratio_v = ratio_d = ratio_ad = None
    if any(k in need for k in ("v", "d", "ad")):
        tabs = _pair_tables(tps, tn, config, stacks,
                            "v" in need, "d" in need, "ad" in need)
        ratio_v, ratio_d, ratio_ad = tabs

    final = stacks.tops[ly]
    v0 = bmps.e0(final.shape[1], tn.dtype)

    def close_step(v, b_x):
        return v @ b_x[:, 0, :], None
    v, _ = jax.lax.scan(close_step, v0, final)
    mant = v[0]
    log_abs = jnp.log(jnp.maximum(jnp.abs(mant), jnp.finfo(rdtype(tn)).tiny)) \
        + stacks.log_tops[ly]
    return RatioTables(ratio1, ratio_h, ratio_v, ratio_d, ratio_ad,
                       o_tensor, psi_loc, log_abs, mant)


def _pair_tables(tps, tn, config, stacks, want_v, want_d, want_ad):
    """Normalized ratio tables for vertical/diagonal/anti-diagonal pairs."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    dtype = tps.dtype

    def per_pair(top, bot, row1, row2, cands1, cands2, c1, c2):
        fused = _fuse_pair_columns(row1, row2)
        lefts, rights = _pair_row_envs(top, bot, row1, row2, dtype,
                                       fused=fused)
        chi = top.shape[1]
        dv = row1.shape[1]
        out_v = out_d = out_ad = None

        if want_v:
            table = _vertical_pair_table(lefts, rights, top, bot,
                                         cands1, cands2, chi, dv, d)
            psi_b = table[jnp.arange(lx), c1, c2]
            safe = jnp.where(psi_b == 0, 1.0, psi_b)
            out_v = table / safe[:, None, None]

        nb = lx - 1
        if nb > 0 and (want_d or want_ad):
            tl, bl = top[:nb], bot[:nb]
            tr, br = top[1:], bot[1:]
            t0 = jnp.einsum("xamnc,xauA->xmncuA", lefts[:nb], tl)
            s0 = jnp.einsum("xauA,xArfC->xaurfC", tr, rights[2:])
            if want_d:
                t = jnp.einsum("xmncuA,xpumdr->xpncAdr", t0, cands1[:nb])
                t = jnp.einsum("xpncAdr,xdnef->xpcAref", t, row2[:nb])
                lblk = jnp.einsum("xpcAref,xceC->xpArfC", t, bl)
                s = jnp.einsum("xaurfC,xumdr->xamdfC", s0, row1[1:])
                s = jnp.einsum("xamdfC,xqdnef->xqamneC", s, cands2[1:])
                rblk = jnp.einsum("xqamneC,xceC->xqamnc", s, br)
                table = jnp.einsum("xpABCE,xqABCE->xpq", lblk, rblk)
                cp, cq = c1[:nb], c2[1:]
                psi_b = table[jnp.arange(nb), cp, cq]
                safe = jnp.where(psi_b == 0, 1.0, psi_b)
                out_d = table / safe[:, None, None]
            if want_ad:
                t = jnp.einsum("xmncuA,xumdr->xncAdr", t0, row1[:nb])
                t = jnp.einsum("xncAdr,xqdnef->xqcAref", t, cands2[:nb])
                lblk = jnp.einsum("xqcAref,xceC->xqArfC", t, bl)
                s = jnp.einsum("xaurfC,xpumdr->xpamdfC", s0, cands1[1:])
                s = jnp.einsum("xpamdfC,xdnef->xpamneC", s, row2[1:])
                rblk = jnp.einsum("xpamneC,xceC->xpamnc", s, br)
                table = jnp.einsum("xqABCE,xpABCE->xqp", lblk, rblk)
                cq, cp = c2[:nb], c1[1:]
                psi_b = table[jnp.arange(nb), cq, cp]
                safe = jnp.where(psi_b == 0, 1.0, psi_b)
                out_ad = table / safe[:, None, None]
        return out_v, out_d, out_ad

    outs = jax.vmap(per_pair)(stacks.tops[:ly - 1], stacks.bots[2:],
                              tn[:ly - 1], tn[1:], tps[:ly - 1], tps[1:],
                              config[:ly - 1], config[1:])
    return outs


def apply_dress_to_tables(tables: RatioTables, dress, config) -> RatioTables:
    """Multiply Jastrow ratio factors into all replacement tables
    (reference: JastrowDress in wave_function_component.h:100-122)."""
    from peps_tpu.montecarlo.jastrow import (one_site_log_ratios,
                                             two_site_log_ratios)
    ly, lx = config.shape
    flat = jnp.arange(ly * lx).reshape(ly, lx)
    r1 = tables.ratio1 * jnp.exp(one_site_log_ratios(dress, config, ly, lx))

    def pair(table, idx1, idx2):
        if table is None:
            return None
        lr = two_site_log_ratios(dress, config, idx1.reshape(-1),
                                 idx2.reshape(-1))
        return table * jnp.exp(lr).reshape(table.shape)

    rh = pair(tables.ratio_h, flat[:, :lx - 1], flat[:, 1:])
    rv = pair(tables.ratio_v, flat[:ly - 1], flat[1:])
    rd = pair(tables.ratio_d, flat[:ly - 1, :lx - 1], flat[1:, 1:])
    rad = pair(tables.ratio_ad, flat[1:, :lx - 1], flat[:ly - 1, 1:])
    log_abs = tables.log_abs_psi + dress.log_factor(config)
    return RatioTables(r1, rh, rv, rd, rad, tables.o_tensor,
                       tables.psi_loc, log_abs, tables.psi_mant)


def local_energy_and_holes_dressed(tps, config, model: ModelTensors, dress,
                                   chi, trunc, with_holes: bool = True
                                   ) -> EnergyHoles:
    """Jastrow-dressed local energy: psi_J = exp(J) psi. The O-tensor w.r.t.
    TPS parameters is unchanged by the dress; log|psi| gains log J."""
    need = ["h"]
    if model.h_v is not None:
        need.append("v")
    if model.h_d is not None:
        need.append("d")
    if model.h_ad is not None:
        need.append("ad")
    tables = compute_ratio_tables(tps, config, chi, trunc, tuple(need),
                                  with_holes)
    tables = apply_dress_to_tables(tables, dress, config)
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    e = jnp.zeros((), rdtype(tps))
    if model.h_h is not None:
        c1, c2 = config[:, :lx - 1], config[:, 1:]
        e = e + jnp.sum(model.h_h[c1, c2] * tables.ratio_h)
    if model.h_v is not None:
        c1, c2 = config[:ly - 1], config[1:]
        e = e + jnp.sum(model.h_v[c1, c2] * tables.ratio_v)
    if model.h_d is not None:
        c1, c2 = config[:ly - 1, :lx - 1], config[1:, 1:]
        e = e + jnp.sum(model.h_d[c1, c2] * tables.ratio_d)
    if model.h_ad is not None:
        c1, c2 = config[1:, :lx - 1], config[:ly - 1, 1:]
        e = e + jnp.sum(model.h_ad[c1, c2] * tables.ratio_ad)
    if model.h_site is not None:
        e = e + jnp.sum(model.h_site[config] * tables.ratio1)
    return EnergyHoles(e, tables.o_tensor, tables.log_abs_psi,
                       tables.psi_mant)


def psi_consistency_check(tps, config, chi, trunc, bc=None):
    """The same amplitude computed from every row-sandwich closure must agree
    (reference: psi-consistency monitor, psi_consistency.h; surfaced per
    sample by the measurer). Returns (max_rel_err, log_abs_psi_values)."""
    tn = project(tps, config)
    stacks = bmps.all_env_stacks(tn, chi, trunc)
    ly = tn.shape[0]

    def per_row(top, bot, row, lw):
        envs = bmps.row_envs(top, bot, row)
        mant = bmps.row_trace(envs, 0)
        return jnp.log(jnp.maximum(jnp.abs(mant), 1e-300)) \
            + envs.log_lefts[0] + envs.log_rights[0] + lw

    logs = jax.vmap(per_row)(stacks.tops[:ly], stacks.bots[1:], tn,
                             stacks.log_tops[:ly] + stacks.log_bots[1:])
    ref = logs[0]
    rel = jnp.max(jnp.abs(logs - ref))
    return rel, logs
