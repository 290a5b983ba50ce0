"""Boundary-MPS contraction engine (open boundary conditions).

TPU-native re-design of the reference's stateful ``BMPSContractor``
(`include/qlpeps/two_dim_tn/tensor_network_2d/bmps/bmps_contractor.h`) as pure
functions over dense padded arrays:

* boundary MPS over a row of columns:  ``B[x][a, v, b]`` with bonds ``a, b`` of
  static dimension ``chi`` and vertical leg ``v`` of dimension ``D``;
* the projected network ("MPO row") ``S[x][u, l, d, r]``;
* environment stacks are computed with ``lax.scan`` (one pass collects every
  intermediate), replacing the reference's incremental stack push/pop
  (`GrowBMPSForRow`, `ShiftBMPSWindow`).

Edge-bond convention: chain edge bonds are one-dimensional, embedded at index 0
of the padded ``chi`` axis. ``multiply_mpo`` re-masks edges (exact zeros) and
``compress`` rebuilds the edge tensors by explicit index-0 closure, so the
padding never leaks into truncation decisions. Closure of any boundary object
is therefore always "take index 0".

Normalization: every compress/env step rescales its output to unit Frobenius
norm and accumulates a log-weight, so mantissas stay O(1) for arbitrarily
large lattices. Quantities consumed as *ratios* (Metropolis, local energy,
O* = hole/psi) are formed from shared environments so the log-weights cancel
exactly and never need exponentiation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.linalg import TruncParams, lq, qr_safe, truncated_svd


def e0(n: int, dtype) -> jnp.ndarray:
    v = jnp.zeros((n,), dtype=dtype)
    return v.at[0].set(1.0)


def init_boundary(lx: int, chi: int, d_bond: int, dtype) -> jnp.ndarray:
    """Trivial boundary MPS: product of index-0 embeddings, [Lx, chi, D, chi]."""
    site = jnp.zeros((chi, d_bond, chi), dtype=dtype).at[0, 0, 0].set(1.0)
    return jnp.broadcast_to(site, (lx, chi, d_bond, chi))


def multiply_mpo(bmps: jnp.ndarray, row: jnp.ndarray) -> jnp.ndarray:
    """Absorb one lattice row into the boundary MPS (no compression).

    bmps: [Lx, chi, D, chi]  (vertical leg contracts the row's `u` legs)
    row:  [Lx, D, D, D, D]   site axes (u, l, d, r)
    returns [Lx, chi*D, D, chi*D] with grouped bonds (a, l) and (b, r),
    edge axes re-masked to index 0.
    """
    lx, chi, dv, _ = bmps.shape
    dd = row.shape[-1]
    out = jnp.einsum("xaub,xuldr->xaldbr", bmps, row)
    out = out.reshape(lx, chi * dd, row.shape[3], chi * dd)
    # Edge re-masking: left edge of x=0, right edge of x=Lx-1 carry content at
    # combined index 0 only; zero the rest exactly (kills canonicalization
    # garbage from the previous compression round).
    m = chi * dd
    left_mask = jnp.zeros((m,), out.dtype).at[0].set(1.0)
    out = out.at[0].multiply(left_mask[:, None, None])
    out = out.at[lx - 1].multiply(left_mask[None, None, :])
    return out


class CompressResult(NamedTuple):
    bmps: jnp.ndarray       # [Lx, chi, D, chi]
    log_norm: jnp.ndarray   # scalar: log of factored-out norm
    trunc_err: jnp.ndarray  # max relative truncation error over bonds


def compress(mps: jnp.ndarray, chi: int, trunc: TruncParams) -> CompressResult:
    """Compress an MPS [Lx, m, D, m] (edge content at index 0) to bond dim chi.

    Two sweeps (reference scheme ``SVD_COMPRESS``,
    `one_dim_tn/boundary_mps/bmps_impl.h:406-437`): right-to-left LQ
    canonicalization, then left-to-right truncated-SVD sweep. All shapes
    static; edges closed at index 0 and rebuilt by embedding.
    """
    lx, m, dv, _ = mps.shape
    dtype = mps.dtype

    # ---- close edges (content is exactly at index 0) ----
    left_t = mps[0, 0]            # [D, m]
    right_t = mps[lx - 1, :, :, 0]  # [m, D]

    # ---- right-to-left LQ canonicalization ----
    # x = Lx-1 (right edge): mat [m, D] = L0 @ Q0, pad to static [m, m]/[m, D].
    l_last, q_last = lq(right_t)              # [m, k], [k, D], k = min(m, D)
    k = l_last.shape[1]
    if k < m:
        l_last = jnp.pad(l_last, ((0, 0), (0, m - k)))
        q_last = jnp.pad(q_last, ((0, m - k), (0, 0)))
    bc_last = q_last                           # [m, D] right-canonical edge

    def rl_step(carry_l, b_x):
        # b_x: [m, D, m]; absorb carried L on the right bond, then LQ.
        t = jnp.einsum("avb,bc->avc", b_x, carry_l)    # [m, D, m]
        mat = t.reshape(m, dv * m)
        l_new, q = lq(mat)                             # [m, m], [m, D*m]
        return l_new, q.reshape(m, dv, m)

    if lx > 2:
        inner = mps[1:lx - 1]
        l_carry, bc_inner = jax.lax.scan(rl_step, l_last, inner, reverse=True)
    else:
        l_carry, bc_inner = l_last, jnp.zeros((0, m, dv, m), dtype)
    # absorb into the (closed) left edge tensor
    a0 = jnp.einsum("vb,bc->vc", left_t, l_carry)      # [D, m]

    # ---- left-to-right truncated SVD sweep ----
    u0, s0, vh0, err0 = truncated_svd(a0, TruncParams(chi, trunc.d_min, trunc.trunc_err))
    b_first = jnp.zeros((chi, dv, chi), dtype).at[0].set(u0)  # u0: [D, chi]
    carry0 = s0[:, None] * vh0                          # [chi, m]

    def lr_step(carry, bc_x):
        c = carry
        t = jnp.einsum("cb,bvd->cvd", c, bc_x)          # [chi, D, m]
        mat = t.reshape(chi * dv, m)
        u, s, vh, err = truncated_svd(mat, TruncParams(chi, trunc.d_min, trunc.trunc_err))
        b_new = u.reshape(chi, dv, chi)
        return s[:, None] * vh, (b_new, err)

    if lx > 2:
        carry_c, (b_inner, errs) = jax.lax.scan(lr_step, carry0, bc_inner)
        max_err = jnp.maximum(err0, jnp.max(errs))
    else:
        carry_c, b_inner, max_err = carry0, jnp.zeros((0, chi, dv, chi), dtype), err0

    t_last = jnp.einsum("cb,bv->cv", carry_c, bc_last)  # [chi, D]
    b_last = jnp.zeros((chi, dv, chi), dtype).at[:, :, 0].set(t_last)

    out = jnp.concatenate([b_first[None], b_inner, b_last[None]], axis=0)
    # per-tensor normalization: the represented state is the *product* of the
    # site tensors, so each factored-out norm contributes once to the log.
    norms = jnp.sqrt(jnp.sum(jnp.abs(out) ** 2, axis=(1, 2, 3)))
    norms = jnp.maximum(norms, jnp.finfo(out.real.dtype).tiny)
    out = out / norms[:, None, None, None]
    return CompressResult(out, jnp.sum(jnp.log(norms)), max_err)


def absorb_row(bmps: jnp.ndarray, row: jnp.ndarray, chi: int,
               trunc: TruncParams) -> CompressResult:
    """multiply_mpo followed by compression (one `GrowBMPSStep`); the
    compression scheme is selected by trunc.scheme."""
    if trunc.scheme == "sketch":
        # fused path: never materializes the grown MPS
        return absorb_row_sketch(bmps, row, chi, trunc)
    grown = multiply_mpo(bmps, row)
    if trunc.scheme == "var2":
        return compress_variational(grown, chi, trunc, two_site=True)
    if trunc.scheme == "var1":
        return compress_variational(grown, chi, trunc, two_site=False)
    if trunc.scheme == "fast":
        return compress_fast(grown, chi, trunc, power_iters=trunc.rsvd_power)
    return compress(grown, chi, trunc)


class EnvStacks(NamedTuple):
    """All horizontal boundary environments of a projected network.

    tops[y]:    boundary MPS absorbing rows 0..y-1 (tops[0] = trivial);
                vertical legs contract row y's `u` legs.   [Ly+1, Lx, chi, D, chi]
    bots[y]:    boundary MPS absorbing rows y..Ly-1 (bots[Ly] = trivial);
                vertical legs contract row y-1's `d` legs. [Ly+1, Lx, chi, D, chi]
    log_tops, log_bots: accumulated log norms, [Ly+1].
    """
    tops: jnp.ndarray
    bots: jnp.ndarray
    log_tops: jnp.ndarray
    log_bots: jnp.ndarray


def flip_vertical(tn: jnp.ndarray) -> jnp.ndarray:
    """Flip a projected network [Ly, Lx, u, l, d, r] upside down (u <-> d)."""
    return tn[::-1].transpose(0, 1, 4, 3, 2, 5)


def all_top_envs(tn: jnp.ndarray, chi: int, trunc: TruncParams):
    """tops[y] for y = 0..Ly via one scan. tn: [Ly, Lx, u, l, d, r]."""
    ly, lx = tn.shape[:2]
    dv = tn.shape[2]
    b0 = init_boundary(lx, chi, dv, tn.dtype)

    def step(carry, row):
        bmps, logw = carry
        res = absorb_row(bmps, row, chi, trunc)
        new = (res.bmps, logw + res.log_norm)
        return new, new

    init = (b0, jnp.zeros((), tn.real.dtype if jnp.iscomplexobj(tn) else tn.dtype))
    _, (bs, logs) = jax.lax.scan(step, init, tn)
    tops = jnp.concatenate([b0[None], bs], axis=0)
    log_tops = jnp.concatenate([jnp.zeros((1,), logs.dtype), logs])
    return tops, log_tops


def all_env_stacks(tn: jnp.ndarray, chi: int, trunc: TruncParams) -> EnvStacks:
    """Compute all top and bottom boundary environments."""
    tops, log_tops = all_top_envs(tn, chi, trunc)
    ftops, flog = all_top_envs(flip_vertical(tn), chi, trunc)
    ly = tn.shape[0]
    # bots[y] = environment absorbing original rows y..Ly-1 = ftops[Ly - y]
    bots = ftops[::-1]
    log_bots = flog[::-1]
    return EnvStacks(tops, bots, log_tops, log_bots)


def amplitude(tn: jnp.ndarray, chi: int, trunc: TruncParams):
    """log-amplitude of the full network: returns (mantissa, log_weight).

    psi = mantissa * exp(log_weight). mantissa is the index-0 closure of the
    fully absorbed boundary MPS.
    """
    ly, lx = tn.shape[:2]
    tops, log_tops = all_top_envs(tn, chi, trunc)
    final = tops[ly]  # [Lx, chi, D, chi]; all `d` legs closed at index 0

    def close_step(v, b_x):
        return v @ b_x[:, 0, :], None

    v0 = e0(final.shape[1], tn.dtype)
    v, _ = jax.lax.scan(close_step, v0, final)
    return v[0], log_tops[ly]


# ---------------------------------------------------------------------------
# Row environments (BTen analogue): left/right closures of the
# top-BMPS x row x bottom-BMPS sandwich.
# ---------------------------------------------------------------------------

class RowEnvs(NamedTuple):
    """Per-column left/right environments of a single-row sandwich.

    lefts[x]:  closure of columns < x.  axes (a_top, l_site, c_bot): [Lx+1, chi, D, chi]
    rights[x]: closure of columns >= x. axes (a_top, l_site, c_bot): [Lx+1, chi, D, chi]
    Log-weights are NOT tracked here: consumers form ratios from shared
    environments; per-step normalization keeps mantissas bounded and the
    common scale cancels.
    """
    lefts: jnp.ndarray
    rights: jnp.ndarray
    log_lefts: jnp.ndarray
    log_rights: jnp.ndarray


def _col_transfer_left(lenv, top_x, s_x, bot_x):
    """lenv' = lenv contracted with one column (top, site, bottom)."""
    t = jnp.einsum("alc,auA->luAc", lenv, top_x)
    t = jnp.einsum("luAc,uldr->dArc", t, s_x)
    return jnp.einsum("dArc,cdC->ArC", t, bot_x)


def _col_transfer_right(renv, top_x, s_x, bot_x):
    t = jnp.einsum("ArC,auA->urCa", renv, top_x)
    t = jnp.einsum("urCa,uldr->dCla", t, s_x)
    return jnp.einsum("dCla,cdC->alc", t, bot_x)


def row_envs(top: jnp.ndarray, bot: jnp.ndarray, row: jnp.ndarray) -> RowEnvs:
    """Compute all left/right BTens for one row sandwich.

    top: [Lx, chi, D, chi] (v legs -> row `u`), bot: [Lx, chi, D, chi]
    (v legs -> row `d`), row: [Lx, D, D, D, D].
    """
    lx, chi = top.shape[0], top.shape[1]
    dv = row.shape[2]
    dtype = row.dtype
    init = jnp.zeros((chi, dv, chi), dtype).at[0, 0, 0].set(1.0)
    rdtype = row.real.dtype if jnp.iscomplexobj(row) else row.dtype

    def lstep(carry, xs):
        env, logw = carry
        t_x, s_x, b_x = xs
        new = _col_transfer_left(env, t_x, s_x, b_x)
        n = jnp.maximum(jnp.linalg.norm(new), jnp.finfo(rdtype).tiny)
        new = new / n
        out = (new, logw + jnp.log(n))
        return out, out

    def rstep(carry, xs):
        env, logw = carry
        t_x, s_x, b_x = xs
        new = _col_transfer_right(env, t_x, s_x, b_x)
        n = jnp.maximum(jnp.linalg.norm(new), jnp.finfo(rdtype).tiny)
        new = new / n
        out = (new, logw + jnp.log(n))
        return out, out

    zero = jnp.zeros((), rdtype)
    _, (ls, log_ls) = jax.lax.scan(lstep, (init, zero), (top, row, bot))
    _, (rs, log_rs) = jax.lax.scan(rstep, (init, zero), (top, row, bot), reverse=True)
    lefts = jnp.concatenate([init[None], ls], axis=0)
    log_lefts = jnp.concatenate([zero[None], log_ls])
    rights = jnp.concatenate([rs, init[None]], axis=0)
    log_rights = jnp.concatenate([log_rs, zero[None]])
    return RowEnvs(lefts, rights, log_lefts, log_rights)


def row_trace(envs: RowEnvs, x: int | jnp.ndarray):
    """Mantissa of psi evaluated by closing lefts[x] against rights[x]."""
    lenv = envs.lefts[x]
    renv = envs.rights[x]
    return jnp.einsum("alc,alc->", lenv, renv)


def punch_holes_row(envs: RowEnvs, top: jnp.ndarray, bot: jnp.ndarray):
    """All site environments ("holes") of one row, plus local psi mantissas.

    Returns (holes [Lx, u, l, d, r], psi_loc [Lx]) where psi_loc[x] is psi
    computed in the same environment product as holes[x] (so holes/psi_loc is
    exactly O*-ready). Reference: `PunchHole`, bmps_contractor.h:940.
    """
    lx = top.shape[0]
    lefts = envs.lefts[:lx]      # L[x]
    rights = envs.rights[1:]     # R[x+1]
    # explicit pairwise grouping: XLA's free-order choice for the 4-operand
    # einsum can materialize a chi^2 D^3 intermediate per (row, chain) and
    # OOM at batch scale; (L.T)(B.R) keeps intermediates at chi^2 D^2
    lt = jnp.einsum("xalc,xauA->xlcuA", lefts, top)
    br = jnp.einsum("xcdC,xArC->xcdAr", bot, rights)
    return jnp.einsum("xlcuA,xcdAr->xuldr", lt, br)


def replace_one_site_traces(envs: RowEnvs, top: jnp.ndarray, bot: jnp.ndarray,
                            candidates: jnp.ndarray) -> jnp.ndarray:
    """psi mantissas with site (row, x) replaced by each candidate tensor.

    candidates: [Lx, K, u, l, d, r] -> returns [Lx, K].
    Reference: `ReplaceOneSiteTrace`, bmps_contractor.h:854.
    """
    lx = top.shape[0]
    holes = punch_holes_row(envs, top, bot)
    return jnp.einsum("xuldr,xkuldr->xk", holes, candidates)


def replace_nn_site_traces(envs: RowEnvs, top: jnp.ndarray, bot: jnp.ndarray,
                           cand1: jnp.ndarray, cand2: jnp.ndarray) -> jnp.ndarray:
    """psi mantissas with sites (x, x+1) replaced by candidate pairs.

    cand1: [Lx-1, K1, u, l, d, r] candidates for the left site of each bond,
    cand2: [Lx-1, K2, u, l, d, r] for the right site.
    Returns [Lx-1, K1, K2]. Reference: `ReplaceNNSiteTrace`,
    bmps_contractor.h:869.
    """
    lx = top.shape[0]
    lefts = envs.lefts[:lx - 1]       # L[x]
    rights = envs.rights[2:]          # R[x+2]
    t1 = jnp.einsum("xalc,xauA->xluAc", lefts, top[:lx - 1])
    t1 = jnp.einsum("xluAc,xkuldr->xkdArc", t1, cand1)
    t1 = jnp.einsum("xkdArc,xcdC->xkArC", t1, bot[:lx - 1])
    t2 = jnp.einsum("xArC,xauA->xurCa", rights, top[1:])
    t2 = jnp.einsum("xurCa,xjuldr->xjdCla", t2, cand2)
    t2 = jnp.einsum("xjdCla,xcdC->xjalc", t2, bot[1:])
    return jnp.einsum("xkalc,xjalc->xkj", t1, t2)


def replace_tnn_site_traces(envs: RowEnvs, top: jnp.ndarray, bot: jnp.ndarray,
                            cand1: jnp.ndarray, mid: jnp.ndarray,
                            cand2: jnp.ndarray) -> jnp.ndarray:
    """psi mantissas with the third-NN in-row pair (x, x+2) replaced and the
    middle site x+1 unchanged.

    cand1: [Lx-2, K1, u, l, d, r], mid: [Lx-2, u, l, d, r] (= row[x+1]),
    cand2: [Lx-2, K2, u, l, d, r]. Returns [Lx-2, K1, K2].
    Reference: `ReplaceTNNSiteTrace`, bmps_contractor.h:904."""
    lx = top.shape[0]
    nb = lx - 2
    lefts = envs.lefts[:nb]
    rights = envs.rights[3:]
    t1 = jnp.einsum("xalc,xauA->xluAc", lefts, top[:nb])
    t1 = jnp.einsum("xluAc,xkuldr->xkdArc", t1, cand1)
    t1 = jnp.einsum("xkdArc,xcdC->xkArC", t1, bot[:nb])
    # middle column transfer (site x+1 unchanged)
    t1 = jnp.einsum("xkalc,xauA->xkluAc", t1, top[1:nb + 1])
    t1 = jnp.einsum("xkluAc,xuldr->xkdArc", t1, mid)
    t1 = jnp.einsum("xkdArc,xcdC->xkArC", t1, bot[1:nb + 1])
    t2 = jnp.einsum("xArC,xauA->xurCa", rights, top[2:])
    t2 = jnp.einsum("xurCa,xjuldr->xjdCla", t2, cand2)
    t2 = jnp.einsum("xjdCla,xcdC->xjalc", t2, bot[2:])
    return jnp.einsum("xkalc,xjalc->xkj", t1, t2)


# ---------------------------------------------------------------------------
# Variational compression (reference: MultiplyMPO VARIATION2Site/VARIATION1Site
# schemes, bmps_impl.h:406-437 + variational env sweeps :560-660)
# ---------------------------------------------------------------------------

def _overlap_env_left(guess, target):
    """OL[x] [chi, m]: overlap environments <guess|target> for columns < x.
    Edge closure at index 0 on both sides. Returns [Lx+1, chi, m]."""
    lx, chi = guess.shape[0], guess.shape[1]
    m = target.shape[1]
    init = jnp.zeros((chi, m), guess.dtype).at[0, 0].set(1.0)

    def step(env, xs):
        g_x, t_x = xs
        new = jnp.einsum("am,avb,mvn->bn", env, jnp.conj(g_x), t_x)
        return new, new

    _, ls = jax.lax.scan(step, init, (guess, target))
    return jnp.concatenate([init[None], ls], axis=0)


def _overlap_env_right(guess, target):
    lx, chi = guess.shape[0], guess.shape[1]
    m = target.shape[1]
    init = jnp.zeros((chi, m), guess.dtype).at[0, 0].set(1.0)

    def step(env, xs):
        g_x, t_x = xs
        new = jnp.einsum("bn,avb,mvn->am", env, jnp.conj(g_x), t_x)
        return new, new

    _, rs = jax.lax.scan(step, init, (guess, target), reverse=True)
    return jnp.concatenate([rs, init[None]], axis=0)


def _right_canonicalize_guess(guess):
    """LQ sweep right->left on a [Lx, chi, D, chi] MPS (edges closed at 0);
    keeps the represented (index-0-closed) state exact."""
    lx, chi, dv, _ = guess.shape
    gs = guess
    carry = jnp.eye(chi, dtype=guess.dtype)
    for x in range(lx - 1, 0, -1):
        t = jnp.einsum("avb,bc->avc", gs[x], carry)
        l_new, q = lq(t.reshape(chi, dv * chi))
        k = l_new.shape[1]
        if k < chi:
            l_new = jnp.pad(l_new, ((0, 0), (0, chi - k)))
            q = jnp.pad(q, ((0, chi - k), (0, 0)))
        gs = gs.at[x].set(q.reshape(chi, dv, chi))
        carry = l_new
    gs = gs.at[0].set(jnp.einsum("avb,bc->avc", gs[0], carry))
    return gs


def compress_variational(mps: jnp.ndarray, chi: int, trunc: TruncParams,
                         two_site: bool = True) -> CompressResult:
    """Variational MPS fitting compression: SVD init, then sweeps maximizing
    <guess|target> by local updates. two_site=True re-splits pairs with a
    truncated SVD (adapts the kept spectrum); False does single-site updates
    with QR shifts."""
    svd_trunc = TruncParams(trunc.d_max, trunc.d_min, trunc.trunc_err)
    res = compress(mps, chi, svd_trunc)
    guess = res.bmps
    lx, _, dv, _ = guess.shape
    target = mps

    def sweep(guess):
        # isometric environment frame: left part becomes left-canonical as we
        # sweep; the right part must be right-canonical for the local update
        # to be overlap-optimal.
        guess = _right_canonicalize_guess(guess)
        rights = _overlap_env_right(guess, target)
        # left-to-right pass with freshly grown left envs
        chi_ = guess.shape[1]
        m = target.shape[1]
        ol = jnp.zeros((chi_, m), guess.dtype).at[0, 0].set(1.0)
        if two_site:
            gs = guess
            for x in range(lx - 1):
                blk = jnp.einsum("am,mvn,nwp,bp->avwb", ol, target[x],
                                 target[x + 1], rights[x + 2])
                mat = blk.reshape(chi_ * dv, dv * chi_)
                u, s, vh, _ = truncated_svd(mat, TruncParams(chi_, trunc.d_min,
                                                             trunc.trunc_err))
                g1 = u.reshape(chi_, dv, chi_)
                g2 = (s[:, None] * vh).reshape(chi_, dv, chi_)
                gs = gs.at[x].set(g1).at[x + 1].set(g2)
                ol = jnp.einsum("am,avb,mvn->bn", ol, jnp.conj(g1), target[x])
            return gs
        else:
            gs = guess
            for x in range(lx):
                blk = jnp.einsum("am,mvn,bn->avb", ol, target[x],
                                 rights[x + 1])
                if x < lx - 1:
                    # move the orthogonality center right: keep Q, push R
                    # (qr_safe: padded blocks are rank-deficient and the
                    # builtin QR derivative NaNs on singular R)
                    q, r = qr_safe(blk.reshape(chi_ * dv, chi_))
                    k = q.shape[1]
                    if k < chi_:
                        q = jnp.pad(q, ((0, 0), (0, chi_ - k)))
                        r = jnp.pad(r, ((0, chi_ - k), (0, 0)))
                    gs = gs.at[x].set(q.reshape(chi_, dv, chi_))
                    gs = gs.at[x + 1].set(
                        jnp.einsum("ab,bvc->avc", r, gs[x + 1]))
                else:
                    gs = gs.at[x].set(blk)
                ol = jnp.einsum("am,avb,mvn->bn", ol, jnp.conj(gs[x]),
                                target[x])
            return gs

    for _ in range(trunc.var_sweeps):
        guess = sweep(guess)

    # After a full fitting pass every tensor has been replaced by target-
    # scale blocks, so the fitted MPS carries the TARGET's scale (the init
    # compression's log_norm must not be double counted).
    norms = jnp.sqrt(jnp.sum(jnp.abs(guess) ** 2, axis=(1, 2, 3)))
    norms = jnp.maximum(norms, jnp.finfo(guess.real.dtype).tiny)
    out = guess / norms[:, None, None, None]
    return CompressResult(out, jnp.sum(jnp.log(norms)), res.trunc_err)


# ---------------------------------------------------------------------------
# Fast matmul-only compression (TPU speed-of-light path).
#
# QDWH-SVD and Householder QR are iterative and slow on TPU (measured ~80ms
# per batched [32,256,256] SVD on v5e vs ~4ms for Cholesky+triangular-solve).
# This scheme replaces them with:
#   * Cholesky-LQ right-canonicalization: G = M M^H + eps, L = chol(G),
#     Q = L^{-1} M. The factorization M = L Q holds EXACTLY by construction
#     (only Q's orthonormality is eps-approximate, which merely degrades
#     truncation optimality, never correctness of the represented state);
#   * randomized-subspace truncation: project onto the column space captured
#     by Y = (M M^T)^q M Omega with a fixed random test matrix, orthonormalized
#     by Cholesky-QR. Exact when chi >= rank(M).
# ---------------------------------------------------------------------------

def _chol_lq(mat, eps_rel):
    """mat = L @ Q with Q eps-approximately row-orthonormal; exact product.
    The Gram matrix is trace-normalized before the Cholesky so the
    factorization is scale-invariant (f32 under/overflow safety).

    Gram + solve run at HIGHEST matmul precision: the TPU default (bf16
    passes) makes the Gram indefinite beyond the eps jitter and the
    Cholesky returns NaN."""
    m = mat.shape[0]
    g = jnp.matmul(mat, jnp.conj(mat.T),
                   precision=jax.lax.Precision.HIGHEST)
    # floor AFTER the division: tiny/m is denormal and XLA:CPU flushes
    # denormals to zero, turning a zero input into 0/0 = NaN
    tr = jnp.real(jnp.trace(g))
    scale = jnp.maximum(tr / m, jnp.finfo(mat.real.dtype).tiny)
    gn = g / scale
    l = jnp.linalg.cholesky(gn + eps_rel * jnp.eye(m, dtype=mat.dtype))
    l = l * jnp.sqrt(scale).astype(mat.dtype)
    q = jax.scipy.linalg.solve_triangular(l, mat, lower=True)
    return l, q


def _subspace_project(mat, chi, key, eps_rel, power_iters=0):
    """Left isometry Q [rows, chi] ~ dominant column space of mat, plus
    carry = Q^H mat. Matmul-only (randomized subspace + Cholesky-QR)."""
    rows, cols = mat.shape

    def orthonormalize(y):
        g = jnp.matmul(jnp.conj(y.T), y,
                       precision=jax.lax.Precision.HIGHEST)
        tr = jnp.real(jnp.trace(g))
        # floor AFTER dividing (denormal flush-to-zero safety, see _chol_lq)
        scale = jnp.maximum(tr / chi, jnp.finfo(mat.real.dtype).tiny)
        l = jnp.linalg.cholesky(g / scale
                                + eps_rel * jnp.eye(chi, dtype=mat.dtype))
        l = l * jnp.sqrt(scale).astype(mat.dtype)
        q = jax.scipy.linalg.solve_triangular(l, jnp.conj(y.T), lower=True)
        q = jnp.conj(q.T)
        # one Newton-Schulz step kills the O(eps) orthonormality bias
        return q @ (1.5 * jnp.eye(chi, dtype=mat.dtype)
                    - 0.5 * (jnp.conj(q.T) @ q))

    # power_iters=0 keeps the Cholesky conditioning at kappa(A)^2 and makes
    # the projection EXACT whenever rank(A) <= chi (range(A Omega) = range(A));
    # power iterations sharpen truncation when rank > chi but suppress weak
    # kept directions below the fp noise floor — opt in via TruncParams.
    omega = jax.random.normal(key, (cols, chi), mat.dtype)
    q = orthonormalize(mat @ omega)
    for _ in range(power_iters):
        q = orthonormalize(mat @ (jnp.conj(mat.T) @ q))
    carry = jnp.conj(q.T) @ mat                 # [chi, cols]
    return q, carry


def compress_fast(mps: jnp.ndarray, chi: int, trunc: TruncParams,
                  eps_rel: float | None = None,
                  power_iters: int = 0) -> CompressResult:
    """Matmul-only compression [Lx, m, D, m] -> [Lx, chi, D, chi]."""
    lx, m, dv, _ = mps.shape
    dtype = mps.dtype
    if eps_rel is None:
        eps_rel = 1e-12 if jnp.finfo(mps.real.dtype).bits >= 64 else 1e-5
    key = jax.random.PRNGKey(1234)  # fixed test matrix; deterministic

    left_t = mps[0, 0]
    right_t = mps[lx - 1, :, :, 0]

    l_last, q_last = _chol_lq(right_t, eps_rel)   # [m, m], [m, D]
    bc_last = q_last

    def rl_step(carry_l, b_x):
        t = jnp.einsum("avb,bc->avc", b_x, carry_l)
        l_new, q = _chol_lq(t.reshape(m, dv * m), eps_rel)
        return l_new, q.reshape(m, dv, m)

    if lx > 2:
        l_carry, bc_inner = jax.lax.scan(rl_step, l_last, mps[1:lx - 1],
                                         reverse=True)
    else:
        l_carry, bc_inner = l_last, jnp.zeros((0, m, dv, m), dtype)
    a0 = jnp.einsum("vb,bc->vc", left_t, l_carry)       # [D, m]

    # left-to-right randomized-subspace truncation
    q0, carry0 = _subspace_project(a0, chi, jax.random.fold_in(key, 0),
                                   eps_rel, power_iters)
    b_first = jnp.zeros((chi, dv, chi), dtype).at[0].set(q0)

    def lr_step(carry, xs):
        bc_x, k = xs
        t = jnp.einsum("cb,bvd->cvd", carry, bc_x)
        mat = t.reshape(chi * dv, m)
        q, new_carry = _subspace_project(mat, chi,
                                         jax.random.fold_in(key, k), eps_rel,
                                         power_iters)
        return new_carry, q.reshape(chi, dv, chi)

    if lx > 2:
        carry_c, b_inner = jax.lax.scan(lr_step, carry0,
                                        (bc_inner, jnp.arange(1, lx - 1)))
    else:
        carry_c, b_inner = carry0, jnp.zeros((0, chi, dv, chi), dtype)

    t_last = jnp.einsum("cb,bv->cv", carry_c, bc_last)
    b_last = jnp.zeros((chi, dv, chi), dtype).at[:, :, 0].set(t_last)

    out = jnp.concatenate([b_first[None], b_inner, b_last[None]], axis=0)
    norms = jnp.sqrt(jnp.sum(jnp.abs(out) ** 2, axis=(1, 2, 3)))
    norms = jnp.maximum(norms, jnp.finfo(out.real.dtype).tiny)
    out = out / norms[:, None, None, None]
    return CompressResult(out, jnp.sum(jnp.log(norms)),
                          jnp.zeros((), out.real.dtype))


# ---------------------------------------------------------------------------
# Sketch compression (randomized two-sided / generalized-Nystrom TT rounding).
#
# The Cholesky-LQ pass of `compress_fast` spends ~2/3 of its time in
# cholesky + triangular_solve, which lower to long sequential panel loops on
# TPU (measured: 29ms per [32]x[8,256,8,256] absorb vs 10.5ms for its Gram
# matmuls alone, v5e). This scheme removes ALL large dense factorizations:
#
#   psi viewed across bond b:  X_b = C_b D_b   (left/right half contractions)
#   generalized Nystrom:       X  ~= (X Omega)(Psi X Omega)^+ (Psi X)
#                                  = C_b V_b pinv(W_b^T V_b) W_b^T D_b
#   with V_b = D_b Omega [m, chi] and W_b = C_b^T Psi^T [m, chi+p] computed by
#   two *sketch scans* whose carries are [m, chi]-sized (pure matmuls, 16x
#   fewer FLOPs than a Gram pass), structured Gaussian mixing per column
#   (the recursive TT-sketch of Al Daas/Ballard/Benner et al., "Randomized
#   algorithms for rounding in the tensor-train format", SIAM J. Sci. Comput.
#   2023 — public method, re-derived here for the boundary-MPS layout).
#
# The only factorization left is a [chi+p, chi] regularized least-squares per
# bond, batched across ALL bonds in one call (chi=32-sized Cholesky).
# Scale safety: the bond replacement V (W^T V)^+ W^T is invariant under
# per-bond rescaling of V and W, so sketch carries are normalized per step.
# ---------------------------------------------------------------------------


def _sketch_pinv_apply(a, w, eps_rel):
    """G = pinv(a) @ w^T for batched a [B, l, chi], w [B, m, l] -> [B, chi, m]
    via eps-regularized normal equations (chi-sized Cholesky, one call)."""
    chi = a.shape[-1]
    g = jnp.einsum("blc,bld->bcd", jnp.conj(a), a,
                   precision=jax.lax.Precision.HIGHEST)    # [B, chi, chi]
    # normalize by the max diagonal (not trace/chi): the Gram is routinely
    # rank-deficient (rank <= D of chi), and f32 roundoff produces negative
    # eigenvalues at the MAX-eigenvalue scale — the jitter must dominate them
    diag = jnp.real(jnp.einsum("bcc->bc", g))
    scale = jnp.maximum(jnp.max(diag, axis=-1),
                        jnp.finfo(a.real.dtype).tiny)
    gn = g / scale[:, None, None]
    eye = jnp.eye(chi, dtype=a.dtype)
    l = jnp.linalg.cholesky(gn + eps_rel * eye)
    # rhs = a^H w^T : [B, chi, m]
    rhs = jnp.einsum("blc,bml->bcm", jnp.conj(a), w,
                     precision=jax.lax.Precision.HIGHEST)
    rhs = rhs / scale[:, None, None].astype(rhs.dtype)
    y = jax.scipy.linalg.solve_triangular(l, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.conj(jnp.swapaxes(l, -1, -2)), y, lower=False)


def compress_sketch(mps: jnp.ndarray, chi: int, trunc: TruncParams,
                    oversample: int = 8) -> CompressResult:
    """Matmul-only randomized compression [Lx, m, D, m] -> [Lx, chi, D, chi].

    See the block comment above. Deterministic: the Gaussian mixing blocks
    come from a fixed PRNG key, so every call (and every vmapped chain)
    shares the same sketch — amplitude ratios formed across calls stay
    consistent to the same truncated map."""
    lx, m, dv, _ = mps.shape
    dtype = mps.dtype
    rdt = mps.real.dtype if jnp.iscomplexobj(mps) else mps.dtype
    eps_rel = 1e-12 if jnp.finfo(rdt).bits >= 64 else 1e-5
    losk = chi + oversample
    key = jax.random.PRNGKey(20260816)
    kz_last, kz_mid, ky_first, ky_mid = jax.random.split(key, 4)

    # ---- right sketches V_b [lx-1, m, chi] (b = bond between cores b, b+1)
    z_last = jax.random.normal(kz_last, (dv, chi), rdt).astype(dtype) \
        / jnp.sqrt(jnp.asarray(float(dv), rdt)).astype(dtype)
    v_last = mps[lx - 1, :, :, 0] @ z_last                       # [m, chi]
    n0 = jnp.maximum(jnp.linalg.norm(v_last), jnp.finfo(rdt).tiny)
    v_last = v_last / n0

    def v_step(carry, xs):
        core, z = xs                                  # [m, dv, m], [dv*chi, chi]
        t = jnp.einsum("avc,ci->avi", core, carry)
        new = t.reshape(m, dv * chi) @ z
        n = jnp.maximum(jnp.linalg.norm(new), jnp.finfo(rdt).tiny)
        new = new / n
        return new, new

    if lx > 2:
        z_mid = jax.random.normal(kz_mid, (lx - 2, dv * chi, chi), rdt) \
            .astype(dtype) / jnp.sqrt(jnp.asarray(float(dv * chi), rdt)).astype(dtype)
        _, vs = jax.lax.scan(v_step, v_last, (mps[1:lx - 1], z_mid),
                             reverse=True)
        v = jnp.concatenate([vs, v_last[None]], axis=0)          # [lx-1, m, chi]
    else:
        v = v_last[None]

    # ---- left sketches W_b [lx-1, m, losk]
    y_first = jax.random.normal(ky_first, (dv, losk), rdt).astype(dtype) \
        / jnp.sqrt(jnp.asarray(float(dv), rdt)).astype(dtype)
    w_first = jnp.einsum("vc,vj->cj", mps[0, 0], y_first)        # [m, losk]
    nw = jnp.maximum(jnp.linalg.norm(w_first), jnp.finfo(rdt).tiny)
    w_first = w_first / nw

    def w_step(carry, xs):
        core, y = xs                                  # [m, dv, m], [dv, losk, losk]
        t = jnp.einsum("ai,avc->vic", carry, core)
        new = jnp.einsum("vic,vij->cj", t, y)
        n = jnp.maximum(jnp.linalg.norm(new), jnp.finfo(rdt).tiny)
        new = new / n
        return new, new

    if lx > 2:
        y_mid = jax.random.normal(ky_mid, (lx - 2, dv, losk, losk), rdt) \
            .astype(dtype) / jnp.sqrt(jnp.asarray(float(dv * losk), rdt)).astype(dtype)
        _, ws = jax.lax.scan(w_step, w_first, (mps[1:lx - 1], y_mid))
        w = jnp.concatenate([w_first[None], ws], axis=0)         # [lx-1, m, losk]
    else:
        w = w_first[None]

    # ---- per-bond oblique factors: A_b = W_b^T V_b, G_b = pinv(A_b) W_b^T
    a = jnp.einsum("bml,bmc->blc", w, v)                         # [lx-1, losk, chi]
    g = _sketch_pinv_apply(a, w, eps_rel)                        # [lx-1, chi, m]

    # ---- assemble cores (one batched contraction, no scan)
    first_mat = jnp.einsum("vc,cj->vj", mps[0, 0], v[0])         # [dv, chi]
    b_first = jnp.zeros((chi, dv, chi), dtype).at[0].set(first_mat)
    if lx > 2:
        b_inner = jnp.einsum("xka,xavc,xcj->xkvj",
                             g[:lx - 2], mps[1:lx - 1], v[1:])
    else:
        b_inner = jnp.zeros((0, chi, dv, chi), dtype)
    last_mat = jnp.einsum("ka,av->kv", g[lx - 2], mps[lx - 1, :, :, 0])
    b_last = jnp.zeros((chi, dv, chi), dtype).at[:, :, 0].set(last_mat)

    out = jnp.concatenate([b_first[None], b_inner, b_last[None]], axis=0)
    norms = jnp.sqrt(jnp.sum(jnp.abs(out) ** 2, axis=(1, 2, 3)))
    norms = jnp.maximum(norms, jnp.finfo(rdt).tiny)
    out = out / norms[:, None, None, None]
    return CompressResult(out, jnp.sum(jnp.log(norms)),
                          jnp.zeros((), rdt))


def absorb_row_sketch(bmps_arr: jnp.ndarray, row: jnp.ndarray, chi: int,
                      trunc: TruncParams, oversample: int = 8
                      ) -> CompressResult:
    """Fused multiply_mpo + compress_sketch that never materializes the
    grown [Lx, chi*D, D, chi*D] MPS (67MB/chain at production sizes — pure
    HBM traffic). The sketch recursions contract the (boundary, row) pair
    implicitly: grown core M_x[(a,l), v, (b,r)] = sum_u B[a,u,b] S[u,l,v,r].

    Same mathematical map as multiply_mpo -> compress_sketch (same fixed
    Gaussian mixing blocks, same bond pinv); only the contraction order
    differs."""
    lx, chi_in, du, _ = bmps_arr.shape
    dl = row.shape[2]
    dv = row.shape[3]                       # grown vertical leg = row d-leg
    m = chi_in * dl
    dtype = bmps_arr.dtype
    rdt = bmps_arr.real.dtype if jnp.iscomplexobj(bmps_arr) else dtype
    eps_rel = 1e-12 if jnp.finfo(rdt).bits >= 64 else 1e-5
    losk = chi + oversample
    key = jax.random.PRNGKey(20260816)
    kz_last, kz_mid, ky_first, ky_mid = jax.random.split(key, 4)

    def norm1(x):
        return x / jnp.maximum(jnp.linalg.norm(x), jnp.finfo(rdt).tiny)

    # ---- right sketches V_b [lx-1, m, chi], V stored as [chi_in, dl, chi]
    z_last = jax.random.normal(kz_last, (dv, chi), rdt).astype(dtype) \
        / jnp.sqrt(jnp.asarray(float(dv), rdt)).astype(dtype)
    # edge core x = lx-1: (b, r) closed at (0, 0)
    v_last = norm1(jnp.einsum("au,ulv,vi->ali", bmps_arr[lx - 1, :, :, 0],
                              row[lx - 1, :, :, :, 0], z_last))
    if lx > 2:
        z_mid = jax.random.normal(kz_mid, (lx - 2, dv * chi, chi), rdt) \
            .astype(dtype) / jnp.sqrt(jnp.asarray(float(dv * chi), rdt)) \
            .astype(dtype)

        def v_step(carry, xs):
            b_x, s_x, z = xs                 # [chi,du,chi], [u,l,v,r], [dv*chi,chi]
            v3 = carry                       # [chi_in, dl, chi] = (b, r, i)
            x1 = jnp.einsum("ulvr,bri->ulvbi", s_x, v3)
            t1 = jnp.einsum("aub,ulvbi->alvi", b_x, x1)
            new = t1.reshape(m, dv * chi) @ z
            new = norm1(new).reshape(chi_in, dl, chi)
            return new, new

        _, vs = jax.lax.scan(v_step, v_last, (bmps_arr[1:lx - 1],
                                              row[1:lx - 1], z_mid),
                             reverse=True)
        v = jnp.concatenate([vs, v_last[None]], axis=0)  # [lx-1, chi_in, dl, chi]
    else:
        v = v_last[None]

    # ---- left sketches W_b [lx-1, (b,r)-space, losk] stored [chi_in, dl, losk]
    y_first = jax.random.normal(ky_first, (dv, losk), rdt).astype(dtype) \
        / jnp.sqrt(jnp.asarray(float(dv), rdt)).astype(dtype)
    # edge core x = 0: (a, l) closed at (0, 0)
    w_first = norm1(jnp.einsum("ub,uvr,vj->brj", bmps_arr[0, 0],
                               row[0, :, 0, :, :], y_first))
    if lx > 2:
        y_mid = jax.random.normal(ky_mid, (lx - 2, dv, losk, losk), rdt) \
            .astype(dtype) / jnp.sqrt(jnp.asarray(float(dv * losk), rdt)) \
            .astype(dtype)

        def w_step(carry, xs):
            b_x, s_x, y = xs                 # y: [dv, losk, losk]
            w3 = carry                       # [chi_in, dl, losk] = (a, l, j)
            x1 = jnp.einsum("ulvr,alj->uvraj", s_x, w3)
            t1 = jnp.einsum("aub,uvraj->bvrj", b_x, x1)
            new = jnp.einsum("bvrj,vjJ->brJ", t1, y)
            new = norm1(new)
            return new, new

        _, ws = jax.lax.scan(w_step, w_first, (bmps_arr[1:lx - 1],
                                               row[1:lx - 1], y_mid))
        w = jnp.concatenate([w_first[None], ws], axis=0)
    else:
        w = w_first[None]

    # ---- cross matrices + bond pinv (shared with compress_sketch)
    a = jnp.einsum("xblj,xblc->xjc", w, v)               # [lx-1, losk, chi]
    g = _sketch_pinv_apply(a, w.reshape(lx - 1, m, losk), eps_rel)
    g3 = g.reshape(lx - 1, chi, chi_in, dl)              # [x, k, a, l]

    # ---- assemble cores
    first_mat = jnp.einsum("ub,uvr,brj->vj", bmps_arr[0, 0],
                           row[0, :, 0, :, :], v[0])     # [dv, chi]
    b_first = jnp.zeros((chi, dv, chi), dtype).at[0].set(first_mat)
    if lx > 2:
        q = jnp.einsum("xkal,xaub->xklub", g3[:lx - 2], bmps_arr[1:lx - 1])
        r = jnp.einsum("xklub,xulvr->xkbvr", q, row[1:lx - 1])
        b_inner = jnp.einsum("xkbvr,xbrj->xkvj", r, v[1:])
    else:
        b_inner = jnp.zeros((0, chi, dv, chi), dtype)
    last_mat = jnp.einsum("kal,au,ulv->kv", g3[lx - 2],
                          bmps_arr[lx - 1, :, :, 0], row[lx - 1, :, :, :, 0])
    b_last = jnp.zeros((chi, dv, chi), dtype).at[:, :, 0].set(last_mat)

    out = jnp.concatenate([b_first[None], b_inner, b_last[None]], axis=0)
    norms = jnp.sqrt(jnp.sum(jnp.abs(out) ** 2, axis=(1, 2, 3)))
    norms = jnp.maximum(norms, jnp.finfo(rdt).tiny)
    out = out / norms[:, None, None, None]
    return CompressResult(out, jnp.sum(jnp.log(norms)),
                          jnp.zeros((), rdt))


def entanglement_entropy(mps: jnp.ndarray, x: int) -> jnp.ndarray:
    """Von Neumann entanglement entropy of a boundary MPS across bond x
    (between sites x-1 and x), 1 <= x <= Lx-1. (Reference: BMPS
    entanglement entropy, one_dim_tn/boundary_mps/bmps_impl.h:266.)

    mps: [Lx, chi, D, chi] with edge content at index 0. The entanglement
    spectrum is the eigenvalue set of G_L G_R (left/right Gram matrices of
    the cut), i.e. the squared Schmidt values."""
    lx, chi = mps.shape[0], mps.shape[1]
    rdt = mps.real.dtype if jnp.iscomplexobj(mps) else mps.dtype

    def gl_step(g, t):
        g2 = jnp.einsum("aA,avb,AvB->bB", g, t, jnp.conj(t))
        n = jnp.maximum(jnp.real(jnp.trace(g2)), jnp.finfo(rdt).tiny)
        return g2 / n, None

    def gr_step(g, t):
        g2 = jnp.einsum("avb,AvB,bB->aA", t, jnp.conj(t), g)
        n = jnp.maximum(jnp.real(jnp.trace(g2)), jnp.finfo(rdt).tiny)
        return g2 / n, None

    g0 = jnp.zeros((chi, chi), mps.dtype).at[0, 0].set(1.0)
    gl, _ = jax.lax.scan(gl_step, g0, mps[:x])
    gr, _ = jax.lax.scan(gr_step, g0, mps[x:], reverse=True)
    lam = jnp.linalg.eigvals(gl @ gr) if jnp.iscomplexobj(mps) else \
        jnp.linalg.eigvals((gl @ gr).astype(jnp.complex128))
    p = jnp.clip(jnp.real(lam), 0.0, None)
    p = p / jnp.maximum(jnp.sum(p), jnp.finfo(rdt).tiny)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-300)),
                              0.0))
