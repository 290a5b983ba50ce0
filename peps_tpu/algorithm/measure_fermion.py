"""Fermionic measurement extensions: t-J singlet-pair correlations.

Reference: `singlet_pair_correlation_measurement_mixin.h` (561 LoC; the t-J
superconducting <Delta^dag_b Delta_b'> correlator via BMPSWalker
"excited-state propagation").

TPU version: bond pairs b = (s, s+step), b' = (k, k+step) along a lattice
line — in-row horizontal bonds and (via the diagonal-reflected lattice)
in-column vertical bonds. Delta_b = (c_{i up} c_{j dn} - c_{i dn} c_{j up})
/ sqrt(2). Because each Delta is fermion-parity-even, no Jordan-Wigner
string stretches between the bonds; all signs are computed exactly by
sequential parity counting on the occupation vector (vectorized cumsums)
in the fixed row-major mode order m = 2*(y*Lx+x) + spin. Amplitude ratios
psi(s')/psi(s) for the 4-site replacements come from the same walker
machinery as the bosonic correlators.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.contraction import bmps
from peps_tpu.lattice import transpose_tps
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import project


def _estimator_value(val):
    """Per-sample estimator dtype policy: real states keep real values
    (standard VMC); complex states keep the FULL complex value — an
    off-diagonal <Delta^dag(b) Delta(b')> entry is not Hermitian by itself,
    so its per-sample imaginary part carries physics and must survive to
    the accumulator (reference two-type matrix compiles these mixins for
    complex TenElemT too, tests/CMakeLists.txt:59-86)."""
    return val if jnp.iscomplexobj(val) else jnp.real(val)


class GradedEnvShared(NamedTuple):
    """Per-config resources shared by BOTH graded pair-corr walkers (and any
    future graded env observable): the dressed projected network, its full
    BMPS env stacks, the flag-conditioned candidate tensors, and the snake
    flip masks. Building these once per configuration in the measurement
    executor's env pass (instead of once per walker) halves the env cost of
    the pair-corr registry."""
    net: jnp.ndarray
    stacks: object
    cands: jnp.ndarray
    flip: jnp.ndarray


def graded_env_shared(tps, config, space, chi: int,
                      trunc: TruncParams) -> GradedEnvShared:
    from peps_tpu.fermion.convert import fermion_project
    from peps_tpu.fermion.tables import (fermion_candidates,
                                         fermion_flip_mask)

    ly, lx = tps.shape[0], tps.shape[1]
    net = fermion_project(tps, config, space)
    stacks = bmps.all_env_stacks(net, chi, trunc)
    cands = fermion_candidates(tps, config, space)
    flip = fermion_flip_mask(config, space, ly, lx, tps.dtype)
    return GradedEnvShared(net, stacks, cands, flip)

# t-J local basis: 0 = empty, 1 = up, 2 = down
_N_UP = np.array([0, 1, 0])
_N_DN = np.array([0, 0, 1])


def _occ_vector(config, lx):
    """Mode occupations [2N] with mode order m = 2*(y*lx+x) + spin."""
    n_up = jnp.asarray(_N_UP)[config].reshape(-1)
    n_dn = jnp.asarray(_N_DN)[config].reshape(-1)
    return jnp.stack([n_up, n_dn], axis=1).reshape(-1)


def _apply_op(occ, mode, is_cdag):
    """Apply c/c^dag at `mode` with parity counting. Returns (sign, occ')
    where sign = 0 if the application annihilates."""
    prefix = jnp.cumsum(occ) - occ          # sum of occ[m' < mode] at mode
    par = prefix[mode]
    cur = occ[mode]
    ok = jnp.where(is_cdag, cur == 0, cur == 1)
    sign = jnp.where(ok, jnp.where(par % 2 == 0, 1.0, -1.0), 0.0)
    occ = occ.at[mode].set(jnp.where(is_cdag, 1, 0))
    return sign, occ


def _pair_op_sign(occ_sprime, i, j, k, l, sa, sb):
    """Sign of <s| c^dag_{j,sa_bar} c^dag_{i,sa} c_{k,sb} c_{l,sb_bar} |s'>
    applied to occ(s') (flat site indices; spins 0=up, 1=dn)."""
    sign = jnp.ones(())
    occ = occ_sprime
    for mode, is_cdag in (((2 * l + (1 - sb)), False),
                          ((2 * k + sb), False),
                          ((2 * i + sa), True),
                          ((2 * j + (1 - sa)), True)):
        s, occ = _apply_op(occ, mode, is_cdag)
        sign = sign * s
    return sign


def _pair_corr_frame(tps_f, config_f, occ_s, chi: int, trunc: TruncParams,
                     stride_row: int, stride_pos: int):
    """<Delta^dag Delta> walker in one lattice frame.

    tps_f/config_f: the (possibly transposed) TPS and configuration that the
    BMPS walker scans row by row. occ_s: mode occupations of the ORIGINAL
    configuration (row-major mode order). The original flat site index of
    in-frame position (r, i) is r*stride_row + i*stride_pos; the bond at
    (r, i) pairs it with (r, i+1) i.e. flat offset +stride_pos.

    Returns [Nrows_f, Nb, Nb] with Nb = frame row length - 1; entry (r,a,b)
    estimates <Delta^dag_{bond a} Delta_{bond b}>, supported when the sample
    carries the singlet pair at bond a and the two holes at bond b (zero
    unless |a-b| > 1). Upper triangle (a < b): pair left of the holes;
    lower triangle (a > b): pair right of the holes — BOTH orientations of
    each rare two-adjacent-holes configuration contribute, doubling the
    estimator's support (reference mixin collects one orientation;
    hermiticity <Dag_a D_b> = conj(<Dag_b D_a>) is what the distance-decay
    aggregation relies on)."""
    ly, lx, d = tps_f.shape[0], tps_f.shape[1], tps_f.shape[2]
    tn = project(tps_f, config_f)
    stacks = bmps.all_env_stacks(tn, chi, trunc)
    nb = lx - 1
    empty = 0

    def per_row(top, bot, row, cands, cfg_row, r):
        envs = bmps.row_envs(top, bot, row)

        # validity of b = (i, i+1) as an annihilated singlet in <s|:
        # s(i), s(i+1) in {(up,dn), (dn,up)}; Delta^dag creates the
        # (up,dn)-(dn,up) combination /sqrt2; channel sa = spin at site i.
        c1, c2 = cfg_row[:nb], cfg_row[1:]
        pair_ud = (c1 == 1) & (c2 == 2)
        pair_du = (c1 == 2) & (c2 == 1)
        b_valid = pair_ud | pair_du
        sa = jnp.where(pair_du, 1, 0)           # spin index at site i
        # b' = (k, k+1) must be empty in s
        bp_valid = (c1 == empty) & (c2 == empty)

        def for_i(i):
            def start_env(s0, s1):
                e = bmps._col_transfer_left(envs.lefts[i], top[i],
                                            cands[i][s0], bot[i])
                return bmps._col_transfer_left(e, top[i + 1],
                                               cands[i + 1][s1], bot[i + 1])

            # orientation A walker: cols i, i+1 replaced by EMPTY (the pair
            # in the sample is annihilated at bond i, created at bond k)
            e_a = start_env(empty, empty)
            # orientation B walkers: cols i, i+1 replaced by the CREATED
            # pair, one per singlet channel (the sample's pair at bond k is
            # annihilated, holes at bond i filled)
            e_ud = start_env(1, 2)
            e_du = start_env(2, 1)

            # psi reference in the same env frame: lefts[i] .. rights[i+2]
            # (loop-invariant over k)
            cpair = bmps._col_transfer_left(envs.lefts[i], top[i],
                                            row[i], bot[i])
            cpair = bmps._col_transfer_left(cpair, top[i + 1],
                                            row[i + 1], bot[i + 1])
            psi_ref = jnp.einsum("alc,alc->", cpair, envs.rights[i + 2])
            safe = jnp.where(psi_ref == 0, 1.0, psi_ref)

            def scan_k(carry, k):
                e_a, e_ud, e_du = carry

                def close(e, state1, state2):
                    c = bmps._col_transfer_left(e, top[k], cands[k][state1],
                                                bot[k])
                    c = bmps._col_transfer_left(c, top[k + 1],
                                                cands[k + 1][state2],
                                                bot[k + 1])
                    val = jnp.einsum("alc,alc->", c, envs.rights[k + 2])
                    return val * jnp.exp(envs.log_rights[k + 2]
                                         - envs.log_rights[i + 2])
                amp_ud = close(e_a, 1, 2)
                amp_du = close(e_a, 2, 1)
                amp_ud_rev = close(e_ud, empty, empty)
                amp_du_rev = close(e_du, empty, empty)

                # fermionic signs for each channel via parity counting on the
                # ORIGINAL row-major mode order
                site_i = r * stride_row + i * stride_pos
                site_j = site_i + stride_pos
                site_k = r * stride_row + k * stride_pos
                site_l = site_k + stride_pos

                # occ(s'): pair bond emptied, hole bond filled per channel.
                # Orientation A: pair at (i,j) -> holes, pair created (k,l);
                # orientation B: the mirror.
                def occ_sprime(up_first, pair_at_start):
                    sp, sq = jnp.where(pair_at_start, site_i, site_k), \
                        jnp.where(pair_at_start, site_j, site_l)
                    hp, hq = jnp.where(pair_at_start, site_k, site_i), \
                        jnp.where(pair_at_start, site_l, site_j)
                    occ = occ_s
                    occ = occ.at[2 * sp + 0].set(0)
                    occ = occ.at[2 * sp + 1].set(0)
                    occ = occ.at[2 * sq + 0].set(0)
                    occ = occ.at[2 * sq + 1].set(0)
                    occ = occ.at[2 * hp + 0].set(jnp.where(up_first, 1, 0))
                    occ = occ.at[2 * hp + 1].set(jnp.where(up_first, 0, 1))
                    occ = occ.at[2 * hq + 0].set(jnp.where(up_first, 0, 1))
                    occ = occ.at[2 * hq + 1].set(jnp.where(up_first, 1, 0))
                    return occ

                def chan(amp, up_first, sb):
                    occp = occ_sprime(jnp.asarray(up_first), True)
                    sgn = _pair_op_sign(occp, site_i, site_j,
                                        site_k, site_l, sa[i], sb)
                    # singlet coefficients: -1 for the (dn,up) members
                    coef_a = jnp.where(sa[i] == 0, 1.0, -1.0)
                    coef_b = jnp.where(sb == 0, 1.0, -1.0)
                    return 0.5 * coef_a * coef_b * sgn * amp

                def chan_rev(amp, up_first, sb):
                    # <Delta^dag_k Delta_i>: annihilated pair channel is the
                    # sample's pair at bond k (sa[k]); created channel sb at
                    # bond i
                    occp = occ_sprime(jnp.asarray(up_first), False)
                    sgn = _pair_op_sign(occp, site_k, site_l,
                                        site_i, site_j, sa[k], sb)
                    coef_a = jnp.where(sa[k] == 0, 1.0, -1.0)
                    coef_b = jnp.where(sb == 0, 1.0, -1.0)
                    return 0.5 * coef_a * coef_b * sgn * amp

                val = chan(amp_ud, True, 0) + chan(amp_du, False, 1)
                valid = b_valid[i] & bp_valid[k] & (k > i + 1)
                out = jnp.where(valid, val / safe, 0.0)

                val_rev = chan_rev(amp_ud_rev, True, 0) \
                    + chan_rev(amp_du_rev, False, 1)
                valid_rev = bp_valid[i] & b_valid[k] & (k > i + 1)
                out_rev = jnp.where(valid_rev, val_rev / safe, 0.0)

                def prop(e):
                    nxt = bmps._col_transfer_left(e, top[k], row[k], bot[k])
                    return jnp.where(k > i + 1, nxt, e)

                return (prop(e_a), prop(e_ud), prop(e_du)), (out, out_rev)

            _, (vals, vals_rev) = jax.lax.scan(scan_k, (e_a, e_ud, e_du),
                                               jnp.arange(nb))
            return vals, vals_rev

        vals, vals_rev = jax.vmap(for_i)(jnp.arange(nb))
        # orientation B estimates <Dag_k D_i> -> entry (k, i): lower triangle
        return vals + vals_rev.T

    return jax.vmap(per_row)(stacks.tops[:ly], stacks.bots[1:], tn, tps_f,
                             config_f, jnp.arange(ly))


def tj_singlet_pair_corr_row(tps, config, chi: int, trunc: TruncParams):
    """<Delta^dag_{(y,i)} Delta_{(y,k)}> estimator table [Ly, Lx-1, Lx-1]
    (horizontal bonds at columns i and k of the same row; zero unless
    |i-k| > 1 and the sample supports the transition — entry (i,k) is
    supported when the pair sits at bond i and the holes at bond k, in
    EITHER order of i and k)."""
    lx = tps.shape[1]
    occ_s = _occ_vector(config, lx)
    return _pair_corr_frame(tps, config, occ_s, chi, trunc,
                            stride_row=lx, stride_pos=1)


def tj_singlet_pair_corr_graded(tps, config, space, chi: int,
                                trunc: TruncParams, frame: str = "row"):
    """<Delta^dag Delta> estimator on a Z2-GRADED t-J state.

    The graded state's amplitudes are defined in the snake-order JW basis
    (peps_tpu.fermion.exact), so operator signs are counted in snake mode
    order and amplitude ratios come from batched full recomputes of the
    dressed projected network (fermion_project) — the graded analogue of
    the walker scans (env-shared graded walkers are a later optimization).

    frame="row": horizontal bond pairs, table [Ly, Lx-1, Lx-1];
    frame="col": vertical bond pairs, table [Lx, Ly-1, Ly-1]."""
    from peps_tpu.fermion.exact import snake_order
    from peps_tpu.fermion.vmc import log_abs_psi_fermion

    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    assert d == 3, "t-J basis (0=empty, 1=up, 2=down) required"
    pos_np = np.zeros((ly, lx), np.int32)
    for p, (y, x) in enumerate(snake_order(ly, lx)):
        pos_np[y, x] = p
    pos = jnp.asarray(pos_np)

    if frame == "row":
        nrows, nb = ly, lx - 1
        def sites(r, i):            # bond i of line r -> two (y, x) pairs
            return (r, i), (r, i + 1)
    else:
        nrows, nb = lx, ly - 1
        def sites(r, i):
            return (i, r), (i + 1, r)

    log0, mant0 = log_abs_psi_fermion(tps, config, space, chi, trunc)
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype

    def phase(m):
        if jnp.iscomplexobj(m):
            return m / jnp.maximum(jnp.abs(m), jnp.finfo(rdt).tiny)
        return jnp.sign(m)

    ph0 = phase(mant0)
    inv_ph0 = jnp.conj(ph0) if jnp.iscomplexobj(mant0) else ph0

    # snake-order mode occupations of the sample
    n_up = jnp.asarray(_N_UP)[config]
    n_dn = jnp.asarray(_N_DN)[config]
    occ_s = jnp.zeros((2 * ly * lx,), jnp.int32)
    occ_s = occ_s.at[2 * pos.reshape(-1)].set(
        n_up.reshape(-1).astype(jnp.int32))
    occ_s = occ_s.at[2 * pos.reshape(-1) + 1].set(
        n_dn.reshape(-1).astype(jnp.int32))

    r_idx, i_idx, k_idx, ch_idx = jnp.meshgrid(
        jnp.arange(nrows), jnp.arange(nb), jnp.arange(nb), jnp.arange(2),
        indexing="ij")
    flat = (r_idx.reshape(-1), i_idx.reshape(-1), k_idx.reshape(-1),
            ch_idx.reshape(-1))

    def one(r, a, b, ch):
        """Entry (a, b) = <Delta^dag_a Delta_b>, channel ch of the created
        pair. Supported when the sample has the pair at bond a and holes at
        bond b, for BOTH orderings of (a, b) (|a-b| > 1)."""
        (y1, x1), (y2, x2) = sites(r, a)     # pair bond (annihilated in s)
        (y3, x3), (y4, x4) = sites(r, b)     # hole bond (pair created)
        c_i, c_j = config[y1, x1], config[y2, x2]
        c_k, c_l = config[y3, x3], config[y4, x4]
        pair_ud = (c_i == 1) & (c_j == 2)
        pair_du = (c_i == 2) & (c_j == 1)
        gap = jnp.abs(a - b) > 1
        valid = (pair_ud | pair_du) & (c_k == 0) & (c_l == 0) & gap
        sa = jnp.where(pair_du, 1, 0)
        # channel ch: 0 -> (up, dn) at b', 1 -> (dn, up)
        s1 = jnp.where(ch == 0, 1, 2)
        s2 = jnp.where(ch == 0, 2, 1)
        cfg_p = config.at[y1, x1].set(0).at[y2, x2].set(0) \
                      .at[y3, x3].set(s1).at[y4, x4].set(s2)
        la, mant = log_abs_psi_fermion(tps, cfg_p, space, chi, trunc)
        ratio = phase(mant) * inv_ph0 * jnp.exp(jnp.minimum(la - log0, 60.0))
        # snake-order parity counting on occ(s')
        p_i, p_j = pos[y1, x1], pos[y2, x2]
        p_k, p_l = pos[y3, x3], pos[y4, x4]
        up_first = ch == 0
        occ = occ_s
        occ = occ.at[2 * p_i].set(0).at[2 * p_i + 1].set(0)
        occ = occ.at[2 * p_j].set(0).at[2 * p_j + 1].set(0)
        occ = occ.at[2 * p_k].set(jnp.where(up_first, 1, 0))
        occ = occ.at[2 * p_k + 1].set(jnp.where(up_first, 0, 1))
        occ = occ.at[2 * p_l].set(jnp.where(up_first, 0, 1))
        occ = occ.at[2 * p_l + 1].set(jnp.where(up_first, 1, 0))
        sgn = _pair_op_sign(occ, p_i, p_j, p_k, p_l, sa,
                            jnp.where(up_first, 0, 1))
        coef_a = jnp.where(sa == 0, 1.0, -1.0)
        coef_b = jnp.where(up_first, 1.0, -1.0)
        val = 0.5 * coef_a * coef_b * sgn.astype(ratio.dtype) * ratio
        return jnp.where(valid, _estimator_value(val),
                         jnp.zeros((), _estimator_value(val).dtype))

    vals = jax.lax.map(lambda args: one(*args), flat, batch_size=64)
    table = vals.reshape(nrows, nb, nb, 2).sum(-1)
    return table


def tj_singlet_pair_corr_col(tps, config, chi: int, trunc: TruncParams):
    """<Delta^dag Delta> for VERTICAL bond pairs in the same column:
    table [Lx, Ly-1, Ly-1], entry (x, i, k) pairs vertical bonds
    ((i,x),(i+1,x)) and ((k,x),(k+1,x)). Computed on the diagonal-reflected
    lattice (columns become walker rows); operator signs stay in the
    original row-major mode order, so the value matches the row-frame
    convention (reference: the mixin's vertical-bond geometries,
    singlet_pair_correlation_measurement_mixin.h)."""
    lx = tps.shape[1]
    occ_s = _occ_vector(config, lx)
    return _pair_corr_frame(transpose_tps(tps), config.T, occ_s, chi, trunc,
                            stride_row=1, stride_pos=lx)


def _bmps_overlap(a, b):
    """Scalar closure of a top-type x bottom-type boundary-MPS pair living
    on the same horizontal bond layer (vertical legs contracted pairwise).
    a, b: [Lx, chi, D, chi], edges closed at index 0. Returns
    (mantissa, log_weight)."""
    chi = a.shape[1]
    rdt = a.real.dtype if jnp.iscomplexobj(a) else a.dtype
    init = (jnp.zeros((chi, chi), a.dtype).at[0, 0].set(1.0),
            jnp.zeros((), rdt))

    def step(carry, xs):
        m, logw = carry
        ta, tb = xs
        m2 = jnp.einsum("ac,avb,cvd->bd", m, ta, tb)
        n = jnp.maximum(jnp.linalg.norm(m2), jnp.finfo(rdt).tiny)
        return (m2 / n, logw + jnp.log(n)), None

    (m, logw), _ = jax.lax.scan(step, init, (a, b))
    return m[0, 0], logw


def tj_singlet_pair_corr_graded_colshared(tps, config, space, chi: int,
                                          trunc: TruncParams,
                                          shared: GradedEnvShared | None
                                          = None):
    """Env-shared <Delta^dag Delta> walker on a GRADED t-J state for
    VERTICAL bond pairs in the same column — replaces the full-recompute
    tj_singlet_pair_corr_graded(..., "col") (O(N) contractions per entry)
    with excited-BMPS propagation.

    Geometry (snake-interval analysis): replacing vertical bond
    ((i,x),(i+1,x)) flips the snake prefix parity exactly on the interval
    between the two sites — the remaining columns of rows i and i+1
    (x' > x for even i, x' < x for odd i) — and NOWHERE below, because the
    two parity changes cancel. So an "excited" top boundary MPS that
    absorbs rows i, i+1 with {flip masks on the interval + candidate
    tensors at column x} and then absorbs PLAIN rows downward carries the
    whole first-bond modification; the second bond needs only a two-row
    upward absorption into the shared bottom stack. Per (column, start
    bond) the scan over end bonds k costs one row absorption + one cheap
    BMPS-BMPS overlap each, all vmapped over (x, i) lanes.

    Operator signs are exact sequential parity counts in snake mode order —
    identical to the full-recompute path. Returns [Lx, Ly-1, Ly-1]
    (reference: the vertical-bond geometries of
    singlet_pair_correlation_measurement_mixin.h)."""
    from peps_tpu.fermion.exact import snake_order

    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    assert d == 3, "t-J basis required"
    if shared is None:
        shared = graded_env_shared(tps, config, space, chi, trunc)
    net, stacks, cands, flip = shared
    nb = ly - 1
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype

    # psi(s) from the shared top stack
    final = stacks.tops[ly]
    v0 = bmps.e0(final.shape[1], net.dtype)

    def close_step(v, b_x):
        return v @ b_x[:, 0, :], None

    v, _ = jax.lax.scan(close_step, v0, final)
    mant0 = v[0]
    log0 = stacks.log_tops[ly]

    def phase(m):
        if jnp.iscomplexobj(m):
            return m / jnp.maximum(jnp.abs(m), jnp.finfo(rdt).tiny)
        return jnp.sign(m)

    inv_ph0 = jnp.conj(phase(mant0)) if jnp.iscomplexobj(mant0) \
        else phase(mant0)
    log_abs0 = jnp.log(jnp.maximum(jnp.abs(mant0), jnp.finfo(rdt).tiny)) \
        + log0

    # snake positions / occupations (same conventions as the row walker)
    pos_np = np.zeros((ly, lx), np.int32)
    for p, (y, x) in enumerate(snake_order(ly, lx)):
        pos_np[y, x] = p
    pos = jnp.asarray(pos_np)
    n_up = jnp.asarray(_N_UP)[config]
    n_dn = jnp.asarray(_N_DN)[config]
    occ_s = jnp.zeros((2 * ly * lx,), jnp.int32)
    occ_s = occ_s.at[2 * pos.reshape(-1)].set(
        n_up.reshape(-1).astype(jnp.int32))
    occ_s = occ_s.at[2 * pos.reshape(-1) + 1].set(
        n_dn.reshape(-1).astype(jnp.int32))

    # bond validity tables [Ly-1, Lx]
    c1, c2 = config[:-1, :], config[1:, :]
    pair_ud = (c1 == 1) & (c2 == 2)
    pair_du = (c1 == 2) & (c2 == 1)
    b_valid = pair_ud | pair_du
    sa_tab = jnp.where(pair_du, 1, 0)
    bp_valid = (c1 == 0) & (c2 == 0)

    cols = jnp.arange(lx)

    def mod_rows(y_first, x, s_first, s_second):
        """net rows y_first, y_first+1 with the bond-replacement dressing:
        flip masks on the snake interval and flag-conditioned candidates
        (s_first flag 0, s_second flag 1) at column x."""
        region = jnp.where(y_first % 2 == 0, cols > x, cols < x)
        row_a = jnp.take(net, y_first, axis=0)
        row_b = jnp.take(net, y_first + 1, axis=0)
        fl_a = jnp.take(flip, y_first, axis=0)
        fl_b = jnp.take(flip, y_first + 1, axis=0)
        reg = region[:, None, None, None, None]
        row_a = jnp.where(reg, row_a * fl_a, row_a)
        row_b = jnp.where(reg, row_b * fl_b, row_b)
        ca = jnp.take(jnp.take(jnp.take(cands, y_first, axis=0), x, axis=0),
                      s_first, axis=0)[0]
        cb = jnp.take(jnp.take(jnp.take(cands, y_first + 1, axis=0), x,
                               axis=0), s_second, axis=0)[1]
        row_a = row_a.at[x].set(ca)
        row_b = row_b.at[x].set(cb)
        return row_a, row_b

    def vflip_row(row):
        return row.transpose(0, 3, 2, 1, 4)     # (u,l,d,r) -> (d,l,u,r)

    # excited bottoms: bots[k+2] <- modified row k+1 <- modified row k,
    # per (x, k, channel). Channel 0 -> (up, dn) at b', 1 -> (dn, up),
    # 2 -> (empty, empty) (the orientation-B close: the sample's pair at
    # bond k is annihilated).
    def build_ebot(x, k, ch):
        s1 = jnp.where(ch == 0, 1, jnp.where(ch == 1, 2, 0))
        s2 = jnp.where(ch == 0, 2, jnp.where(ch == 1, 1, 0))
        row_a, row_b = mod_rows(k, x, s1, s2)
        b = jnp.take(stacks.bots, k + 2, axis=0)
        lb = jnp.take(stacks.log_bots, k + 2)
        r1 = bmps.absorb_row(b, vflip_row(row_b), chi, trunc)
        r2 = bmps.absorb_row(r1.bmps, vflip_row(row_a), chi, trunc)
        return r2.bmps, lb + r1.log_norm + r2.log_norm

    ebots, log_ebots = jax.vmap(
        lambda x: jax.vmap(
            lambda k: jax.vmap(lambda ch: build_ebot(x, k, ch))(
                jnp.arange(3)))(jnp.arange(nb)))(cols)
    # ebots: [Lx, nb, 3, Lx, chi, D, chi]; log_ebots: [Lx, nb, 3]

    empty = 0

    def lane(x, i):
        """All entries (i, k) for start bond (i, x), both orientations:
        returns ([nb] orientation-A sums, [nb] orientation-B sums)."""
        def start_top(s1, s2):
            row_a, row_b = mod_rows(i, x, s1, s2)
            t = jnp.take(stacks.tops, i, axis=0)
            lt = jnp.take(stacks.log_tops, i)
            r1 = bmps.absorb_row(t, row_a, chi, trunc)
            r2 = bmps.absorb_row(r1.bmps, row_b, chi, trunc)
            return r2.bmps, lt + r1.log_norm + r2.log_norm

        ex_init = (start_top(empty, empty),   # orientation A: pair at i out
                   start_top(1, 2),           # orientation B channels:
                   start_top(2, 1))           # pair created at bond i
        eb_x = ebots[x]                     # [nb, 3, Lx, chi, D, chi]
        leb_x = log_ebots[x]

        def scan_k(carry, k):
            (ex_a, lex_a), (ex_ud, lex_ud), (ex_du, lex_du) = carry

            def ratio_of(ex, lex, ch):
                mant, lov = _bmps_overlap(ex, eb_x[k, ch])
                la = jnp.log(jnp.maximum(jnp.abs(mant),
                                         jnp.finfo(rdt).tiny)) \
                    + lov + lex + leb_x[k, ch]
                return phase(mant) * inv_ph0 * jnp.exp(
                    jnp.minimum(la - log_abs0, 60.0))

            p_i, p_j = pos[i, x], pos[i + 1, x]
            p_k, p_l = pos[k, x], pos[k + 1, x]

            def occ_sprime(up_first, pair_at_start):
                sp = jnp.where(pair_at_start, p_i, p_k)
                sq = jnp.where(pair_at_start, p_j, p_l)
                hp = jnp.where(pair_at_start, p_k, p_i)
                hq = jnp.where(pair_at_start, p_l, p_j)
                occ = occ_s
                occ = occ.at[2 * sp].set(0).at[2 * sp + 1].set(0)
                occ = occ.at[2 * sq].set(0).at[2 * sq + 1].set(0)
                occ = occ.at[2 * hp].set(jnp.where(up_first, 1, 0))
                occ = occ.at[2 * hp + 1].set(jnp.where(up_first, 0, 1))
                occ = occ.at[2 * hq].set(jnp.where(up_first, 0, 1))
                occ = occ.at[2 * hq + 1].set(jnp.where(up_first, 1, 0))
                return occ

            def close(ch):
                ratio = ratio_of(ex_a, lex_a, ch)
                up_first = ch == 0
                occ = occ_sprime(jnp.asarray(up_first), True)
                sgn = _pair_op_sign(occ, p_i, p_j, p_k, p_l, sa_tab[i, x],
                                    jnp.where(up_first, 0, 1))
                coef_a = jnp.where(sa_tab[i, x] == 0, 1.0, -1.0)
                coef_b = jnp.where(up_first, 1.0, -1.0)
                return 0.5 * coef_a * coef_b * sgn.astype(ratio.dtype) \
                    * ratio

            def close_rev(ex, lex, up_first, sb):
                ratio = ratio_of(ex, lex, 2)
                occ = occ_sprime(jnp.asarray(up_first), False)
                sgn = _pair_op_sign(occ, p_k, p_l, p_i, p_j, sa_tab[k, x],
                                    sb)
                coef_a = jnp.where(sa_tab[k, x] == 0, 1.0, -1.0)
                coef_b = jnp.where(sb == 0, 1.0, -1.0)
                return 0.5 * coef_a * coef_b * sgn.astype(ratio.dtype) \
                    * ratio

            val = close(0) + close(1)
            valid = b_valid[i, x] & bp_valid[k, x] & (k > i + 1)
            out = jnp.where(valid, _estimator_value(val),
                            jnp.zeros((), _estimator_value(val).dtype))

            val_rev = close_rev(ex_ud, lex_ud, True, 0) \
                + close_rev(ex_du, lex_du, False, 1)
            valid_rev = bp_valid[i, x] & b_valid[k, x] & (k > i + 1)
            out_rev = jnp.where(valid_rev, _estimator_value(val_rev),
                                jnp.zeros((), _estimator_value(val_rev).dtype))

            # propagate: ex(k+1) absorbs plain row k; at k = i+1 the carry
            # is REPLACED by the precomputed modified-rows absorption (the
            # pre-(i+2) carry is a dummy recomputation of the top stack)
            def prop(ex, lex, init):
                res = bmps.absorb_row(ex, jnp.take(net, k, axis=0), chi,
                                      trunc)
                ex_n = jnp.where(k == i + 1, init[0], res.bmps)
                lex_n = jnp.where(k == i + 1, init[1], lex + res.log_norm)
                return ex_n, lex_n

            new_carry = (prop(ex_a, lex_a, ex_init[0]),
                         prop(ex_ud, lex_ud, ex_init[1]),
                         prop(ex_du, lex_du, ex_init[2]))
            return new_carry, (out, out_rev)

        dummy = (stacks.tops[0], jnp.zeros((), rdt))
        _, (vals, vals_rev) = jax.lax.scan(scan_k, (dummy, dummy, dummy),
                                           jnp.arange(nb))
        return vals, vals_rev

    xi, ii = jnp.meshgrid(cols, jnp.arange(nb), indexing="ij")
    vals, vals_rev = jax.vmap(jax.vmap(lane))(xi, ii)   # each [Lx, nb, nb]
    # orientation B estimates <Dag_k D_i> -> entry (k, i)
    return vals + vals_rev.transpose(0, 2, 1)


def tj_singlet_pair_corr_graded_rowshared(tps, config, space, chi: int,
                                          trunc: TruncParams,
                                          shared: GradedEnvShared | None
                                          = None):
    """Env-shared <Delta^dag Delta> walker on a GRADED t-J state (in-row
    horizontal bond pairs) — replaces the O(N) full recomputes per bond
    pair of tj_singlet_pair_corr_graded(..., "row") with the bosonic
    walker's shared row environments.

    Why shared envs suffice (snake-interval analysis, fermion/tables.py):
    Delta annihilates/creates a parity-EVEN pair on snake-ADJACENT sites,
    so the only dressing flip is on the snake-second site of each replaced
    bond (flag 1); everything between and beyond the two bonds keeps its
    dressing (net prefix-parity change = 0). Operator signs are exact
    sequential parity counts in the snake mode order — identical to the
    full-recompute path. Returns [Ly, Lx-1, Lx-1]."""
    from peps_tpu.fermion.exact import snake_order

    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    assert d == 3, "t-J basis required"
    if shared is None:
        shared = graded_env_shared(tps, config, space, chi, trunc)
    net, stacks, cands = shared.net, shared.stacks, shared.cands

    pos_np = np.zeros((ly, lx), np.int32)
    for p, (y, x) in enumerate(snake_order(ly, lx)):
        pos_np[y, x] = p
    pos = jnp.asarray(pos_np)
    n_up = jnp.asarray(_N_UP)[config]
    n_dn = jnp.asarray(_N_DN)[config]
    occ_s = jnp.zeros((2 * ly * lx,), jnp.int32)
    occ_s = occ_s.at[2 * pos.reshape(-1)].set(
        n_up.reshape(-1).astype(jnp.int32))
    occ_s = occ_s.at[2 * pos.reshape(-1) + 1].set(
        n_dn.reshape(-1).astype(jnp.int32))
    nb = lx - 1
    empty = 0

    def per_row(top, bot, row, cand_row, cfg_row, r):
        envs = bmps.row_envs(top, bot, row)
        even = (r % 2 == 0)
        # flag-1 goes to the snake-SECOND column of each bond
        fa = jnp.where(even, 0, 1)     # flag at the bond's left column
        fb = jnp.where(even, 1, 0)     # flag at the bond's right column

        c1, c2 = cfg_row[:nb], cfg_row[1:]
        pair_ud = (c1 == 1) & (c2 == 2)
        pair_du = (c1 == 2) & (c2 == 1)
        b_valid = pair_ud | pair_du
        sa = jnp.where(pair_du, 1, 0)
        bp_valid = (c1 == empty) & (c2 == empty)

        def for_i(i):
            def start_env(s0, s1):
                e = bmps._col_transfer_left(envs.lefts[i], top[i],
                                            cand_row[i][s0, fa], bot[i])
                return bmps._col_transfer_left(e, top[i + 1],
                                               cand_row[i + 1][s1, fb],
                                               bot[i + 1])

            e_a = start_env(empty, empty)       # orientation A: pair at i
            e_ud = start_env(1, 2)              # orientation B channels:
            e_du = start_env(2, 1)              # pair CREATED at bond i
            # reference amplitude at the start bond — invariant under the
            # scan over end bonds k, so computed once per i
            cpair = bmps._col_transfer_left(envs.lefts[i], top[i],
                                            row[i], bot[i])
            cpair = bmps._col_transfer_left(cpair, top[i + 1],
                                            row[i + 1], bot[i + 1])
            psi_ref = jnp.einsum("alc,alc->", cpair, envs.rights[i + 2])
            safe = jnp.where(psi_ref == 0, 1.0, psi_ref)

            def scan_k(carry, k):
                e_a, e_ud, e_du = carry

                def close(e, s1, s2):
                    c = bmps._col_transfer_left(e, top[k],
                                                cand_row[k][s1, fa], bot[k])
                    c = bmps._col_transfer_left(c, top[k + 1],
                                                cand_row[k + 1][s2, fb],
                                                bot[k + 1])
                    val = jnp.einsum("alc,alc->", c, envs.rights[k + 2])
                    return val * jnp.exp(envs.log_rights[k + 2]
                                         - envs.log_rights[i + 2])
                amp_ud = close(e_a, 1, 2)
                amp_du = close(e_a, 2, 1)
                amp_ud_rev = close(e_ud, empty, empty)
                amp_du_rev = close(e_du, empty, empty)

                p_i, p_j = pos[r, i], pos[r, i + 1]
                p_k, p_l = pos[r, k], pos[r, k + 1]

                def occ_sprime(up_first, pair_at_start):
                    sp = jnp.where(pair_at_start, p_i, p_k)
                    sq = jnp.where(pair_at_start, p_j, p_l)
                    hp = jnp.where(pair_at_start, p_k, p_i)
                    hq = jnp.where(pair_at_start, p_l, p_j)
                    occ = occ_s
                    occ = occ.at[2 * sp].set(0).at[2 * sp + 1].set(0)
                    occ = occ.at[2 * sq].set(0).at[2 * sq + 1].set(0)
                    occ = occ.at[2 * hp].set(jnp.where(up_first, 1, 0))
                    occ = occ.at[2 * hp + 1].set(jnp.where(up_first, 0, 1))
                    occ = occ.at[2 * hq].set(jnp.where(up_first, 0, 1))
                    occ = occ.at[2 * hq + 1].set(jnp.where(up_first, 1, 0))
                    return occ

                def chan(amp, up_first, sb):
                    occp = occ_sprime(jnp.asarray(up_first), True)
                    sgn = _pair_op_sign(occp, p_i, p_j, p_k, p_l, sa[i],
                                        sb)
                    coef_a = jnp.where(sa[i] == 0, 1.0, -1.0)
                    coef_b = jnp.where(sb == 0, 1.0, -1.0)
                    return 0.5 * coef_a * coef_b * sgn * amp

                def chan_rev(amp, up_first, sb):
                    occp = occ_sprime(jnp.asarray(up_first), False)
                    sgn = _pair_op_sign(occp, p_k, p_l, p_i, p_j, sa[k],
                                        sb)
                    coef_a = jnp.where(sa[k] == 0, 1.0, -1.0)
                    coef_b = jnp.where(sb == 0, 1.0, -1.0)
                    return 0.5 * coef_a * coef_b * sgn * amp

                val = chan(amp_ud, True, 0) + chan(amp_du, False, 1)
                valid = b_valid[i] & bp_valid[k] & (k > i + 1)
                out = jnp.where(valid, _estimator_value(val / safe),
                                jnp.zeros((), _estimator_value(val).dtype))

                val_rev = chan_rev(amp_ud_rev, True, 0) \
                    + chan_rev(amp_du_rev, False, 1)
                valid_rev = bp_valid[i] & b_valid[k] & (k > i + 1)
                out_rev = jnp.where(
                    valid_rev, _estimator_value(val_rev / safe),
                    jnp.zeros((), _estimator_value(val_rev).dtype))

                def prop(e):
                    nxt = bmps._col_transfer_left(e, top[k], row[k],
                                                  bot[k])
                    return jnp.where(k > i + 1, nxt, e)

                return (prop(e_a), prop(e_ud), prop(e_du)), (out, out_rev)

            _, (vals, vals_rev) = jax.lax.scan(scan_k, (e_a, e_ud, e_du),
                                               jnp.arange(nb))
            return vals, vals_rev

        vals, vals_rev = jax.vmap(for_i)(jnp.arange(nb))
        # orientation B estimates <Dag_k D_i> -> entry (k, i)
        return vals + vals_rev.T

    return jax.vmap(per_row)(stacks.tops[:ly], stacks.bots[1:], net, cands,
                             config, jnp.arange(ly))
