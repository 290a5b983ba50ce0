"""Fermionic simple update: graded gate application + imaginary-time
convergence, validated against independent second-quantized oracles in the
snake-order JW basis (the repo analogue of the reference's
tests/test_algorithm/test_fermion_simple_update.cpp)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

import tests.fermion_ed_oracle as FO
from peps_tpu.fermion.exact import exact_coefficients, snake_order
from peps_tpu.fermion.gates import bond_h2
from peps_tpu.fermion.peps import (_pair_kernel_h, _pair_kernel_v,
                                   fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion)
from peps_tpu.linalg import TruncParams
from peps_tpu.models.fermion import hubbard, spinless_fermion, tj_model
from peps_tpu.peps import PEPS, SimpleUpdateParams


def coeffs_vec(peps, space, ly, lx):
    c = exact_coefficients(to_tps_fermion(peps), space.phys_parity,
                           space.bond_parity)
    seq = snake_order(ly, lx)
    perm = [seq.index((y, x)) for y in range(ly) for x in range(lx)]
    return np.transpose(c, perm).reshape(-1)


@pytest.mark.fast
@pytest.mark.parametrize("make_model", [
    lambda: spinless_fermion(1.0, 0.7),
    lambda: hubbard(1.0, 4.0),
])
def test_single_gate_matches_exact_evolution(make_model):
    """One untruncated graded gate application on every bond geometry of a
    2x2 lattice equals exp(-tau H_bond) in the snake-JW basis (all relative
    signs)."""
    model = make_model()
    ly = lx = 2
    d = model.phys_dim
    D = 4 if model.spinless else 6
    space = space_for_model(model, D)
    if model.spinless:
        occ0 = np.array([[1, 0], [0, 1]])
    else:
        s_up = int(np.argwhere((model.n_up == 1)
                               & (model.n_dn == 0))[0, 0])
        s_dn = int(np.argwhere((model.n_up == 0)
                               & (model.n_dn == 1))[0, 0])
        occ0 = np.array([[s_up, 0], [0, s_dn]])
    peps0 = product_fermion_peps(ly, lx, space, occ0)
    v0 = coeffs_vec(peps0, space, ly, lx)
    tau = 0.31
    h2 = bond_h2(model, "h")
    gate = jnp.asarray(
        sla.expm(-tau * h2.reshape(d * d, d * d)).reshape(d, d, d, d))
    h2j = jnp.asarray(h2)

    # build per-bond operators in the snake basis with the oracle machinery
    ns = 1 if model.spinless else 2
    seq = FO._site_sequence(ly, lx, "snake")
    rank = {s: i for i, s in enumerate(seq)}
    n_sites = ly * lx
    dim = d ** n_sites

    def bond_op(s1, s2, orient):
        Hb = np.zeros((dim, dim))
        channels = model.channels_h if orient == "h" else model.channels_v
        for cfg_t in itertools.product(range(d), repeat=n_sites):
            cfg = np.array(cfg_t)
            occ = FO._config_to_occ(cfg.reshape(ly, lx), model.n_up,
                                    model.n_dn, model.spinless, "snake")
            col = int(np.ravel_multi_index(cfg, (d,) * n_sites))
            i1 = s1[0] * lx + s1[1]
            i2 = s2[0] * lx + s2[1]
            for ch in channels:
                if ch.string in ("up", "dn"):
                    spidx = 0 if (ch.string == "up" or model.spinless) else 1
                    amp = FO._hop_amplitude(ch.h, model, ch.string)
                    for (a, b) in ((ns * rank[s1] + spidx,
                                    ns * rank[s2] + spidx),
                                   (ns * rank[s2] + spidx,
                                    ns * rank[s1] + spidx)):
                        r = FO._apply_ops(occ, [("cdag", a), ("c", b)])
                        if r is None:
                            continue
                        sgn, new = r
                        ncfg = FO._occ_to_config(new, d, model.n_up,
                                                 model.n_dn, model.spinless,
                                                 n_sites, seq, (ly, lx))
                        if ncfg is None:
                            continue
                        row = int(np.ravel_multi_index(ncfg,
                                                       (d,) * n_sites))
                        Hb[row, col] += amp * sgn
                else:
                    v = ch.h[cfg[i1], cfg[i2], cfg[i1], cfg[i2]]
                    Hb[col, col] += v
        return Hb

    g0, lam_v0, lam_h0 = peps0

    def try_h(y, x):
        out = _pair_kernel_h(
            g0[y, x], g0[y, x + 1], lam_v0[y, x], lam_h0[y, x],
            lam_v0[y + 1, x], lam_v0[y, x + 1], lam_v0[y + 1, x + 1],
            lam_h0[y, x + 2], lam_h0[y, x + 1], gate, h2j, space)
        ga, gb, lam_new, _, _, ln = out
        g = g0.at[y, x].set(ga).at[y, x + 1].set(gb)
        p1 = PEPS(g, lam_v0, lam_h0.at[y, x + 1].set(lam_new))
        v1 = coeffs_vec(p1, space, ly, lx) * np.exp(float(ln))
        vex = sla.expm(-tau * bond_op((y, x), (y, x + 1), "h")) @ v0
        return (np.dot(v1, vex) / np.linalg.norm(v1) / np.linalg.norm(vex),
                np.linalg.norm(v1) / np.linalg.norm(vex))

    def try_v(y, x):
        out = _pair_kernel_v(
            g0[y, x], g0[y + 1, x], lam_v0[y, x], lam_h0[y, x],
            lam_h0[y, x + 1], lam_h0[y + 1, x], lam_v0[y + 2, x],
            lam_h0[y + 1, x + 1], lam_v0[y + 1, x], gate, h2j, space)
        ga, gb, lam_new, _, _, ln = out
        g = g0.at[y, x].set(ga).at[y + 1, x].set(gb)
        p1 = PEPS(g, lam_v0.at[y + 1, x].set(lam_new), lam_h0)
        v1 = coeffs_vec(p1, space, ly, lx) * np.exp(float(ln))
        vex = sla.expm(-tau * bond_op((y, x), (y + 1, x), "v")) @ v0
        return (np.dot(v1, vex) / np.linalg.norm(v1) / np.linalg.norm(vex),
                np.linalg.norm(v1) / np.linalg.norm(vex))

    for (fn, args) in [(try_h, (0, 0)), (try_h, (1, 0)),
                       (try_v, (0, 0)), (try_v, (0, 1))]:
        cos, scale = fn(*args)
        assert cos > 1.0 - 1e-10, (args, cos)
        assert abs(scale - 1.0) < 1e-8, (args, scale)


def _run_su(model, ly, lx, D, occ0, sched, dtype=None):
    space = space_for_model(model, D)
    peps = product_fermion_peps(ly, lx, space, occ0, dtype=dtype)
    for steps, tau in sched:
        out = fermion_simple_update(
            peps, model, space,
            SimpleUpdateParams(steps=steps, tau=tau,
                               trunc=TruncParams(D, 1, 1e-12)))
        peps = out.peps
    return peps, space


def _sector_energy(model, ly, lx, v, occ0):
    """Energy of the N-sector projection of the state v, and the sector ED
    ground energy (Z2-graded truncation conserves parity, not particle
    number, so SU can leak between even sectors; VMC samples at fixed N,
    which is the sector projection)."""
    d = model.phys_dim
    H = FO.build_fermion_hamiltonian(model, ly, lx, order="snake").toarray()
    nu0 = sum(int(model.n_up[occ0[y, x]]) for y in range(ly)
              for x in range(lx))
    nd0 = sum(int(model.n_dn[occ0[y, x]]) for y in range(ly)
              for x in range(lx))
    idx = []
    for cfg in itertools.product(range(d), repeat=ly * lx):
        nu = sum(int(model.n_up[s]) for s in cfg)
        nd = sum(int(model.n_dn[s]) for s in cfg)
        if nu == nu0 and nd == nd0:
            idx.append(int(np.ravel_multi_index(cfg, (d,) * (ly * lx))))
    idx = np.array(idx)
    Hs = H[np.ix_(idx, idx)]
    vs = v[idx]
    e = float(np.real(vs.conj() @ Hs @ vs) / np.real(vs.conj() @ vs))
    e_ed = float(np.linalg.eigvalsh(Hs)[0])
    return e, e_ed


@pytest.mark.smoke
def test_su_spinless_converges_to_sector_ed():
    model = spinless_fermion(1.0, 0.5)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    peps, space = _run_su(model, ly, lx, D, occ0,
                          [(150, 0.2), (150, 0.05)])
    v = coeffs_vec(peps, space, ly, lx)
    e, e_ed = _sector_energy(model, ly, lx, v, occ0)
    assert e >= e_ed - 1e-9
    assert e < e_ed + 0.02 * abs(e_ed), (e, e_ed)


@pytest.mark.parametrize("make_model,occ0,tol", [
    (lambda: spinless_fermion(1.0, 0.5),
     np.array([[1, 0, 0], [0, 0, 1]]), 0.02),
    (lambda: tj_model(3.0, 1.0), np.array([[1, 2], [2, 1]]), 0.10),
])
def test_su_complex_dtype_matches_real(make_model, occ0, tol):
    """The ENTIRE graded SU pipeline in complex128 — gates, sector QR/LQ,
    blockwise SVD truncation, lambda absorption — must reproduce the real
    run (real Hamiltonian: the complex path may only pick up a global
    phase) and satisfy the same sector-ED convergence bound. The reference
    compiles all fermionic tests for double AND complex
    (tests/CMakeLists.txt:59-86 add_two_type_unittest)."""
    import jax.numpy as jnp
    model = make_model()
    ly, lx = occ0.shape
    D = 4
    sched = [(150, 0.2), (150, 0.05)]
    peps_c, space = _run_su(model, ly, lx, D, occ0, sched,
                            dtype=jnp.complex128)
    v_c = coeffs_vec(peps_c, space, ly, lx)
    assert np.iscomplexobj(v_c)
    e, e_ed = _sector_energy(model, ly, lx, v_c, occ0)
    assert e >= e_ed - 1e-9
    assert e < e_ed + tol * abs(e_ed), (e, e_ed)

    peps_r, _ = _run_su(model, ly, lx, D, occ0, sched)
    v_r = coeffs_vec(peps_r, space, ly, lx)
    # same ray: |<v_c, v_r>| = |v_c||v_r| (up to a global phase)
    ovl = abs(np.vdot(v_c, v_r))
    assert ovl > (1 - 1e-8) * np.linalg.norm(v_c) * np.linalg.norm(v_r)


def test_su_tj_converges_near_sector_ed():
    model = tj_model(3.0, 1.0)
    ly, lx, D = 2, 2, 4
    occ0 = np.array([[1, 2], [2, 1]])
    peps, space = _run_su(model, ly, lx, D, occ0,
                          [(150, 0.2), (150, 0.05)])
    v = coeffs_vec(peps, space, ly, lx)
    e, e_ed = _sector_energy(model, ly, lx, v, occ0)
    assert e >= e_ed - 1e-9
    assert e < e_ed + 0.10 * abs(e_ed), (e, e_ed)


def test_su_hubbard_sector_projection_improves():
    """Hubbard: the Z2 truncation leaks between even N-sectors; the sector
    projection must still descend far below the product state and stay
    variational w.r.t. the sector ED."""
    model = hubbard(1.0, 4.0)
    ly, lx, D = 2, 2, 4
    s_up = int(np.argwhere((model.n_up == 1) & (model.n_dn == 0))[0, 0])
    s_dn = int(np.argwhere((model.n_up == 0) & (model.n_dn == 1))[0, 0])
    occ0 = np.array([[s_up, s_dn], [s_dn, s_up]])
    peps, space = _run_su(model, ly, lx, D, occ0,
                          [(150, 0.2), (150, 0.05)])
    v = coeffs_vec(peps, space, ly, lx)
    e, e_ed = _sector_energy(model, ly, lx, v, occ0)
    assert e >= e_ed - 1e-9
    assert e < 0.5 * e_ed, (e, e_ed)   # far below 0 (product state = U-cost)


def _run_su_u1(model, ly, lx, D, occ0, sched, space=None):
    from peps_tpu.fermion.peps import u1_charges_for
    if space is None:
        space = space_for_model(model, D)
    charges = u1_charges_for(model, space, occ0)
    peps = product_fermion_peps(ly, lx, space, occ0)
    for steps, tau in sched:
        out = fermion_simple_update(
            peps, model, space,
            SimpleUpdateParams(steps=steps, tau=tau,
                               trunc=TruncParams(D, 1, 1e-12)),
            charges=charges)
        peps = out.peps
    return peps, space


def _sector_weights(model, ly, lx, v):
    """Total |psi|^2 weight per total-N sector (the conserved U(1) charge,
    matching the reference's fU1 tensors)."""
    d = model.phys_dim
    w = {}
    for i, cfg in enumerate(itertools.product(range(d), repeat=ly * lx)):
        n = sum(int(model.n_up[s] + model.n_dn[s]) for s in cfg)
        w[n] = w.get(n, 0.0) + float(abs(v[i]) ** 2)
    return w


def _ntot_sector_energy(model, ly, lx, v, n0):
    """Energy of the total-N sector projection + that sector's ED ground."""
    d = model.phys_dim
    H = FO.build_fermion_hamiltonian(model, ly, lx, order="snake").toarray()
    idx = [int(np.ravel_multi_index(cfg, (d,) * (ly * lx)))
           for cfg in itertools.product(range(d), repeat=ly * lx)
           if sum(int(model.n_up[s] + model.n_dn[s]) for s in cfg) == n0]
    idx = np.array(idx)
    Hs = H[np.ix_(idx, idx)]
    vs = v[idx]
    e = float(vs @ Hs @ vs) / float(vs @ vs)
    return e, float(np.linalg.eigvalsh(Hs)[0])


def test_su_hubbard_u1_zero_sector_leakage():
    """U(1)-resolved truncation (charged_svd_truncated): Hubbard SU at
    D < exact rank keeps the ENTIRE weight in the initial N sector — zero
    leaked weight, not just 'projection improves' (reference: fermionic
    U(1) tensors, test_data/tps_tJ_6x6Hole2_J0.3_D8_fU1)."""
    model = hubbard(1.0, 4.0)
    ly, lx, D = 2, 3, 5
    s_up = int(np.argwhere((model.n_up == 1) & (model.n_dn == 0))[0, 0])
    s_dn = int(np.argwhere((model.n_up == 0) & (model.n_dn == 1))[0, 0])
    occ0 = np.array([[s_up, s_dn, 0], [s_dn, s_up, 0]])
    peps, space = _run_su_u1(model, ly, lx, D, occ0,
                             [(60, 0.2), (60, 0.05)])
    v = coeffs_vec(peps, space, ly, lx)
    w = _sector_weights(model, ly, lx, v)
    total = sum(w.values())
    leaked = total - w.get(4, 0.0)
    assert total > 0
    assert leaked < 1e-20 * total, (leaked / total, sorted(w.items()))
    # and the state actually descends toward the N-sector ED ground
    e, e_ed = _ntot_sector_energy(model, ly, lx, v, 4)
    assert e >= e_ed - 1e-9
    assert e < e_ed + 0.2 * abs(e_ed), (e, e_ed)


def test_su_tj_u1_fixed_hole_count_vs_sector_ed():
    """Extended check: t-J SU with U(1) charges at fixed hole count — zero
    leakage out of the (N_up, N_dn) sector AND convergence near the sector
    ED ground energy."""
    model = tj_model(3.0, 1.0)
    ly, lx, D = 2, 3, 5
    occ0 = np.array([[1, 2, 0], [2, 1, 0]])   # 2 up, 2 dn, 2 holes
    peps, space = _run_su_u1(model, ly, lx, D, occ0,
                             [(80, 0.2), (80, 0.05)])
    v = coeffs_vec(peps, space, ly, lx)
    w = _sector_weights(model, ly, lx, v)
    total = sum(w.values())
    leaked = total - w.get(4, 0.0)
    assert leaked < 1e-20 * total, (leaked / total, sorted(w.items()))
    e, e_ed = _ntot_sector_energy(model, ly, lx, v, 4)
    assert e >= e_ed - 1e-9
    assert e < e_ed + 0.15 * abs(e_ed), (e, e_ed)


@pytest.mark.fast
def test_expand_bond_dim_graded_preserves_state():
    """Graded D-increase (qlten Expand analogue): slot embedding inside the
    [even|odd] parity blocks preserves every amplitude exactly; noisy
    expansion stays in the even sector and close to the original."""
    from peps_tpu.fermion.peps import (FermionSpace, expand_bond_dim_graded,
                                       space_for_model)
    from peps_tpu.fermion.vmc import log_abs_psi_fermion
    model = tj_model(3.0, 1.0)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 2, 0], [2, 1, 0]])
    peps, space = _run_su(model, ly, lx, D, occ0, [(30, 0.2)])
    tps = to_tps_fermion(peps)
    tps = tps / jnp.max(jnp.abs(tps))
    new_space = FermionSpace(space.phys_parity, 4, 4)
    tps8 = expand_bond_dim_graded(tps, space, new_space)
    tp = TruncParams(16, 1, 0.0)
    for cfg in (occ0, occ0[::-1], occ0[:, ::-1]):
        c = jnp.asarray(cfg)
        la0, m0 = log_abs_psi_fermion(tps, c, space, 16, tp)
        la1, m1 = log_abs_psi_fermion(tps8, c, new_space, 16, tp)
        assert abs(float(la0) - float(la1)) < 1e-10
        assert float(jnp.sign(m0) * jnp.sign(m1)) == 1.0
