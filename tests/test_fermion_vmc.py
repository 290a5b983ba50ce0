"""Graded fermionic VMC end-to-end: exact-sum energies/gradients against the
second-quantized oracle, SR optimization, and the SU -> VMC pipeline beating
a random start (the reference's fermionic headline workflow:
test_fermion_simple_update.cpp + fermionic VMC golden tests)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.fermion_ed_oracle as FO
from peps_tpu.algorithm.exact_sum import (exact_sum_energy_gradient,
                                          exact_sum_evaluation,
                                          sector_configs)
from peps_tpu.fermion.exact import exact_coefficients, snake_order
from peps_tpu.fermion.peps import (fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion)
from peps_tpu.fermion.vmc import GradedFermionModel
from peps_tpu.linalg import TruncParams
from peps_tpu.models.fermion import spinless_fermion, tj_model
from peps_tpu.peps import SimpleUpdateParams

CHI = 16
TP = TruncParams(CHI, 1, 0.0, scheme="fast")


def su_state(model, ly, lx, D, occ0, sched=((100, 0.2), (100, 0.05))):
    space = space_for_model(model, D)
    peps = product_fermion_peps(ly, lx, space, occ0)
    for steps, tau in sched:
        out = fermion_simple_update(
            peps, model, space,
            SimpleUpdateParams(steps=steps, tau=tau,
                               trunc=TruncParams(D, 1, 1e-12)))
        peps = out.peps
    tps = to_tps_fermion(peps)
    return tps / jnp.max(jnp.abs(tps)), space


def oracle_sector_energy(model, ly, lx, tps, space, occ0):
    c = exact_coefficients(tps, space.phys_parity, space.bond_parity)
    seq = snake_order(ly, lx)
    perm = [seq.index((y, x)) for y in range(ly) for x in range(lx)]
    v = np.transpose(c, perm).reshape(-1)
    H = FO.build_fermion_hamiltonian(model, ly, lx, order="snake").toarray()
    d = model.phys_dim
    nu0 = sum(int(model.n_up[occ0[y, x]]) for y in range(ly)
              for x in range(lx))
    nd0 = sum(int(model.n_dn[occ0[y, x]]) for y in range(ly)
              for x in range(lx))
    idx = np.array([int(np.ravel_multi_index(cfg, (d,) * (ly * lx)))
                    for cfg in itertools.product(range(d), repeat=ly * lx)
                    if sum(int(model.n_up[s]) for s in cfg) == nu0
                    and sum(int(model.n_dn[s]) for s in cfg) == nd0])
    Hs = H[np.ix_(idx, idx)]
    vs = v[idx]
    e = float(np.real(vs.conj() @ Hs @ vs) / np.real(vs.conj() @ vs))
    return e, float(np.linalg.eigvalsh(Hs)[0])


def test_graded_exact_sum_energy_matches_oracle():
    """Exact-sum local energies of the graded state (dressed amplitudes +
    snake strings) equal <psi_P|H|psi_P>/<psi_P|psi_P> of the sector
    projection computed by the independent second-quantized oracle."""
    model = spinless_fermion(1.0, 0.5)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    tps, space = su_state(model, ly, lx, D, occ0)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 0: 4}))
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=False)
    e_oracle, _ = oracle_sector_energy(model, ly, lx, tps, space, occ0)
    assert abs(float(res.energy) - e_oracle) < 1e-8, (float(res.energy),
                                                      e_oracle)


def test_graded_exact_sum_energy_matches_oracle_tj():
    model = tj_model(3.0, 1.0)
    ly, lx, D = 2, 2, 4
    occ0 = np.array([[1, 2], [2, 1]])
    tps, space = su_state(model, ly, lx, D, occ0)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 2: 2}))
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=False)
    e_oracle, _ = oracle_sector_energy(model, ly, lx, tps, space, occ0)
    assert abs(float(res.energy) - e_oracle) < 1e-8, (float(res.energy),
                                                      e_oracle)


def test_graded_gradient_matches_finite_difference():
    model = spinless_fermion(1.0, 0.5)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    tps, space = su_state(model, ly, lx, D, occ0,
                          sched=((40, 0.2),))
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 0: 4}))
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=True)
    g = np.asarray(res.gradient)
    top = np.argsort(np.abs(g).reshape(-1))[::-1][:3]
    for ti in top:
        pos = tuple(int(i) for i in np.unravel_index(ti, tps.shape))
        eps = 1e-6
        ep = float(exact_sum_energy_gradient(
            tps.at[pos].add(eps), configs, gm, CHI, TP,
            with_grad=False).energy)
        em = float(exact_sum_energy_gradient(
            tps.at[pos].add(-eps), configs, gm, CHI, TP,
            with_grad=False).energy)
        fd = (ep - em) / (2 * eps)
        assert abs(g[pos] - fd) < 1e-5 * max(abs(fd), 1e-3), (pos, g[pos],
                                                              fd)


def test_graded_sr_optimizes_to_sector_ed():
    """SR on the exact-sum evaluator drives the SU-initialized graded state
    to the sector ED energy (reference: fermion SR golden tests)."""
    from peps_tpu.optimizer import optimizer as opt
    from peps_tpu.optimizer.cg import CGParams

    model = spinless_fermion(1.0, 0.5)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    tps, space = su_state(model, ly, lx, D, occ0)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 0: 4}))
    _, e_ed = oracle_sector_energy(model, ly, lx, tps, space, occ0)

    def evaluate(state, step):
        return exact_sum_evaluation(state, configs, gm, CHI, TP,
                                    with_sr_buffers=True)

    params = opt.OptimizerParams(
        max_iters=25,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.15)
    result = opt.iterative_optimize(tps, evaluate, params)
    assert result.lowest_energy < e_ed + 2e-3 * abs(e_ed), \
        (result.lowest_energy, e_ed)


def test_graded_complex_pipeline_energy_gradient_sr():
    """Graded exact-sum VMC pipeline on a genuinely COMPLEX state
    (reference two-type matrix, tests/CMakeLists.txt:59-86): a complex
    parity-even perturbation of the SU state must (a) reproduce the
    second-quantized oracle's sector energy, (b) carry a gradient whose
    real/imag parts match central differences of E over Re/Im of the
    parameters (Wirtinger convention g = dE/dA*: dE/dRe = 2 Re g,
    dE/dIm = 2 Im g), and (c) descend back to the sector ED energy under
    SR."""
    from peps_tpu.optimizer import optimizer as opt
    from peps_tpu.optimizer.cg import CGParams
    from tests.test_fermion_sweep import _random_even_state

    model = spinless_fermion(1.0, 0.5)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    tps_r, space = su_state(model, ly, lx, D, occ0)
    pert = _random_even_state(43, ly, lx, model.phys_dim, D, space,
                              cplx=True)
    tps = (tps_r.astype(jnp.complex128)
           + 0.15j * pert / jnp.max(jnp.abs(pert)))
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 0: 4}))

    # (a) energy against the oracle
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=True)
    e_oracle, e_ed = oracle_sector_energy(model, ly, lx, tps, space, occ0)
    assert abs(float(res.energy) - e_oracle) < 1e-8

    # (b) gradient vs central differences in Re and Im directions
    g = np.asarray(res.gradient)
    top = np.argsort(np.abs(g).reshape(-1))[::-1][:2]
    for ti in top:
        pos = tuple(int(i) for i in np.unravel_index(ti, tps.shape))
        eps = 1e-6
        for direction, want in ((eps, 2 * np.real(g[pos])),
                                (1j * eps, 2 * np.imag(g[pos]))):
            ep = float(exact_sum_energy_gradient(
                tps.at[pos].add(direction), configs, gm, CHI, TP,
                with_grad=False).energy)
            em = float(exact_sum_energy_gradient(
                tps.at[pos].add(-direction), configs, gm, CHI, TP,
                with_grad=False).energy)
            fd = (ep - em) / (2 * eps)
            assert abs(want - fd) < 1e-4 * max(abs(fd), 1e-2), \
                (pos, direction, want, fd)

    # (c) SR descends the complex state back to the sector ED energy
    def evaluate(state, step):
        return exact_sum_evaluation(state, configs, gm, CHI, TP,
                                    with_sr_buffers=True)

    params = opt.OptimizerParams(
        max_iters=30,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.15)
    result = opt.iterative_optimize(tps, evaluate, params)
    assert result.lowest_energy < e_ed + 5e-3 * abs(e_ed), \
        (result.lowest_energy, e_ed)


@pytest.mark.slow
def test_su_init_beats_random_start_mc_vmc():
    """The VERDICT done-criterion: a t-J/spinless VMC run STARTED FROM the
    fermionic simple update reaches lower energy than the same budget from
    a random state (MC sampling path: graded sweep + evaluator)."""
    from peps_tpu.algorithm.mc_evaluator import MCParams
    from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
    from peps_tpu.optimizer import optimizer as opt
    from peps_tpu.optimizer.cg import CGParams
    from peps_tpu.tps import random_tps

    model = spinless_fermion(1.0, 0.5)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    tps_su, space = su_state(model, ly, lx, D, occ0)
    gm = GradedFermionModel.from_model(model, space, jnp.float64)
    tps_rand = random_tps(jax.random.PRNGKey(5), ly, lx, model.phys_dim, D,
                          dtype=jnp.float64, scale=0.5)

    def run(tps0, iters):
        params = VMCParams(
            chi=CHI, trunc=TP,
            mc=MCParams(num_samples=30, num_warmup_sweeps=20, nchains=16),
            optimizer=opt.OptimizerParams(
                max_iters=iters,
                algorithm=opt.SRParams(cg=CGParams(max_iter=100, tol=1e-6),
                                       diag_shift=1e-3),
                lr=0.1),
            occupancy=((1, 2), (0, 4)))
        return vmc_optimize(tps0, gm, params, jax.random.PRNGKey(0))

    res_su = run(tps_su, 6)
    res_rand = run(tps_rand, 6)
    assert res_su.lowest_energy < res_rand.lowest_energy, \
        (res_su.lowest_energy, res_rand.lowest_energy)
    # and the SU start is already close to the sector ED
    _, e_ed = oracle_sector_energy(model, ly, lx, tps_su, space, occ0)
    assert res_su.lowest_energy < e_ed + 0.05 * abs(e_ed)


@pytest.mark.parametrize("t2", [-2.5, 2.1])
def test_graded_exact_sum_energy_t2_matches_oracle(t2):
    """t2 (NNN diagonal) hopping on the graded path: exact-sum local
    energies with snake diagonal strings + env-shared diagonal tables equal
    the sector oracle (reference: EvaluateNNNEnergy,
    square_spinless_fermion.h:181, fixtures at t2 = -2.5, 2.1)."""
    model = spinless_fermion(1.0, 0.5, t2=t2)
    nn_model = spinless_fermion(1.0, 0.5)   # SU state from the NN part only
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    tps, space = su_state(nn_model, ly, lx, D, occ0)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 0: 4}))
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=False)
    e_oracle, _ = oracle_sector_energy(model, ly, lx, tps, space, occ0)
    assert abs(float(res.energy) - e_oracle) < 1e-8, (float(res.energy),
                                                      e_oracle)


def test_graded_exact_sum_energy_t2_tj_3rows():
    """Extended t-J (t, t2, J, V) on 3 rows — exercises the ODD-row snake
    diagonal strings (reference: square_tJ_model.h:9, t2 on both diagonal
    directions)."""
    model = tj_model(3.0, 1.0, t2=-2.5, v=0.4)
    nn_model = tj_model(3.0, 1.0)
    ly, lx, D = 3, 2, 4
    occ0 = np.array([[1, 2], [0, 1], [2, 0]])
    tps, space = su_state(nn_model, ly, lx, D, occ0)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 2: 2, 0: 2}))
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=False)
    e_oracle, _ = oracle_sector_energy(model, ly, lx, tps, space, occ0)
    assert abs(float(res.energy) - e_oracle) < 1e-8, (float(res.energy),
                                                      e_oracle)


def test_graded_exact_sum_energy_matches_oracle_hubbard():
    """Hubbard on a RANDOM parity-even graded state, full-space expectation
    vs the snake-ordered second-quantized oracle. Regression for the
    odd-row horizontal-hop string sign: with double occupancy allowed, an
    up-hop between sites whose n_dn differ picks up the Z factor of the
    JW-EARLIER site, which on odd (R->L) snake rows is the lattice-RIGHT
    site (both exchange endpoints of t-J/spinless hops carry a hole, so
    those models never see this factor)."""
    from peps_tpu.fermion.graded import GT, project_even
    from peps_tpu.models.fermion import hubbard

    model = hubbard(1.0, 4.0, mu=0.3)
    ly, lx, D = 2, 2, 3
    space = space_for_model(model, D)
    pp, pb = space.phys_parity, space.bond_parity
    d = model.phys_dim
    rng = np.random.default_rng(1)
    tps = rng.normal(size=(ly, lx, d, D, D, D, D))
    for y in range(ly):
        for x in range(lx):
            g = GT(jnp.asarray(tps[y, x]), (pp, pb, pb, pb, pb),
                   (False, True, True, False, False))
            tps[y, x] = np.asarray(project_even(g).data)
    tps = jnp.asarray(tps)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)

    n = ly * lx
    configs = jnp.asarray(
        np.array(list(itertools.product(range(d), repeat=n)),
                 dtype=np.int32).reshape(-1, ly, lx))
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=False)

    c = exact_coefficients(tps, pp, space.bond_parity)
    seq = snake_order(ly, lx)
    perm = [seq.index((y, x)) for y in range(ly) for x in range(lx)]
    v = np.transpose(c, perm).reshape(-1)
    H = FO.build_fermion_hamiltonian(model, ly, lx, order="snake").toarray()
    e_want = float(v @ H @ v) / float(v @ v)
    assert abs(float(res.energy) - e_want) < 1e-7, (float(res.energy),
                                                    e_want)


def test_graded_exact_sum_energy_matches_oracle_hubbard_3cols():
    """Same regression at 2x3: odd-row horizontal bonds at every column
    position, plus vertical bonds with nontrivial strings."""
    from peps_tpu.fermion.graded import GT, project_even
    from peps_tpu.models.fermion import hubbard

    model = hubbard(1.0, 6.0, mu=0.1)
    ly, lx, D = 2, 3, 2
    space = space_for_model(model, D)
    pp, pb = space.phys_parity, space.bond_parity
    d = model.phys_dim
    rng = np.random.default_rng(3)
    tps = rng.normal(size=(ly, lx, d, D, D, D, D))
    for y in range(ly):
        for x in range(lx):
            g = GT(jnp.asarray(tps[y, x]), (pp, pb, pb, pb, pb),
                   (False, True, True, False, False))
            tps[y, x] = np.asarray(project_even(g).data)
    tps = jnp.asarray(tps)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)

    n = ly * lx
    configs = jnp.asarray(
        np.array(list(itertools.product(range(d), repeat=n)),
                 dtype=np.int32).reshape(-1, ly, lx))
    res = exact_sum_energy_gradient(tps, configs, gm, CHI, TP,
                                    with_grad=False, batch_size=256)

    c = exact_coefficients(tps, pp, space.bond_parity)
    seq = snake_order(ly, lx)
    perm = [seq.index((y, x)) for y in range(ly) for x in range(lx)]
    v = np.transpose(c, perm).reshape(-1)
    H = FO.build_fermion_hamiltonian(model, ly, lx, order="snake").toarray()
    e_want = float(v @ H @ v) / float(v @ v)
    assert abs(float(res.energy) - e_want) < 1e-7, (float(res.energy),
                                                    e_want)
