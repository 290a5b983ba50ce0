"""PBC contractor + evaluator + sampler tests against ED / brute force.

Reference analogue: test_trg_contractor.cpp, TFIM/Heisenberg/J1J2 PBC tests
(SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.exact_sum import (all_configs,
                                          exact_sum_energy_gradient,
                                          exact_sum_evaluation)
from peps_tpu.contraction.pbc import contract_pbc, punch_all_holes_pbc
from peps_tpu.lattice import BoundaryCondition
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.tps import exact_contract_pbc, project, random_tps
from tests.ed_oracle import build_hamiltonian, wavefunction_from_tps

PBC = BoundaryCondition.PERIODIC


def _ed_energy_of_state(tps, model):
    ly, lx = tps.shape[:2]
    psi = wavefunction_from_tps_pbc(np.asarray(tps))
    h = build_hamiltonian(model, ly, lx, periodic=True)
    return float(np.real(np.vdot(psi, h @ psi) / np.vdot(psi, psi)))


def wavefunction_from_tps_pbc(tps):
    import itertools
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    psi = np.zeros(d ** (ly * lx))
    for idx, cfg in enumerate(itertools.product(range(d), repeat=ly * lx)):
        config = np.array(cfg).reshape(ly, lx)
        tn = project(jnp.asarray(tps), jnp.asarray(config))
        psi[idx] = exact_contract_pbc(np.asarray(tn))
    return psi


@pytest.mark.parametrize("n,D,chi", [(2, 2, 8), (4, 2, 16)])
def test_pbc_contraction_exact(n, D, chi):
    key = jax.random.PRNGKey(n + D)
    tps = random_tps(key, n, n, 2, D, dtype=jnp.float64, bc=PBC, scale=0.5)
    cfg = jax.random.randint(jax.random.fold_in(key, 1), (n, n), 0, 2)
    tn = project(tps, cfg)
    want = exact_contract_pbc(np.asarray(tn))
    mant, logw = contract_pbc(tn, chi, TruncParams(chi, 1, 0.0))
    got = float(mant) * np.exp(float(logw))
    assert abs(got - want) < 1e-8 * max(1.0, abs(want))


def test_pbc_fast_projectors_exact_and_physical():
    """The matmul-only 'fast' projector scheme (jittered-Cholesky Gram
    factors + randomized truncated bond SVD, the TPU production path where
    qdwh SVD of the [chi^2, chi^2] Grams costs ~95% of the contraction):
    (a) exact when chi >= bond rank; (b) matches the exact-SVD scheme on a
    truncating physical contraction; (c) AD holes stay finite."""
    key = jax.random.PRNGKey(7)
    tps = random_tps(key, 4, 4, 2, 2, dtype=jnp.float64, bc=PBC, scale=0.5)
    cfg = jax.random.randint(jax.random.fold_in(key, 1), (4, 4), 0, 2)
    tn = project(tps, cfg)
    me, lwe = contract_pbc(tn, 64, TruncParams(64, 1, 0.0))
    mf, lwf = contract_pbc(tn, 64, TruncParams(64, 1, 0.0, scheme="fast"))
    ref = float(lwe) + np.log(abs(float(me)))
    got = float(lwf) + np.log(abs(float(mf)))
    assert abs(got - ref) < 1e-8 * max(1.0, abs(ref))

    # truncating case on a smooth-spectrum state: D=3, chi=16 < bond 81
    tps3 = random_tps(jax.random.fold_in(key, 2), 4, 4, 2, 3,
                      dtype=jnp.float64, bc=PBC, scale=0.5)
    tn3 = project(tps3, cfg)
    ms, lws = contract_pbc(tn3, 16, TruncParams(16, 1, 0.0))
    mF, lwF = contract_pbc(tn3, 16, TruncParams(16, 1, 0.0, scheme="fast",
                                                rsvd_power=1))
    rs = float(lws) + np.log(abs(float(ms)))
    rf = float(lwF) + np.log(abs(float(mF)))
    assert abs(rf - rs) < 2e-2 * max(1.0, abs(rs))

    def logpsi(t):
        m, lw = contract_pbc(t, 16, TruncParams(16, 1, 0.0, scheme="fast",
                                                rsvd_power=1))
        return lw + jnp.log(jnp.abs(m))

    g = jax.grad(logpsi)(tn3)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("name,model", [
    ("heisenberg", spin.heisenberg(1.0)),
    ("tfim", spin.transverse_field_ising(1.0, 3.0)),
    ("j1j2", spin.j1j2_xxz(1.0, 1.0, 0.5, 0.5)),
])
def test_pbc_exact_sum_energy_matches_ed(name, model):
    n, D, chi = 2, 2, 16
    key = jax.random.PRNGKey(hash(name) % 2**31)
    tps = random_tps(key, n, n, model.phys_dim, D, dtype=jnp.float64,
                     bc=PBC, scale=0.7)
    mt = ModelTensors.from_model(model, jnp.float64)
    configs = jnp.asarray(all_configs(n, n, model.phys_dim))
    res = exact_sum_energy_gradient(tps, configs, mt, chi,
                                    TruncParams(chi, 1, 0.0),
                                    with_grad=False, bc=PBC)
    want = _ed_energy_of_state(tps, model)
    # 1e-6 (not 1e-7): the TRG projectors factor bond GRAMS (squared
    # condition number -> half the f64 digits) — the price of never
    # materializing the merged pair tensor on TPU (pbc._bond_projectors_gram)
    assert abs(float(res.energy) - want) < 1e-6 * max(1.0, abs(want)), name


def test_pbc_exact_sum_gradient_fd():
    n, D, chi = 2, 2, 16
    model = spin.heisenberg(1.0)
    tps = random_tps(jax.random.PRNGKey(2), n, n, 2, D, dtype=jnp.float64,
                     bc=PBC, scale=0.7)
    mt = ModelTensors.from_model(model, jnp.float64)
    configs = jnp.asarray(all_configs(n, n, 2))
    tp = TruncParams(chi, 1, 0.0)
    res = exact_sum_energy_gradient(tps, configs, mt, chi, tp, bc=PBC)
    v = jax.random.normal(jax.random.PRNGKey(3), tps.shape, jnp.float64)
    eps = 1e-6
    ep = exact_sum_energy_gradient(tps + eps * v, configs, mt, chi, tp,
                                   with_grad=False, bc=PBC).energy
    em = exact_sum_energy_gradient(tps - eps * v, configs, mt, chi, tp,
                                   with_grad=False, bc=PBC).energy
    fd = (float(ep) - float(em)) / (2 * eps)
    anl = float(jnp.vdot(res.gradient, v).real)
    assert abs(fd - anl) < 1e-5 * max(1.0, abs(fd)), (fd, anl)


@pytest.mark.slow
def test_pbc_suwa_todo_stationary():
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.montecarlo.sweep_pbc import mc_sweep_pbc
    n, D, chi = 2, 2, 8
    tps = random_tps(jax.random.PRNGKey(9), n, n, 2, D, dtype=jnp.float64,
                     bc=PBC, scale=0.8)
    tp = TruncParams(chi, 1, 0.0)
    cfgs = all_configs(n, n, 2)
    psi = wavefunction_from_tps_pbc(np.asarray(tps))
    probs = np.abs(psi) ** 2
    probs /= probs.sum()
    rule = UpdateRule("suwa_todo")
    sweep = jax.jit(lambda c, k: mc_sweep_pbc(tps, c, k, chi, tp, rule))
    counts = np.zeros(len(cfgs))
    lookup = {tuple(c.ravel()): i for i, c in enumerate(cfgs)}
    nchains = 16
    state = [jax.random.randint(jax.random.PRNGKey(i), (n, n), 0, 2)
             for i in range(nchains)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(nchains)]
    for i in range(nchains):
        for _ in range(20):
            state[i], keys[i], _ = sweep(state[i], keys[i])
    for _ in range(300):
        for i in range(nchains):
            state[i], keys[i], _ = sweep(state[i], keys[i])
            counts[lookup[tuple(np.asarray(state[i]).ravel())]] += 1
    emp = counts / counts.sum()
    assert np.max(np.abs(emp - probs)) < 0.025, (emp, probs)


@pytest.mark.slow
def test_pbc_vmc_sr_reaches_ed():
    """2x2 TFIM PBC: exact-sum SR optimization reaches the ED ground state."""
    from peps_tpu.optimizer import optimizer as opt
    from peps_tpu.optimizer.cg import CGParams
    from tests.ed_oracle import ground_energy
    n, D, chi = 2, 2, 16
    model = spin.transverse_field_ising(1.0, 3.0)
    e_ed = ground_energy(model, n, n, periodic=True)
    mt = ModelTensors.from_model(model, jnp.float64)
    configs = jnp.asarray(all_configs(n, n, 2))
    tp = TruncParams(chi, 1, 0.0)
    tps = random_tps(jax.random.PRNGKey(11), n, n, 2, D, dtype=jnp.float64,
                     bc=PBC, scale=0.5)

    def evaluate(state, step):
        return exact_sum_evaluation(state, configs, mt, chi, tp,
                                    with_sr_buffers=True, bc=PBC)

    params = opt.OptimizerParams(
        max_iters=60,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.1)
    result = opt.iterative_optimize(tps, evaluate, params)
    assert result.lowest_energy < e_ed + 2e-3 * abs(e_ed), \
        (result.lowest_energy, e_ed)


@pytest.mark.smoke
@pytest.mark.fast
def test_pbc_3x3_amplitude_vs_brute_force():
    """3 = 3*2^0: the triple-column coarse-graining step against a brute
    force ring contraction (reference TRG also supports L = 3*2^k,
    trg_contractor_impl.h:154)."""
    rng = np.random.default_rng(0)
    D = 2
    tn = jnp.asarray(rng.normal(size=(3, 3, D, D, D, D)))
    mant, logw = contract_pbc(tn, chi=16, trunc=TruncParams(16, 1, 0.0))
    got = float(mant) * np.exp(float(logw))
    # brute force: einsum over the full torus
    import string
    names = {}
    cnt = [0]

    def nm(kind, y, x):
        k = (kind, y % 3, x % 3)
        if k not in names:
            names[k] = cnt[0]
            cnt[0] += 1
        return names[k]

    operands = []
    for y in range(3):
        for x in range(3):
            operands.append(np.asarray(tn[y, x]))
            operands.append([nm("v", y, x), nm("h", y, x),
                             nm("v", y + 1, x), nm("h", y, x + 1)])
    ref = float(np.einsum(*operands, optimize="greedy"))
    assert abs(got - ref) < 1e-9 * max(abs(ref), 1.0), (got, ref)


@pytest.mark.fast
def test_pbc_6x6_contracts_finite():
    """6 = 3*2^1 smoke: the mixed pair/triple schedule runs and returns a
    finite amplitude."""
    rng = np.random.default_rng(1)
    D = 2
    tn = jnp.asarray(rng.normal(size=(6, 6, D, D, D, D)) * 0.5)
    mant, logw = contract_pbc(tn, chi=8, trunc=TruncParams(8, 1, 0.0))
    assert np.isfinite(float(mant)) and np.isfinite(float(logw))


def test_pbc_host_sweep_matches_scanned():
    """The host-driven per-bond-dispatch PBC sweep (the TPU path) follows
    EXACTLY the same per-chain trajectories as the scanned mc_sweep_pbc,
    for both the exchange and the Suwa-Todo full-space rules."""
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.montecarlo.sweep_pbc import (mc_sweep_pbc,
                                               mc_sweep_pbc_host)
    from peps_tpu.tps import random_tps

    ly = lx = 4
    D, chi = 2, 8
    tp = TruncParams(chi, 1, 1e-10)
    tps = random_tps(jax.random.PRNGKey(3), ly, lx, 2, D, jnp.float32)
    tps = tps / jnp.max(jnp.abs(tps))
    cfg0 = jnp.asarray((np.indices((ly, lx)).sum(0) % 2).astype(np.int32))
    cfgs = jnp.stack([cfg0, 1 - cfg0])
    keys = jax.random.split(jax.random.PRNGKey(7), 2)

    for mode in ("exchange", "full"):
        rule = UpdateRule(mode)
        ref_cfgs, ref_accs, ref_tris = [], [], []
        for i in range(2):
            c, _, stats = mc_sweep_pbc(tps, cfgs[i], keys[i], chi, tp, rule)
            ref_cfgs.append(np.asarray(c))
            ref_accs.append(int(stats.accepted))
            ref_tris.append(int(stats.trials))
        got_cfgs, _, _, acc, tri = mc_sweep_pbc_host(
            tps, cfgs, keys, chi, tp, rule)
        np.testing.assert_array_equal(np.asarray(got_cfgs),
                                      np.stack(ref_cfgs), err_msg=mode)
        np.testing.assert_array_equal(np.asarray(acc), np.array(ref_accs),
                                      err_msg=mode)
        np.testing.assert_array_equal(np.asarray(tri), np.array(ref_tris),
                                      err_msg=mode)


def test_pbc_host_sweep_fused_bonds_match():
    """fuse_bonds > 1 (k sequential bond decisions per executable) follows
    EXACTLY the same trajectories as the per-bond dispatch, including a
    ragged final chunk (2N = 32 bonds, k = 5 -> chunks 5x6 + 2)."""
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.montecarlo.sweep_pbc import mc_sweep_pbc_host
    from peps_tpu.tps import random_tps

    ly = lx = 4
    D, chi = 2, 8
    tp = TruncParams(chi, 1, 1e-10)
    tps = random_tps(jax.random.PRNGKey(3), ly, lx, 2, D, jnp.float32)
    tps = tps / jnp.max(jnp.abs(tps))
    cfg0 = jnp.asarray((np.indices((ly, lx)).sum(0) % 2).astype(np.int32))
    cfgs = jnp.stack([cfg0, 1 - cfg0])
    keys = jax.random.split(jax.random.PRNGKey(7), 2)
    rule = UpdateRule("exchange")

    ref_cfgs, _, ref_la0s, ref_acc, ref_tri = mc_sweep_pbc_host(
        tps, cfgs, keys, chi, tp, rule)
    for k in (3, 5, 8):
        got_cfgs, _, got_la0s, acc, tri = mc_sweep_pbc_host(
            tps, cfgs, keys, chi, tp, rule, fuse_bonds=k)
        np.testing.assert_array_equal(np.asarray(got_cfgs),
                                      np.asarray(ref_cfgs), err_msg=str(k))
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref_acc),
                                      err_msg=str(k))
        np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref_tri),
                                      err_msg=str(k))
        np.testing.assert_allclose(np.asarray(got_la0s),
                                   np.asarray(ref_la0s), rtol=0, atol=0,
                                   err_msg=str(k))

    # full-space (Suwa-Todo) rule: same fused-vs-per-bond identity
    rule_fs = UpdateRule("suwa_todo")
    ref = mc_sweep_pbc_host(tps, cfgs, keys, chi, tp, rule_fs)
    for k in (3, 8):
        got = mc_sweep_pbc_host(tps, cfgs, keys, chi, tp, rule_fs,
                                fuse_bonds=k)
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(ref[0]), err_msg=str(k))
        np.testing.assert_array_equal(np.asarray(got[3]),
                                      np.asarray(ref[3]), err_msg=str(k))


def test_pbc_host_collect_matches_scanned():
    """mc_energy_grad and measure() on the host-driven PBC path equal the
    jitted scanned path (same key streams -> identical trajectories and
    statistics)."""
    from peps_tpu.algorithm.mc_evaluator import MCParams, mc_energy_grad
    from peps_tpu.algorithm.measure import MeasurementParams, measure
    from peps_tpu.montecarlo.sweep import UpdateRule

    n, D, chi = 4, 2, 8
    model = spin.heisenberg(1.0)
    mt = ModelTensors.from_model(model, jnp.float32)
    tp = TruncParams(chi, 1, 1e-10)
    tps = random_tps(jax.random.PRNGKey(21), n, n, 2, D, dtype=jnp.float32,
                     bc=PBC, scale=0.8)
    tps = tps / jnp.max(jnp.abs(tps))
    cfg0 = jnp.asarray((np.indices((n, n)).sum(0) % 2).astype(np.int32))
    cfgs = jnp.stack([cfg0, 1 - cfg0])
    rule = UpdateRule("exchange")
    key = jax.random.PRNGKey(5)

    evs = {}
    for host in (False, True):
        # trial_sweep=False pins the full-recompute oracle path: the default
        # trial/commit sweep (pbc_trial.py) uses frozen-map ratios that only
        # coincide with the full recompute at non-truncating chi (covered by
        # tests/test_pbc_trial.py).
        mp = MCParams(num_samples=2, nchains=2, host_sweep=host,
                      trial_sweep=False)
        ev, cfgs_out, _, _ = mc_energy_grad(
            tps, cfgs, key, mt, chi, tp, rule, mp,
            with_sr_buffers=False, bc=PBC)
        evs[host] = (float(ev.energy), np.asarray(ev.gradient),
                     np.asarray(cfgs_out))
    assert abs(evs[True][0] - evs[False][0]) < 1e-5
    np.testing.assert_allclose(evs[True][1], evs[False][1],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(evs[True][2], evs[False][2])

    stats = {}
    for host in (False, True):
        mp = MeasurementParams(num_samples=3, num_warmup_sweeps=2,
                               nchains=2, measure_offdiag_corr=False,
                               host_sweep=host, trial_sweep=False)
        m = measure(tps, mt, mp, chi, tp, rule, cfgs,
                    jax.random.PRNGKey(9), bc=PBC)
        stats[host] = m.stats["energy"]
    assert abs(stats[True][0] - stats[False][0]) < 1e-5, stats


def test_pbc_host_sweep_respects_conserve_mask():
    """Regression: the host-driven Suwa-Todo path used to rebuild the rule
    from its mode string only, silently dropping conserve_mask — chains
    left the fixed particle-number sector. The host sweep must (a) keep
    the conserved occupancy exactly and (b) follow the scanned sweep's
    trajectories bond for bond."""
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.montecarlo.sweep_pbc import (mc_sweep_pbc,
                                               mc_sweep_pbc_host)
    from peps_tpu.tps import random_tps

    ly = lx = 4
    D, chi, d = 2, 8, 2
    tp = TruncParams(chi, 1, 1e-10)
    tps = random_tps(jax.random.PRNGKey(3), ly, lx, d, D, jnp.float32)
    tps = tps / jnp.max(jnp.abs(tps))
    cfg0 = jnp.asarray((np.indices((ly, lx)).sum(0) % 2).astype(np.int32))
    cfgs = jnp.stack([cfg0, 1 - cfg0])
    keys = jax.random.split(jax.random.PRNGKey(11), 2)

    # particle-number-conserving full-space mask: (c1,c2)->(n1,n2) allowed
    # iff c1+c2 == n1+n2 (the U(1) analogue of the Hubbard U1xU1 updater)
    m = np.zeros((d * d, d * d), np.int32)
    for c1 in range(d):
        for c2 in range(d):
            for n1 in range(d):
                for n2 in range(d):
                    if c1 + c2 == n1 + n2:
                        m[c1 * d + c2, n1 * d + n2] = 1
    rule = UpdateRule("suwa_todo",
                      conserve_mask=tuple(map(tuple, m.tolist())))

    n0 = np.asarray(cfgs).sum(axis=(1, 2))
    for fuse in (1, 4):
        got_cfgs, _, _, _, _ = mc_sweep_pbc_host(tps, cfgs, keys, chi, tp,
                                                 rule, fuse_bonds=fuse)
        got = np.asarray(got_cfgs)
        np.testing.assert_array_equal(got.sum(axis=(1, 2)), n0,
                                      err_msg=f"fuse={fuse}")

    ref = [np.asarray(mc_sweep_pbc(tps, cfgs[i], keys[i], chi, tp, rule)[0])
           for i in range(2)]
    got_cfgs, _, _, _, _ = mc_sweep_pbc_host(tps, cfgs, keys, chi, tp, rule)
    np.testing.assert_array_equal(np.asarray(got_cfgs), np.stack(ref))


def test_pbc_rejects_fermionic_models():
    """Reference parity (monte_carlo_engine.h:516-557): the TRG/PBC backend
    is boson-only; fermionic models with bc=PERIODIC must be rejected."""
    from peps_tpu.algorithm.mc_evaluator import (mc_energy_grad, MCParams,
                                                 require_bosonic_for_pbc)
    from peps_tpu.algorithm.energy_fermion import FermionTensors
    from peps_tpu.lattice import BoundaryCondition
    from peps_tpu.models.fermion import spinless_fermion
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.tps import random_tps

    model = spinless_fermion(1.0, 0.5)
    ft = FermionTensors.from_model(model, jnp.float32)
    with pytest.raises(ValueError, match="boson-only"):
        require_bosonic_for_pbc(ft, BoundaryCondition.PERIODIC)
    # open boundaries stay allowed
    require_bosonic_for_pbc(ft, BoundaryCondition.OPEN)

    tps = random_tps(jax.random.PRNGKey(0), 2, 2, 2, 2, jnp.float32,
                     bc=PBC)
    cfgs = jnp.zeros((2, 2, 2), jnp.int32).at[:, 0, 0].set(1)
    with pytest.raises(ValueError, match="boson-only"):
        mc_energy_grad(tps, cfgs, jax.random.PRNGKey(1), ft, 8,
                       TruncParams(8, 1, 0.0), UpdateRule("exchange"),
                       MCParams(num_samples=1, num_warmup_sweeps=0,
                                nchains=2), bc=BoundaryCondition.PERIODIC)
