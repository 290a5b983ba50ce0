"""Fermionic models: JW-channel evaluator vs independent second-quantized ED.

Reference analogue: fermionic golden tests (test_fermion_mc_sr_golden,
SURVEY.md §4.3) — here deterministic via exact summation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.energy_fermion import (FermionTensors,
                                               local_energy_and_holes_fermion)
from peps_tpu.algorithm.exact_sum import all_configs
from peps_tpu.linalg import TruncParams
from peps_tpu.models import fermion as fm
from peps_tpu.tps import random_tps
from tests.fermion_ed_oracle import build_fermion_hamiltonian
from tests.ed_oracle import wavefunction_from_tps

CHI = 16
TP = TruncParams(CHI, 1, 0.0)


def _exact_sum_energy(tps, ft, configs):
    def one(cfg):
        return local_energy_and_holes_fermion(tps, cfg, ft, CHI, TP,
                                              with_holes=False)
    res = jax.vmap(one)(configs)
    logw = 2.0 * res.log_abs_psi
    w = jnp.where(res.psi_mant == 0, 0.0, jnp.exp(logw - jnp.max(logw)))
    return float(jnp.sum(w * jnp.real(res.e_loc)) / jnp.sum(w))


MODELS = [
    ("spinless_tV", fm.spinless_fermion(t=1.0, v=0.8, mu=0.3), (2, 3)),
    ("tj", fm.tj_model(t=3.0, j=1.0, mu=0.5), (2, 2)),
    ("hubbard", fm.hubbard(t=1.0, u=4.0, mu=0.7), (2, 2)),
    # t2 (NNN diagonal) hopping at the reference's fixture amplitudes
    # (square_spinless_fermion.h:57-58, test_data/spinless_fermion_tps_t2_*)
    ("spinless_t2neg", fm.spinless_fermion(t=1.0, v=0.8, t2=-2.5), (2, 3)),
    ("spinless_t2pos_3x3",
     fm.spinless_fermion(t=1.0, v=0.3, mu=0.2, t2=2.1), (3, 3)),
    # extended t-J (t, t2, J, V, mu) — square_tJ_model.h:9,99-100
    ("tj_t2", fm.tj_model(t=3.0, j=1.0, mu=0.5, t2=-2.5, v=0.4), (2, 3)),
    ("tj_t2pos", fm.tj_model(t=3.0, j=1.0, t2=2.1), (3, 2)),
]


@pytest.mark.parametrize("name,model,shape", MODELS)
def test_fermion_exact_sum_vs_ed(name, model, shape):
    ly, lx = shape
    d = model.phys_dim
    key = jax.random.PRNGKey(abs(hash(name)) % 2**31)
    tps = random_tps(key, ly, lx, d, 3, dtype=jnp.float64, scale=0.8)
    ft = FermionTensors.from_model(model, jnp.float64)
    configs = jnp.asarray(all_configs(ly, lx, d))
    got = _exact_sum_energy(tps, ft, configs)

    h = build_fermion_hamiltonian(model, ly, lx)
    psi = wavefunction_from_tps(np.asarray(tps))
    want = float(np.real(np.vdot(psi, h @ psi) / np.vdot(psi, psi)))
    assert abs(got - want) < 1e-8 * max(1.0, abs(want)), (name, got, want)


@pytest.mark.parametrize("name,model,shape", [MODELS[0], MODELS[2]])
def test_fermion_vertical_strings_nontrivial(name, model, shape):
    """Sanity: on a 3x2 lattice (vertical bonds have nonempty JW strings),
    energies still match ED — catches string-mask indexing errors."""
    ly, lx = 3, 2
    d = model.phys_dim
    key = jax.random.PRNGKey(7)
    tps = random_tps(key, ly, lx, d, 2, dtype=jnp.float64, scale=0.8)
    ft = FermionTensors.from_model(model, jnp.float64)
    configs = jnp.asarray(all_configs(ly, lx, d))
    got = _exact_sum_energy(tps, ft, configs)
    h = build_fermion_hamiltonian(model, ly, lx)
    psi = wavefunction_from_tps(np.asarray(tps))
    want = float(np.real(np.vdot(psi, h @ psi) / np.vdot(psi, psi)))
    assert abs(got - want) < 1e-8 * max(1.0, abs(want)), (name, got, want)


@pytest.mark.slow
def test_fermion_vmc_spinless_reaches_ed():
    """Exact-sum SR optimization of spinless fermions (2x3, t-V) reaches the
    global ED ground energy (all particle sectors summed)."""
    import scipy.sparse.linalg as spla
    from peps_tpu.algorithm.exact_sum import exact_sum_evaluation
    from peps_tpu.optimizer import optimizer as opt
    from peps_tpu.optimizer.cg import CGParams

    ly, lx = 2, 3
    model = fm.spinless_fermion(t=1.0, v=0.5, mu=0.0)
    h = build_fermion_hamiltonian(model, ly, lx)
    e_ed = float(np.linalg.eigvalsh(h.toarray())[0])
    ft = FermionTensors.from_model(model, jnp.float64)
    configs = jnp.asarray(all_configs(ly, lx, 2))
    tps = random_tps(jax.random.PRNGKey(3), ly, lx, 2, 3,
                     dtype=jnp.float64, scale=0.5)

    def evaluate(state, step):
        return exact_sum_evaluation(state, configs, ft, CHI, TP,
                                    with_sr_buffers=True)

    params = opt.OptimizerParams(
        max_iters=80,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.1)
    result = opt.iterative_optimize(tps, evaluate, params)
    assert result.lowest_energy < e_ed + 5e-3 * abs(e_ed), \
        (result.lowest_energy, e_ed)


@pytest.mark.slow
def test_hubbard_conserving_sampler_stationary():
    """Suwa-Todo with the U1xU1 conservation mask samples |psi|^2 within the
    fixed (N_up, N_dn) sector (reference: square_hubbard_u1u1_updater.h)."""
    from peps_tpu.montecarlo.engine import ChainState, MonteCarloEngine
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.tps import exact_amplitude
    import itertools

    ly, lx, d = 2, 2, 4
    tps = random_tps(jax.random.PRNGKey(11), ly, lx, d, 2,
                     dtype=jnp.float64, scale=0.8)
    n_up = np.array([0, 1, 0, 1]); n_dn = np.array([0, 0, 1, 1])
    # sector: one up electron, one down electron
    sector = [np.array(c).reshape(ly, lx)
              for c in itertools.product(range(d), repeat=ly * lx)
              if n_up[list(c)].sum() == 1 and n_dn[list(c)].sum() == 1]
    probs = np.array([abs(exact_amplitude(np.asarray(tps), c)) ** 2
                      for c in sector])
    probs /= probs.sum()

    mask = fm.hubbard_conserve_mask(d)
    rule = UpdateRule("suwa_todo", conserve_mask=mask)
    # start every chain from a sector config
    c0 = jnp.asarray(np.stack([sector[0]] * 24)).astype(jnp.int32)
    from peps_tpu.linalg import TruncParams
    eng = MonteCarloEngine(tps, 8, TruncParams(8, 1, 0.0), rule,
                           ChainState(c0, jax.random.PRNGKey(3)))
    eng.warm_up(50)
    counts = np.zeros(len(sector))
    lookup = {tuple(c.ravel()): i for i, c in enumerate(sector)}
    for _ in range(400):
        eng.step_sweep()
        for cfg in np.asarray(eng.state.configs):
            key = tuple(cfg.ravel())
            assert key in lookup, f"left the sector: {key}"
            counts[lookup[key]] += 1
    emp = counts / counts.sum()
    assert np.max(np.abs(emp - probs)) < 0.025, (emp, probs)
