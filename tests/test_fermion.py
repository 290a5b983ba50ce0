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
