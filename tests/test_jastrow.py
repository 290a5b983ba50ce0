"""Jastrow-dressed evaluator vs brute-force dressed-state ED."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.energy import (ModelTensors,
                                       local_energy_and_holes_dressed)
from peps_tpu.algorithm.exact_sum import all_configs
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.montecarlo.jastrow import JastrowDress
from peps_tpu.tps import random_tps
from tests.ed_oracle import build_hamiltonian, wavefunction_from_tps

CHI = 16
TP = TruncParams(CHI, 1, 0.0)



pytestmark = pytest.mark.fast

def test_dressed_energy_matches_ed():
    ly, lx, d = 2, 3, 2
    n = ly * lx
    model = spin.j1j2_xxz(1.0, 1.0, 0.4, 0.4)
    mt = ModelTensors.from_model(model, jnp.float64)
    rng = np.random.default_rng(3)
    v = rng.normal(scale=0.3, size=(n, n))
    v = 0.5 * (v + v.T)
    np.fill_diagonal(v, 0.0)
    dress = JastrowDress(jnp.asarray(v), jnp.asarray([0.0, 1.0]))
    tps = random_tps(jax.random.PRNGKey(0), ly, lx, d, 3,
                     dtype=jnp.float64, scale=0.8)
    configs = jnp.asarray(all_configs(ly, lx, d))

    def one(cfg):
        return local_energy_and_holes_dressed(tps, cfg, mt, dress, CHI, TP,
                                              with_holes=False)

    res = jax.vmap(one)(configs)
    logw = 2.0 * res.log_abs_psi
    w = jnp.where(res.psi_mant == 0, 0.0, jnp.exp(logw - jnp.max(logw)))
    got = float(jnp.sum(w * jnp.real(res.e_loc)) / jnp.sum(w))

    # brute force: psi_J(s) = exp(J(s)) psi(s)
    psi = wavefunction_from_tps(np.asarray(tps))
    js = []
    for cfg in itertools.product(range(d), repeat=n):
        nvec = np.array(cfg, dtype=float)  # state 1 has density 1
        js.append(np.exp(-0.5 * nvec @ v @ nvec))
    psi_j = psi * np.array(js)
    h = build_hamiltonian(model, ly, lx)
    want = float(np.real(np.vdot(psi_j, h @ psi_j) / np.vdot(psi_j, psi_j)))
    assert abs(got - want) < 1e-8 * max(1.0, abs(want)), (got, want)




@pytest.mark.slow
def test_dressed_sweep_stationary():
    """The Jastrow-dressed sweep samples |exp(J) psi|^2."""
    from peps_tpu.lattice import transpose_tps
    from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
    from peps_tpu.algorithm.exact_sum import sector_configs
    from peps_tpu.tps import exact_amplitude

    ly = lx = 2
    n = ly * lx
    rng = np.random.default_rng(5)
    v = rng.normal(scale=0.4, size=(n, n))
    v = 0.5 * (v + v.T)
    np.fill_diagonal(v, 0.0)
    dress = JastrowDress(jnp.asarray(v), jnp.asarray([0.0, 1.0]))
    tps = random_tps(jax.random.PRNGKey(1), ly, lx, 2, 2,
                     dtype=jnp.float64, scale=0.9)
    tps_t = transpose_tps(tps)
    cfgs = sector_configs(ly, lx, {0: 2, 1: 2})
    amps = np.array([exact_amplitude(np.asarray(tps), c) for c in cfgs])
    js = np.array([float(dress.log_factor(jnp.asarray(c))) for c in cfgs])
    probs = np.abs(np.exp(js) * amps) ** 2
    probs /= probs.sum()

    sweep = jax.jit(lambda c, k: mc_sweep(tps, tps_t, c, k, 8,
                                          TP, UpdateRule("exchange"), dress))
    nch = 16
    states = [jnp.asarray(cfgs[i % len(cfgs)]) for i in range(nch)]
    keys = [jax.random.PRNGKey(50 + i) for i in range(nch)]
    for i in range(nch):
        for _ in range(20):
            states[i], keys[i], _ = sweep(states[i], keys[i])
    counts = np.zeros(len(cfgs))
    lookup = {tuple(c.ravel()): i for i, c in enumerate(cfgs)}
    for _ in range(400):
        for i in range(nch):
            states[i], keys[i], _ = sweep(states[i], keys[i])
            counts[lookup[tuple(np.asarray(states[i]).ravel())]] += 1
    emp = counts / counts.sum()
    assert np.max(np.abs(emp - probs)) < 0.025, (emp, probs)
