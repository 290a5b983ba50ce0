"""Measurement: exact-summation observable oracle vs dense operator ED, and
the MC measurement executor consistency against it.

Reference analogues: ExactSummationMeasurer goldens + mc-measure tests."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.exact_measure import exact_sum_measure
from peps_tpu.algorithm.exact_sum import all_configs, sector_configs
from peps_tpu.algorithm.measure import MeasurementParams, measure
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.tps import random_tps
from tests.ed_oracle import wavefunction_from_tps, _embed_one_site, _embed_two_site

CHI = 12
TP = TruncParams(CHI, 1, 0.0)
LY, LX = 2, 3


def _dense_expectations(tps):
    psi = wavefunction_from_tps(np.asarray(tps))
    z = np.vdot(psi, psi)
    n = LY * LX
    sz = np.array([[0.5, 0], [0, -0.5]])
    sp = np.array([[0, 1], [0, 0]])
    sm = sp.T
    sz_site = np.array([
        np.real(np.vdot(psi, _embed_one_site(sz, i, n, 2) @ psi) / z)
        for i in range(n)]).reshape(LY, LX)
    spsm = np.zeros((LY, LX, LX))
    for y in range(LY):
        for x1 in range(LX):
            for x2 in range(x1 + 1, LX):
                i, j = y * LX + x1, y * LX + x2
                op = _embed_two_site(np.einsum("ac,bd->abcd", sp, sm), i, j,
                                     n, 2)
                spsm[y, x1, x2] = np.real(np.vdot(psi, op @ psi) / z)
    return sz_site, spsm


@pytest.mark.smoke
def test_exact_measure_matches_dense_operators():
    tps = random_tps(jax.random.PRNGKey(2), LY, LX, 2, 3,
                     dtype=jnp.float64, scale=0.8)
    model = spin.heisenberg(1.0)
    configs = jnp.asarray(all_configs(LY, LX, 2))
    res = exact_sum_measure(tps, configs, model, CHI, TP)
    sz_want, spsm_want = _dense_expectations(tps)
    assert np.max(np.abs(res.values["sz"] - sz_want)) < 1e-8
    got = res.values["spsm_row"]
    mask = np.triu(np.ones((LX, LX)), 1)[None]
    assert np.max(np.abs((got - spsm_want) * mask)) < 1e-8


@pytest.mark.slow
def test_mc_measure_agrees_with_exact():
    """MC measurement executor reproduces exact observables within error
    bars (in the Sz=0 sector sampled by the exchange updater)."""
    tps = random_tps(jax.random.PRNGKey(5), LY, LX, 2, 2,
                     dtype=jnp.float64, scale=0.8)
    model = spin.heisenberg(1.0)
    cfgs = sector_configs(LY, LX, {0: 3, 1: 3})
    # exact values restricted to the sampled sector
    res_exact = exact_sum_measure(tps, jnp.asarray(cfgs), model, CHI, TP)
    c0 = init_configs_occupancy(jax.random.PRNGKey(1), 16, LY, LX, {0: 3, 1: 3})
    out = measure(tps, model, MeasurementParams(num_samples=300,
                                                num_warmup_sweeps=50,
                                                nchains=16),
                  CHI, TP, UpdateRule("exchange"), c0, jax.random.PRNGKey(7))
    e_mean, e_err = out.stats["energy"]
    assert abs(e_mean - res_exact.values["energy"]) < 5 * max(e_err, 1e-3)
    sz_mean, sz_err = out.stats["sz"]
    diff = np.abs(sz_mean - res_exact.values["sz"])
    assert np.all(diff < 6 * np.maximum(sz_err, 2e-2)), (diff, sz_err)
