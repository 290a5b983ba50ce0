"""MC sampler stationarity: the empirical configuration distribution after
many sweeps must match |psi(s)|^2 / Z exactly computed by brute force.

This validates the whole sequential-sweep + environment-reuse machinery and
both update rules (reference analogue: Suwa-Todo stationarity tests +
mc-engine tests, SURVEY.md §4.1/4.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.engine import (ChainState, MonteCarloEngine,
                                        init_configs_occupancy,
                                        init_configs_uniform)
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.tps import exact_amplitude, random_tps

LY, LX, D, CHI = 2, 2, 2, 8
TP = TruncParams(CHI, 1, 0.0)


def _exact_probs(tps, configs):
    ps = np.array([abs(exact_amplitude(np.asarray(tps), c)) ** 2
                   for c in configs])
    return ps / ps.sum()


def _run_chain_histogram(tps, rule, configs0, key, n_sweeps, all_cfg):
    eng = MonteCarloEngine(tps, CHI, TP, rule, ChainState(configs0, key))
    counts = np.zeros(len(all_cfg))
    lookup = {tuple(c.ravel()): i for i, c in enumerate(all_cfg)}
    eng.warm_up(50)
    for _ in range(n_sweeps):
        eng.step_sweep()
        for cfg in np.asarray(eng.state.configs):
            counts[lookup[tuple(cfg.ravel())]] += 1
    return counts / counts.sum()


@pytest.mark.slow
def test_exchange_stationary_distribution():
    key = jax.random.PRNGKey(0)
    tps = random_tps(key, LY, LX, 2, D, dtype=jnp.float64, scale=0.9)
    # sector: two up, two down
    from peps_tpu.algorithm.exact_sum import sector_configs
    cfgs = sector_configs(LY, LX, {0: 2, 1: 2})
    probs = _exact_probs(tps, cfgs)
    c0 = init_configs_occupancy(jax.random.PRNGKey(1), 24, LY, LX, {0: 2, 1: 2})
    emp = _run_chain_histogram(tps, UpdateRule("exchange"), c0,
                               jax.random.PRNGKey(2), 400, cfgs)
    assert np.max(np.abs(emp - probs)) < 0.02, (emp, probs)


@pytest.mark.smoke
@pytest.mark.slow
def test_suwa_todo_stationary_distribution():
    key = jax.random.PRNGKey(3)
    tps = random_tps(key, LY, LX, 2, D, dtype=jnp.float64, scale=0.9)
    from peps_tpu.algorithm.exact_sum import all_configs
    cfgs = all_configs(LY, LX, 2)
    probs = _exact_probs(tps, cfgs)
    c0 = init_configs_uniform(jax.random.PRNGKey(4), 24, LY, LX, 2)
    emp = _run_chain_histogram(tps, UpdateRule("suwa_todo"), c0,
                               jax.random.PRNGKey(5), 400, cfgs)
    assert np.max(np.abs(emp - probs)) < 0.02, (emp, probs)


@pytest.mark.smoke
def test_exchange_conserves_occupancy():
    key = jax.random.PRNGKey(7)
    tps = random_tps(key, 3, 3, 2, 2, dtype=jnp.float64, scale=0.9)
    c0 = init_configs_occupancy(jax.random.PRNGKey(8), 8, 3, 3, {0: 5, 1: 4})
    eng = MonteCarloEngine(tps, 8, TP, UpdateRule("exchange"),
                           ChainState(c0, jax.random.PRNGKey(9)))
    eng.warm_up(5)
    cfg = np.asarray(eng.state.configs)
    assert np.all((cfg == 0).sum(axis=(1, 2)) == 5)
    assert np.all((cfg == 1).sum(axis=(1, 2)) == 4)


@pytest.mark.slow
def test_exchange_stationary_fast_scheme():
    """Sampler stationarity holds with the matmul-only compression scheme."""
    key = jax.random.PRNGKey(0)
    tps = random_tps(key, LY, LX, 2, D, dtype=jnp.float64, scale=0.9)
    from peps_tpu.algorithm.exact_sum import sector_configs
    cfgs = sector_configs(LY, LX, {0: 2, 1: 2})
    probs = _exact_probs(tps, cfgs)
    c0 = init_configs_occupancy(jax.random.PRNGKey(1), 24, LY, LX, {0: 2, 1: 2})
    import peps_tpu.montecarlo.engine as eng_mod
    tp_fast = TruncParams(CHI, 1, 0.0, scheme="fast")
    eng = MonteCarloEngine(tps, CHI, tp_fast, UpdateRule("exchange"),
                           ChainState(c0, jax.random.PRNGKey(2)))
    counts = np.zeros(len(cfgs))
    lookup = {tuple(c.ravel()): i for i, c in enumerate(cfgs)}
    eng.warm_up(50)
    for _ in range(400):
        eng.step_sweep()
        for cfg in np.asarray(eng.state.configs):
            counts[lookup[tuple(cfg.ravel())]] += 1
    emp = counts / counts.sum()
    assert np.max(np.abs(emp - probs)) < 0.02, (emp, probs)


@pytest.mark.slow
def test_3site_sweep_stationary():
    """3-site permutation sweeps preserve |psi|^2 in the fixed-magnetization
    sector (reference: square_3site_updater.h)."""
    from peps_tpu.lattice import transpose_tps
    from peps_tpu.montecarlo.sweep import mc_sweep_3site
    from peps_tpu.algorithm.exact_sum import sector_configs
    ly, lx = 2, 3
    key = jax.random.PRNGKey(6)
    tps = random_tps(key, ly, lx, 2, 2, dtype=jnp.float64, scale=0.9)
    tps_t = transpose_tps(tps)
    cfgs = sector_configs(ly, lx, {0: 3, 1: 3})
    probs = _exact_probs(tps, cfgs)
    from peps_tpu.montecarlo.sweep import mc_sweep

    def combined(c, k):
        # 3-site permutations alone conserve row/column multisets (not
        # ergodic on the full sector); interleave with NN exchange. Any
        # stationarity bias of the 3-site kernel would still show up.
        c, k, _ = mc_sweep_3site(tps, tps_t, c, k, 8, TP)
        c, k, _ = mc_sweep(tps, tps_t, c, k, 8, TP, UpdateRule("exchange"))
        return c, k, None

    sweep = jax.jit(combined)
    nch = 16
    states = [jnp.asarray(cfgs[i % len(cfgs)]) for i in range(nch)]
    keys = [jax.random.PRNGKey(100 + i) for i in range(nch)]
    for i in range(nch):
        for _ in range(20):
            states[i], keys[i], _ = sweep(states[i], keys[i])
    counts = np.zeros(len(cfgs))
    lookup = {tuple(c.ravel()): i for i, c in enumerate(cfgs)}
    for _ in range(300):
        for i in range(nch):
            states[i], keys[i], _ = sweep(states[i], keys[i])
            counts[lookup[tuple(np.asarray(states[i]).ravel())]] += 1
    emp = counts / counts.sum()
    assert np.max(np.abs(emp - probs)) < 0.025, (emp, probs)
