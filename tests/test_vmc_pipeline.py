"""End-to-end VMC pipeline: SU init -> MC + SR optimization -> energy vs ED.

Reference analogue: integration tests (test_square_heisenberg_obc.cpp,
SURVEY.md §4.5) — scaled down to 2x3 so it runs in CI time."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.mc_evaluator import MCParams, mc_energy_grad
from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.peps import SimpleUpdateParams, product_peps, simple_update, to_tps
from tests.ed_oracle import energy_of_tps, ground_energy

LY, LX, D, CHI = 2, 3, 3, 12
TP = TruncParams(CHI, 1, 0.0)


def _su_state(model, dtype=jnp.float64):
    occ = np.fromfunction(lambda y, x: (y + x) % 2, (LY, LX), dtype=int)
    peps = product_peps(LY, LX, D, occ, 2, dtype=dtype)
    res = simple_update(peps, model.h_h, model.h_v,
                        SimpleUpdateParams(steps=60, tau=0.1,
                                           trunc=TruncParams(D, 1, 1e-12)))
    tps = to_tps(res.peps)
    return tps / jnp.max(jnp.abs(tps))


@pytest.mark.slow
def test_mc_energy_matches_exact_on_state():
    """MC energy estimate on a fixed state agrees with the exactly computed
    energy within ~4 sigma."""
    model = spin.heisenberg(1.0)
    tps = _su_state(model)
    e_exact = energy_of_tps(np.asarray(tps), model)
    mt = ModelTensors.from_model(model, tps.dtype)
    key = jax.random.PRNGKey(0)
    configs = init_configs_occupancy(jax.random.PRNGKey(1), 32, LY, LX,
                                     {0: 3, 1: 3})
    # warm up chains
    mcp = MCParams(num_samples=150, num_warmup_sweeps=0, nchains=32)
    ev, configs, key, _ = mc_energy_grad(tps, configs, key, mt, CHI, TP,
                                         UpdateRule("exchange"),
                                         MCParams(num_samples=30, nchains=32))
    ev, configs, key, _ = mc_energy_grad(tps, configs, key, mt, CHI, TP,
                                         UpdateRule("exchange"), mcp)
    err = max(float(ev.energy_error), 1e-4)
    assert abs(float(ev.energy) - e_exact) < 4 * err + 0.02, \
        (float(ev.energy), e_exact, err)


@pytest.mark.slow
def test_vmc_sr_pipeline_reaches_ed():
    model = spin.heisenberg(1.0)
    e_ed = ground_energy(model, LY, LX)
    tps = _su_state(model)
    params = VMCParams(
        chi=CHI, trunc=TP,
        mc=MCParams(num_samples=40, num_warmup_sweeps=30, nchains=32),
        optimizer=opt.OptimizerParams(
            max_iters=25,
            algorithm=opt.SRParams(cg=CGParams(max_iter=100, tol=1e-6),
                                   diag_shift=1e-3),
            lr=0.15),
        rule=UpdateRule("exchange"),
        occupancy=((0, 3), (1, 3)))
    res = vmc_optimize(tps, model, params, jax.random.PRNGKey(5))
    # MC-noisy optimization: expect to land within a few error bars of ED
    e_true = energy_of_tps(np.asarray(res.lowest_state), model)
    assert e_true < e_ed + 0.015 * abs(e_ed), (e_true, e_ed, res.energies)
