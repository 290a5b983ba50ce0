"""Optimizer algorithms on the exact-summation evaluator (zero MC noise),
the reference's house testing specialty (SURVEY.md §4.2:
test_optimizer_*_exact_sum*, test_sr_vs_minsr_equivalence)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.exact_sum import all_configs, exact_sum_evaluation
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.peps import SimpleUpdateParams, product_peps, simple_update, to_tps
from tests.ed_oracle import ground_energy

CHI = 16
TP = TruncParams(CHI, 1, 0.0)
LY, LX, D = 2, 3, 3


def _setup(dtype=jnp.float64):
    model = spin.heisenberg(1.0)
    mt = ModelTensors.from_model(model, dtype)
    e_ed = ground_energy(model, LY, LX)
    occ = np.fromfunction(lambda y, x: (y + x) % 2, (LY, LX), dtype=int)
    peps = product_peps(LY, LX, D, occ, 2, dtype=dtype)
    res = simple_update(peps, model.h_h, model.h_v,
                        SimpleUpdateParams(steps=60, tau=0.1,
                                           trunc=TruncParams(D, 1, 1e-12)))
    tps = to_tps(res.peps)
    tps = tps / jnp.max(jnp.abs(tps))
    configs = jnp.asarray(all_configs(LY, LX, 2))
    return mt, e_ed, tps, configs


_CACHE = {}


def setup(dtype=jnp.float64):
    if dtype not in _CACHE:
        _CACHE[dtype] = _setup(dtype)
    return _CACHE[dtype]


def make_eval(mt, configs, with_sr):
    def evaluate(state, step):
        return exact_sum_evaluation(state, configs, mt, CHI, TP,
                                    with_sr_buffers=with_sr)
    return evaluate


def test_sr_reaches_ed_energy():
    mt, e_ed, tps, configs = setup()
    params = opt.OptimizerParams(
        max_iters=40,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.2)
    result = opt.iterative_optimize(tps, make_eval(mt, configs, True), params)
    assert result.lowest_energy < e_ed + 1e-3 * abs(e_ed), \
        (result.lowest_energy, e_ed)


def test_minsr_reaches_ed_energy():
    mt, e_ed, tps, configs = setup()
    params = opt.OptimizerParams(
        max_iters=100,
        algorithm=opt.MinSRParams(pseudo_inverse_cutoff=1e-8),
        lr=0.2)
    result = opt.iterative_optimize(tps, make_eval(mt, configs, True), params)
    assert result.lowest_energy < e_ed + 1e-3 * abs(e_ed)


def test_sr_vs_minsr_equivalence():
    """With tiny shift/cutoff, SR and MinSR natural gradients agree
    (reference: test_sr_vs_minsr_equivalence.cpp)."""
    mt, e_ed, tps, configs = setup()
    ev = exact_sum_evaluation(tps, configs, mt, CHI, TP, with_sr_buffers=True)
    nat_sr, _ = opt.sr_natural_gradient(
        ev, opt.SRParams(cg=CGParams(max_iter=500, tol=1e-12),
                         diag_shift=1e-10), tps.shape, tps.dtype)
    nat_min = opt.minsr_natural_gradient(
        ev, opt.MinSRParams(pseudo_inverse_cutoff=1e-12), tps.shape)
    # compare on the subspace where both are defined (S range); overall
    # vectors should nearly agree since gradient lies in range(A^H)
    num = float(jnp.linalg.norm(nat_sr - nat_min))
    den = float(jnp.linalg.norm(nat_min))
    assert num < 5e-2 * den, (num, den)


@pytest.mark.parametrize("algname,alg,lr,iters", [
    ("sgd", opt.SGDParams(), 0.05, 80),
    ("sgd_momentum", opt.SGDParams(momentum=0.9), 0.01, 80),
    ("adagrad", opt.AdaGradParams(), 0.05, 80),
    ("adam", opt.AdamParams(), 0.02, 80),
    ("lbfgs", opt.LBFGSParams(), 0.05, 40),
])
def test_first_order_descends(algname, alg, lr, iters):
    mt, e_ed, tps, configs = setup()
    params = opt.OptimizerParams(max_iters=iters, algorithm=alg, lr=lr)
    ev_fn = make_eval(mt, configs, False)
    e_only = lambda s: exact_sum_evaluation(s, configs, mt, CHI, TP).energy
    result = opt.iterative_optimize(tps, ev_fn, params,
                                    evaluate_energy_only=e_only)
    e_start = result.energies[0]
    assert result.lowest_energy < e_start - 0.3 * (e_start - e_ed), \
        (algname, e_start, result.lowest_energy, e_ed)


def test_complex_sr_descends():
    mt, e_ed, tps, configs = setup(jnp.complex128)
    params = opt.OptimizerParams(
        max_iters=25,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.2)
    result = opt.iterative_optimize(tps, make_eval(mt, configs, True), params)
    assert result.lowest_energy < e_ed + 5e-3 * abs(e_ed)
