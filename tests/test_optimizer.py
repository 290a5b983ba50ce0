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


@pytest.mark.smoke
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


def test_lbfgs_armijo_descends():
    """Energy-only backtracking line search (cheap probes via
    evaluate_energy_only)."""
    mt, e_ed, tps, configs = setup()
    params = opt.OptimizerParams(
        max_iters=40, algorithm=opt.LBFGSParams(line_search="armijo"),
        lr=0.05)
    e_only = lambda s: exact_sum_evaluation(s, configs, mt, CHI, TP).energy
    result = opt.iterative_optimize(tps, make_eval(mt, configs, False),
                                    params, evaluate_energy_only=e_only)
    e_start = result.energies[0]
    assert result.lowest_energy < e_start - 0.3 * (e_start - e_ed)


def test_step_selector_probes_and_descends():
    """StepSelectorParams drives evaluate_energy_only probes at step 0
    (reference: the initial step-length selector, optimizer_impl.h)."""
    mt, e_ed, tps, configs = setup()
    calls = []

    def e_only(s):
        calls.append(1)
        return exact_sum_evaluation(s, configs, mt, CHI, TP).energy

    params = opt.OptimizerParams(
        max_iters=3, algorithm=opt.SGDParams(), lr=0.05,
        step_selector=opt.StepSelectorParams(candidates=(0.5, 1.0, 2.0),
                                             every_n=0))
    result = opt.iterative_optimize(tps, make_eval(mt, configs, False),
                                    params, evaluate_energy_only=e_only)
    assert len(calls) == 3          # 3 candidates probed at step 0 only
    assert result.energies[-1] < result.energies[0]


def test_sr_cg_warm_start_same_solution():
    """Warm-starting each CG solve with the previous natural gradient must
    not change the optimization trajectory (both converge to the same tight
    CG tolerance), and the warm-started path stays within a sane iteration
    budget of the cold path."""
    mt, e_ed, tps, configs = setup()

    def run(ws):
        params = opt.OptimizerParams(
            max_iters=8,
            algorithm=opt.SRParams(cg=CGParams(max_iter=500, tol=1e-10),
                                   diag_shift=1e-3, cg_warm_start=ws),
            lr=0.1)
        return opt.iterative_optimize(tps, make_eval(mt, configs, True),
                                      params)

    r_ws, r_cold = run(True), run(False)
    it_ws = sum(r.sr_iters for r in r_ws.records[1:])
    it_cold = sum(r.sr_iters for r in r_cold.records[1:])
    assert it_ws <= 1.3 * it_cold, (it_ws, it_cold)
    assert abs(r_ws.energies[-1] - r_cold.energies[-1]) < 1e-5 * abs(e_ed)


def test_spike_s1_resample():
    """An inflated error bar at one step triggers an S1 resample; the run
    recovers and descends (reference spike_detection.h S1)."""
    mt, e_ed, tps, configs = setup()
    base = make_eval(mt, configs, False)
    hit = {"n": 0}

    def evaluate(state, step):
        ev = base(state, step)
        if step == 3 and hit["n"] == 0:
            hit["n"] += 1
            return ev._replace(energy_error=jnp.asarray(10.0))
        return ev._replace(energy_error=jnp.asarray(0.01))

    params = opt.OptimizerParams(
        max_iters=6, algorithm=opt.SGDParams(), lr=0.05,
        spike=opt.SpikeParams(enabled=True, threshold=5.0, max_retries=2))
    result = opt.iterative_optimize(tps, evaluate, params)
    assert any(s == "S1" and a == "resample"
               for _, s, a, _, _ in result.spike_events), result.spike_events
    assert result.energies[-1] < result.energies[0]


def test_spike_s3_natural_grad_resample():
    """A one-off blow-up of the SR samples triggers an S3 (natural-gradient
    anomaly) resample (reference DetectS3_, optimizer_impl.h:1890)."""
    mt, e_ed, tps, configs = setup()
    base = make_eval(mt, configs, True)
    hit = {"n": 0}

    def evaluate(state, step):
        ev = base(state, step)
        if step == 4 and hit["n"] == 0:
            hit["n"] += 1
            # blow up the SR right-hand side -> natural-grad norm anomaly
            return ev._replace(gradient=100.0 * ev.gradient)
        return ev

    params = opt.OptimizerParams(
        max_iters=6,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.1,
        spike=opt.SpikeParams(enabled=True, threshold=1e9,  # mute S1/S2
                              factor_ngrad=5.0, max_retries=2))
    result = opt.iterative_optimize(tps, evaluate, params)
    assert any(s == "S3" and a == "resample"
               for _, s, a, _, _ in result.spike_events), result.spike_events


def test_spike_s4_energy_rollback_restores_moments():
    """An upward energy spike triggers an S4 rollback that restores the
    previous accepted state AND the Adam moments (reference
    optimizer_impl.h:255-280 + DetectS4_)."""
    mt, e_ed, tps, configs = setup()
    base = make_eval(mt, configs, False)
    hit = {"n": 0}

    def evaluate(state, step):
        ev = base(state, step)
        if step == 4 and hit["n"] == 0:
            hit["n"] += 1
            return ev._replace(energy=ev.energy + 100.0)
        return ev

    params = opt.OptimizerParams(
        max_iters=8, algorithm=opt.AdamParams(), lr=0.02,
        spike=opt.SpikeParams(enable_rollback=True, sigma_k=3.0,
                              ema_alpha=0.5))
    result = opt.iterative_optimize(tps, evaluate, params)
    assert any(s == "S4" and a == "rollback"
               for _, s, a, _, _ in result.spike_events), result.spike_events
    assert result.energies[-1] < result.energies[0]


def test_strong_wolfe_line_search_conditions():
    """Unit test of the bracket+zoom search (optimizer_impl.h:1551 analogue):
    on an analytic 1-D objective the returned alpha must satisfy BOTH strong
    Wolfe conditions."""
    p = opt.LBFGSParams(c1=1e-4, c2=0.9, max_eval=30)

    # phi(a) = a^4 - a: descent at 0 (phi'(0) = -1), minimum at 4^{-1/3}
    def phi(a):
        return a ** 4 - a

    def dphi(a):
        return 4.0 * a ** 3 - 1.0

    def eval_fg(a):
        return phi(a), dphi(a), a

    phi0, dphi0 = phi(0.0), dphi(0.0)
    assert dphi0 < 0.0
    for lr in (0.01, 0.1, 1.0, 10.0):
        ok, alpha, a, n = opt._strong_wolfe(eval_fg, phi0, dphi0, lr, p)
        assert ok, (lr, n)
        assert phi(a) <= phi0 + p.c1 * a * dphi0 + 1e-12, (lr, a)
        assert abs(dphi(a)) <= p.c2 * abs(dphi0) + 1e-12, (lr, a)

    # non-descent direction is rejected outright
    ok, _, _, _ = opt._strong_wolfe(eval_fg, phi0, +1.0, 0.1, p)
    assert not ok


def test_lbfgs_strong_wolfe_reaches_ed_energy():
    """The DEFAULT L-BFGS path (strong-Wolfe gradient probes) on the
    exact-sum evaluator: must descend close to the ED energy (reference:
    StrongWolfeLBFGSStep_, optimizer_impl.h:1551)."""
    mt, e_ed, tps, configs = setup()
    params = opt.OptimizerParams(
        max_iters=30,
        algorithm=opt.LBFGSParams(line_search="strong_wolfe", history=10),
        lr=0.05)
    result = opt.iterative_optimize(tps, make_eval(mt, configs, False),
                                    params)
    e_start = result.energies[0]
    assert result.lowest_energy < e_start - 0.6 * (e_start - e_ed), \
        (e_start, result.lowest_energy, e_ed)
