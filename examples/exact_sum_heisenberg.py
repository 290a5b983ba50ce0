"""Deterministic VMC via exact summation: 2x2 Heisenberg to machine truth.

Mirrors the reference's `examples/vmc_executor_exact_summation_example.cpp`:
instead of Monte Carlo sampling, the energy/gradient evaluator enumerates
the FULL configuration space (ExactSumEnergyEvaluatorMPI,
exact_summation_energy_evaluator.h:173) so the optimizer runs with zero MC
noise — the reference's (and this library's) house specialty for
deterministic optimizer testing. The 2x2 Heisenberg ground energy is
exactly -2.0; SR converges to it to ~1e-6 in a few dozen iterations.

Run: python examples/exact_sum_heisenberg.py   (CPU-friendly, seconds)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.exact_sum import all_configs, exact_sum_evaluation
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.peps import (SimpleUpdateParams, product_peps, simple_update,
                           to_tps)


def main():
    ly, lx, d_bond, chi = 2, 2, 3, 9
    model = spin.heisenberg(1.0)
    mt = ModelTensors.from_model(model, jnp.float64)
    e_exact = -2.0

    occ = np.fromfunction(lambda y, x: (y + x) % 2, (ly, lx), dtype=int)
    peps = product_peps(ly, lx, d_bond, occ, 2, dtype=jnp.float64)
    res = simple_update(peps, model.h_h, model.h_v,
                        SimpleUpdateParams(steps=50, tau=0.1,
                                           trunc=TruncParams(d_bond, 1,
                                                             1e-12)))
    tps = to_tps(res.peps)
    tps = tps / jnp.max(jnp.abs(tps))

    configs = jnp.asarray(all_configs(ly, lx, 2))
    trunc = TruncParams(chi, 1, 0.0)

    def evaluate(state, step):
        return exact_sum_evaluation(state, configs, mt, chi, trunc,
                                    with_sr_buffers=True)

    params = opt.OptimizerParams(
        max_iters=40,
        algorithm=opt.SRParams(cg=CGParams(max_iter=100, tol=1e-10),
                               diag_shift=1e-3),
        lr=0.3)
    result = opt.iterative_optimize(tps, evaluate, params)

    print(f"exact ground energy : {e_exact:.12f}")
    print(f"SU energy           : {float(result.energies[0]):.12f}")
    print(f"exact-sum SR lowest : {result.lowest_energy:.12f}")
    err = abs(result.lowest_energy - e_exact)
    print(f"|E - E_exact|       : {err:.3e}")
    assert err < 1e-5, "exact-sum SR failed to converge to the ED energy"
    return result


if __name__ == "__main__":
    main()
