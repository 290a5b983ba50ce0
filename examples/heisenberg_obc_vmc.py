"""4x4 Heisenberg OBC: simple update -> VMC(SR) -> measurement.

TPU-native counterpart of the reference's
examples/{heisenberg simple update + VMC} workflow."""
import numpy as np
import jax
import jax.numpy as jnp

from peps_tpu.algorithm.mc_evaluator import MCParams
from peps_tpu.algorithm.measure import MeasurementParams, measure
from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.peps import (SimpleUpdateParams, product_peps, simple_update,
                           to_tps)


def main(ly=4, lx=4, d_bond=4, chi=16, dtype=jnp.float32):
    model = spin.heisenberg(1.0)
    occ = np.indices((ly, lx)).sum(0) % 2

    print("== simple update ==")
    peps = product_peps(ly, lx, d_bond, occ, 2, dtype=dtype)
    su = simple_update(
        peps, model.h_h, model.h_v,
        SimpleUpdateParams(steps=400, tau=0.05,
                           trunc=TruncParams(d_bond, 1, 1e-8),
                           energy_abs_tol=1e-7, min_steps=50),
        step_observer=lambda **kw: print(kw) if kw["step"] % 100 == 0 else None)
    print(f"SU estimated E0: {su.estimated_e0:.6f}")
    tps = to_tps(su.peps)
    tps = tps / jnp.max(jnp.abs(tps))

    print("== VMC with stochastic reconfiguration ==")
    n_up = ly * lx // 2
    params = VMCParams(
        chi=chi, trunc=TruncParams(chi, 1, 1e-8, scheme="fast"),
        mc=MCParams(num_samples=40, num_warmup_sweeps=50, nchains=64),
        optimizer=opt.OptimizerParams(
            max_iters=60,
            algorithm=opt.SRParams(cg=CGParams(max_iter=100, tol=1e-5),
                                   diag_shift=1e-3),
            lr=0.1,
            log_path="energy/optimization_log.jsonl"),
        rule=UpdateRule("exchange"),
        occupancy=((0, n_up), (1, ly * lx - n_up)))
    res = vmc_optimize(tps, model, params, jax.random.PRNGKey(0),
                       callback=lambda rec, state: print(
                           f"iter {rec.step}: E = {rec.energy:.6f} "
                           f"+- {rec.energy_error:.6f}"))
    print(f"lowest energy: {res.lowest_energy:.6f}")

    print("== measurement ==")
    cfgs = init_configs_occupancy(jax.random.PRNGKey(1), 64, ly, lx,
                                  {0: n_up, 1: ly * lx - n_up})
    out = measure(res.lowest_state, model,
                  MeasurementParams(num_samples=200, num_warmup_sweeps=50,
                                    nchains=64),
                  chi, TruncParams(chi, 1, 1e-8, scheme="fast"),
                  UpdateRule("exchange"), cfgs, jax.random.PRNGKey(2),
                  dump_dir="measure_out")
    e, err = out.stats["energy"]
    print(f"measured energy: {e:.6f} +- {err:.6f} "
          f"(accept {out.accept_rate:.3f}, tau_int {out.energy_autocorr_time:.2f})")


if __name__ == "__main__":
    main()
