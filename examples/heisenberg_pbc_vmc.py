"""4x4 Heisenberg on a TORUS: Monte Carlo VMC through the TRG contractor.

PBC counterpart of examples/heisenberg_obc_vmc.py (reference:
square_spin_onehalf_j1j2_xxz PBC solvers + TRG contraction). The MC sweep
runs the host-driven bond loop with fused multi-bond executables
(montecarlo/sweep_pbc.py) — the XLA:TPU backend cannot compile a full
TRG-in-scan graph, so k sequential bond decisions are batched per
dispatch instead (bit-identical trajectories).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from peps_tpu.algorithm.mc_evaluator import MCParams
from peps_tpu.algorithm.measure import MeasurementParams, measure
from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
from peps_tpu.lattice import BoundaryCondition
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.peps import (SimpleUpdateParams, product_peps_pbc,
                           simple_update, to_tps_pbc)


def main(n=4, d_bond=3, chi=12, iters=40, dtype=jnp.float32):
    model = spin.heisenberg(1.0)
    trunc = TruncParams(chi, 1, 1e-6, scheme="fast", rsvd_power=1)

    # torus simple update (reference: Periodic SquareLatticePEPS layout)
    # from a Neel product start gives VMC a physical initial state
    occ0 = np.indices((n, n)).sum(0) % 2
    peps = product_peps_pbc(n, n, d_bond, occ0, 2, dtype=dtype)
    for tau in (0.2, 0.05):
        su = simple_update(peps, model.h_h, model.h_v,
                           SimpleUpdateParams(steps=120, tau=tau,
                                              trunc=TruncParams(d_bond, 1, 1e-10),
                                              energy_abs_tol=1e-8))
        peps = su.peps
    tps = to_tps_pbc(peps).astype(dtype)
    tps = tps / jnp.max(jnp.abs(tps))

    n_up = n * n // 2
    print(f"== {n}x{n} Heisenberg PBC, D={d_bond} chi={chi} ==")
    params = VMCParams(
        chi=chi, trunc=trunc,
        mc=MCParams(num_samples=16, num_warmup_sweeps=20, nchains=8,
                    host_sweep=True, fuse_bonds=8),
        optimizer=opt.OptimizerParams(
            max_iters=iters,
            algorithm=opt.SRParams(cg=CGParams(max_iter=60, tol=1e-5),
                                   diag_shift=1e-3),
            lr=0.1),
        rule=UpdateRule("exchange"),
        occupancy=((0, n_up), (1, n * n - n_up)),
        bc=BoundaryCondition.PERIODIC)
    res = vmc_optimize(tps, model, params, jax.random.PRNGKey(1),
                       callback=lambda rec, state: print(
                           f"iter {rec.step}: E = {rec.energy:.6f} "
                           f"+- {rec.energy_error:.6f}", flush=True))
    print(f"lowest energy: {res.lowest_energy:.6f} "
          f"({res.lowest_energy / (n * n):.5f}/site)")

    cfgs = init_configs_occupancy(jax.random.PRNGKey(2), 8, n, n,
                                  {0: n_up, 1: n * n - n_up})
    out = measure(res.lowest_state, model,
                  MeasurementParams(num_samples=48, num_warmup_sweeps=20,
                                    nchains=8, host_sweep=True,
                                    fuse_bonds=8,
                                    measure_offdiag_corr=False),
                  chi, trunc, UpdateRule("exchange"), cfgs,
                  jax.random.PRNGKey(3), bc=BoundaryCondition.PERIODIC)
    e, err = out.stats["energy"]
    print(f"measured energy: {e:.6f} +- {err:.6f} "
          f"({e / (n * n):.5f}/site; 4x4 PBC ED: -0.701780/site)")
    return res.lowest_energy, e


if __name__ == "__main__":
    main()
