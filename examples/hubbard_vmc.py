"""2x4 Hubbard model VMC with the U(1)xU(1)-conserving Suwa-Todo updater
(Jordan-Wigner channel evaluator)."""
import numpy as np
import jax
import jax.numpy as jnp

from peps_tpu.algorithm.mc_evaluator import MCParams
from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
from peps_tpu.linalg import TruncParams
from peps_tpu.models import fermion as fm
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.tps import random_tps


def main(ly=2, lx=4, d_bond=4, chi=16):
    model = fm.hubbard(t=1.0, u=8.0)
    n = ly * lx
    n_up = n_dn = n // 4     # quarter filling per spin
    tps = random_tps(jax.random.PRNGKey(0), ly, lx, 4, d_bond,
                     dtype=jnp.float32, scale=0.5)
    params = VMCParams(
        chi=chi, trunc=TruncParams(chi, 1, 1e-8, scheme="fast"),
        mc=MCParams(num_samples=30, num_warmup_sweeps=50, nchains=64),
        optimizer=opt.OptimizerParams(
            max_iters=40,
            algorithm=opt.SRParams(cg=CGParams(max_iter=80, tol=1e-5),
                                   diag_shift=1e-3),
            lr=0.05),
        rule=UpdateRule("suwa_todo",
                        conserve_mask=fm.hubbard_conserve_mask()),
        # local states: 0 empty, 1 up, 2 down, 3 double
        occupancy=((0, n - n_up - n_dn), (1, n_up), (2, n_dn)))
    res = vmc_optimize(tps, model, params, jax.random.PRNGKey(1),
                       callback=lambda rec, s: print(
                           f"iter {rec.step}: E = {rec.energy:.5f} "
                           f"+- {rec.energy_error:.5f}"))
    print("lowest:", res.lowest_energy)


if __name__ == "__main__":
    main()
