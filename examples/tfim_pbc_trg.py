"""4x4 transverse-field Ising on a torus via the PBC coarse-graining
contractor (the reference's TRG-backed TFIM PBC example)."""
import numpy as np
import jax
import jax.numpy as jnp

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.exact_sum import all_configs, exact_sum_evaluation
from peps_tpu.lattice import BoundaryCondition
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.tps import random_tps


def main(n=2, d_bond=2, chi=16):
    model = spin.transverse_field_ising(1.0, 3.0)
    mt = ModelTensors.from_model(model, jnp.float64)
    configs = jnp.asarray(all_configs(n, n, 2))
    tp = TruncParams(chi, 1, 0.0)
    tps = random_tps(jax.random.PRNGKey(0), n, n, 2, d_bond,
                     dtype=jnp.float64, bc=BoundaryCondition.PERIODIC,
                     scale=0.5)

    def evaluate(state, step):
        return exact_sum_evaluation(state, configs, mt, chi, tp,
                                    with_sr_buffers=True,
                                    bc=BoundaryCondition.PERIODIC)

    params = opt.OptimizerParams(
        max_iters=60,
        algorithm=opt.SRParams(cg=CGParams(max_iter=200, tol=1e-8),
                               diag_shift=1e-3),
        lr=0.1)
    res = opt.iterative_optimize(tps, evaluate, params,
                                 callback=lambda rec, s: print(
                                     f"iter {rec.step}: E = {rec.energy:.8f}"))
    print("lowest:", res.lowest_energy)


if __name__ == "__main__":
    main()
