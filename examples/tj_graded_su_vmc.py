"""t-J model on the Z2-graded fermionic backend: simple-update
initialization -> graded VMC (SR) -> measurement with singlet-pair
correlations.

This is the reference's flagship fermionic workflow
(tests/test_algorithm/test_fermion_simple_update.cpp + square_tJ_model.h)
on the TPU-native graded path: imaginary-time evolution on Z2-graded
tensors, amplitude evaluation via the dressed bosonic contraction
(fermion_project), and <Delta^dag Delta> pair correlators with snake-order
operator signs."""
import numpy as np
import jax
import jax.numpy as jnp

from peps_tpu.algorithm.mc_evaluator import MCParams
from peps_tpu.algorithm.measure import MeasurementParams, measure
from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
from peps_tpu.fermion.peps import (fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion)
from peps_tpu.fermion.vmc import GradedFermionModel
from peps_tpu.linalg import TruncParams
from peps_tpu.models import fermion as fm
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.peps import SimpleUpdateParams


def main(ly=2, lx=4, d_bond=4, chi=16):
    model = fm.tj_model(t=3.0, j=1.0)
    space = space_for_model(model, d_bond)
    n = ly * lx
    n_up = n_dn = 3          # 2 holes on 8 sites
    # local states: 0 empty, 1 up, 2 down (alternating init, even parity)
    occ0 = np.zeros((ly, lx), int)
    fill = [1, 2] * (max(n_up, n_dn))
    sites = [(y, x) for y in range(ly) for x in range(lx)][: n_up + n_dn]
    for (y, x), s in zip(sites, fill):
        occ0[y, x] = s

    # 1. imaginary-time init on the graded state
    peps = product_fermion_peps(ly, lx, space, occ0)
    for steps, tau in ((100, 0.2), (100, 0.05)):
        out = fermion_simple_update(
            peps, model, space,
            SimpleUpdateParams(steps=steps, tau=tau,
                               trunc=TruncParams(d_bond, 1, 1e-12)))
        peps = out.peps
    tps = to_tps_fermion(peps)
    tps = tps / jnp.max(jnp.abs(tps))
    print("simple update done; E0 estimate:", out.estimated_e0)

    # 2. graded VMC refinement (SR)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    params = VMCParams(
        chi=chi, trunc=TruncParams(chi, 1, 1e-10, scheme="sketch"),
        mc=MCParams(num_samples=20, num_warmup_sweeps=40, nchains=32),
        optimizer=opt.OptimizerParams(
            max_iters=25,
            algorithm=opt.SRParams(cg=CGParams(max_iter=60, tol=1e-5),
                                   diag_shift=1e-3),
            lr=0.05),
        occupancy=((0, n - n_up - n_dn), (1, n_up), (2, n_dn)))
    res = vmc_optimize(tps, gm, params, jax.random.PRNGKey(1),
                       callback=lambda rec, s: print(
                           f"iter {rec.step}: E = {rec.energy:.5f} "
                           f"+- {rec.energy_error:.5f}"))
    print("lowest:", res.lowest_energy)

    # 3. measurement with pair correlations (graded walkers)
    cfgs = init_configs_occupancy(jax.random.PRNGKey(2), 32, ly, lx,
                                  {0: n - n_up - n_dn, 1: n_up, 2: n_dn})
    mp = MeasurementParams(num_samples=100, num_warmup_sweeps=40,
                           nchains=32, measure_pair_corr=True)
    m = measure(res.lowest_state, gm, mp, chi,
                TruncParams(chi, 1, 1e-10, scheme="sketch"), UpdateRule("exchange"),
                cfgs, jax.random.PRNGKey(3))
    e_mean, e_err = [float(x) for x in m.stats["energy"][:2]]
    print(f"measured energy: {e_mean:.5f} +- {e_err:.5f}")
    pc = np.asarray(m.stats["pair_corr_row"][0])   # [Ly, Lx-1, Lx-1] mean
    print("pair_corr_row[0, 0, 2]:", pc[0, 0, 2])


if __name__ == "__main__":
    main()
