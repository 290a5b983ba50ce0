"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

Analogue of the reference's distributed test tier, which runs the same
binaries under local `mpiexec -n 3|4` (SURVEY.md section 4 tier 4). Each
test runs a computation (a) single-device and (b) with the chain/sample
axis sharded over an 8-device Mesh, asserting agreement — XLA inserts the
psum/all_gather collectives for (b), so these exercise the real multi-chip
program structure (reference counterparts: conjugate_gradient_solver.h:297
master/slave CG, minsr_tmatrix.h:79 ring Gram, mc_energy_grad_evaluator.h
chain data parallelism).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.lattice import transpose_tps
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
from peps_tpu.optimizer.cg import CGParams, cg_solve
from peps_tpu.parallel.mesh import chains_mesh, replicate, shard_chains
from peps_tpu.tps import random_tps

pytestmark = pytest.mark.fast

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= NDEV, "conftest must force 8 CPU devices"
    return chains_mesh(NDEV)


def _sweep_problem(nchains=8, ly=3, lx=3, D=2, chi=4):
    tps = random_tps(jax.random.PRNGKey(0), ly, lx, 2, D,
                     dtype=jnp.float32, scale=0.5)
    n = ly * lx
    configs = init_configs_occupancy(jax.random.PRNGKey(1), nchains, ly, lx,
                                     {0: n - n // 2, 1: n // 2})
    trunc = TruncParams(chi, 1, 1e-10, scheme="fast")
    rule = UpdateRule("exchange")
    return tps, configs, trunc, rule, chi


def test_sharded_sweep_matches_single_device(mesh):
    """The vmapped MC sweep with configs sharded over 8 devices must produce
    bit-identical Markov chains to the unsharded run (same per-chain keys)."""
    tps, configs, trunc, rule, chi = _sweep_problem()
    tps_t = transpose_tps(tps)
    keys = jax.random.split(jax.random.PRNGKey(2), configs.shape[0])

    def sweep_all(tps, tps_t, configs, keys):
        cfgs, _, stats = jax.vmap(
            mc_sweep, in_axes=(None, None, 0, 0, None, None, None))(
            tps, tps_t, configs, keys, chi, trunc, rule)
        return cfgs, stats.accepted

    ref_cfgs, ref_acc = jax.jit(sweep_all)(tps, tps_t, configs, keys)

    cshard = NamedSharding(mesh, P("chains", None, None))
    kshard = NamedSharding(mesh, P("chains", None))
    sharded = jax.jit(
        sweep_all,
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                      cshard, kshard),
        out_shardings=(cshard, NamedSharding(mesh, P("chains"))))
    sh_cfgs, sh_acc = sharded(
        replicate(mesh, tps), replicate(mesh, tps_t),
        shard_chains(mesh, configs),
        jax.device_put(keys, kshard))

    assert {d.platform for d in sh_cfgs.sharding.device_set} == {"cpu"}
    assert len(sh_cfgs.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(ref_cfgs), np.asarray(sh_cfgs))
    np.testing.assert_array_equal(np.asarray(ref_acc), np.asarray(sh_acc))


@pytest.mark.smoke
def test_sharded_sr_cg_matvec_matches_dense(mesh):
    """SR natural gradient: CG on the matrix-free S@v = A^H(A v) + shift v
    with the sample rows of A sharded over 8 devices must agree with a dense
    single-device solve (reference: distributed CG,
    conjugate_gradient_solver.h:297-395)."""
    ns, p = 64, 40
    rng = np.random.default_rng(0)
    a_np = rng.normal(size=(ns, p)).astype(np.float64) / np.sqrt(ns)
    b_np = rng.normal(size=(p,)).astype(np.float64)
    shift = 1e-2

    s_dense = a_np.T @ a_np + shift * np.eye(p)
    x_ref = np.linalg.solve(s_dense, b_np)

    a = jax.device_put(jnp.asarray(a_np),
                       NamedSharding(mesh, P("chains", None)))
    b = replicate(mesh, jnp.asarray(b_np))

    @jax.jit
    def solve(a, b):
        def matvec(v):
            return a.T @ (a @ v) + shift * v
        return cg_solve(matvec, b, None, CGParams(max_iter=200, tol=1e-12))

    res = solve(a, b)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-8)


def test_sharded_minsr_gram_matches_dense(mesh):
    """MinSR: Gram T = A A^H with A's sample rows sharded (the all-gather +
    sharded matmul replacing the reference's MPI ring exchange,
    minsr_tmatrix.h:79-118), eigh soft-pseudo-inverse back-substitution;
    result must match the dense single-device path."""
    from peps_tpu.optimizer.optimizer import (Evaluation, MinSRParams,
                                              minsr_natural_gradient)
    ns, p = 32, 48
    rng = np.random.default_rng(1)
    a_np = rng.normal(size=(ns, p)).astype(np.float64) / np.sqrt(ns)
    eps_np = rng.normal(size=(ns,)).astype(np.float64)
    prm = MinSRParams()

    def nat(a, eps):
        ev = Evaluation(energy=jnp.zeros(()), gradient=jnp.zeros((p,)),
                        o_samples=a, e_samples=eps)
        return minsr_natural_gradient(ev, prm, (p,))

    ref = jax.jit(nat)(jnp.asarray(a_np), jnp.asarray(eps_np))

    rowshard = NamedSharding(mesh, P("chains", None))
    sh = jax.jit(nat, in_shardings=(rowshard,
                                    NamedSharding(mesh, P("chains"))))(
        jax.device_put(jnp.asarray(a_np), rowshard),
        jax.device_put(jnp.asarray(eps_np),
                       NamedSharding(mesh, P("chains"))))
    np.testing.assert_allclose(np.asarray(sh), np.asarray(ref),
                               rtol=1e-9, atol=1e-12)


def test_full_train_step_dryrun_inprocess():
    """The driver's multi-chip dryrun body (sweep + energy/holes + SR CG +
    update, all sharded) runs green in-process on the 8-device mesh."""
    import __graft_entry__
    __graft_entry__._dryrun_multichip_impl(NDEV)


def test_sharded_graded_train_step_matches_single_device(mesh):
    """The graded fermionic train step (env-shared sweep + AD holes + SR)
    with chains sharded over 8 devices matches the single-device run
    bit-for-bit (VERDICT r2 ask: fermionic sharding coverage)."""
    import __graft_entry__
    from peps_tpu.algorithm.mc_evaluator import _mc_collect

    tps, configs, gmodel, gtrunc = __graft_entry__._build_graded(
        2, 3, 3, 8, dtype=jnp.float64)
    chi = 4
    key = jax.random.PRNGKey(11)

    def collect(tps, configs, key):
        cfgs, key, acc, tri, outs = _mc_collect(
            tps, configs, key, gmodel, chi, gtrunc, None,
            n_samples=1, sweeps_between=1, with_sr=True)
        return cfgs, outs[0], outs[1]

    ref_cfgs, ref_e, ref_o = jax.jit(collect)(tps, configs, key)

    cshard = NamedSharding(mesh, P("chains", None, None))
    sh = jax.jit(collect,
                 in_shardings=(NamedSharding(mesh, P()), cshard, None))
    sh_cfgs, sh_e, sh_o = sh(replicate(mesh, tps),
                             jax.device_put(configs, cshard), key)
    assert len(sh_cfgs.sharding.device_set) == NDEV
    np.testing.assert_array_equal(np.asarray(ref_cfgs), np.asarray(sh_cfgs))
    np.testing.assert_allclose(np.asarray(ref_e), np.asarray(sh_e),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ref_o), np.asarray(sh_o),
                               rtol=2e-5, atol=1e-7)


def test_sharded_measurement_collection_matches_single_device(mesh):
    """The measurement executor with input configs sharded over the mesh
    (shardings propagate through its jitted collect scan) produces the same
    statistics as the single-device run."""
    from peps_tpu.algorithm.measure import MeasurementParams, measure
    from peps_tpu.models import spin

    tps, configs, trunc, rule, chi = _sweep_problem(nchains=8)
    prm = MeasurementParams(num_samples=4, num_warmup_sweeps=2, nchains=8,
                            measure_offdiag_corr=True)
    key = jax.random.PRNGKey(21)
    ref = measure(tps, spin.heisenberg(1.0), prm, chi, trunc, rule,
                  configs, key)

    cshard = NamedSharding(mesh, P("chains", None, None))
    sh = measure(replicate(mesh, tps), spin.heisenberg(1.0), prm, chi,
                 trunc, rule, jax.device_put(configs, cshard), key)
    for k in ref.stats:
        # f32 state: sharded reductions reorder sums (~1e-6 noise)
        np.testing.assert_allclose(np.asarray(sh.stats[k][0]),
                                   np.asarray(ref.stats[k][0]),
                                   rtol=1e-4, atol=5e-6, err_msg=k)


def test_sharded_exact_sum_matches_single_device(mesh):
    """Exact-summation evaluation with the enumerated config batch sharded
    over the mesh (the reference's MPI round-robin split,
    exact_summation_energy_evaluator.h:173). 2x3 Sz=0 sector has 20
    configs -> pads to 24, exercising the zero-weight padding mask."""
    from peps_tpu.algorithm.exact_sum import (exact_sum_evaluation,
                                              pad_configs, sector_configs)

    ly, lx, D, chi = 2, 3, 2, 8
    tps = random_tps(jax.random.PRNGKey(7), ly, lx, 2, D,
                     dtype=jnp.float64, scale=0.6)
    model = spin.heisenberg(1.0)
    mt = ModelTensors.from_model(model, jnp.float64)
    trunc = TruncParams(chi, 1, 0.0)
    configs = sector_configs(ly, lx, {0: 3, 1: 3})
    assert configs.shape[0] == 20

    ref = exact_sum_evaluation(tps, jnp.asarray(configs), mt, chi, trunc,
                               with_sr_buffers=True)

    padded, mask = pad_configs(configs, NDEV)
    assert padded.shape[0] == 24 and mask.sum() == 20
    cshard = NamedSharding(mesh, P("chains", None, None))
    sh = exact_sum_evaluation(
        replicate(mesh, tps),
        jax.device_put(jnp.asarray(padded), cshard), mt, chi, trunc,
        with_sr_buffers=True,
        mask=jax.device_put(jnp.asarray(mask),
                            NamedSharding(mesh, P("chains"))))

    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sh.gradient),
                               np.asarray(ref.gradient),
                               rtol=1e-10, atol=1e-12)
    # padded SR rows are exactly zero => identical S = A^H A
    s_ref = np.asarray(ref.o_samples.conj().T @ ref.o_samples)
    s_sh = np.asarray(sh.o_samples.conj().T @ sh.o_samples)
    np.testing.assert_allclose(s_sh, s_ref, rtol=1e-10, atol=1e-13)


def test_sharded_exact_sum_pbc_matches_single_device(mesh):
    """The PBC (TRG-contracted) exact sum under config sharding: covers the
    periodic contraction path in the multi-chip program structure."""
    from peps_tpu.algorithm.exact_sum import (all_configs,
                                              exact_sum_energy_gradient)
    from peps_tpu.lattice import BoundaryCondition

    n, D, chi = 2, 2, 8
    tps = random_tps(jax.random.PRNGKey(9), n, n, 2, D, dtype=jnp.float64,
                     bc=BoundaryCondition.PERIODIC, scale=0.7)
    mt = ModelTensors.from_model(spin.heisenberg(1.0), jnp.float64)
    trunc = TruncParams(chi, 1, 0.0)
    configs = jnp.asarray(all_configs(n, n, 2))  # 16 -> 2 per device

    ref = exact_sum_energy_gradient(tps, configs, mt, chi, trunc,
                                    bc=BoundaryCondition.PERIODIC)
    cshard = NamedSharding(mesh, P("chains", None, None))
    sh = exact_sum_energy_gradient(replicate(mesh, tps),
                                   jax.device_put(configs, cshard), mt,
                                   chi, trunc,
                                   bc=BoundaryCondition.PERIODIC)
    np.testing.assert_allclose(float(sh.energy), float(ref.energy),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sh.gradient),
                               np.asarray(ref.gradient),
                               rtol=1e-9, atol=1e-12)
