"""VMC optimization executor: engine + evaluator + optimizer glued together.

Reference: `VMCPEPSOptimizer` (vmc_peps_optimizer.h, impl :106): warm-up ->
IterativeOptimize(evaluator) -> dump final/lowest states. TPU version is a
thin host-side driver over jitted kernels; there is no broadcast step (the
state is a single device array, sharded chains see it automatically).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.mc_evaluator import (MCParams, mc_energy_grad,
                                             mc_energy_only)
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.engine import (ChainState, ensure_validity,
                                        init_configs_occupancy,
                                        init_configs_uniform,
                                        normalize_state_order1)
from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
from peps_tpu.lattice import BoundaryCondition, transpose_tps
from peps_tpu.optimizer.optimizer import (OptimizeResult, OptimizerParams,
                                          iterative_optimize)


@dataclasses.dataclass(frozen=True)
class VMCParams:
    """Reference: VMCPEPSOptimizerParams (vmc_peps_optimizer_params.h:22)."""
    chi: int
    trunc: TruncParams
    mc: MCParams
    optimizer: OptimizerParams
    rule: UpdateRule = UpdateRule("exchange")
    occupancy: tuple | None = None   # ((state, count), ...) or None = uniform
    bc: BoundaryCondition = BoundaryCondition.OPEN


class VMCResult(NamedTuple):
    state: jnp.ndarray
    lowest_state: jnp.ndarray
    energies: list
    lowest_energy: float
    records: list
    final_configs: jnp.ndarray


def vmc_optimize(tps: jnp.ndarray, model, params: VMCParams,
                 key: jax.Array, callback=None) -> VMCResult:
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    model_d = getattr(model, "phys_dim", None)
    if model_d is None:
        nu = getattr(model, "n_up", None)
        model_d = None if nu is None else nu.shape[0]
    if model_d is not None and model_d != d:
        raise ValueError(
            f"model physical dimension {model_d} != TPS physical dimension "
            f"{d} (tps shape {tps.shape})")
    from peps_tpu.algorithm.energy_fermion import FermionTensors
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      ensure_validity_fermion,
                                      mc_sweep_fermion_shared as mc_sweep_fermion,
                                      normalize_state_order1_fermion)
    from peps_tpu.models.fermion import FermionModel
    if isinstance(model, (ModelTensors, FermionTensors,
                          GradedFermionModel)):
        mt = model
    elif isinstance(model, FermionModel):
        mt = FermionTensors.from_model(model, tps.dtype)
    else:
        mt = ModelTensors.from_model(model, tps.dtype)
    graded = isinstance(mt, GradedFermionModel)
    from peps_tpu.algorithm.mc_evaluator import require_bosonic_for_pbc
    require_bosonic_for_pbc(mt, params.bc)

    key, k_init, k_rescue = jax.random.split(key, 3)
    if params.occupancy is not None:
        configs = init_configs_occupancy(k_init, params.mc.nchains, ly, lx,
                                         dict(params.occupancy))
    else:
        configs = init_configs_uniform(k_init, params.mc.nchains, ly, lx, d)
    if graded:
        configs, _ = ensure_validity_fermion(tps, configs, k_rescue,
                                             mt.space, params.chi,
                                             params.trunc)
        tps = normalize_state_order1_fermion(tps, configs, mt.space,
                                             params.chi, params.trunc)
    else:
        configs, _ = ensure_validity(tps, configs, k_rescue, params.chi,
                                     params.trunc)
        tps = normalize_state_order1(tps, configs, params.chi, params.trunc)

    # warm-up
    if graded:
        warm = jax.jit(lambda t, cfgs, k: jax.vmap(
            mc_sweep_fermion, in_axes=(None, None, 0, 0, None, None))(
            t, mt.space, cfgs, jax.random.split(k, cfgs.shape[0]),
            params.chi, params.trunc))
        for _ in range(params.mc.num_warmup_sweeps):
            key, k_s = jax.random.split(key)
            configs, _, _ = warm(tps, configs, k_s)
    elif params.bc == BoundaryCondition.PERIODIC:
        from peps_tpu.algorithm.mc_evaluator import _use_host_pbc
        if _use_host_pbc(params.mc.host_sweep, params.bc):
            from peps_tpu.montecarlo.sweep_pbc import mc_sweep_pbc_host
            la0s = None
            for _ in range(params.mc.num_warmup_sweeps):
                key, k_s = jax.random.split(key)
                ks = jax.random.split(k_s, configs.shape[0])
                configs, _, la0s, _, _ = mc_sweep_pbc_host(
                    tps, configs, ks, params.chi, params.trunc,
                    params.rule, la0s=la0s,
                    fuse_bonds=params.mc.fuse_bonds)
        else:
            from peps_tpu.montecarlo.sweep_pbc import mc_sweep_pbc
            warm = jax.jit(lambda t, cfgs, k: jax.vmap(
                mc_sweep_pbc, in_axes=(None, 0, 0, None, None, None))(
                t, cfgs, jax.random.split(k, cfgs.shape[0]), params.chi,
                params.trunc, params.rule))
            for _ in range(params.mc.num_warmup_sweeps):
                key, k_s = jax.random.split(key)
                configs, _, _ = warm(tps, configs, k_s)
    else:
        tps_t = transpose_tps(tps)
        warm = jax.jit(lambda t, tt, cfgs, k: jax.vmap(
            mc_sweep, in_axes=(None, None, 0, 0, None, None, None))(
            t, tt, cfgs, jax.random.split(k, cfgs.shape[0]), params.chi,
            params.trunc, params.rule))
        for _ in range(params.mc.num_warmup_sweeps):
            key, k_s = jax.random.split(key)
            configs, _, _ = warm(tps, tps_t, configs, k_s)

    # evaluator closure with persistent sampler state
    sampler = {"configs": configs, "key": key}
    needs_sr = type(params.optimizer.algorithm).__name__ in ("SRParams",
                                                             "MinSRParams")

    def evaluate(state, step):
        ev, cfgs, k, log_psi = mc_energy_grad(
            state, sampler["configs"], sampler["key"], mt, params.chi,
            params.trunc, params.rule, params.mc, with_sr_buffers=needs_sr,
            bc=params.bc)
        sampler["configs"], sampler["key"] = cfgs, k
        return ev

    probe = {"n": 0}

    def evaluate_energy_only(state):
        """Energy-only probe (reference EvaluateEnergyOnly,
        mc_energy_grad_evaluator.h:343) for the step selector / L-BFGS
        line search. Probes do NOT advance the sampler state; each probe
        gets a decorrelated key."""
        probe["n"] += 1
        k = jax.random.fold_in(sampler["key"], probe["n"])
        e, _ = mc_energy_only(
            state, sampler["configs"], k, mt, params.chi, params.trunc,
            params.rule, params.mc.num_samples,
            params.mc.sweeps_between_samples, bc=params.bc)
        return e

    result = iterative_optimize(tps, evaluate, params.optimizer,
                                evaluate_energy_only=evaluate_energy_only,
                                callback=callback)
    return VMCResult(result.state, result.lowest_state, result.energies,
                     result.lowest_energy, result.records, sampler["configs"])
