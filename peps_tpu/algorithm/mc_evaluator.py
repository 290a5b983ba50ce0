"""Monte Carlo energy/gradient evaluator.

Reference: `MCEnergyGradEvaluator` (mc_energy_grad_evaluator.h:152): per
sample {sweep -> CalEnergyAndHoles -> accumulate O*, E_loc* O*}, then MPI
reductions. TPU version: the sample loop is a `lax.scan`, chains are a vmapped
batch axis, reductions are plain means under jit (device-sharded chain axes
turn them into psums automatically).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.algorithm.energy import ModelTensors, local_energy_and_holes
from peps_tpu.algorithm.energy_fermion import (FermionTensors,
                                               local_energy_and_holes_fermion)
from peps_tpu.algorithm.energy_pbc import local_energy_and_holes_pbc
from peps_tpu.lattice import BoundaryCondition, transpose_tps
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.statistics import mean_and_binned_error
from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
from peps_tpu.montecarlo.sweep_pbc import mc_sweep_pbc
from peps_tpu.optimizer.optimizer import Evaluation


@dataclasses.dataclass(frozen=True)
class MCParams:
    """Reference: MonteCarloParams (monte_carlo_peps_params.h:37)."""
    num_samples: int = 100          # sweeps used as samples (per chain)
    num_warmup_sweeps: int = 100
    sweeps_between_samples: int = 1
    nchains: int = 64
    # chain batch for the energy/hole table passes (memory bound). Note: on
    # the bosonic OBC path the env stacks (tops+bots+logs) are still built
    # at FULL chain batch and the bots ride in the scan carry — chunking
    # bounds only the table/hole intermediates, not the stack storage
    # (full-batch absorbs measured ~2x faster than chunked ones).
    eval_chunk: int | None = None
    # PBC-only: drive the bond sweep from the host (one jitted per-bond
    # step, bond as a traced arg) instead of a lax.scan over the TRG graph,
    # which the XLA TPU backend cannot compile (docs/tpu_engineering.md
    # "TPU TRG compile pathology"). None = auto: host-driven on TPU.
    host_sweep: bool | None = None
    # PBC host-sweep only: sequential bond decisions fused per executable
    # (exchange rule). >1 cuts the dispatch count k-fold but unrolls the
    # TRG body k times — validate compile time at your lattice size before
    # raising it (the same pathology that forces the host loop).
    fuse_bonds: int = 1
    # PBC-only: propose/commit bond moves through the multi-scale
    # trial/commit cache (pbc_trial.py — the reference's
    # BeginTrialWithReplacement/CommitTrial, trg_contractor.h:350-421)
    # instead of re-coarse-graining the whole torus per bond. Frozen-map
    # proposal semantics (the OBC BMPS env-reuse analogue), projectors
    # refreshed from the current configuration every sweep. None = auto:
    # on. False falls back to the full-recompute sweeps (the oracle).
    trial_sweep: bool | None = None


def _use_host_pbc(params_host_sweep, bc) -> bool:
    if bc != BoundaryCondition.PERIODIC:
        return False
    if params_host_sweep is None:
        return jax.default_backend() == "tpu"
    return params_host_sweep


def require_bosonic_for_pbc(model, bc) -> None:
    """Reference parity: periodic boundaries contract via TRG and the TRG
    contractor is boson-only (trg_contractor.h 'no fermions';
    monte_carlo_engine.h:516-557 validates the BC<->backend pairing and
    aborts on fermionic TRG). Reject fermionic models with bc=PERIODIC
    loudly instead of silently sampling from the wrong distribution."""
    if bc != BoundaryCondition.PERIODIC:
        return
    from peps_tpu.algorithm.energy_fermion import FermionTensors
    from peps_tpu.fermion.vmc import GradedFermionModel
    from peps_tpu.models.fermion import FermionModel
    if isinstance(model, (FermionTensors, GradedFermionModel,
                          FermionModel)):
        raise ValueError(
            "periodic boundaries use the TRG contractor, which is "
            "boson-only (reference: trg_contractor.h, "
            "monte_carlo_engine.h:516-557); fermionic models require "
            "BoundaryCondition.OPEN")


@partial(jax.jit, static_argnames=("chi", "trunc", "with_grad",
                                   "eval_chunk", "with_sr"))
def _pbc_eval_batch(tps, configs, model, chi, trunc, with_grad, eval_chunk,
                    with_sr):
    """Chunked per-chain PBC local-energy (+holes) pass; returns the same
    per-sample tuple as one step of the scanned collect."""
    nc = configs.shape[0]

    def fn(c):
        res = local_energy_and_holes_pbc(tps, c, model, chi, trunc,
                                         with_holes=with_grad)
        if with_grad and res.o_tensor is not None:
            # flatten per config BEFORE stacking: trailing (D, D) axes
            # tile-pad to (8, 128) when chain-stacked (see _mc_collect)
            res = res._replace(o_tensor=res.o_tensor.reshape(-1))
        return res

    if eval_chunk is None:
        res = jax.vmap(fn)(configs)
    else:
        res = jax.lax.map(fn, configs, batch_size=eval_chunk)
    if not with_grad:
        return (res.e_loc, None, None, None, res.log_abs_psi)
    o_flat = res.o_tensor.reshape(nc, -1)
    return (res.e_loc, o_flat if with_sr else None,
            jnp.sum(jnp.conj(o_flat), axis=0),
            None if with_sr else
            jnp.sum(res.e_loc[:, None] * jnp.conj(o_flat), axis=0),
            res.log_abs_psi)


def _mc_collect_host_pbc(tps, configs, key, model, chi, trunc, rule,
                         n_samples, sweeps_between, with_sr,
                         with_grad=True, eval_chunk=None, fuse_bonds=1,
                         trial_sweep=None):
    """Host-driven PBC sample collection: same sweep trajectories and
    return structure as the scanned _mc_collect (PERIODIC branch), with
    the bond loop dispatched per bond from the host — or, by default,
    through the trial/commit cache (two dispatches per sweep)."""
    import numpy as np

    from peps_tpu.montecarlo.sweep_pbc import (mc_sweep_pbc_host,
                                               mc_sweep_pbc_trial)

    use_trial = True if trial_sweep is None else trial_sweep
    nc = configs.shape[0]
    acc = tri = 0
    outs_list = []
    for _ in range(n_samples):
        for _ in range(sweeps_between):
            keys = jax.random.split(key, nc + 1)
            key = keys[0]
            if use_trial:
                configs, _, a, t = mc_sweep_pbc_trial(
                    tps, configs, keys[1:], chi, trunc, rule)
            else:
                configs, _, _, a, t = mc_sweep_pbc_host(
                    tps, configs, keys[1:], chi, trunc, rule,
                    fuse_bonds=fuse_bonds)
            acc += int(jnp.sum(a))
            tri += int(jnp.sum(t))
        step_out = _pbc_eval_batch(tps, configs, model, chi, trunc,
                                   with_grad, eval_chunk, with_sr)
        outs_list.append(tuple(None if x is None else np.asarray(x)
                               for x in step_out))
    outs = tuple(None if xs[0] is None
                 else jnp.asarray(np.stack(xs, axis=0))
                 for xs in zip(*outs_list))
    return (configs, key, jnp.asarray(acc, jnp.int32),
            jnp.asarray(tri, jnp.int32), outs)


@partial(jax.jit, static_argnames=("chi", "trunc", "rule",
                                   "n_samples", "sweeps_between", "with_sr",
                                   "bc", "with_grad", "eval_chunk"))
def _mc_collect(tps, configs, key, model: ModelTensors, chi, trunc, rule,
                n_samples, sweeps_between, with_sr,
                bc=BoundaryCondition.OPEN, with_grad=True,
                eval_chunk=None):
    """Scan the sample loop; returns e_locs [S, C], o sum / e*o sum (or full
    SR buffers), acceptance stats, final configs/key."""
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      local_energy_and_holes_graded,
                                      mc_sweep_fermion_shared as mc_sweep_fermion)

    graded = isinstance(model, GradedFermionModel)
    tps_t = None if graded else transpose_tps(tps)
    nc = configs.shape[0]
    periodic = bc == BoundaryCondition.PERIODIC

    def sweep_all(configs, key, bots=None):
        keys = jax.random.split(key, nc + 1)
        if graded:
            cfgs, _, stats = jax.vmap(
                mc_sweep_fermion, in_axes=(None, None, 0, 0, None, None))(
                tps, model.space, configs, keys[1:], chi, trunc)
        elif periodic:
            cfgs, _, stats = jax.vmap(
                mc_sweep_pbc, in_axes=(None, 0, 0, None, None, None))(
                tps, configs, keys[1:], chi, trunc, rule)
        elif bots is not None:
            cfgs, _, stats = jax.vmap(
                mc_sweep,
                in_axes=(None, None, 0, 0, None, None, None, None, 0))(
                tps, tps_t, configs, keys[1:], chi, trunc, rule, None, bots)
        else:
            cfgs, _, stats = jax.vmap(
                mc_sweep, in_axes=(None, None, 0, 0, None, None, None))(
                tps, tps_t, configs, keys[1:], chi, trunc, rule)
        return cfgs, keys[0], stats

    if graded:
        local = local_energy_and_holes_graded
    elif isinstance(model, FermionTensors):
        local = local_energy_and_holes_fermion
    elif periodic:
        local = local_energy_and_holes_pbc
    else:
        local = local_energy_and_holes
    # Bosonic OBC path: env stacks are computed for ALL chains in one
    # vmapped pass (absorbs at full batch run ~2x faster than chunked),
    # threaded into the (possibly chunked) table passes, AND the bottom
    # stacks are carried into the NEXT step's first sweep — the pre-sweep
    # network is exactly the network the evaluator just built stacks for
    # (reference analogue: the sweep updaters' env reuse schedule).
    use_bots = local is local_energy_and_holes

    def _flat(res):
        # flatten the per-config holes to 1D BEFORE the chain stack: a
        # stacked [nc, ly, lx, d, D, D, D, D] tensor tile-pads its trailing
        # (D, D) axes to (8, 128) — up to 16x (D=8) / 14x (D=12) physical
        # HBM inflation; at 16x16 D=12 the padded stack is 19.3 GB and
        # OOMs the 16 GB chip. [nc, n_params] pads only the lane remainder.
        if not with_grad or res.o_tensor is None:
            return res
        return res._replace(o_tensor=res.o_tensor.reshape(-1))

    def eval_all(configs):
        fn = lambda c: _flat(local(tps, c, model, chi, trunc,
                                   with_holes=with_grad))
        if use_bots:
            from peps_tpu.contraction import bmps as _bmps
            from peps_tpu.tps import project as _project
            stacks = jax.vmap(lambda c: _bmps.all_env_stacks(
                _project(tps, c), chi, trunc))(configs)
            fn2 = lambda args: _flat(local(tps, args[0], model, chi, trunc,
                                           with_holes=with_grad,
                                           stacks=args[1]))
            if eval_chunk is None:
                res = jax.vmap(lambda c, st: _flat(local(
                    tps, c, model, chi, trunc, with_holes=with_grad,
                    stacks=st)))(configs, stacks)
            else:
                res = jax.lax.map(fn2, (configs, stacks),
                                  batch_size=eval_chunk)
            return res, stacks.bots
        if eval_chunk is None:
            return jax.vmap(fn)(configs), None
        # memory-bounded evaluation: the holes/pair-table intermediates of a
        # full chain-batched vmap can exceed HBM at production sizes (8x8,
        # D=8, chi=32); lax.map with a batch keeps peak memory flat.
        return jax.lax.map(fn, configs, batch_size=eval_chunk), None

    def step(carry, _):
        configs, key, acc, tri, bots = carry
        for i in range(sweeps_between):
            configs, key, stats = sweep_all(configs, key,
                                            bots if i == 0 else None)
            acc = acc + jnp.sum(stats.accepted).astype(acc.dtype)
            tri = tri + jnp.sum(stats.trials).astype(tri.dtype)
        res, bots = eval_all(configs)
        if not with_grad:
            out = (res.e_loc, None, None, None, res.log_abs_psi)
            return (configs, key, acc, tri, bots), out
        o_flat = res.o_tensor.reshape(nc, -1)
        out = (res.e_loc, o_flat if with_sr else None,
               jnp.sum(jnp.conj(o_flat), axis=0),
               None if with_sr else
               jnp.sum(res.e_loc[:, None] * jnp.conj(o_flat), axis=0),
               res.log_abs_psi)
        return (configs, key, acc, tri, bots), out

    if use_bots:
        # initial bottom stacks of the starting configurations (one vmapped
        # flipped-top build; keeps the scan carry shape static)
        from peps_tpu.contraction import bmps as _bmps
        from peps_tpu.tps import project as _project

        def _bots_of(c):
            ftops, _ = _bmps.all_top_envs(
                _bmps.flip_vertical(_project(tps, c)), chi, trunc)
            return ftops[::-1]
        bots0 = jax.vmap(_bots_of)(configs)
    else:
        bots0 = None
    init = (configs, key, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            bots0)
    (configs, key, acc, tri, _), outs = jax.lax.scan(step, init, None,
                                                     length=n_samples)
    return configs, key, acc, tri, outs


def mc_energy_only(tps, configs, key, model: ModelTensors, chi: int,
                   trunc: TruncParams, rule: UpdateRule,
                   n_samples: int, sweeps_between: int = 1,
                   bc: BoundaryCondition = BoundaryCondition.OPEN):
    """Energy-only MC estimate — holes/gradients skipped (reference:
    EvaluateEnergyOnly, mc_energy_grad_evaluator.h:343). Used by the step
    selector and the energy-only L-BFGS line-search probes."""
    require_bosonic_for_pbc(model, bc)
    if _use_host_pbc(None, bc):
        _, _, _, _, outs = _mc_collect_host_pbc(
            tps, configs, key, model, chi, trunc, rule,
            n_samples, sweeps_between, with_sr=False, with_grad=False)
    else:
        _, _, _, _, outs = _mc_collect(
            tps, configs, key, model, chi, trunc, rule,
            n_samples, sweeps_between, with_sr=False, bc=bc,
            with_grad=False)
    e_locs = outs[0]
    energy, err = mean_and_binned_error(jnp.real(e_locs))
    return energy, err


@partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
def _center_scale(o_flat, n):
    """sqrt(n)-scaled centering of the O-sample matrix, in place (donated):
    a[s, p] = (O[s, p] - mean_s O[:, p]) / sqrt(n)."""
    obar = jnp.mean(o_flat, axis=0)
    return (o_flat - obar[None, :]) / jnp.sqrt(n).astype(o_flat.dtype)


def mc_energy_grad(tps, configs, key, model: ModelTensors, chi: int,
                   trunc: TruncParams, rule: UpdateRule, params: MCParams,
                   with_sr_buffers: bool = False,
                   bc: BoundaryCondition = BoundaryCondition.OPEN):
    """One VMC energy/gradient estimate. Returns (Evaluation, configs', key').

    Gradient (uniform |psi|^2 sampling): g = <conj(O)(E_loc - E)> over all
    samples x chains; x2 real part for real dtype (matches the exact-sum
    evaluator's convention so optimizers are interchangeable)."""
    require_bosonic_for_pbc(model, bc)
    if _use_host_pbc(params.host_sweep, bc):
        configs, key, acc, tri, outs = _mc_collect_host_pbc(
            tps, configs, key, model, chi, trunc, rule,
            params.num_samples, params.sweeps_between_samples,
            with_sr_buffers, eval_chunk=params.eval_chunk,
            fuse_bonds=params.fuse_bonds, trial_sweep=params.trial_sweep)
    else:
        configs, key, acc, tri, outs = _mc_collect(
            tps, configs, key, model, chi, trunc, rule,
            params.num_samples, params.sweeps_between_samples,
            with_sr_buffers, bc, eval_chunk=params.eval_chunk)
    e_locs, o_full, o_sum, eo_sum, log_psi = outs

    s, c = e_locs.shape
    n = s * c
    energy, err = mean_and_binned_error(jnp.real(e_locs))
    # surfaced in the optimizer JSONL (reference analogue: non-finite
    # energy-sample scan, mc_energy_grad_evaluator.h:437-470); a NaN here
    # usually means a compression fallback produced a non-finite amplitude
    nonfinite = int(jnp.sum(~jnp.isfinite(jnp.real(e_locs))))
    aux = {"nonfinite_samples": nonfinite} if nonfinite else None

    if with_sr_buffers:
        o_flat = o_full.reshape(n, -1)
        # center+scale with the input buffer DONATED: o_flat is [Ns, P]
        # (4.4 GB at 12x12 D=10 x384 samples) and an eager subtraction
        # materializes a second copy — the peak that OOMed the 16 GB chip
        # on the first stretch attempt. Donation lets XLA write `a` into
        # o_full's pages.
        a = _center_scale(o_flat, n)
        eps = (e_locs.reshape(n) - energy).astype(a.dtype) / jnp.sqrt(n).astype(a.dtype)
        if not jnp.iscomplexobj(tps):
            eps = 2.0 * eps
        grad = (jnp.conj(a.T) @ eps)
        if not jnp.iscomplexobj(tps):
            grad = jnp.real(grad)
        grad = grad.reshape(tps.shape).astype(tps.dtype)
        ev = Evaluation(energy, grad, err, a, eps,
                        acc / jnp.maximum(tri, 1), aux)
    else:
        oconj_bar = jnp.sum(o_sum, axis=0) / n      # <conj(O)>
        eo_bar = jnp.sum(eo_sum, axis=0) / n        # <E_loc conj(O)>
        grad = eo_bar - energy * oconj_bar          # <conj(O)(E_loc - E)>
        if not jnp.iscomplexobj(tps):
            grad = 2.0 * jnp.real(grad)
        grad = grad.reshape(tps.shape).astype(tps.dtype)
        ev = Evaluation(energy, grad, err, None, None,
                        acc / jnp.maximum(tri, 1), aux)
    return ev, configs, key, log_psi
