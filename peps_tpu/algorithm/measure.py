"""Monte Carlo measurement executor + observable registry.

Reference: `MCPEPSMeasurer` (`monte_carlo_peps_measurer.h`, impl) and the
observable registry (`model_measurement_solver.h:28-51`): solvers declare
ObservableMeta{key, shape, ...} and emit a map per sample; the measurer
aggregates means/stderr and dumps stats.

TPU re-design: one jitted per-sample function returns a dict of dense arrays
for ALL observables at once; the sample loop is a scan; statistics are
computed on-device. Two-point off-diagonal correlators use a "walker"
accumulation along rows (the reference's BMPSWalker excited-state propagation,
`bmps_contractor.h:357-610`) expressed as vmapped scans.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import signal
import time
import types
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.algorithm.energy import ModelTensors, local_energy_and_holes
from peps_tpu.contraction import bmps
from peps_tpu.lattice import transpose_tps
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.statistics import (integrated_autocorrelation_time,
                                            mean_and_binned_error,
                                            mean_and_binned_error_batch)
from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
from peps_tpu.tps import project


@dataclasses.dataclass(frozen=True)
class ObservableMeta:
    key: str
    description: str
    shape: tuple
    index_labels: tuple = ()
    coords: object = None      # [K, ncoord] int array or None


class MeasureResult(NamedTuple):
    stats: dict        # key -> (mean ndarray, stderr ndarray)
    metas: dict        # key -> ObservableMeta
    energy_autocorr_time: float
    accept_rate: float
    psi_samples: np.ndarray   # log|psi| per (sample, chain)
    # wall seconds of the sampling loop alone (sweeps + evals + fetches),
    # excluding warm-up and executable build/load — the number to divide
    # samples by when quoting steady-state throughput
    sampling_wall_s: float = float("nan")


def _one_point_diag(config, site_values):
    """Diagonal one-point function, e.g. Sz: site_values[d] -> [Ly, Lx]."""
    return site_values[config]


def _row_offdiag_corr(tps, tn, config, op_a, op_b, chi, trunc, stacks):
    """In-row correlator <A(x1) B(x2)> for all rows and x1 < x2.

    Returns [Ly, Lx, Lx] (zero where x2 <= x1). op_a/op_b: [d, d] with
    convention <c|Op|p> = op[c, p] mapping current config row entries."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    dtype = tps.dtype

    def per_row(top, bot, row, cands, cfg_row):
        envs = bmps.row_envs(top, bot, row)
        # weighted candidate tensors: csum_a[x] = sum_p op_a[c_x, p] cands[x, p]
        wa = op_a[cfg_row]                       # [Lx, d]
        wb = op_b[cfg_row]                       # [Lx, d]
        ca = jnp.einsum("xp,xpuldr->xuldr", wa.astype(dtype), cands)
        cb = jnp.einsum("xp,xpuldr->xuldr", wb.astype(dtype), cands)
        psi_loc = jnp.einsum(
            "xuldr,xuldr->x",
            bmps.punch_holes_row(envs, top, bot), row)

        def for_x1(x1):
            # walker: E starts as lefts[x1] . col(ca[x1]); then propagate
            start = bmps._col_transfer_left(envs.lefts[x1], top[x1], ca[x1],
                                            bot[x1])

            def scan_x(carry, x):
                e = carry
                # correlation at x (only valid for x > x1)
                closed = bmps._col_transfer_left(e, top[x], cb[x], bot[x])
                val = jnp.einsum("alc,alc->", closed, envs.rights[x + 1])
                # rights[] envs were normalized with different dropped log
                # weights than the x1-closure reference; compensate.
                val = val * jnp.exp(envs.log_rights[x + 1]
                                    - envs.log_rights[x1 + 1])
                stepped = bmps._col_transfer_left(e, top[x], row[x], bot[x])
                # freeze the carry until the walker reaches x1 (the start env
                # already contains all columns <= x1)
                e_next = jnp.where(x > x1, stepped, e)
                val = jnp.where(x > x1, val, 0.0)
                return e_next, val

            _, vals = jax.lax.scan(scan_x, start, jnp.arange(lx))
            mask = jnp.arange(lx) > x1
            psi_ref = jnp.where(psi_loc[x1] == 0, 1.0, psi_loc[x1])
            return jnp.where(mask, vals / psi_ref, 0.0)

        return jax.vmap(for_x1)(jnp.arange(lx))   # [Lx(x1), Lx(x2)]

    return jax.vmap(per_row)(stacks.tops[:ly], stacks.bots[1:], tn, tps,
                             config)


def standard_spin_observables(d: int = 2):
    """Observable set for spin-1/2 models (reference: the measurement solvers'
    registries, e.g. square_spin_onehalf_xxz_obc.h)."""
    sz = np.array([0.5, -0.5] if d == 2 else np.arange(d) - (d - 1) / 2)
    sp = np.array([[0.0, 1.0], [0.0, 0.0]])
    sm = sp.T
    return {"sz_values": sz, "op_a": sp, "op_b": sm}


# Compiled-executable reuse ACROSS measure() calls. The jitted collect /
# warm-up / env-walker graphs used to be rebuilt as fresh closures on every
# call, so every call recompiled everything (~110 s at production sizes; a
# flagship run makes 4 measure() calls). The state array and its transpose
# are explicit ARGUMENTS of the cached functions; everything else a closure
# bakes in as compile-time constants (model tensors, registry observable
# constants, chi/trunc/rule) is pinned by a value fingerprint in the key.
_EXEC_CACHE: dict = {}
_EXEC_CACHE_MAX = 16


def _exec_fingerprint(*trees) -> str:
    import hashlib
    h = hashlib.sha256()
    for tree in trees:
        leaves, treedef = jax.tree.flatten(tree)
        h.update(str(treedef).encode())
        for leaf in leaves:
            arr = np.asarray(leaf)
            h.update(str((arr.shape, str(arr.dtype))).encode())
            h.update(arr.tobytes())
    return h.hexdigest()


def _fp_value(v, h, seen) -> None:
    """Feed one captured value into the hash, recursing through containers,
    dataclasses and nested function closures. Unknown object types hash
    their __dict__ (if any) plus their type name, so a constants-bearing
    object that slips through still perturbs the key."""
    if isinstance(v, (types.ModuleType, type)):
        h.update(getattr(v, "__name__", str(v)).encode())
        return
    if callable(v) and hasattr(v, "__code__"):
        _fp_callable(v, h, seen)
        return
    if isinstance(v, (jnp.ndarray, np.ndarray, np.generic)):
        arr = np.asarray(v)
        h.update(str((arr.shape, str(arr.dtype))).encode())
        h.update(arr.tobytes())
        return
    if v is None or isinstance(v, (bool, int, float, complex, str, bytes)):
        h.update(repr(v).encode())
        return
    if id(v) in seen:       # containers/objects can be cyclic
        return
    seen.add(id(v))
    if isinstance(v, (tuple, list)):
        h.update(b"[")
        for x in v:
            _fp_value(x, h, seen)
        h.update(b"]")
        return
    if isinstance(v, dict):
        for k in sorted(v, key=repr):
            h.update(repr(k).encode())
            _fp_value(v[k], h, seen)
        return
    if dataclasses.is_dataclass(v):
        h.update(type(v).__name__.encode())
        for f in dataclasses.fields(v):
            h.update(f.name.encode())
            _fp_value(getattr(v, f.name), h, seen)
        return
    h.update(type(v).__name__.encode())
    d = getattr(v, "__dict__", None)
    if d:
        _fp_value(d, h, seen)
    elif hasattr(v, "_asdict"):             # NamedTuple instances
        _fp_value(v._asdict(), h, seen)


def _fp_callable(fn, h, seen) -> None:
    """Hash a function's bytecode, constants, defaults, and — crucially —
    every value captured in its closure cells, recursively."""
    if id(fn) in seen:
        return
    seen.add(id(fn))
    if isinstance(fn, functools.partial):
        _fp_value(fn.func, h, seen)
        _fp_value(fn.args, h, seen)
        _fp_value(fn.keywords, h, seen)
        return
    code = getattr(fn, "__code__", None)
    if code is not None:
        h.update(code.co_code)
        _fp_value(code.co_consts, h, seen)
    for cell in (getattr(fn, "__closure__", None) or ()):
        try:
            _fp_value(cell.cell_contents, h, seen)
        except ValueError:      # empty cell
            continue
    for dv in (getattr(fn, "__defaults__", None) or ()):
        _fp_value(dv, h, seen)


def _registry_fingerprint(registry) -> str:
    """Fingerprint of the full observable registry BY CONSTRUCTION: every
    constant a compute/coords closure captures is hashed automatically (no
    manual declaration discipline — the round-4 cache pinned only observable
    KEYS, so two observables with the same key but different operator
    constants would silently share a cached executable; see NOTES round-4
    infra warning). Mechanically guarded by
    tests/test_measure.py::test_exec_cache_respects_observable_constants."""
    import hashlib
    h = hashlib.sha256()
    seen: set = set()
    for ob in registry:
        h.update(ob.key.encode())
        h.update(repr((ob.needs_envs, ob.uses_stacks,
                       ob.uses_stacks_t, ob.index_labels)).encode())
        _fp_callable(ob.compute, h, seen)
        if ob.coords is not None:
            _fp_callable(ob.coords, h, seen)
    return h.hexdigest()


@dataclasses.dataclass(frozen=True)
class MeasurementParams:
    """Reference: MCMeasurementParams (vmc_peps_optimizer_params.h:167)."""
    num_samples: int = 500
    num_warmup_sweeps: int = 100
    sweeps_between_samples: int = 1
    nchains: int = 64
    measure_offdiag_corr: bool = True
    measure_pair_corr: bool = False   # t-J <Delta^dag Delta> walker scans
    chunk_size: int = 0      # >0: collect in chunks, allowing graceful stop
    handle_signals: bool = False  # SIGINT/SIGTERM -> stop + dump partial
    progress: bool = False   # per-chunk console progress + ETA (reference:
    #                          measurer progress bar, monte_carlo_peps_measurer.h:168)
    # chain batch for the per-sample energy/observable pass (memory bound,
    # same role as MCParams.eval_chunk): the full chain-batched vmap of the
    # local-energy tables can exceed HBM at production sizes (graded 6x6
    # D=8 chi=32 needs ~0.8 GB/chain)
    eval_chunk: int | None = None
    # config batch for the split env-walker pass (pair correlators etc.):
    # larger batches amortize dispatch on TPU, memory permitting
    env_chunk: int | None = None
    # PBC-only: host-driven bond sweep (see MCParams.host_sweep);
    # None = auto (host-driven on TPU)
    host_sweep: bool | None = None
    # PBC host-sweep only: bond decisions fused per executable (see
    # MCParams.fuse_bonds)
    fuse_bonds: int = 1
    # PBC-only: sweep through the trial/commit cache (see
    # MCParams.trial_sweep); None = auto: on
    trial_sweep: bool | None = None


def measure(tps: jnp.ndarray, model, params: MeasurementParams,
            chi: int, trunc: TruncParams, rule: UpdateRule,
            configs: jnp.ndarray, key: jax.Array,
            dump_dir: str | None = None, bc=None) -> MeasureResult:
    """Run the measurement loop and aggregate statistics."""
    from peps_tpu.algorithm.energy_fermion import (
        FermionTensors, local_energy_and_holes_fermion)
    from peps_tpu.algorithm.energy_pbc import local_energy_and_holes_pbc
    from peps_tpu.lattice import BoundaryCondition
    from peps_tpu.models.fermion import FermionModel
    from peps_tpu.montecarlo.sweep_pbc import mc_sweep_pbc

    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      local_energy_and_holes_graded,
                                      mc_sweep_fermion_shared as mc_sweep_fermion)

    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    periodic = bc == BoundaryCondition.PERIODIC
    if periodic:
        from peps_tpu.algorithm.mc_evaluator import require_bosonic_for_pbc
        require_bosonic_for_pbc(model, BoundaryCondition.PERIODIC)
    if isinstance(model, (ModelTensors, FermionTensors,
                          GradedFermionModel)):
        mt = model
    elif isinstance(model, FermionModel):
        mt = FermionTensors.from_model(model, tps.dtype)
    else:
        mt = ModelTensors.from_model(model, tps.dtype)
    graded = isinstance(mt, GradedFermionModel)
    if graded:
        local_fn = local_energy_and_holes_graded
    elif isinstance(mt, FermionTensors):
        local_fn = local_energy_and_holes_fermion
    elif periodic:
        local_fn = local_energy_and_holes_pbc
    else:
        local_fn = local_energy_and_holes
    # per-model observable REGISTRY (reference: ModelMeasurementSolver
    # registry, model_measurement_solver.h:28-51; models declare observables
    # as data — see peps_tpu/algorithm/registry.py)
    from peps_tpu.algorithm.registry import (MeasureContext,
                                             fermion_registry, spin_registry)
    if graded:
        registry = fermion_registry(mt.ft, params)
    elif isinstance(mt, FermionTensors):
        registry = fermion_registry(mt, params)
    elif d == 2:
        registry = spin_registry(params)
    else:
        registry = []
    if periodic or graded:
        # walker scans assume OBC bosonic environments
        registry = [ob for ob in registry if not ob.needs_envs]
    if graded and getattr(params, "measure_pair_corr", False) \
            and not mt.ft.spinless and d == 3:
        # graded-state pair correlators: env-shared walkers in both frames
        # (shared row envs for horizontal pairs; excited-BMPS propagation
        # for vertical pairs) with snake-order operator signs
        from peps_tpu.algorithm.measure_fermion import (
            tj_singlet_pair_corr_graded_colshared,
            tj_singlet_pair_corr_graded_rowshared)
        from peps_tpu.algorithm.registry import Observable
        # ctx.stacks carries the GradedEnvShared bundle (projected net +
        # env stacks + candidates + flip masks), built ONCE per config in
        # the env pass and shared by both walkers
        registry.append(Observable(
            "pair_corr_row", "t-J singlet pair correlation (graded state, "
            "in-row horizontal bond pairs; env-shared walker)",
            lambda ctx: tj_singlet_pair_corr_graded_rowshared(
                ctx.tps, ctx.config, mt.space, ctx.chi, ctx.trunc,
                shared=ctx.stacks),
            None, ("y", "x1", "x2"), needs_envs=True, uses_stacks=True))
        registry.append(Observable(
            "pair_corr_col", "t-J singlet pair correlation (graded state, "
            "in-column vertical bond pairs; env-shared excited-BMPS walker)",
            lambda ctx: tj_singlet_pair_corr_graded_colshared(
                ctx.tps, ctx.config, mt.space, ctx.chi, ctx.trunc,
                shared=ctx.stacks),
            None, ("x", "y1", "y2"), needs_envs=True, uses_stacks=True))
    nc = configs.shape[0]
    tps_t = transpose_tps(tps)
    # Split the observable graph (compile-time control at production sizes:
    # one fused sweep+walkers graph took ~10 min of XLA at 8x8 D=8): cheap
    # (diagonal) observables ride the sample-collection scan; env-walker
    # observables run afterwards in SEPARATELY-JITTED chunked passes over
    # the collected configurations, sharing ONE env-stack build per config.
    cheap_obs = [ob for ob in registry if not ob.needs_envs]
    env_obs = [ob for ob in registry if ob.needs_envs]

    from functools import partial as _partial

    exec_key = (_exec_fingerprint(mt),
                _registry_fingerprint(registry), tps.shape,
                str(tps.dtype), chi, repr(trunc), repr(rule), graded,
                periodic, params.eval_chunk, params.env_chunk,
                params.sweeps_between_samples, nc)
    cached = _EXEC_CACHE.get(exec_key)
    if cached is None:
        def per_sample(tps, tps_t, cfg):
            res = local_fn(tps, cfg, mt, chi, trunc,
                           with_holes=False)
            ctx = MeasureContext(tps, tps_t, cfg, jnp.real(res.e_loc), chi,
                                 trunc)
            out = {"energy": jnp.real(res.e_loc)}
            for ob in cheap_obs:
                out[ob.key] = ob.compute(ctx)
            out["log_abs_psi"] = res.log_abs_psi
            out["_config"] = cfg
            return out

        def sweep_all(tps, tps_t, cfgs, k):
            ks = jax.random.split(k, nc + 1)
            if graded:
                new, _, stats = jax.vmap(
                    mc_sweep_fermion,
                    in_axes=(None, None, 0, 0, None, None))(
                    tps, mt.space, cfgs, ks[1:], chi, trunc)
            elif periodic:
                new, _, stats = jax.vmap(
                    mc_sweep_pbc, in_axes=(None, 0, 0, None, None, None))(
                    tps, cfgs, ks[1:], chi, trunc, rule)
            else:
                new, _, stats = jax.vmap(
                    mc_sweep, in_axes=(None, None, 0, 0, None, None, None))(
                    tps, tps_t, cfgs, ks[1:], chi, trunc, rule)
            return new, ks[0], stats

        @_partial(jax.jit, static_argnames=("length",))
        def collect_fn(tps, tps_t, cfgs, k, length):
            def step(carry, _):
                cfgs, k, acc, tri = carry
                for _ in range(params.sweeps_between_samples):
                    cfgs, k, stats = sweep_all(tps, tps_t, cfgs, k)
                    acc = acc + jnp.sum(stats.accepted).astype(acc.dtype)
                    tri = tri + jnp.sum(stats.trials).astype(tri.dtype)
                ps = lambda c: per_sample(tps, tps_t, c)
                if params.eval_chunk is None:
                    vals = jax.vmap(ps)(cfgs)
                else:
                    vals = jax.lax.map(ps, cfgs,
                                       batch_size=params.eval_chunk)
                return (cfgs, k, acc, tri), vals

            init = (cfgs, k, jnp.zeros((), jnp.int32),
                    jnp.zeros((), jnp.int32))
            (cfgs, k, acc, tri), outs = jax.lax.scan(step, init, None,
                                                     length=length)
            return cfgs, k, acc, tri, outs

        @_partial(jax.jit, static_argnames=("n",))
        def warm_scan_fn(tps, tps_t, cfgs, k, n):
            def body(carry, _):
                cfgs, k = carry
                cfgs, k, _ = sweep_all(tps, tps_t, cfgs, k)
                return (cfgs, k), None
            (cfgs, k), _ = jax.lax.scan(body, (cfgs, k), None, length=n)
            return cfgs, k

        cached = {"per_sample": per_sample, "collect": collect_fn,
                  "warm_scan": warm_scan_fn, "env_fn": None,
                  "env_obs": env_obs}
        if len(_EXEC_CACHE) >= _EXEC_CACHE_MAX:
            _EXEC_CACHE.pop(next(iter(_EXEC_CACHE)))
        _EXEC_CACHE[exec_key] = cached
    per_sample = cached["per_sample"]
    collect_fn = cached["collect"]
    warm_scan_fn = cached["warm_scan"]

    def collect(cfgs, k, length):
        return collect_fn(tps, tps_t, cfgs, k, length)

    # PBC on TPU: the scanned TRG sweep graph cannot compile (XLA
    # pathology, docs/tpu_engineering.md) — drive the bond loop from the
    # host and jit only the per-bond step + the chunked per-sample pass.
    from peps_tpu.algorithm.mc_evaluator import _use_host_pbc
    host_pbc = periodic and _use_host_pbc(params.host_sweep,
                                          BoundaryCondition.PERIODIC)
    if host_pbc:
        from peps_tpu.montecarlo.sweep_pbc import (mc_sweep_pbc_host,
                                                   mc_sweep_pbc_trial)
        use_trial = (True if params.trial_sweep is None
                     else params.trial_sweep)

        def _one_sweep(cfgs, keys):
            if use_trial:
                cfgs, _, a, t = mc_sweep_pbc_trial(
                    tps, cfgs, keys, chi, trunc, rule)
            else:
                cfgs, _, _, a, t = mc_sweep_pbc_host(
                    tps, cfgs, keys, chi, trunc, rule,
                    fuse_bonds=params.fuse_bonds)
            return cfgs, a, t

        eval_c = params.eval_chunk or 4
        per_sample_batch = jax.jit(lambda cs: jax.lax.map(
            lambda c: per_sample(tps, tps_t, c), cs, batch_size=eval_c))

        def collect(cfgs, k, length):          # noqa: F811
            acc = jnp.zeros((), jnp.int32)
            tri = jnp.zeros((), jnp.int32)
            outs_l = []
            for _ in range(length):
                for _ in range(params.sweeps_between_samples):
                    ks = jax.random.split(k, nc + 1)
                    k = ks[0]
                    cfgs, a, t = _one_sweep(cfgs, ks[1:])
                    acc = acc + jnp.sum(a)
                    tri = tri + jnp.sum(t)
                outs_l.append(jax.tree.map(np.asarray,
                                           per_sample_batch(cfgs)))
            outs = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *outs_l)
            return cfgs, k, acc, tri, outs

    # warm-up
    if host_pbc:
        # same key stream as warm_scan_fn: ONE outer split, then the carried
        # key is re-split per sweep exactly like sweep_all (so the host path
        # reproduces the scanned path's trajectories bit-for-bit —
        # regression: test_pbc_host_collect_matches_scanned)
        if params.num_warmup_sweeps > 0:
            key, ks = jax.random.split(key)
            for _ in range(params.num_warmup_sweeps):
                kc = jax.random.split(ks, nc + 1)
                ks = kc[0]
                configs, _, _ = _one_sweep(configs, kc[1:])
    else:
        # one jitted (and cross-call-cached) scan over all warm-up sweeps:
        # calling the sweep eagerly costs ~27 s/sweep in trace overhead at
        # production sizes (vs 0.5 s compiled) — at num_warmup_sweeps=100
        # the eager path dominated the whole measurement phase
        if params.num_warmup_sweeps > 0:
            key, ks = jax.random.split(key)
            configs, _ = warm_scan_fn(tps, tps_t, configs, ks,
                                      params.num_warmup_sweeps)

    # graceful-stop support (reference: MPISignalGuard, base/mpi_signal_guard.h:
    # SIGINT/SIGTERM -> flag -> per-sweep check -> break and dump partials).
    stop_flag = {"stop": False}
    old_handlers = {}
    if params.handle_signals:
        def _handler(signum, frame):
            stop_flag["stop"] = True
        for sig in (signal.SIGINT, signal.SIGTERM):
            old_handlers[sig] = signal.signal(sig, _handler)

    try:
        chunk = params.chunk_size if params.chunk_size > 0 else params.num_samples
        collected = []
        done = 0
        acc = tri = 0
        t_start = time.time()
        # pipelined fetch: dispatch chunk k+1 (async), THEN pull chunk k's
        # outputs to host while the device runs k+1 — through the remote
        # device tunnel a synchronous per-chunk np.asarray serializes
        # transfer latency with compute and costs ~2x at small chunks
        pending = None

        def _drain(p):
            nonlocal acc, tri
            a, t, outs_c, n_p = p
            acc, tri = acc + int(a), tri + int(t)
            collected.append(jax.tree.map(np.asarray, outs_c))
            if params.progress and done < params.num_samples:
                dt = time.time() - t_start
                eta = dt / max(done, 1) * (params.num_samples - done)
                print(f"[measure] {done}/{params.num_samples} samples "
                      f"({dt:.0f}s, ~{eta:.0f}s left, accept "
                      f"{acc / max(tri, 1):.3f})", flush=True)

        while done < params.num_samples and not stop_flag["stop"]:
            n = min(chunk, params.num_samples - done)
            configs, key, a, t, outs_c = collect(configs, key, n)
            done += n
            prev, pending = pending, (a, t, outs_c, n)
            if prev is not None:
                _drain(prev)
        if pending is not None:
            _drain(pending)
        t_sampling = time.time() - t_start
        outs = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *collected)
    finally:
        for sig, h in old_handlers.items():
            signal.signal(sig, h)

    cfgs_all = outs.pop("_config")               # [S, C, Ly, Lx]
    if env_obs:
        s_dim, c_dim = cfgs_all.shape[:2]
        flat_cfgs = jnp.asarray(cfgs_all.reshape(-1, ly, lx))
        build_stacks = any(ob.uses_stacks for ob in env_obs)
        build_stacks_t = any(ob.uses_stacks_t for ob in env_obs)

        if cached["env_fn"] is None:
            c_env_obs = cached["env_obs"]

            def env_group(tps, tps_t, cfg):
                stacks = stacks_t = None
                if build_stacks:
                    if graded:
                        from peps_tpu.algorithm.measure_fermion import \
                            graded_env_shared
                        stacks = graded_env_shared(tps, cfg, mt.space, chi,
                                                   trunc)
                    else:
                        stacks = bmps.all_env_stacks(project(tps, cfg),
                                                     chi, trunc)
                if build_stacks_t:
                    stacks_t = bmps.all_env_stacks(project(tps_t, cfg.T),
                                                   chi, trunc)
                ctx = MeasureContext(tps, tps_t, cfg,
                                     jnp.zeros((), tps.real.dtype
                                               if jnp.iscomplexobj(tps)
                                               else tps.dtype),
                                     chi, trunc, stacks, stacks_t)
                return {ob.key: ob.compute(ctx) for ob in c_env_obs}

            cached["env_fn"] = jax.jit(
                lambda tps, tps_t, cs, env_chunk: jax.lax.map(
                    lambda c: env_group(tps, tps_t, c), cs,
                    batch_size=env_chunk),
                static_argnames=("env_chunk",))
        env_chunk = min(params.env_chunk or 8, flat_cfgs.shape[0])
        env_out = jax.tree.map(np.asarray,
                               cached["env_fn"](tps, tps_t, flat_cfgs,
                                                env_chunk))
        for k_name, arr in env_out.items():
            outs[k_name] = arr.reshape((s_dim, c_dim) + arr.shape[1:])

    stats, metas = {}, {}
    for k_name, arr in outs.items():
        if k_name == "log_abs_psi":
            continue
        # arr: [S, C, *shape] — one vectorized binned reduction over the
        # trailing axes (szsz on 16x16 is 65k scalars; a python loop here
        # dominated wall time)
        a = np.asarray(arr)
        s, c = a.shape[:2]
        flat = a.reshape(s, c, -1)
        m_v, e_v = mean_and_binned_error_batch(jnp.asarray(flat))
        means = np.asarray(m_v, dtype=np.float64)
        errs = np.asarray(e_v, dtype=np.float64)
        shape = a.shape[2:] if a.ndim > 2 else ()
        stats[k_name] = (means.reshape(shape) if shape else means[0],
                         errs.reshape(shape) if shape else errs[0])
        ob = next((o for o in registry if o.key == k_name), None)
        coords = (ob.coords(ly, lx) if ob is not None
                  and ob.coords is not None else None)
        metas[k_name] = ObservableMeta(
            k_name, ob.description if ob is not None else k_name, shape,
            ob.index_labels if ob is not None else (), coords)

    e_samples = np.asarray(outs["energy"])
    tau = integrated_autocorrelation_time(e_samples.reshape(e_samples.shape[0], -1))
    result = MeasureResult(stats, metas, tau,
                           float(acc) / max(float(tri), 1.0),
                           np.asarray(outs["log_abs_psi"]),
                           sampling_wall_s=t_sampling)
    if dump_dir:
        dump_stats(result, dump_dir)
    return result


def dump_stats(result: MeasureResult, dump_dir: str) -> None:
    """CSV dumps (reference: stats/<key>.csv + samples/psi.csv,
    monte_carlo_peps_measurer.h:268-341)."""
    os.makedirs(os.path.join(dump_dir, "stats"), exist_ok=True)
    for key, (mean, err) in result.stats.items():
        path = os.path.join(dump_dir, "stats", f"{key}.csv")
        m = np.atleast_1d(mean).reshape(-1)
        e = np.atleast_1d(err).reshape(-1)
        with open(path, "w") as f:
            f.write("index,mean,stderr\n")
            for i, (mi, ei) in enumerate(zip(m, e)):
                f.write(f"{i},{mi!r},{ei!r}\n")
    # coordinate map files (reference: <key>_coords.txt dumps,
    # monte_carlo_peps_measurer.h:268-341)
    for key, meta in result.metas.items():
        if getattr(meta, "coords", None) is not None:
            np.savetxt(os.path.join(dump_dir, "stats",
                                    f"{key}_coords.txt"),
                       np.asarray(meta.coords), fmt="%d",
                       header=",".join(meta.index_labels))
    os.makedirs(os.path.join(dump_dir, "samples"), exist_ok=True)
    np.savetxt(os.path.join(dump_dir, "samples", "log_abs_psi.csv"),
               result.psi_samples.reshape(result.psi_samples.shape[0], -1),
               delimiter=",")


def replica_gap(e_samples: np.ndarray) -> float:
    """Ergodicity diagnostic (reference: MCPEPSMeasurer::ReplicaTest,
    monte_carlo_peps_measurer.h:265): split the chains into two replicas and
    return |E1 - E2| / sqrt(err1^2 + err2^2). Values >> 3 indicate
    non-ergodic sampling."""
    x = np.asarray(e_samples)
    if x.ndim == 1:
        x = x[:, None]
    c = x.shape[1]
    if c < 2:
        raise ValueError("replica test needs >= 2 chains")
    h = c // 2
    import jax.numpy as jnp
    m1, e1 = mean_and_binned_error(jnp.asarray(x[:, :h]))
    m2, e2 = mean_and_binned_error(jnp.asarray(x[:, h:]))
    denom = float(jnp.sqrt(e1 ** 2 + e2 ** 2))
    return abs(float(m1) - float(m2)) / max(denom, 1e-12)


def particle_number_distribution(configs: np.ndarray, state: int) -> np.ndarray:
    """Histogram of per-config occupation counts of a local state
    (reference: particle-number distribution diagnostic,
    monte_carlo_peps_measurer.h:118-166). configs: [..., Ly, Lx]."""
    cfg = np.asarray(configs)
    n_sites = cfg.shape[-1] * cfg.shape[-2]
    counts = (cfg == state).sum(axis=(-1, -2)).reshape(-1)
    return np.bincount(counts, minlength=n_sites + 1) / counts.size


def structure_factor(szsz_mean: np.ndarray, sz_mean: np.ndarray,
                     ly: int, lx: int) -> np.ndarray:
    """Spin structure factor S(q) = (1/N) sum_ij e^{iq(ri-rj)} <Sz_i Sz_j>_c
    from the measured correlation matrix (reference:
    structure_factor_measurement_mixin.h — computed there from S+S- walkers;
    here from the diagonal channel). Returns [Ly, Lx] over q-grid."""
    n = ly * lx
    c = szsz_mean.reshape(n, n) - np.outer(sz_mean.reshape(-1),
                                           sz_mean.reshape(-1))
    coords = np.array([(y, x) for y in range(ly) for x in range(lx)])
    qy = 2 * np.pi * np.fft.fftfreq(ly)
    qx = 2 * np.pi * np.fft.fftfreq(lx)
    out = np.zeros((ly, lx))
    for iy, qy_ in enumerate(qy):
        for ix, qx_ in enumerate(qx):
            phase = np.exp(1j * (coords[:, 0] * qy_ + coords[:, 1] * qx_))
            out[iy, ix] = np.real(phase.conj() @ c @ phase) / n
    return out
