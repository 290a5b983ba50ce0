"""VMC optimizer: iterative driver + update algorithms.

Reference: `optimizer/optimizer.h` + `optimizer_impl.h` (SGD :947, SR :1093,
MinSR :1228, AdaGrad :1252, Adam :1327, L-BFGS :1490). TPU re-design:

* The parameter vector is ONE dense array (the TPS), so first-order updates
  are single fused elementwise kernels.
* SR solves (S + shift) x = g by matrix-free CG; the matvec contracts the
  per-sample O buffer — two big matmuls on the MXU per iteration. Sample
  buffers may be sharded over chips (psum handled by jit + sharding).
* MinSR builds the Ns x Ns Gram matrix with one matmul (the reference needs
  an MPI ring pipeline, `minsr_tmatrix.h:55-149`) and eigh-solves it.
* There is no master rank: the update itself runs under jit; the Python
  driver only schedules, logs, checkpoints.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.optimizer.cg import CGParams, CGResult, cg_solve
from peps_tpu.optimizer.schedulers import Constant, LearningRateScheduler

# ---------------------------------------------------------------------------
# Algorithm parameter structs (reference: OptimizerParams, optimizer_params.h)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SGDParams:
    momentum: float = 0.0
    nesterov: bool = False


@dataclasses.dataclass(frozen=True)
class AdaGradParams:
    eps: float = 1e-8
    initial_accumulator: float = 0.0


@dataclasses.dataclass(frozen=True)
class AdamParams:
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0


@dataclasses.dataclass(frozen=True)
class SRParams:
    """Stochastic reconfiguration (natural gradient).

    diag_shift: Tikhonov shift on S. normalize_update: rescale the natural
    gradient to unit S-norm (reference's normalize option). cg_warm_start:
    seed each CG solve with the previous iteration's natural gradient."""
    cg: CGParams = CGParams()
    diag_shift: float = 1e-3
    normalize_update: bool = False
    cg_warm_start: bool = True


@dataclasses.dataclass(frozen=True)
class MinSRParams:
    """Chen & Heyl minimal-norm SR (reference: minsr_tmatrix.h/minsr_eigensolve.h)."""
    diag_shift: float = 1e-8
    pseudo_inverse_cutoff: float = 1e-8  # soft cutoff l^5/(l^6 + c^6)
    # > 0: matrix-free Krylov path — the [Ns, Ns] Gram is never formed and
    # every matvec distributes over the sample-sharded mesh; the TPU-native
    # replacement for the reference's ScaLAPACK "Path A" distributed
    # eigensolve (minsr_scalapack.h:8). krylov_iters >= Ns reproduces the
    # dense eigh path exactly (see optimizer/krylov.py).
    krylov_iters: int = 0


@dataclasses.dataclass(frozen=True)
class LBFGSParams:
    """L-BFGS (reference: optimizer_impl.h:1490 two-loop recursion +
    StrongWolfeLBFGSStep_ :1551).

    line_search: "strong_wolfe" (bracket + bisection zoom with gradient
    probes, the reference default), "armijo" (energy-only backtracking —
    cheap probes via evaluate_energy_only), or "fixed" (alpha = lr)."""
    history: int = 10
    c1: float = 1e-4       # sufficient-decrease constant
    c2: float = 0.9        # strong-Wolfe curvature constant
    line_search: str = "strong_wolfe"
    max_eval: int = 20     # evaluator-call budget per strong-Wolfe search
    min_step: float = 1e-12
    max_step: float = 1e3
    tolerance_change: float = 1e-9
    tolerance_grad: float = 0.0
    fallback_scale: float = 0.1   # fixed fallback alpha = lr*scale on failure
    max_line_search: int = 8      # armijo backtracks
    initial_step: float = 1.0


@dataclasses.dataclass(frozen=True)
class StepSelectorParams:
    """Step-size selector (reference: initial/periodic step-length selector
    in optimizer_impl.h — evaluates candidate steps with EvaluateEnergyOnly
    and keeps the best)."""
    candidates: tuple = (0.5, 1.0, 2.0)   # multipliers on the scheduled lr
    every_n: int = 0                      # 0 = only at the first iteration


@dataclasses.dataclass(frozen=True)
class SpikeParams:
    """Reference: SpikeRecoveryParams + spike_detection.h (signals S1-S4).

    S1: energy error bar > threshold x EMA         (pre-update)
    S2: gradient norm    > threshold x EMA         (pre-update)
    S3: natural-gradient norm > factor_ngrad x EMA, or <= the suspicious CG
        iteration count (SR/MinSR only, post-solve)
    S4: energy above EMA mean + sigma_k x EMA std (upward spike; opt-in via
        enable_rollback)
    Actions: resample (redo the MC evaluation, up to max_retries per signal)
    then rollback — restore the previous accepted state AND the optimizer
    moments (Adam m/v, AdaGrad accumulator, L-BFGS memory) as they were
    before the rejected trajectory (reference optimizer_impl.h:255-280)."""
    enabled: bool = False
    threshold: float = 5.0
    factor_ngrad: float = 5.0
    sr_min_iters_suspicious: int = 0
    enable_rollback: bool = False
    sigma_k: float = 6.0
    ema_alpha: float = 0.2
    max_retries: int = 2
    log_csv: str | None = None    # spike-event trigger log


@dataclasses.dataclass(frozen=True)
class OptimizerParams:
    max_iters: int
    algorithm: object                      # one of the *Params above
    lr: LearningRateScheduler | float = 0.1
    clip_norm: float = 0.0                 # 0 = no clipping
    clip_value: float = 0.0
    spike: SpikeParams = SpikeParams()
    step_selector: StepSelectorParams | None = None
    checkpoint_every: int = 0
    checkpoint_path: str | None = None
    log_path: str | None = None            # JSONL per-iteration records
    trajectory_csv: str | None = None      # energy trajectory CSV
    should_stop: Callable | None = None    # (iteration record) -> bool
    # Profiler hook (reference: QLPEPS_TIMING_MODE Timer scopes, SURVEY
    # §5.1): capture a device trace of iterations [profile_start,
    # profile_stop) into profile_dir, viewable with xprof/tensorboard.
    profile_dir: str | None = None
    profile_start: int = 1
    profile_stop: int = 3

    def __post_init__(self):
        if self.profile_dir is not None and \
                self.profile_stop <= self.profile_start:
            raise ValueError(
                f"profile_stop ({self.profile_stop}) must be > "
                f"profile_start ({self.profile_start})")

    def lr_at(self, step: int, energy=None) -> float:
        if isinstance(self.lr, (int, float)):
            return float(self.lr)
        return float(self.lr(step, energy))


class Evaluation(NamedTuple):
    """What an energy evaluator returns (reference: the evaluator callback
    contract, optimizer.h:159-166)."""
    energy: jnp.ndarray                  # real scalar
    gradient: jnp.ndarray                # like state
    energy_error: jnp.ndarray | None = None
    o_samples: jnp.ndarray | None = None   # [Ns, P] flattened, sqrt(w)-scaled, centered
    e_samples: jnp.ndarray | None = None   # [Ns] sqrt(w)-scaled, centered
    accept_rate: jnp.ndarray | None = None
    aux: dict | None = None


class IterationRecord(NamedTuple):
    step: int
    energy: float
    energy_error: float
    grad_norm: float
    lr: float
    accept_rate: float
    sr_iters: int
    sr_residual: float
    natural_grad_norm: float
    eval_seconds: float
    update_seconds: float


# ---------------------------------------------------------------------------
# Update algorithms
# ---------------------------------------------------------------------------


def _clip(g, params: OptimizerParams):
    if params.clip_value > 0:
        g = jnp.clip(g, -params.clip_value, params.clip_value)
    if params.clip_norm > 0:
        n = jnp.linalg.norm(g)
        g = jnp.where(n > params.clip_norm, g * (params.clip_norm / n), g)
    return g


def sgd_update(state, grad, lr, opt_state, p: SGDParams):
    if p.momentum == 0.0:
        return state - lr * grad, opt_state
    v = opt_state.get("v", jnp.zeros_like(state))
    v = p.momentum * v + grad
    step = (grad + p.momentum * v) if p.nesterov else v
    return state - lr * step, {"v": v}


def adagrad_update(state, grad, lr, opt_state, p: AdaGradParams):
    acc = opt_state.get("acc", jnp.full_like(jnp.real(state).astype(
        state.real.dtype), p.initial_accumulator))
    acc = acc + jnp.abs(grad) ** 2
    upd = grad / (jnp.sqrt(acc) + p.eps)
    return state - lr * upd, {"acc": acc}


def adam_update(state, grad, lr, opt_state, p: AdamParams):
    t = opt_state.get("t", 0) + 1
    m = opt_state.get("m", jnp.zeros_like(state))
    v = opt_state.get("v", jnp.zeros_like(jnp.abs(state)))
    m = p.beta1 * m + (1 - p.beta1) * grad
    v = p.beta2 * v + (1 - p.beta2) * jnp.abs(grad) ** 2
    mh = m / (1 - p.beta1 ** t)
    vh = v / (1 - p.beta2 ** t)
    upd = mh / (jnp.sqrt(vh) + p.eps)
    if p.weight_decay:
        upd = upd + p.weight_decay * state
    return state - lr * upd, {"t": t, "m": m, "v": v}


def sr_natural_gradient(evaluation: Evaluation, p: SRParams, shape, dtype,
                        x0=None):
    """Solve (S + shift) x = g with S = A^H A from the centered, weighted
    O-sample matrix A (reference: SRSMatrix, stochastic_reconfiguration_smatrix.h:37)."""
    a = evaluation.o_samples                  # [Ns, P]
    g = evaluation.gradient.reshape(-1)
    shift = p.diag_shift

    def matvec(v):
        av = a @ v
        return (jnp.conj(a.T) @ av) + shift * v

    res = cg_solve(matvec, g.astype(a.dtype), x0, p.cg)
    nat = res.x
    if p.normalize_update:
        s_norm = jnp.sqrt(jnp.maximum(jnp.real(jnp.vdot(nat, g)),
                                      jnp.finfo(g.real.dtype).tiny))
        nat = nat / s_norm
    return nat.reshape(shape), res


def minsr_natural_gradient(evaluation: Evaluation, p: MinSRParams, shape):
    """delta = A^H (A A^H + shift)^{-1} eps via eigh + soft pseudo-inverse
    (reference: minsr_eigensolve.h:44 cutoff l^5/(l^6+c^6) -> we use the
    equivalent soft filter on eigenvalues of T)."""
    a = evaluation.o_samples                  # [Ns, P]
    eps = evaluation.e_samples                # [Ns]
    t = a @ jnp.conj(a.T)                     # [Ns, Ns] Gram (one matmul)
    lam, u = jnp.linalg.eigh(t)
    c = p.pseudo_inverse_cutoff * jnp.maximum(jnp.max(lam), 1e-300)
    # Even-power soft filter (reference minsr_eigensolve.h:44 uses
    # l^5/(l^6+c^6)): safe for the small NEGATIVE eigenvalues eigh returns
    # for a PSD Gram matrix under roundoff (odd powers can cross zero near
    # lam ~ -c and blow up the natural gradient).
    inv = lam ** 5 / (lam ** 6 + c ** 6)      # soft pseudo-inverse of T
    y = u @ (inv.astype(u.dtype) * (jnp.conj(u.T) @ eps.astype(u.dtype)))
    nat = jnp.conj(a.T) @ y
    return nat.reshape(shape)


# ---------------------------------------------------------------------------
# L-BFGS (two-loop recursion + backtracking Wolfe line search)
# ---------------------------------------------------------------------------


class _LBFGSMemory:
    def __init__(self, m):
        self.m = m
        self.s = []
        self.y = []

    def push(self, s, y):
        sy = float(jnp.real(jnp.vdot(s, y)))
        if sy > 1e-12:
            self.s.append(s)
            self.y.append(y)
            if len(self.s) > self.m:
                self.s.pop(0)
                self.y.pop(0)

    def reset(self):
        self.s, self.y = [], []

    def snapshot(self):
        return (list(self.s), list(self.y))

    def restore(self, snap):
        self.s, self.y = list(snap[0]), list(snap[1])

    def direction(self, grad):
        q = grad
        alphas = []
        for s, y in zip(reversed(self.s), reversed(self.y)):
            rho = 1.0 / jnp.real(jnp.vdot(y, s))
            alpha = rho * jnp.real(jnp.vdot(s, q))
            q = q - alpha * y
            alphas.append((alpha, rho, s, y))
        if self.s:
            s, y = self.s[-1], self.y[-1]
            gamma = jnp.real(jnp.vdot(s, y)) / jnp.maximum(
                jnp.real(jnp.vdot(y, y)), 1e-300)
            q = gamma * q
        for alpha, rho, s, y in reversed(alphas):
            beta = rho * jnp.real(jnp.vdot(y, q))
            q = q + (alpha - beta) * s
        return q


def _strong_wolfe(eval_fg, phi0, dphi0, lr, p: LBFGSParams):
    """Strong-Wolfe line search: bracketing + bisection zoom (reference:
    StrongWolfeLBFGSStep_, optimizer_impl.h:1551). `eval_fg(alpha)` returns
    (phi, dphi, candidate_state) at x + alpha*direction. Returns
    (ok, candidate, alpha, n_evals)."""
    if dphi0 >= 0.0:
        return False, None, 0.0, 0
    curv = max(-p.c2 * dphi0, p.tolerance_grad)
    n = [0]

    def ev(a):
        n[0] += 1
        return eval_fg(a)

    def zoom(alo, phi_alo, ahi):
        while n[0] < p.max_eval:
            a = 0.5 * (alo + ahi)
            phi, dphi, cand = ev(a)
            if phi > phi0 + p.c1 * a * dphi0 or phi >= phi_alo:
                ahi = a
            else:
                if abs(dphi) <= curv:
                    return True, cand, a
                if dphi * (ahi - alo) >= 0.0:
                    ahi = alo
                alo, phi_alo = a, phi
            if abs(ahi - alo) <= p.tolerance_change:
                break
        return False, None, 0.0

    a_prev, phi_prev = 0.0, phi0
    a = min(max(lr, p.min_step), p.max_step)
    outer = 0
    while n[0] < p.max_eval:
        phi, dphi, cand = ev(a)
        if phi > phi0 + p.c1 * a * dphi0 or (outer > 0 and phi >= phi_prev):
            ok, c, al = zoom(a_prev, phi_prev, a)
            return ok, c, al, n[0]
        if abs(dphi) <= curv:
            return True, cand, a, n[0]
        if dphi >= 0.0:
            ok, c, al = zoom(a, phi, a_prev)
            return ok, c, al, n[0]
        a_prev, phi_prev = a, phi
        na = min(2.0 * a, p.max_step)
        if na - a <= p.tolerance_change:
            break
        a = na
        outer += 1
    return False, None, 0.0, n[0]


class _EMA:
    """EMA of mean and variance (reference: EMATracker, spike_detection.h)."""

    def __init__(self, alpha):
        self.alpha, self.mean, self.var = alpha, None, 0.0

    @property
    def initialized(self):
        return self.mean is not None

    def update(self, x):
        if self.mean is None:
            self.mean, self.var = x, 0.0
        else:
            a = self.alpha
            d = x - self.mean
            self.mean += a * d
            self.var = (1 - a) * (self.var + a * d * d)

    @property
    def std(self):
        return math.sqrt(max(self.var, 0.0))


# ---------------------------------------------------------------------------
# Iterative driver
# ---------------------------------------------------------------------------


class OptimizeResult(NamedTuple):
    state: jnp.ndarray          # final state
    lowest_state: jnp.ndarray   # state with lowest seen energy
    energies: list
    lowest_energy: float
    records: list
    spike_events: list = []     # (step, signal, action, value, threshold)


def iterative_optimize(state: jnp.ndarray,
                       evaluate: Callable[[jnp.ndarray, int], Evaluation],
                       params: OptimizerParams,
                       evaluate_energy_only: Callable | None = None,
                       callback: Callable | None = None) -> OptimizeResult:
    """Main optimization loop (reference: Optimizer::IterativeOptimize,
    optimizer_impl.h:103). `evaluate(state, step)` must return an Evaluation
    with o_samples/e_samples populated when using SR/MinSR.
    `evaluate_energy_only(state)` (reference: EvaluateEnergyOnly,
    mc_energy_grad_evaluator.h:343) powers the step selector and the
    energy-only ("armijo") L-BFGS line search."""
    alg = params.algorithm
    sp = params.spike
    opt_state: dict = {}
    lbfgs_mem = _LBFGSMemory(alg.history) if isinstance(alg, LBFGSParams) else None
    prev_state = state
    prev_grad = None
    energies, records, spike_events = [], [], []
    lowest_e, lowest_state = math.inf, state
    ema_err, ema_gnorm = _EMA(sp.ema_alpha), _EMA(sp.ema_alpha)
    ema_ngrad, ema_energy = _EMA(sp.ema_alpha), _EMA(sp.ema_alpha)
    accepted = None   # rollback snapshot: last accepted state + moments
    log_f = None
    if params.log_path:
        os.makedirs(os.path.dirname(params.log_path) or ".", exist_ok=True)
        log_f = open(params.log_path, "a")
    traj_f = None
    if params.trajectory_csv:
        os.makedirs(os.path.dirname(params.trajectory_csv) or ".",
                    exist_ok=True)
        traj_f = open(params.trajectory_csv, "a")
        traj_f.write("step,energy,energy_error\n")
    spike_f = None
    if sp.log_csv:
        os.makedirs(os.path.dirname(sp.log_csv) or ".", exist_ok=True)
        spike_f = open(sp.log_csv, "a")
        spike_f.write("step,signal,action,value,threshold\n")

    def log_spike(step, signal, action, value, thr):
        spike_events.append((step, signal, action, value, thr))
        if spike_f:
            spike_f.write(f"{step},{signal},{action},{value!r},{thr!r}\n")
            spike_f.flush()

    nat_x0 = None
    profiling = False
    for step in range(params.max_iters):
        if params.profile_dir is not None:
            if step == params.profile_start and not profiling:
                jax.profiler.start_trace(params.profile_dir)
                profiling = True
            # independent of the start branch: a stop index the loop never
            # reaches is still closed by the stop_trace() after the loop
            if step == params.profile_stop and profiling:
                jax.profiler.stop_trace()
                profiling = False
        t0 = time.time()
        ev = evaluate(state, step)

        def rollback():
            """Restore the last accepted state AND its pre-update optimizer
            moments (reference optimizer_impl.h:255-280)."""
            nonlocal state, opt_state, prev_grad, nat_x0
            if accepted is None:
                return False
            state = accepted["state"]
            opt_state = dict(accepted["opt_state"])
            if lbfgs_mem is not None:
                lbfgs_mem.restore(accepted["lbfgs"])
            prev_grad = None
            nat_x0 = accepted["nat_x0"]
            return True

        # ---- S1/S2 (pre-update: error-bar / grad-norm anomaly) ----
        if sp.enabled:
            retries = 0
            while True:
                err_v = float(ev.energy_error) if ev.energy_error is not None else 0.0
                gn_v = float(jnp.linalg.norm(ev.gradient))
                signal = None
                if ema_err.initialized and ema_err.mean > 0 and \
                        err_v > sp.threshold * ema_err.mean:
                    signal, val, thr = "S1", err_v, sp.threshold * ema_err.mean
                elif ema_gnorm.initialized and ema_gnorm.mean > 0 and \
                        gn_v > sp.threshold * ema_gnorm.mean:
                    signal, val, thr = "S2", gn_v, sp.threshold * ema_gnorm.mean
                if signal is None:
                    break
                if retries < sp.max_retries:
                    log_spike(step, signal, "resample", val, thr)
                    retries += 1
                    # drop the rejected evaluation FIRST: its [Ns, P] SR
                    # buffer is GBs at production scale, and re-evaluating
                    # while it is still referenced doubles peak HBM (OOMed
                    # the 12x12 D=10 stretch run on a 16 GB chip)
                    ev = None
                    ev = evaluate(state, step)
                    continue
                log_spike(step, signal, "rollback", val, thr)
                if rollback():
                    ev = None
                    ev = evaluate(state, step)
                break

        # ---- S4 (EMA energy upward spike -> rollback; the reference
        # detects this post-update at the next evaluation — checking right
        # after evaluate is equivalent and skips the wasted update) ----
        if sp.enable_rollback and ema_energy.initialized and step > 0:
            e_v = float(ev.energy)
            delta = e_v - ema_energy.mean
            if delta > 0 and ema_energy.std > 0 and \
                    delta > sp.sigma_k * ema_energy.std:
                log_spike(step, "S4", "rollback", e_v,
                          ema_energy.mean + sp.sigma_k * ema_energy.std)
                if rollback():
                    ev = None    # free the rejected SR buffers (see S1/S2)
                    ev = evaluate(state, step)
        eval_s = time.time() - t0

        energy = float(ev.energy)
        err = float(ev.energy_error) if ev.energy_error is not None else 0.0
        gn = float(jnp.linalg.norm(ev.gradient))
        ema_err.update(err)
        ema_gnorm.update(gn)
        ema_energy.update(energy)

        energies.append(energy)
        if energy < lowest_e:
            lowest_e, lowest_state = energy, state

        lr = params.lr_at(step, energy)
        grad = _clip(ev.gradient, params)

        # ---- optional step-size selector (EvaluateEnergyOnly probes) ----
        sel = params.step_selector
        if sel is not None and evaluate_energy_only is not None and (
                step == 0 or (sel.every_n and step % sel.every_n == 0)):
            best_lr, best_e = lr, None
            for mult in sel.candidates:
                cand = state - (lr * mult) * grad
                e_c = float(evaluate_energy_only(cand))
                if best_e is None or e_c < best_e:
                    best_e, best_lr = e_c, lr * mult
            lr = best_lr

        # snapshot for rollback: this state's evaluation was deemed healthy,
        # moments as they are before this iteration's update
        pre_snapshot = {
            "state": state, "opt_state": dict(opt_state),
            "lbfgs": lbfgs_mem.snapshot() if lbfgs_mem is not None else None,
            "nat_x0": nat_x0}

        # ---- update dispatch ----
        t1 = time.time()
        sr_iters, sr_res, nat_norm = 0, 0.0, 0.0
        skip_update = False
        if isinstance(alg, SGDParams):
            new_state, opt_state = sgd_update(state, grad, lr, opt_state, alg)
        elif isinstance(alg, AdaGradParams):
            new_state, opt_state = adagrad_update(state, grad, lr, opt_state, alg)
        elif isinstance(alg, AdamParams):
            new_state, opt_state = adam_update(state, grad, lr, opt_state, alg)
        elif isinstance(alg, (SRParams, MinSRParams)):
            s3_attempts = 0
            nat = None
            while True:
                if isinstance(alg, SRParams):
                    nat, res = sr_natural_gradient(ev, alg, state.shape,
                                                   state.dtype, x0=nat_x0)
                    sr_iters = int(res.iterations)
                    sr_res = float(res.residual_norm)
                    few_iters = sr_iters <= sp.sr_min_iters_suspicious
                elif alg.krylov_iters > 0:
                    from peps_tpu.optimizer.krylov import (
                        minsr_krylov_natural_gradient)
                    nat = minsr_krylov_natural_gradient(
                        ev.o_samples, ev.e_samples,
                        alg.pseudo_inverse_cutoff, alg.krylov_iters,
                        state.shape)
                    few_iters = False
                else:
                    nat = minsr_natural_gradient(ev, alg, state.shape)
                    few_iters = False   # eigensolve: no CG-iteration signal
                nat_norm = float(jnp.linalg.norm(nat))
                # ---- S3 (post-solve natural-gradient anomaly) ----
                if not (sp.enabled and step > 0):
                    break
                s3 = few_iters or (
                    ema_ngrad.initialized and ema_ngrad.mean > 0 and
                    nat_norm > sp.factor_ngrad * ema_ngrad.mean)
                if not s3:
                    break
                thr = sp.factor_ngrad * (ema_ngrad.mean or 0.0)
                if s3_attempts < sp.max_retries:
                    log_spike(step, "S3", "resample", nat_norm, thr)
                    s3_attempts += 1
                    ev = None    # free the rejected SR buffers (see S1/S2)
                    ev = evaluate(state, step)
                    continue
                log_spike(step, "S3", "rollback", nat_norm, thr)
                rollback()
                skip_update = True
                break
            if skip_update:
                new_state = state
            else:
                if isinstance(alg, SRParams) and alg.cg_warm_start:
                    nat_x0 = res.x.reshape(-1)
                ema_ngrad.update(nat_norm)
                new_state = state - lr * nat.astype(state.dtype)
        elif isinstance(alg, LBFGSParams):
            if prev_grad is not None:
                # matched curvature pair (s_{k-1}, y_{k-1}) =
                # (x_k - x_{k-1}, g_k - g_{k-1})
                lbfgs_mem.push(state - prev_state, grad - prev_grad)
            direction = -lbfgs_mem.direction(grad)
            gd = float(jnp.real(jnp.vdot(grad, direction)))
            if gd >= 0.0:
                # not a descent direction: reset memory, fall back to -g
                # (reference optimizer_impl.h:631)
                lbfgs_mem.reset()
                direction = -grad
                gd = -float(jnp.real(jnp.vdot(grad, grad)))
            if alg.line_search == "fixed":
                new_state = state + lr * direction
            elif alg.line_search == "armijo":
                e_only = evaluate_energy_only or (
                    lambda s: evaluate(s, step).energy)
                step_len = lr if step > 0 else min(
                    lr, alg.initial_step / max(gn, 1e-12))
                ok = False
                for _ in range(alg.max_line_search):
                    cand = state + step_len * direction
                    if float(e_only(cand)) <= energy + alg.c1 * step_len * gd:
                        ok = True
                        break
                    step_len *= 0.5
                new_state = (state + step_len * direction if ok
                             else state - lr * grad)
            elif alg.line_search == "strong_wolfe":
                def eval_fg(alpha):
                    cand = state + alpha * direction
                    ev_c = evaluate(cand, step)
                    return (float(ev_c.energy),
                            float(jnp.real(jnp.vdot(ev_c.gradient,
                                                    direction))), cand)
                ok, cand, alpha, _ = _strong_wolfe(eval_fg, energy, gd, lr,
                                                   alg)
                if ok:
                    new_state = cand
                else:
                    fb = max(alg.min_step, lr * alg.fallback_scale)
                    new_state = state + fb * direction
            else:
                raise ValueError(
                    f"unknown L-BFGS line_search {alg.line_search!r}")
        else:
            raise ValueError(f"unknown algorithm {alg!r}")
        upd_s = time.time() - t1

        if not skip_update:
            # the S3-rejected state must not become the rollback anchor
            accepted = pre_snapshot
            prev_state = state
            prev_grad = grad
        state = new_state

        rec = IterationRecord(step, energy, err, gn, lr,
                              float(ev.accept_rate) if ev.accept_rate is not None else 1.0,
                              sr_iters, sr_res, nat_norm, eval_s, upd_s)
        records.append(rec)
        if log_f:
            d = rec._asdict()
            if ev.aux:
                d.update({k: v for k, v in ev.aux.items() if k not in d})
            log_f.write(json.dumps(d) + "\n")
            log_f.flush()
        if traj_f:
            traj_f.write(f"{step},{energy!r},{err!r}\n")
            traj_f.flush()
        if params.checkpoint_every and params.checkpoint_path and \
                (step + 1) % params.checkpoint_every == 0:
            os.makedirs(params.checkpoint_path, exist_ok=True)
            np.save(os.path.join(params.checkpoint_path, f"state_step{step + 1}.npy"),
                    np.asarray(state))
        if callback is not None:
            callback(rec, state)
        if params.should_stop is not None and params.should_stop(rec):
            break

    if profiling:
        jax.profiler.stop_trace()
    if log_f:
        log_f.close()
    if traj_f:
        traj_f.close()
    if spike_f:
        spike_f.close()
    return OptimizeResult(state, lowest_state, energies, lowest_e, records,
                          spike_events)
