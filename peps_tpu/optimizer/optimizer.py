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
    gradient to unit S-norm (reference's normalize option)."""
    cg: CGParams = CGParams()
    diag_shift: float = 1e-3
    normalize_update: bool = False


@dataclasses.dataclass(frozen=True)
class MinSRParams:
    """Chen & Heyl minimal-norm SR (reference: minsr_tmatrix.h/minsr_eigensolve.h)."""
    diag_shift: float = 1e-8
    pseudo_inverse_cutoff: float = 1e-8  # soft cutoff l^5/(l^6 + c^6)


@dataclasses.dataclass(frozen=True)
class LBFGSParams:
    history: int = 10
    c1: float = 1e-4       # Armijo
    c2: float = 0.9        # Wolfe curvature
    max_line_search: int = 8
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
    """Reference: SpikeRecoveryParams + spike_detection.h (S1/S2 signals).

    If the new energy error bar or gradient norm exceeds `threshold` x EMA,
    the step is rejected: resample (retry evaluation) up to `max_retries`,
    then rollback to the previous accepted state."""
    enabled: bool = False
    threshold: float = 5.0
    ema_alpha: float = 0.2
    max_retries: int = 2


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


# ---------------------------------------------------------------------------
# Iterative driver
# ---------------------------------------------------------------------------


class OptimizeResult(NamedTuple):
    state: jnp.ndarray          # final state
    lowest_state: jnp.ndarray   # state with lowest seen energy
    energies: list
    lowest_energy: float
    records: list


def iterative_optimize(state: jnp.ndarray,
                       evaluate: Callable[[jnp.ndarray, int], Evaluation],
                       params: OptimizerParams,
                       evaluate_energy_only: Callable | None = None,
                       callback: Callable | None = None) -> OptimizeResult:
    """Main optimization loop (reference: Optimizer::IterativeOptimize,
    optimizer_impl.h:103). `evaluate(state, step)` must return an Evaluation
    with o_samples/e_samples populated when using SR/MinSR."""
    alg = params.algorithm
    opt_state: dict = {}
    lbfgs_mem = _LBFGSMemory(alg.history) if isinstance(alg, LBFGSParams) else None
    prev_state = state
    prev_grad = None
    energies, records = [], []
    lowest_e, lowest_state = math.inf, state
    ema_err, ema_gnorm = None, None
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

    nat_x0 = None
    for step in range(params.max_iters):
        t0 = time.time()
        ev = evaluate(state, step)
        retries = 0
        # ---- spike detection (S1: error bar, S2: grad norm) ----
        if params.spike.enabled:
            while retries < params.spike.max_retries:
                err = float(ev.energy_error) if ev.energy_error is not None else 0.0
                gn = float(jnp.linalg.norm(ev.gradient))
                bad = False
                if ema_err is not None and err > params.spike.threshold * ema_err:
                    bad = True
                if ema_gnorm is not None and gn > params.spike.threshold * ema_gnorm:
                    bad = True
                if not bad:
                    break
                retries += 1
                ev = evaluate(state, step)
            else:
                # rollback
                state = prev_state
                ev = evaluate(state, step)
        eval_s = time.time() - t0

        energy = float(ev.energy)
        err = float(ev.energy_error) if ev.energy_error is not None else 0.0
        if ema_err is None:
            ema_err = err
        else:
            a = params.spike.ema_alpha
            ema_err = (1 - a) * ema_err + a * err
        gn = float(jnp.linalg.norm(ev.gradient))
        ema_gnorm = gn if ema_gnorm is None else (1 - params.spike.ema_alpha) * ema_gnorm + params.spike.ema_alpha * gn

        energies.append(energy)
        if energy < lowest_e:
            lowest_e, lowest_state = energy, state

        lr = params.lr_at(step, energy)
        grad = _clip(ev.gradient, params)

        # ---- optional step-size selector ----
        sel = params.step_selector
        if sel is not None and evaluate_energy_only is not None and (
                step == 0 or (sel.every_n and step % sel.every_n == 0)):
            gn_sel = max(float(jnp.linalg.norm(grad)), 1e-300)
            best_lr, best_e = lr, None
            for mult in sel.candidates:
                cand = state - (lr * mult) * grad
                e_c = float(evaluate_energy_only(cand))
                if best_e is None or e_c < best_e:
                    best_e, best_lr = e_c, lr * mult
            lr = best_lr

        # ---- update dispatch ----
        t1 = time.time()
        sr_iters, sr_res, nat_norm = 0, 0.0, 0.0
        if isinstance(alg, SGDParams):
            new_state, opt_state = sgd_update(state, grad, lr, opt_state, alg)
        elif isinstance(alg, AdaGradParams):
            new_state, opt_state = adagrad_update(state, grad, lr, opt_state, alg)
        elif isinstance(alg, AdamParams):
            new_state, opt_state = adam_update(state, grad, lr, opt_state, alg)
        elif isinstance(alg, SRParams):
            nat, res = sr_natural_gradient(ev, alg, state.shape, state.dtype,
                                           x0=nat_x0)
            nat_x0 = res.x.reshape(-1) if False else None
            sr_iters, sr_res = int(res.iterations), float(res.residual_norm)
            nat_norm = float(jnp.linalg.norm(nat))
            new_state = state - lr * nat.astype(state.dtype)
        elif isinstance(alg, MinSRParams):
            nat = minsr_natural_gradient(ev, alg, state.shape)
            nat_norm = float(jnp.linalg.norm(nat))
            new_state = state - lr * nat.astype(state.dtype)
        elif isinstance(alg, LBFGSParams):
            direction = -lbfgs_mem.direction(grad)
            step_len = lr if step > 0 else min(lr, alg.initial_step / max(gn, 1e-12))
            e_only = evaluate_energy_only or (lambda s: evaluate(s, step).energy)
            # backtracking Armijo line search
            gd = float(jnp.real(jnp.vdot(grad, direction)))
            ok = False
            for _ in range(alg.max_line_search):
                cand = state + step_len * direction
                e_new = float(e_only(cand))
                if e_new <= energy + alg.c1 * step_len * gd:
                    ok = True
                    break
                step_len *= 0.5
            new_state = state + step_len * direction if ok else state - lr * grad
            if prev_grad is not None:
                lbfgs_mem.push(new_state - state, grad - prev_grad)
        else:
            raise ValueError(f"unknown algorithm {alg!r}")
        upd_s = time.time() - t1

        prev_state = state
        prev_grad = grad
        state = new_state

        rec = IterationRecord(step, energy, err, gn, lr,
                              float(ev.accept_rate) if ev.accept_rate is not None else 1.0,
                              sr_iters, sr_res, nat_norm, eval_s, upd_s)
        records.append(rec)
        if log_f:
            log_f.write(json.dumps(rec._asdict()) + "\n")
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

    if log_f:
        log_f.close()
    if traj_f:
        traj_f.close()
    return OptimizeResult(state, lowest_state, energies, lowest_e, records)
