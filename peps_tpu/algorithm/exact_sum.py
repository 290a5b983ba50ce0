"""Exact-summation energy/gradient evaluator (deterministic test oracle).

Reference: `ExactSumEnergyEvaluatorMPI`
(`algorithm/vmc_update/exact_summation_energy_evaluator.h:173`): enumerate the
full configuration space, weight by |psi|^2, and sum exactly — the backbone of
the reference's zero-noise optimizer tests (SURVEY.md §4.2).

TPU version: configurations become one [Nc, Ly, Lx] batch; the per-config
evaluator is vmapped; rank round-robin becomes sharding the batch axis.
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.algorithm.energy import (EnergyHoles, ModelTensors,
                                       local_energy_and_holes, rdtype)
from peps_tpu.algorithm.energy_fermion import (FermionTensors,
                                               local_energy_and_holes_fermion)
from peps_tpu.algorithm.energy_pbc import local_energy_and_holes_pbc
from peps_tpu.lattice import BoundaryCondition
from peps_tpu.linalg import TruncParams


def all_configs(ly: int, lx: int, d: int) -> np.ndarray:
    """Full configuration space [d^N, Ly, Lx] (reference:
    GenerateAllBinaryConfigs / GenerateAllPermutationConfigs)."""
    n = ly * lx
    out = np.array(list(itertools.product(range(d), repeat=n)), dtype=np.int32)
    return out.reshape(-1, ly, lx)


def sector_configs(ly: int, lx: int, occupancy: dict[int, int]) -> np.ndarray:
    """Configurations with fixed occupation numbers {state: count}
    (e.g. Sz-conserving sector). occupancy counts must sum to Ly*Lx.
    Uses the native C++ enumerator when available (utils/native.py)."""
    try:
        from peps_tpu.utils.native import _build_and_load
        if _build_and_load() is not None:
            import ctypes
            lib = _build_and_load()
            n_sites = ly * lx
            d = max(occupancy) + 1
            counts = np.zeros(d, dtype=np.int32)
            for s, c in occupancy.items():
                counts[s] = c
            total = lib.count_sector_configs(
                n_sites, d,
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
            if total > 0:
                out = np.empty((total, n_sites), dtype=np.int32)
                lib.enumerate_sector_configs(
                    n_sites, d,
                    counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    total)
                return out.reshape(total, ly, lx)
    except Exception:
        pass
    n = ly * lx
    base = []
    for state, count in sorted(occupancy.items()):
        base.extend([state] * count)
    assert len(base) == n
    perms = sorted(set(itertools.permutations(base)))
    return np.array(perms, dtype=np.int32).reshape(-1, ly, lx)


def pad_configs(configs: np.ndarray,
                n_shards: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the config batch to a multiple of `n_shards` so it shards evenly
    over a device mesh; returns (padded_configs, valid_mask). Padding rows
    repeat configs[0] and carry mask=False, which the evaluators turn into
    exactly zero weight — the TPU analogue of the reference's uneven
    rank round-robin (exact_summation_energy_evaluator.h:173: ranks with
    fewer configs simply contribute fewer terms)."""
    nc = configs.shape[0]
    pad = (-nc) % n_shards
    mask = np.ones(nc + pad, dtype=bool)
    if pad:
        mask[nc:] = False
        configs = np.concatenate(
            [configs, np.repeat(configs[:1], pad, axis=0)], axis=0)
    return configs, mask


class ExactSumResult(NamedTuple):
    energy: jnp.ndarray      # real scalar
    gradient: jnp.ndarray | None  # same shape as tps
    weight_sum: jnp.ndarray  # sum over |psi|^2 (mantissa scale)


@partial(jax.jit, static_argnames=("chi", "trunc", "with_grad", "batch_size",
                                   "bc"))
def exact_sum_energy_gradient(tps: jnp.ndarray, configs: jnp.ndarray,
                              model: ModelTensors, chi: int,
                              trunc: TruncParams,
                              with_grad: bool = True,
                              batch_size: int | None = None,
                              bc: BoundaryCondition = BoundaryCondition.OPEN,
                              mask: jnp.ndarray | None = None) -> ExactSumResult:
    """Exact <H> and gradient over an enumerated configuration set.

    Gradient convention: for complex parameters returns dE/d(theta*)
    (Wirtinger); for real parameters returns the true gradient dE/d(theta)
    = 2 Re <(E_loc - E) O*>.

    `mask` (bool [Nc]) zero-weights padding configurations appended by
    `pad_configs` so the batch can be sharded evenly over a device mesh
    (the reference's rank round-robin split,
    exact_summation_energy_evaluator.h:173).
    """
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      local_energy_and_holes_graded)
    if isinstance(model, GradedFermionModel):
        local = local_energy_and_holes_graded
    elif isinstance(model, FermionTensors):
        local = local_energy_and_holes_fermion
    elif bc == BoundaryCondition.PERIODIC:
        local = local_energy_and_holes_pbc
    else:
        local = local_energy_and_holes
    evaluate = lambda cfg: local(tps, cfg, model, chi, trunc,
                                 with_holes=with_grad)
    if batch_size is None:
        res = jax.vmap(evaluate)(configs)
    else:
        res = jax.lax.map(evaluate, configs, batch_size=batch_size)

    log_abs = res.log_abs_psi
    # psi = 0 configs: mantissa 0 -> log_abs = log(tiny); weight exp(...) ~ 0.
    logw = 2.0 * log_abs
    logw_max = jnp.max(logw)
    w = jnp.where(res.psi_mant == 0, 0.0, jnp.exp(logw - logw_max))
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    z = jnp.sum(w)
    e_loc = res.e_loc
    energy = jnp.sum(w * jnp.real(e_loc)) / z

    grad = None
    if with_grad:
        # dE/dtheta* = < conj(O) (E_loc - E) >_w  (O = dlnpsi/dtheta holomorphic)
        centered = e_loc - energy
        o = res.o_tensor  # [Nc, Ly, Lx, d, D, D, D, D]
        wc = (w * centered).astype(o.dtype)
        grad = jnp.tensordot(wc, jnp.conj(o), axes=(0, 0)) / z
        if not jnp.iscomplexobj(tps):
            grad = 2.0 * jnp.real(grad)
    return ExactSumResult(energy, grad, z * jnp.exp(logw_max))


@partial(jax.jit, static_argnames=("chi", "trunc", "with_sr_buffers",
                                   "batch_size", "bc"))
def exact_sum_evaluation(tps: jnp.ndarray, configs: jnp.ndarray,
                         model: ModelTensors, chi: int, trunc: TruncParams,
                         with_sr_buffers: bool = False,
                         batch_size: int | None = None,
                         bc: BoundaryCondition = BoundaryCondition.OPEN,
                         mask: jnp.ndarray | None = None):
    """Full Evaluation (for the optimizer): energy, gradient, and optionally
    the centered sqrt-weighted O-sample matrix A and residuals eps such that
      S = A^H A,   gradient = A^H eps   (x2 for real dtype).

    `mask` zero-weights `pad_configs` padding rows (see
    exact_sum_energy_gradient); with the config batch sharded over a mesh
    this is the reference's MPI-parallel exact-sum evaluator
    (exact_summation_energy_evaluator.h:173, round-robin rank split).
    """
    from peps_tpu.optimizer.optimizer import Evaluation
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      local_energy_and_holes_graded)

    if isinstance(model, GradedFermionModel):
        local = local_energy_and_holes_graded
    elif isinstance(model, FermionTensors):
        local = local_energy_and_holes_fermion
    elif bc == BoundaryCondition.PERIODIC:
        local = local_energy_and_holes_pbc
    else:
        local = local_energy_and_holes
    evaluate = lambda cfg: local(tps, cfg, model, chi, trunc, with_holes=True)
    if batch_size is None:
        res = jax.vmap(evaluate)(configs)
    else:
        res = jax.lax.map(evaluate, configs, batch_size=batch_size)

    logw = 2.0 * res.log_abs_psi
    logw_max = jnp.max(logw)
    w = jnp.where(res.psi_mant == 0, 0.0, jnp.exp(logw - logw_max))
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    z = jnp.sum(w)
    wn = w / z
    energy = jnp.sum(wn * jnp.real(res.e_loc))

    nc = configs.shape[0]
    o_flat = res.o_tensor.reshape(nc, -1)
    obar = jnp.sum(wn[:, None] * o_flat, axis=0)
    sq = jnp.sqrt(wn).astype(o_flat.dtype)
    a = sq[:, None] * (o_flat - obar[None, :])
    eps = sq * (res.e_loc - energy).astype(o_flat.dtype)
    if not jnp.iscomplexobj(tps):
        eps = 2.0 * eps
    grad = (jnp.conj(a.T) @ eps).reshape(tps.shape)
    if not jnp.iscomplexobj(tps):
        grad = jnp.real(grad)
    return Evaluation(
        energy=energy,
        gradient=grad.astype(tps.dtype),
        energy_error=jnp.zeros((), energy.dtype),
        o_samples=a if with_sr_buffers else None,
        e_samples=eps if with_sr_buffers else None,
        accept_rate=None,
    )
