"""Exact-summation measurement executor (observable golden tests).

Reference: `ExactSummationMeasurer` (exact_summation_measurer.h, SURVEY.md
§2.5): enumerate the configuration space and evaluate the observable registry
with exact |psi|^2 weights — the deterministic oracle for measurement code.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.algorithm.energy import ModelTensors, local_energy_and_holes
from peps_tpu.algorithm.measure import _one_point_diag, _row_offdiag_corr
from peps_tpu.contraction import bmps
from peps_tpu.lattice import transpose_tps
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import project


class ExactMeasureResult(NamedTuple):
    values: dict     # key -> exact expectation value (ndarray)
    weight_sum: jnp.ndarray


def exact_sum_measure(tps: jnp.ndarray, configs: jnp.ndarray, model,
                      chi: int, trunc: TruncParams,
                      observables=("energy", "sz", "szsz", "spsm_row"),
                      sz_values=None, op_a=None, op_b=None
                      ) -> ExactMeasureResult:
    """Exact expectation values of the standard observable registry."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    mt = model if isinstance(model, ModelTensors) else \
        ModelTensors.from_model(model, tps.dtype)
    if sz_values is None and d == 2:
        sz_values = jnp.asarray([0.5, -0.5], tps.dtype)
    if op_a is None and d == 2:
        op_a = jnp.asarray([[0.0, 1.0], [0.0, 0.0]], tps.dtype)   # S+
        op_b = op_a.T                                              # S-
    tps_t = transpose_tps(tps)

    def per_cfg(cfg):
        res = local_energy_and_holes(tps, cfg, mt, chi, trunc,
                                     with_holes=False)
        out = {"log_abs": res.log_abs_psi, "mant": res.psi_mant}
        if "energy" in observables:
            out["energy"] = jnp.real(res.e_loc)
        if "sz" in observables:
            out["sz"] = _one_point_diag(cfg, jnp.real(sz_values))
        if "szsz" in observables:
            flat = _one_point_diag(cfg, jnp.real(sz_values)).reshape(-1)
            out["szsz"] = jnp.outer(flat, flat)
        if "spsm_row" in observables:
            tn = project(tps, cfg)
            stacks = bmps.all_env_stacks(tn, chi, trunc)
            out["spsm_row"] = jnp.real(_row_offdiag_corr(
                tps, tn, cfg, op_a, op_b, chi, trunc, stacks))
        return out

    outs = jax.vmap(per_cfg)(configs)
    logw = 2.0 * outs["log_abs"]
    w = jnp.where(outs["mant"] == 0, 0.0, jnp.exp(logw - jnp.max(logw)))
    z = jnp.sum(w)
    values = {}
    for key, arr in outs.items():
        if key in ("log_abs", "mant"):
            continue
        wn = (w / z).reshape((-1,) + (1,) * (arr.ndim - 1))
        values[key] = np.asarray(jnp.sum(wn * arr, axis=0))
    return ExactMeasureResult(values, z)


def _pair_corr_support(view: np.ndarray) -> np.ndarray:
    """Boolean [N] mask: config lines (rows of `view`, [N, nlines, L]) hold
    BOTH a hole bond (two adjacent empty sites) and a singlet-ordered pair
    bond (adjacent up-dn in either order) at in-line bond distance > 1 —
    the exact support of the t-J pair-correlation walker tables (an entry
    (i, k) needs the pair at one bond and the holes at the other)."""
    a, b = view[..., :-1], view[..., 1:]
    hole = (a == 0) & (b == 0)
    pair = ((a == 1) & (b == 2)) | ((a == 2) & (b == 1))
    nb = hole.shape[-1]
    gap = (np.abs(np.arange(nb)[:, None] - np.arange(nb)[None, :]) > 1)
    m = ((hole[..., :, None] & pair[..., None, :])
         | (pair[..., :, None] & hole[..., None, :])) & gap
    return m.any(axis=(-1, -2, -3))


def exact_sum_pair_corr_graded(tps, configs, space, chi: int,
                               trunc: TruncParams,
                               frames=("row", "col"),
                               batch_size: int = 16,
                               amp_batch: int = 256):
    """Exact sector-summed <Delta^dag_i Delta_k> on a graded t-J state.

    C[l, i, k] = sum_S |psi(S)|^2 table(S)[l, i, k] / sum_S |psi(S)|^2
    over an enumerated charge-sector config batch, where table(S) is the
    ED-validated env-shared pair-correlation walker
    (measure_fermion.tj_singlet_pair_corr_graded_{row,col}shared). The
    numerator is host-restricted to supported configs (the table is
    identically zero unless some in-frame line holds both a hole bond and
    a singlet pair bond at gap > 1), so the cost is |support| walker
    passes plus one batched amplitude pass over the whole sector. The
    operator conserves (N_up, N_dn), so the sector sum is exact for the
    sector-projected state (U(1)-resolved graded states leak < 1e-20
    relative weight outside their sector).

    Reference: singlet_pair_correlation_measurement_mixin.h — this is the
    deterministic exact-summation analogue of the mixin's MC estimator
    (the reference has no exact-sum path for it; at 2-hole doping the MC
    estimator's support is too rare for small-sample error bars, so the
    exact sum is the practical way to exhibit the decay curve).

    Returns ({frame: np.ndarray table}, weight_sum).
    """
    from peps_tpu.algorithm.measure_fermion import (
        tj_singlet_pair_corr_graded_colshared,
        tj_singlet_pair_corr_graded_rowshared)
    from peps_tpu.fermion.vmc import log_abs_psi_fermion

    cf = np.asarray(configs)

    def amp_one(c):
        la, mant = log_abs_psi_fermion(tps, c, space, chi, trunc)
        return la, mant

    logs, mants = jax.lax.map(amp_one, jnp.asarray(cf),
                              batch_size=min(amp_batch, cf.shape[0]))
    logs = np.asarray(logs, dtype=np.float64)
    dead = np.asarray(mants) == 0
    w = np.where(dead, 0.0, np.exp(2.0 * (logs - logs[~dead].max())))
    z = float(w.sum())

    walkers = {"row": tj_singlet_pair_corr_graded_rowshared,
               "col": tj_singlet_pair_corr_graded_colshared}
    ly, lx = cf.shape[1], cf.shape[2]
    shapes = {"row": (ly, lx - 1, lx - 1), "col": (lx, ly - 1, ly - 1)}
    out = {}
    for frame in frames:
        view = cf if frame == "row" else np.swapaxes(cf, 1, 2)
        idx = np.nonzero(_pair_corr_support(view))[0]
        if idx.size == 0:
            out[frame] = np.zeros(shapes[frame])
            continue
        fn = walkers[frame]
        tables = jax.lax.map(
            lambda c: fn(tps, c, space, chi, trunc),
            jnp.asarray(cf[idx]), batch_size=min(batch_size, idx.size))
        out[frame] = np.einsum("s,s...->...", w[idx] / z,
                               np.asarray(tables, dtype=np.float64))
    return out, z
