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
