"""Observable registry: models declare observables as DATA.

Reference: `ModelMeasurementSolver` registry (`model_measurement_solver.h:
28-51` ObservableMeta/ObservableMap with coordinate generators) and the
per-model measurement solvers (`square_tJ_model.h` hole density + pair
correlators, `square_hubbard_model.h` double occupancy,
`structure_factor_measurement_mixin.h` S+S- channel).

Each `Observable` carries a jittable per-sample `compute(ctx)`; the
measurement executor evaluates every registered observable per sample,
aggregates mean/stderr with binned statistics, and dumps stats/<key>.csv
plus <key>_coords.txt (the reference's coordinate map files).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np


class MeasureContext(NamedTuple):
    """Per-sample inputs handed to Observable.compute (all traced).

    stacks/stacks_t: optional precomputed env stacks of the projected
    network (normal / transposed frame) shared by every env-walker
    observable of the sample — computed once per config in the measurement
    executor's env pass (kills the per-observable stack rebuilds that blew
    up compile time at production sizes)."""
    tps: jnp.ndarray
    tps_t: jnp.ndarray
    config: jnp.ndarray
    e_loc: jnp.ndarray
    chi: int
    trunc: object
    stacks: object = None
    stacks_t: object = None


@dataclasses.dataclass(frozen=True)
class Observable:
    """Reference: ObservableMeta (model_measurement_solver.h:34-51)."""
    key: str
    description: str
    compute: Callable                    # (MeasureContext) -> jnp array
    coords: Callable | None = None       # (ly, lx) -> [K, ncoord] int array
    index_labels: tuple = ()
    needs_envs: bool = False             # costly: run in the split env pass
    uses_stacks: bool = False            # wants ctx.stacks prebuilt
    uses_stacks_t: bool = False          # wants ctx.stacks_t prebuilt


def site_coords(ly, lx):
    return np.array([(y, x) for y in range(ly) for x in range(lx)])


def pair_coords(ly, lx):
    n = ly * lx
    s = site_coords(ly, lx)
    out = []
    for i in range(n):
        for j in range(n):
            out.append((*s[i], *s[j]))
    return np.array(out)


def row_segment_coords(ly, lx):
    """(y, x1, x2) for in-row pairs x1 < x2 (walker correlators)."""
    return np.array([(y, x1, x2) for y in range(ly)
                     for x1 in range(lx) for x2 in range(x1 + 1, lx)])


def _diag_map(values):
    def compute(ctx):
        v = jnp.asarray(values, ctx.e_loc.dtype)
        return v[ctx.config]
    return compute


def _diag_pair(values):
    def compute(ctx):
        v = jnp.asarray(values, ctx.e_loc.dtype)
        flat = v[ctx.config].reshape(-1)
        return jnp.outer(flat, flat)
    return compute


def spin_registry(params) -> list:
    """Spin-1/2 observable set (reference: square_spin_onehalf_xxz_obc.h +
    structure_factor_measurement_mixin.h)."""
    sz = np.array([0.5, -0.5])
    obs = [
        Observable("sz", "Local <Sz> per site", _diag_map(sz), site_coords,
                   ("y", "x")),
        Observable("szsz", "All-to-all <Sz_i Sz_j>", _diag_pair(sz),
                   pair_coords, ("y1", "x1", "y2", "x2")),
    ]
    if getattr(params, "measure_offdiag_corr", True):
        from peps_tpu.algorithm.measure import _row_offdiag_corr
        from peps_tpu.contraction import bmps
        from peps_tpu.tps import project
        sp = np.array([[0.0, 1.0], [0.0, 0.0]])
        sm = sp.T

        def spsm_row(ctx):
            tn = project(ctx.tps, ctx.config)
            stacks = ctx.stacks if ctx.stacks is not None else \
                bmps.all_env_stacks(tn, ctx.chi, ctx.trunc)
            return jnp.real(_row_offdiag_corr(
                ctx.tps, tn, ctx.config, jnp.asarray(sp, ctx.tps.dtype),
                jnp.asarray(sm, ctx.tps.dtype), ctx.chi, ctx.trunc, stacks))

        def spsm_col(ctx):
            cfg_t = ctx.config.T
            tn_t = project(ctx.tps_t, cfg_t)
            stacks = ctx.stacks_t if ctx.stacks_t is not None else \
                bmps.all_env_stacks(tn_t, ctx.chi, ctx.trunc)
            return jnp.real(_row_offdiag_corr(
                ctx.tps_t, tn_t, cfg_t, jnp.asarray(sp, ctx.tps.dtype),
                jnp.asarray(sm, ctx.tps.dtype), ctx.chi, ctx.trunc, stacks))

        obs.append(Observable(
            "spsm_row", "In-row <S+_i S-_j> (S+S- walker channel)",
            spsm_row, None, ("y", "x1", "x2"), needs_envs=True,
            uses_stacks=True))
        obs.append(Observable(
            "spsm_col", "In-column <S+_i S-_j>", spsm_col, None,
            ("x", "y1", "y2"), needs_envs=True, uses_stacks_t=True))
    return obs


def fermion_registry(ft, params) -> list:
    """Fermionic observable set: hole density / double occupancy / spin and
    charge maps (reference: square_tJ_model.h, square_hubbard_model.h)."""
    n_up = np.asarray(ft.n_up)
    n_dn = np.asarray(ft.n_dn)
    d = len(n_up)
    ntot = n_up + n_dn
    obs = [
        Observable("n_up", "Up-electron density", _diag_map(n_up),
                   site_coords, ("y", "x")),
        Observable("density", "Total electron density", _diag_map(ntot),
                   site_coords, ("y", "x")),
        Observable("nn", "Density-density <n_i n_j>", _diag_pair(ntot),
                   pair_coords, ("y1", "x1", "y2", "x2")),
    ]
    if not ft.spinless:
        sz = 0.5 * (n_up - n_dn)
        obs.insert(1, Observable("n_dn", "Down-electron density",
                                 _diag_map(n_dn), site_coords, ("y", "x")))
        obs.append(Observable("sz", "Local <Sz>", _diag_map(sz),
                              site_coords, ("y", "x")))
        obs.append(Observable("szsz", "All-to-all <Sz_i Sz_j>",
                              _diag_pair(sz), pair_coords,
                              ("y1", "x1", "y2", "x2")))
        hole = (ntot == 0).astype(float)
        if np.any(hole):     # t-J: hole density (square_tJ_model.h)
            obs.append(Observable("hole_density", "Hole density <1-n_i>",
                                  _diag_map(hole), site_coords, ("y", "x")))
        docc = ((n_up == 1) & (n_dn == 1)).astype(float)
        if np.any(docc):     # Hubbard: double occupancy
            obs.append(Observable(
                "double_occupancy", "Double occupancy <n_up n_dn>",
                _diag_map(docc), site_coords, ("y", "x")))
    if getattr(params, "measure_pair_corr", False) and not ft.spinless \
            and d == 3:
        from peps_tpu.algorithm.measure_fermion import (
            tj_singlet_pair_corr_col, tj_singlet_pair_corr_row)

        def pair_corr(ctx):
            return jnp.real(tj_singlet_pair_corr_row(
                ctx.tps, ctx.config, ctx.chi, ctx.trunc))

        def pair_corr_c(ctx):
            return jnp.real(tj_singlet_pair_corr_col(
                ctx.tps, ctx.config, ctx.chi, ctx.trunc))

        obs.append(Observable(
            "pair_corr_row", "t-J singlet pair correlation "
            "<Delta^dag_i Delta_j> (in-row horizontal bond pairs)",
            pair_corr, None, ("y", "x1", "x2"), needs_envs=True))
        obs.append(Observable(
            "pair_corr_col", "t-J singlet pair correlation "
            "<Delta^dag_i Delta_j> (in-column vertical bond pairs)",
            pair_corr_c, None, ("x", "y1", "y2"), needs_envs=True))
    return obs


def structure_factor_spsm_row(spsm_row_mean: np.ndarray, lx: int
                              ) -> np.ndarray:
    """In-row transverse structure factor S^{+-}(q_x) from the measured
    S+S- walker channel, averaged over rows (reference:
    structure_factor_measurement_mixin.h S+S- channel). spsm_row_mean:
    [Ly, Lx, Lx] with entries at x1 < x2."""
    c = np.asarray(spsm_row_mean)
    ly = c.shape[0]
    # symmetrize (S+S- hermitian pair -> same real part)
    c = c + np.transpose(c, (0, 2, 1))
    qx = 2 * np.pi * np.fft.fftfreq(lx)
    out = np.zeros(lx)
    xs = np.arange(lx)
    for iq, q in enumerate(qx):
        ph = np.exp(1j * q * xs)
        out[iq] = np.real(np.einsum("i,yij,j->", ph.conj(), c, ph)) \
            / (lx * ly)
    return out
