"""Monte Carlo engine: chain-batched sampling state and helpers.

Reference: `algorithm/vmc_update/monte_carlo_engine.h` (WarmUp :146,
StepSweep :180, NormalizeStateOrder1 :206, EnsureConfigurationValidity :340).
TPU re-design: a chain batch [Nc, Ly, Lx] on one chip replaces one config per
MPI rank; validity rescue is a masked gather from healthy chains instead of an
Allgather/Bcast; state normalization rescales the single dense TPS array.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.contraction import bmps
from peps_tpu.lattice import transpose_tps
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.sweep import SweepStats, UpdateRule, mc_sweep
from peps_tpu.tps import project


class ChainState(NamedTuple):
    configs: jnp.ndarray   # [Nc, Ly, Lx] int32
    key: jax.Array


def init_configs_occupancy(key: jax.Array, nchains: int, ly: int, lx: int,
                           occupancy: dict[int, int]) -> jnp.ndarray:
    """Random configurations with exact per-state occupation counts
    (reference: Configuration random init with occupancy vector,
    configuration.h:103-150)."""
    base = []
    for state, count in sorted(occupancy.items()):
        base.extend([state] * count)
    if len(base) != ly * lx:
        raise ValueError(
            f"occupancy counts sum to {len(base)} but the lattice has "
            f"{ly * lx} sites ({ly}x{lx}); occupancy={occupancy!r}")
    base = jnp.asarray(np.array(base, dtype=np.int32))

    def one(k):
        return jax.random.permutation(k, base).reshape(ly, lx)

    return jax.vmap(one)(jax.random.split(key, nchains))


def init_configs_uniform(key: jax.Array, nchains: int, ly: int, lx: int,
                         d: int) -> jnp.ndarray:
    return jax.random.randint(key, (nchains, ly, lx), 0, d, dtype=jnp.int32)


def amplitudes(tps: jnp.ndarray, configs: jnp.ndarray, chi: int,
               trunc: TruncParams):
    """(mantissa, log_weight) per chain."""
    def one(cfg):
        return bmps.amplitude(project(tps, cfg), chi, trunc)
    return jax.vmap(one)(configs)


def ensure_validity(tps: jnp.ndarray, configs: jnp.ndarray, key: jax.Array,
                    chi: int, trunc: TruncParams):
    """Replace zero-amplitude chains with copies of healthy chains
    (reference: EnsureConfigurationValidity cross-rank rescue,
    monte_carlo_engine.h:340-414). Returns (configs, n_rescued)."""
    mant, _ = amplitudes(tps, configs, chi, trunc)
    valid = mant != 0
    n_valid = jnp.sum(valid)
    # index of k-th valid chain (fallback 0); sample a donor for each invalid
    order = jnp.argsort(~valid)  # valid chains first
    donors = jax.random.randint(key, (configs.shape[0],), 0,
                                jnp.maximum(n_valid, 1))
    donor_idx = order[donors]
    rescued = jnp.where(valid[:, None, None], configs, configs[donor_idx])
    return rescued, configs.shape[0] - n_valid


def normalize_state_order1(tps: jnp.ndarray, configs: jnp.ndarray, chi: int,
                           trunc: TruncParams) -> jnp.ndarray:
    """Rescale the TPS so the max sampled |psi| is O(1)
    (reference: NormalizeStateOrder1, monte_carlo_engine.h:206)."""
    mant, logw = amplitudes(tps, configs, chi, trunc)
    log_abs = jnp.log(jnp.maximum(jnp.abs(mant), 1e-300)) + logw
    max_log = jnp.max(log_abs)
    n_sites = tps.shape[0] * tps.shape[1]
    return tps * jnp.exp(-max_log / n_sites)


@dataclasses.dataclass
class MonteCarloEngine:
    """Host-side wrapper owning the jitted sweep (reference:
    MonteCarloEngine). All heavy code paths are jit-compiled once."""
    tps: jnp.ndarray
    chi: int
    trunc: TruncParams
    rule: UpdateRule
    state: ChainState

    def __post_init__(self):
        chi, trunc, rule = self.chi, self.trunc, self.rule

        def one_sweep(tps, tps_t, cfg, key):
            return mc_sweep(tps, tps_t, cfg, key, chi, trunc, rule)

        def sweep_batch(tps, configs, key):
            tps_t = transpose_tps(tps)
            keys = jax.random.split(key, configs.shape[0] + 1)
            new_cfgs, _, stats = jax.vmap(one_sweep, in_axes=(None, None, 0, 0))(
                tps, tps_t, configs, keys[1:])
            return new_cfgs, keys[0], SweepStats(jnp.sum(stats.accepted),
                                                 jnp.sum(stats.trials))

        self._sweep_batch = jax.jit(sweep_batch)

    def step_sweep(self):
        cfgs, key, stats = self._sweep_batch(self.tps, self.state.configs,
                                             self.state.key)
        self.state = ChainState(cfgs, key)
        return stats

    def warm_up(self, n_sweeps: int):
        acc = tri = 0
        for _ in range(n_sweeps):
            st = self.step_sweep()
            acc += int(st.accepted)
            tri += int(st.trials)
        return acc / max(tri, 1)


def save_configs(path: str, configs: jnp.ndarray) -> None:
    """Dump the chain configurations for warm restart of the next run
    (reference: MonteCarloParams::config_dump_path)."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path if path.endswith(".npy") else path + ".npy",
            np.asarray(configs))


def load_configs(path: str) -> jnp.ndarray:
    return jnp.asarray(np.load(path if path.endswith(".npy")
                               else path + ".npy"))
