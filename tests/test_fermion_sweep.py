"""Env-shared graded MC sweep vs the full-recompute trajectory oracle.

The shared-env sweep and the oracle replay the SAME bond order and per-bond
fold_in keys, so with lossless compression (chi >= exact rank) every
Metropolis decision must agree — final configurations and acceptance
counts are bit-identical. Covers even and odd snake rows (horizontal pass)
and even/odd row pairs (vertical pass), spinless and t-J.

Reference: MCUpdateSquareNNExchangeOBC env-reuse schedule
(square_nn_updater.h:26-81) applied to the graded dressed projection.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.exact_sum import sector_configs
from peps_tpu.fermion.peps import (fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion)
from peps_tpu.fermion.sweep import (mc_sweep_fermion_oracle,
                                    mc_sweep_fermion_shared)
from peps_tpu.linalg import TruncParams
from peps_tpu.models.fermion import spinless_fermion, tj_model
from peps_tpu.peps import SimpleUpdateParams

pytestmark = pytest.mark.fast

CASES = [
    (spinless_fermion(1.0, 0.5), 2, 3, 3,
     np.array([[1, 0, 0], [0, 0, 1]])),
    (spinless_fermion(1.0), 3, 3, 2,
     np.array([[1, 0, 1], [0, 0, 0], [1, 0, 1]])),
    (tj_model(3.0, 1.0), 3, 2, 3, np.array([[1, 2], [0, 0], [2, 1]])),
]


def _state(model, ly, lx, D, occ0):
    space = space_for_model(model, D)
    peps = product_fermion_peps(ly, lx, space, occ0)
    out = fermion_simple_update(
        peps, model, space,
        SimpleUpdateParams(steps=30, tau=0.2,
                           trunc=TruncParams(D, 1, 1e-12)))
    tps = to_tps_fermion(out.peps)
    return tps / jnp.max(jnp.abs(tps)), space


@pytest.mark.parametrize("case", CASES,
                         ids=["spinless2x3", "spinless3x3", "tj3x2"])
def test_shared_sweep_matches_oracle_trajectory(case):
    model, ly, lx, D, occ0 = case
    tps, space = _state(model, ly, lx, D, occ0)
    chi = 24
    tp = TruncParams(chi, 1, 0.0)
    cfg0 = jnp.asarray(occ0.astype(np.int32))
    agree = 0
    for seed in range(4):
        key = jax.random.PRNGKey(100 + seed)
        c_fast, _, st_fast = mc_sweep_fermion_shared(tps, space, cfg0, key,
                                                     chi, tp)
        c_ref, _, st_ref = mc_sweep_fermion_oracle(tps, space, cfg0, key,
                                                   chi, tp)
        assert np.array_equal(np.asarray(c_fast), np.asarray(c_ref)), \
            (seed, np.asarray(c_fast), np.asarray(c_ref))
        assert int(st_fast.accepted) == int(st_ref.accepted)
        assert int(st_fast.trials) == int(st_ref.trials)
        agree += int(st_fast.accepted)
        cfg0 = c_fast   # chain the sweeps: trajectories keep agreeing
    assert agree > 0   # the test actually exercised acceptances


def test_shared_sweep_jits_and_vmaps():
    """The shared sweep compiles under jit and vmaps over chains (the
    production usage in the evaluator)."""
    model, ly, lx, D, occ0 = CASES[0]
    tps, space = _state(model, ly, lx, D, occ0)
    chi = 8
    tp = TruncParams(chi, 1, 0.0)
    cfgs = jnp.asarray(np.stack([occ0, occ0[::-1]]).astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    fn = jax.jit(jax.vmap(
        lambda c, k: mc_sweep_fermion_shared(tps, space, c, k, chi, tp),
        in_axes=(0, 0)), static_argnames=())
    out_cfgs, _, stats = fn(cfgs, keys)
    assert out_cfgs.shape == cfgs.shape
    # occupation conserved by exchange moves
    for i in range(2):
        a = np.sort(np.asarray(cfgs[i]).ravel())
        b = np.sort(np.asarray(out_cfgs[i]).ravel())
        assert np.array_equal(a, b)
