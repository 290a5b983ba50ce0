"""PBC trial/commit cache tests (reference: TRGContractor trial machinery,
trg_contractor.h:350-421 — BeginTrialWithReplacement / EvaluateReplacement /
CommitTrial).

The TPU design (contraction/pbc_trial.py) shadow-propagates a static-size
dirty window through the cached multi-scale RG. Two modes:
  exact=True  — fresh projectors on the dilated window; equals the full
                recompute to round-off (the reference's trial semantics).
  exact=False — FROZEN cached projectors (production sweep); exact when
                chi does not truncate, and a consistent fixed multilinear
                map otherwise (the OBC BMPS env-reuse analogue).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.contraction.pbc import contract_pbc
from peps_tpu.contraction.pbc_trial import (begin_trial, build_cache,
                                            commit_trial,
                                            evaluate_replacement,
                                            replace_sites, trial_log_abs)
from peps_tpu.lattice import BoundaryCondition
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.montecarlo.sweep_pbc import (mc_sweep_pbc_host,
                                           mc_sweep_pbc_trial)
from peps_tpu.tps import project, random_tps

PBC = BoundaryCondition.PERIODIC


def _log_abs_full(tn, chi, trunc):
    mant, logw = contract_pbc(tn, chi, trunc)
    return float(jnp.log(jnp.abs(mant)) + logw)


def _setup(n, m, D, chi, seed=0):
    key = jax.random.PRNGKey(seed + n * 100 + m + D)
    tps = random_tps(key, n, m, 2, D, dtype=jnp.float64, bc=PBC, scale=0.5)
    cfg = jax.random.randint(jax.random.fold_in(key, 1), (n, m), 0, 2)
    trunc = TruncParams(chi, 1, 0.0)
    return tps, cfg, trunc


def _flip_anchors(n, m):
    # corners + wrap-around rows/cols exercise the modular windows
    return [(0, 0), (1, m - 1), (n - 1, m // 2), (n - 1, m - 1)]


@pytest.mark.parametrize("n,m,D,chi,exact", [
    (4, 4, 2, 16, True),      # chi exact, exact trial
    (4, 4, 2, 16, False),     # chi exact, frozen map == exact map
    (4, 4, 3, 6, True),       # truncating chi, fresh projectors
    (6, 6, 2, 8, True),       # 3*2 dims: triple-column stage in the plan
])
def test_trial_matches_full_recompute(n, m, D, chi, exact):
    """Trial amplitudes == full recompute of the flipped configuration,
    for horizontal and vertical 2-site windows at wrap-around anchors."""
    tps, cfg, trunc = _setup(n, m, D, chi)
    tn = project(tps, cfg)
    cache = build_cache(tn, chi, trunc)
    assert abs(float(cache.log_abs) - _log_abs_full(tn, chi, trunc)) < 1e-10

    for horizontal in (True, False):
        (wr, wc), (dy, dx) = ((1, 2), (0, 1)) if horizontal else ((2, 1),
                                                                  (1, 0))
        for (y, x) in _flip_anchors(n, m):
            y2, x2 = (y + dy) % n, (x + dx) % m
            c1, c2 = int(cfg[y, x]), int(cfg[y2, x2])
            blk = replace_sites(tps, cfg, [(0, 0), (dy, dx)],
                                [1 - c1, 1 - c2], y, x, wr, wc)
            t = begin_trial(cache, blk, y, x, chi=chi, trunc=trunc,
                            exact=exact)
            la_t = float(trial_log_abs(cache, t))
            cfg2 = cfg.at[y, x].set(1 - c1).at[y2, x2].set(1 - c2)
            la_ref = _log_abs_full(project(tps, cfg2), chi, trunc)
            assert abs(la_t - la_ref) < 1e-9, (horizontal, y, x)


def test_commit_and_reject_semantics():
    """commit(accept=True) leaves the cache evaluating the trial state;
    commit(accept=False) is bit-identical to the original cache; a chain of
    commits tracks the full recompute (exact chi)."""
    n = m = 4
    tps, cfg, trunc = _setup(n, m, 2, 16, seed=3)
    chi = 16
    cache = build_cache(project(tps, cfg), chi, trunc)

    c1, c2 = int(cfg[0, 0]), int(cfg[0, 1])
    blk = replace_sites(tps, cfg, [(0, 0), (0, 1)], [1 - c1, 1 - c2],
                        0, 0, 1, 2)
    t = begin_trial(cache, blk, 0, 0, chi=chi, trunc=trunc)

    rej = commit_trial(cache, t, accept=jnp.asarray(False))
    for a, b in zip(jax.tree.leaves(rej), jax.tree.leaves(cache)):
        assert bool(jnp.all(a == b))

    acc = commit_trial(cache, t, accept=jnp.asarray(True))
    assert abs(float(acc.log_abs) - float(trial_log_abs(cache, t))) < 1e-12

    # chained commits: flip several bonds in sequence, cache tracks full
    cur = cfg
    for (y, x, dy, dx) in [(0, 0, 0, 1), (3, 3, 1, 0), (2, 1, 0, 1)]:
        y2, x2 = (y + dy) % n, (x + dx) % m
        c1, c2 = int(cur[y, x]), int(cur[y2, x2])
        wr, wc = (1, 2) if dy == 0 else (2, 1)
        blk = replace_sites(tps, cur, [(0, 0), (dy, dx)], [1 - c1, 1 - c2],
                            y, x, wr, wc)
        t = begin_trial(cache, blk, y, x, chi=chi, trunc=trunc)
        cache = commit_trial(cache, t)
        cur = cur.at[y, x].set(1 - c1).at[y2, x2].set(1 - c2)
        la_ref = _log_abs_full(project(tps, cur), chi, trunc)
        assert abs(float(cache.log_abs) - la_ref) < 1e-9


def test_evaluate_replacement_read_only():
    """EvaluateReplacement analogue: returns the trial amplitude without
    touching the cache."""
    tps, cfg, trunc = _setup(4, 4, 2, 16, seed=5)
    cache = build_cache(project(tps, cfg), 16, trunc)
    c1 = int(cfg[2, 2])
    blk = replace_sites(tps, cfg, [(0, 0)], [1 - c1], 2, 2, 1, 1)
    mant, logw = evaluate_replacement(cache, blk, 2, 2, chi=16, trunc=trunc)
    cfg2 = cfg.at[2, 2].set(1 - c1)
    la_ref = _log_abs_full(project(tps, cfg2), 16, trunc)
    got = float(jnp.log(jnp.abs(mant)) + logw)
    assert abs(got - la_ref) < 1e-9


@pytest.mark.parametrize("mode", ["exchange", "suwa_todo"])
def test_trial_sweep_matches_host_sweep(mode):
    """At non-truncating chi the frozen map IS the exact map, the per-bond
    key stream and bond order match mc_sweep_pbc_host, so the trial sweep
    must reproduce the host sweep's trajectories decision-for-decision."""
    n = m = 4
    tps, _, trunc = _setup(n, m, 2, 16, seed=7)
    chi = 16
    nc = 3
    key = jax.random.PRNGKey(11)
    configs = jax.random.randint(key, (nc, n, m), 0, 2)
    keys = jax.random.split(jax.random.fold_in(key, 1), nc)
    rule = UpdateRule(mode)

    cfg_h, _, _, acc_h, tri_h = mc_sweep_pbc_host(
        tps, configs, keys, chi, trunc, rule)
    cfg_t, _, acc_t, tri_t = mc_sweep_pbc_trial(
        tps, configs, keys, chi, trunc, rule)
    np.testing.assert_array_equal(np.asarray(cfg_t), np.asarray(cfg_h))
    np.testing.assert_array_equal(np.asarray(acc_t), np.asarray(acc_h))
    np.testing.assert_array_equal(np.asarray(tri_t), np.asarray(tri_h))


def test_trial_sweep_truncating_chain_consistency():
    """At truncating chi the frozen-map sweep must still be internally
    consistent: after the sweep, each chain's committed cache amplitude
    equals a FRESH frozen-map replay of (initial cache -> accepted moves)
    and stays within the truncation error of the full recompute."""
    n = m = 4
    tps, _, trunc6 = _setup(n, m, 3, 6, seed=9)
    chi = 6
    nc = 2
    key = jax.random.PRNGKey(13)
    configs = jax.random.randint(key, (nc, n, m), 0, 2)
    keys = jax.random.split(jax.random.fold_in(key, 1), nc)
    rule = UpdateRule(mode="exchange")
    cfg_t, _, acc, _, caches = mc_sweep_pbc_trial(
        tps, configs, keys, chi, trunc6, rule, return_caches=True)
    # committed cache log|psi| ~ full recompute at truncation accuracy
    for i in range(nc):
        la_cache = float(jax.tree.map(lambda x: x[i], caches).log_abs)
        la_full = _log_abs_full(project(tps, cfg_t[i]), chi, trunc6)
        # frozen-map drift is bounded by truncation error; D=3 chi=6 on a
        # random state truncates hard, so the tolerance is loose — the
        # invariant under test is "same state, consistent magnitude"
        assert abs(la_cache - la_full) < 0.2 * max(1.0, abs(la_full))


def test_trial_sweep_respects_conserve_mask():
    """Full-space trial sweep honors UpdateRule conserve masks (regression
    twin of test_pbc_host_sweep_respects_conserve_mask)."""
    n = m = 4
    tps, _, trunc = _setup(n, m, 2, 16, seed=15)
    d = 2
    msk = np.zeros((d * d, d * d), np.int32)
    for c1 in range(d):
        for c2 in range(d):
            for n1 in range(d):
                for n2 in range(d):
                    if c1 + c2 == n1 + n2:
                        msk[c1 * d + c2, n1 * d + n2] = 1
    rule = UpdateRule("suwa_todo",
                      conserve_mask=tuple(map(tuple, msk.tolist())))
    nc = 4
    key = jax.random.PRNGKey(17)
    # half-filled configs
    base = jnp.array([[0, 1] * (m // 2)] * n)
    configs = jnp.stack([jnp.roll(base, i, axis=1) for i in range(nc)])
    keys = jax.random.split(key, nc)
    cfg_t, _, _, _ = mc_sweep_pbc_trial(tps, configs, keys, 16, trunc, rule)
    sums = np.asarray(jnp.sum(cfg_t.reshape(nc, -1), axis=1))
    np.testing.assert_array_equal(sums, np.full(nc, n * m // 2))


def test_trial_sweep_host_driven_matches_scanned():
    """The host-driven per-bond trial executable must reproduce the
    scanned trial sweep's trajectories bit for bit (same key stream and
    bond order — it exists only because the scanned graph's XLA:TPU
    compile time is pathological at production sizes)."""
    n = m = 4
    tps, _, trunc = _setup(n, m, 3, 6, seed=21)
    chi = 6
    nc = 3
    key = jax.random.PRNGKey(23)
    configs = jax.random.randint(key, (nc, n, m), 0, 2)
    keys = jax.random.split(jax.random.fold_in(key, 1), nc)
    rule = UpdateRule("exchange")
    cfg_s, _, acc_s, tri_s = mc_sweep_pbc_trial(
        tps, configs, keys, chi, trunc, rule, host_driven=False)
    cfg_h, _, acc_h, tri_h = mc_sweep_pbc_trial(
        tps, configs, keys, chi, trunc, rule, host_driven=True)
    np.testing.assert_array_equal(np.asarray(cfg_h), np.asarray(cfg_s))
    np.testing.assert_array_equal(np.asarray(acc_h), np.asarray(acc_s))
    np.testing.assert_array_equal(np.asarray(tri_h), np.asarray(tri_s))
