"""Adversarial random-state oracles for EVERY graded kernel.

Round-3 post-mortem: two real sampler bugs (h-kernel right-env selection,
odd-row hop string signs) survived every SU-warm-state test because
near-equilibrium states and tame configurations masked them. The fix
methodology — random parity-even states far from equilibrium, chained
trajectories, independent full-recompute / second-quantized oracles — is
applied here systematically to all six graded kernels:

1. v-kernel (vertical-bond pass of the env-shared sweep): chained
   shared-vs-oracle trajectories from a start config whose FIRST sweep can
   only move via vertical bonds (uniform rows make every horizontal
   exchange an identity), on a random parity-even state.
2. diagonal (t2) channel tables: per-config graded local energies on a
   random parity-even state vs the snake-ordered second-quantized ED
   matrix, at the reference's t2 fixture amplitudes (-2.5, +2.1;
   square_spinless_fermion.h:57-58,120 / square_tJ_model.h:99-100).
3. Jastrow-dressed graded sweep: chained trajectories on a random
   parity-even state with a random dense Jastrow matrix.
4. row-frame env-shared pair-corr walker vs the exact-coefficient mode
   oracle on a random parity-even state (all entries, zeros included).
5. column-frame (excited-BMPS) pair-corr walker, same treatment.
6. full-space Suwa-Todo with a particle-conserving mask in the t-J basis:
   stationarity of the exact sector distribution on a random state
   (complements the random d=4 Hubbard-mask test in test_fermion.py).

The trajectory checks (1, 3) run in fresh subprocesses with the compile
cache disabled — warmed pytest processes segfault XLA:CPU on these
executables (see tests/test_fermion_sweep.py and the verify skill gotchas).
"""
import itertools
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.fermion.peps import space_for_model
from peps_tpu.fermion.sweep import (mc_sweep_fermion_oracle,
                                    mc_sweep_fermion_shared)
from peps_tpu.linalg import TruncParams
from peps_tpu.models.fermion import spinless_fermion, tj_model
from tests.test_fermion_sweep import _random_even_state

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _subprocess_check(func_name: str, arg: str) -> None:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "jax.config.update('jax_enable_x64', True); "
            "import sys; sys.path.insert(0, %r); "
            "from tests.test_graded_adversarial import %s; "
            "%s(%r)" % (REPO, func_name, func_name, arg))
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "ADVERSARIAL_OK" in r.stdout, r.stdout[-2000:]


# ---------------------------------------------------------------- 1. v-kernel

def run_vkernel_check(which: str) -> None:
    """Chained trajectories from a uniform-rows start: in sweep 1 every
    horizontal exchange is an identity, so any configuration change is a
    vertical-kernel acceptance — the v-kernel's Metropolis ratios are
    exercised directly, then the chained sweeps mix both passes.

    A ':cplx' suffix runs the same check on a complex128 random state
    (reference two-type test matrix, tests/CMakeLists.txt:59-86)."""
    which, _, flavor = which.partition(":")
    cplx = flavor == "cplx"
    if which == "spinless":
        model, ly, lx, D = spinless_fermion(1.0, 0.5), 3, 3, 3
        occ0 = np.array([[1, 1, 1], [0, 0, 0], [1, 1, 1]])
    else:
        model, ly, lx, D = tj_model(3.0, 1.0), 3, 2, 3
        occ0 = np.array([[1, 1], [2, 2], [0, 0]])   # v bonds: exchange + hop
    space = space_for_model(model, D)
    tps = _random_even_state(13, ly, lx, model.phys_dim, D, space,
                             cplx=cplx)
    chi = 24
    tp = TruncParams(chi, 1, 0.0)
    total_acc = 0
    moved_first_sweep = False
    for seed in range(3):
        cfg = jnp.asarray(occ0.astype(np.int32))
        key = jax.random.PRNGKey(900 + seed)
        for sweep in range(5):
            key, ks = jax.random.split(key)
            c_fast, _, st_fast = mc_sweep_fermion_shared(tps, space, cfg,
                                                         ks, chi, tp)
            c_ref, _, st_ref = mc_sweep_fermion_oracle(tps, space, cfg,
                                                       ks, chi, tp)
            assert np.array_equal(np.asarray(c_fast),
                                  np.asarray(c_ref)), (seed, sweep)
            assert int(st_fast.accepted) == int(st_ref.accepted), \
                (seed, sweep)
            if sweep == 0 and not np.array_equal(np.asarray(c_fast), occ0):
                moved_first_sweep = True   # a vertical move was accepted
            cfg = c_fast
            total_acc += int(st_fast.accepted)
    assert total_acc > 10, total_acc
    assert moved_first_sweep, "no vertical acceptance ever happened"
    print(f"ADVERSARIAL_OK vkernel {which} acc={total_acc}")


@pytest.mark.parametrize("which", ["spinless", "tj",
                                   "spinless:cplx", "tj:cplx"])
def test_vkernel_random_state(which):
    _subprocess_check("run_vkernel_check", which)


# ------------------------------------------------- 2. diagonal (t2) channels

@pytest.mark.parametrize("cplx", [False, True], ids=["f64", "c128"])
@pytest.mark.parametrize("which", ["spinless_t2", "tj_t2v"])
def test_t2_diag_tables_random_state(which, cplx):
    """Per-config graded local energies with diagonal (NNN) channels on a
    random parity-even state vs the snake-ordered second-quantized ED
    matrix — e_loc(s) = (H c)[s] / c[s] entry for entry. Runs on f64 AND
    c128 states (reference two-type matrix, tests/CMakeLists.txt:59-86)."""
    import tests.fermion_ed_oracle as FO
    from peps_tpu.algorithm.exact_sum import sector_configs
    from peps_tpu.fermion.exact import exact_coefficients, snake_order
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      local_energy_and_holes_graded)

    if which == "spinless_t2":
        model, ly, lx, D = spinless_fermion(1.0, 0.5, t2=-2.5), 2, 3, 3
        sector = {1: 2, 0: 4}
    else:
        model, ly, lx, D = tj_model(3.0, 1.0, t2=2.1, v=0.7), 2, 3, 3
        sector = {1: 2, 2: 2, 0: 2}
    space = space_for_model(model, D)
    tps = _random_even_state(17, ly, lx, model.phys_dim, D, space,
                             cplx=cplx)
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    configs = jnp.asarray(sector_configs(ly, lx, sector))

    res = jax.vmap(lambda c: local_energy_and_holes_graded(
        tps, c, gm, chi, tp, with_holes=False))(configs)
    # complex states carry genuinely complex local energies — compare the
    # full complex value against the oracle, not just the real part
    e_got = np.asarray(res.e_loc)

    c = exact_coefficients(tps, space.phys_parity, space.bond_parity)
    seq = snake_order(ly, lx)
    perm = [seq.index((y, x)) for y in range(ly) for x in range(lx)]
    vv = np.transpose(np.asarray(c), perm).reshape(-1)
    H = FO.build_fermion_hamiltonian(model, ly, lx, order="snake").toarray()
    hv = H @ vv
    d = model.phys_dim
    checked = 0
    for cfg, eg in zip(np.asarray(configs), e_got):
        i = int(np.ravel_multi_index(cfg.reshape(-1), (d,) * (ly * lx)))
        if abs(vv[i]) < 1e-10 * np.abs(vv).max():
            continue
        want = hv[i] / vv[i]
        assert abs(eg - want) < 1e-7 * max(1.0, abs(want)), (cfg, eg, want)
        checked += 1
    assert checked > len(e_got) // 2   # the sector was actually exercised


# ------------------------------------------------- 3. Jastrow-dressed sweep

def run_dressed_check(which: str) -> None:
    from peps_tpu.montecarlo.jastrow import JastrowDress

    cplx = which.endswith(":cplx")
    model, ly, lx, D = tj_model(3.0, 1.0), 3, 2, 3
    occ0 = np.array([[1, 2], [0, 0], [2, 1]])
    space = space_for_model(model, D)
    tps = _random_even_state(19, ly, lx, model.phys_dim, D, space,
                             cplx=cplx)
    n = ly * lx
    rng = np.random.default_rng(23)
    v = rng.normal(size=(n, n)) * 0.5
    v = (v + v.T) / 2
    np.fill_diagonal(v, 0.0)
    nvals = np.array([float(model.n_up[i] + model.n_dn[i])
                      for i in range(model.phys_dim)])
    dress = JastrowDress(jnp.asarray(v), jnp.asarray(nvals))
    chi = 24
    tp = TruncParams(chi, 1, 0.0)
    total_acc = 0
    for seed in range(3):
        cfg = jnp.asarray(occ0.astype(np.int32))
        key = jax.random.PRNGKey(700 + seed)
        for sweep in range(5):
            key, ks = jax.random.split(key)
            c_fast, _, st_fast = mc_sweep_fermion_shared(
                tps, space, cfg, ks, chi, tp, dress=dress)
            c_ref, _, st_ref = mc_sweep_fermion_oracle(
                tps, space, cfg, ks, chi, tp, dress=dress)
            assert np.array_equal(np.asarray(c_fast),
                                  np.asarray(c_ref)), (seed, sweep)
            assert int(st_fast.accepted) == int(st_ref.accepted), \
                (seed, sweep)
            cfg = c_fast
            total_acc += int(st_fast.accepted)
    assert total_acc > 10, total_acc
    print(f"ADVERSARIAL_OK dressed acc={total_acc}")


@pytest.mark.parametrize("which", ["tj", "tj:cplx"])
def test_dressed_sweep_random_state(which):
    _subprocess_check("run_dressed_check", which)


# --------------------------------------------- 4./5. pair-corr walkers

def _paircorr_case(frame, cplx=False):
    model = tj_model(3.0, 1.0)
    if frame == "row":
        ly, lx = 2, 4
        cfgs = [np.array([[1, 2, 0, 0], [2, 1, 0, 0]]),
                np.array([[0, 0, 2, 1], [1, 2, 0, 0]]),
                np.array([[2, 0, 0, 1], [1, 2, 0, 0]])]
    else:
        ly, lx = 4, 2
        # NOTE: configs must carry EVEN total particle number — a
        # parity-even state has EXACTLY zero amplitude on odd-parity
        # configurations (|psi|^2 = 0: unsampleable, the estimator is
        # undefined there and the oracle divides by zero)
        cfgs = [np.array([[1, 0], [2, 0], [0, 2], [0, 1]]),
                np.array([[0, 1], [0, 2], [2, 0], [1, 0]]),
                np.array([[1, 2], [2, 1], [0, 2], [0, 1]])]
    D = 3
    space = space_for_model(model, D)
    tps = _random_even_state(29 if frame == "row" else 31, ly, lx,
                             model.phys_dim, D, space, cplx=cplx)
    return model, ly, lx, tps, space, cfgs


@pytest.mark.parametrize("cplx", [False, True], ids=["f64", "c128"])
@pytest.mark.parametrize("frame", ["row", "col"])
def test_paircorr_walker_random_state(frame, cplx):
    """Env-shared graded pair-corr walkers vs the independent
    exact-coefficient mode-algebra oracle on a random parity-even state —
    every entry compared, zeros included (a sign or env-selection bug that
    leaks weight into unsupported entries fails here too). f64 AND c128
    (reference two-type matrix)."""
    from peps_tpu.algorithm.measure_fermion import (
        tj_singlet_pair_corr_graded_colshared,
        tj_singlet_pair_corr_graded_rowshared)
    from peps_tpu.fermion.exact import exact_coefficients, snake_order
    from tests.test_pair_corr import _graded_pair_corr_oracle

    model, ly, lx, tps, space, cfgs = _paircorr_case(frame, cplx=cplx)
    c = np.asarray(exact_coefficients(tps, space.phys_parity,
                                      space.bond_parity))
    snake_pos = np.zeros((ly, lx), int)
    for p, (y, x) in enumerate(snake_order(ly, lx)):
        snake_pos[y, x] = p
    chi = 32
    tp = TruncParams(chi, 1, 0.0)
    nb = (lx if frame == "row" else ly) - 1
    nlines = ly if frame == "row" else lx
    checked = 0
    for cfg in cfgs:
        digits = tuple(int(cfg[y, x]) for (y, x) in snake_order(ly, lx))
        assert abs(c[digits]) > 1e-12 * np.abs(c).max(), \
            f"config has (near-)zero amplitude — pick a sampleable one: {cfg}"
        cj = jnp.asarray(cfg.astype(np.int32))
        if frame == "row":
            table = np.asarray(tj_singlet_pair_corr_graded_rowshared(
                tps, cj, space, chi, tp))
            def sites4(r, i, k):
                return ((r, i), (r, i + 1), (r, k), (r, k + 1))
        else:
            table = np.asarray(tj_singlet_pair_corr_graded_colshared(
                tps, cj, space, chi, tp))
            def sites4(r, i, k):
                return ((i, r), (i + 1, r), (k, r), (k + 1, r))
        for r in range(nlines):
            for i in range(nb):
                for k in range(nb):
                    if abs(i - k) <= 1:
                        continue
                    want = _graded_pair_corr_oracle(
                        c, cfg, sites4(r, i, k), snake_pos)
                    assert abs(table[r, i, k] - want) < 1e-6 * max(
                        1.0, abs(want)), (r, i, k, table[r, i, k], want)
                    if abs(want) > 1e-10:
                        checked += 1
    assert checked >= 2, "oracle trivially zero everywhere"


# ------------------------------------- 6. masked full-space Suwa-Todo (t-J)

@pytest.mark.slow
def test_suwa_todo_tj_mask_stationary_random_state():
    """Full-space Suwa-Todo restricted to the t-J particle-conservation
    mask: the empirical distribution on a random state must match the exact
    sector distribution, and no chain may ever leave the sector."""
    from peps_tpu.montecarlo.engine import ChainState, MonteCarloEngine
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.tps import exact_amplitude, random_tps

    ly, lx, d = 2, 2, 3
    tps = random_tps(jax.random.PRNGKey(37), ly, lx, d, 2,
                     dtype=jnp.float64, scale=0.8)
    n_up = np.array([0, 1, 0])
    n_dn = np.array([0, 0, 1])
    # mask: two-site transitions preserving (N_up, N_dn)
    m = np.zeros((d * d, d * d), int)
    for a, b, c2, e in itertools.product(range(d), repeat=4):
        if (n_up[a] + n_up[b] == n_up[c2] + n_up[e]
                and n_dn[a] + n_dn[b] == n_dn[c2] + n_dn[e]):
            m[a * d + b, c2 * d + e] = 1
    rule = UpdateRule("suwa_todo",
                      conserve_mask=tuple(map(tuple, m.tolist())))
    # sector: one up, one down, two holes
    sector = [np.array(cc).reshape(ly, lx)
              for cc in itertools.product(range(d), repeat=ly * lx)
              if n_up[list(cc)].sum() == 1 and n_dn[list(cc)].sum() == 1]
    probs = np.array([abs(exact_amplitude(np.asarray(tps), cc)) ** 2
                      for cc in sector])
    probs /= probs.sum()
    c0 = jnp.asarray(np.stack([sector[0]] * 24)).astype(jnp.int32)
    eng = MonteCarloEngine(tps, 8, TruncParams(8, 1, 0.0), rule,
                           ChainState(c0, jax.random.PRNGKey(41)))
    eng.warm_up(50)
    counts = np.zeros(len(sector))
    lookup = {tuple(cc.ravel()): i for i, cc in enumerate(sector)}
    for _ in range(400):
        eng.step_sweep()
        for cfg in np.asarray(eng.state.configs):
            kk = tuple(cfg.ravel())
            assert kk in lookup, f"left the sector: {kk}"
            counts[lookup[kk]] += 1
    emp = counts / counts.sum()
    assert np.max(np.abs(emp - probs)) < 0.025, (emp, probs)
