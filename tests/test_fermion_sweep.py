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


def test_shared_sweep_jastrow_dressed_matches_oracle():
    """Jastrow-dressed graded sweep: exchange ratios carry the density
    Jastrow factor via the carried field; the full-recompute oracle applies
    log J directly to the amplitudes (reference: the dressed t-J updater,
    square_nn_updater.h:380). Trajectories must agree bit-for-bit."""
    from peps_tpu.montecarlo.jastrow import JastrowDress
    model, ly, lx, D, occ0 = CASES[2]            # t-J 3x2 (odd rows)
    tps, space = _state(model, ly, lx, D, occ0)
    n = ly * lx
    rng = np.random.default_rng(5)
    v = rng.normal(size=(n, n)) * 0.3
    v = (v + v.T) / 2
    np.fill_diagonal(v, 0.0)
    nvals = np.array([float(model.n_up[i] + model.n_dn[i])
                      for i in range(model.phys_dim)])
    dress = JastrowDress(jnp.asarray(v), jnp.asarray(nvals))
    chi = 24
    tp = TruncParams(chi, 1, 0.0)
    cfg0 = jnp.asarray(occ0.astype(np.int32))
    agree = 0
    for seed in range(3):
        key = jax.random.PRNGKey(300 + seed)
        c_fast, _, st_fast = mc_sweep_fermion_shared(
            tps, space, cfg0, key, chi, tp, dress=dress)
        c_ref, _, st_ref = mc_sweep_fermion_oracle(
            tps, space, cfg0, key, chi, tp, dress=dress)
        assert np.array_equal(np.asarray(c_fast), np.asarray(c_ref)), seed
        assert int(st_fast.accepted) == int(st_ref.accepted)
        agree += int(st_fast.accepted)
        cfg0 = c_fast
    assert agree > 0


def test_graded_dressed_energy_matches_oracle():
    """Jastrow-dressed graded local energies: exact-sum energy of the
    dressed state equals the Rayleigh quotient of diag(e^J) |psi> on the
    sector (reference: square_nnn_energy_solver_jastrow_dressed.h)."""
    import itertools
    import tests.fermion_ed_oracle as FO
    from peps_tpu.fermion.exact import exact_coefficients, snake_order
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      local_energy_and_holes_graded)
    from peps_tpu.montecarlo.jastrow import JastrowDress
    from peps_tpu.algorithm.exact_sum import sector_configs

    model, ly, lx, D, occ0 = CASES[0]            # spinless 2x3
    tps, space = _state(model, ly, lx, D, occ0)
    n = ly * lx
    rng = np.random.default_rng(7)
    v = rng.normal(size=(n, n)) * 0.4
    v = (v + v.T) / 2
    np.fill_diagonal(v, 0.0)
    nvals = np.array([float(model.n_up[i]) for i in range(model.phys_dim)])
    dress = JastrowDress(jnp.asarray(v), jnp.asarray(nvals))
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    configs = jnp.asarray(sector_configs(ly, lx, {1: 2, 0: 4}))

    def one(cfg):
        return local_energy_and_holes_graded(tps, cfg, gm, chi, tp,
                                             with_holes=False, dress=dress)
    res = jax.vmap(one)(configs)
    logw = 2.0 * res.log_abs_psi
    w = jnp.where(res.psi_mant == 0, 0.0, jnp.exp(logw - jnp.max(logw)))
    e_got = float(jnp.sum(w * jnp.real(res.e_loc)) / jnp.sum(w))

    # oracle: dressed coefficient vector on the sector
    c = exact_coefficients(tps, space.phys_parity, space.bond_parity)
    seq = snake_order(ly, lx)
    perm = [seq.index((y, x)) for y in range(ly) for x in range(lx)]
    vv = np.transpose(np.asarray(c), perm).reshape(-1)
    H = FO.build_fermion_hamiltonian(model, ly, lx, order="snake").toarray()
    d = model.phys_dim
    idx, jfac = [], []
    for cfg in itertools.product(range(d), repeat=n):
        if sum(int(model.n_up[s]) for s in cfg) == 2:
            idx.append(int(np.ravel_multi_index(cfg, (d,) * n)))
            jfac.append(float(dress.log_factor(
                jnp.asarray(np.array(cfg).reshape(ly, lx)))))
    idx = np.array(idx)
    vj = vv[idx] * np.exp(np.array(jfac))
    Hs = H[np.ix_(idx, idx)]
    e_want = float(vj @ Hs @ vj) / float(vj @ vj)
    assert abs(e_got - e_want) < 1e-8, (e_got, e_want)


def _random_even_state(key_seed, ly, lx, d, D, space, cplx=False):
    """Random parity-even graded state — far from equilibrium, so
    Metropolis ratios span orders of magnitude (the SU states above are
    too tame to catch mis-rated bonds). cplx=True draws a complex128 state
    (the reference compiles every fermionic test double AND complex,
    tests/CMakeLists.txt:59-86 add_two_type_unittest — complex
    wavefunctions are the norm for frustrated/doped physics)."""
    from peps_tpu.fermion.graded import GT, project_even
    pp, pb = space.phys_parity, space.bond_parity
    rng = np.random.default_rng(key_seed)
    tps = rng.normal(size=(ly, lx, d, D, D, D, D))
    if cplx:
        tps = tps + 1j * rng.normal(size=tps.shape)
    for y in range(ly):
        for x in range(lx):
            g = GT(jnp.asarray(tps[y, x]), (pp, pb, pb, pb, pb),
                   (False, True, True, False, False))
            tps[y, x] = np.asarray(project_even(g).data)
    return jnp.asarray(tps)


def run_random_state_check(which: str) -> None:
    """Chained shared-vs-oracle trajectory check on a random state.

    Regression for the round-3 sampler bug (the h-kernel closed proposals
    against a flip-masked right env although an in-row exchange never
    changes the right prefix parity): on random states every
    parity-changing exchange got a wrong acceptance ratio and trajectories
    diverged from the full-recompute oracle within one sweep. Every
    decision must agree bit-for-bit AND real acceptances must occur.

    Called in a FRESH subprocess by the test below: in a warmed pytest
    process these executables segfault XLA:CPU both when loaded from the
    persistent cache (AOT deserializer) and when compiled fresh (LLVM JIT
    wear-out); a fresh no-cache process is reliable. See
    .claude/skills/verify/SKILL.md gotchas."""
    if which == "spinless":
        model, ly, lx, D = spinless_fermion(1.0, 0.5), 2, 3, 3
        occ0 = np.array([[0, 1, 0], [0, 0, 1]])
    else:
        model, ly, lx, D = tj_model(3.0, 1.0), 3, 2, 3
        occ0 = np.array([[1, 2], [0, 0], [2, 1]])
    space = space_for_model(model, D)
    tps = _random_even_state(7, ly, lx, model.phys_dim, D, space)
    chi = 24
    tp = TruncParams(chi, 1, 0.0)
    total_acc = 0
    for seed in range(3):
        cfg = jnp.asarray(occ0.astype(np.int32))
        key = jax.random.PRNGKey(500 + seed)
        for sweep in range(6):
            key, ks = jax.random.split(key)
            c_fast, _, st_fast = mc_sweep_fermion_shared(tps, space, cfg,
                                                         ks, chi, tp)
            c_ref, _, st_ref = mc_sweep_fermion_oracle(tps, space, cfg,
                                                       ks, chi, tp)
            assert np.array_equal(np.asarray(c_fast),
                                  np.asarray(c_ref)), (seed, sweep)
            assert int(st_fast.accepted) == int(st_ref.accepted), \
                (seed, sweep)
            cfg = c_fast
            total_acc += int(st_fast.accepted)
    assert total_acc > 10, total_acc   # ratios actually exercised
    print(f"RANDOM_STATE_OK {which} acc={total_acc}")


@pytest.mark.parametrize("which", ["spinless", "tj"])
def test_shared_sweep_matches_oracle_random_state(which):
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "jax.config.update('jax_enable_x64', True); "
            "import sys; sys.path.insert(0, %r); "
            "from tests.test_fermion_sweep import run_random_state_check; "
            "run_random_state_check(%r)" % (repo, which))
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert f"RANDOM_STATE_OK {which}" in r.stdout, r.stdout[-2000:]
