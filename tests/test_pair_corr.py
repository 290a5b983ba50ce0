"""t-J singlet pair correlator vs explicit second-quantized ED."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.measure_fermion import (tj_singlet_pair_corr_col,
                                                tj_singlet_pair_corr_row)
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import random_tps
from tests.ed_oracle import wavefunction_from_tps
from tests.fermion_ed_oracle import _apply_ops, _config_to_occ, _occ_to_config

N_UP = np.array([0, 1, 0])
N_DN = np.array([0, 0, 1])


def _pair_op_matrix(ly, lx, site_i, site_j, site_k, site_l):
    """Dense matrix of Delta^dag_{(i,j)} Delta_{(k,l)} in the d=3 basis
    (flat row-major site indices; (i,j) and (k,l) are the two bonds)."""
    d = 3
    n = ly * lx
    dim = d ** n
    mat = np.zeros((dim, dim))

    def mode(site, sp):
        return 2 * site + sp

    for cfg_t in itertools.product(range(d), repeat=n):
        cfg = np.array(cfg_t)
        occ = _config_to_occ(cfg.reshape(ly, lx), N_UP, N_DN, False)
        col = int(np.ravel_multi_index(cfg, (d,) * n))
        for sa, ca in ((0, 1.0), (1, -1.0)):       # Delta^dag channels
            for sb, cb in ((0, 1.0), (1, -1.0)):   # Delta channels
                ops = [("cdag", mode(site_j, 1 - sa)),
                       ("cdag", mode(site_i, sa)),
                       ("c", mode(site_k, sb)),
                       ("c", mode(site_l, 1 - sb))]
                r = _apply_ops(occ, ops)
                if r is None:
                    continue
                sgn, new_occ = r
                new_cfg = _occ_to_config(new_occ, d, N_UP, N_DN, False, n)
                if new_cfg is None:
                    continue
                row = int(np.ravel_multi_index(new_cfg, (d,) * n))
                mat[row, col] += 0.5 * ca * cb * sgn
    return mat


def test_pair_corr_matches_ed():
    ly, lx = 2, 4
    d = 3
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    tps = random_tps(jax.random.PRNGKey(3), ly, lx, d, 2,
                     dtype=jnp.float64, scale=0.8)
    psi = wavefunction_from_tps(np.asarray(tps))
    z = np.vdot(psi, psi)

    # estimator: sum_s |psi(s)|^2 O(s) / Z
    configs = np.array(list(itertools.product(range(d), repeat=ly * lx)),
                       dtype=np.int32).reshape(-1, ly, lx)

    def one(cfg):
        return tj_singlet_pair_corr_row(tps, cfg, chi, tp)

    tables = jax.lax.map(one, jnp.asarray(configs), batch_size=256)
    w = np.abs(psi) ** 2
    got = np.einsum("s,syik->yik", w, np.asarray(tables)) / z

    # (0,2) = upper triangle (pair left of holes); (2,0) = the added
    # reversed orientation (pair right of holes, lower triangle)
    for y in range(ly):
        for (i, k) in [(0, 2), (2, 0)]:
            op = _pair_op_matrix(ly, lx, y * lx + i, y * lx + i + 1,
                                 y * lx + k, y * lx + k + 1)
            want = float(np.real(psi @ op @ psi) / z)
            assert abs(got[y, i, k] - want) < 1e-8 * max(1.0, abs(want)), \
                (y, i, k, got[y, i, k], want)
            assert abs(want) > 1e-12, "trivially-zero oracle"


def _graded_pair_corr_oracle(c, config, sites4, snake_pos):
    """O(s) for one bond pair on a graded state: independent oracle using
    the exact snake-order coefficient tensor + numpy mode algebra."""
    (y1, x1), (y2, x2), (y3, x3), (y4, x4) = sites4
    ly, lx = config.shape
    from peps_tpu.fermion.exact import snake_order
    seq = snake_order(ly, lx)

    def mode(y, x, sp):
        return 2 * snake_pos[y, x] + sp

    c_i, c_j = config[y1, x1], config[y2, x2]
    if (c_i, c_j) == (1, 2):
        sa, ca = 0, 1.0
    elif (c_i, c_j) == (2, 1):
        sa, ca = 1, -1.0
    else:
        return 0.0
    if config[y3, x3] != 0 or config[y4, x4] != 0:
        return 0.0
    digits = tuple(int(config[y, x]) for (y, x) in seq)
    amp_s = complex(c[digits]) if np.iscomplexobj(c) else float(c[digits])
    total = 0.0
    for sb, cb, s1, s2 in ((0, 1.0, 1, 2), (1, -1.0, 2, 1)):
        cfg_p = np.array(config)
        cfg_p[y1, x1] = 0
        cfg_p[y2, x2] = 0
        cfg_p[y3, x3] = s1
        cfg_p[y4, x4] = s2
        occ_p = _config_to_occ(cfg_p, N_UP, N_DN, False, order="snake")
        ops = [("cdag", mode(y2, x2, 1 - sa)),
               ("cdag", mode(y1, x1, sa)),
               ("c", mode(y3, x3, sb)),
               ("c", mode(y4, x4, 1 - sb))]
        r = _apply_ops(occ_p, ops)
        if r is None:
            continue
        sgn, occ_out = r
        digits_p = tuple(int(cfg_p[y, x]) for (y, x) in seq)
        amp_p = (complex(c[digits_p]) if np.iscomplexobj(c)
                 else float(c[digits_p]))
        total += 0.5 * ca * cb * sgn * amp_p / amp_s
    return total


def test_pair_corr_graded_matches_exact():
    """Graded-state pair correlator per-sample values vs the exact
    snake-order coefficient tensor (the graded amplitude DEFINITION)."""
    from peps_tpu.algorithm.measure_fermion import tj_singlet_pair_corr_graded
    from peps_tpu.fermion.exact import exact_coefficients, snake_order
    from peps_tpu.models.fermion import tj_model
    from tests.test_fermion_vmc import su_state

    model = tj_model(t=3.0, j=1.0)
    chi = 16
    tp = TruncParams(chi, 1, 0.0)

    # --- row frame on 2x4 ---
    ly, lx = 2, 4
    occ0 = np.array([[1, 2, 0, 0], [2, 1, 0, 0]])
    tps, space = su_state(model, ly, lx, 4, occ0, sched=((40, 0.15),))
    c = np.asarray(exact_coefficients(tps, space.phys_parity,
                                      space.bond_parity))
    snake_pos = np.zeros((ly, lx), int)
    for p, (y, x) in enumerate(snake_order(ly, lx)):
        snake_pos[y, x] = p
    cfgs = [np.array([[1, 2, 0, 0], [2, 1, 0, 0]]),
            np.array([[2, 1, 0, 0], [1, 0, 2, 0]]),
            np.array([[0, 1, 2, 0], [1, 2, 0, 0]])]
    checked = 0
    for cfg in cfgs:
        table = np.asarray(tj_singlet_pair_corr_graded(
            tps, jnp.asarray(cfg), space, chi, tp, "row"))
        for y in range(ly):
            for i in range(lx - 1):
                for k in range(lx - 1):
                    if abs(i - k) <= 1:
                        continue
                    want = _graded_pair_corr_oracle(
                        c, cfg, ((y, i), (y, i + 1), (y, k), (y, k + 1)),
                        snake_pos)
                    assert abs(table[y, i, k] - want) < 1e-7 * max(
                        1.0, abs(want)), (y, i, k, table[y, i, k], want)
                    if abs(want) > 1e-10:
                        checked += 1
    assert checked >= 2, "oracle trivially zero everywhere"

    # --- col frame on 4x2 ---
    ly, lx = 4, 2
    occ0 = np.array([[1, 0], [2, 0], [2, 0], [1, 0]])
    tps, space = su_state(model, ly, lx, 4, occ0, sched=((40, 0.15),))
    c = np.asarray(exact_coefficients(tps, space.phys_parity,
                                      space.bond_parity))
    snake_pos = np.zeros((ly, lx), int)
    for p, (y, x) in enumerate(snake_order(ly, lx)):
        snake_pos[y, x] = p
    cfgs = [np.array([[1, 0], [2, 0], [0, 2], [0, 1]]),
            np.array([[2, 0], [1, 0], [0, 1], [0, 2]])]
    checked = 0
    for cfg in cfgs:
        table = np.asarray(tj_singlet_pair_corr_graded(
            tps, jnp.asarray(cfg), space, chi, tp, "col"))
        for x in range(lx):
            for i in range(ly - 1):
                for k in range(ly - 1):
                    if abs(i - k) <= 1:
                        continue
                    want = _graded_pair_corr_oracle(
                        c, cfg, ((i, x), (i + 1, x), (k, x), (k + 1, x)),
                        snake_pos)
                    assert abs(table[x, i, k] - want) < 1e-7 * max(
                        1.0, abs(want)), (x, i, k, table[x, i, k], want)
                    if abs(want) > 1e-10:
                        checked += 1
    assert checked >= 1, "oracle trivially zero everywhere"


def test_graded_measure_pair_corr_wiring():
    """measure() on a graded t-J state with measure_pair_corr=True exposes
    finite pair_corr_row/col statistics (end-to-end registry wiring)."""
    from peps_tpu.algorithm.measure import MeasurementParams, measure
    from peps_tpu.fermion.vmc import GradedFermionModel
    from peps_tpu.models.fermion import tj_model
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule
    from tests.test_fermion_vmc import su_state

    model = tj_model(t=3.0, j=1.0)
    ly, lx, chi = 2, 4, 8
    occ0 = np.array([[1, 2, 0, 0], [2, 1, 0, 0]])
    tps, space = su_state(model, ly, lx, 3, occ0, sched=((30, 0.2),))
    gm = GradedFermionModel.from_model(model, space, tps.dtype)
    cfgs = init_configs_occupancy(jax.random.PRNGKey(0), 4, ly, lx,
                                  {0: 4, 1: 2, 2: 2})
    mp = MeasurementParams(num_samples=3, num_warmup_sweeps=3, nchains=4,
                           measure_pair_corr=True)
    m = measure(tps, gm, mp, chi, TruncParams(chi, 1, 0.0),
                UpdateRule("exchange"), cfgs, jax.random.PRNGKey(1))
    assert "pair_corr_row" in m.stats and "pair_corr_col" in m.stats
    pr = np.asarray(m.stats["pair_corr_row"][0])
    assert pr.shape == (ly, lx - 1, lx - 1)
    assert np.all(np.isfinite(pr))


def test_pair_corr_col_matches_ed():
    """Vertical-bond pairs in one column (transposed-frame walker) vs ED."""
    ly, lx = 4, 2
    d = 3
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    tps = random_tps(jax.random.PRNGKey(5), ly, lx, d, 2,
                     dtype=jnp.float64, scale=0.8)
    psi = wavefunction_from_tps(np.asarray(tps))
    z = np.vdot(psi, psi)
    configs = np.array(list(itertools.product(range(d), repeat=ly * lx)),
                       dtype=np.int32).reshape(-1, ly, lx)

    def one(cfg):
        return tj_singlet_pair_corr_col(tps, cfg, chi, tp)

    tables = jax.lax.map(one, jnp.asarray(configs), batch_size=256)
    w = np.abs(psi) ** 2
    got = np.einsum("s,sxik->xik", w, np.asarray(tables)) / z

    for x in range(lx):
        for (i, k) in [(0, 2), (2, 0)]:
            op = _pair_op_matrix(ly, lx, i * lx + x, (i + 1) * lx + x,
                                 k * lx + x, (k + 1) * lx + x)
            want = float(np.real(psi @ op @ psi) / z)
            assert abs(got[x, i, k] - want) < 1e-8 * max(1.0, abs(want)), \
                (x, i, k, got[x, i, k], want)
            assert abs(want) > 1e-12, "trivially-zero oracle"


@pytest.mark.fast
def test_graded_pair_corr_rowshared_matches_full_recompute():
    """The env-shared graded pair-corr walker equals the full-recompute
    graded estimator entry for entry (the full-recompute path is itself
    ED-validated)."""
    from peps_tpu.algorithm.measure_fermion import (
        tj_singlet_pair_corr_graded, tj_singlet_pair_corr_graded_rowshared)
    from peps_tpu.fermion.peps import (fermion_simple_update,
                                       product_fermion_peps,
                                       space_for_model, to_tps_fermion)
    from peps_tpu.models.fermion import tj_model
    from peps_tpu.peps import SimpleUpdateParams

    model = tj_model(3.0, 1.0)
    ly, lx, D = 3, 4, 4
    occ0 = np.array([[1, 2, 0, 0], [2, 1, 1, 2], [0, 0, 2, 1]])
    space = space_for_model(model, D)
    peps = product_fermion_peps(ly, lx, space, occ0)
    out = fermion_simple_update(
        peps, model, space,
        SimpleUpdateParams(steps=40, tau=0.2,
                           trunc=TruncParams(D, 1, 1e-12)))
    tps = to_tps_fermion(out.peps)
    tps = tps / jnp.max(jnp.abs(tps))
    chi = 24
    tp = TruncParams(chi, 1, 0.0)
    checked = 0
    for cfg in (occ0, occ0[::-1], np.roll(occ0, 1, axis=1)):
        c = jnp.asarray(cfg.astype(np.int32))
        ref = np.asarray(tj_singlet_pair_corr_graded(tps, c, space, chi,
                                                     tp, "row"))
        got = np.asarray(tj_singlet_pair_corr_graded_rowshared(
            tps, c, space, chi, tp))
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)
        checked += int(np.sum(np.abs(ref) > 1e-12))
    assert checked > 0   # nonzero entries were actually compared


def test_graded_pair_corr_shared_bundle_equivalence():
    """Passing a precomputed GradedEnvShared bundle (the measurement
    executor's per-config env pass) must give bit-identical walker outputs
    to the walkers building their own resources — BOTH frames share ONE
    bundle (the measure() env-pass contract)."""
    from peps_tpu.algorithm.measure_fermion import (
        graded_env_shared, tj_singlet_pair_corr_graded_colshared,
        tj_singlet_pair_corr_graded_rowshared)
    from peps_tpu.models.fermion import tj_model
    from tests.test_fermion_vmc import su_state

    model = tj_model(3.0, 1.0)
    ly, lx, D = 3, 3, 4
    occ0 = np.array([[1, 2, 0], [2, 1, 0], [0, 1, 2]])
    tps, space = su_state(model, ly, lx, D, occ0, sched=((30, 0.2),))
    tps = tps / jnp.max(jnp.abs(tps))
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    c = jnp.asarray(occ0.astype(np.int32))
    bundle = graded_env_shared(tps, c, space, chi, tp)
    for fn in (tj_singlet_pair_corr_graded_rowshared,
               tj_singlet_pair_corr_graded_colshared):
        own = np.asarray(fn(tps, c, space, chi, tp))
        shared = np.asarray(fn(tps, c, space, chi, tp, shared=bundle))
        np.testing.assert_array_equal(own, shared)


def test_exact_sum_pair_corr_graded_matches_ed():
    """exact_sum_pair_corr_graded (sector-weighted walker tables) vs an
    independent second-quantized oracle: the exact snake-order coefficient
    vector with Delta^dag Delta matrix elements from explicit mode algebra."""
    from peps_tpu.algorithm.exact_measure import exact_sum_pair_corr_graded
    from peps_tpu.algorithm.exact_sum import sector_configs
    from peps_tpu.fermion.exact import exact_coefficients, snake_order
    from peps_tpu.models.fermion import tj_model
    from tests.test_fermion_vmc import su_state

    model = tj_model(t=3.0, j=1.0)
    ly, lx = 2, 4
    occ0 = np.array([[1, 2, 1, 0], [2, 1, 2, 0]])   # 3 up, 3 dn, 2 holes
    tps, space = su_state(model, ly, lx, 4, occ0, sched=((40, 0.15),))
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    configs = sector_configs(ly, lx, {0: 2, 1: 3, 2: 3})

    got, z = exact_sum_pair_corr_graded(tps, jnp.asarray(configs), space,
                                        chi, tp, frames=("row",))
    assert z > 0

    # oracle: psi over the sector from the exact snake-order coefficient
    # tensor; <psi|Delta^dag_a Delta_b|psi> by explicit mode algebra in the
    # same snake order.
    c = np.asarray(exact_coefficients(tps, space.phys_parity,
                                      space.bond_parity))
    seq = snake_order(ly, lx)
    snake_pos = np.zeros((ly, lx), int)
    for p, (y, x) in enumerate(seq):
        snake_pos[y, x] = p
    digits = [tuple(int(cfg[y, x]) for (y, x) in seq) for cfg in configs]
    v = np.array([c[dgt] for dgt in digits])
    index_of = {dgt: n for n, dgt in enumerate(digits)}
    norm = float(v @ v)
    assert norm > 0

    def mode(y, x, sp):
        return 2 * snake_pos[y, x] + sp

    checked = 0
    for y in range(ly):
        for (i, k) in [(0, 2), (2, 0)]:
            sites4 = ((y, i), (y, i + 1), (y, k), (y, k + 1))
            (y1, x1), (y2, x2), (y3, x3), (y4, x4) = sites4
            acc = 0.0
            for n, cfg in enumerate(configs):
                occ = _config_to_occ(np.asarray(cfg), N_UP, N_DN, False,
                                     order="snake")
                for sa, ca in ((0, 1.0), (1, -1.0)):
                    for sb, cb in ((0, 1.0), (1, -1.0)):
                        ops = [("cdag", mode(y2, x2, 1 - sa)),
                               ("cdag", mode(y1, x1, sa)),
                               ("c", mode(y3, x3, sb)),
                               ("c", mode(y4, x4, 1 - sb))]
                        r = _apply_ops(occ, ops)
                        if r is None:
                            continue
                        sgn, occ_p = r
                        states = []
                        ok = True
                        for m in range(ly * lx):
                            key = (int(occ_p[2 * m]), int(occ_p[2 * m + 1]))
                            s = {(0, 0): 0, (1, 0): 1, (0, 1): 2}.get(key)
                            if s is None:
                                ok = False
                                break
                            states.append(s)
                        if not ok:
                            continue
                        np_row = index_of.get(tuple(states))
                        if np_row is None:
                            continue
                        acc += 0.5 * ca * cb * sgn * v[np_row] * v[n]
            want = acc / norm
            assert abs(got["row"][y, i, k] - want) < 1e-7 * max(
                1.0, abs(want)), (y, i, k, got["row"][y, i, k], want)
            if abs(want) > 1e-10:
                checked += 1
    assert checked >= 2, "oracle trivially zero almost everywhere"


def test_graded_pair_corr_colshared_matches_full_recompute():
    """The env-shared COLUMN-frame graded walker (excited-BMPS propagation)
    equals the full-recompute graded estimator entry for entry (the
    full-recompute path is itself ED-validated above)."""
    from peps_tpu.algorithm.measure_fermion import (
        tj_singlet_pair_corr_graded, tj_singlet_pair_corr_graded_colshared)
    from peps_tpu.models.fermion import tj_model
    from tests.test_fermion_vmc import su_state

    model = tj_model(3.0, 1.0)
    ly, lx, D = 4, 3, 4
    occ0 = np.array([[1, 2, 0], [2, 1, 0], [0, 1, 2], [0, 2, 1]])
    tps, space = su_state(model, ly, lx, D, occ0, sched=((40, 0.2),))
    tps = tps / jnp.max(jnp.abs(tps))
    chi = 24
    tp = TruncParams(chi, 1, 0.0)
    checked = 0
    for cfg in (occ0,
                np.array([[1, 0, 2], [2, 0, 1], [0, 1, 2], [0, 2, 1]]),
                np.array([[2, 1, 0], [1, 2, 0], [0, 1, 2], [0, 2, 1]])):
        c = jnp.asarray(cfg.astype(np.int32))
        ref = np.asarray(tj_singlet_pair_corr_graded(tps, c, space, chi,
                                                     tp, "col"))
        got = np.asarray(tj_singlet_pair_corr_graded_colshared(
            tps, c, space, chi, tp))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-8)
        checked += int(np.sum(np.abs(ref) > 1e-12))
    assert checked > 0   # nonzero entries were actually compared


def test_conditioned_pair_corr_matches_exact_sum():
    """Support-conditioned <Delta^dag Delta> (VERDICT r4 #3): hard
    Chebyshev-adjacency conditioning via the hole-attraction dress
    (kappa=50, diagonal=True) samples |psi|^2 restricted to the bound-pair
    sector with ordinary sweep moves; C = P(A) * E[table|A] must match the
    exact sector sum, and the counting estimator of P(A) from an
    unconditioned run must agree with the exact P(A)."""
    from peps_tpu.algorithm.exact_measure import exact_sum_pair_corr_graded
    from peps_tpu.algorithm.exact_sum import sector_configs
    from peps_tpu.algorithm.measure_fermion import (
        tj_singlet_pair_corr_graded_rowshared)
    from peps_tpu.fermion.peps import space_for_model
    from peps_tpu.fermion.sweep import mc_sweep_fermion_shared
    from peps_tpu.fermion.vmc import log_abs_psi_fermion
    from peps_tpu.models.fermion import tj_model
    from peps_tpu.montecarlo.jastrow import (hole_attraction_dress,
                                             holes_adjacent)
    from peps_tpu.montecarlo.statistics import mean_and_binned_error_batch
    from tests.test_fermion_vmc import su_state

    model = tj_model(3.0, 1.0)
    ly, lx, D = 2, 4, 3
    occ0 = np.array([[1, 2, 1, 0], [2, 1, 2, 0]])
    tps, space = su_state(model, ly, lx, D, occ0,
                          sched=((80, 0.2), (80, 0.05)))
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    hole_vals = [1.0, 0.0, 0.0]

    # exact references: sector table and P(A_fat)
    cfg_all = np.asarray(sector_configs(ly, lx, {1: 3, 2: 3, 0: 2}))
    exact, _ = exact_sum_pair_corr_graded(tps, jnp.asarray(cfg_all), space,
                                          chi, tp, frames=("row",))
    ex = exact["row"]
    amp = jax.jit(lambda c: log_abs_psi_fermion(tps, c, space, chi, tp))
    la_m = [amp(jnp.asarray(c)) for c in cfg_all]
    la = np.array([float(x[0]) for x in la_m])
    alive = np.array([float(np.asarray(x[1]) != 0) for x in la_m]) > 0
    w = np.where(alive, np.exp(2 * (la - la[alive].max())), 0.0)
    in_a = np.array([
        float(holes_adjacent(jnp.asarray(c), jnp.asarray(hole_vals)))
        for c in cfg_all]) > 0.5
    pa_exact = float(w[in_a].sum() / w.sum())

    hard = hole_attraction_dress(hole_vals, ly, lx, 50.0, diagonal=True)
    nch, warm, ns = 8, 40, 200
    occ_a = np.array([[1, 2, 1, 2], [2, 1, 0, 0]])   # start in A

    @jax.jit
    def step_cond(cfgs, k):
        ks = jax.random.split(k, nch + 1)
        cfgs, _, _ = jax.vmap(
            lambda c, kk: mc_sweep_fermion_shared(
                tps, space, c, kk, chi, tp, dress=hard))(cfgs, ks[1:])
        return cfgs, ks[0]

    @jax.jit
    def tables(cfgs):
        return jax.vmap(lambda c: tj_singlet_pair_corr_graded_rowshared(
            tps, c, space, chi, tp))(cfgs)

    cfgs = jnp.asarray(np.stack([occ_a] * nch)).astype(jnp.int32)
    k = jax.random.PRNGKey(11)
    tabs = []
    for i in range(warm + ns):
        cfgs, k = step_cond(cfgs, k)
        if i >= warm:
            tabs.append(np.asarray(tables(cfgs)))
            # invariant: the hard dress never lets a chain unbind
            for c in np.asarray(cfgs):
                assert float(holes_adjacent(jnp.asarray(c),
                                            jnp.asarray(hole_vals))) > 0.5
    tabs = np.stack(tabs)
    s, c = tabs.shape[:2]
    m, e = mean_and_binned_error_batch(tabs.reshape(s, c, -1))
    m = np.asarray(m).reshape(ly, lx - 1, lx - 1) * pa_exact
    e = np.asarray(e).reshape(ly, lx - 1, lx - 1) * pa_exact

    # the well-sampled orientation must reproduce the exact entry; its
    # hermitian partner (pair left of the holes' favoured region) is
    # covered by C(i,k) = C(k,i) in the aggregation
    assert abs(m[0, 0, 2] - ex[0, 0, 2]) < 5 * e[0, 0, 2] \
        + 0.1 * abs(ex[0, 0, 2]), (m[0, 0, 2], e[0, 0, 2], ex[0, 0, 2])
    assert e[0, 0, 2] < 0.5 * abs(ex[0, 0, 2])   # actually resolved

    # counting estimator of P(A) from an UNCONDITIONED run
    @jax.jit
    def step_plain(cfgs, k):
        ks = jax.random.split(k, nch + 1)
        cfgs, _, _ = jax.vmap(
            lambda c, kk: mc_sweep_fermion_shared(
                tps, space, c, kk, chi, tp))(cfgs, ks[1:])
        ind = jax.vmap(lambda c: holes_adjacent(
            c, jnp.asarray(hole_vals)))(cfgs)
        return cfgs, ks[0], ind

    cfgs = jnp.asarray(np.stack([occ0] * nch)).astype(jnp.int32)
    k = jax.random.PRNGKey(13)
    inds = []
    for i in range(warm + ns):
        cfgs, k, ind = step_plain(cfgs, k)
        if i >= warm:
            inds.append(np.asarray(ind))
    inds = np.stack(inds)[:, :, None]
    pa_mc, pa_err = mean_and_binned_error_batch(inds)
    assert abs(float(pa_mc[0]) - pa_exact) < 5 * float(pa_err[0]) + 0.05, \
        (float(pa_mc[0]), float(pa_err[0]), pa_exact)
