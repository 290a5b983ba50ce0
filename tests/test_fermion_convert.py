"""The fermionic fast path: <S|psi> of a graded TPS equals the PLAIN
bosonic contraction of the dressed projection (fermion_project), verified
against the canonical graded contraction (exact.exact_coefficients).

Also documents the central no-go this design answers: a per-site dressing
in the leg parities alone does NOT exist (the amplitude's GF(2) sign form
has irreducible cross-row-gap quadratic terms — the 2D Jordan-Wigner
obstruction); locality is restored only by the snake prefix-parity terms
that fermion_project carries.
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.fermion.convert import fermion_project
from peps_tpu.fermion.exact import exact_coefficients, snake_order
from peps_tpu.fermion.graded import GT, project_even
from peps_tpu.fermion.peps import space_for_model
from peps_tpu.models.fermion import hubbard, spinless_fermion, tj_model

pytestmark = pytest.mark.fast


def contract_net(net):
    """Exact bosonic contraction of [Ly,Lx,D,D,D,D] (u,l,d,r), boundary
    legs sliced to slot 0."""
    ly, lx = net.shape[0], net.shape[1]
    names = {}
    cnt = [0]

    def nm(kind, y, x):
        key = (kind, y, x)
        if key not in names:
            names[key] = cnt[0]
            cnt[0] += 1
        return names[key]

    operands = []
    for y in range(ly):
        for x in range(lx):
            t = np.asarray(net[y, x])
            if y == 0:
                t = t[0:1]
            if x == 0:
                t = t[:, 0:1]
            if y == ly - 1:
                t = t[:, :, 0:1]
            if x == lx - 1:
                t = t[:, :, :, 0:1]
            operands.append(t)
            operands.append([nm("v", y, x), nm("h", y, x),
                             nm("v", y + 1, x), nm("h", y, x + 1)])
    return complex(np.einsum(*operands, optimize="greedy").item()).real


def random_graded_tps(model, ly, lx, D, seed):
    space = space_for_model(model, D)
    pp, pb = space.phys_parity, space.bond_parity
    d = model.phys_dim
    rng = np.random.default_rng(seed)
    tps = rng.normal(size=(ly, lx, d, D, D, D, D))
    for y in range(ly):
        for x in range(lx):
            t = GT(jnp.asarray(tps[y, x]), (pp, pb, pb, pb, pb),
                   (False, True, True, False, False))
            tps[y, x] = np.asarray(project_even(t).data)
    return jnp.asarray(tps), space


def check_model(model, ly, lx, D, seed, max_cfg=200):
    tps, space = random_graded_tps(model, ly, lx, D, seed)
    pp, pb = space.phys_parity, space.bond_parity
    c = exact_coefficients(tps, pp, pb)
    order = snake_order(ly, lx)
    d = model.phys_dim
    cfgs = list(itertools.product(range(d), repeat=ly * lx))
    if len(cfgs) > max_cfg:
        rng = np.random.default_rng(seed)
        cfgs = [cfgs[i] for i in rng.choice(len(cfgs), max_cfg,
                                            replace=False)]
    scale = float(np.abs(np.asarray(c)).max())
    for cfg_t in cfgs:
        cfg = np.array(cfg_t).reshape(ly, lx)
        net = fermion_project(tps, jnp.asarray(cfg), space)
        a = contract_net(net)
        ex = float(c[tuple(cfg[y][x] for (y, x) in order)])
        assert abs(a - ex) < 1e-10 * max(scale, 1.0), (cfg, a, ex)


def test_spinless_projection_matches_exact():
    check_model(spinless_fermion(1.0, 0.5), 2, 3, 4, seed=0)


def test_spinless_3x3_projection_matches_exact():
    check_model(spinless_fermion(1.0), 3, 3, 2, seed=1)


@pytest.mark.smoke
def test_tj_projection_matches_exact():
    check_model(tj_model(3.0, 1.0), 2, 3, 4, seed=2, max_cfg=150)


def test_hubbard_projection_matches_exact():
    check_model(hubbard(1.0, 4.0), 2, 2, 4, seed=3, max_cfg=150)


def test_projection_is_jittable_and_batched():
    model = spinless_fermion(1.0)
    tps, space = random_graded_tps(model, 2, 3, 4, seed=4)
    cfgs = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, size=(8, 2, 3)))
    f = jax.jit(jax.vmap(lambda c: fermion_project(tps, c, space)))
    out = f(cfgs)
    assert out.shape == (8, 2, 3, 4, 4, 4, 4)
    for k in range(8):
        ref = fermion_project(tps, cfgs[k], space)
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref),
                                   atol=1e-12)
