"""QR-reduced graded pair projection == full-theta SVD path.

The reduced kernel (reference's QR-QR-gate-SVD,
square_lattice_peps_projection_impl.h:104-122) must reproduce the full
path's singular spectrum exactly and the same physical state (gauge
differences on virtual bonds cancel in the coefficients)."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.fermion.graded import GT, parity_mask, sector_lq, sector_qr
from peps_tpu.fermion.peps import (_pair_kernel_h, _pair_kernel_h_qr,
                                   _pair_kernel_v, _pair_kernel_v_qr,
                                   _reduced_layout, _reduced_qr_masks,
                                   fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion, u1_charges_for)
from peps_tpu.fermion.exact import exact_coefficients, snake_order
from peps_tpu.linalg import TruncParams
from peps_tpu.models.fermion import spinless_fermion, tj_model
from peps_tpu.peps import SimpleUpdateParams


def _coeffs(peps, space, ly, lx):
    c = exact_coefficients(to_tps_fermion(peps), space.phys_parity,
                           space.bond_parity)
    seq = snake_order(ly, lx)
    perm = [seq.index((y, x)) for y in range(ly) for x in range(lx)]
    return np.transpose(c, perm).reshape(-1)


def _rand_even_site(key, space):
    d = len(space.phys_parity)
    D = space.bond_dim
    pb = space.bond_parity
    t = jax.random.normal(key, (d, D, D, D, D))
    g = GT(t, (space.phys_parity, pb, pb, pb, pb),
           (False, True, True, False, False))
    return t * jnp.asarray(parity_mask(g), t.dtype)


@pytest.mark.fast
def test_sector_qr_lq_reconstruct():
    key = jax.random.PRNGKey(0)
    R, C = 27, 12
    pr = np.array([0, 1] * 13 + [0])
    pc = np.array([0, 0, 1, 1] * 3)
    m = jax.random.normal(key, (R, C))
    # parity-even support only
    m = m * jnp.asarray((pr[:, None] + pc[None, :]) % 2 == 0, m.dtype)
    cols = tuple(tuple(np.where(pc == t)[0].tolist()) for t in (0, 1))
    rmask = np.stack([(pr == 0), (pr == 1)]).astype(np.float64)
    q, r = sector_qr(m, cols, jnp.asarray(rmask))
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(m), atol=1e-6)
    rows = tuple(tuple(np.where(pr == t)[0].tolist()) for t in (0, 1))
    cmask = np.stack([(pc == 0), (pc == 1)]).astype(np.float64)
    ml = m.T  # [C, R]: rows pc, cols pr
    l, ql = sector_lq(ml, rows_cmask := tuple(
        tuple(np.where(pc == t)[0].tolist()) for t in (0, 1)),
        jnp.asarray(np.stack([(pr == 0), (pr == 1)]).astype(np.float64)))
    np.testing.assert_allclose(np.asarray(l @ ql), np.asarray(ml), atol=1e-6)


@pytest.mark.fast
@pytest.mark.parametrize("orient", ["h", "v"])
def test_reduced_kernel_matches_full_z2(orient):
    model = spinless_fermion(1.0, 0.5)
    space = space_for_model(model, 4)
    d, D = len(space.phys_parity), space.bond_dim
    keys = jax.random.split(jax.random.PRNGKey(7), 10)
    a = _rand_even_site(keys[0], space)
    b = _rand_even_site(keys[1], space)
    lams = [jnp.abs(jax.random.normal(k, (D,))) + 0.3 for k in keys[2:9]]
    gate = jax.random.normal(keys[9], (d, d, d, d)) * 0.1 \
        + jnp.eye(d * d).reshape(d, d, d, d)
    h_bond = jnp.zeros((d, d, d, d))
    layout = _reduced_layout(space, None)
    qr_rm, lq_cm = _reduced_qr_masks(layout, None, orient, 2, 2)
    full = _pair_kernel_h if orient == "h" else _pair_kernel_v
    red = _pair_kernel_h_qr if orient == "h" else _pair_kernel_v_qr
    ga1, gb1, lam1, be1, te1, ln1 = full(a, b, *lams[:6], lams[6], gate,
                                         h_bond, space)
    ga2, gb2, lam2, be2, te2, ln2 = red(a, b, *lams[:6], lams[6], gate,
                                        h_bond, jnp.asarray(qr_rm),
                                        jnp.asarray(lq_cm), space, layout)
    np.testing.assert_allclose(np.asarray(lam1), np.asarray(lam2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(be1), float(be2), rtol=1e-4)
    np.testing.assert_allclose(float(ln1), float(ln2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(te1), float(te2), rtol=1e-3, atol=1e-6)


@pytest.mark.fast
def test_su_z2_qr_reduce_same_state():
    model = spinless_fermion(1.0, 0.5)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 0, 0], [0, 0, 1]])
    space = space_for_model(model, D)
    vs = []
    for qr in (False, True):
        peps = product_fermion_peps(ly, lx, space, occ0)
        out = fermion_simple_update(
            peps, model, space,
            SimpleUpdateParams(steps=80, tau=0.1,
                               trunc=TruncParams(D, 1, 1e-12)),
            qr_reduce=qr)
        v = _coeffs(out.peps, space, ly, lx)
        vs.append(v / np.linalg.norm(v))
    ov = abs(float(vs[0] @ vs[1]))
    assert ov > 1 - 1e-6, ov


@pytest.mark.fast
def test_su_u1_qr_reduce_same_state_and_zero_leakage():
    model = tj_model(3.0, 1.0)
    ly, lx, D = 2, 3, 4
    occ0 = np.array([[1, 2, 0], [2, 1, 0]])
    space = space_for_model(model, D)
    charges = u1_charges_for(model, space, occ0)
    n0 = sum(int(model.n_up[occ0[y, x]] + model.n_dn[occ0[y, x]])
             for y in range(ly) for x in range(lx))
    vs = []
    for qr in (False, True):
        peps = product_fermion_peps(ly, lx, space, occ0)
        out = fermion_simple_update(
            peps, model, space,
            SimpleUpdateParams(steps=80, tau=0.1,
                               trunc=TruncParams(D, 1, 1e-12)),
            charges=charges, qr_reduce=qr)
        v = _coeffs(out.peps, space, ly, lx)
        vs.append(v / np.linalg.norm(v))
    ov = abs(float(vs[0] @ vs[1]))
    assert ov > 1 - 1e-6, ov
    # exact U(1) conservation on the reduced path
    d = model.phys_dim
    w_out = 0.0
    for i, cfg in enumerate(itertools.product(range(d), repeat=ly * lx)):
        n = sum(int(model.n_up[s] + model.n_dn[s]) for s in cfg)
        if n != n0:
            w_out += float(abs(vs[1][i]) ** 2)
    assert w_out < 1e-12, w_out
