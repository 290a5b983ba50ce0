"""Z2-graded tensor core: Koszul-sign coherence, contraction schedule
independence, blockwise SVD/QR. These pin down the algebra the fermionic
simple update and the graded->dense TPS conversion build on (reference
counterpart: qlten's graded tensor ops)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.fermion.graded import (GT, even_parity, fuse, gconj, gcontract,
                                     graded_qr, graded_svd_truncated,
                                     gtranspose, parity_mask, project_even,
                                     split_parity)

pytestmark = pytest.mark.fast


def rand_gt(key, shape, parities, duals, even=True):
    data = jax.random.normal(key, shape, dtype=jnp.float64)
    t = GT(data, parities, duals)
    return project_even(t) if even else t


def test_gtranspose_composition_and_inverse():
    key = jax.random.PRNGKey(0)
    p = (split_parity(1, 2), split_parity(2, 2), (0, 1), split_parity(1, 1))
    t = rand_gt(key, (3, 4, 2, 2), p, (False, True, False, True), even=False)
    perm1 = (2, 0, 3, 1)
    perm2 = (1, 3, 0, 2)
    a = gtranspose(gtranspose(t, perm1), perm2)
    comp = tuple(perm1[i] for i in perm2)
    b = gtranspose(t, comp)
    np.testing.assert_allclose(np.asarray(a.data), np.asarray(b.data),
                               atol=1e-14)
    assert a.parity == b.parity and a.dual == b.dual
    inv = tuple(np.argsort(perm1))
    back = gtranspose(gtranspose(t, perm1), inv)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(t.data),
                               atol=1e-14)


def test_gcontract_schedule_independence_chain():
    """(A.B).C == A.(B.C) for even tensors — the Koszul bookkeeping must be
    coherent across contraction schedules."""
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    pa = split_parity(2, 1)
    pb = split_parity(1, 2)
    pc = split_parity(2, 2)
    a = rand_gt(k[0], (3, 3), (pa, pb), (False, False))     # out, out
    b = rand_gt(k[1], (3, 4, 3), (pb, pc, pa), (True, False, True))
    c = rand_gt(k[2], (4,), (pc,), (True,))
    ab = gcontract(a, (1,), b, (0,))          # [pa_out, pc_out, pa_in]
    abc1 = gcontract(ab, (1,), c, (0,))       # [pa_out, pa_in]
    bc = gcontract(b, (1,), c, (0,))          # [pb_in, pa_in]
    abc2 = gcontract(a, (1,), bc, (0,))       # [pa_out, pa_in]
    np.testing.assert_allclose(np.asarray(abc1.data), np.asarray(abc2.data),
                               atol=1e-13)


@pytest.mark.smoke
def test_gcontract_network_schedule_independence():
    """A 2x2 ring of even tensors contracts to the same scalar regardless of
    schedule (pairwise orders differ -> different Koszul sign paths)."""
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    p = split_parity(2, 2)
    # ring: T0 -r-> T1 -d-> T2 -l-> T3 -u-> T0; legs (in, out) per tensor
    ts = [rand_gt(keys[i], (4, 4), (p, p), (True, False)) for i in range(4)]

    def close(x):                       # contract a [in,out] matrix ring
        return x

    # schedule 1: ((T0 T1) T2) T3
    a = gcontract(ts[0], (1,), ts[1], (0,))
    a = gcontract(a, (1,), ts[2], (0,))
    a = gcontract(a, (1,), ts[3], (0,))   # [in0, out0]
    s1 = gcontract(a, (0, 1), gconj(gconj(GT(jnp.eye(4), (p, p),
                                             (False, True)))), (0, 1)).data
    # schedule 2: (T0 T1) . (T2 T3)
    b1 = gcontract(ts[0], (1,), ts[1], (0,))
    b2 = gcontract(ts[2], (1,), ts[3], (0,))
    b = gcontract(b1, (1,), b2, (0,))
    s2 = gcontract(b, (0, 1), GT(jnp.eye(4), (p, p), (False, True)),
                   (0, 1)).data
    np.testing.assert_allclose(float(s1), float(s2), rtol=1e-12)


def test_odd_tensor_exchange_sign():
    """Two ODD vectors anticommute: contracting (A x B) against the swapped
    bra order flips the sign — the defining graded feature."""
    po = (1,)        # 1-dim odd space
    a = GT(jnp.asarray([2.0]), (po,), (False,))
    b = GT(jnp.asarray([3.0]), (po,), (False,))
    bra_ab = GT(jnp.asarray([[1.0]]), (po, po), (True, True))
    # <bra| (a x b)>: contract bra axis 0 with a, axis 1 with b
    ab = gcontract(gcontract(bra_ab, (0,), a, (0,)), (0,), b, (0,))
    # swapped juxtaposition: contract bra axis 1 with a first => extra sign
    ba = gcontract(gcontract(bra_ab, (1,), a, (0,)), (0,), b, (0,))
    assert np.isclose(float(ab.data), -float(ba.data))
    assert abs(float(ab.data)) == pytest.approx(6.0)


def test_graded_svd_truncated_reconstructs():
    key = jax.random.PRNGKey(3)
    pr = split_parity(3, 3)
    pc = split_parity(2, 4)
    m = jax.random.normal(key, (6, 6), dtype=jnp.float64)
    ee = np.outer(1 - np.asarray(pr), 1 - np.asarray(pc))
    oo = np.outer(np.asarray(pr), np.asarray(pc))
    m = m * jnp.asarray(ee + oo, m.dtype)          # parity-even matrix
    u, s, vt, terr, pnew = graded_svd_truncated(m, pr, pc, 2, 2)
    assert pnew == split_parity(2, 2)
    rec_full = u @ jnp.diag(s) @ vt
    # full keep (2+4 possible ranks; keep generous) reconstructs exactly
    u2, s2, vt2, terr2, _ = graded_svd_truncated(m, pr, pc, 3, 4)
    np.testing.assert_allclose(np.asarray(u2 @ jnp.diag(s2) @ vt2),
                               np.asarray(m), atol=1e-12)
    assert float(terr2) < 1e-24
    # truncated version: error matches the discarded weight
    err_direct = float(jnp.linalg.norm(rec_full - m) ** 2
                       / jnp.linalg.norm(m) ** 2)
    assert np.isclose(float(terr), err_direct, rtol=1e-6, atol=1e-12)
    # parity structure of the factors
    assert np.allclose(np.asarray(u)[np.asarray(pr) == 1][:, :2], 0.0)
    assert np.allclose(np.asarray(vt)[2:][:, np.asarray(pc) == 0], 0.0)


def test_graded_qr_reconstructs():
    key = jax.random.PRNGKey(4)
    pr = split_parity(3, 2)
    pc = split_parity(2, 2)
    m = jax.random.normal(key, (5, 4), dtype=jnp.float64)
    ee = np.outer(1 - np.asarray(pr), 1 - np.asarray(pc))
    oo = np.outer(np.asarray(pr), np.asarray(pc))
    m = m * jnp.asarray(ee + oo, m.dtype)
    q, r, pq = graded_qr(m, pr, pc)
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(m), atol=1e-12)


def test_fuse_then_contract_matches_direct():
    """Fusing two leading axes (XOR parities) then contracting equals the
    direct two-axis contraction."""
    k = jax.random.split(jax.random.PRNGKey(5), 2)
    p1, p2, p3 = split_parity(1, 1), split_parity(2, 1), split_parity(1, 2)
    a = rand_gt(k[0], (2, 3, 3), (p1, p2, p3), (False, False, True))
    b = rand_gt(k[1], (2, 3, 3), (p1, p2, p3), (True, True, False))
    direct = gcontract(a, (0, 1), b, (0, 1))
    fa = fuse(a, 2)
    fb = fuse(b, 2)
    via_fuse = gcontract(fa, (0,), fb, (0,))
    np.testing.assert_allclose(np.asarray(direct.data),
                               np.asarray(via_fuse.data), atol=1e-13)
    # three-axis fuse, mixed parities
    k2 = jax.random.split(jax.random.PRNGKey(6), 2)
    a3 = rand_gt(k2[0], (2, 3, 3, 2), (p1, p2, p3, p1),
                 (False, False, False, True))
    b3 = rand_gt(k2[1], (2, 3, 3, 2), (p1, p2, p3, p1),
                 (True, True, True, False))
    d3 = gcontract(a3, (0, 1, 2), b3, (0, 1, 2))
    f3 = gcontract(fuse(a3, 3), (0,), fuse(b3, 3), (0,))
    np.testing.assert_allclose(np.asarray(d3.data), np.asarray(f3.data),
                               atol=1e-13)


def test_parity_mask_and_project():
    p = (split_parity(1, 1), split_parity(1, 1))
    t = GT(jnp.ones((2, 2)), p, (False, True))
    m = parity_mask(t)
    np.testing.assert_array_equal(m, np.array([[1, 0], [0, 1]]))
    te = project_even(t)
    np.testing.assert_allclose(np.asarray(te.data),
                               np.array([[1.0, 0.0], [0.0, 1.0]]))
