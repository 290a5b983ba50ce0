"""Z2-graded tensors: dense data + static parity/arrow metadata per axis.

Design (TPU-first re-design of qlten's fermionic QLTensor, the external
layer the reference builds on — SURVEY.md L0):

* `GT` = dense jnp array + per-axis parity vectors (tuples of 0/1, STATIC)
  and per-axis arrows (`dual`: True = bra/in, False = ket/out).
* Koszul rule: swapping two axes multiplies elementwise by
  (-1)^{p_i(a) p_j(b)}. With static parities these sign masks are constant
  arrays that XLA folds/fuses into adjacent einsums — the graded algebra
  costs (almost) nothing on the MXU.
* Contraction pairs a primal (ket) axis with a dual (bra) axis. With the
  juxtaposition (x, x*) — primal first — the evaluation carries an extra
  (-1)^p on the contracted index (supervector-space pairing); (x*, x) is
  sign-free. `gcontract` arranges `a`'s contracted axes last and `b`'s
  first (reversed), so each pair evaluates adjacently.
* Truncated SVD/QR act blockwise in parity with a STATIC split of the kept
  bond: D = D_even + D_odd fixed up front (static shapes for jit; the
  reference instead re-blocks dynamically, which XLA cannot tile).

Reference counterparts: qlten `Contract`/`SVD`/`Transpose` with graded
indices; `ActFermionPOps`; usage sites in
`square_lattice_peps_projection_impl.h` and `split_index_tps.h:379`.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _ptuple(p):
    return tuple(int(x) for x in p)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GT:
    """Graded tensor. `parity[i]` is a tuple of 0/1 of length data.shape[i];
    `dual[i]` is True for a bra (in) axis, False for a ket (out) axis."""
    data: jnp.ndarray
    parity: tuple          # tuple[tuple[int,...], ...] — static
    dual: tuple            # tuple[bool, ...] — static

    def __post_init__(self):
        object.__setattr__(self, "parity",
                           tuple(_ptuple(p) for p in self.parity))
        object.__setattr__(self, "dual", tuple(bool(d) for d in self.dual))

    @property
    def ndim(self):
        return len(self.parity)

    @property
    def shape(self):
        return self.data.shape

    def tree_flatten(self):
        return (self.data,), (self.parity, self.dual)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])


def even_parity(dim: int) -> tuple:
    return (0,) * dim


def split_parity(d_even: int, d_odd: int) -> tuple:
    """Canonical sorted bond layout: [even block | odd block]."""
    return (0,) * d_even + (1,) * d_odd


def parity_mask(t: GT) -> np.ndarray:
    """0/1 mask of parity-CONSERVING entries (total parity even)."""
    tot = np.zeros(t.shape, dtype=np.int64)
    for ax, p in enumerate(t.parity):
        shape = [1] * t.ndim
        shape[ax] = len(p)
        tot = tot + np.asarray(p).reshape(shape)
    return (tot % 2 == 0).astype(np.int64)


def project_even(t: GT) -> GT:
    """Zero out parity-violating entries (enforce an even tensor)."""
    return GT(t.data * jnp.asarray(parity_mask(t), t.data.dtype),
              t.parity, t.dual)


def _pair_sign(p_a, p_b) -> np.ndarray:
    """(-1)^{p_a x p_b} as a rank-2 array [len(p_a), len(p_b)]."""
    return 1.0 - 2.0 * (np.outer(p_a, p_b) % 2)


def gtranspose(t: GT, perm) -> GT:
    """Graded transpose: standard transpose x Koszul signs for every pair of
    axes whose relative order is inverted by `perm`."""
    perm = tuple(perm)
    n = t.ndim
    assert sorted(perm) == list(range(n)), perm
    data = t.data
    # multiply pairwise masks in the ORIGINAL layout, then transpose once
    for i in range(n):
        for j in range(i + 1, n):
            # axes i<j originally; inverted if perm places j before i
            if perm.index(i) > perm.index(j):
                m = _pair_sign(t.parity[i], t.parity[j])
                shape = [1] * n
                shape[i], shape[j] = len(t.parity[i]), len(t.parity[j])
                data = data * jnp.asarray(m.reshape(shape), data.dtype)
    data = jnp.transpose(data, perm)
    return GT(data, tuple(t.parity[p] for p in perm),
              tuple(t.dual[p] for p in perm))


def _axis_parity_sign(t_data, parity, axis) -> jnp.ndarray:
    shape = [1] * t_data.ndim
    shape[axis] = len(parity)
    s = (1.0 - 2.0 * (np.asarray(parity) % 2)).reshape(shape)
    return t_data * jnp.asarray(s, t_data.dtype)


def operator_gt(mat4: jnp.ndarray, p_out1, p_out2, p_in1, p_in2) -> GT:
    """Two-site operator as a graded tensor, from ORDERED matrix elements
    mat4[a', b', a, b] = <a' b'| G |a b>.

    The dual of a graded product reverses, (e_a o e_b)* =
    (-1)^{p_a p_b} e*_b o e*_a, so storing the bra side in (a, b) axis order
    requires the reversal sign (-1)^{p(a) p(b)} on the input legs. Apply
    this AFTER any matrix exponential (expm acts on plain matrix elements).
    Axes: (out1, out2, in1, in2), arrows (ket, ket, bra, bra)."""
    p_in1 = np.asarray(p_in1)
    p_in2 = np.asarray(p_in2)
    sign = 1.0 - 2.0 * (np.outer(p_in1, p_in2) % 2)
    data = mat4 * jnp.asarray(sign[None, None, :, :], mat4.dtype)
    return GT(data,
              (tuple(p_out1), tuple(p_out2), tuple(p_in1), tuple(p_in2)),
              (False, False, True, True))


def gconj(t: GT) -> GT:
    """Dagger without transposition: complex-conjugate data, flip arrows.
    (Axis order is kept; combine with gtranspose for a full adjoint.)"""
    return GT(jnp.conj(t.data), t.parity, tuple(not d for d in t.dual))


def gcontract(a: GT, axes_a, b: GT, axes_b) -> GT:
    """Graded tensordot: contract a.axes_a[k] with b.axes_b[k].

    Each contracted pair must join one primal and one dual axis with equal
    parity vectors. Signs: (i) Koszul signs from moving a's contracted axes
    to the end and b's to the front (reversed); (ii) a (-1)^p evaluation
    sign on every pair whose PRIMAL member comes first (i.e. a's axis is
    primal)."""
    axes_a = tuple(axes_a)
    axes_b = tuple(axes_b)
    assert len(axes_a) == len(axes_b)
    for ia, ib in zip(axes_a, axes_b):
        assert a.parity[ia] == b.parity[ib], (
            f"parity mismatch: axis {ia} {a.parity[ia]} vs axis {ib} "
            f"{b.parity[ib]}")
        assert a.dual[ia] != b.dual[ib], (
            f"arrow mismatch on contraction pair ({ia},{ib})")

    free_a = tuple(i for i in range(a.ndim) if i not in axes_a)
    free_b = tuple(i for i in range(b.ndim) if i not in axes_b)
    ta = gtranspose(a, free_a + axes_a)
    tb = gtranspose(b, tuple(reversed(axes_b)) + free_b)

    da = ta.data
    # evaluation signs: pair k sits at ta axis (n_free_a + k) — apply the
    # (-1)^p mask when a's member is primal (primal-first ordering)
    for k, ia in enumerate(axes_a):
        if not a.dual[ia]:     # a's axis is primal (ket): primal first
            da = _axis_parity_sign(da, a.parity[ia], len(free_a) + k)

    ca = int(np.prod([len(a.parity[i]) for i in axes_a], initial=1))
    fa = da.shape[:len(free_a)]
    fb = tb.data.shape[len(axes_b):]
    # ta layout: [free_a..., c1..ck]; tb layout: [ck..c1, free_b...].
    # flatten a's contracted axes row-major and b's (reversed) so the SAME
    # multi-index (c1..ck) lines up: reverse tb's leading axes first.
    mb = jnp.transpose(tb.data,
                       tuple(reversed(range(len(axes_b))))
                       + tuple(range(len(axes_b), tb.data.ndim)))
    out = jnp.matmul(da.reshape((-1, ca)), mb.reshape((ca, -1)))
    out = out.reshape(fa + fb)
    return GT(out,
              tuple(a.parity[i] for i in free_a)
              + tuple(b.parity[i] for i in free_b),
              tuple(a.dual[i] for i in free_a)
              + tuple(b.dual[i] for i in free_b))


def fuse(t: GT, n_leading: int) -> GT:
    """Fuse the first `n_leading` axes into one (row-major), XOR parities.
    All fused axes must share the arrow. Convention: the dual of a graded
    product reverses, (e_i o e_j)* = (-1)^{p_i p_j} e*_j o e*_i, so fusing a
    DUAL group multiplies by the intra-group pair signs — this makes
    `gcontract(fuse(a), fuse(b))` equal the direct multi-axis contraction
    (covered by tests/test_graded.py)."""
    assert all(d == t.dual[0] for d in t.dual[:n_leading]), \
        "fuse group must have a uniform arrow"
    dims = t.shape[:n_leading]
    ps = [np.asarray(p) for p in t.parity[:n_leading]]
    fused = np.zeros(dims, dtype=np.int64)
    for ax, p in enumerate(ps):
        shape = [1] * n_leading
        shape[ax] = len(p)
        fused = fused + p.reshape(shape)
    fused = (fused % 2).reshape(-1)
    data = t.data
    if t.dual[0]:
        for i in range(n_leading):
            for j in range(i + 1, n_leading):
                m = _pair_sign(ps[i], ps[j])
                shape = [1] * t.data.ndim
                shape[i], shape[j] = len(ps[i]), len(ps[j])
                data = data * jnp.asarray(m.reshape(shape), data.dtype)
    data = data.reshape((-1,) + t.shape[n_leading:])
    return GT(data, (_ptuple(fused),) + t.parity[n_leading:],
              (t.dual[0],) + t.dual[n_leading:])


# ---------------------------------------------------------------------------
# graded linear algebra (blockwise, static parity split)
# ---------------------------------------------------------------------------


def _block_masks(pr, pc):
    pr = np.asarray(pr)
    pc = np.asarray(pc)
    ee = np.outer(1 - pr, 1 - pc).astype(np.float64)
    oo = np.outer(pr, pc).astype(np.float64)
    return ee, oo


def graded_svd_truncated(m: jnp.ndarray, pr, pc, d_even: int, d_odd: int):
    """Truncated SVD of a parity-even matrix (row parity pr, col parity pc)
    keeping a STATIC (d_even, d_odd) split of the new bond.

    Returns (u [R, D], s [D], vt [D, C], trunc_err, new_parity) with
    D = d_even + d_odd, new bond layout [even | odd]. The new bond is primal
    on u's second axis and dual on vt's first axis, so
    u @ diag(s) @ vt reconstructs m by plain matmul (sign-free pairing).

    Reference: qlten's graded truncated SVD as used by
    `square_lattice_peps_projection_impl.h:122`; the dynamic per-block kept
    ranks are replaced by the static split (TPU static shapes)."""
    ee, oo = _block_masks(pr, pc)
    me = m * jnp.asarray(ee, m.dtype)
    mo = m * jnp.asarray(oo, m.dtype)
    ue, se, vte = jnp.linalg.svd(me, full_matrices=False)
    uo, so, vto = jnp.linalg.svd(mo, full_matrices=False)
    k = se.shape[0]
    assert d_even <= k and d_odd <= k, (d_even, d_odd, k)
    # parity-project the singular vectors (zero-s columns can carry junk)
    pr_e = jnp.asarray(1.0 - np.asarray(pr), m.dtype)[:, None]
    pc_e = jnp.asarray(1.0 - np.asarray(pc), m.dtype)[None, :]
    pr_o = jnp.asarray(np.asarray(pr), m.dtype)[:, None]
    pc_o = jnp.asarray(np.asarray(pc), m.dtype)[None, :]
    ue = ue * pr_e
    vte = vte * pc_e
    uo = uo * pr_o
    vto = vto * pc_o
    u = jnp.concatenate([ue[:, :d_even], uo[:, :d_odd]], axis=1)
    s = jnp.concatenate([se[:d_even], so[:d_odd]])
    vt = jnp.concatenate([vte[:d_even], vto[:d_odd]], axis=0)
    total = jnp.sum(se ** 2) + jnp.sum(so ** 2)
    kept = jnp.sum(s ** 2)
    terr = (total - kept) / jnp.maximum(total, jnp.finfo(se.dtype).tiny)
    return u, s, vt, terr, split_parity(d_even, d_odd)


def charged_svd_truncated(m: jnp.ndarray, row_masks, col_masks,
                          keep: tuple):
    """U(1)-charge-resolved truncated SVD.

    row_masks/col_masks: [S, R] / [S, C] 0/1 arrays selecting the rows/cols
    of each of the S flux sectors (may be traced data — per-bond sector
    membership depends on the site charge constants kappa). keep: STATIC
    tuple of per-sector kept counts, sum = D. The new bond layout is the
    concatenation of the sectors in order.

    Each sector is SVD'd on the masked matrix and its singular vectors are
    re-masked, so kept vectors are EXACTLY supported on their sector —
    truncation cannot leak weight between U(1) charge sectors (the
    reference's fermionic U(1) tensors, e.g. test_data/
    tps_tJ_6x6Hole2_J0.3_D8_fU1, get this from qlten's block sparsity).

    Returns (u [R, D], s [D], vt [D, C], trunc_err)."""
    us, ss, vts = [], [], []
    total = jnp.zeros((), m.real.dtype)
    for sidx, cnt in enumerate(keep):
        rm = row_masks[sidx].astype(m.dtype)
        cm = col_masks[sidx].astype(m.dtype)
        ms = m * rm[:, None] * cm[None, :]
        u, s, vt = jnp.linalg.svd(ms, full_matrices=False)
        total = total + jnp.sum(s ** 2)
        assert cnt <= s.shape[0], (sidx, cnt, s.shape)
        us.append(u[:, :cnt] * rm[:, None])
        ss.append(s[:cnt])
        vts.append(vt[:cnt] * cm[None, :])
    u = jnp.concatenate(us, axis=1)
    s = jnp.concatenate(ss)
    vt = jnp.concatenate(vts, axis=0)
    kept = jnp.sum(s ** 2)
    terr = (total - kept) / jnp.maximum(total, jnp.finfo(s.dtype).tiny)
    return u, s, vt, terr


def sector_qr(m: jnp.ndarray, col_idx, row_masks):
    """Charge-sector QR of a covariant matrix (the reduction step of the
    reference's QR-QR-gate-SVD bond projection,
    square_lattice_peps_projection_impl.h:104-122, on graded/U(1) tensors).

    col_idx: STATIC per-sector column index tuples (disjoint, jointly
    covering every structurally nonzero column). row_masks: [T, R] 0/1
    (may be traced — per-bond sector membership) selecting each sector's
    rows. Nonzero entries of m must satisfy the sector pairing
    (row in sector t <=> col in sector t).

    Returns (q [R, K], r [K, C]) with K = sum(len(c)) and the inner bond
    laid out sector-major in col_idx order; plain matmul reconstructs
    q @ r = m on the sector support, and q's kept columns are exactly
    supported on their sector's rows (no charge leakage)."""
    C = m.shape[1]
    K = sum(len(c) for c in col_idx)
    qs = []
    r_full = jnp.zeros((K, C), m.dtype)
    off = 0
    for t, cols in enumerate(col_idx):
        cols = np.asarray(cols, dtype=np.int64)
        rm = row_masks[t].astype(m.dtype)
        mc = m[:, cols] * rm[:, None]
        qt, rt = jnp.linalg.qr(mc, mode="reduced")
        qs.append(qt * rm[:, None])
        r_full = r_full.at[np.arange(off, off + len(cols))[:, None],
                           cols[None, :]].set(rt)
        off += len(cols)
    return jnp.concatenate(qs, axis=1), r_full


def sector_lq(m: jnp.ndarray, row_idx, col_masks):
    """LQ counterpart of sector_qr: m = l @ q (plain matmul) with
    l [R, K] holding the (statically gathered) sector rows and q [K, C]
    masked to each sector's columns. Plain transpose (no conjugation) of
    sector_qr on m.T — q's rows stay orthonormal (q q^H = I blockwise)."""
    q2, r2 = sector_qr(m.T, row_idx, col_masks)
    return r2.T, q2.T


def graded_qr(m: jnp.ndarray, pr, pc):
    """QR of a parity-even matrix, blockwise. Returns (q, r, bond_parity):
    q [R, D], r [D, C] with D = (#even rows kept + #odd rows kept) =
    min-block sizes, bond layout [even | odd]. q's bond axis is primal and
    r's is dual (plain matmul reconstructs)."""
    pr_np = np.asarray(pr)
    pc_np = np.asarray(pc)
    ee, oo = _block_masks(pr_np, pc_np)
    me = m * jnp.asarray(ee, m.dtype)
    mo = m * jnp.asarray(oo, m.dtype)
    qe, re = jnp.linalg.qr(me, mode="reduced")
    qo, ro = jnp.linalg.qr(mo, mode="reduced")
    k = qe.shape[1]
    # parity-project q columns: completion columns past the block rank can
    # carry junk on the wrong-parity rows (their R rows are ~0, so the
    # reconstruction is unaffected)
    pr_e = jnp.asarray(1.0 - pr_np, m.dtype)[:, None]
    pr_o = jnp.asarray(pr_np, m.dtype)[:, None]
    q = jnp.concatenate([qe * pr_e, qo * pr_o], axis=1)
    r = jnp.concatenate([re, ro], axis=0)
    return q, r, split_parity(k, k)
