"""Periodic-boundary contractor: real-space coarse-graining with projector
truncation (the PBC counterpart of the BMPS contractor).

Capability parity with the reference's finite-size Navy-Levin TRG
(`include/qlpeps/two_dim_tn/tensor_network_2d/trg/trg_contractor.h:196`,
L in {2^k, 3*2^k} tori, bosonic). DELIBERATE ALGORITHM SUBSTITUTION: instead of
the reference's 45-degree-rotated checkerboard RG (which needs per-node graph
bookkeeping, `trg_contractor_impl.h:214-292`), we coarse-grain axis-aligned:
pair columns, truncate the doubled vertical bonds with per-bond projector
pairs (QR/LQ + SVD of the bond matrix, with the same S^{-1/2}
`inv_relative_eps` regularization as TRGTruncateParams), then pair rows;
n x n -> n/2 x n/2 per double step. Everything is a batched einsum over
[n, n/2] site arrays — the natural TPU layout — and gradient holes come from
reverse-mode autodiff through the whole RG (`svd_safe`), which is exactly the
reference's `PunchAllHoles` adjoint back-propagation
(`docs/dev/design/math/trg-impurity-hole.md`) obtained for free.

Conventions: tn [n, n, u, l, d, r]; bond u of (y, x) pairs with bond d of
(y-1 mod n, x); l pairs with r of (y, x-1 mod n).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.linalg import TruncParams, svd_mask, svd_safe


def _bond_projectors(top_mat, bot_mat, chi: int, trunc: TruncParams,
                     inv_relative_eps: float):
    """Projector pair for one doubled bond.

    top_mat: [rest_t, m] matricization of the tensor above (bond = its d leg);
    bot_mat: [m, rest_b] matricization of the tensor below (bond = its u leg).
    Returns (p_top [m, chi], p_bot [chi, m]) with p_top @ p_bot ~ identity on
    the bond's relevant subspace.
    """
    # R factor of the top side, L factor of the bottom side
    _, r_t = jnp.linalg.qr(top_mat, mode="reduced")        # [k_t, m]
    q_b, r_b = jnp.linalg.qr(bot_mat.conj().T, mode="reduced")
    l_b = r_b.conj().T                                      # [m, k_b]
    c = r_t @ l_b                                           # [k_t, k_b]
    u, s, vh = svd_safe(c)
    mask = svd_mask(s, TruncParams(chi, trunc.d_min, trunc.trunc_err))
    s_max = jnp.max(s)
    eps = inv_relative_eps * jnp.maximum(s_max, jnp.finfo(s.dtype).tiny)
    s_inv_sqrt = jnp.where(s > eps, 1.0 / jnp.sqrt(jnp.where(s > eps, s, 1.0)),
                           0.0) * mask
    k = s.shape[0]
    if k >= chi:
        u_t = (u * s_inv_sqrt[None, :])[:, :chi]
        v_t = (s_inv_sqrt[:, None] * vh)[:chi, :]
    else:
        u_t = jnp.pad(u * s_inv_sqrt[None, :], ((0, 0), (0, chi - k)))
        v_t = jnp.pad(s_inv_sqrt[:, None] * vh, ((0, chi - k), (0, 0)))
    # P_top = L_b V S^{-1/2}  (= l_b @ v_t^dag),  P_bot = S^{-1/2} U^dag R_t:
    # A P_top P_bot B = Q_t U S V^dag Q_b = truncated(A B).
    p_top = l_b @ jnp.conj(v_t.T)
    p_bot = jnp.conj(u_t.T) @ r_t
    return p_top, p_bot


def _triple_columns(tn: jnp.ndarray) -> jnp.ndarray:
    """Contract column TRIPLES (used when nx is 3 * 2^k and has been paired
    down to an odd multiple of 3; reference TRG also supports L = 3*2^k,
    trg_contractor_impl.h:154). [n, nx] -> [n, nx/3] with tripled u/d legs."""
    ny, nx = tn.shape[0], tn.shape[1]
    a = tn[:, 0::3]
    b = tn[:, 1::3]
    c = tn[:, 2::3]
    m = jnp.einsum("yxulda,yxUaDb,yxVbEr->yxuUVldDEr", a, b, c)
    du, dU, dV = a.shape[2], b.shape[2], c.shape[2]
    dl = a.shape[3]
    dd, dD, dE = a.shape[4], b.shape[4], c.shape[4]
    dr = c.shape[5]
    return m.reshape(ny, nx // 3, du * dU * dV, dl, dd * dD * dE, dr)


def _pair_columns(tn: jnp.ndarray) -> jnp.ndarray:
    """Contract column pairs: [n, n, u, l, d, r] (D) -> [n, n/2] with doubled
    u/d legs: axes (u1, u2), l, (d1, d2), r -> grouped [n, n/2, D^2, D, D^2, D]."""
    ny, nx = tn.shape[0], tn.shape[1]
    a = tn[:, 0::2]
    b = tn[:, 1::2]
    m = jnp.einsum("yxuldk,yxUkDr->yxuUldDr", a, b)
    du, dU, dl = a.shape[2], b.shape[2], a.shape[3]
    dd, dD, dr = a.shape[4], b.shape[4], b.shape[5]
    return m.reshape(ny, nx // 2, du * dU, dl, dd * dD, dr)


def _truncate_vertical(m: jnp.ndarray, chi: int, trunc: TruncParams,
                       inv_relative_eps: float) -> jnp.ndarray:
    """Insert projectors on every vertical bond of m [n, nx, U, l, D_, r]
    (U/D_ doubled) and absorb them, returning [n, nx, chi, l, chi, r]."""
    n, nx, du, dl, dd, dr = m.shape

    # bond between (y, x) and (y+1, x): top tensor's d leg, bottom's u leg.
    top = m                                   # d leg is axis 4
    bot = jnp.roll(m, -1, axis=0)             # tensor below
    top_mat = jnp.transpose(top, (0, 1, 2, 3, 5, 4)).reshape(n, nx, du * dl * dr, dd)
    bot_mat = jnp.transpose(bot, (0, 1, 2, 3, 4, 5)).reshape(n, nx, du, dl * dd * dr)

    def one(tm, bm):
        return _bond_projectors(tm, bm, chi, trunc, inv_relative_eps)

    p_top, p_bot = jax.vmap(jax.vmap(one))(top_mat, bot_mat)
    # p_top[y, x]: [dd, chi] absorbed into d leg of (y, x);
    # p_bot[y, x]: [chi, du] absorbed into u leg of (y+1, x).
    p_bot_for_u = jnp.roll(p_bot, 1, axis=0)   # projector for (y, x)'s u leg
    out = jnp.einsum("yxulDr,yxDc->yxulcr", m, p_top)
    out = jnp.einsum("yxku,yxulcr->yxklcr", p_bot_for_u, out)
    return out


def _transpose_frame(tn: jnp.ndarray) -> jnp.ndarray:
    """Reflect across the main diagonal: swap lattice axes + (u<->l, d<->r)."""
    return jnp.transpose(tn, (1, 0, 3, 2, 5, 4))


class PBCResult(NamedTuple):
    log_abs: jnp.ndarray
    sign: jnp.ndarray      # mantissa sign/phase


@partial(jax.jit, static_argnames=("chi", "trunc", "inv_relative_eps"))
def contract_pbc(tn: jnp.ndarray, chi: int, trunc: TruncParams,
                 inv_relative_eps: float = 1e-12):
    """Contract an n x n PBC single-layer network (n = 2^k or 3*2^k) to a
    scalar.

    Returns (mantissa, log_weight): psi = mantissa * exp(log_weight).
    """
    def ok(n):
        while n % 2 == 0:
            n //= 2
        return n in (1, 3)

    assert ok(tn.shape[0]) and ok(tn.shape[1]), \
        "PBC contractor requires dims of the form 2^k or 3*2^k"
    rdt = tn.real.dtype if jnp.iscomplexobj(tn) else tn.dtype
    logw = jnp.zeros((), rdt)

    def normalize(t):
        nrm = jnp.sqrt(jnp.sum(jnp.abs(t) ** 2, axis=(2, 3, 4, 5), keepdims=True))
        nrm = jnp.maximum(nrm, jnp.finfo(rdt).tiny)
        # stop_gradient: the log-weight carries no derivative, so the
        # mantissa's holomorphic gradient is the full d psi / dT (up to the
        # constant exp(logw)) — this is what makes autodiff holes exact.
        nrm = jax.lax.stop_gradient(nrm)
        return t / nrm, jnp.sum(jnp.log(nrm))

    tn, lw = normalize(tn)
    logw = logw + lw
    while tn.shape[0] > 1 or tn.shape[1] > 1:
        if tn.shape[1] > 1:
            m = (_triple_columns(tn) if tn.shape[1] % 3 == 0
                 and tn.shape[1] % 2 != 0 else _pair_columns(tn))
            # vertical bonds double; insert projector pairs (for a single
            # remaining row these are self-loop bonds — same construction).
            tn = _truncate_vertical(m, min(chi, m.shape[2]), trunc,
                                    inv_relative_eps)
        tn, lw = normalize(tn)
        logw = logw + lw
        tn = _transpose_frame(tn)  # next pass pairs the other direction
    # 1x1 torus: trace u-d and l-r
    t = tn[0, 0]
    mant = jnp.einsum("ulul->", t)
    return mant, logw


def amplitude_pbc(tn: jnp.ndarray, chi: int, trunc: TruncParams,
                  inv_relative_eps: float = 1e-12):
    return contract_pbc(tn, chi, trunc, inv_relative_eps)


def punch_all_holes_pbc(tn: jnp.ndarray, chi: int, trunc: TruncParams,
                        inv_relative_eps: float = 1e-12):
    """All site environments dZ/dT via reverse-mode AD through the RG
    (reference: `PunchAllHoles`, trg_contractor.h:450). Returns
    (holes [n, n, u, l, d, r], mantissa, log_weight) where
    holes[y, x] = d(mantissa)/d tn[y,x] at fixed normalizations — exactly
    what O = hole/psi_loc needs (scales cancel in the ratio)."""

    def f(t):
        mant, logw = contract_pbc(t, chi, trunc, inv_relative_eps)
        return mant, (mant, logw)

    grad, (mant, logw) = jax.grad(f, has_aux=True)(tn)
    return grad, mant, logw
