"""Static-shape truncated linear algebra primitives.

The reference library (QuantumLiquids/PEPS) relies on qlten's dynamically-shaped
truncated SVD/QR (`include/qlpeps/two_dim_tn/peps/square_lattice_peps_projection_impl.h:104-122`).
On TPU every shape must be static, so truncation is expressed as *masking*: we
always keep ``k_max`` singular values but zero out those below the truncation
threshold. Zero-padded rows/columns (our boundary-bond embedding) produce zero
singular values and are therefore harmless.

All functions are jit/vmap friendly and dtype-generic (f32/f64/c64/c128).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TruncParams:
    """Truncation policy for SVD-based bond compression.

    Mirrors the reference's ``BMPSTruncateParams``/``TRGTruncateParams``
    (D_min/D_max/trunc_err) but with the TPU twist that D_max is the *static*
    array size and truncation only masks.

    Attributes:
      d_max: static maximum kept rank (also the padded dimension).
      d_min: minimum kept rank (singular values with index < d_min are always
        kept even if below the error threshold).
      trunc_err: discard smallest singular values while the *squared* discarded
        weight fraction stays below this value (same convention as qlten).
    """
    d_max: int
    d_min: int = 1
    trunc_err: float = 1e-12
    # BMPS compression scheme (reference BMPSTruncateParams factories
    # SVD/Variational2Site/Variational1Site, bmps.h:48-98):
    scheme: str = "svd"          # "svd" | "var2" | "var1" | "fast" | "sketch"
    var_sweeps: int = 2          # fitting sweeps for variational schemes
    rsvd_power: int = 0          # power iterations for the "fast" scheme


def _svd(mat: jax.Array):
    """SVD wrapper; full_matrices=False. Routed through the degenerate-safe
    custom VJP (svd_safe): padded/truncated matrices carry REPEATED zero
    singular values, for which the builtin SVD derivative's 1/(s_i^2-s_j^2)
    factors are NaN. Forward values are identical."""
    return svd_safe(mat)


def svd_mask(s: jax.Array, params: TruncParams) -> jax.Array:
    """Compute a 0/1 keep-mask over singular values (descending order).

    Keep rule (matching qlten semantics): keep the smallest number of leading
    singular values such that sum of discarded s_i^2 <= trunc_err * sum(s^2),
    but always keep at least d_min and at most d_max.
    """
    s2 = s * s
    total = jnp.sum(s2)
    # tail[i] = sum of s2[i:] (weight discarded if we keep only first i values)
    tail = jnp.cumsum(s2[::-1])[::-1]
    idx = jnp.arange(s.shape[0])
    # keep index i iff discarding from i would exceed the budget
    keep_err = tail > params.trunc_err * jnp.maximum(total, jnp.finfo(s.dtype).tiny)
    keep = keep_err | (idx < params.d_min)
    keep = keep & (idx < params.d_max)
    return keep.astype(s.dtype)


def truncated_svd(mat: jax.Array, params: TruncParams):
    """Masked truncated SVD with static output rank ``params.d_max``.

    Returns (u, s, vh, trunc_err_actual) with
      u: [m, d_max], s: [d_max], vh: [d_max, n].
    Singular triples beyond the kept rank are zeroed (not dropped), so
    ``u * s @ vh`` is the truncated approximation and downstream shapes are
    static. If min(m, n) < d_max the factors are zero-padded.
    """
    u, s, vh = _svd(mat)
    mask = svd_mask(s, params)
    s_kept = s * mask
    k = min(mat.shape[0], mat.shape[1])
    d_max = params.d_max
    s2_total = jnp.sum(s * s)
    err = jnp.sum((s - s_kept) ** 2)
    trunc_err_actual = err / jnp.maximum(s2_total, jnp.finfo(s.dtype).tiny)
    if k >= d_max:
        u = u[:, :d_max]
        s_kept = s_kept[:d_max]
        vh = vh[:d_max, :]
        # ensure masked-out columns are exactly zero so padded slots never leak
        col_mask = mask[:d_max]
        u = u * col_mask[None, :]
        vh = vh * col_mask[:, None]
    else:
        pad = d_max - k
        u = jnp.pad(u * mask[None, :], ((0, 0), (0, pad)))
        s_kept = jnp.pad(s_kept, (0, pad))
        vh = jnp.pad(vh * mask[:, None], ((0, pad), (0, 0)))
    return u, s_kept, vh, trunc_err_actual


def lq(mat: jax.Array):
    """LQ-type factorization: mat = L @ Q with Q having orthonormal rows.

    Returns (l, q) with l: [m, k], q: [k, n], k = min(m, n).

    Factored through the degenerate-safe SVD (L = U S, Q = Vh) rather than
    QR of the transpose: JAX's QR derivative is unimplemented for tall
    inputs (wide transposed QR) and NaNs for rank-deficient ones
    (triangular_solve against a singular R) — and zero-padded boundary
    embeddings make rank deficiency the NORM here. Any row-orthonormal Q
    is a valid canonicalization gauge, so downstream results are
    unchanged; this keeps every BMPS compression scheme end-to-end
    differentiable (AD holes / exact-sum gradients).

    Sub-numerical-rank directions are masked to EXACT zeros: LAPACK fills
    the null-space rows of Vh with arbitrary orthonormal vectors, which
    (unlike QR of a padded matrix, whose null slots stay exactly zero)
    would leak O(1) junk into padded bond slots. Downstream punch-hole
    estimators divide by the amplitude, so for near-forbidden
    configurations that junk amplifies by the amplitude ratio (observed:
    O tensors at 1e28 for weight-1e-59 configs). Masking restores the
    exact-zero structure; the discarded directions carry relative weight
    below eps*max(m,n), the same order as QR roundoff.
    """
    u, s, vh = svd_safe(mat)
    tol = jnp.finfo(s.dtype).eps * max(mat.shape)
    mask = (s > tol * jnp.max(s)).astype(s.dtype)
    mask = jax.lax.stop_gradient(mask)
    return u * (s * mask)[None, :].astype(u.dtype), \
        vh * mask[:, None].astype(vh.dtype)


def blq(mat: jax.Array):
    """Batched LQ: mat = L @ Q over leading batch dims, Q Q^dag = I."""
    q_t, r_t = jnp.linalg.qr(jnp.conj(jnp.swapaxes(mat, -1, -2)), mode="reduced")
    return jnp.conj(jnp.swapaxes(r_t, -1, -2)), jnp.conj(jnp.swapaxes(q_t, -1, -2))


def qr(mat: jax.Array):
    """Reduced QR; returns (q, r)."""
    return jnp.linalg.qr(mat, mode="reduced")


def qr_safe(mat: jax.Array):
    """QR-type factorization mat = Q R with Q column-orthonormal, via the
    degenerate-safe SVD (Q = U, R = S Vh). Differentiable for
    rank-deficient inputs, where the builtin QR derivative NaNs
    (triangular_solve against a singular R). Sub-numerical-rank
    directions are masked to exact zeros (see lq)."""
    u, s, vh = svd_safe(mat)
    tol = jnp.finfo(s.dtype).eps * max(mat.shape)
    mask = jax.lax.stop_gradient((s > tol * jnp.max(s)).astype(s.dtype))
    return u * mask[None, :].astype(u.dtype), \
        (s * mask)[:, None].astype(u.dtype) * vh


def safe_inverse(x: jax.Array, tol: float = 1e-10) -> jax.Array:
    """Element-wise pseudo-inverse with relative cutoff (lambda^-1 guards).

    Matches the reference's inv_tol guards when splitting lambdas back out of
    simple-update bonds (`square_lattice_peps_projection_impl.h`).
    """
    scale = jnp.max(jnp.abs(x))
    cutoff = tol * jnp.maximum(scale, jnp.finfo(x.real.dtype).tiny)
    return jnp.where(jnp.abs(x) > cutoff, 1.0 / jnp.where(jnp.abs(x) > cutoff, x, 1.0), 0.0)


@partial(jax.jit, static_argnums=(1,))
def expm_taylor(mat: jax.Array, order: int = 16) -> jax.Array:
    """Taylor-series matrix exponential (reference: TaylorExpMatrix,
    `algorithm/simple_update/simple_update.h:83`). Good for small gate
    matrices ||tau*H|| << 1; shape-static and TPU-friendly."""
    d = mat.shape[0]
    acc = jnp.eye(d, dtype=mat.dtype)
    term = jnp.eye(d, dtype=mat.dtype)
    for n in range(1, order + 1):
        term = term @ mat / n
        acc = acc + term
    return acc


# ---------------------------------------------------------------------------
# Degenerate-safe SVD for use inside autodiff (TRG hole back-propagation).
# ---------------------------------------------------------------------------

@jax.custom_vjp
def svd_safe(mat):
    """SVD whose VJP regularizes the 1/(s_i^2 - s_j^2) factors, so gradients
    stay finite for (near-)degenerate or zero singular values — required when
    differentiating through padded/truncated decompositions (the reference
    faces the same issue in TRG hole backpropagation and regularizes S^-1/2,
    trg_contractor.h `inv_relative_eps` docs)."""
    return jnp.linalg.svd(mat, full_matrices=False)


def _svd_safe_fwd(mat):
    out = jnp.linalg.svd(mat, full_matrices=False)
    return out, (out, mat.shape)


def _svd_safe_bwd(res, cotangents):
    (u, s, vh), shape = res
    du, ds, dvh = cotangents
    m, n = shape[-2], shape[-1]
    k = s.shape[-1]
    s2 = s * s
    # Floor at the smallest NORMAL positive value: XLA flushes denormals to
    # zero on CPU and TPU, so 1e-12 * (a tiny s2 max) can underflow to 0.0
    # exactly and turn f into 0/0 = NaN for degenerate/zero matrices.
    eps = jnp.maximum(1e-12 * jnp.max(s2), jnp.finfo(s.dtype).tiny)
    diff = s2[..., None, :] - s2[..., :, None]          # [k, k]
    f = diff / (diff * diff + eps)                       # regularized 1/diff
    f = f * (1.0 - jnp.eye(k, dtype=f.dtype))
    s_safe = jnp.where(s > 0, s, 1.0)
    sinv = jnp.where(s > 0, 1.0 / s_safe, 0.0)

    uh_du = jnp.conj(u.T) @ du if du is not None else jnp.zeros((k, k), u.dtype)
    v = jnp.conj(vh.T)
    dv = jnp.conj(dvh.T) if dvh is not None else jnp.zeros_like(v)
    vh_dv = vh @ dv

    j_u = f * uh_du
    j_v = f * vh_dv
    # core formula (see e.g. Townsend 2016, complex-safe variant)
    s_d = jnp.diag(s.astype(u.dtype))
    term = (j_u + jnp.conj(j_u.T)) @ s_d + s_d @ (j_v + jnp.conj(j_v.T))
    if ds is not None:
        term = term + jnp.diag(ds.astype(u.dtype))
    dmat = u @ term @ vh
    # off-range contributions for rectangular matrices
    if m > k and du is not None:
        proj = jnp.eye(m, dtype=u.dtype) - u @ jnp.conj(u.T)
        dmat = dmat + proj @ du @ jnp.diag(sinv.astype(u.dtype)) @ vh
    if n > k and dvh is not None:
        proj = jnp.eye(n, dtype=u.dtype) - v @ vh
        dmat = dmat + u @ jnp.diag(sinv.astype(u.dtype)) @ jnp.conj(dv.T) @ proj
    return (dmat,)


svd_safe.defvjp(_svd_safe_fwd, _svd_safe_bwd)
